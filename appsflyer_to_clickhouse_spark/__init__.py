"""PySpark-native analytics engine with the query capabilities of
phamtuthu/appsflyer-to-clickhouse (reference: /root/reference/main.py),
re-expressed Spark-first and extended with large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal).

Layout
------
- ``session``    — SparkSession builder tuned for oracle comparison + local bench
- ``config``     — env-driven pipeline config (reference main.py:10-17 surface)
- ``schemas``    — fixed StructTypes + the 49-column AppsFlyer→CH mapping
- ``functions``  — scalar kernels as Column→Column functions (never Python UDFs)
- ``operators``  — ETL parity ops (SURVEY.md §2 Part A) + extension ops (Part C)
- ``plans``      — the query registry backing ``__spark_entry__.queries()``
- ``sources``    — AppsFlyer HTTP-CSV source (partitioned fetch), parquet/csv readers
- ``sinks``      — ClickHouse JDBC writer (gated), parquet sink
- ``streaming``  — Structured Streaming dedup-with-watermark pipeline
- ``multimodal`` — binary-column plumbing for image/audio payloads (decode stubbed)
"""

__version__ = "0.1.0"
