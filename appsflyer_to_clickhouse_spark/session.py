"""SparkSession construction.

One place owns the session config so tests, ``__spark_entry__`` and
``bench.py`` agree on semantics:

- ``spark.sql.session.timeZone=UTC`` — testdata timestamps are naive;
  DuckDB (the oracle) treats them as UTC-naive, so Spark must too.
- AQE on (runtime coalesce, skew-join splitting) — at 100 TB this is the
  knob that fixes stragglers without hand-tuning per query.
- shuffle partitions default to core count for local mode; on a real
  cluster this would be ~2-3x total executor cores (or left to AQE with
  ``spark.sql.adaptive.coalescePartitions.initialPartitionNum`` high).
- ``-XX:ReservedCodeCacheSize=1g`` — whole-stage codegen emits one or
  more JIT-compiled classes per distinct plan fragment; a workload that
  runs many distinct queries in one JVM (bench.py runs 110+) fills the
  default 240 MB code cache, after which HotSpot silently stops
  compiling and everything runs interpreted (measured: 1.6-2x total
  bench wall, with individual late-running queries 8x slower). On a
  real cluster set the same flag in ``spark.executor.extraJavaOptions``
  (done below; in local mode driver == executor).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "appsflyer_to_clickhouse_spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet stores ts as INT64 TIMESTAMP(NANOS),
        # which Spark's parquet reader rejects; read as long and convert
        # in plans.registry.load (truncating to micros, like DuckDB).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python Data Source filter pushdown (Spark 4.1, default off):
        # the chbatch manifest reader implements pushFilters so
        # Catalyst-pushed range predicates prune whole parts against
        # manifest stats before any task is planned. Runtime-settable,
        # so plain sessions can opt in with spark.conf.set too.
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .config("spark.executor.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
