"""SURVEY.md §2 Part A ``sink_batch_insert``, oracle-checked by
round-trip: pipeline -> parquet sink (partitioned by install date) ->
read back. The oracle is the etl_pipeline oracle itself — if the sink
loses, retypes, or reorders anything, the hash diverges.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from ..operators.etl import run_installs_pipeline
from ..sinks.parquet_sink import read_sink, scan_sink_keys_pruned, write_sink
from .etl_queries import (
    ALL_FROM,
    ALL_TO,
    WIN_FROM,
    WIN_TO,
    _pipeline_oracle,
    _synth_af_batch,
)
from .registry import load, register


@register("sink_batch_insert", _pipeline_oracle())
def q_sink_batch_insert(spark, sf_dir):
    """Write the flagship pipeline's output to the parquet sink
    (append, partitioned by install_date, empty-batch short-circuit —
    reference main.py:183-190) and read it back in sink column order.
    A fresh temp dir per call keeps the append-mode write idempotent
    for re-runs."""
    raw = _synth_af_batch(spark, sf_dir)
    ev = load(spark, sf_dir, "events")
    sink_seed = ev.filter(F.col("event_id") % 5 == 0).select(
        F.col("ts").alias("install_time"),
        F.expr("event_id DIV 3").cast("string").alias("appsflyer_id"),
    )
    out = run_installs_pipeline(raw, sink_seed, ALL_FROM, ALL_TO)
    path = tempfile.mkdtemp(prefix="spark_graft_sink_")
    write_sink(out, path, mode="append")
    return read_sink(spark, path)


@register(
    "scan_sink_keys_pruned",
    f"""
    WITH sunk AS (
      SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') AS install_time_s, ts,
             CAST(event_id // 7 AS VARCHAR) AS appsflyer_id
      FROM events
    )
    SELECT DISTINCT appsflyer_id
    FROM sunk
    WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
      AND ts <= TIMESTAMP '2024-01-25 00:00:00'
      AND appsflyer_id IS NOT NULL AND appsflyer_id != ''
    """,
)
def q_scan_sink_keys_pruned(spark, sf_dir):
    """The partition-pruned sink key scan (VERDICT r1 item 7): write an
    events-derived sink partitioned by install_date, then scan a
    two-week window — the install_date predicate prunes partitions
    before IO, bounding the anti-join build side by construction."""
    ev = load(spark, sf_dir, "events")
    sunk = ev.select(
        F.col("ts").alias("install_time"),
        F.expr("event_id DIV 7").cast("string").alias("appsflyer_id"),
    )
    path = tempfile.mkdtemp(prefix="spark_graft_sinkscan_")
    (
        sunk.withColumn("install_date", F.to_date("install_time"))
        .write.mode("overwrite")
        .partitionBy("install_date")
        .parquet(path)
    )
    return scan_sink_keys_pruned(
        spark, path, "2024-01-08 00:00:00", "2024-01-25 00:00:00"
    )


# ---------------------------------------------------------------------------
# sink_merge_upsert — partition-scoped MERGE, oracle-checked round-trip
# ---------------------------------------------------------------------------

_MERGE_ORACLE = """
WITH initial AS (
  SELECT CAST(event_id // 3 AS VARCHAR) AS appsflyer_id,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS install_time,
         ts AS event_time
  FROM events WHERE event_id % 3 = 0
), batch AS (
  SELECT CAST(event_id // 3 AS VARCHAR) AS appsflyer_id,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS install_time,
         ts + INTERVAL 1 HOUR AS event_time
  FROM events WHERE event_id % 6 = 0
), unioned AS (
  SELECT *, 0 AS src FROM initial
  UNION ALL
  SELECT *, 1 AS src FROM batch
), ranked AS (
  SELECT appsflyer_id, install_time, event_time,
         row_number() OVER (
           PARTITION BY CAST(install_time AS DATE), appsflyer_id
           ORDER BY event_time DESC, src DESC
         ) AS rn
  FROM unioned
)
SELECT appsflyer_id, install_time, event_time
FROM ranked WHERE rn = 1
"""


@register("sink_merge_upsert", _MERGE_ORACLE)
def q_sink_merge_upsert(spark, sf_dir):
    """MERGE INTO round-trip: an initial sink state plus an
    overlapping batch with strictly newer event_times; after
    merge_upsert the sink must hold exactly the per-(install_date,
    key) latest-wins winners — expressed independently in the oracle
    as a window over the unioned inputs. The merge reads back only the
    batch's partitions and dynamically overwrites only those
    directories (physical partition-scoping pinned in
    tests/test_sink_maintenance.py); correctness of WHAT survives is
    pinned here. Idempotent by construction, so bench re-runs converge
    to the same state."""
    from ..schemas import ch_sink_schema, sink_columns
    from ..sinks.maintenance import merge_upsert

    ev = load(spark, sf_dir, "events")

    def shaped(df, event_time_col):
        base = df.select(
            F.expr("event_id DIV 3").cast("string").alias("appsflyer_id"),
            F.date_trunc("DAY", F.col("ts")).alias("install_time"),
            event_time_col.alias("event_time"),
        )
        for f in ch_sink_schema().fields:
            if f.name not in ("appsflyer_id", "install_time", "event_time"):
                base = base.withColumn(f.name, F.lit(None).cast(f.dataType))
        return base.select(*sink_columns())

    initial = shaped(ev.filter(F.col("event_id") % 3 == 0), F.col("ts"))
    batch = shaped(
        ev.filter(F.col("event_id") % 6 == 0),
        F.col("ts") + F.expr("INTERVAL 1 HOUR"),
    )
    path = tempfile.mkdtemp(prefix="spark_graft_merge_")
    write_sink(initial, path, mode="append")
    merge_upsert(spark, batch, path)
    return read_sink(spark, path).select(
        "appsflyer_id", "install_time", "event_time"
    )


# ---------------------------------------------------------------------------
# sink_rollup_refresh — continuous-aggregate round-trip
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS install_date,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT event_id // 3) AS BIGINT) AS n_keys,
       min(ts) AS first_install,
       max(ts) AS last_install
FROM events
GROUP BY 1
"""


@register("sink_rollup_refresh", _ROLLUP_ORACLE)
def q_sink_rollup_refresh(spark, sf_dir):
    """Continuous-aggregate round-trip: seed the partitioned sink from
    events, run the incremental rollup refresh (bootstrap form), read
    the materialized rollup back; the oracle recomputes the same
    per-date aggregate straight from the source, so any loss in the
    write->refresh->read path (partition mapping, distinct counting,
    min/max typing) breaks the hash. Incremental day-scoped refresh
    equivalence and untouched-partition byte-identity are pinned in
    tests/test_sink_maintenance.py."""
    from ..schemas import ch_sink_schema, sink_columns
    from ..sinks.maintenance import refresh_rollup_incremental

    ev = load(spark, sf_dir, "events")
    base = ev.select(
        F.expr("event_id DIV 3").cast("string").alias("appsflyer_id"),
        F.col("ts").alias("install_time"),
        F.col("ts").alias("event_time"),
    )
    for f in ch_sink_schema().fields:
        if f.name not in ("appsflyer_id", "install_time", "event_time"):
            base = base.withColumn(f.name, F.lit(None).cast(f.dataType))
    sink = tempfile.mkdtemp(prefix="spark_graft_rollup_sink_")
    rollup = tempfile.mkdtemp(prefix="spark_graft_rollup_")
    write_sink(base.select(*sink_columns()), sink, mode="append")
    refresh_rollup_incremental(spark, sink, rollup)
    return spark.read.parquet(rollup).select(
        "install_date", "n_rows", "n_keys", "first_install", "last_install"
    )


# ---------------------------------------------------------------------------
# sink_merge_cdc — CDC MERGE round-trip with deletes
# ---------------------------------------------------------------------------

_CDC_ORACLE = """
SELECT CAST(event_id // 3 AS VARCHAR) AS appsflyer_id,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS install_time,
       ts + INTERVAL 1 HOUR AS event_time
FROM events
WHERE event_id % 6 = 0
"""


@register("sink_merge_cdc", _CDC_ORACLE)
def q_sink_merge_cdc(spark, sf_dir):
    """CDC MERGE round-trip with deletes: seed the sink with every
    key, then apply one change batch carrying newer upserts for the
    even keys and newer DELETES for the odd keys; after merge_cdc the
    sink must hold exactly the upserted even keys (deletes removed
    their rows). The oracle states the survivor set independently.
    Partition-scoping and the emptied-directory obligation are pinned
    physically in tests/test_sink_maintenance.py."""
    from ..schemas import ch_sink_schema, sink_columns
    from ..sinks.maintenance import merge_cdc

    ev = load(spark, sf_dir, "events")

    def shaped(df, event_time_col):
        base = df.select(
            F.expr("event_id DIV 3").cast("string").alias("appsflyer_id"),
            F.date_trunc("DAY", F.col("ts")).alias("install_time"),
            event_time_col.alias("event_time"),
        )
        for f in ch_sink_schema().fields:
            if f.name not in ("appsflyer_id", "install_time", "event_time"):
                base = base.withColumn(f.name, F.lit(None).cast(f.dataType))
        return base.select(*sink_columns())

    initial = shaped(ev.filter(F.col("event_id") % 3 == 0), F.col("ts"))
    ups = shaped(
        ev.filter(F.col("event_id") % 6 == 0),
        F.col("ts") + F.expr("INTERVAL 1 HOUR"),
    ).withColumn("op", F.lit("u"))
    dels = shaped(
        ev.filter(F.col("event_id") % 6 == 3),
        F.col("ts") + F.expr("INTERVAL 2 HOUR"),
    ).withColumn("op", F.lit("d"))
    path = tempfile.mkdtemp(prefix="spark_graft_cdc_")
    write_sink(initial, path, mode="append")
    merge_cdc(spark, ups.unionByName(dels), path)
    return read_sink(spark, path).select(
        "appsflyer_id", "install_time", "event_time"
    )


# ---------------------------------------------------------------------------
# sink_datasource_batch — Python Data Source WRITER round trip
# ---------------------------------------------------------------------------

from pyspark.sql import types as T  # noqa: E402

from ..sinks.datasource_sink import (  # noqa: E402
    ClickHouseBatchDataSource,
    read_committed,
)

_DS_SCHEMA = T.StructType(
    [
        T.StructField("appsflyer_id", T.StringType()),
        T.StructField("uid", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)


@register(
    "sink_datasource_batch",
    """
    SELECT CAST(event_id // 3 AS VARCHAR) AS appsflyer_id,
           user_id AS uid,
           event_type
    FROM events WHERE event_id % 4 = 0
    """,
)
def q_sink_datasource_batch(spark, sf_dir):
    """Round trip through the Python Data Source WRITER
    (sinks/datasource_sink.py): the batch lands via executor-side
    fixed-size flushes (batchsize 500, so multiple INSERT-shaped
    batches per partition), the driver publishes a manifest naming the
    successful tasks' parts, and the read resolves the manifest FIRST
    — so the comparison proves the full two-phase protocol preserves
    every row and type exactly (the write-side twin of
    source_http_datasource; offline JSONL parts stand in for the
    ClickHouse client the container doesn't ship)."""
    spark.dataSource.register(ClickHouseBatchDataSource)
    ev = load(spark, sf_dir, "events")
    out = ev.filter(F.col("event_id") % 4 == 0).select(
        F.expr("event_id DIV 3").cast("string").alias("appsflyer_id"),
        F.col("user_id").alias("uid"),
        "event_type",
    )
    path = tempfile.mkdtemp(prefix="spark_graft_chbatch_") + "/staged"
    (
        out.write.format("chbatch")
        .option("path", path)
        .option("batchsize", "500")
        .mode("append")
        .save()
    )
    return read_committed(spark, path, _DS_SCHEMA)


# ---------------------------------------------------------------------------
# sink_schema_evolution — additive column change across sink versions
# ---------------------------------------------------------------------------


@register(
    "sink_schema_evolution",
    """
    SELECT CAST(event_id AS VARCHAR) AS appsflyer_id,
           user_id AS uid,
           CAST(NULL AS VARCHAR) AS campaign
    FROM events WHERE event_id % 10 = 0
    UNION ALL
    SELECT CAST(event_id AS VARCHAR) AS appsflyer_id,
           user_id AS uid,
           event_type AS campaign
    FROM events WHERE event_id % 10 = 1
    """,
)
def q_sink_schema_evolution(spark, sf_dir):
    """ADDITIVE schema evolution, MANIFEST-AUTHORITATIVE (VERDICT r9
    task 5): batch v1 lands without ``campaign``, a later batch v2
    appends WITH it, and the Data Source reader reconciles per part —
    v1 parts backfill a TYPED null column on the vectorized Arrow
    path (manifest_source._null_array), no rewrite of history and NO
    ``mergeSchema`` footer pass anywhere: read planning is O(manifest)
    regardless of how many pre-add parts exist, which at a 10⁶-part
    table is the difference between a metadata read and a driver
    pass over every footer. The oracle is the explicit UNION with a
    NULL column, so the reconciliation is value-checked, not just
    schema-checked."""
    from pyspark.sql import types as T

    from ..sinks.datasource_sink import ClickHouseArrowDataSource

    spark.dataSource.register(ClickHouseArrowDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    ev = load(spark, sf_dir, "events")
    v1 = ev.filter(F.col("event_id") % 10 == 0).select(
        F.col("event_id").cast("string").alias("appsflyer_id"),
        F.col("user_id").alias("uid"),
    )
    v2 = ev.filter(F.col("event_id") % 10 == 1).select(
        F.col("event_id").cast("string").alias("appsflyer_id"),
        F.col("user_id").alias("uid"),
        F.col("event_type").alias("campaign"),
    )
    path = tempfile.mkdtemp(prefix="spark_graft_evolve_") + "/sink"
    for df in (v1, v2):
        (
            df.write.format("chbatch_arrow")
            .option("path", path)
            .option("batchsize", "100000000")
            .mode("append")
            .save()
        )
    schema = T.StructType(
        [
            T.StructField("appsflyer_id", T.StringType()),
            T.StructField("uid", T.LongType()),
            T.StructField("campaign", T.StringType()),
        ]
    )
    return (
        spark.read.format("chbatch_arrow")
        .schema(schema)
        .option("path", path)
        .load()
    )


@register(
    "sink_datasource_arrow",
    """
    SELECT CAST(event_id // 3 AS VARCHAR) AS appsflyer_id,
           user_id AS uid,
           event_type
    FROM events WHERE event_id % 4 = 0
    """,
)
def q_sink_datasource_arrow(spark, sf_dir):
    """The ARROW-NATIVE tier of the Python Data Source writer
    (sinks/datasource_sink.py:ClickHouseArrowDataSource): identical
    batch/manifest/commit protocol and identical oracle to
    sink_datasource_batch, but the writer consumes pyarrow
    RecordBatches and flushes columnar parquet parts — no Row objects,
    no per-field Python access; the two registrations benchmarked
    side-by-side measure exactly the per-row Python tax (bench: the
    row tier streams ~100k rows/s, this tier is scan-bound)."""
    from ..sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        read_committed_parquet,
    )

    spark.dataSource.register(ClickHouseArrowDataSource)
    ev = load(spark, sf_dir, "events")
    out = ev.filter(F.col("event_id") % 4 == 0).select(
        F.expr("event_id DIV 3").cast("string").alias("appsflyer_id"),
        F.col("user_id").alias("uid"),
        "event_type",
    )
    path = tempfile.mkdtemp(prefix="spark_graft_charrow_") + "/staged"
    (
        out.write.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", "20000")
        .mode("append")
        .save()
    )
    return read_committed_parquet(spark, path, _DS_SCHEMA)


# ---------------------------------------------------------------------------
# scan_sink_keys_jdbc — the reference's key scan over a REAL JDBC database
# ---------------------------------------------------------------------------

_DERBY_URL = "jdbc:derby:memory:spark_graft_sinkdb;create=true"
_DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@register(
    "scan_sink_keys_jdbc",
    f"""
    SELECT DISTINCT CAST(user_id AS VARCHAR) AS appsflyer_id
    FROM events
    WHERE ts >= TIMESTAMP '{WIN_FROM}' AND ts <= TIMESTAMP '{WIN_TO}'
      AND user_id IS NOT NULL AND CAST(user_id AS VARCHAR) != ''
    """,
)
def q_scan_sink_keys_jdbc(spark, sf_dir):
    """The reference's windowed key scan (main.py:169-176) executed
    against a REAL JDBC database — the embedded Derby on Spark's
    classpath stands in for ClickHouse, exercising the exact read path
    the gated deployment uses: ``read_clickhouse`` loads the JDBC
    relation, ``scan_sink_keys`` filters the window declaratively, and
    Catalyst pushes the bounds INTO the JDBC scan as bound predicates
    (never interpolated SQL — the injection-free divergence from
    main.py:172-174, plan-pinned in tests/test_jdbc_roundtrip.py).
    Same oracle as the parquet-backed scan_sink_keys: the storage tier
    must not change the answer. Local-mode demo note: the in-memory
    Derby is per-JVM, which local[*] shares; a cluster deployment
    points the same code at a ClickHouse URL.

    VERDICT r5 task 1: the scan is PARTITION-PARALLEL —
    ``read_clickhouse_partitioned`` derives
    partitionColumn/lowerBound/upperBound/numPartitions from the scan
    window, so each executor issues its own bounded install_time-range
    query concurrently instead of the whole window flowing through one
    connection (the single-stream ceiling a 100 TB sink would hit)."""
    from ..config import PipelineConfig
    from ..operators.etl import scan_sink_keys
    from ..sinks.clickhouse_sink import read_clickhouse_partitioned

    cfg = PipelineConfig(
        appsflyer_token=None, app_id=None, ch_host="mem", ch_port=0,
        ch_user=None, ch_password=None, ch_database="mem",
        ch_table="sink_keys_src",
    )
    ev = load(spark, sf_dir, "events").select(
        F.col("ts").alias("install_time"),
        F.col("user_id").cast("string").alias("appsflyer_id"),
    )
    (
        ev.write.format("jdbc")
        .option("url", _DERBY_URL)
        .option("dbtable", cfg.ch_table)
        .option("driver", _DERBY_DRIVER)
        .option(
            "createTableColumnTypes", "appsflyer_id VARCHAR(64)"
        )  # Derby CLOB default rejects pushed string comparisons
        .mode("overwrite")  # rerun-safe: the query owns this table
        .save()
    )
    sink = read_clickhouse_partitioned(
        spark, cfg, WIN_FROM, WIN_TO,
        num_partitions=4, url=_DERBY_URL, driver=_DERBY_DRIVER,
    )
    return scan_sink_keys(sink, WIN_FROM, WIN_TO)


# ---------------------------------------------------------------------------
# sink maintenance as graded queries: OPTIMIZE (small-file compaction)
# and retention expiry — sinks/maintenance.py has the machinery and
# tests/test_sink_maintenance.py the unit pins; registering them puts
# both under the continuous driver-side oracle differential too.
# ---------------------------------------------------------------------------

# rows per output file for the compaction query. 200 makes the three
# SFs land on DIFFERENT per-date file counts (≈33/333/3333 rows/date →
# 1/2/17 files), so the oracle's bin-pack arithmetic is exercised off
# the trivial "everything fits in one file" corner at two of three SFs.
_COMPACT_TARGET_ROWS = 200

# a 5-date window: compaction's real-world cadence is incremental
# (compact yesterday's partitions, not the table), and the bounded date
# list keeps the per-partition rewrite loop a constant number of jobs.
_COMPACT_DATES = [f"2024-01-{d:02d}" for d in range(8, 13)]


@register(
    "sink_compact_small_files",
    f"""
    SELECT CAST(ts AS DATE) AS install_date,
           COUNT(*) AS n_rows,
           CAST(CEIL(COUNT(*) / {_COMPACT_TARGET_ROWS}.0) AS BIGINT)
             AS n_files
    FROM events
    WHERE CAST(ts AS DATE)
          BETWEEN DATE '{_COMPACT_DATES[0]}' AND DATE '{_COMPACT_DATES[-1]}'
    GROUP BY install_date
    """,
)
def q_sink_compact_small_files(spark, sf_dir):
    """OPTIMIZE round-trip with file accounting (the lakehouse
    small-file rewrite on plain partitioned parquet): fragment an
    events-derived sink (16-way round-robin write → up to 16 files per
    install_date — the shape continuous micro-batch appends leave
    behind), compact a 5-date window via ``compact_partitions``, then
    read back and report per-date row count AND the number of distinct
    data files backing it (``_metadata.file_path``). The oracle
    recomputes the bin-pack arithmetic ceil(rows/target) from row
    counts alone, so a compaction that silently no-ops (files stay
    ~16), over-merges, or drops rows hash-mismatches — the file COUNT
    is graded, not just the data. Scale shape: each date's rewrite is
    directory-pruned and dynamically overwritten (never the table), and
    the date list bounds the pass exactly like the nightly
    compact-yesterday job a 100 TB sink runs."""
    from ..sinks.maintenance import compact_partitions

    ev = load(spark, sf_dir, "events")
    sunk = ev.select(
        F.expr("event_id DIV 9").cast("string").alias("appsflyer_id"),
        F.col("ts").alias("install_time"),
        F.to_date("ts").alias("install_date"),
    )
    path = tempfile.mkdtemp(prefix="spark_graft_compact_")
    (
        sunk.repartition(16)
        .write.mode("overwrite")
        .partitionBy("install_date")
        .parquet(path)
    )
    import datetime

    dates = [datetime.date.fromisoformat(d) for d in _COMPACT_DATES]
    compact_partitions(
        spark,
        path,
        target_rows_per_file=_COMPACT_TARGET_ROWS,
        partitions=dates,
    )
    return (
        spark.read.parquet(path)
        .filter(F.col("install_date").isin(dates))
        .groupBy("install_date")
        .agg(
            F.count("*").alias("n_rows"),
            F.count_distinct(F.col("_metadata.file_path")).alias("n_files"),
        )
    )


_RETENTION_CUTOFF = "2024-01-15"


@register(
    "sink_retention_expire",
    f"""
    SELECT CAST(ts AS DATE) AS install_date,
           COUNT(*) AS n_rows,
           MIN(ts) AS first_install,
           MAX(ts) AS last_install
    FROM events
    WHERE CAST(ts AS DATE) >= DATE '{_RETENTION_CUTOFF}'
    GROUP BY install_date
    """,
)
def q_sink_retention_expire(spark, sf_dir):
    """Retention/TTL round-trip: materialize the full 30-date
    events-derived sink, expire everything before the cutoff via
    ``expire_partitions`` (filesystem-level partition-directory drops —
    the only retention affordable at 100 TB; no table scan, surviving
    partitions byte-identical), then read back per-date row counts and
    install_time extrema. The oracle is the same aggregate over the
    logical rows >= cutoff, so an expiry that under-deletes (stale
    dates survive), over-deletes, or disturbs surviving rows
    hash-mismatches."""
    from ..sinks.maintenance import expire_partitions

    ev = load(spark, sf_dir, "events")
    sunk = ev.select(
        F.expr("event_id DIV 9").cast("string").alias("appsflyer_id"),
        F.col("ts").alias("install_time"),
        F.to_date("ts").alias("install_date"),
    )
    path = tempfile.mkdtemp(prefix="spark_graft_retention_")
    (
        sunk.write.mode("overwrite")
        .partitionBy("install_date")
        .parquet(path)
    )
    expire_partitions(spark, path, _RETENTION_CUTOFF)
    return (
        spark.read.parquet(path)
        .groupBy("install_date")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("install_time").alias("first_install"),
            F.max("install_time").alias("last_install"),
        )
    )


@register(
    "sink_compact_one_pass",
    f"""
    SELECT CAST(ts AS DATE) AS install_date,
           COUNT(*) AS n_rows,
           CAST(CEIL(COUNT(*) / {_COMPACT_TARGET_ROWS}.0) AS BIGINT)
             AS n_files,
           MIN(CAST(event_id // 9 AS VARCHAR)) AS min_key,
           MAX(CAST(event_id // 9 AS VARCHAR)) AS max_key
    FROM events
    GROUP BY install_date
    """,
)
def q_sink_compact_one_pass(spark, sf_dir):
    """Full-table compaction in ONE job (the many-small-partitions
    regime, where the per-date rewrite loop would schedule a job per
    date): a single shuffle by install_date with
    ``spark.sql.files.maxRecordsPerFile`` rolling output files at the
    target, plus sort_by clustering on the key so each rewritten
    file's footer min/max are disjoint (file-skipping scans;
    disjointness itself is pinned in tests/test_sink_maintenance.py —
    footers aren't SQL-visible). Graded here: per-date row counts,
    EXACT ceil(rows/target) file counts (every date's rows land in
    exactly one task, so the roll arithmetic is deterministic), and
    the per-date key extrema surviving the sorted rewrite."""
    from ..sinks.maintenance import compact_partitions

    ev = load(spark, sf_dir, "events")
    sunk = ev.select(
        F.expr("event_id DIV 9").cast("string").alias("appsflyer_id"),
        F.col("ts").alias("install_time"),
        F.to_date("ts").alias("install_date"),
    )
    path = tempfile.mkdtemp(prefix="spark_graft_compact1p_")
    (
        sunk.repartition(16)
        .write.mode("overwrite")
        .partitionBy("install_date")
        .parquet(path)
    )
    compact_partitions(
        spark,
        path,
        target_rows_per_file=_COMPACT_TARGET_ROWS,
        one_pass=True,
        sort_by=["appsflyer_id"],
    )
    return (
        spark.read.parquet(path)
        .groupBy("install_date")
        .agg(
            F.count("*").alias("n_rows"),
            F.count_distinct(F.col("_metadata.file_path")).alias("n_files"),
            F.min("appsflyer_id").alias("min_key"),
            F.max("appsflyer_id").alias("max_key"),
        )
    )


@register(
    "sink_snapshot_read_as_of",
    """
    SELECT CAST(event_id // 3 AS VARCHAR) AS appsflyer_id,
           user_id AS uid,
           event_type
    FROM events WHERE event_id % 3 IN (0, 1)
    """,
)
def q_sink_snapshot_read_as_of(spark, sf_dir):
    """Time travel on the manifest sink: three appends land as commit
    versions 0/1/2 in the manifest's snapshot log, and a
    ``version=1`` read resolves exactly the first two commits' parts
    from manifest METADATA alone (no directory listing, no data IO
    beyond the selected parts) — while the newest rows, already
    committed and physically present in the same directory, stay
    invisible. The oracle is the logical content of appends 0+1, so an
    as-of read that leaks version 2 (directory-listing reads), loses a
    commit, or mis-unions the log hash-mismatches. The snapshot log is
    what Delta/Iceberg keep in their commit journals, here on the
    sink's single-manifest protocol; vacuum/truncate_history retention
    is pinned in tests/test_datasource_sink.py."""
    spark.dataSource.register(ClickHouseBatchDataSource)
    ev = load(spark, sf_dir, "events")
    path = tempfile.mkdtemp(prefix="spark_graft_asof_") + "/staged"
    for residue in (0, 1, 2):
        out = ev.filter(F.col("event_id") % 3 == residue).select(
            F.expr("event_id DIV 3").cast("string").alias("appsflyer_id"),
            F.col("user_id").alias("uid"),
            "event_type",
        )
        (
            out.write.format("chbatch")
            .option("path", path)
            .option("batchsize", "500")
            .mode("append")
            .save()
        )
    return read_committed(spark, path, _DS_SCHEMA, version=1)


# ---------------------------------------------------------------------------
# sink_optimize_rewrite — OPTIMIZE as a REPLACE commit in the snapshot log
# ---------------------------------------------------------------------------

# rows per compacted output file. The three SFs' subset row counts
# (250 / 2,500 / 25,000) land on 1 / 2 / 13 output files — different
# bin-pack results at every SF, 13-way off the one-file corner — while
# staying below the 16 fragmented inputs so the rewrite is never a
# no-op.
_OPTIMIZE_TARGET_ROWS = 2_000


@register(
    "sink_optimize_rewrite",
    f"""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(user_id) AS BIGINT) AS sum_uid,
           MIN(event_type) AS min_type,
           CAST(CEIL(COUNT(*) / {_OPTIMIZE_TARGET_ROWS}.0) AS BIGINT)
             AS n_files
    FROM events WHERE event_id % 4 = 0
    """,
)
def q_sink_optimize_rewrite(spark, sf_dir):
    """OPTIMIZE on the MANIFEST sink (datasource_sink.optimize_sink):
    16 fragmented Arrow-tier parts are compacted into
    ceil(rows/target) files, published as a REPLACE commit that logs
    both the outputs and the parts they replace — current reads
    resolve only the compacted parts, retained pre-compaction
    versions still time-travel to the originals, and the originals
    stay on disk until truncate_history folds the log past the
    compaction and vacuum_sink reclaims them (the Delta
    OPTIMIZE→retention→VACUUM hand-off, pinned in
    tests/test_sink_optimize.py). Graded here: row count, content
    checksum, and the DISTINCT BACKING-FILE COUNT of the read-back
    (``_metadata.file_path``) against the oracle's own bin-pack
    arithmetic — a rewrite that no-ops, over-merges, or leaks a
    replaced part into the current snapshot hash-mismatches. The
    metadata commit is optimistic-concurrency checked (conflicts
    abort and discard the rewrite's outputs), so compaction never
    blocks concurrent appends — the property that lets a 100 TB sink
    compact continuously while ingesting."""
    from pyspark.sql import types as T

    from ..sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        optimize_sink,
        read_committed_parquet,
    )

    spark.dataSource.register(ClickHouseArrowDataSource)
    ev = load(spark, sf_dir, "events")
    out = ev.filter(F.col("event_id") % 4 == 0).select(
        F.col("user_id").alias("uid"),
        "event_type",
    )
    path = tempfile.mkdtemp(prefix="spark_graft_optimize_") + "/staged"
    (
        out.repartition(16)
        .write.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", "100000")
        .mode("append")
        .save()
    )
    schema = T.StructType(
        [
            T.StructField("uid", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    stats = optimize_sink(
        spark, path, schema, target_rows_per_file=_OPTIMIZE_TARGET_ROWS
    )
    assert stats["replaced"] == 16, stats  # the rewrite really ran
    return (
        read_committed_parquet(spark, path, schema)
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("uid").alias("sum_uid"),
            F.min("event_type").alias("min_type"),
            F.count_distinct(F.col("_metadata.file_path")).alias("n_files"),
        )
    )


# ---------------------------------------------------------------------------
# sink_stats_prune_read — data skipping over manifest per-file stats
# ---------------------------------------------------------------------------

_PRUNE_LO = "2024-01-12 00:00:00"
_PRUNE_HI = "2024-01-18 00:00:00"


@register(
    "sink_stats_prune_read",
    f"""
    SELECT user_id AS uid,
           event_type,
           ts,
           CAST(1 AS BIGINT) AS n_scanned
    FROM events
    WHERE ts BETWEEN TIMESTAMP '{_PRUNE_LO}' AND TIMESTAMP '{_PRUNE_HI}'
    """,
)
def q_sink_stats_prune_read(spark, sf_dir):
    """DATA SKIPPING on the manifest sink (datasource_sink.
    prune_files / read_committed_pruned): the Arrow tier records exact
    per-part min/max at flush time, and a range read resolves the
    predicate against manifest METADATA to decide which parts to scan
    before Spark plans a single task — Delta/Iceberg-style file
    skipping on the single-manifest protocol. Three appends land the
    events stream as time-correlated parts (the natural layout of
    continuous ingest); the pruned read of a mid-range window must
    select EXACTLY the middle part. Graded: every surviving row (stats
    prune files, the residual BETWEEN prunes rows — exactness is the
    filter's job, IO avoidance the stats') plus ``n_scanned``, the
    pruning decision itself — a stats layer that degrades to
    keep-everything returns 3 and hash-mismatches. At a 100 TB sink
    this is the difference between scanning a day and scanning the
    table. Conservative soundness (stats-less parts always kept,
    all-null parts pruned for range predicates, NaN refused) is pinned
    in tests/test_sink_stats.py."""
    import datetime

    from pyspark.sql import types as T

    from ..sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        prune_files,
        read_committed_pruned,
    )

    spark.dataSource.register(ClickHouseArrowDataSource)
    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"), "event_type", "ts"
    )
    path = tempfile.mkdtemp(prefix="spark_graft_prune_") + "/staged"
    splits = ("2024-01-11 00:00:00", "2024-01-21 00:00:00")
    windows = [
        ev.filter(F.col("ts") < F.lit(splits[0])),
        ev.filter(
            (F.col("ts") >= F.lit(splits[0])) & (F.col("ts") < F.lit(splits[1]))
        ),
        ev.filter(F.col("ts") >= F.lit(splits[1])),
    ]
    for w in windows:  # one time-correlated part per append
        (
            w.coalesce(1)
            .write.format("chbatch_arrow")
            .option("path", path)
            .option("batchsize", "1000000")
            .mode("append")
            .save()
        )
    schema = T.StructType(
        [
            T.StructField("uid", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    lo = datetime.datetime.fromisoformat(_PRUNE_LO)
    hi = datetime.datetime.fromisoformat(_PRUNE_HI)
    n_scanned = len(prune_files(path, "ts", lo, hi))
    return read_committed_pruned(
        spark, path, schema, "ts", lo, hi
    ).withColumn("n_scanned", F.lit(n_scanned).cast("long"))


# ---------------------------------------------------------------------------
# source_manifest_reader_asof — the sink's Data Source READ side
# ---------------------------------------------------------------------------


@register(
    "source_manifest_reader_asof",
    f"""
    SELECT user_id AS uid,
           event_type,
           ts
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND ts < TIMESTAMP '2024-01-21 00:00:00'
    """,
)
def q_source_manifest_reader_asof(spark, sf_dir):
    """The manifest sink read back through its own Data Source READER
    (sources/manifest_source.py): ``spark.read.format("chbatch_arrow")
    .option("version", 1)`` resolves the as-of snapshot (appends 0+1 of
    3) inside the DataSource protocol — one InputPartition per
    committed part, orphans invisible — and the residual ``ts >=``
    predicate travels through Catalyst's pushFilters into
    manifest-stats pruning before any task is planned (partition-level
    skip pinned in tests/test_manifest_source.py; conf is
    runtime-enabled here because the driver's plain session has Python
    pushdown off by default). Oracle = the two retained appends'
    window, so a reader that leaks commit 2, loses a part, or
    mis-applies the version log hash-mismatches."""
    import datetime

    from pyspark.sql import types as T

    from ..sinks.datasource_sink import ClickHouseArrowDataSource

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ClickHouseArrowDataSource)
    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"), "event_type", "ts"
    )
    path = tempfile.mkdtemp(prefix="spark_graft_mreader_") + "/staged"
    splits = ("2024-01-11 00:00:00", "2024-01-21 00:00:00")
    windows = [
        ev.filter(F.col("ts") < F.lit(splits[0])),
        ev.filter(
            (F.col("ts") >= F.lit(splits[0])) & (F.col("ts") < F.lit(splits[1]))
        ),
        ev.filter(F.col("ts") >= F.lit(splits[1])),
    ]
    for w in windows:
        (
            w.coalesce(1)
            .write.format("chbatch_arrow")
            .option("path", path)
            .option("batchsize", "1000000")
            .mode("append")
            .save()
        )
    schema = T.StructType(
        [
            T.StructField("uid", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    return (
        spark.read.format("chbatch_arrow")
        .schema(schema)
        .option("path", path)
        .option("version", "1")
        .load()
        .filter(F.col("ts") >= F.lit(datetime.datetime(2024, 1, 5)))
    )


# ---------------------------------------------------------------------------
# stream_sink_tail_source — the sink's snapshot log as a STREAM source
# ---------------------------------------------------------------------------


@register(
    "stream_sink_tail_source",
    """
    SELECT CAST(event_id AS VARCHAR) AS appsflyer_id,
           user_id AS uid,
           event_type
    FROM events WHERE event_id % 5 IN (0, 1, 2)
    """,
)
def q_stream_sink_tail_source(spark, sf_dir):
    """The manifest sink TAILED as a stream
    (``spark.readStream.format("chbatch")``): three batch appends land
    as commit versions 0/1/2 in the snapshot log, then an
    availableNow tail replays the log — offsets are manifest versions,
    each micro-batch reads exactly the files its append commits named,
    executor-side — into a parquet sink. The oracle is the union of
    the three appends, so a tail that double-emits a commit, loses
    one, or leaks an uncommitted part hash-mismatches. Exactly-once
    resume across restarts, REPLACE-commit skipping, and
    fold-past-offset refusal are pinned in
    tests/test_manifest_source.py — this entry grades the end-to-end
    loop that makes the sink a CDC source for downstream pipelines
    (the Delta 'table as stream' affordance on the single-manifest
    protocol)."""
    from pyspark.sql import types as T

    spark.dataSource.register(ClickHouseBatchDataSource)
    ev = load(spark, sf_dir, "events")
    path = tempfile.mkdtemp(prefix="spark_graft_tail_") + "/staged"
    for residue in (0, 1, 2):
        out = ev.filter(F.col("event_id") % 5 == residue).select(
            F.col("event_id").cast("string").alias("appsflyer_id"),
            F.col("user_id").alias("uid"),
            "event_type",
        )
        (
            out.write.format("chbatch")
            .option("path", path)
            # flush size keeps parts-per-commit (= tail read tasks)
            # small: the entry grades log-replay EXACTNESS; the
            # many-small-flushes regime is timed by the datasource
            # write entries
            .option("batchsize", "20000")
            .mode("append")
            .save()
        )
    schema = T.StructType(
        [
            T.StructField("appsflyer_id", T.StringType()),
            T.StructField("uid", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    out_dir = tempfile.mkdtemp(prefix="spark_graft_tail_out_") + "/out"
    ckpt = tempfile.mkdtemp(prefix="spark_graft_tail_ckpt_")
    q = (
        spark.readStream.format("chbatch")
        .schema(schema)
        .option("path", path)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(schema).parquet(out_dir)


# ---------------------------------------------------------------------------
# sink_optimize_clustered — sort_by clustering makes skipping selective
# ---------------------------------------------------------------------------


@register(
    "sink_optimize_clustered",
    """
    SELECT user_id AS uid,
           event_type,
           CAST(1 AS BIGINT) AS n_scanned
    FROM events
    WHERE user_id = (SELECT MIN(user_id) FROM events)
    """,
)
def q_sink_optimize_clustered(spark, sf_dir):
    """CLUSTERED rewrite on the manifest sink (optimize_sink
    ``sort_by`` — OPTIMIZE ZORDER's 1-D form on the single-manifest
    protocol): three interleaved appends each span the FULL uid range,
    so every part's [min,max] overlaps and stats skipping degenerates
    to keep-everything; the clustered rewrite range-partitions by uid
    and sorts within each output, making file key-ranges pairwise
    DISJOINT (equal keys colocate under repartitionByRange, so a key
    never straddles a boundary). Graded: a point probe at min(uid)
    must then prune to EXACTLY ONE part — ``n_scanned`` is the pruning
    decision; an unclustered layout or degraded stats return 3/20 and
    hash-mismatch — plus the probe's rows themselves (residual filter
    exactness). Range disjointness from footer-refreshed stats and the
    cluster-even-when-compact rule are pinned in
    tests/test_sink_optimize.py. At 100 TB this is the nightly
    cluster-by-user job that turns per-user lookups from table scans
    into single-file reads."""
    from pyspark.sql import types as T

    from ..sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        optimize_sink,
        prune_files,
        read_committed_pruned,
    )

    spark.dataSource.register(ClickHouseArrowDataSource)
    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"), "event_type", "event_id"
    )
    path = tempfile.mkdtemp(prefix="spark_graft_cluster_") + "/staged"
    for r in (0, 1, 2):  # interleaved: every part spans the uid range
        (
            ev.filter(F.col("event_id") % 3 == r)
            .drop("event_id")
            .coalesce(1)
            .write.format("chbatch_arrow")
            .option("path", path)
            .option("batchsize", "1000000")
            .mode("append")
            .save()
        )
    schema = T.StructType(
        [
            T.StructField("uid", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    optimize_sink(
        spark, path, schema, target_rows_per_file=5_000, sort_by=["uid"]
    )
    probe = ev.agg(F.min("uid")).first()[0]  # KB-bounded control state
    n_scanned = len(prune_files(path, "uid", probe, probe))
    return read_committed_pruned(
        spark, path, schema, "uid", probe, probe
    ).withColumn("n_scanned", F.lit(n_scanned).cast("long"))


# ---------------------------------------------------------------------------
# sink_history_versions — DESCRIBE HISTORY parity on the snapshot log
# ---------------------------------------------------------------------------


@register(
    "sink_history_versions",
    """
    SELECT CAST(0 AS BIGINT) AS v, 'append' AS op,
           CAST(16 AS BIGINT) AS n_files, CAST(NULL AS BIGINT) AS batch_id
    UNION ALL SELECT 1, 'append', 16, NULL
    UNION ALL SELECT 2, 'append', 16, NULL
    UNION ALL SELECT 3, 'compact',
      (SELECT CAST(CEIL(COUNT(*) / 5000.0) AS BIGINT) FROM events
       WHERE event_id % 6 IN (0, 1, 2)), NULL
    """,
)
def q_sink_history_versions(spark, sf_dir):
    """DESCRIBE HISTORY on the manifest sink (sink_versions): three
    16-way appends then an OPTIMIZE, and the returned version log must
    name each commit's version, operation type, and file count — the
    compact entry's count is the oracle's own ceil(rows/target)
    arithmetic, so the log is value-graded, not just shape-graded. A
    log that misnumbers versions, drops the replace entry, or
    misattributes files hash-mismatches. This is the audit surface a
    table format owes its operators: what changed, when, by which
    kind of commit (Delta's DESCRIBE HISTORY, on the single-manifest
    protocol); the underlying entries also drive time travel, the
    streaming tail, and vacuum reachability, all graded separately."""
    from pyspark.sql import types as T

    from ..sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        optimize_sink,
        sink_versions,
    )

    spark.dataSource.register(ClickHouseArrowDataSource)
    ev = load(spark, sf_dir, "events")
    path = tempfile.mkdtemp(prefix="spark_graft_history_") + "/staged"
    for r in (0, 1, 2):  # half the events, three disjoint commits
        (
            ev.filter(F.col("event_id") % 6 == r)
            .select(F.col("user_id").alias("uid"), "event_type")
            .repartition(16)
            .write.format("chbatch_arrow")
            .option("path", path)
            .option("batchsize", "1000000")
            .mode("append")
            .save()
        )
    schema = T.StructType(
        [
            T.StructField("uid", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    optimize_sink(spark, path, schema, target_rows_per_file=5_000)
    log_schema = T.StructType(
        [
            T.StructField("v", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("n_files", T.LongType()),
            T.StructField("batch_id", T.LongType()),
        ]
    )
    rows = [
        (e["v"], e["op"], e["n_files"], e["batch_id"])
        for e in sink_versions(path)
    ]
    return spark.createDataFrame(rows, log_schema)


# ---------------------------------------------------------------------------
# sink_restore_version — RESTORE as a first-class commit
# ---------------------------------------------------------------------------


@register(
    "sink_restore_version",
    """
    SELECT CAST(event_id // 3 AS VARCHAR) AS appsflyer_id,
           user_id AS uid,
           event_type,
           CAST(2 AS BIGINT) AS n_backing
    FROM events WHERE event_id % 3 IN (0, 1)
    """,
)
def q_sink_restore_version(spark, sf_dir):
    """RESTORE on the manifest sink (datasource_sink.restore_sink —
    Delta's RESTORE TABLE ... VERSION AS OF): three appends land as
    versions 0/1/2, then the CURRENT snapshot rolls back to v1 as a
    NEW commit (op='restore' in the log; no history rewrite, no file
    IO — pure metadata under the lock). Graded: the current read must
    serve exactly appends 0+1, and ``n_backing`` (distinct
    ``_metadata.file_path``) must be exactly the two original parts —
    an as-of read that didn't actually move the snapshot, or a
    restore that leaks the rolled-away commit's part, hash-mismatches.
    Reversibility, the rows-counter repair from the log's rows_total,
    vacuum protection of rolled-away parts, restore-across-compaction,
    and tail-skip of restore commits are pinned in
    tests/test_sink_restore.py. This completes the Delta verb set on
    the single-manifest protocol: append / time travel / OPTIMIZE
    (+clustered/Z-order) / VACUUM / HISTORY / RESTORE."""
    from pyspark.sql import types as T

    from ..sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        read_committed_parquet,
        restore_sink,
    )

    spark.dataSource.register(ClickHouseArrowDataSource)
    ev = load(spark, sf_dir, "events")
    path = tempfile.mkdtemp(prefix="spark_graft_restore_") + "/staged"
    for residue in (0, 1, 2):
        (
            ev.filter(F.col("event_id") % 3 == residue)
            .select(
                F.expr("event_id DIV 3").cast("string").alias("appsflyer_id"),
                F.col("user_id").alias("uid"),
                "event_type",
            )
            .coalesce(1)
            .write.format("chbatch_arrow")
            .option("path", path)
            .option("batchsize", "1000000")
            .mode("append")
            .save()
        )
    out = restore_sink(path, 1)
    assert out["changed"] and out["rows_repaired"], out
    schema = T.StructType(
        [
            T.StructField("appsflyer_id", T.StringType()),
            T.StructField("uid", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    backing = F.count_distinct(F.col("_metadata.file_path"))
    df = read_committed_parquet(spark, path, schema)
    n_backing = df.select(backing.alias("nb")).first()["nb"]
    return df.withColumn("n_backing", F.lit(int(n_backing)).cast("long"))


# ---------------------------------------------------------------------------
# sink_idempotent_txn — Delta-style txnAppId/txnVersion replay protection
# ---------------------------------------------------------------------------


@register(
    "sink_idempotent_txn",
    """
    SELECT CAST(event_id AS VARCHAR) AS appsflyer_id,
           user_id AS uid,
           event_type
    FROM events WHERE event_id % 6 IN (0, 3)
    """,
)
def q_sink_idempotent_txn(spark, sf_dir):
    """Idempotent BATCH writes (Delta's txnAppId/txnVersion on the
    manifest protocol): a backfill job writes its first slice under
    ('backfill', 1), RETRIES the identical write (the at-least-once
    reality of any job scheduler), then writes its second slice under
    ('backfill', 2). The manifest records the per-app high-water
    version under the commit lock, and the retry — same app, same
    version — is dropped whole, its parts deleted. The oracle is each
    slice exactly ONCE: a sink without the guard returns the first
    slice twice and hash-mismatches. This is the batch-mode twin of
    the stream tier's batchId idempotence — what a foreachBatch
    pipeline stamps with its epoch id so a replayed epoch cannot
    double-append (replay/independence/orphan-free pins in
    tests/test_sink_txn.py)."""
    from pyspark.sql import types as T

    spark.dataSource.register(ClickHouseBatchDataSource)
    ev = load(spark, sf_dir, "events")

    def slice_df(residue):
        return ev.filter(F.col("event_id") % 6 == residue).select(
            F.col("event_id").cast("string").alias("appsflyer_id"),
            F.col("user_id").alias("uid"),
            "event_type",
        )

    path = tempfile.mkdtemp(prefix="spark_graft_txn_") + "/staged"
    for residue, version in ((0, 1), (0, 1), (3, 2)):  # (0,1) twice!
        (
            slice_df(residue)
            .write.format("chbatch")
            .option("path", path)
            .option("batchsize", "5000")
            .option("txnAppId", "backfill")
            .option("txnVersion", str(version))
            .mode("append")
            .save()
        )
    schema = T.StructType(
        [
            T.StructField("appsflyer_id", T.StringType()),
            T.StructField("uid", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    return read_committed(spark, path, schema)


# ---------------------------------------------------------------------------
# sink_delete_where — copy-on-write DELETE as a REPLACE commit
# ---------------------------------------------------------------------------

_DELETE_LO = "2024-01-12 00:00:00"
_DELETE_HI = "2024-01-18 00:00:00"


@register(
    "sink_delete_where",
    f"""
    SELECT user_id AS uid,
           event_type,
           ts,
           CAST(1 AS BIGINT) AS n_rewritten
    FROM events
    WHERE NOT (ts >= TIMESTAMP '{_DELETE_LO}'
               AND ts < TIMESTAMP '{_DELETE_HI}')
    """,
)
def q_sink_delete_where(spark, sf_dir):
    """Row-level DELETE on the manifest sink, copy-on-write
    (mutations.delete_where): three time-correlated appends, then a
    time-scoped delete whose match scan is bounded by the same
    per-part stats the pruned reads use — the candidate set is ONE
    part, and only parts that actually contain matches are rewritten
    (a filter job over the touched scan: no repartition, no
    exchange). The commit is a REPLACE entry in the snapshot log
    (adds + removes + the predicate), so current reads see the
    post-delete table while retained versions still time-travel to
    the pre-delete rows (pinned in tests/test_sink_delete.py).
    Graded: every surviving row AND ``n_rewritten`` — a delete that
    rewrote all three parts (no pruning / no touch detection) or
    rewrote nothing returns a different literal and hash-mismatches.
    At a 100 TB sink this is GDPR erasure priced at the touched
    parts, not the table."""
    import datetime

    from pyspark.sql import types as T

    from ..sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        read_committed_parquet,
    )
    from ..sinks.mutations import delete_where

    spark.dataSource.register(ClickHouseArrowDataSource)
    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"), "event_type", "ts"
    )
    path = tempfile.mkdtemp(prefix="spark_graft_delete_") + "/staged"
    splits = (_DELETE_LO, _DELETE_HI)
    windows = [
        ev.filter(F.col("ts") < F.lit(splits[0])),
        ev.filter(
            (F.col("ts") >= F.lit(splits[0])) & (F.col("ts") < F.lit(splits[1]))
        ),
        ev.filter(F.col("ts") >= F.lit(splits[1])),
    ]
    for w in windows:  # one time-correlated part per append
        (
            w.write.format("chbatch_arrow")
            .option("path", path)
            .option("batchsize", "1000000")
            .mode("append")
            .save()
        )
    schema = T.StructType(
        [
            T.StructField("uid", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    lo = datetime.datetime.fromisoformat(_DELETE_LO)
    hi = datetime.datetime.fromisoformat(_DELETE_HI)
    r = delete_where(
        spark,
        path,
        schema,
        f"ts >= TIMESTAMP '{_DELETE_LO}' AND ts < TIMESTAMP '{_DELETE_HI}'",
        prune_column="ts",
        prune_lo=lo,
        prune_hi=hi - datetime.timedelta(microseconds=1),
    )
    # stats pruning scoped the scan to the middle part; the whole part
    # matched, so the rewrite produced no replacement file
    assert r["n_rewritten"] == 1 and r["n_kept"] == 0, r
    return read_committed_parquet(spark, path, schema).withColumn(
        "n_rewritten", F.lit(int(r["n_rewritten"])).cast("long")
    )


# ---------------------------------------------------------------------------
# sink_delete_dv — merge-on-read DELETE via deletion vectors
# ---------------------------------------------------------------------------


@register(
    "sink_delete_dv",
    """
    SELECT user_id AS uid,
           event_type,
           CAST(3 AS BIGINT) AS n_backing
    FROM events
    WHERE event_id % 97 != 0
    """,
)
def q_sink_delete_dv(spark, sf_dir):
    """Merge-on-read DELETE (deletion vectors): a sparse predicate —
    ~1% of rows spread across EVERY part — is exactly the case where
    copy-on-write is wrong (it would rewrite the whole table to drop
    a sliver). ``delete_where(mode='dv')`` records (file, row_index)
    vectors in the manifest and rewrites NOTHING; readers subtract
    them with a broadcast anti-join against the pinned
    ``_metadata`` file/position columns. Graded twice over: the
    surviving rows (a reader that misses the mask returns the
    deleted rows and hash-mismatches) AND ``n_backing`` — the
    DISTINCT backing-file count of the read-back, which must still
    be the THREE ORIGINAL parts (a delete that fell back to rewrite
    returns a different count). OPTIMIZE materializes the vectors
    away and restore/fold carry them exactly
    (tests/test_sink_delete.py). The Delta/Iceberg-v2 trade, on the
    single-manifest protocol."""
    from pyspark.sql import types as T

    from ..sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        _manifest_read,
        read_committed_parquet,
    )
    from ..sinks.mutations import delete_where

    spark.dataSource.register(ClickHouseArrowDataSource)
    ev = load(spark, sf_dir, "events").select(
        F.col("event_id").alias("eid"),
        F.col("user_id").alias("uid"),
        "event_type",
    )
    path = tempfile.mkdtemp(prefix="spark_graft_dv_") + "/staged"
    for residue in (0, 1, 2):  # three parts, matches in every one
        (
            ev.filter(F.col("eid") % 3 == residue)
            .write.format("chbatch_arrow")
            .option("path", path)
            .option("batchsize", "1000000")
            .mode("append")
            .save()
        )
    schema = T.StructType(
        [
            T.StructField("eid", T.LongType()),
            T.StructField("uid", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    files_before = sorted(_manifest_read(path)["files"])
    r = delete_where(spark, path, schema, "eid % 97 = 0", mode="dv")
    assert r["n_rewritten"] == 0 and r["deleted"] > 0, r
    assert sorted(_manifest_read(path)["files"]) == files_before
    df = read_committed_parquet(spark, path, schema)
    n_backing = df.select(
        F.count_distinct(F.col("_metadata.file_path")).alias("nb")
    ).first()["nb"]
    return df.select("uid", "event_type").withColumn(
        "n_backing", F.lit(int(n_backing)).cast("long")
    )


# ---------------------------------------------------------------------------
# sink_merge_manifest — MERGE INTO as one snapshot-log commit
# ---------------------------------------------------------------------------

_MERGE_MANIFEST_ORACLE = """
WITH initial AS (
  SELECT event_id AS eid, user_id AS uid, event_type
  FROM events WHERE event_id % 3 = 0
), batch AS (
  SELECT event_id AS eid, user_id + 1000000 AS uid,
         'updated' AS event_type
  FROM events WHERE event_id % 6 = 0 OR event_id % 5 = 4
)
SELECT coalesce(b.eid, i.eid) AS eid,
       coalesce(b.uid, i.uid) AS uid,
       coalesce(b.event_type, i.event_type) AS event_type
FROM initial i FULL JOIN batch b ON i.eid = b.eid
"""


@register("sink_merge_manifest", _MERGE_MANIFEST_ORACLE)
def q_sink_merge_manifest(spark, sf_dir):
    """MERGE INTO the manifest sink (mutations.merge_sink): the
    target holds the event_id%3=0 slice across four parts; the source
    batch overlaps it (%6=0 — matched, updated wholesale) and brings
    new keys (%5=4 ∖ %3=0 — inserted). One snapshot-log commit
    publishes the whole upsert: touched parts are rewritten as
    (kept ∪ updated) with the source keys BROADCAST on both the
    touch-detection semi-join and the anti-join — the big side never
    shuffles — and inserts land as fresh adds in the same commit, so
    a reader never observes a half-merged table. The oracle is the
    independent FULL JOIN + coalesce statement of MERGE semantics;
    duplicate source keys raise (Delta's multiple-matches error,
    pinned in tests/test_sink_delete.py). This is the CDC-upsert the
    reference's insert-only sink cannot express."""
    from pyspark.sql import types as T

    from ..sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        read_committed_parquet,
    )
    from ..sinks.mutations import merge_sink

    spark.dataSource.register(ClickHouseArrowDataSource)
    ev = load(spark, sf_dir, "events")
    initial = ev.filter(F.col("event_id") % 3 == 0).select(
        F.col("event_id").alias("eid"),
        F.col("user_id").alias("uid"),
        "event_type",
    )
    path = tempfile.mkdtemp(prefix="spark_graft_merge_") + "/staged"
    (
        initial.repartition(4)
        .write.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", "1000000")
        .mode("append")
        .save()
    )
    schema = T.StructType(
        [
            T.StructField("eid", T.LongType()),
            T.StructField("uid", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    batch = ev.filter(
        (F.col("event_id") % 6 == 0) | (F.col("event_id") % 5 == 4)
    ).select(
        F.col("event_id").alias("eid"),
        (F.col("user_id") + 1000000).alias("uid"),
        F.lit("updated").alias("event_type"),
    )
    r = merge_sink(spark, path, schema, batch, ["eid"])
    assert r["updated"] > 0 and r["inserted"] > 0, r
    return read_committed_parquet(spark, path, schema)


# ---------------------------------------------------------------------------
# sink_constraint_enforce — commit-time CHECK constraints from part stats
# ---------------------------------------------------------------------------


@register(
    "sink_constraint_enforce",
    """
    SELECT user_id AS uid, event_type
    FROM events WHERE event_id % 4 IN (0, 1)
    """,
)
def q_sink_constraint_enforce(spark, sf_dir):
    """CHECK constraints on the manifest sink (datasource_sink.
    add_constraint): NOT NULL + range invariants validated at COMMIT
    time from the per-part stats both writer tiers already record —
    metadata arithmetic under the manifest lock, zero data IO at any
    table size (an arbitrary-SQL CHECK needs a scan per commit; a
    100 TB ingest can't pay that, and range/not-null are the schema
    invariants a sink actually enforces). Sequence graded here: a
    valid slice commits; a VIOLATING slice (uid negated) is rejected
    whole — its parts deleted, the manifest untouched; a second valid
    slice commits. The oracle is exactly the two valid slices, so a
    sink that let the bad batch through (or lost a good one rolling
    back) hash-mismatches. ADD CONSTRAINT itself validates existing
    data fail-closed (no stats = cannot verify = refused); stream
    micro-batch commits enforce identically
    (tests/test_sink_constraints.py)."""
    from pyspark.sql import types as T

    from ..sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        add_constraint,
        read_committed_parquet,
    )

    spark.dataSource.register(ClickHouseArrowDataSource)
    ev = load(spark, sf_dir, "events")
    schema = T.StructType(
        [
            T.StructField("uid", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )

    def slice_df(residue, negate=False):
        uid = F.col("user_id")
        if negate:
            uid = -uid - 1  # strictly negative: provably violating
        return ev.filter(F.col("event_id") % 4 == residue).select(
            uid.alias("uid"), "event_type"
        )

    path = tempfile.mkdtemp(prefix="spark_graft_check_") + "/staged"
    writer = lambda df: (  # noqa: E731
        df.write.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", "1000000")
        .mode("append")
        .save()
    )
    writer(slice_df(0))
    add_constraint(path, "uid_nonneg", "uid", not_null=True, min=0)
    rejected = False
    try:
        writer(slice_df(1, negate=True))
    except Exception:
        rejected = True
    assert rejected, "violating commit was accepted"
    writer(slice_df(1))
    return read_committed_parquet(spark, path, schema)


# ---------------------------------------------------------------------------
# sink_change_data_feed — per-commit insert/delete rows from the log
# ---------------------------------------------------------------------------

_CDF_ORACLE = """
WITH base AS (
  SELECT event_id AS eid, user_id AS uid, event_type FROM events
)
SELECT eid, uid, event_type,
       'insert' AS _change_type, CAST(0 AS BIGINT) AS _commit_version
FROM base WHERE eid % 6 = 0
UNION ALL
SELECT eid, uid, event_type, 'insert', 1
FROM base WHERE eid % 6 = 3
UNION ALL
SELECT eid, uid, event_type, 'delete', 2
FROM base WHERE eid % 6 IN (0, 3) AND eid % 50 = 0
UNION ALL
SELECT eid, uid, event_type, 'delete', 3
FROM base
WHERE eid % 6 IN (0, 3) AND NOT eid % 50 = 0 AND uid % 7 = 3
"""


@register("sink_change_data_feed", _CDF_ORACLE)
def q_sink_change_data_feed(spark, sf_dir):
    """CHANGE DATA FEED (datasource_sink.table_changes — Delta's
    table_changes on the single-manifest protocol): two appends, a
    merge-on-read (deletion-vector) delete, and a copy-on-write
    delete; the feed must reproduce every logical row change tagged
    with its change type and commit version. The commit-bounded fast
    paths are what make this a 100 TB feature: appends read exactly
    their own files, the dv delete reads only the recorded positions
    (broadcast position semi-join over just the named parts), and
    OPTIMIZE commits emit NOTHING without IO; only rewrite-style
    commits pay a snapshot diff offline (production writes CDF
    sidecars at commit time — same protocol, earlier
    materialization). The oracle states each commit's change set
    independently from events, so a feed that leaks compaction rows,
    misses a dv position, or mis-versions a change hash-mismatches.
    Downstream-materialization equivalence at every version is pinned
    in tests/test_sink_cdf.py."""
    from pyspark.sql import types as T

    from ..sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        table_changes,
    )
    from ..sinks.mutations import delete_where

    spark.dataSource.register(ClickHouseArrowDataSource)
    ev = load(spark, sf_dir, "events").select(
        F.col("event_id").alias("eid"),
        F.col("user_id").alias("uid"),
        "event_type",
    )
    schema = T.StructType(
        [
            T.StructField("eid", T.LongType()),
            T.StructField("uid", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    path = tempfile.mkdtemp(prefix="spark_graft_cdf_") + "/staged"
    for residue in (0, 3):  # commits v0, v1
        (
            ev.filter(F.col("eid") % 6 == residue)
            .write.format("chbatch_arrow")
            .option("path", path)
            .option("batchsize", "1000000")
            .mode("append")
            .save()
        )
    r_dv = delete_where(spark, path, schema, "eid % 50 = 0", mode="dv")
    assert r_dv["n_rewritten"] == 0 and r_dv["deleted"] > 0, r_dv
    r_cow = delete_where(spark, path, schema, "uid % 7 = 3")
    assert r_cow["n_rewritten"] > 0, r_cow
    return table_changes(spark, path, schema, 0, 3)


# ---------------------------------------------------------------------------
# sink_update_where — copy-on-write UPDATE as a REPLACE commit
# ---------------------------------------------------------------------------


@register(
    "sink_update_where",
    """
    SELECT user_id AS uid,
           CASE WHEN user_id % 11 = 0 THEN 'flagged' ELSE event_type
             END AS event_type,
           CASE WHEN user_id % 11 = 0 THEN user_id + 1000000
             ELSE user_id END AS adjusted
    FROM events WHERE event_id % 2 = 0
    """,
)
def q_sink_update_where(spark, sf_dir):
    """Row-level UPDATE on the manifest sink
    (mutations.update_where): SET event_type='flagged',
    adjusted=uid+1000000 WHERE uid%11=0, copy-on-write — the same
    touch-detection + bounded-rewrite machinery as DELETE, with the
    row transform a single CASE WHEN projection that sees the
    PRE-update row (SQL UPDATE semantics; no shuffle, no repartition,
    cardinality unchanged by construction). Published as a REPLACE
    commit (op='update' with the predicate and assigned columns in
    the log) so time travel reaches the pre-update rows and the
    change feed shows each update as delete(old)+insert(new)
    (tests/test_sink_delete.py). The oracle applies the identical
    CASE WHEN to the source slice — a sink that updated the wrong
    rows, double-applied the transform, or lost cardinality
    hash-mismatches."""
    from pyspark.sql import types as T

    from ..sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        read_committed_parquet,
    )
    from ..sinks.mutations import update_where

    spark.dataSource.register(ClickHouseArrowDataSource)
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 2 == 0)
    out = ev.select(
        F.col("user_id").alias("uid"),
        "event_type",
        F.col("user_id").alias("adjusted"),
    )
    path = tempfile.mkdtemp(prefix="spark_graft_update_") + "/staged"
    (
        out.repartition(4)
        .write.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", "1000000")
        .mode("append")
        .save()
    )
    schema = T.StructType(
        [
            T.StructField("uid", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("adjusted", T.LongType()),
        ]
    )
    r = update_where(
        spark,
        path,
        schema,
        "uid % 11 = 0",
        {"event_type": "'flagged'", "adjusted": "adjusted + 1000000"},
    )
    assert r["updated"] > 0, r
    return read_committed_parquet(spark, path, schema)


# ---------------------------------------------------------------------------
# stream_sink_changefeed — the change feed as a STREAM source
# ---------------------------------------------------------------------------


@register(
    "stream_sink_changefeed",
    """
    SELECT user_id AS uid, event_type,
           'insert' AS _change_type,
           CAST(CASE WHEN event_id % 4 = 0 THEN 0 ELSE 1 END AS BIGINT)
             AS _commit_version
    FROM events WHERE event_id % 4 IN (0, 1)
    UNION ALL
    SELECT user_id AS uid, event_type, 'delete', 2
    FROM events WHERE event_id % 4 IN (0, 1) AND event_id % 100 = 0
    """,
)
def q_stream_sink_changefeed(spark, sf_dir):
    """The CHANGE FEED tailed as a STREAM
    (``readStream.option("changefeed", "true")`` — Delta's
    readChangeFeed): two appends and a merge-on-read delete land in
    the log; the stream replays them as CHANGE rows — inserts from
    exactly the append commits' own files, delete rows read from
    exactly the recorded dv positions (one ``take`` per named part),
    OPTIMIZE commits skipped without IO. Offsets stay manifest
    versions, so exactly-once resume carries over from the plain
    tail. Rewrite-style commits fail the stream loudly (their change
    rows need a snapshot diff — production materializes CDF sidecars
    at commit; the batch table_changes API serves them offline). The
    oracle states each commit's change rows independently; a feed
    that leaks compaction rows, drops a delete, or mis-versions a
    change hash-mismatches. This closes the CDC loop WITH deletes:
    pipeline → sink → downstream change consumer, one commit
    protocol end to end."""
    from pyspark.sql import types as T

    from ..sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        optimize_sink,
    )
    from ..sinks.mutations import delete_where

    spark.dataSource.register(ClickHouseArrowDataSource)
    ev = load(spark, sf_dir, "events")
    schema = T.StructType(
        [
            T.StructField("eid", T.LongType()),
            T.StructField("uid", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    path = tempfile.mkdtemp(prefix="spark_graft_cdfs_") + "/staged"
    for residue in (0, 1):  # commits v0, v1
        (
            ev.filter(F.col("event_id") % 4 == residue)
            .select(
                F.col("event_id").alias("eid"),
                F.col("user_id").alias("uid"),
                "event_type",
            )
            .write.format("chbatch_arrow")
            .option("path", path)
            .option("batchsize", "1000000")
            .mode("append")
            .save()
        )
    r = delete_where(spark, path, schema, "eid % 100 = 0", mode="dv")
    assert r["n_rewritten"] == 0 and r["deleted"] > 0, r
    st = optimize_sink(spark, path, schema, target_rows_per_file=100_000)
    assert st["replaced"] > 0, st  # the feed must NOT emit these rows
    cdf_schema = T.StructType(
        [
            *schema.fields,
            T.StructField("_change_type", T.StringType()),
            T.StructField("_commit_version", T.LongType()),
        ]
    )
    out_dir = tempfile.mkdtemp(prefix="spark_graft_cdfs_out_") + "/out"
    ckpt = tempfile.mkdtemp(prefix="spark_graft_cdfs_ckpt_")
    q = (
        spark.readStream.format("chbatch_arrow")
        .schema(cdf_schema)
        .option("path", path)
        .option("changefeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.schema(cdf_schema)
        .parquet(out_dir)
        .select("uid", "event_type", "_change_type", "_commit_version")
    )


# ---------------------------------------------------------------------------
# sink_rename_column — column mapping: RENAME without rewriting data
# ---------------------------------------------------------------------------


@register(
    "sink_rename_column",
    """
    SELECT user_id AS uid,
           event_type AS category,
           CAST(2 AS BIGINT) AS n_backing
    FROM events WHERE event_id % 3 IN (0, 1)
    """,
)
def q_sink_rename_column(spark, sf_dir):
    """RENAME COLUMN without rewriting a byte
    (datasource_sink.rename_column — Delta/Iceberg column mapping on
    the manifest protocol): a first append lands under the old name
    (event_type), the rename records a logical→physical alias in the
    manifest, a second append writes the NEW name (category), and the
    Data Source reader serves BOTH generations under one logical
    schema — each part's physical name resolved executor-side from
    the alias map riding in its InputPartition. Graded: the unified
    rows AND ``n_backing`` = the distinct backing-part count, which
    must be the two ORIGINAL parts — a rename that fell back to a
    rewrite, NULL-filled the pre-rename part (the silent failure this
    design forbids — the plain parquet readers refuse instead), or
    dropped the alias map on the second append's manifest rebuild
    hash-mismatches. OPTIMIZE materializes renames and clears the
    map; chained renames, constraint follow-through, alias-aware
    stats pruning, and dv interaction are pinned in
    tests/test_sink_rename.py."""
    from pyspark.sql import types as T

    from ..sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        _manifest_read,
        rename_column,
    )

    spark.dataSource.register(ClickHouseArrowDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    ev = load(spark, sf_dir, "events")
    path = tempfile.mkdtemp(prefix="spark_graft_rename_") + "/staged"
    (
        ev.filter(F.col("event_id") % 3 == 0)
        .select(F.col("user_id").alias("uid"), "event_type")
        .write.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", "1000000")
        .mode("append")
        .save()
    )
    rename_column(path, "event_type", "category")
    (
        ev.filter(F.col("event_id") % 3 == 1)
        .select(
            F.col("user_id").alias("uid"),
            F.col("event_type").alias("category"),
        )
        .write.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", "1000000")
        .mode("append")
        .save()
    )
    schema = T.StructType(
        [
            T.StructField("uid", T.LongType()),
            T.StructField("category", T.StringType()),
        ]
    )
    df = (
        spark.read.format("chbatch_arrow")
        .schema(schema)
        .option("path", path)
        .load()
    )
    n_backing = len(_manifest_read(path)["files"])
    return df.withColumn(
        "n_backing", F.lit(int(n_backing)).cast("long")
    )


# ---------------------------------------------------------------------------
# sink_shallow_clone — zero-copy clone, independent divergence
# ---------------------------------------------------------------------------


@register(
    "sink_shallow_clone",
    """
    SELECT user_id AS uid, event_type,
           CAST(1 AS BIGINT) AS n_foreign
    FROM events WHERE event_id % 5 IN (0, 1, 2)
    """,
)
def q_sink_shallow_clone(spark, sf_dir):
    """SHALLOW CLONE (datasource_sink.clone_sink — Delta's CLONE
    SHALLOW): the clone's manifest references the source's part by
    ABSOLUTE PATH — zero bytes copied at any table size — and then
    diverges independently: a clone-local append lands in the clone's
    own directory while the source never changes. Graded: the clone's
    content after the divergence (source slice ∪ clone-only slice —
    a clone that copied stale data, missed the foreign reference, or
    leaked its append back to the source hash-mismatches) plus
    ``n_foreign``, the count of absolute part references, which pins
    that the read really crossed directories instead of copying.
    Clone-side VACUUM never reaps source parts; OPTIMIZE localizes
    the foreign references and cuts the source dependency; mutations
    refuse until then (tests/test_sink_clone.py)."""
    import os as _os

    from pyspark.sql import types as T

    from ..sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        _manifest_read,
        clone_sink,
        read_committed_parquet,
    )

    spark.dataSource.register(ClickHouseArrowDataSource)
    ev = load(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="spark_graft_clone_") + "/src"
    (
        ev.filter(F.col("event_id") % 5 < 2)
        .select(F.col("user_id").alias("uid"), "event_type")
        .repartition(1)
        .write.format("chbatch_arrow")
        .option("path", src)
        .option("batchsize", "10000000")
        .mode("append")
        .save()
    )
    dst = tempfile.mkdtemp(prefix="spark_graft_clone_") + "/dst"
    r = clone_sink(src, dst)
    assert r["n_parts"] == 1, r
    (
        ev.filter(F.col("event_id") % 5 == 2)
        .select(F.col("user_id").alias("uid"), "event_type")
        .write.format("chbatch_arrow")
        .option("path", dst)
        .option("batchsize", "10000000")
        .mode("append")
        .save()
    )
    src_rows = len(_manifest_read(src)["files"])
    assert src_rows == 1  # the source never saw the clone's append
    n_foreign = sum(
        1 for f in _manifest_read(dst)["files"] if _os.path.isabs(f)
    )
    schema = T.StructType(
        [
            T.StructField("uid", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    return read_committed_parquet(spark, dst, schema).withColumn(
        "n_foreign", F.lit(int(n_foreign)).cast("long")
    )


# ---------------------------------------------------------------------------
# stream_changefeed_apply — the CDC loop WITH DELETES, end to end
# ---------------------------------------------------------------------------


@register(
    "stream_changefeed_apply",
    """
    SELECT event_id AS eid, user_id AS uid, event_type
    FROM events
    WHERE event_id % 8 IN (0, 4)
      AND NOT event_id % 80 = 0
      AND NOT user_id % 9 = 2
    """,
)
def q_stream_changefeed_apply(spark, sf_dir):
    """The CDC loop WITH DELETES, one commit protocol end to end: a
    producer appends two commits, merge-on-read-deletes a sparse set
    (deletion vectors), then copy-on-write-deletes a predicate WITH
    ``write_cdf=True`` (commit-time sidecars); a downstream consumer
    tails the CHANGE FEED as a stream and MATERIALIZES it — per key,
    net = Σ(+insert/−delete), keys with net=1 survive with their
    values — converging to exactly the upstream table state. This is
    the consumer contract the batch tests pin
    (test_cdf_materialization_reproduces_every_version), here run
    through the streaming source against an oracle that states the
    surviving rows independently: a feed that leaks compaction rows,
    drops a dv position, misses the sidecar commit, or double-applies
    a change breaks the net arithmetic and hash-mismatches.

    Scale shape: the tail reads change rows commit-bounded (appends =
    their own files, dv deletes = recorded positions, CoW = its
    sidecars); the apply is ONE keyed aggregation whose state is
    bounded by live keys — the same footprint as any streaming
    upsert materialization."""
    import uuid as _uuid

    from pyspark.sql import types as T

    from ..sinks.mutations import delete_where
    from .streaming_queries import stream_shuffle_partitions

    from ..sinks.datasource_sink import ClickHouseArrowDataSource

    spark.dataSource.register(ClickHouseArrowDataSource)
    ev = load(spark, sf_dir, "events")
    schema = T.StructType(
        [
            T.StructField("eid", T.LongType()),
            T.StructField("uid", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    path = tempfile.mkdtemp(prefix="spark_graft_cfapply_") + "/staged"
    for residue in (0, 4):
        (
            ev.filter(F.col("event_id") % 8 == residue)
            .select(
                F.col("event_id").alias("eid"),
                F.col("user_id").alias("uid"),
                "event_type",
            )
            .write.format("chbatch_arrow")
            .option("path", path)
            .option("batchsize", "1000000")
            .mode("append")
            .save()
        )
    r1 = delete_where(spark, path, schema, "eid % 80 = 0", mode="dv")
    assert r1["deleted"] > 0 and r1["n_rewritten"] == 0, r1
    r2 = delete_where(
        spark, path, schema, "uid % 9 = 2", write_cdf=True
    )
    assert r2["n_rewritten"] > 0, r2

    cdf_schema = T.StructType(
        [
            *schema.fields,
            T.StructField("_change_type", T.StringType()),
            T.StructField("_commit_version", T.LongType()),
        ]
    )
    name = f"cf_apply_{_uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="spark_graft_cfapply_ckpt_")
    with stream_shuffle_partitions(spark):
        q = (
            spark.readStream.format("chbatch_arrow")
            .schema(cdf_schema)
            .option("path", path)
            .option("changefeed", "true")
            .load()
            .groupBy("eid", "uid", "event_type")
            .agg(
                F.sum(
                    F.when(F.col("_change_type") == "insert", 1)
                    .otherwise(-1)
                ).alias("net")
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(name)
        .filter(F.col("net") == 1)
        .select("eid", "uid", "event_type")
    )


# ---------------------------------------------------------------------------
# sink_merge_tombstones — CDC apply with the WHEN MATCHED DELETE clause
# ---------------------------------------------------------------------------

_TOMB_ORACLE = """
SELECT event_id AS eid, user_id AS uid, event_type
FROM events WHERE event_id % 3 = 0 AND NOT event_id % 6 = 0
UNION ALL
SELECT event_id, user_id + 1000000, 'updated'
FROM events WHERE event_id % 6 = 0 AND NOT event_id % 12 = 0
UNION ALL
SELECT event_id, user_id + 1000000, 'updated'
FROM events WHERE event_id % 3 = 1 AND event_id % 5 = 0
"""


@register("sink_merge_tombstones", _TOMB_ORACLE)
def q_sink_merge_tombstones(spark, sf_dir):
    """CDC apply with TOMBSTONES (mutations.merge_sink's
    delete_predicate — SQL MERGE's WHEN MATCHED AND pred THEN
    DELETE): one batch carries an ``op`` column OUTSIDE the sink
    schema — 'd' rows delete their matched target, 'u' rows update
    or insert — applied as ONE snapshot-log commit. The predicate
    evaluates on the full source frame (the op column never lands in
    the table); unmatched tombstones are no-ops; the same broadcast
    touch-detection bounds the rewrite to the parts that contain
    matched keys. The oracle states the post-apply table
    independently (surviving originals ∪ updates ∪ inserts), so an
    apply that deletes the wrong rows, resurrects a tombstoned key,
    or drops an update hash-mismatches. This is how a Debezium-style
    upsert/delete stream lands in the table format — the verb
    `stream_changefeed_apply` consumes from the other side."""
    from pyspark.sql import types as T

    from ..sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        read_committed_parquet,
    )
    from ..sinks.mutations import merge_sink

    spark.dataSource.register(ClickHouseArrowDataSource)
    ev = load(spark, sf_dir, "events")
    schema = T.StructType(
        [
            T.StructField("eid", T.LongType()),
            T.StructField("uid", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    path = tempfile.mkdtemp(prefix="spark_graft_tomb_") + "/staged"
    (
        ev.filter(F.col("event_id") % 3 == 0)
        .select(
            F.col("event_id").alias("eid"),
            F.col("user_id").alias("uid"),
            "event_type",
        )
        .repartition(4)
        .write.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", "1000000")
        .mode("append")
        .save()
    )
    upserts = ev.filter(
        (F.col("event_id") % 6 == 0)
        | ((F.col("event_id") % 3 == 1) & (F.col("event_id") % 5 == 0))
    ).select(
        F.col("event_id").alias("eid"),
        (F.col("user_id") + 1_000_000).alias("uid"),
        F.lit("updated").alias("event_type"),
        F.when(F.col("event_id") % 12 == 0, "d")
        .otherwise("u")
        .alias("op"),
    )
    r = merge_sink(
        spark, path, schema, upserts, ["eid"], delete_predicate="op = 'd'"
    )
    assert r["deleted"] > 0 and r["updated"] > 0 and r["inserted"] > 0, r
    return read_committed_parquet(spark, path, schema)


# ---------------------------------------------------------------------------
# sink_commit_log — the table format on per-commit log records
# ---------------------------------------------------------------------------


@register(
    "sink_commit_log",
    """
    SELECT event_id AS eid, user_id AS uid, event_type
    FROM events
    WHERE event_id % 4 IN (0, 1)
      AND NOT event_id % 60 = 0
      AND NOT user_id % 9 = 2
    """,
)
def q_sink_commit_log(spark, sf_dir):
    """The COMMIT-LOG storage mode end to end (sinks/commit_log.py —
    VERDICT r7 task 1): a log-enabled sink takes two appends, a
    merge-on-read (deletion-vector) delete, and a copy-on-write
    delete, each published as ONE O(delta) record in ``_chlog/``
    instead of an O(parts) manifest rewrite — the Delta
    log-segments-plus-checkpoint design on the chbatch protocol, the
    difference between a commit that writes a sub-KB delta and one
    that rewrites a multi-hundred-MB document at ~10^6 parts.
    ``checkpoint_interval=2`` forces a MID-SEQUENCE checkpoint roll,
    so the graded read resolves checkpoint + pending records, not
    just a pristine log. The oracle states the final logical state
    independently from events: a fold that double-applies a record,
    drops a deletion vector at the roll, or loses a commit's adds
    hash-mismatches. Mode-equivalence over the full verb set and the
    flat-commit-cost pin at 100k parts live in tests/test_commit_log.py
    and tests/test_manifest_scale.py."""
    from pyspark.sql import types as T

    from ..sinks.commit_log import enable_commit_log
    from ..sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        read_committed_parquet,
        sink_versions,
    )
    from ..sinks.mutations import delete_where

    spark.dataSource.register(ClickHouseArrowDataSource)
    ev = load(spark, sf_dir, "events").select(
        F.col("event_id").alias("eid"),
        F.col("user_id").alias("uid"),
        "event_type",
    )
    schema = T.StructType(
        [
            T.StructField("eid", T.LongType()),
            T.StructField("uid", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    path = tempfile.mkdtemp(prefix="spark_graft_clog_") + "/staged"
    enable_commit_log(path, checkpoint_interval=2)
    for residue in (0, 1):  # commits v0 (checkpoint), v1 (record)
        (
            ev.filter(F.col("eid") % 4 == residue)
            .write.format("chbatch_arrow")
            .option("path", path)
            .option("batchsize", "1000000")
            .mode("append")
            .save()
        )
    r_dv = delete_where(spark, path, schema, "eid % 60 = 0", mode="dv")
    assert r_dv["n_rewritten"] == 0, r_dv
    r_cow = delete_where(spark, path, schema, "uid % 9 = 2")
    assert r_cow["n_rewritten"] > 0, r_cow
    # the full version log survives the checkpoint rolls
    assert [e["v"] for e in sink_versions(path)] == [0, 1, 2, 3]
    return read_committed_parquet(spark, path, schema)


# ---------------------------------------------------------------------------
# sink_type_widening — int->long / float->double evolution at read time
# ---------------------------------------------------------------------------


@register(
    "sink_type_widening",
    """
    SELECT CAST(event_id AS BIGINT) AS eid,
           CAST(CAST(value AS REAL) AS DOUBLE) AS amt
    FROM events WHERE event_id % 9 = 0
    UNION ALL
    SELECT CAST(event_id AS BIGINT) AS eid,
           CAST(value AS DOUBLE) AS amt
    FROM events WHERE event_id % 9 = 1
    """,
)
def q_sink_type_widening(spark, sf_dir):
    """TYPE-WIDENING schema evolution on the manifest reader (VERDICT
    r7 task 6): part A lands physically NARROW (int32 eid, float32
    amt — a table written before an ALTER COLUMN TYPE), part B lands
    wide (int64/double); one read under the WIDE schema casts part A
    per part on the Arrow path and passes part B through zero-copy —
    history is never rewritten, the only affordable evolution at
    100 TB (Delta's type widening table feature). The oracle states
    both parts' values with the matching float32 round-trip
    (CAST(REAL) for part A), so a reader that skips the cast, loses
    precision differently, or silently narrows hash-mismatches.
    Narrowing refusal and the per-part cast mechanics are pinned in
    tests/test_manifest_source.py."""
    from pyspark.sql import types as T

    from ..sinks.datasource_sink import ClickHouseArrowDataSource

    spark.dataSource.register(ClickHouseArrowDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    ev = load(spark, sf_dir, "events")
    path = tempfile.mkdtemp(prefix="spark_graft_widen_") + "/staged"
    narrow = ev.filter(F.col("event_id") % 9 == 0).select(
        F.col("event_id").cast("int").alias("eid"),
        F.col("value").cast("float").alias("amt"),
    )
    (
        narrow.write.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", "1000000")
        .mode("append")
        .save()
    )
    wide = ev.filter(F.col("event_id") % 9 == 1).select(
        F.col("event_id").cast("long").alias("eid"),
        F.col("value").cast("double").alias("amt"),
    )
    (
        wide.write.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", "1000000")
        .mode("append")
        .save()
    )
    wide_schema = T.StructType(
        [
            T.StructField("eid", T.LongType()),
            T.StructField("amt", T.DoubleType()),
        ]
    )
    return (
        spark.read.format("chbatch_arrow")
        .schema(wide_schema)
        .option("path", path)
        .load()
    )


# ---------------------------------------------------------------------------
# stream_sink_commit_log — streaming micro-batches as O(delta) records
# ---------------------------------------------------------------------------


@register(
    "stream_sink_commit_log",
    """
    SELECT CAST(event_id AS VARCHAR) AS appsflyer_id,
           user_id AS uid,
           event_type
    FROM events WHERE event_id % 7 = 2
    """,
)
def q_stream_sink_commit_log(spark, sf_dir):
    """The STREAMING tier writing into a commit-log table
    (sinks/commit_log.py): each micro-batch commit is one O(delta)
    record instead of an O(parts) manifest rewrite — at streaming
    cadence (a one-minute trigger = ~500k commits/year) this is
    exactly where the single-file rewrite hurts first, and
    checkpoint_interval bounds both the read tail and the write
    amplification. checkpoint_interval=2 forces mid-stream folds;
    the exactly-once batchId guard and lineage tracking ride the
    record's `set` fields through the fold unchanged (pinned in
    tests/test_commit_log.py). Oracle = the filtered events slice: a
    fold that drops a micro-batch's adds or double-applies a record
    hash-mismatches."""
    import uuid as _uuid

    from pyspark.sql import types as T

    from ..sinks.commit_log import enable_commit_log
    from ..sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        read_committed_parquet,
    )

    spark.dataSource.register(ClickHouseArrowDataSource)
    ev = load(spark, sf_dir, "events")
    src_dir = tempfile.mkdtemp(prefix="spark_graft_sclog_src_") + "/src"
    out = ev.filter(F.col("event_id") % 7 == 2).select(
        F.col("event_id").cast("string").alias("appsflyer_id"),
        F.col("user_id").alias("uid"),
        "event_type",
    )
    # 4 source files -> maxFilesPerTrigger=1 yields 4 micro-batches,
    # so the log takes multiple records AND rolls a checkpoint
    out.repartition(4).write.parquet(src_dir)
    schema = T.StructType(
        [
            T.StructField("appsflyer_id", T.StringType()),
            T.StructField("uid", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    path = tempfile.mkdtemp(prefix="spark_graft_sclog_") + "/staged"
    enable_commit_log(path, checkpoint_interval=2)
    ckpt = tempfile.mkdtemp(prefix="spark_graft_sclog_ckpt_")
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
        .writeStream.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", "1000000")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return read_committed_parquet(spark, path, schema)


# ---------------------------------------------------------------------------
# sink_commit_log_parquet — columnar checkpoints under the graded read
# ---------------------------------------------------------------------------


@register(
    "sink_commit_log_parquet",
    """
    SELECT event_id AS eid, user_id AS uid, event_type
    FROM events
    WHERE event_id % 5 IN (3, 4)
      AND NOT user_id % 11 = 6
    """,
)
def q_sink_commit_log_parquet(spark, sf_dir):
    """The commit log with PARQUET checkpoints
    (``checkpoint_format="parquet"`` — Delta's checkpoint.parquet):
    the O(parts) file/stats maps live in a columnar
    ``_chlog/ckpt-*.parquet`` while ``_MANIFEST.json`` stays
    metadata-thin, measured >2x smaller at 100k parts
    (tests/test_commit_log.py). Two appends, a mid-sequence
    checkpoint roll (interval=2), and a copy-on-write delete WHOSE
    TOUCHED-STATS DROP must round-trip through the columnar
    checkpoint — then the graded read resolves checkpoint + records.
    A live-flag mix-up (serving a replaced part), a stats row lost in
    the split, or a fold that misses the pointer hash-mismatches
    against the oracle's independent statement of the final state."""
    from pyspark.sql import types as T

    from ..sinks.commit_log import enable_commit_log
    from ..sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        read_committed_parquet,
    )
    from ..sinks.mutations import delete_where

    spark.dataSource.register(ClickHouseArrowDataSource)
    ev = load(spark, sf_dir, "events").select(
        F.col("event_id").alias("eid"),
        F.col("user_id").alias("uid"),
        "event_type",
    )
    schema = T.StructType(
        [
            T.StructField("eid", T.LongType()),
            T.StructField("uid", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    path = tempfile.mkdtemp(prefix="spark_graft_clpq_") + "/staged"
    enable_commit_log(
        path, checkpoint_interval=2, checkpoint_format="parquet"
    )
    for residue in (3, 4):
        (
            ev.filter(F.col("eid") % 5 == residue)
            .write.format("chbatch_arrow")
            .option("path", path)
            .option("batchsize", "1000000")
            .mode("append")
            .save()
        )
    r = delete_where(spark, path, schema, "uid % 11 = 6")
    assert r["n_rewritten"] > 0, r
    return read_committed_parquet(spark, path, schema)


# ---------------------------------------------------------------------------
# sink_drop_column — DROP COLUMN via column mapping (zero rewrite)
# ---------------------------------------------------------------------------


@register(
    "sink_drop_column",
    """
    SELECT event_id, event_type, CAST(NULL AS DOUBLE) AS value,
           CAST(0 AS BIGINT) AS generation
    FROM events
    UNION ALL
    SELECT event_id + 10000000 AS event_id, event_type,
           value * 2 AS value, CAST(1 AS BIGINT) AS generation
    FROM events
    """,
)
def q_sink_drop_column(spark, sf_dir):
    """DROP COLUMN via column mapping (datasource_sink.drop_column —
    VERDICT r8 task 3, the third zero-rewrite evolution verb beside
    RENAME and type-WIDEN): the manifest tombstones the dead physical
    name per part; no data file is touched. The HARD case is graded:
    after the drop, a SAME-NAMED column is re-added by a plain append
    — the re-added ``value`` must be NULL for every pre-drop row
    (the dead bytes never leak into the new identity) and real for
    every post-re-add row, exactly Delta's fresh-field-id semantics
    expressed through name mapping. The pre-drop bytes stay on disk
    for time travel (pinned in tests/test_drop_column.py, along with
    the plain-path version-aware refusal and OPTIMIZE
    materialization + clearing). ``generation`` separates the two
    populations in the hash, so a reader that NULLs too much or too
    little mismatches either way."""
    from pyspark.sql import types as T

    from ..sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        drop_column,
    )

    spark.dataSource.register(ClickHouseArrowDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    path = tempfile.mkdtemp(prefix="spark_graft_dropcol_") + "/s"
    (
        ev.write.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", "1000000")
        .mode("append")
        .save()
    )
    drop_column(path, "value")
    # re-add the NAME with a new identity: a plain append whose rows
    # carry values derived from the originals (oracle-expressible)
    (
        ev.select(
            (F.col("event_id") + 10_000_000).alias("event_id"),
            "event_type",
            (F.col("value") * 2).alias("value"),
        )
        .write.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", "1000000")
        .mode("append")
        .save()
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    got = (
        spark.read.format("chbatch_arrow")
        .schema(schema)
        .option("path", path)
        .load()
    )
    return got.withColumn(
        "generation",
        F.when(F.col("event_id") >= 10_000_000, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long"),
    )
