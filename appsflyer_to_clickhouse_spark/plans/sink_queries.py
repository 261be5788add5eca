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
from .etl_queries import ALL_FROM, ALL_TO, _pipeline_oracle, _synth_af_batch
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
