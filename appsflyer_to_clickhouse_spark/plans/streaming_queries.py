"""SURVEY.md §2 Part C row 7 — streaming dedup over a file source.

The registered query materializes a full availableNow streaming run
(file source -> watermark dedup -> memory sink) and returns the
distinct surviving keys, which is deterministic (survivor-row choice is
not, so only the key set is exposed to the oracle). The multi-batch
watermark-eviction behavior is pinned in tests/test_streaming.py.
"""

from __future__ import annotations

import os
import tempfile
from contextlib import contextmanager

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..streaming.dedup import run_availablenow_to_memory, stream_dedup_watermark
from .registry import load, register

_RUN_SEQ = iter(range(1_000_000))


@contextmanager
def stream_shuffle_partitions(spark, n: int = 8):
    """Scope ``spark.sql.shuffle.partitions`` around a streaming run.

    Stateful streaming operators create one state-store instance per
    shuffle partition per micro-batch (open + commit + maintenance
    each); the batch-tuned 32 costs real wall time when the keyspace
    is a few thousand keys. The partition count is baked into the
    query's (fresh) checkpoint at start, so scoping the session conf
    around start()/awaitTermination() is safe and leaks nothing. At
    production scale this knob is sized to distinct-key cardinality —
    it is deliberately independent of the batch shuffle width."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

# replay source dirs memoized per (prefix, sf_dir, cols): repeat
# invocations (bench loops, repeated oracle runs) must time the STREAM,
# not a fresh parquet re-write of the source table — and must not
# accumulate /tmp copies
_SRC_CACHE: dict[tuple, str] = {}


def _replay_src(spark, sf_dir: str, cols: list[str], prefix: str) -> str:
    key = (prefix, sf_dir, tuple(cols))
    cached = _SRC_CACHE.get(key)
    if cached is not None and os.path.isdir(cached):
        return cached
    src = tempfile.mkdtemp(prefix=f"spark_graft_{prefix}_src_")
    df = load(spark, sf_dir, "events").select(*cols)
    # event-time columns must be TIMESTAMP (with local tz): watermarks
    # reject TIMESTAMP_NTZ, which is what a naive parquet timestamp
    # reads back as. The session tz is pinned to UTC, so the cast is
    # value-preserving.
    for f in df.schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    df.repartition(4).write.mode("overwrite").parquet(src)
    _SRC_CACHE[key] = src
    return src


@register(
    "stream_windowed_agg",
    """
    SELECT time_bucket(INTERVAL 1 DAY, ts) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_windowed_agg(spark, sf_dir):
    """Streaming tumbling-window aggregation: events replayed as a file
    stream -> groupBy(window('ts','1 day'), event_type).count() ->
    complete-mode memory sink (availableNow). The final state equals
    the batch aggregation whatever the micro-batch boundaries were, so
    the DuckDB time_bucket oracle is exact. In production this runs
    with a watermark in update mode; state is bounded by windows x
    types."""
    src = _replay_src(spark, sf_dir, ["ts", "event_type"], "streamagg")
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    agg = (
        stream.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .count()
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            F.col("count").alias("n"),
        )
    )
    name = f"stream_windowed_agg_{next(_RUN_SEQ)}"
    ckpt = tempfile.mkdtemp(prefix=f"spark_graft_ckpt_{name}_")
    with stream_shuffle_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


@register(
    "stream_dedup_watermark",
    "SELECT DISTINCT user_id FROM events",
)
def q_stream_dedup_watermark(spark, sf_dir):
    """events replayed as a file stream -> withWatermark('ts','2 hours')
    + dropDuplicatesWithinWatermark(user_id) -> memory sink
    (availableNow). Output: the distinct keys that survived — exactly
    DISTINCT user_id, whatever the batch boundaries were. State is
    watermark-bounded; nothing is collected on the driver mid-stream."""
    src = _replay_src(spark, sf_dir, ["event_id", "ts", "user_id"], "streamdedup")
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    deduped = stream_dedup_watermark(
        stream, key="user_id", ts_col="ts", watermark="2 hours"
    ).select("user_id")
    name = f"stream_dedup_wm_{next(_RUN_SEQ)}"
    with stream_shuffle_partitions(spark):
        out = run_availablenow_to_memory(spark, deduped, name)
    return out.select("user_id").distinct().select(F.col("user_id"))
