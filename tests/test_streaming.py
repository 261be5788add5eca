"""Pin the watermark semantics of stream_dedup_watermark across
micro-batches: duplicates inside the watermark window are dropped;
once the event-time watermark passes first_seen + delay, state is
evicted and the key can insert again — the exact contract of the
reference's 2-hour re-pull + anti-join (main.py:107-112, 172-180).
"""

from __future__ import annotations

import tempfile
from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from appsflyer_to_clickhouse_spark.streaming.dedup import stream_dedup_watermark

_SCHEMA = T.StructType(
    [
        T.StructField("appsflyer_id", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
    ]
)


def _write_batch(spark, path: str, rows, seq: int) -> None:
    df = spark.createDataFrame(
        [(k, datetime.fromisoformat(t)) for k, t in rows], _SCHEMA
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/batch_{seq}")


def test_watermark_dedup_drops_within_window_and_readmits_after(spark):
    src = tempfile.mkdtemp(prefix="wm_src_")
    ckpt = tempfile.mkdtemp(prefix="wm_ckpt_")

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/batch_*")
    )
    deduped = stream_dedup_watermark(
        stream, key="appsflyer_id", ts_col="event_time", watermark="2 hours"
    )
    name = "wm_sem_test"
    # batch 1: first sight of k1 at 10:00
    _write_batch(spark, src, [("k1", "2024-01-05T10:00:00")], 1)
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: duplicate k1 at 11:30 — within 2h of first sight,
        # watermark (10:00 - 2h) hasn't evicted k1 state -> dropped
        _write_batch(spark, src, [("k1", "2024-01-05T11:30:00")], 2)
        q.processAllAvailable()
        mid = spark.table(name).count()
        assert mid == 1, f"in-window duplicate must be dropped, saw {mid} rows"

        # batch 3: advance event time far past k1's eviction horizon
        _write_batch(spark, src, [("kx", "2024-01-05T20:00:00")], 3)
        q.processAllAvailable()
        # batch 4: k1 again at 20:30 — watermark (18:00) long past
        # 10:00+2h, state evicted -> k1 re-admitted (reference
        # contract: beyond the lookback window, re-insertion happens)
        _write_batch(spark, src, [("k1", "2024-01-05T20:30:00")], 4)
        q.processAllAvailable()
        rows = [
            (r["appsflyer_id"], r["event_time"].isoformat())
            for r in spark.table(name).collect()
        ]
        k1_rows = sorted(t for k, t in rows if k == "k1")
        assert k1_rows == ["2024-01-05T10:00:00", "2024-01-05T20:30:00"], rows
    finally:
        q.stop()


def test_late_rows_dropped_by_watermark_are_observable(spark):
    """Late-data OBSERVABILITY: rows arriving behind the watermark are
    silently excluded from a windowed aggregation — the per-batch
    ``numRowsDroppedByWatermark`` state metric is the only signal. At
    100 TB an ingest that can't see its drop rate can't distinguish
    'no late data' from 'watermark too tight'; this pins that the
    metric actually surfaces the drop."""
    src = tempfile.mkdtemp(prefix="late_src_")
    ckpt = tempfile.mkdtemp(prefix="late_ckpt_")

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/batch_*")
    )
    agg = (
        stream.withWatermark("event_time", "1 hour")
        .groupBy(F.window("event_time", "15 minutes"))
        .count()
    )
    name = "late_metrics_test"
    # batch 1 sets the watermark to 10:00 - 1h = 09:00
    _write_batch(spark, src, [("k1", "2024-01-05T10:00:00")], 1)
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: an event at 05:00 — 4h behind the 09:00 watermark
        _write_batch(spark, src, [("k2", "2024-01-05T05:00:00")], 2)
        q.processAllAvailable()
        dropped = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for op in p.get("stateOperators", [])
        )
        assert dropped >= 1, "late row was not counted as dropped"
    finally:
        q.stop()
