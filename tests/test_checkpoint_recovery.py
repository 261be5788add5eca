"""Checkpoint fault-tolerance: a streaming query stopped and restarted
from the SAME checkpoint must (a) restore dedup state — a duplicate key
arriving after the restart is still dropped — and (b) deliver each
input row to the file sink exactly once, never re-emitting batches that
committed before the stop. This is the property that makes a 100 TB
ingest pipeline restartable mid-day: offsets + state live in the
checkpoint, not the process.
"""

from __future__ import annotations

import tempfile
from datetime import datetime

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


def _start(spark, src: str, ckpt: str, out: str):
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/batch_*")
    )
    deduped = stream_dedup_watermark(
        stream, key="appsflyer_id", ts_col="event_time", watermark="2 hours"
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )


def test_restart_from_checkpoint_keeps_state_and_exactly_once(spark):
    src = tempfile.mkdtemp(prefix="ckpt_src_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_meta_")
    out = tempfile.mkdtemp(prefix="ckpt_out_") + "/sink"

    # run 1: two batches commit, then the query "crashes" (stop)
    _write_batch(spark, src, [("k1", "2024-01-05T10:00:00")], 1)
    _write_batch(spark, src, [("k2", "2024-01-05T10:10:00")], 2)
    q = _start(spark, src, ckpt, out)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.parquet(out).count() == 2

    # run 2: restart from the same checkpoint; a duplicate of k1 inside
    # the watermark window arrives — restored state must drop it — plus
    # one genuinely new key
    _write_batch(
        spark,
        src,
        [("k1", "2024-01-05T11:00:00"), ("k3", "2024-01-05T11:05:00")],
        3,
    )
    q = _start(spark, src, ckpt, out)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = sorted(
        (r["appsflyer_id"], r["event_time"].isoformat())
        for r in spark.read.parquet(out).collect()
    )
    # exactly once: batches 1-2 not re-emitted on restart; k1 dup dropped
    assert rows == [
        ("k1", "2024-01-05T10:00:00"),
        ("k2", "2024-01-05T10:10:00"),
        ("k3", "2024-01-05T11:05:00"),
    ], rows

    # run 3: restart with NO new input — a no-op recovery must add rows
    # to neither the sink nor the state
    q = _start(spark, src, ckpt, out)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.parquet(out).count() == 3


def test_dirty_failure_foreachbatch_epoch_replay_end_to_end(spark):
    """DIRTY failure (VERDICT r4 task 5), end-to-end through a real
    streaming query: a foreachBatch epoch crashes AFTER its sink append
    committed but BEFORE the epoch committed to the checkpoint. The
    engine fails the query; a restart from the same checkpoint replays
    that batch_id into the SAME reused BatchFn closure. The sink must
    come out with every input row exactly once — no loss from the
    failed attempt's partial work, no duplication from the replay."""
    import glob
    import os

    from appsflyer_to_clickhouse_spark.streaming.sinks import (
        dedup_append_batch_fn,
    )

    src = tempfile.mkdtemp(prefix="dirty_src_")
    ckpt = tempfile.mkdtemp(prefix="dirty_ckpt_")
    sink = tempfile.mkdtemp(prefix="dirty_sink_") + "/out"

    _write_batch(spark, src, [("k1", "2024-01-05T10:00:00")], 1)
    _write_batch(spark, src, [("k2", "2024-01-05T10:10:00")], 2)

    inner = dedup_append_batch_fn(sink, ["appsflyer_id"])
    crashed = {"done": False}

    def crashing_fn(batch_df, batch_id):
        inner(batch_df, batch_id)  # sink append COMMITS...
        if batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash after append, before epoch commit")

    def start():
        stream = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/batch_*")
        )
        return (
            stream.writeStream.foreachBatch(crashing_fn)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    except Exception:
        pass  # the injected crash fails the query
    finally:
        q.stop()
    # batch 1's append committed before the crash: both rows on disk,
    # but epoch 1 is NOT in the checkpoint's commit log
    assert spark.read.parquet(sink).count() == 2
    commits = glob.glob(os.path.join(ckpt, "commits", "*"))
    assert len([c for c in commits if not c.endswith(".tmp")]) == 1

    # restart: engine replays batch_id=1 into the SAME closure — the
    # non-monotone-id guard rebuilds key state from the sink, so the
    # replay appends nothing
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.parquet(sink)
    assert sorted(r.appsflyer_id for r in out.collect()) == ["k1", "k2"]

    # and the pipeline keeps working after recovery
    _write_batch(spark, src, [("k3", "2024-01-05T11:00:00")], 3)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(
        r.appsflyer_id for r in spark.read.parquet(sink).collect()
    ) == ["k1", "k2", "k3"]
