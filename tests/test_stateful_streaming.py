"""applyInPandasWithState semantics: state persists across
micro-batches (counts accumulate), updates emit per batch."""

from __future__ import annotations

import tempfile

from pyspark.sql import types as T

from appsflyer_to_clickhouse_spark.streaming.stateful import stateful_user_counter

_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
    ]
)


def _write_batch(spark, path, rows, seq):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/batch_{seq}")


def test_state_accumulates_across_microbatches(spark):
    src = tempfile.mkdtemp(prefix="state_src_")
    ckpt = tempfile.mkdtemp(prefix="state_ckpt_")
    _write_batch(spark, src, [(1, 10), (1, 11), (2, 20)], 1)

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/batch_*")
    )
    q = (
        stateful_user_counter(stream)
        .writeStream.format("memory")
        .queryName("state_counts")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(spark, src, [(1, 12)], 2)
        q.processAllAvailable()
        rows = {
            (r["user_id"], r["batches_seen"]): r["events_seen"]
            for r in spark.table("state_counts").collect()
        }
        # batch 1: user 1 saw 2 events, user 2 saw 1
        assert rows[(1, 1)] == 2 and rows[(2, 1)] == 1
        # batch 2: user 1's state carried over -> cumulative 3
        assert rows[(1, 2)] == 3
    finally:
        q.stop()
