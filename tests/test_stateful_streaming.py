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


def test_transform_with_state_gate_or_semantics(spark):
    """user_stats_transform_with_state: without protobuf the operator
    must refuse up front with the real reason (NotImplementedError),
    never crash inside the streaming runner; with protobuf present it
    must match the batch count/max per key."""
    import tempfile

    import pyspark.sql.functions as F
    import pytest

    from appsflyer_to_clickhouse_spark.streaming.stateful import (
        user_stats_transform_with_state,
    )

    try:
        import google.protobuf  # noqa: F401

        has_proto = True
    except ImportError:
        has_proto = False

    src = tempfile.mkdtemp(prefix="tws_src_")
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 01:00:00"),
         (2, "2024-01-01 02:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts")).write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)

    if not has_proto:
        with pytest.raises(NotImplementedError, match="protobuf"):
            user_stats_transform_with_state(stream)
        return

    name = "tws_gate_check"
    ckpt = tempfile.mkdtemp(prefix="tws_ckpt_")
    q = (
        user_stats_transform_with_state(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        r["user_id"]: r["events_seen"]
        for r in spark.table(name)
        .groupBy("user_id")
        .agg(F.max("events_seen").alias("events_seen"))
        .collect()
    }
    assert rows == {1: 2, 2: 1}
