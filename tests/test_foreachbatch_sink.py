"""foreachBatch dedup-append sink: duplicates must be dropped both
within a batch and ACROSS batches (anti-join against the sink-so-far),
and the surviving row set must be stable however the input splits."""

from __future__ import annotations

import datetime
import tempfile

from appsflyer_to_clickhouse_spark.streaming.sinks import (
    dedup_append_batch_fn,
    run_foreach_batch_availablenow,
)


def _write_batch_file(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    ).coalesce(1).write.mode("append").parquet(path)


def test_cross_batch_dedup(spark):
    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    src = tempfile.mkdtemp(prefix="fb_src_")
    # file 1: users 1,2 (2 duplicated in-batch); file 2: users 2,3
    _write_batch_file(
        spark, src, [(1, ts, 1), (2, ts, 2), (3, ts, 2)]
    )
    _write_batch_file(spark, src, [(4, ts, 2), (5, ts, 3)])

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    sink = tempfile.mkdtemp(prefix="fb_sink_") + "/out"
    run_foreach_batch_availablenow(stream, dedup_append_batch_fn(sink, ["user_id"]))

    out = spark.read.parquet(sink)
    users = sorted(r.user_id for r in out.select("user_id").collect())
    assert users == [1, 2, 3]  # one row per user, across all batches
    # user 2's survivor must come from the batch that saw it first:
    # in-batch dropDuplicates keeps one of event 2/3, the later batch's
    # event 4 is anti-joined away
    ev2 = {r.event_id for r in out.filter("user_id = 2").collect()}
    assert ev2 <= {2, 3} and len(ev2) == 1
