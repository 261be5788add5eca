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


def test_replayed_batch_id_is_idempotent_after_commit(spark):
    """Dirty-failure replay, the post-commit half (ADVICE r4 /
    VERDICT r4 task 5): the engine replays a batch whose sink append
    COMMITTED but whose epoch never did (crash between the two). The
    replayed call arrives with the same batch_id; the sink must detect
    the non-monotone id, rebuild key state from the SINK, and append
    nothing — at-least-once delivery, exactly-once effect."""
    import datetime

    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    fn = dedup_append_batch_fn(
        (sink := tempfile.mkdtemp(prefix="fb_replay_") + "/out"), ["user_id"]
    )
    b0 = spark.createDataFrame(
        [(1, ts, 1), (2, ts, 2)], "event_id long, ts timestamp, user_id long"
    )
    fn(b0, 0)
    assert spark.read.parquet(sink).count() == 2
    # epoch 0 replayed verbatim (append committed, epoch didn't)
    fn(b0, 0)
    assert spark.read.parquet(sink).count() == 2  # nothing re-appended
    # and the rebuilt state still dedups the NEXT batch correctly
    b1 = spark.createDataFrame(
        [(3, ts, 2), (4, ts, 3)], "event_id long, ts timestamp, user_id long"
    )
    fn(b1, 1)
    out = spark.read.parquet(sink)
    assert sorted(r.user_id for r in out.collect()) == [1, 2, 3]


def test_replayed_batch_id_reappends_after_lost_write(spark):
    """The pre-commit half: the append itself never made it (crash
    before the parquet commit). The replay must NOT be suppressed by
    stale in-memory key state that already unioned the lost batch's
    keys — rebuilding from the sink re-appends the lost rows."""
    import datetime
    from unittest import mock

    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    sink = tempfile.mkdtemp(prefix="fb_lost_") + "/out"
    fn = dedup_append_batch_fn(sink, ["user_id"])
    b0 = spark.createDataFrame(
        [(1, ts, 1)], "event_id long, ts timestamp, user_id long"
    )
    fn(b0, 0)
    b1 = spark.createDataFrame(
        [(2, ts, 2)], "event_id long, ts timestamp, user_id long"
    )
    # simulate the dirty failure: state updates happen but the write
    # is lost (crash after the task wrote state, before sink commit)
    real_write = type(b1).write

    class _Boom(Exception):
        pass

    with mock.patch.object(
        type(b1), "write", property(lambda self: (_ for _ in ()).throw(_Boom()))
    ):
        try:
            fn(b1, 1)
        except _Boom:
            pass
    assert real_write  # silence lints; write restored by context exit
    assert spark.read.parquet(sink).count() == 1  # batch 1 lost
    # engine replays epoch 1: rows must land this time
    fn(b1, 1)
    out = spark.read.parquet(sink)
    assert sorted(r.user_id for r in out.collect()) == [1, 2]
