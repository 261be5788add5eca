"""Pins for the event-time temporal (as-of) stream join
(streaming/temporal.py + plans/streaming_queries.py:
stream_temporal_join).

The registry differential already proves end-state exactness vs the
batch as-of oracle at 3 SFs; these pins cover what the differential
can't see: corner semantics on a controlled replay (inclusive bound,
equal-ts tie-break, pre-first-version NULLs, sentinel-only keys) and
the INCREMENTAL watermark flush (rows must be emitted before the
sentinel batch — otherwise the operator silently degenerates into
buffer-everything-flush-at-end, which has unbounded state)."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from appsflyer_to_clickhouse_spark.streaming.temporal import (
    temporal_join_stream,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _write_replay(spark, files: list[list[tuple]]) -> str:
    """Write each row-list as one replay file with a staircase mtime
    (file i strictly older than file i+1) — the ts-range-disjoint
    contract _temporal_replay_src establishes, reproduced by hand."""
    src = tempfile.mkdtemp(prefix="tj_replay_")
    t0 = 1_700_000_000
    for i, rows in enumerate(files):
        tmp = tempfile.mkdtemp(prefix="tj_part_")
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = next(
            p for p in sorted(os.listdir(tmp)) if p.endswith(".parquet")
        )
        dst = os.path.join(src, f"f{i:03d}.snappy.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dst, (t0 + i, t0 + i))
    return src


def _run_stream(spark, src: str, sink=None, buckets=None):
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "1 second")
        .select(
            "ts",
            "user_id",
            F.when(F.col("event_type") == "purchase", F.lit(0))
            .when(F.col("event_type") == "click", F.lit(1))
            .otherwise(F.lit(2))
            .cast("long")
            .alias("side"),
            F.unix_micros(F.col("ts")).alias("ts_us"),
            F.col("event_id").alias("row_id"),
        )
    )
    out = temporal_join_stream(stream, buckets=buckets)
    ckpt = tempfile.mkdtemp(prefix="tj_ckpt_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        if sink is None:
            name = f"tj_mem_{abs(hash(src)) % 10**9}"
            q = (
                out.writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return spark.table(name)
        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return None
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


import pytest


@pytest.mark.parametrize("buckets", [None, 1, 7])
def test_temporal_semantics_controlled(spark, buckets):
    # file 0: ts in [09:00, 10:00] — a tied purchase pair at 10:00,
    #         a click before any purchase, a click exactly AT the tie
    # file 1: ts in [11:00, 11:30] — a newer version and a click after
    # file 2: sentinel (far future), one row per key incl. a
    #         clicks-only user and a purchases-only user
    #
    # buckets=None keys state per user; buckets=1 forces ALL users
    # through ONE multi-user state group; buckets=7 mixes them across
    # partial groups — same answers required from every layout (r11
    # key bucketing).
    f0 = [
        (1, _ts("2024-03-01T09:00:00"), 10, "click"),
        (100, _ts("2024-03-01T10:00:00"), 10, "purchase"),
        (103, _ts("2024-03-01T10:00:00"), 10, "purchase"),
        (2, _ts("2024-03-01T10:00:00"), 10, "click"),
        (50, _ts("2024-03-01T09:30:00"), 20, "click"),
    ]
    f1 = [
        (104, _ts("2024-03-01T11:00:00"), 10, "purchase"),
        (3, _ts("2024-03-01T11:30:00"), 10, "click"),
        (200, _ts("2024-03-01T11:15:00"), 30, "purchase"),
    ]
    sent = [
        (-1, _ts("2024-04-01T00:00:00"), u, "__flush__")
        for u in (10, 20, 30)
    ]
    src = _write_replay(spark, [f0, f1, sent])
    res = _run_stream(spark, src, buckets=buckets)
    got = {
        r["click_id"]: r["purchase_id"]
        for r in res.select("click_id", "purchase_id").collect()
    }
    assert got == {
        1: None,  # before any purchase: NULL enrichment, row kept
        2: 103,  # equal-ts purchase matches (inclusive) and the
        #          greatest id wins the tie
        50: None,  # clicks-only user
        3: 104,  # latest at-or-before, not the older tie pair
    }
    # purchases-only user 30 emits nothing
    assert res.count() == 4


@pytest.mark.parametrize("buckets", [None, 4])
def test_temporal_incremental_watermark_flush(spark, buckets):
    # 3 range files + sentinel: the watermark computed from file k
    # must flush file k's clicks during batch k+1 — emission happens
    # across MULTIPLE batches, and the sentinel batch drains only the
    # tail, not the whole stream
    files = []
    for k in range(3):
        base = _ts("2024-03-01T00:00:00") + dt.timedelta(hours=6 * k)
        rows = []
        for j in range(5):
            t = base + dt.timedelta(minutes=10 * j)
            rows.append((1000 * k + j, t, 10, "purchase"))
            rows.append((1000 * k + 500 + j, t, 10, "click"))
        files.append(rows)
    files.append([(-1, _ts("2024-04-01T00:00:00"), 10, "__flush__")])
    src = _write_replay(spark, files)
    per_batch: dict[int, int] = {}

    def sink(df, epoch_id):
        per_batch[int(epoch_id)] = df.count()

    _run_stream(spark, src, sink=sink, buckets=buckets)
    emitted = {b: n for b, n in per_batch.items() if n}
    assert sum(emitted.values()) == 15  # every click exactly once
    assert len(emitted) >= 2, per_batch  # incremental, not one burst
    last = max(per_batch)
    assert emitted.get(last, 0) < 15, per_batch  # sentinel drains a
    #                                  tail, not the whole stream
