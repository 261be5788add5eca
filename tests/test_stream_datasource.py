"""Restart contract of the streaming AppsFlyer source
(sources/datasource.py:_AppsFlyerStreamReader): a second run against
the SAME checkpoint with an extended horizon resumes from the
committed offset — only the new windows are fetched, and the sink
holds exactly one copy of every window's rows. This replaces the
reference's re-pull + anti-join idempotency with engine-level
exactly-once (main.py:107-112, 172-180).
"""

from __future__ import annotations

import os
import tempfile

from appsflyer_to_clickhouse_spark.plans.source_queries import (
    _stream_rows,
    csv_export_text,
)

# Static path: Python data source readers run in worker PROCESSES that
# re-import this module, so only static module-level state reaches
# them — per-run paths cannot. The uid suffix scopes collisions to
# one user; two concurrent same-user runs on one host would still
# interleave (accepted: the driver and CI run suites serially).
_FETCH_LOG = f"/tmp/spark_graft_test_fetch_log_{os.getuid()}"


def _logging_fetch(from_time: str, to_time: str) -> str:
    """Fake fetcher that appends each fetched window to a log file
    (local-mode workers share the driver's filesystem)."""
    with open(_FETCH_LOG, "a") as fh:
        fh.write(f"{from_time}|{to_time}\n")
    return csv_export_text(_stream_rows(from_time))


def _run(spark, ckpt: str, out: str, to_time: str) -> None:
    from appsflyer_to_clickhouse_spark.sources.datasource import (
        AppsFlyerDataSource,
    )

    spark.dataSource.register(AppsFlyerDataSource)
    stream = (
        spark.readStream.format("appsflyer")
        .option("from_time", "2024-01-05 00:00:00")
        .option("to_time", to_time)
        .option("window_seconds", "7200")
        .option("fetcher", "tests.test_stream_datasource:_logging_fetch")
        .load()
    )
    # file sink, not memory: the memory sink cannot recover from a
    # checkpoint, and recovery IS what this test exists to pin
    q = (
        stream.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_restart_resumes_from_committed_offset(spark):
    ckpt = tempfile.mkdtemp(prefix="httpstream_ckpt_")
    out = tempfile.mkdtemp(prefix="httpstream_out_") + "/sink"
    log = _FETCH_LOG
    if os.path.exists(log):
        os.remove(log)
    try:
        # run 1: horizon 04:00 -> windows 00-02 and 02-04
        _run(spark, ckpt, out, "2024-01-05 04:00:00")
        # fetch `to` bounds end 1 s before the next window's start:
        # the API is inclusive on both ends, so [t, t+2h-1s] inclusive
        # covers the half-open offset step [t, t+2h) exactly — without
        # the -1 s the boundary second is fetched by both windows
        fetched_1 = sorted(set(open(log).read().splitlines()))
        assert fetched_1 == [
            "2024-01-05 00:00:00|2024-01-05 01:59:59",
            "2024-01-05 02:00:00|2024-01-05 03:59:59",
        ]
        # run 2, same checkpoint, horizon extended to 08:00: ONLY the
        # two new windows are fetched (the committed offset is the
        # resume point — no re-pull, no sink scan)
        _run(spark, ckpt, out, "2024-01-05 08:00:00")
        fetched_2 = sorted(set(open(log).read().splitlines()))
        assert fetched_2 == fetched_1 + [
            "2024-01-05 04:00:00|2024-01-05 05:59:59",
            "2024-01-05 06:00:00|2024-01-05 07:59:59",
        ]
        # each window appears EXACTLY once in the fetch log (no
        # re-fetch of committed work even across the restart)
        all_lines = open(log).read().splitlines()
        assert len(all_lines) == len(set(all_lines)) == 4
        # and the sink holds every window's rows exactly once across
        # both runs — the exactly-once output contract
        rows = spark.read.parquet(out).collect()
        ids = sorted(r["AppsFlyer ID"] for r in rows)
        assert ids == sorted(
            f"af-s-2024-01-05T{h:02d}-{j}"
            for h in (0, 2, 4, 6)
            for j in (0, 1)
        )
    finally:
        if os.path.exists(log):
            os.remove(log)
