"""Streaming dedup with a watermark — the Structured-Streaming twin of
the reference's idempotency machinery (SURVEY.md §2 Part C row 7).

The reference re-pulls a 2-hour window each run and anti-joins against
the sink (main.py:107-112, 172-180) — a poor-man's watermark + dedup
implemented with cron. Here the same contract is a streaming operator:
``withWatermark(ts, '2 hours')`` + ``dropDuplicatesWithinWatermark(key)``
keeps per-key state exactly as long as a duplicate may still arrive,
then evicts it — bounded state at any scale, no sink re-scan at all.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession


def stream_dedup_watermark(
    stream_df: DataFrame,
    key: str = "appsflyer_id",
    ts_col: str = "event_time",
    watermark: str = "2 hours",
) -> DataFrame:
    """Drop duplicate keys arriving within ``watermark`` of first
    sight. State is evicted once the event-time watermark passes
    first_seen(key) + watermark — the streaming equivalent of the
    reference's "2-hour lookback makes re-runs idempotent" (and like
    the reference, a duplicate arriving LATER than the window inserts
    again; that is the contract, not a bug)."""
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [key]
    )


def run_availablenow_to_memory(
    spark: SparkSession, df: DataFrame, name: str
) -> DataFrame:
    """Execute a streaming frame to completion over all currently
    available input (one availableNow run) into a memory sink; returns
    the result as a batch DataFrame. Fresh checkpoint per call so the
    run is self-contained and re-runnable."""
    ckpt = tempfile.mkdtemp(prefix=f"spark_graft_ckpt_{name}_")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
