"""Drop-in replacement for the reference's ``python main.py`` run
(reference main.py:132-195): pull a 2-hour AppsFlyer window, map/
normalize, anti-join against the sink, append the new rows.

Same operational contract, Spark execution:

    APPSFLYER_TOKEN=... APP_ID=... CH_HOST=... CH_TABLE=installs \\
        python -m appsflyer_to_clickhouse_spark.main

Differences from the reference (all documented divergences):
- the fetch is split into N sub-windows pulled concurrently by
  executors (reference: one blocking GET into driver RAM);
- the sink is ClickHouse over JDBC when CH_HOST is set, else a local
  partitioned parquet sink (SINK_PATH, default ./sink_installs) so the
  pipeline is runnable offline;
- calendar-invalid datetimes become NULL instead of crashing, and the
  (buggy) reorder crash is replaced by the intended column order.

Offline/testing hooks: AF_CSV_PATH short-circuits the HTTP source with
a local CSV file; SINK_PATH selects the parquet sink location.
"""

from __future__ import annotations

import os
import sys

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession

from .config import PipelineConfig, resolve_config
from .operators.etl import run_installs_pipeline, time_window_utc7
from .session import get_spark
from .sinks.clickhouse_sink import write_clickhouse
from .sinks.parquet_sink import read_sink, write_sink
from .sources.csv_source import read_af_csv
from .sources.http_source import fetch_installs_distributed, http_fetch_fn
from .schemas import ch_sink_schema


def _load_raw(spark: SparkSession, cfg: PipelineConfig, from_time: str, to_time: str) -> DataFrame:
    csv_path = os.environ.get("AF_CSV_PATH")
    if csv_path:
        print(f"reading AppsFlyer batch from CSV: {csv_path}", file=sys.stderr)
        return read_af_csv(spark, csv_path)
    return fetch_installs_distributed(
        spark, from_time, to_time, http_fetch_fn(cfg),
        num_splits=int(os.environ.get("AF_FETCH_SPLITS", "8")),
    )


def _load_sink(spark: SparkSession, cfg: PipelineConfig, sink_path: str) -> DataFrame:
    if cfg.ch_host:
        return (
            spark.read.format("jdbc")
            .option("url", cfg.jdbc_url)
            .option("dbtable", cfg.ch_table)
            .option("user", cfg.ch_user or "")
            .option("password", cfg.ch_password or "")
            .load()
        )
    try:
        return read_sink(spark, sink_path)
    except AnalysisException:  # first run: missing or empty sink dir
        return spark.createDataFrame([], ch_sink_schema())
    # any other failure (permissions, corrupt footer) propagates:
    # silently substituting an empty sink would disable the anti-join
    # dedup and re-insert the whole window as duplicates


def run(spark: SparkSession | None = None, hours: int = 2) -> int:
    """One pipeline run; returns the number of inserted rows."""
    cfg = resolve_config()
    sink_path = os.environ.get("SINK_PATH", "./sink_installs")
    own_session = spark is None
    spark = spark or get_spark("appsflyer_to_clickhouse")
    try:
        from_time, to_time = time_window_utc7(hours)
        print(f"window {from_time} .. {to_time} (UTC+7)", file=sys.stderr)
        raw = _load_raw(spark, cfg, from_time, to_time)
        sink = _load_sink(spark, cfg, sink_path)
        new_rows = run_installs_pipeline(raw, sink, from_time, to_time)
        # persist so the write and the count share ONE execution of the
        # lineage — recomputing would re-fetch the whole AppsFlyer
        # window (doubled API calls) and could report a count that
        # diverges from the rows actually written
        new_rows.persist()
        try:
            if cfg.ch_host:
                write_clickhouse(new_rows, cfg)
            else:
                write_sink(new_rows, sink_path, mode="append")
            n = new_rows.count()
        finally:
            new_rows.unpersist()
        print(f"inserted {n} new rows", file=sys.stderr)
        return n
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":
    run()
