"""The drop-in ``main`` run end-to-end offline: CSV source via
AF_CSV_PATH, parquet sink via SINK_PATH, idempotency via the window
anti-join (second run inserts 0 new rows for the same batch)."""

from __future__ import annotations

import tempfile

from appsflyer_to_clickhouse_spark import main as entry_main
from appsflyer_to_clickhouse_spark.sinks.parquet_sink import read_sink
from appsflyer_to_clickhouse_spark.sources.csv_source import write_fixture_csv

_HEADER = ["Install Time", "Media Source", "AppsFlyer ID"]


def test_main_run_offline_and_idempotent(spark, monkeypatch):
    from appsflyer_to_clickhouse_spark.operators.etl import time_window_utc7

    # rows inside the current 2h UTC+7 window so the anti-join window
    # covers them on the second run
    from_time, _ = time_window_utc7(1)
    rows = [
        [from_time, "meta", "id-1"],
        [from_time, "google", "id-2"],
        [from_time, "meta", ""],  # falsy id -> dropped
    ]
    csv_path = write_fixture_csv(
        tempfile.mktemp(suffix=".csv", prefix="main_af_"), _HEADER, rows
    )
    sink_path = tempfile.mkdtemp(prefix="main_sink_")

    monkeypatch.setenv("AF_CSV_PATH", csv_path)
    monkeypatch.setenv("SINK_PATH", sink_path)
    monkeypatch.delenv("CH_HOST", raising=False)

    n1 = entry_main.run(spark)
    assert n1 == 2
    assert read_sink(spark, sink_path).count() == 2

    # re-run: same batch, both ids already in the sink window -> 0 new
    n2 = entry_main.run(spark)
    assert n2 == 0
    assert read_sink(spark, sink_path).count() == 2
