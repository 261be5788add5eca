"""Unit tests for the source connectors: BOM header semantics
(reference main.py:128), window splitting, URL parity, CSV ''-vs-NULL
contract."""

from __future__ import annotations

from appsflyer_to_clickhouse_spark.config import resolve_config
from appsflyer_to_clickhouse_spark.sources.csv_source import (
    read_af_csv,
    write_fixture_csv,
)
from appsflyer_to_clickhouse_spark.sources.http_source import (
    build_url,
    parse_af_csv_text,
    split_window,
)


def test_bom_stripped_from_first_header(spark, tmp_path):
    p = write_fixture_csv(
        str(tmp_path / "bom.csv"), ["A", "B"], [["1", "2"]], bom=True
    )
    raw = open(p, "rb").read()
    assert raw.startswith(b"\xef\xbb\xbf"), "fixture must actually carry a BOM"
    df = read_af_csv(spark, p)
    assert df.columns == ["A", "B"]


def test_empty_cell_reads_as_empty_string_not_null(spark, tmp_path):
    p = write_fixture_csv(
        str(tmp_path / "e.csv"), ["A", "B"], [["", "x"]], bom=False
    )
    row = read_af_csv(spark, p).collect()[0]
    assert row["A"] == "" and row["B"] == "x"


def test_split_window_covers_range_without_overlap():
    parts = split_window("2024-01-05 00:00:00", "2024-01-05 08:00:00", 4)
    assert len(parts) == 4
    assert parts[0][0] == "2024-01-05 00:00:00"
    assert parts[-1][1] == "2024-01-05 08:00:00"
    # contiguous: each window ends 1s before the next starts
    for (f1, t1), (f2, _) in zip(parts, parts[1:]):
        assert t1 < f2
    assert parts[0] == ("2024-01-05 00:00:00", "2024-01-05 01:59:59")


def test_split_window_degenerate():
    assert split_window("2024-01-05 00:00:00", "2024-01-05 00:00:00", 4) == [
        ("2024-01-05 00:00:00", "2024-01-05 00:00:00")
    ]


def test_parse_af_csv_text_strips_bom_and_handles_empty():
    assert parse_af_csv_text("") == []
    rows = parse_af_csv_text("﻿A,B\n1,2\n")
    assert rows == [{"A": "1", "B": "2"}]


def test_build_url_parity():
    cfg = resolve_config({"APP_ID": "app.test", "APPSFLYER_TOKEN": "t"})
    url = build_url(cfg, "2024-01-05 00:00:00", "2024-01-05 02:00:00")
    assert url.startswith(
        "https://hq1.appsflyer.com/api/raw-data/export/app/app.test/installs_report/v5"
    )
    assert "from=2024-01-05%2000%3A00%3A00" in url
    assert "timezone=Asia%2FHo_Chi_Minh" in url
    assert "additional_fields=" in url
