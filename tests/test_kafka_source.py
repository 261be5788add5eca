"""Kafka source: the decode/parse stage is pure DataFrame logic,
tested offline on a static frame with the exact connector wire schema;
the stream builder's gate (no connector jar here) must fail loudly at
build time, not silently at runtime."""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.errors import AnalysisException

from appsflyer_to_clickhouse_spark.sources.kafka_source import (
    kafka_wire_schema,
    parse_install_events,
    read_kafka_stream,
)


def _wire_rows():
    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    good = json.dumps(
        {
            "appsflyer_id": "af-1",
            "customer_user_id": "u1",
            "event_time": "2024-01-01 11:59:58",
            "install_time": "2024-01-01 11:00:00",
            "media_source": "organic",
            "campaign": None,
            "af_status": "Organic",
        }
    ).encode()
    poison = b"\xff{not json"
    return [
        (b"k1", good, "installs", 0, 100, ts, 0),
        (b"k2", poison, "installs", 1, 7, ts, 0),
    ]


def test_parse_install_events_offline(spark):
    raw = spark.createDataFrame(_wire_rows(), kafka_wire_schema())
    out = parse_install_events(raw).orderBy("offset").collect()
    assert [r.offset for r in out] == [7, 100]
    poison, good = out
    assert good.appsflyer_id == "af-1"
    assert good.event_ts == datetime.datetime(2024, 1, 1, 11, 59, 58)
    assert good.malformed is False
    # poison payloads survive as NULL structs, flagged not dropped
    assert poison.appsflyer_id is None
    assert poison.malformed is True


def test_kafka_builder_gate(spark):
    with pytest.raises(AnalysisException):
        read_kafka_stream(spark, "localhost:9092", "installs")
