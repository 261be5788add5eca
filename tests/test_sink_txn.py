"""Idempotent batch writes on the manifest sink (Delta's
txnAppId/txnVersion, datasource_sink._BatchWriter): an append stamped
with (app, version) at or below the app's recorded high-water mark is
dropped whole — the batch-mode twin of the stream tier's batchId
guard, for retried foreachBatch epochs and re-run backfills.
"""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    MANIFEST,
    ClickHouseArrowDataSource,
    ClickHouseBatchDataSource,
    read_committed,
    read_committed_parquet,
)

_SCHEMA = T.StructType(
    [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
)


def _write(spark, path, lo, hi, fmt="chbatch", app=None, version=None):
    spark.dataSource.register(ClickHouseBatchDataSource)
    spark.dataSource.register(ClickHouseArrowDataSource)
    w = (
        spark.range(lo, hi)
        .coalesce(1)
        .select(F.col("id").cast("string").alias("k"), F.col("id").alias("v"))
        .write.format(fmt)
        .option("path", path)
    )
    if app is not None:
        w = w.option("txnAppId", app).option("txnVersion", str(version))
    w.mode("append").save()


def _manifest(path):
    with open(os.path.join(path, MANIFEST)) as fh:
        return json.load(fh)


@pytest.mark.parametrize("fmt", ["chbatch", "chbatch_arrow"])
def test_replayed_txn_is_dropped_whole(spark, fmt):
    reader = read_committed if fmt == "chbatch" else read_committed_parquet
    path = tempfile.mkdtemp(prefix="txn_") + "/sink"
    _write(spark, path, 0, 100, fmt=fmt, app="backfill", version=1)
    # the exact retry AND a stale lower version are both replays
    _write(spark, path, 0, 100, fmt=fmt, app="backfill", version=1)
    _write(spark, path, 0, 100, fmt=fmt, app="backfill", version=0)
    m = _manifest(path)
    assert m["rows"] == 100
    assert m["txns"] == {"backfill": 1}
    assert reader(spark, path, _SCHEMA).count() == 100
    # replays leave no orphan parts behind
    parts = [n for n in os.listdir(path) if n.startswith("part-")]
    assert sorted(parts) == m["files"]
    # the next version publishes
    _write(spark, path, 100, 150, fmt=fmt, app="backfill", version=2)
    assert _manifest(path)["txns"] == {"backfill": 2}
    assert reader(spark, path, _SCHEMA).count() == 150


def test_txn_apps_are_independent_and_survive_untagged_commits(spark):
    path = tempfile.mkdtemp(prefix="txni_") + "/sink"
    _write(spark, path, 0, 50, app="job_a", version=7)
    # a different app's version space is independent
    _write(spark, path, 50, 80, app="job_b", version=1)
    # an untagged append must not erase the recorded txn map
    _write(spark, path, 80, 90)
    m = _manifest(path)
    assert m["txns"] == {"job_a": 7, "job_b": 1}
    assert m["rows"] == 90
    # job_a replay still suppressed after the interleaved commits
    _write(spark, path, 0, 50, app="job_a", version=7)
    assert _manifest(path)["rows"] == 90


def test_lone_txn_option_raises(spark):
    path = tempfile.mkdtemp(prefix="txnl_") + "/sink"
    spark.dataSource.register(ClickHouseBatchDataSource)
    with pytest.raises(Exception, match="BOTH txnAppId and txnVersion"):
        (
            spark.range(5)
            .select(F.col("id").cast("string").alias("k"), F.col("id").alias("v"))
            .write.format("chbatch")
            .option("path", path)
            .option("txnAppId", "only_app")
            .mode("append")
            .save()
        )
