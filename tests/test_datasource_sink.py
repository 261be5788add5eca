"""Two-phase commit protocol of the Python Data Source writer
(sinks/datasource_sink.py): only manifest-published parts are visible,
orphan parts from failed/speculative attempts are not, and executor
flush cadence follows batchsize.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    MANIFEST,
    ClickHouseBatchDataSource,
    read_committed,
)

_SCHEMA = T.StructType(
    [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
)


def _write(spark, path: str, n: int, batchsize: int, parts: int = 2) -> None:
    spark.dataSource.register(ClickHouseBatchDataSource)
    df = (
        spark.range(n)
        .repartition(parts)
        .select(F.col("id").cast("string").alias("k"), F.col("id").alias("v"))
    )
    (
        df.write.format("chbatch")
        .option("path", path)
        .option("batchsize", str(batchsize))
        .mode("append")
        .save()
    )


def test_round_trip_preserves_rows_and_batches_by_size(spark):
    path = tempfile.mkdtemp(prefix="chb_") + "/out"
    _write(spark, path, n=2300, batchsize=500, parts=2)
    with open(os.path.join(path, MANIFEST)) as fh:
        manifest = json.load(fh)
    assert manifest["rows"] == 2300
    # 2 partitions x ceil(~1150/500) = 3 flushes each
    assert manifest["batches"] >= 4
    assert len(manifest["files"]) == manifest["batches"]
    back = read_committed(spark, path, _SCHEMA)
    assert back.count() == 2300
    assert back.agg(F.sum("v")).first()[0] == 2300 * 2299 // 2


def test_orphan_parts_are_invisible_to_readers(spark):
    """A part file not named by the manifest — a failed or speculative
    task attempt — must never be read."""
    path = tempfile.mkdtemp(prefix="chb_") + "/out"
    _write(spark, path, n=100, batchsize=50, parts=1)
    orphan = os.path.join(path, "part-orphanorphan.jsonl")
    with open(orphan, "w") as fh:
        fh.write(json.dumps({"k": "ghost", "v": 999999}) + "\n")
    back = read_committed(spark, path, _SCHEMA)
    assert back.count() == 100
    assert back.filter(F.col("k") == "ghost").count() == 0
