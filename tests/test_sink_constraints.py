"""CHECK constraints on the manifest sink (NOT NULL + range),
enforced at commit time from per-part stats — metadata arithmetic,
zero data IO — plus the table-metadata carry contract: appends and
stream commits must preserve constraints, the txn map, AND live
deletion vectors (dropping dv on append would resurrect deleted
rows)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    ClickHouseArrowDataSource,
    ClickHouseBatchDataSource,
    _manifest_read,
    add_constraint,
    drop_constraint,
    read_committed_parquet,
    sink_versions,
)
from appsflyer_to_clickhouse_spark.sinks.mutations import delete_where

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def _sink(spark, fmt="chbatch_arrow"):
    spark.dataSource.register(
        ClickHouseArrowDataSource
        if fmt == "chbatch_arrow"
        else ClickHouseBatchDataSource
    )
    path = tempfile.mkdtemp(prefix="spark_graft_constraint_") + "/s"
    (
        spark.range(100)
        .select(F.col("id"), (F.col("id") * 1.0).alias("val"))
        .coalesce(1)
        .write.format(fmt)
        .option("path", path)
        .mode("append")
        .save()
    )
    return path


def _append(spark, path, df, fmt="chbatch_arrow"):
    (
        df.coalesce(1)
        .write.format(fmt)
        .option("path", path)
        .mode("append")
        .save()
    )


def test_violating_append_rejected_and_discarded(spark):
    path = _sink(spark)
    add_constraint(path, "id_range", "id", min=0, max=10_000)
    m0 = _manifest_read(path)
    bad = spark.createDataFrame([(-5, 1.0), (3, 1.0)], SCHEMA)
    with pytest.raises(Exception, match="constraint"):
        _append(spark, path, bad)
    m1 = _manifest_read(path)
    assert m1["files"] == m0["files"]
    assert m1["rows"] == 100
    # the rejected commit's parts were deleted — no orphans to vacuum
    import os

    on_disk = [f for f in os.listdir(path) if f.startswith("part-")]
    assert sorted(on_disk) == sorted(m1["files"])
    # and a clean append still works
    good = spark.createDataFrame([(200, 1.0)], SCHEMA)
    _append(spark, path, good)
    assert read_committed_parquet(spark, path, SCHEMA).count() == 101


def test_not_null_constraint(spark):
    path = _sink(spark)
    add_constraint(path, "val_nn", "val", not_null=True)
    bad = spark.createDataFrame([(1, None)], SCHEMA)
    with pytest.raises(Exception, match="NULL"):
        _append(spark, path, bad)
    # NULLs pass a pure range constraint (SQL CHECK: unknown != false)
    drop_constraint(path, "val_nn")
    add_constraint(path, "val_range", "val", min=0.0, max=1e9)
    _append(spark, path, spark.createDataFrame([(1, None)], SCHEMA))
    assert read_committed_parquet(spark, path, SCHEMA).count() == 101


def test_add_constraint_validates_existing_data(spark):
    path = _sink(spark)  # ids 0..99
    with pytest.raises(ValueError, match="existing data"):
        add_constraint(path, "id_low", "id", min=0, max=50)
    assert "constraints" not in _manifest_read(path)
    add_constraint(path, "id_ok", "id", min=0, max=99)
    with pytest.raises(ValueError, match="already exists"):
        add_constraint(path, "id_ok", "id", min=0)


def test_jsonl_tier_enforces_too(spark):
    path = _sink(spark, fmt="chbatch")
    add_constraint(path, "id_range", "id", min=0, max=10_000)
    bad = spark.createDataFrame([(-1, 0.0)], SCHEMA)
    with pytest.raises(Exception, match="constraint"):
        _append(spark, path, bad, fmt="chbatch")
    _append(
        spark, path, spark.createDataFrame([(5, 0.0)], SCHEMA), fmt="chbatch"
    )
    m = _manifest_read(path)
    assert m["rows"] == 101


def test_stream_commit_enforces_constraints(spark):
    import os

    path = _sink(spark)
    add_constraint(path, "id_range", "id", min=0, max=10_000)
    src_dir = tempfile.mkdtemp(prefix="spark_graft_cstream_src_")
    ckpt = tempfile.mkdtemp(prefix="spark_graft_cstream_ck_")
    spark.createDataFrame([(-7, 1.0)], SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src_dir)
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    q = (
        stream.writeStream.format("chbatch_arrow")
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="constraint"):
        q.awaitTermination()
    m = _manifest_read(path)
    assert m["rows"] == 100  # the violating micro-batch never published
    on_disk = [f for f in os.listdir(path) if f.startswith("part-")]
    assert sorted(on_disk) == sorted(m["files"])


def test_append_preserves_dv_and_constraints(spark):
    """The manifest-rebuild carry: an append after a dv-delete must
    keep the vectors (else deleted rows resurrect) and the
    constraints; a stream commit likewise."""
    path = _sink(spark)
    add_constraint(path, "id_range", "id", min=-100, max=10_000)
    delete_where(spark, path, SCHEMA, "id < 10", mode="dv")
    assert read_committed_parquet(spark, path, SCHEMA).count() == 90
    _append(spark, path, spark.createDataFrame([(500, 1.0)], SCHEMA))
    m = _manifest_read(path)
    assert m.get("dv"), "append dropped the deletion vectors"
    assert m.get("constraints"), "append dropped the constraints"
    back = read_committed_parquet(spark, path, SCHEMA)
    assert back.count() == 91
    assert back.filter("id < 10").count() == 0  # still deleted
    # stream commit carries them too
    src_dir = tempfile.mkdtemp(prefix="spark_graft_dvs_src_")
    ckpt = tempfile.mkdtemp(prefix="spark_graft_dvs_ck_")
    spark.createDataFrame([(600, 1.0)], SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src_dir)
    q = (
        spark.readStream.schema(SCHEMA)
        .parquet(src_dir)
        .writeStream.format("chbatch_arrow")
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    m = _manifest_read(path)
    assert m.get("dv") and m.get("constraints")
    back = read_committed_parquet(spark, path, SCHEMA)
    assert back.count() == 92
    assert back.filter("id < 10").count() == 0


def test_restore_keeps_constraints(spark):
    path = _sink(spark)
    v0 = sink_versions(path)[-1]["v"]
    _append(spark, path, spark.createDataFrame([(7_000, 1.0)], SCHEMA))
    add_constraint(path, "id_range", "id", min=0, max=10_000)
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        restore_sink,
    )

    restore_sink(path, v0)
    m = _manifest_read(path)
    assert m.get("constraints"), "restore dropped the constraints"
    with pytest.raises(Exception, match="constraint"):
        _append(spark, path, spark.createDataFrame([(-1, 1.0)], SCHEMA))


def test_nan_bound_refused(spark):
    path = _sink(spark)
    with pytest.raises(ValueError, match="NaN"):
        add_constraint(path, "bad", "val", min=float("nan"))
    with pytest.raises(ValueError, match="nothing to enforce"):
        add_constraint(path, "empty", "val")
