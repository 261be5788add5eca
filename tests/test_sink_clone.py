"""SHALLOW CLONE (datasource_sink.clone_sink): a new sink whose
manifest references the source's parts by absolute path — zero bytes
copied. Pinned: independent divergence (appends/deletes on the clone
never touch the source and vice versa), dv/constraints/alias carry,
clone-side vacuum never reaps source parts, OPTIMIZE localizes the
foreign references (after which mutations work and the dependency on
the source is gone), and the stats-pruned Data Source read works over
the foreign parts."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    ClickHouseArrowDataSource,
    _manifest_read,
    clone_sink,
    optimize_sink,
    read_committed_parquet,
    vacuum_sink,
)
from appsflyer_to_clickhouse_spark.sinks.mutations import delete_where

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def _sink(spark, n=100, nparts=2):
    spark.dataSource.register(ClickHouseArrowDataSource)
    path = tempfile.mkdtemp(prefix="spark_graft_clone_src_") + "/s"
    per = n // nparts
    for i in range(nparts):
        (
            spark.range(i * per, (i + 1) * per)
            .select(F.col("id"), (F.col("id") * 2.0).alias("val"))
            .coalesce(1)
            .write.format("chbatch_arrow")
            .option("path", path)
            .mode("append")
            .save()
        )
    return path


def _append(spark, path, lo, hi):
    (
        spark.range(lo, hi)
        .select(F.col("id"), (F.col("id") * 2.0).alias("val"))
        .coalesce(1)
        .write.format("chbatch_arrow")
        .option("path", path)
        .mode("append")
        .save()
    )


def test_clone_is_zero_copy_and_reads_identically(spark):
    src = _sink(spark)
    dst = tempfile.mkdtemp(prefix="spark_graft_clone_dst_") + "/c"
    r = clone_sink(src, dst)
    assert r["n_parts"] == 2 and r["rows"] == 100
    # zero data files in the clone directory
    local = [f for f in os.listdir(dst) if f.startswith("part-")]
    assert local == []
    m = _manifest_read(dst)
    assert all(os.path.isabs(f) for f in m["files"])
    a = read_committed_parquet(spark, src, SCHEMA)
    b = read_committed_parquet(spark, dst, SCHEMA)
    assert sorted(r["id"] for r in b.collect()) == sorted(
        r["id"] for r in a.collect()
    )
    with pytest.raises(ValueError, match="already has a manifest"):
        clone_sink(src, dst)


def test_clone_diverges_independently(spark):
    src = _sink(spark)
    dst = tempfile.mkdtemp(prefix="spark_graft_clone_dst_") + "/c"
    clone_sink(src, dst)
    _append(spark, dst, 100, 110)  # clone-local append
    _append(spark, src, 200, 220)  # source append after the clone
    assert read_committed_parquet(spark, dst, SCHEMA).count() == 110
    assert read_committed_parquet(spark, src, SCHEMA).count() == 120
    # clone's local append landed in the clone dir, relative entry
    m = _manifest_read(dst)
    local = [f for f in m["files"] if not os.path.isabs(f)]
    assert len(local) == 1


def test_clone_carries_dv_and_datasource_read_works(spark):
    src = _sink(spark)
    delete_where(spark, src, SCHEMA, "id < 5", mode="dv")
    dst = tempfile.mkdtemp(prefix="spark_graft_clone_dst_") + "/c"
    clone_sink(src, dst)
    ds = (
        spark.read.format("chbatch_arrow")
        .schema(SCHEMA)
        .option("path", dst)
        .load()
    )
    assert ds.count() == 95  # source's dv applied through the clone
    assert ds.filter("id < 5").count() == 0
    # stats pruning over foreign parts: ids 0..49 live in part 1
    assert ds.filter("id >= 90").count() == 10


def test_clone_vacuum_never_reaps_source_parts(spark):
    src = _sink(spark)
    dst = tempfile.mkdtemp(prefix="spark_graft_clone_dst_") + "/c"
    clone_sink(src, dst)
    assert vacuum_sink(dst) == []
    assert read_committed_parquet(spark, src, SCHEMA).count() == 100


def test_mutations_refuse_foreign_then_optimize_localizes(spark):
    src = _sink(spark)
    dst = tempfile.mkdtemp(prefix="spark_graft_clone_dst_") + "/c"
    clone_sink(src, dst)
    with pytest.raises(ValueError, match="foreign"):
        delete_where(spark, dst, SCHEMA, "id = 1")
    st = optimize_sink(spark, dst, SCHEMA, target_rows_per_file=1000)
    assert st["replaced"] == 2
    m = _manifest_read(dst)
    assert all(not os.path.isabs(f) for f in m["files"])
    # dependency on the source is cut: mutate freely, source intact
    r = delete_where(spark, dst, SCHEMA, "id = 1")
    assert r["deleted"] == 1
    assert read_committed_parquet(spark, dst, SCHEMA).count() == 99
    assert read_committed_parquet(spark, src, SCHEMA).count() == 100
    src_files = sorted(os.listdir(os.path.dirname(src) + "/s"))
    assert len([f for f in src_files if f.startswith("part-")]) == 2


def test_optimize_on_clone_forces_even_when_compact(spark):
    """A clone of an already-compact table must still localize."""
    src = _sink(spark, nparts=1)
    dst = tempfile.mkdtemp(prefix="spark_graft_clone_dst_") + "/c"
    clone_sink(src, dst)
    st = optimize_sink(
        spark, dst, SCHEMA, target_rows_per_file=1_000_000
    )
    assert st["replaced"] == 1
    assert all(
        not os.path.isabs(f) for f in _manifest_read(dst)["files"]
    )
