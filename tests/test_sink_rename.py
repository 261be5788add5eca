"""RENAME COLUMN without data rewrite (column mapping on the manifest
protocol): the manifest's column_aliases map lets the Data Source
reader resolve each part's PHYSICAL name at read time — pre-rename
parts keep their bytes, post-rename parts carry the new name, one
logical schema over both. OPTIMIZE is the materialization verb; the
plain parquet readers and mutation verbs refuse while aliases are
live (NULL-filling pre-rename parts silently is the failure mode this
design forbids)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    ClickHouseArrowDataSource,
    _manifest_read,
    add_constraint,
    optimize_sink,
    prune_files,
    read_committed_parquet,
    rename_column,
    table_changes,
)
from appsflyer_to_clickhouse_spark.sinks.mutations import (
    delete_where,
    update_where,
)

OLD = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)
NEW = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("quality", T.DoubleType()),
    ]
)


def _sink(spark):
    spark.dataSource.register(ClickHouseArrowDataSource)
    path = tempfile.mkdtemp(prefix="spark_graft_rename_") + "/s"
    (
        spark.range(10)
        .select(F.col("id"), (F.col("id") * 0.5).alias("score"))
        .coalesce(1)
        .write.format("chbatch_arrow")
        .option("path", path)
        .mode("append")
        .save()
    )
    return path


def _ds_read(spark, path, schema):
    return (
        spark.read.format("chbatch_arrow")
        .schema(schema)
        .option("path", path)
        .load()
    )


def test_rename_reads_old_and_new_parts_under_one_name(spark):
    path = _sink(spark)
    files_before = sorted(_manifest_read(path)["files"])
    rename_column(path, "score", "quality")
    # no data file moved
    assert sorted(_manifest_read(path)["files"]) == files_before
    # post-rename append writes the NEW physical name
    (
        spark.range(10, 15)
        .select(F.col("id"), (F.col("id") * 0.5).alias("quality"))
        .coalesce(1)
        .write.format("chbatch_arrow")
        .option("path", path)
        .mode("append")
        .save()
    )
    got = _ds_read(spark, path, NEW)
    assert got.count() == 15
    rows = {r["id"]: r["quality"] for r in got.collect()}
    assert rows[3] == 1.5 and rows[12] == 6.0  # old and new part


def test_chained_rename_resolves_both_generations(spark):
    path = _sink(spark)
    rename_column(path, "score", "points")
    (
        spark.range(10, 12)
        .select(F.col("id"), (F.col("id") * 0.5).alias("points"))
        .coalesce(1)
        .write.format("chbatch_arrow")
        .option("path", path)
        .mode("append")
        .save()
    )
    rename_column(path, "points", "quality")
    m = _manifest_read(path)
    assert m["column_aliases"] == {"quality": ["points", "score"]}
    got = _ds_read(spark, path, NEW)
    assert got.count() == 12
    assert got.filter("quality = 5.5").count() == 1  # id=11, 'points' part
    assert got.filter("quality = 0.5").count() == 1  # id=1, 'score' part


def test_rename_onto_live_or_alias_name_refused(spark):
    path = _sink(spark)
    rename_column(path, "score", "quality")
    with pytest.raises(ValueError, match="already"):
        rename_column(path, "id", "quality")
    with pytest.raises(ValueError, match="already"):
        rename_column(path, "id", "score")  # historical alias


def test_plain_readers_and_mutations_refuse_live_renames(spark):
    path = _sink(spark)
    rename_column(path, "score", "quality")
    with pytest.raises(ValueError, match="renames are live"):
        read_committed_parquet(spark, path, NEW)
    with pytest.raises(ValueError, match="renames are live"):
        delete_where(spark, path, NEW, "id = 1")
    with pytest.raises(ValueError, match="renames are live"):
        update_where(spark, path, NEW, "id = 1", {"quality": "1.0"})
    with pytest.raises(ValueError, match="renames are live"):
        table_changes(spark, path, NEW, 0)


def test_optimize_materializes_renames(spark):
    path = _sink(spark)
    rename_column(path, "score", "quality")
    st = optimize_sink(spark, path, NEW, target_rows_per_file=1000)
    assert st["replaced"] == 1  # forced despite compact layout
    m = _manifest_read(path)
    assert "column_aliases" not in m
    # every path works again, including the plain parquet reader
    back = read_committed_parquet(spark, path, NEW)
    assert back.count() == 10
    assert back.filter("quality = 4.5").count() == 1
    r = delete_where(spark, path, NEW, "quality < 1.0")
    assert r["deleted"] == 2  # ids 0, 1


def test_stats_pruning_translates_through_aliases(spark):
    path = _sink(spark)  # part stats keyed under physical 'score'
    rename_column(path, "score", "quality")
    # prune_files on the LOGICAL name must find the old stats
    assert prune_files(path, "quality", 100.0, None) == []
    assert len(prune_files(path, "quality", 0.0, 1.0)) == 1
    # the Data Source reader's pushed-filter pruning likewise
    got = _ds_read(spark, path, NEW).filter("quality >= 100.0")
    assert got.count() == 0


def test_constraints_follow_the_rename(spark):
    path = _sink(spark)
    add_constraint(path, "score_range", "score", min=0.0, max=100.0)
    rename_column(path, "score", "quality")
    m = _manifest_read(path)
    assert m["constraints"]["score_range"]["column"] == "quality"
    # a violating post-rename append is still rejected
    bad = spark.createDataFrame([(99, -5.0)], NEW)
    with pytest.raises(Exception, match="constraint"):
        (
            bad.coalesce(1)
            .write.format("chbatch_arrow")
            .option("path", path)
            .mode("append")
            .save()
        )


def test_rename_interacts_with_dv_and_tail(spark):
    path = _sink(spark)
    delete_where(spark, path, OLD, "id = 2", mode="dv")
    rename_column(path, "score", "quality")
    got = _ds_read(spark, path, NEW)
    assert got.count() == 9  # dv still applied through the rename
    assert got.filter("id = 2").count() == 0
    # the plain tail resolves aliases too
    ckpt = tempfile.mkdtemp(prefix="spark_graft_rn_ck_")
    q = (
        spark.readStream.format("chbatch_arrow")
        .schema(NEW)
        .option("path", path)
        # the sink has a dv-delete commit: the plain tail now fails
        # loudly on data-changing commits (ADVICE r7) — this test
        # wants the pre-dv append rows, so it opts into the skip
        .option("ignorechanges", "true")
        .load()
        .writeStream.format("memory")
        .queryName("rename_tail")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from rename_tail").collect()
    # tail emits append-commit rows (pre-dv CDC semantics): all 10
    assert len(rows) == 10
    assert {r["quality"] for r in rows} == {i * 0.5 for i in range(10)}
