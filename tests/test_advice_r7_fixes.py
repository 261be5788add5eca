"""Regression pins for the round-7 ADVICE findings:

1. copy-on-write DELETE keeps rows where the predicate evaluates to
   NULL (SQL/Delta semantics) instead of silently dropping them from
   the rewrite;
2. read_committed_pruned applies deletion vectors on a SHALLOW CLONE
   (dv keyed by basename vs absolute foreign part paths);
3. the plain (non-changefeed) streaming tail FAILS LOUDLY on
   data-changing commits (merge/update/delete) instead of silently
   skipping merge-inserted rows — with an explicit ignoreChanges
   opt-in restoring the skip;
4. optimize_sink's alias-materialization branch aborts when a part is
   appended mid-rewrite (the .load() re-resolution race);
5. dv_for_version pops removed parts' vectors by BASENAME too, so a
   clone-localizing compact's absolute `removes` still materialize.
"""

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
    dv_for_version,
    optimize_sink,
    read_committed_parquet,
    read_committed_pruned,
)
from appsflyer_to_clickhouse_spark.sinks.mutations import delete_where

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def _build(spark, n=300, null_val_ids=(), parts=((0, 150), (150, 300))):
    spark.dataSource.register(ClickHouseArrowDataSource)
    path = tempfile.mkdtemp(prefix="spark_graft_adv_") + "/s"
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 7).cast("string").alias("grp"),
        F.when(
            F.col("id").isin(*null_val_ids) if null_val_ids else F.lit(False),
            F.lit(None).cast("double"),
        )
        .otherwise(F.col("id") * 1.5)
        .alias("val"),
    )
    for lo, hi in parts:
        (
            df.filter((F.col("id") >= lo) & (F.col("id") < hi))
            .coalesce(1)
            .write.format("chbatch_arrow")
            .option("path", path)
            .option("batchsize", "100000")
            .mode("append")
            .save()
        )
    return path


def _ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_cow_delete_keeps_null_predicate_rows(spark):
    # rows 10 and 20 have val=NULL; `val > 200` is NULL for them —
    # SQL DELETE does not delete them, and the rewrite must KEEP them
    path = _build(spark, null_val_ids=(10, 20))
    r = delete_where(spark, path, SCHEMA, "val > 200")
    # val > 200 <=> id*1.5 > 200 <=> id >= 134 (excluding NULL rows)
    expected_deleted = len([i for i in range(300) if i not in (10, 20) and i * 1.5 > 200])
    assert r["deleted"] == expected_deleted
    back = read_committed_parquet(spark, path, SCHEMA)
    ids = _ids(back)
    # the NULL-val rows SURVIVE — this is the regression
    assert 10 in ids and 20 in ids
    assert ids == sorted(
        i for i in range(300) if i in (10, 20) or not i * 1.5 > 200
    )
    # and the manifest rows counter matches the surviving count
    assert _manifest_read(path)["rows"] == len(ids)


def test_pruned_read_applies_dv_on_shallow_clone(spark):
    src = _build(spark)
    r = delete_where(spark, src, SCHEMA, "id % 50 = 0", mode="dv")
    assert r["deleted"] == 6
    dst = tempfile.mkdtemp(prefix="spark_graft_advclone_") + "/c"
    clone_sink(src, dst)
    # the clone's parts are ABSOLUTE foreign paths; dv is keyed by
    # basename — the pruned read must still subtract the vectors
    got = read_committed_pruned(spark, dst, SCHEMA, "id", 0, 299)
    ids = _ids(got)
    assert all(i % 50 != 0 for i in ids)
    assert len(ids) == 294


def test_plain_tail_raises_on_data_changing_commit(spark, tmp_path):
    path = _build(spark)
    delete_where(spark, path, SCHEMA, "id % 50 = 0", mode="dv")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    stream = (
        spark.readStream.format("chbatch_arrow")
        .schema(SCHEMA)
        .option("path", path)
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="data-changing|changefeed"):
        q.awaitTermination()


def test_plain_tail_ignorechanges_skips_knowingly(spark, tmp_path):
    path = _build(spark)
    delete_where(spark, path, SCHEMA, "id >= 250", mode="rewrite")
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "out2")
    stream = (
        spark.readStream.format("chbatch_arrow")
        .schema(SCHEMA)
        .option("path", path)
        .option("ignorechanges", "true")
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.schema(SCHEMA).parquet(out)
    # the two original append commits are emitted in full; the
    # delete's rewrite commit is skipped (opted-in ignoreChanges) —
    # so ALL 300 original rows appear, including the later-deleted
    assert got.count() == 300


def test_optimize_alias_branch_aborts_on_concurrent_append(spark):
    from appsflyer_to_clickhouse_spark.sinks import datasource_sink as ds

    path = _build(spark)
    ds.rename_column(path, "val", "score")
    schema2 = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("grp", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    # simulate a concurrent append landing between the manifest capture
    # and the commit: tamper _manifest_read so the under-lock re-read
    # sees one extra part that the rewrite's .load() may have read
    real_read = ds._manifest_read
    state = {"fired": False}

    def tampering_read(p):
        m = real_read(p)
        if state["fired"]:
            m = dict(m)
            m["files"] = [*m["files"], "part-slipped-in.parquet"]
        return m

    ds._manifest_read = tampering_read
    try:
        import unittest.mock as mock

        real_lock = ds._manifest_lock

        def lock_then_fire(p, *a, **k):
            state["fired"] = True
            return real_lock(p, *a, **k)

        with mock.patch.object(ds, "_manifest_lock", lock_then_fire):
            # retries=0 pins the single-attempt abort mechanics (the
            # public default retries and the injected slip persists,
            # which is not a retryable real-world state)
            with pytest.raises(ValueError, match="appended during"):
                optimize_sink(spark, path, schema2, retries=0)
    finally:
        ds._manifest_read = real_read
    # the aborted rewrite discarded its outputs: current snapshot reads
    # fine through the alias-aware reader
    state["fired"] = False
    df = (
        spark.read.format("chbatch_arrow")
        .schema(schema2)
        .option("path", path)
        .load()
    )
    assert df.count() == 300


def test_dv_for_version_pops_absolute_removes_by_basename(spark):
    # clone a sink with live dv, then localize via optimize: the
    # compact's removes are ABSOLUTE foreign paths while dv keys are
    # basenames — as-of-latest dv must come back EMPTY (materialized)
    src = _build(spark)
    delete_where(spark, src, SCHEMA, "id % 50 = 0", mode="dv")
    dst = tempfile.mkdtemp(prefix="spark_graft_advdv_") + "/c"
    clone_sink(src, dst)
    r = optimize_sink(spark, dst, SCHEMA, target_rows_per_file=1000)
    assert r["written"] >= 1
    m = _manifest_read(dst)
    latest = max(e["v"] for e in m["history"])
    assert dv_for_version(m, latest) == {}
    got = read_committed_parquet(spark, dst, SCHEMA, version=latest)
    assert got.count() == 294
