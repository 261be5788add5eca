"""Change Data Feed (datasource_sink.table_changes): per-commit
insert/delete rows reconstructed from the snapshot log — Delta CDF on
the single-manifest protocol. Pinned: fast paths are commit-bounded
(appends read their own files, dv deletes read only dv positions,
compact emits NOTHING), rewrite/merge/restore reconstruct exactly via
snapshot diff, folds refuse, and a downstream materialization of the
feed reproduces the table at every version."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    ClickHouseArrowDataSource,
    _manifest_read,
    optimize_sink,
    read_committed_parquet,
    restore_sink,
    sink_versions,
    table_changes,
    truncate_history,
)
from appsflyer_to_clickhouse_spark.sinks.mutations import (
    delete_where,
    merge_sink,
    update_where,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _sink(spark):
    spark.dataSource.register(ClickHouseArrowDataSource)
    return tempfile.mkdtemp(prefix="spark_graft_cdf_") + "/s"


def _append(spark, path, lo, hi, tagv="a"):
    (
        spark.range(lo, hi)
        .select(F.col("id"), F.lit(tagv).alias("v"))
        .coalesce(1)
        .write.format("chbatch_arrow")
        .option("path", path)
        .mode("append")
        .save()
    )


def _changes(spark, path, lo=0, hi=None):
    cdf = table_changes(spark, path, SCHEMA, lo, hi)
    return sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in cdf.collect()
    )


def test_cdf_across_all_verb_types(spark):
    path = _sink(spark)
    _append(spark, path, 0, 10)  # v0
    _append(spark, path, 10, 20)  # v1
    delete_where(spark, path, SCHEMA, "id IN (3, 13)", mode="dv")  # v2
    delete_where(spark, path, SCHEMA, "id >= 18")  # v3 CoW
    optimize_sink(spark, path, SCHEMA, target_rows_per_file=1000)  # v4
    src = spark.createDataFrame([(5, "UPD"), (100, "NEW")], SCHEMA)
    merge_sink(spark, path, SCHEMA, src, ["id"])  # v5

    got = _changes(spark, path)
    by_v = {}
    for cv, t, i, val in got:
        by_v.setdefault(cv, []).append((t, i, val))
    assert by_v[0] == [("insert", i, "a") for i in range(10)]
    assert by_v[1] == [("insert", i, "a") for i in range(10, 20)]
    assert sorted(by_v[2]) == [("delete", 3, "a"), ("delete", 13, "a")]
    assert sorted(by_v[3]) == [("delete", 18, "a"), ("delete", 19, "a")]
    assert 4 not in by_v  # compact: layout-only, NO change rows
    assert sorted(by_v[5]) == [
        ("delete", 5, "a"),
        ("insert", 5, "UPD"),
        ("insert", 100, "NEW"),
    ]


def test_cdf_partial_range_and_bad_range(spark):
    path = _sink(spark)
    _append(spark, path, 0, 5)
    delete_where(spark, path, SCHEMA, "id = 0", mode="dv")
    _append(spark, path, 5, 8)
    got = _changes(spark, path, 1, 2)
    assert got == [
        (1, "delete", 0, "a"),
        (2, "insert", 5, "a"),
        (2, "insert", 6, "a"),
        (2, "insert", 7, "a"),
    ]
    with pytest.raises(ValueError, match="outside retained"):
        table_changes(spark, path, SCHEMA, 0, 99)


def test_cdf_restore_emits_logical_diff(spark):
    path = _sink(spark)
    _append(spark, path, 0, 5)  # v0
    delete_where(spark, path, SCHEMA, "id = 2", mode="dv")  # v1
    restore_sink(path, 0)  # v2: brings id=2 back
    got = _changes(spark, path, 2, 2)
    assert got == [(2, "insert", 2, "a")]


def test_cdf_refuses_fold_base_in_range(spark):
    path = _sink(spark)
    _append(spark, path, 0, 3)
    _append(spark, path, 3, 6)
    _append(spark, path, 6, 9)
    truncate_history(path, 1)
    # the fold base (v1) swallowed commits 0-1: asking for changes
    # FROM it must refuse; asking from the first retained real commit
    # (v2) still works
    with pytest.raises(ValueError, match="fold"):
        table_changes(spark, path, SCHEMA, 1)
    got = _changes(spark, path, 2, 2)
    assert got == [(2, "insert", i, "a") for i in (6, 7, 8)]
    # and new commits after the fold keep feeding normally
    _append(spark, path, 9, 12)
    v = sink_versions(path)[-1]["v"]
    got = _changes(spark, path, v, v)
    assert got == [(v, "insert", i, "a") for i in (9, 10, 11)]


def test_cdf_materialization_reproduces_every_version(spark):
    """Applying the feed commit-by-commit onto an empty multiset must
    reproduce read_committed_parquet at every version — the CDC
    consumer contract."""
    path = _sink(spark)
    _append(spark, path, 0, 8)
    delete_where(spark, path, SCHEMA, "id % 3 = 1", mode="dv")
    src = spark.createDataFrame([(0, "U")], SCHEMA)
    merge_sink(spark, path, SCHEMA, src, ["id"])
    delete_where(spark, path, SCHEMA, "id >= 6")
    rows = _changes(spark, path)
    from collections import Counter

    state: Counter = Counter()
    versions = sorted({cv for cv, *_ in rows})
    for v in versions:
        for cv, t, i, val in rows:
            if cv != v:
                continue
            if t == "insert":
                state[(i, val)] += 1
            else:
                state[(i, val)] -= 1
        expect = Counter(
            (r["id"], r["v"])
            for r in read_committed_parquet(
                spark, path, SCHEMA, version=v
            ).collect()
        )
        assert +state == expect, f"v{v}"


CDF_SCHEMA = T.StructType(
    [
        *SCHEMA.fields,
        T.StructField("_change_type", T.StringType()),
        T.StructField("_commit_version", T.LongType()),
    ]
)


def _tail_changes(spark, path, name):
    ckpt = tempfile.mkdtemp(prefix="spark_graft_cdft_ck_")
    q = (
        spark.readStream.format("chbatch_arrow")
        .schema(CDF_SCHEMA)
        .option("path", path)
        .option("changefeed", "true")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in spark.sql(f"select * from {name}").collect()
    )


def test_stream_changefeed_emits_inserts_and_dv_deletes(spark):
    path = _sink(spark)
    _append(spark, path, 0, 6)
    _append(spark, path, 6, 10)
    delete_where(spark, path, SCHEMA, "id IN (2, 8)", mode="dv")
    optimize_sink(spark, path, SCHEMA, target_rows_per_file=1000)
    got = _tail_changes(spark, path, "cdf_tail_basic")
    exp = sorted(
        [(0, "insert", i, "a") for i in range(6)]
        + [(1, "insert", i, "a") for i in range(6, 10)]
        + [(2, "delete", 2, "a"), (2, "delete", 8, "a")]
    )
    assert got == exp  # compact (v3) emitted NOTHING


def test_stream_changefeed_refuses_rewrite_commits(spark):
    path = _sink(spark)
    _append(spark, path, 0, 5)
    # the refusal path now requires OPTING OUT of commit-time
    # sidecars (write_cdf defaults True — VERDICT r7 task 3)
    delete_where(spark, path, SCHEMA, "id = 0", write_cdf=False)
    ckpt = tempfile.mkdtemp(prefix="spark_graft_cdft_ck2_")
    q = (
        spark.readStream.format("chbatch_arrow")
        .schema(CDF_SCHEMA)
        .option("path", path)
        .option("changefeed", "true")
        .load()
        .writeStream.format("memory")
        .queryName("cdf_tail_refuse")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="rewrite-style"):
        q.awaitTermination()


def test_stream_changefeed_schema_guard(spark):
    path = _sink(spark)
    _append(spark, path, 0, 3)
    with pytest.raises(Exception, match="_change_type"):
        (
            spark.readStream.format("chbatch_arrow")
            .schema(SCHEMA)  # missing the change columns
            .option("path", path)
            .option("changefeed", "true")
            .load()
            .writeStream.format("memory")
            .queryName("cdf_tail_guard")
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="spark_graft_cdft_ck3_"),
            )
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )


def test_sidecar_makes_rewrites_commit_bounded(spark):
    """write_cdf=True on the rewrite verbs materializes change rows at
    commit; the batch feed serves them without a snapshot diff and
    the STREAM feed no longer refuses rewrite commits."""
    from appsflyer_to_clickhouse_spark.sinks.mutations import (
        update_where,
    )

    path = _sink(spark)
    _append(spark, path, 0, 10)  # v0
    delete_where(spark, path, SCHEMA, "id >= 8", write_cdf=True)  # v1
    update_where(
        spark, path, SCHEMA, "id = 3", {"v": "'U'"}, write_cdf=True
    )  # v2
    src = spark.createDataFrame([(0, "M"), (50, "N")], SCHEMA)
    merge_sink(spark, path, SCHEMA, src, ["id"], write_cdf=True)  # v3

    # batch feed
    got = _changes(spark, path, 1)
    by_v = {}
    for cv, t, i, val in got:
        by_v.setdefault(cv, []).append((t, i, val))
    assert sorted(by_v[1]) == [("delete", 8, "a"), ("delete", 9, "a")]
    assert sorted(by_v[2]) == [("delete", 3, "a"), ("insert", 3, "U")]
    assert sorted(by_v[3]) == [
        ("delete", 0, "a"),
        ("insert", 0, "M"),
        ("insert", 50, "N"),
    ]
    # stream feed serves the same rewrite commits end-to-end
    tail = _tail_changes(spark, path, "cdf_sidecar_tail")
    t_by_v = {}
    for cv, t, i, val in tail:
        t_by_v.setdefault(cv, []).append((t, i, val))
    assert sorted(t_by_v[1]) == sorted(by_v[1])
    assert sorted(t_by_v[2]) == sorted(by_v[2])
    assert sorted(t_by_v[3]) == sorted(by_v[3])
    # sidecars are invisible to table readers
    assert read_committed_parquet(spark, path, SCHEMA).count() == 9


def test_sidecars_vacuum_after_fold(spark):
    import os

    path = _sink(spark)
    _append(spark, path, 0, 10)
    delete_where(spark, path, SCHEMA, "id = 1", write_cdf=True)
    sidecars = [
        f for f in os.listdir(path) if f.startswith("cdf-")
    ]
    assert len(sidecars) >= 1
    # referenced by the live history entry: vacuum spares them
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        vacuum_sink,
    )

    assert vacuum_sink(path) == []
    _append(spark, path, 10, 12)
    truncate_history(path, 1)  # the delete's entry folds away
    removed = vacuum_sink(path)
    assert any(f.startswith("cdf-") for f in removed)
    assert not any(
        f.startswith("cdf-") for f in os.listdir(path)
    )


def test_rename_commit_is_silent_in_both_feeds(spark):
    """A rename commit is metadata-only: the batch feed emits nothing
    for it (and never snapshot-diffs), and the STREAMING feed must not
    treat it as a rewrite-style refusal."""
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        rename_column,
    )

    path = _sink(spark)
    _append(spark, path, 0, 5)
    rename_column(path, "v", "label")
    ren_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("label", T.StringType()),
        ]
    )
    # the BATCH feed's fast paths are plain parquet reads: it refuses
    # while renames are live (alias-aware reads are the Data Source's
    # job) — same contract as the other plain readers
    with pytest.raises(ValueError, match="renames are live"):
        table_changes(spark, path, ren_schema, 0)
    # the STREAMING feed is alias-aware and survives the rename commit
    cdf_schema = T.StructType(
        [
            *ren_schema.fields,
            T.StructField("_change_type", T.StringType()),
            T.StructField("_commit_version", T.LongType()),
        ]
    )
    ckpt = tempfile.mkdtemp(prefix="spark_graft_cdfr_ck_")
    q = (
        spark.readStream.format("chbatch_arrow")
        .schema(cdf_schema)
        .option("path", path)
        .option("changefeed", "true")
        .load()
        .writeStream.format("memory")
        .queryName("cdf_rename_tail")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("select * from cdf_rename_tail").collect()
    assert len(out) == 5
    assert {r["label"] for r in out} == {"a"}  # alias resolved
    # after OPTIMIZE materializes the rename, the batch feed works
    # again and the rename + compact commits both emit nothing
    optimize_sink(spark, path, ren_schema, target_rows_per_file=1000)
    got = table_changes(spark, path, ren_schema, 0)
    rows = sorted(
        (r["_commit_version"], r["_change_type"], r["id"])
        for r in got.collect()
    )
    assert rows == [(0, "insert", i) for i in range(5)]


def test_defaults_make_stream_changefeed_never_refuse(spark, tmp_path):
    """VERDICT r7 task 3: write_cdf defaults to True on ALL THREE
    rewrite verbs, so a default-flag verb sequence leaves no commit
    the STREAMING change feed refuses — and the feed's output equals
    the batch table_changes reconstruction over the same range."""
    path = _sink(spark)
    _append(spark, path, 0, 10)  # v0
    # all three rewrite verbs, DEFAULT flags
    delete_where(spark, path, SCHEMA, "id >= 8")  # v1 CoW
    update_where(spark, path, SCHEMA, "id = 3", {"v": "'U'"})  # v2
    src = spark.createDataFrame(
        [(2, "M"), (100, "N")], "id long, v string"
    )
    merge_sink(spark, path, SCHEMA, src, ["id"])  # v3
    m = _manifest_read(path)
    rewrites = [
        e
        for e in m["history"]
        if e.get("op") in ("delete", "update", "merge")
    ]
    assert rewrites and all(e.get("cdf_files") for e in rewrites)
    cdf_schema = T.StructType(
        [
            *SCHEMA.fields,
            T.StructField("_change_type", T.StringType()),
            T.StructField("_commit_version", T.LongType()),
        ]
    )
    out = str(tmp_path / "cdfdef_out")
    q = (
        spark.readStream.format("chbatch_arrow")
        .schema(cdf_schema)
        .option("path", path)
        .option("changefeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "cdfdef_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()  # never raises: every commit is servable
    got = spark.read.schema(cdf_schema).parquet(out)
    batch = table_changes(spark, path, SCHEMA, 0, 3)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_write_cdf_false_still_serves_via_snapshot_diff(spark):
    """The opt-out keeps the exact two-snapshot diff reconstruction:
    content-identical changes to a sidecar run of the same verbs."""
    path = _sink(spark)
    _append(spark, path, 0, 10)  # v0
    delete_where(spark, path, SCHEMA, "id >= 8", write_cdf=False)
    m = _manifest_read(path)
    assert not m["history"][-1].get("cdf_files")
    diff = table_changes(spark, path, SCHEMA, 1, 1)
    rows = sorted(map(tuple, diff.collect()))
    assert all(r[-2] == "delete" for r in rows)
    assert [r[0] for r in rows] == [8, 9]
