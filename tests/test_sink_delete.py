"""Row-level DELETE / MERGE on the manifest sink (sinks/mutations.py):
copy-on-write rewrites, merge-on-read deletion vectors, and their
interaction with every other snapshot-log verb (time travel, OPTIMIZE,
RESTORE, truncate_history, the Data Source reader).

The scale contracts pinned here:
- copy-on-write rewrites ONLY parts that contain matches (n_rewritten
  graded), with the match scan bounded by stats pruning when scoped;
- dv deletes rewrite NOTHING and readers subtract positions via a
  broadcast anti-join / per-part positional mask;
- OPTIMIZE materializes vectors (never resurrects deleted rows);
- dv_current == dv_for_version(latest) after ANY verb sequence.
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
    dv_current,
    dv_for_version,
    optimize_sink,
    read_committed_parquet,
    read_committed_pruned,
    restore_sink,
    sink_versions,
    truncate_history,
    vacuum_sink,
)
from appsflyer_to_clickhouse_spark.sinks.mutations import (
    delete_where,
    merge_sink,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def _build(spark, n=900, parts=((0, 300), (300, 600), (600, 900))):
    """A sink of len(parts) single-file appends over ids [0, n)."""
    spark.dataSource.register(ClickHouseArrowDataSource)
    path = tempfile.mkdtemp(prefix="spark_graft_del_") + "/s"
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 7).cast("string").alias("grp"),
        (F.col("id") * 1.5).alias("val"),
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


def test_cow_delete_rewrites_only_touched_parts(spark):
    path = _build(spark)
    r = delete_where(
        spark,
        path,
        SCHEMA,
        "id >= 350 AND id < 400",
        prune_column="id",
        prune_lo=350,
        prune_hi=399,
    )
    # stats pruning scoped the scan to the one part that can match,
    # and only that part was rewritten
    assert r["mode"] == "rewrite"
    assert r["deleted"] == 50
    assert r["n_rewritten"] == 1
    assert r["n_kept"] == 0  # pruning removed the other candidates
    back = read_committed_parquet(spark, path, SCHEMA)
    assert back.count() == 850
    assert back.filter("id >= 350 and id < 400").count() == 0
    m = _manifest_read(path)
    assert m["rows"] == 850
    entry = m["history"][-1]
    assert entry["op"] == "delete" and entry["mode"] == "rewrite"
    assert len(entry["removes"]) == 1
    # untouched parts still back the read (2 originals + 1 rewrite)
    n_backing = (
        back.select(F.col("_metadata.file_path")).distinct().count()
    )
    assert n_backing == 3


def test_cow_delete_time_travel_sees_predeleted_rows(spark):
    path = _build(spark)
    pre_v = sink_versions(path)[-1]["v"]
    delete_where(spark, path, SCHEMA, "grp = '3'")
    cur = read_committed_parquet(spark, path, SCHEMA)
    assert cur.filter("grp = '3'").count() == 0
    old = read_committed_parquet(spark, path, SCHEMA, version=pre_v)
    assert old.count() == 900


def test_cow_delete_whole_part_drops_it(spark):
    path = _build(spark)
    r = delete_where(spark, path, SCHEMA, "id < 300")
    assert r["deleted"] == 300 and r["n_rewritten"] == 1
    m = _manifest_read(path)
    # the all-deleted part produced no replacement file
    assert m["history"][-1]["files"] == []
    assert len(m["files"]) == 2
    assert read_committed_parquet(spark, path, SCHEMA).count() == 600


def test_cow_delete_no_matches_is_a_noop(spark):
    path = _build(spark)
    before = _manifest_read(path)
    r = delete_where(spark, path, SCHEMA, "id > 100000")
    assert r == {
        "deleted": 0,
        "n_rewritten": 0,
        "n_kept": 3,
        "version": None,
        "mode": "rewrite",
    }
    assert _manifest_read(path) == before


def test_dv_delete_rewrites_nothing(spark):
    path = _build(spark)
    files_before = sorted(_manifest_read(path)["files"])
    r = delete_where(spark, path, SCHEMA, "id % 90 = 1", mode="dv")
    assert r["mode"] == "dv"
    assert r["deleted"] == 10
    assert r["n_rewritten"] == 0
    m = _manifest_read(path)
    assert sorted(m["files"]) == files_before  # no data file moved
    assert m["rows"] == 890
    assert sum(len(v) for v in m["dv"].values()) == 10
    back = read_committed_parquet(spark, path, SCHEMA)
    assert back.count() == 890
    assert back.filter("id % 90 = 1").count() == 0


def test_dv_delete_datasource_reader_masks(spark):
    path = _build(spark)
    delete_where(spark, path, SCHEMA, "id IN (5, 305, 605)", mode="dv")
    ds = (
        spark.read.format("chbatch_arrow")
        .schema(SCHEMA)
        .option("path", path)
        .load()
    )
    assert ds.count() == 897
    assert ds.filter("id IN (5, 305, 605)").count() == 0
    # pushed-filter pruning composes with the mask
    assert ds.filter("id = 5").count() == 0
    assert ds.filter("id = 6").count() == 1


def test_dv_delete_as_of_versions_are_exact(spark):
    path = _build(spark)
    v0 = sink_versions(path)[-1]["v"]
    r1 = delete_where(spark, path, SCHEMA, "id = 10", mode="dv")
    r2 = delete_where(spark, path, SCHEMA, "id = 20", mode="dv")
    assert (
        read_committed_parquet(spark, path, SCHEMA, version=v0).count()
        == 900
    )
    asof1 = read_committed_parquet(
        spark, path, SCHEMA, version=r1["version"]
    )
    assert asof1.count() == 899
    assert asof1.filter("id = 20").count() == 1  # not yet deleted at v1
    asof2 = read_committed_parquet(
        spark, path, SCHEMA, version=r2["version"]
    )
    assert asof2.count() == 898
    m = _manifest_read(path)
    assert dv_current(m) == dv_for_version(m, r2["version"])


def test_dv_deletes_accumulate_and_commute(spark):
    path = _build(spark)
    delete_where(spark, path, SCHEMA, "id = 1", mode="dv")
    # overlapping predicate: id=1 already gone, only id=2 is new
    r = delete_where(spark, path, SCHEMA, "id IN (1, 2)", mode="dv")
    assert r["deleted"] == 1
    m = _manifest_read(path)
    assert m["rows"] == 898
    assert read_committed_parquet(spark, path, SCHEMA).count() == 898


def test_dv_cap_raises_loudly(spark):
    path = _build(spark)
    with pytest.raises(ValueError, match="dv_max_rows"):
        delete_where(
            spark, path, SCHEMA, "id < 500", mode="dv", dv_max_rows=100
        )
    # nothing was committed
    m = _manifest_read(path)
    assert m["rows"] == 900 and "dv" not in m


def test_optimize_materializes_dvs(spark):
    path = _build(spark)
    delete_where(spark, path, SCHEMA, "id % 2 = 1 AND id < 20", mode="dv")
    st = optimize_sink(spark, path, SCHEMA, target_rows_per_file=1000)
    assert st["replaced"] == 3
    m = _manifest_read(path)
    assert "dv" not in m  # vectors materialized away
    back = read_committed_parquet(spark, path, SCHEMA)
    assert back.count() == 890
    assert back.filter("id % 2 = 1 AND id < 20").count() == 0
    # physical rows in the compacted parts equal logical rows
    import pyarrow.parquet as pq

    physical = sum(
        pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
        for f in m["files"]
    )
    assert physical == 890


def test_cow_delete_materializes_existing_dvs_on_touched_parts(spark):
    path = _build(spark)
    delete_where(spark, path, SCHEMA, "id = 0", mode="dv")
    # CoW rewrite of the same part must not resurrect id=0
    delete_where(spark, path, SCHEMA, "id = 1")
    back = read_committed_parquet(spark, path, SCHEMA)
    assert back.filter("id IN (0, 1)").count() == 0
    assert back.count() == 898
    m = _manifest_read(path)
    assert "dv" not in m  # the touched part's vector went with it


def test_restore_rolls_back_dv_state(spark):
    path = _build(spark)
    v0 = sink_versions(path)[-1]["v"]
    delete_where(spark, path, SCHEMA, "id = 7", mode="dv")
    rr = restore_sink(path, v0)
    assert rr["changed"]
    back = read_committed_parquet(spark, path, SCHEMA)
    assert back.count() == 900
    assert back.filter("id = 7").count() == 1
    m = _manifest_read(path)
    assert "dv" not in m
    assert m["rows"] == 900
    # and restore FORWARD to the deleted state works too
    dv_v = [e["v"] for e in m["history"] if e.get("op") == "delete"][-1]
    restore_sink(path, dv_v)
    assert read_committed_parquet(spark, path, SCHEMA).count() == 899
    m = _manifest_read(path)
    assert dv_current(m) == dv_for_version(
        m, max(e["v"] for e in m["history"])
    )


def test_fold_carries_dv_state(spark):
    path = _build(spark)
    delete_where(spark, path, SCHEMA, "id = 3", mode="dv")
    delete_where(spark, path, SCHEMA, "id = 4", mode="dv")
    folded = truncate_history(path, 1)
    assert folded >= 2
    m = _manifest_read(path)
    base = sorted(m["history"], key=lambda e: e["v"])[0]
    assert base.get("folded")
    # the base's absolute dv_set reproduces the folded deletes
    assert sum(len(v) for v in base["dv_set"].values()) >= 1
    back = read_committed_parquet(spark, path, SCHEMA)
    assert back.count() == 898
    assert back.filter("id IN (3, 4)").count() == 0
    assert dv_current(m) == dv_for_version(
        m, max(e["v"] for e in m["history"])
    )


def test_pruned_read_applies_dvs(spark):
    path = _build(spark)
    delete_where(spark, path, SCHEMA, "id = 100", mode="dv")
    df = read_committed_pruned(spark, path, SCHEMA, "id", 90, 110)
    got = _ids(df)
    assert got == [i for i in range(90, 111) if i != 100]


def test_jsonl_tier_refuses_mutations(spark):
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        ClickHouseBatchDataSource,
    )

    spark.dataSource.register(ClickHouseBatchDataSource)
    path = tempfile.mkdtemp(prefix="spark_graft_deljson_") + "/s"
    (
        spark.range(10)
        .select(
            F.col("id"),
            F.lit("a").alias("grp"),
            F.lit(1.0).alias("val"),
        )
        .write.format("chbatch")
        .option("path", path)
        .mode("append")
        .save()
    )
    with pytest.raises(ValueError, match="parquet"):
        delete_where(spark, path, SCHEMA, "id = 1")
    with pytest.raises(ValueError, match="parquet"):
        merge_sink(
            spark, path, SCHEMA, spark.createDataFrame([], SCHEMA), ["id"]
        )


def test_merge_updates_and_inserts(spark):
    path = _build(spark)
    src = spark.createDataFrame(
        [(0, "UPD", -1.0), (305, "UPD", -2.0), (9999, "NEW", -3.0)],
        SCHEMA,
    )
    r = merge_sink(spark, path, SCHEMA, src, ["id"])
    assert r["updated"] == 2
    assert r["inserted"] == 1
    assert r["n_rewritten"] == 2  # ids 0 and 305 live in two parts
    assert r["n_kept"] == 1
    back = read_committed_parquet(spark, path, SCHEMA)
    assert back.count() == 901
    rows = {
        r["id"]: (r["grp"], r["val"])
        for r in back.filter("id IN (0, 305, 9999, 10)").collect()
    }
    assert rows[0] == ("UPD", -1.0)
    assert rows[305] == ("UPD", -2.0)
    assert rows[9999] == ("NEW", -3.0)
    assert rows[10] == ("3", 15.0)  # untouched row intact
    m = _manifest_read(path)
    assert m["rows"] == 901
    assert m["history"][-1]["op"] == "merge"


def test_merge_duplicate_source_keys_raise(spark):
    path = _build(spark)
    src = spark.createDataFrame(
        [(1, "a", 0.0), (1, "b", 1.0)], SCHEMA
    )
    with pytest.raises(ValueError, match="multiple rows"):
        merge_sink(spark, path, SCHEMA, src, ["id"])


def test_merge_insert_only_touches_nothing(spark):
    path = _build(spark)
    files_before = sorted(_manifest_read(path)["files"])
    src = spark.createDataFrame([(5000, "NEW", 0.0)], SCHEMA)
    r = merge_sink(spark, path, SCHEMA, src, ["id"])
    assert r["updated"] == 0 and r["inserted"] == 1
    assert r["n_rewritten"] == 0 and r["n_kept"] == 3
    m = _manifest_read(path)
    assert set(files_before) <= set(m["files"])
    assert read_committed_parquet(spark, path, SCHEMA).count() == 901


def test_merge_applies_existing_dvs(spark):
    path = _build(spark)
    delete_where(spark, path, SCHEMA, "id = 2", mode="dv")
    # merge on a DIFFERENT key in the same part: the rewrite must not
    # resurrect id=2
    src = spark.createDataFrame([(3, "UPD", 0.0)], SCHEMA)
    merge_sink(spark, path, SCHEMA, src, ["id"])
    back = read_committed_parquet(spark, path, SCHEMA)
    assert back.filter("id = 2").count() == 0
    assert back.filter("id = 3").collect()[0]["grp"] == "UPD"
    assert back.count() == 899


def test_vacuum_reclaims_cow_deleted_parts_after_fold(spark):
    path = _build(spark)
    delete_where(spark, path, SCHEMA, "id < 300")
    # originals still referenced by retained history: vacuum spares
    assert vacuum_sink(path) == []
    # the fold must move PAST the delete commit for the replaced
    # original to lose its last reference (same hand-off as OPTIMIZE):
    # with the delete as the newest entry, retain_last=1 keeps it and
    # the base still references the original
    truncate_history(path, 1)
    assert vacuum_sink(path) == []
    src = spark.createDataFrame([(5000, "NEW", 0.0)], SCHEMA)
    merge_sink(spark, path, SCHEMA, src, ["id"])  # one more commit
    truncate_history(path, 1)  # now the delete itself folds
    removed = vacuum_sink(path)
    # the replaced original part AND the folded delete commit's cdf
    # sidecar (write_cdf defaults True) both lose their references
    assert len(removed) == 2
    assert sum(x.startswith("part-") for x in removed) == 1
    assert sum(x.startswith("cdf-") for x in removed) == 1
    assert read_committed_parquet(spark, path, SCHEMA).count() == 601


def test_dv_then_merge_then_optimize_counter_exact(spark):
    """rows counter stays exact across a mixed verb sequence."""
    path = _build(spark)
    delete_where(spark, path, SCHEMA, "id < 10", mode="dv")  # -10
    src = spark.createDataFrame(
        [(0, "BACK", 0.0), (20, "UPD", 0.0)], SCHEMA
    )
    # id=0 is dv-deleted => NOT matched => insert; id=20 matched
    r = merge_sink(spark, path, SCHEMA, src, ["id"])
    assert r["inserted"] == 1 and r["updated"] == 1
    optimize_sink(spark, path, SCHEMA, target_rows_per_file=10_000)
    m = _manifest_read(path)
    got = read_committed_parquet(spark, path, SCHEMA).count()
    assert got == 891
    assert m["rows"] == got


def test_merge_shuffle_join_path_matches_broadcast(spark):
    """broadcast_source=False (the bulk-backfill shape) must produce
    the identical table through shuffle joins."""
    path_a = _build(spark)
    path_b = _build(spark)
    src = spark.createDataFrame(
        [(0, "UPD", -1.0), (305, "UPD", -2.0), (9999, "NEW", -3.0)],
        SCHEMA,
    )
    ra = merge_sink(spark, path_a, SCHEMA, src, ["id"])
    rb = merge_sink(
        spark, path_b, SCHEMA, src, ["id"], broadcast_source=False
    )
    assert (ra["updated"], ra["inserted"]) == (rb["updated"], rb["inserted"])
    a = {
        (r["id"], r["grp"], r["val"])
        for r in read_committed_parquet(spark, path_a, SCHEMA).collect()
    }
    b = {
        (r["id"], r["grp"], r["val"])
        for r in read_committed_parquet(spark, path_b, SCHEMA).collect()
    }
    assert a == b


def test_update_where_rewrites_only_touched_parts(spark):
    from appsflyer_to_clickhouse_spark.sinks.mutations import update_where

    path = _build(spark)
    r = update_where(
        spark,
        path,
        SCHEMA,
        "id >= 350 AND id < 360",
        {"grp": "'X'", "val": "val * 2"},
        prune_column="id",
        prune_lo=350,
        prune_hi=359,
    )
    assert r["updated"] == 10 and r["n_rewritten"] == 1, r
    back = read_committed_parquet(spark, path, SCHEMA)
    assert back.count() == 900  # cardinality unchanged
    hit = back.filter("id = 355").collect()[0]
    assert hit["grp"] == "X" and hit["val"] == 355 * 1.5 * 2
    # untouched row intact, and expressions saw the PRE-update row
    assert back.filter("grp = 'X'").count() == 10
    m = _manifest_read(path)
    assert m["rows"] == 900
    e = m["history"][-1]
    assert e["op"] == "update" and e["set_columns"] == ["grp", "val"]
    # time travel to pre-update
    pre = read_committed_parquet(spark, path, SCHEMA, version=2)
    assert pre.filter("grp = 'X'").count() == 0


def test_update_where_materializes_dvs_and_skips_deleted_rows(spark):
    from appsflyer_to_clickhouse_spark.sinks.mutations import update_where

    path = _build(spark)
    delete_where(spark, path, SCHEMA, "id = 100", mode="dv")
    update_where(spark, path, SCHEMA, "id < 200", {"grp": "'U'"})
    back = read_committed_parquet(spark, path, SCHEMA)
    assert back.filter("id = 100").count() == 0  # not resurrected
    assert back.filter("grp = 'U'").count() == 199  # 0..199 minus 100
    assert "dv" not in _manifest_read(path)


def test_update_where_unknown_column_raises(spark):
    from appsflyer_to_clickhouse_spark.sinks.mutations import update_where

    path = _build(spark)
    with pytest.raises(ValueError, match="not in schema"):
        update_where(spark, path, SCHEMA, "id = 1", {"nope": "1"})
    with pytest.raises(ValueError, match="no assignments"):
        update_where(spark, path, SCHEMA, "id = 1", {})


def test_update_then_cdf_shows_delete_insert_pair(spark):
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        table_changes,
    )
    from appsflyer_to_clickhouse_spark.sinks.mutations import update_where

    path = _build(spark)
    r = update_where(spark, path, SCHEMA, "id = 7", {"grp": "'Z'"})
    cdf = table_changes(spark, path, SCHEMA, r["version"], r["version"])
    rows = sorted(
        (x["_change_type"], x["id"], x["grp"]) for x in cdf.collect()
    )
    assert rows == [("delete", 7, "0"), ("insert", 7, "Z")]


def test_concurrent_dv_deletes_never_double_count(spark):
    """Two threads dv-delete OVERLAPPING predicates concurrently: the
    lock-guarded NET-delta recompute must make deletes commute — the
    union is deleted exactly once, the rows counter decrements by the
    true union size, and dv_current stays consistent with the log."""
    import threading

    path = _build(spark)
    preds = ["id % 10 = 1", "id % 5 = 1"]  # overlap: id % 10 == 1
    errs = []

    def run(p):
        try:
            delete_where(spark, path, SCHEMA, p, mode="dv")
        except Exception as ex:  # conflict abort is acceptable; log it
            errs.append(ex)

    threads = [threading.Thread(target=run, args=(p,)) for p in preds]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # conflicts may abort one writer (dv commits only conflict when a
    # file vanishes, which never happens here) — both should land
    assert not errs, errs
    m = _manifest_read(path)
    # union: id%5==1 has 180 ids in [0,900); id%10==1 is a subset
    n_dv = sum(len(v) for v in m["dv"].values())
    assert n_dv == 180
    assert m["rows"] == 900 - 180
    back = read_committed_parquet(spark, path, SCHEMA)
    assert back.count() == 720
    assert back.filter("id % 5 = 1").count() == 0
    assert dv_current(m) == dv_for_version(
        m, max(e["v"] for e in m["history"])
    )


def test_optimize_vs_dv_delete_race_aborts_one_side(spark):
    """A dv-delete that lands while OPTIMIZE is rewriting must abort
    the compaction (its outputs were built WITHOUT the new vector —
    publishing them would resurrect the deleted rows). Exercised live
    via a monkeypatched rewrite window."""
    from appsflyer_to_clickhouse_spark.sinks import datasource_sink as ds

    path = _build(spark)
    orig_stats = ds._parquet_footer_stats
    fired = {"done": False}

    def hook(fullpath):
        # first footer read happens after the rewrite, before the
        # lock: sneak a dv delete into the window exactly once
        if not fired["done"]:
            fired["done"] = True
            delete_where(spark, path, SCHEMA, "id = 5", mode="dv")
        return orig_stats(fullpath)

    ds._parquet_footer_stats = hook
    try:
        # retries=0 pins the single-attempt abort mechanics (the
        # public default retries and would absorb this conflict)
        with pytest.raises(ValueError, match="conflict"):
            optimize_sink(
                spark, path, SCHEMA, target_rows_per_file=500, retries=0
            )
    finally:
        ds._parquet_footer_stats = orig_stats
    # the delete won; the aborted compaction left no orphan outputs
    # visible and the table is exact
    back = read_committed_parquet(spark, path, SCHEMA)
    assert back.count() == 899
    assert back.filter("id = 5").count() == 0
    # a retry against the new snapshot succeeds and materializes
    st = optimize_sink(spark, path, SCHEMA, target_rows_per_file=500)
    assert st["replaced"] == 3
    assert "dv" not in _manifest_read(path)
    assert read_committed_parquet(spark, path, SCHEMA).count() == 899


def _fmt_plan(df) -> str:
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_dv_mask_plan_is_broadcast_anti_join_no_shuffle(spark):
    """The deletion-vector mask must be a BroadcastHashJoin LeftAnti
    over the scan — the data side never exchanges (a shuffled mask
    would move the whole table to drop a handful of rows)."""
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        mask_dv,
    )

    path = _build(spark)
    delete_where(spark, path, SCHEMA, "id IN (1, 2)", mode="dv")
    df = read_committed_parquet(spark, path, SCHEMA)
    plan = _fmt_plan(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "Exchange hashpartitioning" not in plan
    # and with no vectors the read keeps its bare scan plan
    path2 = _build(spark)
    plan2 = _fmt_plan(read_committed_parquet(spark, path2, SCHEMA))
    assert "Join" not in plan2


def test_cow_survivor_plan_has_no_exchange(spark):
    """The copy-on-write rewrite is a filter over the touched scan —
    zero Exchange: rewrite IO is proportional to touched parts and
    never reshuffles them."""
    import os as _os

    from appsflyer_to_clickhouse_spark.sinks.mutations import (
        _scan_with_meta,
    )
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        _manifest_read,
    )

    path = _build(spark)
    files = sorted(_manifest_read(path)["files"])[:1]
    survivors = (
        _scan_with_meta(spark, path, SCHEMA, files, {})
        .filter(~F.expr("id < 100"))
        .select("id", "grp", "val")
    )
    plan = _fmt_plan(survivors)
    assert "Exchange" not in plan


def test_merge_tombstone_null_predicate_falls_to_update(spark):
    """A NULL delete-predicate result is NOT a tombstone: the row
    falls through to the update clause (SQL MERGE semantics)."""
    path = _build(spark)
    batch = spark.createDataFrame(
        [(0, None, 1.0)], SCHEMA  # grp NULL => predicate NULL
    )
    r = merge_sink(
        spark, path, SCHEMA, batch, ["id"], delete_predicate="grp = 'D'"
    )
    assert r["deleted"] == 0 and r["updated"] == 1
    back = read_committed_parquet(spark, path, SCHEMA)
    assert back.count() == 900
    assert back.filter("id = 0").collect()[0]["grp"] is None


def test_merge_tombstones_full_semantics(spark):
    """Tombstone semantics end-to-end with the op column available to
    the predicate (source frame keeps extra columns; the merge writes
    only schema columns)."""
    path = _build(spark)
    # source carries op in `grp` position trick is ugly — instead
    # encode tombstones via val sentinel: val < 0 means delete
    batch = spark.createDataFrame(
        [
            (0, "UPD", 1.0),      # update
            (10, "X", -1.0),      # tombstone (val<0)
            (5000, "X", -1.0),    # unmatched tombstone: no-op
            (7777, "NEW", 2.0),   # insert
        ],
        SCHEMA,
    )
    r = merge_sink(
        spark, path, SCHEMA, batch, ["id"], delete_predicate="val < 0"
    )
    assert r["updated"] == 1
    assert r["deleted"] == 1
    assert r["inserted"] == 1
    back = read_committed_parquet(spark, path, SCHEMA)
    assert back.count() == 900  # -1 tombstone +1 insert
    assert back.filter("id = 10").count() == 0
    assert back.filter("id = 0").collect()[0]["grp"] == "UPD"
    assert back.filter("id = 7777").count() == 1
    assert back.filter("id = 5000").count() == 0
    m = _manifest_read(path)
    assert m["rows"] == 900


def test_merge_tombstone_predicate_sees_cdc_op_column(spark):
    """The tombstone predicate evaluates on the FULL source frame:
    a CDC op column outside the sink schema drives the clause."""
    op_schema = T.StructType(
        [*SCHEMA.fields, T.StructField("op", T.StringType())]
    )
    path = _build(spark)
    batch = spark.createDataFrame(
        [
            (0, "UPD", 1.0, "u"),
            (10, "X", 0.0, "d"),
            (7777, "NEW", 2.0, "u"),
        ],
        op_schema,
    )
    r = merge_sink(
        spark, path, SCHEMA, batch, ["id"], delete_predicate="op = 'd'"
    )
    assert (r["updated"], r["deleted"], r["inserted"]) == (1, 1, 1)
    back = read_committed_parquet(spark, path, SCHEMA)
    assert back.count() == 900
    assert back.filter("id = 10").count() == 0
    assert back.filter("id = 0").collect()[0]["grp"] == "UPD"
