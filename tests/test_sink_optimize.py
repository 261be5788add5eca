"""OPTIMIZE on the manifest sink (sinks/datasource_sink.py:
optimize_sink): the small-part rewrite publishes as a REPLACE commit
in the snapshot log — current reads see only the compacted parts,
retained pre-compaction versions still time-travel to the originals,
vacuum spares the replaced parts until truncate_history folds past the
compaction, and a conflicting concurrent snapshot change aborts the
commit and discards the rewrite's own outputs.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    MANIFEST,
    ClickHouseArrowDataSource,
    optimize_sink,
    read_committed_parquet,
    sink_versions,
    truncate_history,
    vacuum_sink,
)

_SCHEMA = T.StructType(
    [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
)


def _append(
    spark, path: str, lo: int, hi: int, batchsize: int = 100, parts: int = 2
) -> None:
    spark.dataSource.register(ClickHouseArrowDataSource)
    df = (
        spark.range(lo, hi)
        .repartition(parts)
        .select(F.col("id").cast("string").alias("k"), F.col("id").alias("v"))
    )
    (
        df.write.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", str(batchsize))
        .mode("append")
        .save()
    )


def _manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as fh:
        return json.load(fh)


def _content(spark, path: str, version: int | None = None) -> tuple:
    df = read_committed_parquet(spark, path, _SCHEMA, version=version)
    row = df.agg(
        F.count("*").alias("n"), F.sum("v").alias("s")
    ).first()
    return row["n"], row["s"]


def test_optimize_compacts_parts_preserves_content_and_counters(spark):
    path = tempfile.mkdtemp(prefix="opt_") + "/sink"
    # Spark hands the Arrow writer whole-partition RecordBatches, so
    # part count == task count: 6 + 4 = 10 small parts
    _append(spark, path, 0, 600, parts=6)
    _append(spark, path, 600, 900, parts=4)
    before = _manifest(path)
    assert len(before["files"]) == 10
    stats = optimize_sink(spark, path, _SCHEMA, target_rows_per_file=500)
    after = _manifest(path)
    # 900 rows / 500 target -> 2 files, counters untouched by a
    # layout-only commit
    assert stats["replaced"] == len(before["files"])
    assert stats["written"] == 2 == len(after["files"])
    assert after["rows"] == before["rows"] == 900
    assert after["batches"] == before["batches"]
    assert _content(spark, path) == (900, 899 * 900 // 2)
    # the REPLACE commit is versioned and typed in the snapshot log
    vs = sink_versions(path)
    assert [e["op"] for e in vs] == ["append", "append", "compact"]
    assert vs[-1]["v"] == stats["version"] == 2


def test_optimize_noop_when_already_compact(spark):
    path = tempfile.mkdtemp(prefix="optnoop_") + "/sink"
    _append(spark, path, 0, 100, batchsize=1000)  # 2 parts (one per task)
    stats = optimize_sink(spark, path, _SCHEMA, target_rows_per_file=50)
    # target needs 2 files and the sink already has exactly 2
    assert stats == {"replaced": 0, "written": 0, "version": None}
    assert len(_manifest(path)["files"]) == 2


def test_time_travel_below_replace_resolves_original_parts(spark):
    path = tempfile.mkdtemp(prefix="opttt_") + "/sink"
    _append(spark, path, 0, 400)
    _append(spark, path, 400, 500)
    pre_files = set(_manifest(path)["files"])
    optimize_sink(spark, path, _SCHEMA, target_rows_per_file=1000)
    # as-of v0 is append 0 only; v1 is both appends via the ORIGINAL
    # parts; v2 (the replace) is the same content via the new parts
    assert _content(spark, path, version=0) == (400, 399 * 400 // 2)
    assert _content(spark, path, version=1) == (500, 499 * 500 // 2)
    assert _content(spark, path, version=2) == (500, 499 * 500 // 2)
    # replaced originals are still on disk (time travel needs them)
    for f in pre_files:
        assert os.path.exists(os.path.join(path, f))


def test_vacuum_spares_replaced_parts_until_history_folds(spark):
    path = tempfile.mkdtemp(prefix="optvac_") + "/sink"
    _append(spark, path, 0, 400)
    _append(spark, path, 400, 500)
    pre_files = set(_manifest(path)["files"])
    optimize_sink(spark, path, _SCHEMA, target_rows_per_file=1000)
    # history still references the originals -> vacuum removes nothing
    assert vacuum_sink(path) == []
    for f in pre_files:
        assert os.path.exists(os.path.join(path, f))
    # folding only UP TO the compact entry keeps the originals: the
    # fold base (v1) is a retained, readable version and it resolves
    # to the original parts
    truncate_history(path, retain_last=1)
    assert vacuum_sink(path) == []
    assert _content(spark, path, version=1) == (500, 499 * 500 // 2)
    # fold PAST the compaction (append v3, then retain only it): the
    # new base nets the replace — originals lose their last reference
    # and the OPTIMIZE->retention->VACUUM hand-off completes
    _append(spark, path, 500, 550)
    truncate_history(path, retain_last=1)
    removed = set(vacuum_sink(path))
    assert removed == pre_files
    assert _content(spark, path) == (550, 549 * 550 // 2)
    # time travel below the fold is gone, loudly
    import pytest

    with pytest.raises(ValueError, match="no snapshot v0"):
        read_committed_parquet(spark, path, _SCHEMA, version=0)


def test_conflicting_snapshot_change_aborts_and_discards_rewrite(spark):
    """Optimistic concurrency: if a replaced part leaves the current
    snapshot between the rewrite and the metadata commit (concurrent
    overwrite/compaction), the commit must abort and delete the
    rewrite's own outputs — not publish a replace of files that are no
    longer current."""
    import pytest

    path = tempfile.mkdtemp(prefix="optconf_") + "/sink"
    _append(spark, path, 0, 600)
    mpath = os.path.join(path, MANIFEST)

    # simulate the concurrent commit by dropping one replaced part
    # from the snapshot mid-optimize, via a hook on the manifest read
    # that the locked commit section performs
    import appsflyer_to_clickhouse_spark.sinks.datasource_sink as ds

    real_read = ds._manifest_read
    state = {"reads": 0}

    def tampering_read(p):
        m = real_read(p)
        state["reads"] += 1
        if state["reads"] == 2:  # the under-lock re-read
            victim = m["files"][0]
            m2 = dict(m)
            m2["files"] = [f for f in m["files"] if f != victim]
            with open(mpath + ".tmp", "w") as fh:
                json.dump(m2, fh)
            os.replace(mpath + ".tmp", mpath)
            return m2
        return m

    before_parts = {
        n for n in os.listdir(path) if n.endswith(".parquet")
    }
    ds._manifest_read = tampering_read
    try:
        # retries=0 pins the single-attempt abort mechanics (the
        # public default retries and would absorb this conflict)
        with pytest.raises(ValueError, match="conflict"):
            optimize_sink(
                spark, path, _SCHEMA, target_rows_per_file=1000, retries=0
            )
    finally:
        ds._manifest_read = real_read
    # the aborted rewrite's outputs were deleted — no orphan accretion
    after_parts = {n for n in os.listdir(path) if n.endswith(".parquet")}
    assert after_parts == before_parts
    assert not os.path.exists(os.path.join(path, MANIFEST + ".lock"))


def test_optimize_refuses_jsonl_tier(spark):
    import pytest

    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        ClickHouseBatchDataSource,
    )

    path = tempfile.mkdtemp(prefix="optjsonl_") + "/sink"
    spark.dataSource.register(ClickHouseBatchDataSource)
    (
        spark.range(10)
        .select(F.col("id").cast("string").alias("k"), F.col("id").alias("v"))
        .write.format("chbatch")
        .option("path", path)
        .mode("append")
        .save()
    )
    with pytest.raises(ValueError, match="non-parquet"):
        optimize_sink(spark, path, _SCHEMA, target_rows_per_file=1)


def test_clustered_optimize_makes_ranges_disjoint_and_prunable(spark):
    """sort_by clustering: three appends each spanning the FULL key
    range leave every part's [min,max] overlapping — stats skipping
    degenerates to keep-everything. A clustered rewrite
    (repartitionByRange + sortWithinPartitions) makes file key-ranges
    pairwise disjoint, so a point probe prunes to exactly one part."""
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        prune_files,
    )

    path = tempfile.mkdtemp(prefix="optclust_") + "/sink"
    # interleaved appends: v % 3 == r, each covering v in [0, 900)
    spark.dataSource.register(ClickHouseArrowDataSource)
    for r in range(3):
        df = (
            spark.range(900)
            .filter(F.col("id") % 3 == r)
            .coalesce(1)
            .select(
                F.col("id").cast("string").alias("k"),
                F.col("id").alias("v"),
            )
        )
        (
            df.write.format("chbatch_arrow")
            .option("path", path)
            .option("batchsize", "100000")
            .mode("append")
            .save()
        )
    # overlapping ranges: a point probe keeps ALL parts
    assert len(prune_files(path, "v", 450, 450)) == 3
    stats = optimize_sink(
        spark, path, _SCHEMA, target_rows_per_file=300, sort_by=["v"]
    )
    assert stats["written"] == 3
    m = _manifest(path)
    hist_entry = [e for e in m["history"] if e.get("op") == "compact"][-1]
    assert hist_entry["clustered_by"] == ["v"]
    # footer-refreshed stats: disjoint, strictly increasing ranges
    ranges = sorted(
        (m["stats"][f]["v"]["min"], m["stats"][f]["v"]["max"])
        for f in m["files"]
    )
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    # the same point probe now prunes to exactly one part
    assert len(prune_files(path, "v", 450, 450)) == 1
    # content untouched by the layout change
    assert _content(spark, path) == (900, 899 * 900 // 2)


def test_clustered_optimize_runs_even_when_already_compact(spark):
    """Clustering is not bin-packing: a sink that already meets the
    file-count target still rewrites when sort_by is given (overlap,
    not count, is the problem clustering solves)."""
    path = tempfile.mkdtemp(prefix="optclust2_") + "/sink"
    _append(spark, path, 0, 100, parts=1)
    stats = optimize_sink(
        spark, path, _SCHEMA, target_rows_per_file=1000, sort_by=["v"]
    )
    assert stats == {"replaced": 1, "written": 1, "version": 1}


_SCHEMA_XY = T.StructType(
    [
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
        T.StructField("payload", T.StringType()),
    ]
)


def _grid_sink(spark, prefix):
    """64x64 grid with x and y independent — the workload where 1-D
    clustering can only serve one dimension."""
    path = tempfile.mkdtemp(prefix=prefix) + "/sink"
    spark.dataSource.register(ClickHouseArrowDataSource)
    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").cast("string").alias("payload"),
    )
    (
        df.repartition(4)
        .write.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", "1000000")
        .mode("append")
        .save()
    )
    return path


def test_zorder_prunes_on_every_dimension(spark):
    """The reason Z-ORDER exists: after a 1-D sort on x, a y-probe
    keeps EVERY file (y spans the full range in each); after Morton
    clustering on (x, y), BOTH an x-probe and a y-probe prune to a
    fraction — each dimension is locally tight per file."""
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        prune_files,
        read_committed_parquet,
    )

    # 1-D baseline: x clusters, y doesn't
    p1 = _grid_sink(spark, "zorder1d_")
    optimize_sink(
        spark, p1, _SCHEMA_XY, target_rows_per_file=256, sort_by=["x"]
    )
    n1 = len(_manifest(p1)["files"])
    assert n1 == 16
    assert len(prune_files(p1, "x", 10, 13)) <= 2
    assert len(prune_files(p1, "y", 10, 13)) == n1  # blind dimension

    # Morton: both dimensions prune
    p2 = _grid_sink(spark, "zorder2d_")
    stats = optimize_sink(
        spark, p2, _SCHEMA_XY, target_rows_per_file=256,
        zorder_by=["x", "y"],
    )
    assert stats["written"] >= 8
    m = _manifest(p2)
    entry = [e for e in m["history"] if e.get("op") == "compact"][-1]
    assert entry["zordered_by"] == ["x", "y"]
    n2 = len(m["files"])
    x_kept = len(prune_files(p2, "x", 10, 13))
    y_kept = len(prune_files(p2, "y", 10, 13))
    assert x_kept <= n2 // 2, (x_kept, n2)
    assert y_kept <= n2 // 2, (y_kept, n2)
    # content exact after the layout change
    back = read_committed_parquet(spark, p2, _SCHEMA_XY)
    assert back.count() == 4096
    assert back.agg(F.sum("x"), F.sum("y")).first() == (
        4096 * 63 // 2,
        4096 * 63 // 2,
    )
    # the z key never leaks into the written schema
    assert back.columns == ["x", "y", "payload"]


def test_zorder_rejects_string_columns_and_sortby_conflict(spark):
    import pytest

    path = _grid_sink(spark, "zorderr_")
    with pytest.raises(ValueError, match="exclusive"):
        optimize_sink(
            spark, path, _SCHEMA_XY, sort_by=["x"], zorder_by=["y"]
        )
    with pytest.raises(ValueError, match="z-ordered"):
        optimize_sink(spark, path, _SCHEMA_XY, zorder_by=["payload"])


def test_zorder_on_timestamp_dimension(spark):
    """Temporal columns z-order through unix_micros normalization."""
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        prune_files,
    )
    import datetime

    path = tempfile.mkdtemp(prefix="zorderts_") + "/sink"
    spark.dataSource.register(ClickHouseArrowDataSource)
    t0 = datetime.datetime(2024, 6, 1)
    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        (
            F.lit(t0)
            + F.make_interval(hours=(F.col("id") / 64).cast("int"))
        ).alias("t"),
    )
    schema = T.StructType(
        [T.StructField("x", T.LongType()), T.StructField("t", T.TimestampType())]
    )
    (
        df.repartition(4)
        .write.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", "1000000")
        .mode("append")
        .save()
    )
    optimize_sink(
        spark, path, schema, target_rows_per_file=256, zorder_by=["x", "t"]
    )
    n = len(_manifest(path)["files"])
    kept = prune_files(
        path, "t", t0 + datetime.timedelta(hours=10),
        t0 + datetime.timedelta(hours=13),
    )
    assert len(kept) <= n // 2


def test_optimize_never_blocks_or_loses_concurrent_appends(spark):
    """Optimistic concurrency, live: appends land WHILE the OPTIMIZE
    rewrite runs. Appends only add parts, so they can never conflict
    with the replace set — whatever the interleaving, no row is lost,
    the counters agree with the data, and the manifest resolves to
    files that exist. (Both orders of the final two history entries
    are legal; what's pinned is consistency, not a schedule.)"""
    import threading

    path = tempfile.mkdtemp(prefix="optconc_") + "/sink"
    _append(spark, path, 0, 2000, parts=8)

    errs = []

    def run_optimize():
        try:
            optimize_sink(spark, path, _SCHEMA, target_rows_per_file=1500)
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    t = threading.Thread(target=run_optimize)
    t.start()
    for lo in (2000, 2200, 2400):
        _append(spark, path, lo, lo + 200, parts=1)
    t.join(timeout=120)
    assert not t.is_alive() and not errs, errs
    m = _manifest(path)
    total = 2600
    assert m["rows"] == total
    assert _content(spark, path) == (total, (total - 1) * total // 2)
    for f in m["files"]:
        assert os.path.exists(os.path.join(path, f))
    # the log's final version resolves to exactly the current files
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        _manifest_files,
    )

    last_v = max(e["v"] for e in m["history"])
    assert sorted(
        os.path.basename(p) for p in _manifest_files(path, last_v)
    ) == m["files"]
