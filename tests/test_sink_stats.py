"""Per-file column stats + data skipping on the manifest sink
(sinks/datasource_sink.py): the Arrow tier records exact min/max/null
counts per flushed part, prune_files resolves range predicates to a
part subset from manifest metadata alone, read_committed_pruned stays
value-exact (stats prune files, the residual filter prunes rows), and
compaction/vacuum keep the stats map consistent.
"""

from __future__ import annotations

import datetime
import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    MANIFEST,
    ClickHouseArrowDataSource,
    optimize_sink,
    prune_files,
    read_committed_pruned,
    vacuum_sink,
)

_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.LongType()),
        T.StructField("t", T.TimestampType()),
    ]
)

_T0 = datetime.datetime(2024, 3, 1)


def _append_range(spark, path: str, lo: int, hi: int) -> None:
    """One part per append (single task), rows lo..hi-1, each row's
    timestamp _T0 + v minutes — so v-ranges and t-ranges are disjoint
    across appends in lockstep."""
    spark.dataSource.register(ClickHouseArrowDataSource)
    df = (
        spark.range(lo, hi)
        .coalesce(1)
        .select(
            F.col("id").cast("string").alias("k"),
            F.col("id").alias("v"),
            (
                F.lit(_T0) + F.make_interval(mins=F.col("id").cast("int"))
            ).alias("t"),
        )
    )
    (
        df.write.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", "100000")
        .mode("append")
        .save()
    )


def _manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as fh:
        return json.load(fh)


def _files_of_version(path: str, v: int) -> list[str]:
    hist = _manifest(path)["history"]
    return next(e["files"] for e in hist if e["v"] == v)


@pytest.fixture
def three_part_sink(spark):
    path = tempfile.mkdtemp(prefix="stats_") + "/sink"
    _append_range(spark, path, 0, 100)
    _append_range(spark, path, 100, 200)
    _append_range(spark, path, 200, 300)
    return path


def test_arrow_writer_records_exact_stats(spark, three_part_sink):
    m = _manifest(three_part_sink)
    assert len(m["files"]) == 3
    f0 = _files_of_version(three_part_sink, 0)[0]
    st = m["stats"][f0]
    assert st["v"] == {"min": 0, "max": 99, "nulls": 0}
    assert st["k"] == {"min": "0", "max": "99", "nulls": 0}
    # timestamps normalize to naive-UTC ISO strings
    assert st["t"]["min"] == "2024-03-01 00:00:00"
    assert st["t"]["max"] == "2024-03-01 01:39:00"


def test_prune_files_selects_only_intersecting_parts(three_part_sink):
    path = three_part_sink
    mid = _files_of_version(path, 1)
    # range strictly inside append 1's v-range
    assert prune_files(path, "v", 120, 180) == mid
    # timestamp pruning through the ISO-string encoding
    assert (
        prune_files(
            path,
            "t",
            _T0 + datetime.timedelta(minutes=120),
            _T0 + datetime.timedelta(minutes=180),
        )
        == mid
    )
    # boundary value: v=100 is append 1's min — still kept
    assert prune_files(path, "v", 100, 100) == mid
    # unbounded sides
    assert len(prune_files(path, "v", None, 99)) == 1
    assert len(prune_files(path, "v", 200, None)) == 1
    # disjoint range prunes everything
    assert prune_files(path, "v", 1000, 2000) == []


def test_prune_keeps_files_without_stats(three_part_sink):
    path = three_part_sink
    m = _manifest(path)
    victim = _files_of_version(path, 2)[0]
    del m["stats"][victim]  # simulate a pre-stats / JSONL-era part
    with open(os.path.join(path, MANIFEST), "w") as fh:
        json.dump(m, fh)
    kept = prune_files(path, "v", 120, 180)
    # the stats-less part is conservatively kept alongside the match
    assert set(kept) == set(_files_of_version(path, 1)) | {victim}


def test_prune_drops_all_null_parts_for_range_predicates(spark):
    path = tempfile.mkdtemp(prefix="statsnull_") + "/sink"
    spark.dataSource.register(ClickHouseArrowDataSource)
    df = spark.range(50).coalesce(1).select(
        F.col("id").cast("string").alias("k"),
        F.lit(None).cast("long").alias("v"),
        F.lit(None).cast("timestamp").alias("t"),
    )
    (
        df.write.format("chbatch_arrow")
        .option("path", path)
        .mode("append")
        .save()
    )
    m = _manifest(path)
    st = next(iter(m["stats"].values()))
    assert st["v"] == {"min": None, "max": None, "nulls": 50}
    # BETWEEN never matches NULL: the all-null part is skippable
    assert prune_files(path, "v", 0, 10**9) == []


def test_pruned_read_is_value_exact_and_skips_io(spark, three_part_sink):
    path = three_part_sink
    got = read_committed_pruned(spark, path, _SCHEMA, "v", 120, 180)
    rows = got.orderBy("v").collect()
    assert [r["v"] for r in rows] == list(range(120, 181))
    # the plan really reads ONE part — skipping happened before Spark
    assert len(got.inputFiles()) == 1
    # boundary exactness: residual filter keeps 100, prune kept file
    assert read_committed_pruned(
        spark, path, _SCHEMA, "v", 100, 100
    ).count() == 1
    # empty prune result is an empty frame, not an error
    assert read_committed_pruned(
        spark, path, _SCHEMA, "v", 10**6, 10**7
    ).count() == 0


def test_optimize_refreshes_stats_from_footers(spark, three_part_sink):
    path = three_part_sink
    old_files = set(_manifest(path)["files"])
    optimize_sink(spark, path, _SCHEMA, target_rows_per_file=10_000)
    m = _manifest(path)
    assert len(m["files"]) == 1
    new_f = m["files"][0]
    st = m["stats"][new_f]
    # footer-derived: numeric + temporal exact, strings skipped
    assert st["v"] == {"min": 0, "max": 299, "nulls": 0}
    assert st["t"]["min"] == "2024-03-01 00:00:00"
    assert "k" not in st
    # replaced parts' stats stay while history still references them
    for f in old_files:
        assert f in m["stats"]
    # pruning keeps working on the compacted layout
    assert prune_files(path, "v", 120, 180) == [new_f]
    got = read_committed_pruned(spark, path, _SCHEMA, "v", 120, 180)
    assert got.count() == 61


def test_vacuum_drops_stats_of_deleted_parts(spark, three_part_sink):
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        truncate_history,
    )

    path = three_part_sink
    old_files = set(_manifest(path)["files"])
    optimize_sink(spark, path, _SCHEMA, target_rows_per_file=10_000)
    _append_range(spark, path, 300, 310)  # push the fold past compact
    truncate_history(path, retain_last=1)
    removed = set(vacuum_sink(path))
    assert removed == old_files
    m = _manifest(path)
    assert not (removed & set(m["stats"]))
    # survivors keep theirs
    assert all(f in m["stats"] for f in m["files"] if f.endswith(".parquet"))


def test_jsonl_tier_records_stats_and_prunes(spark):
    """The row/JSONL tier (and therefore the STREAM writer, which
    shares its flush) records per-part stats too — continuous ingest
    is exactly where time-correlated parts make range pruning pay."""
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        ClickHouseBatchDataSource,
        read_committed,
    )

    path = tempfile.mkdtemp(prefix="statsjl_") + "/sink"
    spark.dataSource.register(ClickHouseBatchDataSource)
    for lo in (0, 100, 200):
        df = spark.range(lo, lo + 100).coalesce(1).select(
            F.col("id").cast("string").alias("k"),
            F.col("id").alias("v"),
            (
                F.lit(_T0) + F.make_interval(mins=F.col("id").cast("int"))
            ).alias("t"),
        )
        (
            df.write.format("chbatch")
            .option("path", path)
            .mode("append")
            .save()
        )
    m = _manifest(path)
    assert len(m["files"]) == 3
    st = m["stats"][_files_of_version(path, 1)[0]]
    assert st["v"] == {"min": 100, "max": 199, "nulls": 0}
    # timestamps normalized identically to the Arrow tier
    assert st["t"]["min"] == "2024-03-01 01:40:00"
    assert prune_files(path, "v", 120, 180) == _files_of_version(path, 1)
    got = read_committed_pruned(spark, path, _SCHEMA, "v", 120, 180)
    assert got.count() == 61
    assert len(got.inputFiles()) == 1
    # the unpruned read still sees everything
    assert read_committed(spark, path, _SCHEMA).count() == 300


def test_stream_writer_commits_stats(spark):
    """Micro-batch commits through the STREAM writer publish stats and
    merge them across batches."""
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        ClickHouseBatchDataSource,
    )

    path = tempfile.mkdtemp(prefix="statsst_") + "/sink"
    src = tempfile.mkdtemp(prefix="statsst_src_")
    ckpt = tempfile.mkdtemp(prefix="statsst_ckpt_")
    for lo in (0, 500):
        (
            spark.range(lo, lo + 500)
            .coalesce(1)
            .select(
                F.col("id").cast("string").alias("k"),
                F.col("id").alias("v"),
            )
            .write.mode("append")
            .parquet(src)
        )
    spark.dataSource.register(ClickHouseBatchDataSource)
    schema = spark.read.parquet(src).schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.format("chbatch")
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    m = _manifest(path)
    assert m["rows"] == 1000
    # every committed part has v-stats, and the union covers 0..999
    assert set(m["stats"]) == set(m["files"])
    mns = [s["v"]["min"] for s in m["stats"].values()]
    mxs = [s["v"]["max"] for s in m["stats"].values()]
    assert min(mns) == 0 and max(mxs) == 999
    # a range probe prunes to the parts whose stats admit it
    kept = prune_files(path, "v", 0, 10)
    assert all(m["stats"][f]["v"]["min"] <= 10 for f in kept)
    assert len(kept) < len(m["files"])


def test_arrow_stream_writer_parquet_parts_stats_and_optimize(spark):
    """The ARROW stream tier (writeStream.format('chbatch_arrow')):
    micro-batches land as parquet parts WITH stats under the same
    manifest/batchId protocol, and the stream-written sink is
    optimize_sink-compactable — the layout a long-lived streaming
    sink should run on (the JSONL tier is the row-tax measurement)."""
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        optimize_sink,
        read_committed_parquet,
    )

    path = tempfile.mkdtemp(prefix="statsas_") + "/sink"
    src = tempfile.mkdtemp(prefix="statsas_src_")
    ckpt = tempfile.mkdtemp(prefix="statsas_ckpt_")
    for lo in (0, 400):
        (
            spark.range(lo, lo + 400)
            .coalesce(1)
            .select(
                F.col("id").cast("string").alias("k"),
                F.col("id").alias("v"),
                (
                    F.lit(_T0) + F.make_interval(mins=F.col("id").cast("int"))
                ).alias("t"),
            )
            .write.mode("append")
            .parquet(src)
        )
    schema = spark.read.parquet(src).schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.format("chbatch_arrow")
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    m = _manifest(path)
    assert m["rows"] == 800
    assert m["last_batch_id"] is not None
    assert all(f.endswith(".parquet") for f in m["files"])
    # every part carries stats; a range probe prunes
    assert set(m["stats"]) == set(m["files"])
    kept = prune_files(path, "v", 0, 10)
    assert 0 < len(kept) < len(m["files"]) or len(m["files"]) == 1
    got = read_committed_pruned(spark, path, _SCHEMA, "v", 0, 10)
    assert got.count() == 11
    # the stream-written sink compacts like any other Arrow sink
    stats = optimize_sink(spark, path, _SCHEMA, target_rows_per_file=1000)
    assert stats["written"] == 1
    back = read_committed_parquet(spark, path, _SCHEMA)
    assert back.count() == 800
    assert back.agg(F.sum("v")).first()[0] == 799 * 800 // 2
