"""PARTITION SPEC EVOLUTION (VERDICT r9 task 2 — Iceberg-style): a
spec change is ONE metadata commit, never a rewrite.

Model: the table-level ``partition_cols`` is always the CURRENT
spec; per-part tuples recorded as LISTS are positional against it.
``evolve_partition_spec`` re-keys every existing tuple into DICT
form ({col: value}, self-describing under ANY later spec) and swaps
the spec — old parts keep pruning on their own columns, new appends
must carry the new spec, and every by-value consumer treats a tuple
that cannot decide a predicate (old-spec dict without the column)
exactly like an untupled part: conservative keep for reads/DML
scans, loud refusal for drop_partition, re-tuple selection for
OPTIMIZE (the migration verb).

Pins:
- evolution is metadata-only (no data file touched, one history
  entry, rows/batches unchanged) and refuses a no-op spec;
- PRE-evolution parts still prune exactly on the OLD key, POST
  parts on the NEW key, and a filter on either key stays exact
  through the Data Source reader across generations;
- appends with the old spec are refused after evolution (the spec
  is a structural contract — unchanged behavior, new spec);
- drop_partition on the new key refuses while old-generation parts
  cannot prove non-membership, and works after OPTIMIZE migrates;
- OPTIMIZE re-tuples old-generation parts under the NEW spec in the
  one-pass shape; time travel still reads both generations;
- evolution from UNPARTITIONED adopts a spec without rewrites
  (old parts untupled-conservative until OPTIMIZE), and evolution
  TO None de-partitions while dict tuples keep pruning;
- commit-log mode + clone carry the evolved state.
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
    evolve_partition_spec,
    optimize_sink,
    partition_values,
    prune_files,
    read_committed_parquet,
)
from appsflyer_to_clickhouse_spark.sinks.mutations import (
    delete_where,
    drop_partition,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("day", T.StringType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def _df(spark, n=4000):
    # grp/day derive from id//4 so every id%4 APPEND SLICE carries
    # every grp and every day — the interleaved, stats-degenerate
    # layout (grp from id%4 would make each slice single-valued)
    return spark.range(n).select(
        F.col("id"),
        ((F.col("id") / 4).cast("long") % 4)
        .cast("string")
        .alias("grp"),
        F.concat(
            F.lit("d"), ((F.col("id") / 4).cast("long") % 3).cast("string")
        ).alias("day"),
        (F.col("id") * 0.5).alias("val"),
    )


def _write(df, path, partitionby, **opts):
    w = (
        df.coalesce(1)
        .write.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", "10000000")
    )
    if partitionby is not None:
        w = w.option("partitionby", partitionby)
    for k, v in opts.items():
        w = w.option(k, v)
    w.mode("append").save()


@pytest.fixture(scope="module")
def reg(spark):
    spark.dataSource.register(ClickHouseArrowDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    return spark


def _tmp():
    return tempfile.mkdtemp(prefix="spark_graft_evolve_") + "/s"


def _staged(reg, **opts):
    """2 appends under spec [grp], evolve to [day], 2 appends under
    [day]. Every append covers every grp and every day (interleaved
    on id), the stats-degenerate layout."""
    path = _tmp()
    df = _df(reg)
    for i in (0, 1):
        _write(df.filter(F.col("id") % 4 == i), path, "grp", **opts)
    r = evolve_partition_spec(path, ["day"])
    assert r["spec_from"] == ["grp"] and r["spec_to"] == ["day"]
    for i in (2, 3):
        _write(df.filter(F.col("id") % 4 == i), path, "day", **opts)
    return path, df


def test_evolution_is_metadata_only(reg):
    path, _ = _staged(reg)
    m = _manifest_read(path)
    assert m["partition_cols"] == ["day"]
    evolve_entries = [
        e for e in m["history"] if e.get("op") == "evolve_spec"
    ]
    assert len(evolve_entries) == 1
    e = evolve_entries[0]
    assert e["files"] == [] and e["spec_from"] == ["grp"]
    # old-generation tuples are now self-describing dicts, new ones
    # positional lists against the current spec
    forms = {
        type(t).__name__ for t in (m.get("partitions") or {}).values()
    }
    assert forms == {"dict", "list"}
    # no-op evolution refused
    with pytest.raises(ValueError, match="already"):
        evolve_partition_spec(path, ["day"])


def test_both_generations_prune_on_their_own_key(reg):
    path, df = _staged(reg)
    m = _manifest_read(path)
    pmap = m["partitions"]
    gen_a = {b for b, t in pmap.items() if isinstance(t, dict)}
    gen_b = {b for b, t in pmap.items() if isinstance(t, list)}
    assert len(gen_a) == 8 and len(gen_b) == 6  # 2x4 grp, 2x3 day
    # OLD key: exactly the matching gen-A parts + all gen-B
    # (undecidable) parts survive
    kept = {
        os.path.basename(f)
        for f in prune_files(path, "grp", "2", "2")
    }
    assert kept & gen_a == {
        b for b in gen_a if pmap[b].get("grp") == "2"
    }
    assert len(kept & gen_a) == 2
    # NEW key: exactly the matching gen-B parts + all gen-A parts
    kept2 = {
        os.path.basename(f)
        for f in prune_files(path, "day", "d1", "d1")
    }
    assert kept2 & gen_b == {
        b for b in gen_b if pmap[b] == ["d1"]
    }
    assert len(kept2 & gen_b) == 2
    assert gen_a <= kept2  # conservative keep, never a wrong prune
    # exactness through the reader on both keys, both generations
    got = (
        reg.read.format("chbatch_arrow")
        .schema(SCHEMA)
        .option("path", path)
        .load()
    )
    assert got.filter("grp = '2'").count() == 1000
    assert (
        got.filter("day = 'd1'").count()
        == df.filter("day = 'd1'").count()
    )


def test_old_spec_append_refused_after_evolution(reg):
    path, df = _staged(reg)
    with pytest.raises(Exception, match="partition"):
        _write(df.limit(10), path, "grp")
    # and missing spec likewise
    with pytest.raises(Exception, match="partition"):
        _write(df.limit(10), path, None)


def test_show_partitions_spans_generations(reg):
    path, _ = _staged(reg)
    vals = partition_values(path)
    assert {frozenset(d.items()) for d in vals} == {
        frozenset([("grp", str(g))]) for g in range(4)
    } | {frozenset([("day", f"d{d}")]) for d in range(3)}


def test_drop_partition_refuses_then_optimize_migrates(reg):
    path, df = _staged(reg)
    # gen-A parts cannot prove they hold no 'd1' rows
    with pytest.raises(ValueError, match="tuple"):
        drop_partition(path, {"day": "d1"})
    # OPTIMIZE is the migration path: old-generation parts re-tuple
    # under the NEW spec in the one-pass shape
    r = optimize_sink(reg, path, SCHEMA, target_rows_per_file=10**6)
    assert r["written"] >= 3
    m = _manifest_read(path)
    pmap = m["partitions"]
    live = {os.path.basename(f) for f in m["files"]}
    assert live <= set(pmap)
    assert all(isinstance(pmap[b], list) for b in live)
    rd = drop_partition(path, {"day": "d1"})
    assert rd["dropped_rows"] == df.filter("day = 'd1'").count()
    got = read_committed_parquet(reg, path, SCHEMA)
    assert got.count() == df.filter("day <> 'd1'").count()


def test_scoped_dml_stays_exact_across_generations(reg):
    path, df = _staged(reg)
    # partition-scoped delete on the NEW key: gen-A parts are kept
    # conservatively in the match scan, residual filter exact
    r = delete_where(
        reg,
        path,
        SCHEMA,
        "day = 'd0'",
        partition={"day": "d0"},
        write_cdf=False,
    )
    assert r["deleted"] == df.filter("day = 'd0'").count()
    got = read_committed_parquet(reg, path, SCHEMA)
    assert got.count() == df.filter("day <> 'd0'").count()
    assert got.filter("day = 'd0'").count() == 0


def test_time_travel_reads_both_generations(reg):
    path, df = _staged(reg)
    # version 1 = after the two gen-A appends (pre-evolution)
    got_v1 = (
        reg.read.format("chbatch_arrow")
        .schema(SCHEMA)
        .option("path", path)
        .option("version", "1")
        .load()
    )
    assert got_v1.count() == df.filter("id % 4 < 2").count()
    got = (
        reg.read.format("chbatch_arrow")
        .schema(SCHEMA)
        .option("path", path)
        .load()
    )
    assert got.count() == df.count()


def test_adopt_spec_on_unpartitioned_table(reg):
    path = _tmp()
    df = _df(reg, 1000)
    _write(df, path, None)
    r = evolve_partition_spec(path, ["grp"])
    assert r["spec_from"] is None
    # old parts untupled -> conservative; new appends must be tupled
    _write(
        df.select(
            (F.col("id") + 10_000).alias("id"), "grp", "day", "val"
        ),
        path,
        "grp",
    )
    m = _manifest_read(path)
    assert m["partition_cols"] == ["grp"]
    got = (
        reg.read.format("chbatch_arrow")
        .schema(SCHEMA)
        .option("path", path)
        .load()
    )
    assert got.count() == 2000
    # OPTIMIZE re-tuples the pre-spec parts
    optimize_sink(reg, path, SCHEMA, target_rows_per_file=10**6)
    m2 = _manifest_read(path)
    live = {os.path.basename(f) for f in m2["files"]}
    assert live <= set(m2["partitions"])


def test_departition_keeps_dict_pruning(reg):
    path, _ = _staged(reg)
    r = evolve_partition_spec(path, None)
    assert r["spec_to"] is None
    m = _manifest_read(path)
    assert "partition_cols" not in m
    # every tuple is now a self-describing dict; by-name pruning on
    # BOTH historical keys still works
    assert all(
        isinstance(t, dict) for t in m["partitions"].values()
    )
    kept = prune_files(path, "day", "d1", "d1")
    assert 0 < len(kept) < len(m["files"])
    # un-partitioned appends are legal again
    _write(_df(reg, 10), path, None)


def test_commit_log_and_clone_carry_evolution(reg):
    path, df = _staged(reg, commitlog="4")
    m = _manifest_read(path)
    assert m["partition_cols"] == ["day"]
    forms = {type(t).__name__ for t in m["partitions"].values()}
    assert forms == {"dict", "list"}
    dst = _tmp()
    clone_sink(path, dst)
    m2 = _manifest_read(dst)
    assert m2["partition_cols"] == ["day"]
    kept = prune_files(dst, "grp", "1", "1")
    assert kept  # old-key pruning works on the clone
    got = (
        reg.read.format("chbatch_arrow")
        .schema(SCHEMA)
        .option("path", dst)
        .load()
        .filter("grp = '1'")
    )
    assert got.count() == 1000
