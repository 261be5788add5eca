"""Scale techniques the registry queries can't show directly:
bucketed co-located joins (no Exchange) and approximate-aggregate
accuracy bounds (the documented 100 TB swaps for exact distinct /
percentile).
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from appsflyer_to_clickhouse_spark.plans.registry import load

from .conftest import SF_SMALL


def test_bucketed_join_avoids_shuffle(spark):
    """Two tables bucketed by the join key join WITHOUT a shuffle:
    SortMergeJoin directly over the bucketed scans — the pre-partitioned
    layout a 100 TB fact/fact join relies on."""
    ev = load(spark, SF_SMALL, "events")
    left = ev.select("event_id", "user_id", "value")
    right = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    wh = tempfile.mkdtemp(prefix="bucket_wh_")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name, df in (("b_left", left), ("b_right", right)):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            (
                df.write.mode("overwrite")
                .bucketBy(8, "user_id")
                .sortBy("user_id")
                .format("parquet")
                .option("path", f"{wh}/{name}")  # external: keep data out of ./spark-warehouse
                .saveAsTable(name)
            )
        joined = spark.table("b_left").join(spark.table("b_right"), "user_id")
        plan = spark._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() == left.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        for name in ("b_left", "b_right"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


@pytest.mark.parametrize("col,rsd", [("l_partkey", 0.05), ("l_suppkey", 0.05)])
def test_approx_count_distinct_within_rsd(spark, col, rsd):
    """approx_count_distinct (HLL++) — the documented 100 TB swap for
    the exact two-phase distinct — must land within its advertised
    relative standard deviation (3 sigma) of the exact count."""
    li = load(spark, SF_SMALL, "lineitem")
    row = li.agg(
        F.countDistinct(col).alias("exact"),
        F.approx_count_distinct(col, rsd).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= 3 * rsd * row["exact"], row


def test_approx_percentile_close_to_exact(spark):
    """approx_percentile — the t-digest swap for exact order
    statistics — within 2% of exact medians."""
    li = load(spark, SF_SMALL, "lineitem")
    row = li.agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "approx"
        ),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.02, row


def test_runtime_bloom_filter_injects_on_selective_join(spark):
    """Catalyst's InjectRuntimeFilter (on by default) is the engine's
    bloom-prefilter answer for dedup-against-history at 100 TB: when
    one join side is selective, the probe side is pre-filtered with a
    bloom filter built from the build side's keys, cutting shuffle
    traffic before the real join. The default thresholds (probe scan
    >= 10 GB) are sized for clusters, so lower them here to pin that
    the rule actually fires and the filtered result stays exact."""
    li = load(spark, SF_SMALL, "lineitem")
    ord_ = load(spark, SF_SMALL, "orders")
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # force a shuffle join; a broadcast join needs no runtime filter
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        sel = ord_.filter(F.col("o_orderpriority") == "1-URGENT").select(
            "o_orderkey"
        )
        joined = li.join(sel, li.l_orderkey == sel.o_orderkey).select(
            "l_orderkey", "l_quantity"
        )
        plan = spark._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "bloom_filter" in plan.lower() or "might_contain" in plan.lower(), (
            "runtime bloom filter was not injected:\n" + plan[:2000]
        )
        # the injected filter must not change the exact result
        expected = (
            li.join(ord_, li.l_orderkey == ord_.o_orderkey)
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .count()
        )
        assert joined.count() == expected
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling — the runtime answer to hot keys at
    100 TB (session.py enables it; thresholds here are shrunk to make
    a local frame 'skewed'). Pins BOTH behaviors: (a) a skewed
    SortMergeJoin partition is split (skew=true in the final adaptive
    plan); (b) with a downstream hash-distribution requirement
    (groupBy over the join) AQE correctly declines to split — the
    split would break the agg's partitioning contract — so relying on
    skew-join alone is NOT enough for join+agg pipelines (that's what
    the explicit salting operator is for)."""
    from pyspark.sql import functions as F2

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(200_000).select(
            F2.lit(0).alias("k"), F2.col("id").alias("v")
        ).union(
            spark.range(200).select(
                (F2.col("id") % 7 + 1).alias("k"), F2.col("id").alias("v")
            )
        )
        right = spark.range(8).select(
            F2.col("id").alias("k"), F2.lit("x").alias("tag")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 200_200
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan

        agg = left.join(right, "k").groupBy("k").count()
        assert len(agg.collect()) == 8
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in agg_plan
        assert "skew=true" not in agg_plan  # declined: agg needs hash dist
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_sorted_layout_prunes_row_groups(spark, tmp_path):
    """Zone-map pruning: writing a time-series table SORTED by ts gives
    each parquet row group a tight disjoint [min, max] ts range, so a
    time-window predicate can skip almost every row group from footer
    stats alone; the same data written in hash-shuffled order leaves
    every row group's range spanning the whole table and nothing can
    prune. This is THE layout decision for 100 TB time-partitioned
    facts (sortWithinPartitions at write time costs one sort, saves
    every windowed scan forever). Asserted from the footers directly —
    engine-agnostic — plus result parity through Spark on both
    layouts."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from appsflyer_to_clickhouse_spark.plans.registry import load

    ev = load(spark, "/root/testdata/sf0.01", "events")
    sorted_dir = str(tmp_path / "sorted")
    shuffled_dir = str(tmp_path / "shuffled")
    (
        ev.repartition(1)
        .sortWithinPartitions("ts")
        .write.option("parquet.block.size", 64 * 1024)
        .parquet(sorted_dir)
    )
    (
        ev.repartition(1)
        .sortWithinPartitions(F.md5(F.col("event_id").cast("string")))
        .write.option("parquet.block.size", 64 * 1024)
        .parquet(shuffled_dir)
    )

    lo, hi = "2024-01-10 00:00:00", "2024-01-11 00:00:00"

    def overlapping_fraction(d: str) -> tuple[int, int]:
        import glob
        import datetime as dt

        lo_t = dt.datetime.fromisoformat(lo)
        hi_t = dt.datetime.fromisoformat(hi)
        total = hit = 0
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            ts_idx = [
                i for i in range(md.num_columns)
                if md.schema.column(i).name == "ts"
            ][0]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ts_idx).statistics
                total += 1
                mn, mx = st.min, st.max
                if mn.tzinfo is not None:
                    mn = mn.replace(tzinfo=None)
                    mx = mx.replace(tzinfo=None)
                if not (mx < lo_t or mn >= hi_t):
                    hit += 1
        return hit, total

    s_hit, s_total = overlapping_fraction(sorted_dir)
    u_hit, u_total = overlapping_fraction(shuffled_dir)
    assert s_total >= 5, f"need multiple row groups, got {s_total}"
    # sorted: the 1-day window (1/30 of the span) touches a small slice
    assert s_hit / s_total <= 0.34, (s_hit, s_total)
    # shuffled: every row group spans the whole month -> zero pruning
    assert u_hit == u_total, (u_hit, u_total)

    # result parity: layout never changes answers
    pred = (F.col("ts") >= lo) & (F.col("ts") < hi)
    n_sorted = spark.read.parquet(sorted_dir).filter(pred).count()
    n_shuffled = spark.read.parquet(shuffled_dir).filter(pred).count()
    assert n_sorted == n_shuffled > 0


def test_zorder_layout_prunes_both_dims(spark, tmp_path):
    """Z-order clustering: lineitem written sorted by the Morton key of
    (l_partkey, l_suppkey) gives every row group a bounded rectangle
    in BOTH dimensions, so a range predicate on EITHER column can skip
    row groups from footer stats. The control layout — sorted by
    l_partkey alone — prunes partkey predicates perfectly but leaves
    every row group spanning the full suppkey range (zero pruning).
    This is OPTIMIZE ZORDER semantics from plain integer arithmetic
    (functions/zorder.py), asserted from parquet footers directly,
    plus result parity across layouts."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from appsflyer_to_clickhouse_spark.functions.zorder import zorder_interleave
    from appsflyer_to_clickhouse_spark.plans.registry import load

    li = load(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    pk_mx, sk_mx = li.agg(
        F.max("l_partkey"), F.max("l_suppkey")
    ).first()
    z = zorder_interleave(
        F.expr(f"(l_partkey * 256) div {pk_mx + 1}"),
        F.expr(f"(l_suppkey * 256) div {sk_mx + 1}"),
        8,
    )
    zdir = str(tmp_path / "zorder")
    pdir = str(tmp_path / "pksort")
    (
        li.withColumn("_z", z.cast("int"))
        .repartition(1)
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.option("parquet.block.size", 24 * 1024)
        .parquet(zdir)
    )
    (
        li.repartition(1)
        .sortWithinPartitions("l_partkey")
        .write.option("parquet.block.size", 24 * 1024)
        .parquet(pdir)
    )

    def hit_fraction(d: str, col: str, lo: int, hi: int) -> float:
        total = hit = 0
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = [
                i
                for i in range(md.num_columns)
                if md.schema.column(i).name == col
            ][0]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                total += 1
                if not (st.max < lo or st.min >= hi):
                    hit += 1
        assert total >= 8, f"need multiple row groups, got {total}"
        return hit / total

    # suppkey-range predicate (1/8 of the domain): the partkey-sorted
    # layout cannot prune at all; the z-ordered layout can
    sk_hi = (sk_mx + 1) // 8
    z_sk = hit_fraction(zdir, "l_suppkey", 0, sk_hi)
    p_sk = hit_fraction(pdir, "l_suppkey", 0, sk_hi)
    assert p_sk == 1.0, p_sk
    assert z_sk <= 0.7, z_sk

    # partkey-range predicate: the dedicated sort prunes hardest, but
    # the z-layout still prunes — that's the trade it buys
    pk_hi = (pk_mx + 1) // 8
    z_pk = hit_fraction(zdir, "l_partkey", 0, pk_hi)
    p_pk = hit_fraction(pdir, "l_partkey", 0, pk_hi)
    assert p_pk <= 0.25, p_pk
    assert z_pk <= 0.7, z_pk

    # layout never changes answers
    pred = (F.col("l_suppkey") < sk_hi) & (F.col("l_partkey") < pk_hi)
    n_z = spark.read.parquet(zdir).filter(pred).count()
    n_p = spark.read.parquet(pdir).filter(pred).count()
    assert n_z == n_p > 0


def test_max_records_per_file_governs_output_layout(spark, tmp_path):
    """File-size governance: ``spark.sql.files.maxRecordsPerFile``
    bounds every output file regardless of partition sizes — the knob
    that keeps a 100 TB write from producing multi-GB files no
    downstream scan can split (row groups are the parallelism unit of
    a parquet read; one oversized file serializes its consumers)."""
    import pyarrow.parquet as pq

    out = str(tmp_path / "sized")
    n_rows, cap = 10_000, 1000
    df = spark.range(n_rows).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    (
        df.coalesce(2)
        .write.option("maxRecordsPerFile", cap)
        .mode("overwrite")
        .parquet(out)
    )
    files = [p for p in (tmp_path / "sized").iterdir() if p.suffix == ".parquet"]
    sizes = [pq.ParquetFile(str(p)).metadata.num_rows for p in files]
    assert sum(sizes) == n_rows
    assert max(sizes) <= cap
    # the cap actually bit: more files than the 2 input partitions
    assert len(files) > 2


def test_triangle_count_shuffles_edges_not_wedges(spark):
    """graph_triangle_count's scale claim: work shuffles O(edges), not
    O(wedges). Build a dense synthetic graph whose wedge count is ~40x
    its edge count (200 cliques of 25 nodes: 60k edges, 2.4M wedges,
    230k triangles), run the registered query's exact algorithm on it,
    and pin that total shuffled records stay within a small multiple
    of the edge count — the wedge-enumeration formulation this
    replaced shuffles the wedges themselves and blows the bound by an
    order of magnitude."""
    from unittest import mock

    from bench import _metrics_since
    import appsflyer_to_clickhouse_spark.plans.analytics_queries as aq
    from appsflyer_to_clickhouse_spark.plans import QUERIES

    # k=100 keeps the wedge/edge ratio at (k-2)=98x — the property the
    # bound separates; n_cliques only scales volume (r11: 50 -> 20 for
    # suite wall time, every assertion below is n_cliques-relative)
    n_cliques, k = 20, 100
    nodes = spark.range(n_cliques * k).select(
        (F.col("id") / k).cast("long").alias("clique"),
        F.col("id").alias("node"),
    )
    pairs = (
        nodes.alias("a")
        .join(nodes.alias("b"), "clique")
        .filter(F.col("a.node") < F.col("b.node"))
        .select(
            F.col("a.node").alias("part_a"),
            F.col("b.node").alias("part_b"),
            F.lit(1).alias("n_both"),
        )
        .localCheckpoint()  # metrics below must not count this build
    )
    n_edges = pairs.count()
    assert n_edges == n_cliques * k * (k - 1) // 2  # 247,500

    with mock.patch.object(aq, "_basket_pairs", lambda s, d: pairs):
        last, _ = _metrics_since(spark, -1)
        [row] = QUERIES["graph_triangle_count"](spark, "unused").collect()
        _, m = _metrics_since(spark, last)

    # exactness on a known graph: each clique has C(k,3) triangles
    # and every node's full degree is k-1
    assert row["n_triangles"] == n_cliques * (k * (k - 1) * (k - 2) // 6)
    assert row["n_wedges"] == n_cliques * k * ((k - 1) * (k - 2) // 2)
    assert m is not None, "metric plumbing unavailable"
    # wedges outnumber edges ~98x here; the edge-iterator keeps total
    # shuffled records within a small multiple of the edge count
    # (edges through ~6 exchanges + degree/adjacency rows — measured
    # ~16x edges), while wedge enumeration would shuffle the wedges
    assert m["shuffle_records"] < 25 * n_edges, m
    assert m["shuffle_records"] < row["n_wedges"] // 3, m
