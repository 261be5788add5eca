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
