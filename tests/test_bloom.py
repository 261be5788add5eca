"""Bloom-filter ingest pre-filter (operators/bloom.py): the properties
the 100 TB ingest design depends on — metadata-sized state, broadcast
probing, and the no-false-negative guarantee that lets cleared keys
skip the exact membership join entirely.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from appsflyer_to_clickhouse_spark.operators.bloom import (
    K_HASHES,
    M_BITS,
    WORD_BITS,
    bloom_build,
    bloom_prefilter_dedup,
    bloom_probe,
)
from appsflyer_to_clickhouse_spark.plans import QUERIES

from .conftest import SF_SMALL


def _plan(spark, df) -> str:
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bitmap_is_metadata_sized(spark):
    """State cardinality is bounded by the filter constant m/32 — never
    by corpus size. (8 KiB of bits = <= 2048 rows.)"""
    keys = spark.range(50_000).select(F.md5(F.col("id").cast("string")).alias("k"))
    bitmap = bloom_build(keys, "k")
    assert bitmap.count() <= M_BITS // WORD_BITS


def test_no_false_negatives_on_full_overlap(spark):
    """Every key present in history MUST probe as maybe — the guarantee
    that makes 'definitely new' skippable without an exact check."""
    hist = spark.range(2_000).select(
        F.md5(F.col("id").cast("string")).alias("k")
    )
    bitmap = bloom_build(hist, "k")
    probe = bloom_probe(hist, bitmap, "k")
    assert probe.filter(~F.col("bloom_maybe")).count() == 0


def test_probe_broadcasts_bitmap(spark):
    """The probe side never shuffles history: the bitmap arrives as a
    broadcast, and the only Exchange keys on the BATCH's own keys."""
    df = QUERIES["dedup_bloom_prefilter"](spark, SF_SMALL)
    plan = _plan(spark, df)
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_verify_join_broadcasts_maybe_keys_not_history(spark):
    """The exact verification must scan history ONCE with the
    batch-bounded maybe-set broadcast onto it — never shuffle or
    distinct the full history key set per batch (the O(history) cost
    the bloom filter exists to remove). Pinned: the semi join's build
    side is a BroadcastExchange, and no Exchange hashpartitioning
    keys on the history frame's key upstream of it."""
    hist = spark.range(0, 500).select(
        F.md5(F.concat(F.lit("h"), F.col("id").cast("string"))).alias("k")
    )
    batch = spark.range(0, 200).select(
        F.md5(F.concat(F.lit("b"), F.col("id").cast("string"))).alias("k")
    )
    out = bloom_prefilter_dedup(hist, batch, "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # the history side must not be aggregated/distinct'd before the
    # semi join — HashAggregate belongs only to the final probe groupBy
    semi_idx = plan.find("LeftSemi")
    assert "SortMergeJoin" not in plan[semi_idx : semi_idx + 400]


def test_exact_join_sees_only_maybe_keys(spark):
    """The verification join's probe input is filtered to bloom_maybe
    — O(true dups + FPs), not O(batch): disjoint key sets produce an
    empty verification input."""
    hist = spark.range(0, 500).select(
        F.md5(F.concat(F.lit("h"), F.col("id").cast("string"))).alias("k")
    )
    batch = spark.range(0, 200).select(
        F.md5(F.concat(F.lit("b"), F.col("id").cast("string"))).alias("k")
    )
    out = bloom_prefilter_dedup(hist, batch, "k").collect()
    assert len(out) == 200
    assert all(not r.is_dup for r in out)
    # K_HASHES independent bits over M_BITS at this density: false
    # positives are ~(kn/m)^k ~ 1e-9 — any maybe here is a logic bug
    assert K_HASHES >= 4
    assert sum(1 for r in out if r.bloom_maybe) == 0
