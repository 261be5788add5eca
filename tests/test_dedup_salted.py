"""Salted LSH pair generation must be output-identical to the
unsalted form — salting changes task-level distribution, never the
candidate set."""

from __future__ import annotations

import pytest

from appsflyer_to_clickhouse_spark.operators.dedup import (
    lsh_candidate_pairs,
    lsh_candidate_pairs_salted,
    minhash_signatures,
)
from appsflyer_to_clickhouse_spark.plans.registry import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("salt", [1, 2, 4, 7])
def test_salted_pairs_equal_unsalted(spark, salt):
    docs = load(spark, SF_DIR, "documents")
    sigs = minhash_signatures(docs, "text", 8, 3)
    base = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sigs, "doc_id", 4, 2).collect()
    }
    salted = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs_salted(sigs, "doc_id", 4, 2, salt).collect()
    }
    assert salted == base
    assert base, "expected a nonempty candidate set at sf0.001"


def test_salted_handles_singleton_and_tiny_buckets(spark):
    # groups smaller than the salt count must not produce phantom or
    # missing pairs (empty chunks are filtered, singleton chunks yield
    # no in-chunk pairs)
    docs = load(spark, SF_DIR, "documents").limit(30)
    sigs = minhash_signatures(docs, "text", 8, 3)
    base = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sigs, "doc_id", 4, 2).collect()
    }
    salted = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs_salted(sigs, "doc_id", 4, 2, 8).collect()
    }
    assert salted == base


def test_hot_cluster_salting_bounds_per_key_pair_count(spark):
    """Skew stress at a hostile distribution (VERDICT r4 task 6): ONE
    near-dup cluster of 1,000 identical-text docs — every doc lands in
    the same bucket of every band, the worst case LSH admits. Pin the
    salt^2/2 spreading claim empirically, at the granularity that
    bounds a task at production scale: the repartition KEY.

    - unsalted: pair generation keys on (band, bucket) — the hot
      bucket's single key must carry the full k(k-1)/2 explosion
      (499,500 pairs), the straggler this operator exists to avoid;
    - salted (salt=8): keys on (band, bucket, i, j) — the max key
      carries at most ceil(k/salt)^2 = 15,625 pairs, a 32x = salt^2/2
      spread, and the candidate set is IDENTICAL."""
    from pyspark.sql import functions as F

    from appsflyer_to_clickhouse_spark.operators.dedup import (
        _lsh_bucket_groups,
        _salted_cell_rows,
    )

    k, salt = 1000, 8
    hot = spark.range(k).select(
        F.col("id").alias("doc_id"),
        F.lit("the same near duplicate spam page text repeated").alias("text"),
    )
    background = load(spark, SF_DIR, "documents").select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    ).limit(200)
    sigs = minhash_signatures(hot.unionByName(background), "text", 8, 3)
    groups = _lsh_bucket_groups(sigs, "doc_id", 4, 2).cache()
    try:
        # unsalted: max pairs carried by ONE (band, bucket) key
        tri = (F.size("ids") * (F.size("ids") - 1) / 2).cast("long")
        unsalted_max = groups.agg(F.max(tri)).first()[0]
        assert unsalted_max == k * (k - 1) // 2  # 499,500 in one task

        # salted: max pairs carried by ONE (band, bucket, i, j) key
        cell_pairs = F.when(
            F.col("i") == F.col("j"),
            (F.size("ca") * (F.size("ca") - 1) / 2).cast("long"),
        ).otherwise((F.size("ca") * F.size("cb")).cast("long"))
        salted_max = (
            _salted_cell_rows(groups, salt).agg(F.max(cell_pairs)).first()[0]
        )
        ceil_chunk = -(-k // salt)
        assert salted_max <= ceil_chunk * ceil_chunk  # 15,625
        # exact spread: k(k-1)/2 over (k/salt)^2 = (salt^2/2)(k-1)/k
        assert unsalted_max / salted_max >= (salt * salt / 2) * (k - 1) / k

        # spreading must not change the answer: identical candidates
        base = {
            (r.id_a, r.id_b)
            for r in lsh_candidate_pairs(sigs, "doc_id", 4, 2).collect()
        }
        salted = {
            (r.id_a, r.id_b)
            for r in lsh_candidate_pairs_salted(
                sigs, "doc_id", 4, 2, salt
            ).collect()
        }
        assert salted == base and len(base) >= k * (k - 1) // 2
    finally:
        groups.unpersist()
