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
