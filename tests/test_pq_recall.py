"""Neighbor-quality pin for the two-stage PQ-ADC query: the final
top-10 (ADC shortlist -> exact re-rank) must recover at least half of
the true exact-L2 top-10. 8x2-bit codes over a 100-candidate shortlist
are the COARSE tier — production widens codes/shortlist for higher
recall; this pins that the machinery ranks signal, not noise (the
unscaled-codebook regression measured recall 0).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from appsflyer_to_clickhouse_spark.operators.similarity import dot
from appsflyer_to_clickhouse_spark.plans import QUERIES

from .conftest import SF_SMALL


def test_pq_two_stage_recall_at_10(spark):
    got = {r.vec_id for r in QUERIES["similarity_pq_adc"](spark, SF_SMALL).collect()}
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    l2 = (
        dot(F.col("v"), F.col("v"))
        - 2 * dot(F.col("v"), F.col("qv"))
        + dot(F.col("qv"), F.col("qv"))
    )
    exact = [
        r.vec_id
        for r in emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", l2.alias("l2"))
        .orderBy("l2", "vec_id")
        .limit(10)
        .collect()
    ]
    assert len(got) == 10
    recall = len(got & set(exact)) / 10
    assert recall >= 0.5, f"two-stage PQ recall@10 {recall} below floor"


def test_ivfpq_recall_at_10(spark):
    """IVF-PQ probes 2 of 8 coarse cells before the ADC scan, so its
    recall sits below full-corpus PQ (measured 3-6/10 across SFs vs
    5-8/10) — the price of reading ~1/4 of the cells; the floor pins
    that the compounded pruning still ranks signal (widening nprobe
    recovers the gap, exactly as in FAISS)."""
    got = {r.vec_id for r in QUERIES["similarity_ivfpq"](spark, SF_SMALL).collect()}
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    l2 = (
        dot(F.col("v"), F.col("v"))
        - 2 * dot(F.col("v"), F.col("qv"))
        + dot(F.col("qv"), F.col("qv"))
    )
    exact = [
        r.vec_id
        for r in emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", l2.alias("l2"))
        .orderBy("l2", "vec_id")
        .limit(10)
        .collect()
    ]
    assert len(got) == 10
    recall = len(got & set(exact)) / 10
    assert recall >= 0.3, f"IVF-PQ recall@10 {recall} below floor"
