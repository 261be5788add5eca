"""Accuracy pin for the MinHash Jaccard estimator: with H=8 signature
positions the estimator's per-pair std is sqrt(J(1-J)/8) <= 0.177, so
its mean absolute error over the LSH candidate set must sit well under
that envelope — the quantitative license for thresholding on the
estimate (KB-sized) instead of exact shingle Jaccard (document-sized)
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from appsflyer_to_clickhouse_spark.plans import QUERIES

from .conftest import SF_SMALL


def test_estimator_error_within_theory_envelope(spark):
    df = QUERIES["dedup_minhash_estimate"](spark, SF_SMALL)
    stats = df.agg(
        F.count("*").alias("n"),
        F.avg(F.abs(F.col("jaccard_est") - F.col("jaccard_exact"))).alias(
            "mae"
        ),
        F.max(F.abs(F.col("jaccard_est") - F.col("jaccard_exact"))).alias(
            "worst"
        ),
    ).first()
    assert stats.n > 0, "no LSH candidates at this SF"
    assert stats.mae <= 0.20, f"mean |est-exact| {stats.mae} out of envelope"
    assert stats.worst <= 0.75, f"worst-case error {stats.worst}"
