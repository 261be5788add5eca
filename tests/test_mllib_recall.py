"""Pin the MLlib (rows-only) variants against the oracle-checked exact
implementations: the seeded LSH structures must recover the known
near-dup pairs / true nearest neighbours. This is the stronger check
standing in for the DuckDB oracle the JVM hash families can't have.
"""

from __future__ import annotations

from appsflyer_to_clickhouse_spark.plans import QUERIES

from .conftest import SF_SMALL


def test_mllib_minhash_recovers_exact_jaccard_pairs(spark):
    exact = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["dedup_ngram_jaccard"](spark, SF_SMALL).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["dedup_minhash_mllib"](spark, SF_SMALL).collect()
    }
    assert exact, "expected planted near-dup pairs in testdata"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"MLlib MinHashLSH recall {recall:.2f} vs exact pairs"


def test_ivf_kmeans_recovers_near_neighbours(spark):
    brute = [r["vec_id"] for r in QUERIES["similarity_topk"](spark, SF_SMALL).collect()]
    ivf = {r["vec_id"] for r in QUERIES["similarity_ivf_kmeans"](spark, SF_SMALL).collect()}
    assert brute[0] in ivf  # the query itself lives in the probed cluster
    overlap = len(set(brute[:5]) & ivf)
    assert overlap >= 2, f"only {overlap} of brute-force top-5 found by IVF(n_probe=2)"


def test_mllib_brp_neighbours_overlap_brute_force(spark):
    brute = [r["vec_id"] for r in QUERIES["similarity_topk"](spark, SF_SMALL).collect()]
    ann = {r["vec_id"] for r in QUERIES["similarity_brp_mllib"](spark, SF_SMALL).collect()}
    # euclidean ANN vs cosine top-k agree on the near neighbourhood of
    # the query; require the query itself plus most of the top-5
    assert brute[0] in ann
    overlap = len(set(brute[:5]) & ann)
    assert overlap >= 3, f"only {overlap} of brute-force top-5 found by BRP-LSH"


def test_semantic_kmeans_prune_matches_brute_force(spark):
    """dedup_semantic_kmeans is rows-only (iterative k-means has no SQL
    twin), so verify the half that IS checkable exactly: given the
    query's own deterministic cluster assignment, the surviving set
    must equal a brute-force recomputation of the SemDeDup drop rule
    (drop every id with a lower-id cluster-mate at cosine >= 0.3)."""
    import decimal
    import math

    from pyspark.sql import functions as F

    from appsflyer_to_clickhouse_spark.operators.ivf import build_ivf
    from appsflyer_to_clickhouse_spark.plans.registry import load_fanout

    survivors = {
        (r["vec_id"], r["cluster"])
        for r in QUERIES["dedup_semantic_kmeans"](spark, SF_SMALL).collect()
    }

    emb = load_fanout(spark, SF_SMALL, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    assigned, _ = build_ivf(emb, "v", n_clusters=8)  # same seed -> same clusters
    rows = assigned.select("vec_id", "v", "cluster").collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append((r["vec_id"], r["v"]))
    expected = set()
    for cl, members in by_cluster.items():
        members.sort()
        for i, (id_b, vb) in enumerate(members):
            nb = math.sqrt(sum(x * x for x in vb))
            dropped = False
            for id_a, va in members[:i]:
                na = math.sqrt(sum(x * x for x in va))
                raw = sum(x * y for x, y in zip(va, vb)) / (na * nb)
                # Spark F.round is HALF_UP; Python round() is banker's
                # (half-to-even) — a representable 6-decimal half-
                # boundary would classify differently, so quantize with
                # the same rule the query applies
                cos = float(
                    decimal.Decimal(raw).quantize(
                        decimal.Decimal("0.000001"),
                        rounding=decimal.ROUND_HALF_UP,
                    )
                )
                if cos >= 0.3:
                    dropped = True
                    break
            if not dropped:
                expected.add((id_b, cl))
    assert survivors == expected
    assert len(by_cluster) > 1, "k-means degenerated to one cluster"


def test_quality_classifier_heldout_accuracy(spark):
    """text_quality_classifier is rows-only (LBFGS training is not
    SQL-expressible); pin the property that makes it a usable filter:
    held-out accuracy vs the rule labels >= 0.95 (measured 1.0 at all
    three SFs — the rule is a threshold function of the features, so
    a working logistic fit should separate it), with both classes
    actually present in the held-out split."""
    from pyspark.sql import functions as F

    out = QUERIES["text_quality_classifier"](spark, SF_SMALL)
    agg = out.agg(
        F.count("*").alias("n"),
        F.avg(
            (F.col("rule_keep") == F.col("model_keep")).cast("double")
        ).alias("acc"),
        F.sum(F.col("rule_keep").cast("int")).alias("pos"),
    ).first()
    assert agg.n > 50
    assert 0 < agg.pos < agg.n  # both classes in the held-out split
    assert agg.acc >= 0.95, f"held-out accuracy {agg.acc}"
    # probabilities are calibrated-ish: model_keep == (p_keep >= 0.5)
    bad = out.filter(
        (F.col("p_keep") >= 0.5) != F.col("model_keep")
    ).count()
    assert bad == 0


def test_fit_survives_live_observation_in_session(spark):
    """Regression pin (full-suite ordering bug): after a query using
    df.observe() runs in the session, LogisticRegression.fit on an
    un-checkpointed plan failed with 'Task not serializable:
    ObservationManager' — fit's RDD closures serialize the input plan
    and the live Observation rides along. The classifier checkpoints
    its training frame, so the observe-then-fit sequence must work."""
    QUERIES["observe_write_audit"](spark, SF_SMALL).write.format(
        "noop"
    ).mode("overwrite").save()
    out = QUERIES["text_quality_classifier"](spark, SF_SMALL)
    # FULL materialization, not count(): count prunes the prediction
    # UDF column and masked the summary->session closure-serialization
    # failure the bench's noop write found
    out.write.format("noop").mode("overwrite").save()
    assert out.count() > 50
