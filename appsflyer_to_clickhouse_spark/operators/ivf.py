"""IVF (inverted-file) index build + probe for vector search — the
real form of the coarse-quantizer pattern `similarity_ivf_probe`
demonstrates with the pre-existing ``label`` column.

Build: MLlib KMeans (seeded) learns ``n_clusters`` centroids; every
vector is assigned to its nearest centroid — at 100 TB the assignment
is written as a partition column at ingest, so probes become partition
pruning.

Probe: embed the query, find its ``n_probe`` nearest centroids
(driver-side — the centroid table is tiny), scan only those clusters,
exact-cosine re-rank. Recall grows with n_probe; n_probe == n_clusters
degrades gracefully to brute force.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import cosine, dot

_SEED = 42


def build_ivf(
    emb: DataFrame,
    vec_col: str = "v",
    n_clusters: int = 16,
    fit_sample: int = 1 << 18,
):
    """Fit the coarse quantizer and return (assigned_df, model):
    ``assigned_df`` is ``emb`` + a ``cluster`` column (the partition
    key at scale). Deterministic under the fixed seed.

    The quantizer is fit on at most ``fit_sample`` vectors coalesced to
    a handful of partitions — the standard IVF recipe (FAISS trains its
    coarse quantizer on a bounded sample, then assigns the full
    corpus). Every k-means|| init step and Lloyd iteration launches a
    job over the training frame, so fitting on the full 100 TB corpus
    would be dozens of full passes; fitting on a sample is both the
    fast AND the statistically standard choice. Seeded random init
    instead of k-means||: the parallel init exists to avoid extra
    passes over a corpus too big to sample — pointless once training
    IS a bounded cached sample — and it measured 2.7x the wall for
    identical training cost (1852 vs 1840) on the testdata. Assignment
    (transform) still runs over the full distributed corpus — one
    map-only pass."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = emb.withColumn("__features", array_to_vector(F.col(vec_col)))
    train = feats.select("__features").limit(fit_sample).coalesce(4).cache()
    model = KMeans(
        k=n_clusters,
        seed=_SEED,
        featuresCol="__features",
        predictionCol="cluster",
        initMode="random",
        maxIter=10,
    ).fit(train)
    train.unpersist()
    assigned = model.transform(feats).drop("__features")
    return assigned, model


def probe_ivf(
    assigned: DataFrame,
    model,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Scan only the ``n_probe`` clusters nearest the query (euclidean
    to centroids, computed driver-side over the tiny centroid list),
    then exact cosine top-k within them. The cluster filter is a
    pushable predicate — partition pruning at scale."""
    import math

    centers = model.clusterCenters()
    dists = sorted(
        (math.dist(query_vec, list(c)), i) for i, c in enumerate(centers)
    )
    probe_ids = [i for _, i in dists[:n_probe]]

    spark = assigned.sparkSession
    qdf = F.broadcast(
        spark.createDataFrame([(query_vec,)], f"qv array<double>")
    )
    scored = (
        assigned.filter(F.col("cluster").isin(probe_ids))
        .crossJoin(qdf)
        .select(
            F.col(id_col),
            F.col("cluster"),
            cosine(
                F.col(vec_col),
                F.col("qv"),
                dot(F.col(vec_col), F.col(vec_col)),
                dot(F.col("qv"), F.col("qv")),
            ).alias("cos"),
        )
    )
    return (
        scored.orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "cluster", F.round("cos", 6).alias("cosine"))
    )
