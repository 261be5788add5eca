"""Similarity-search operators over embedding columns (SURVEY.md §2
Part C ``similarity_topk`` + the ANN scale path).

Three tiers, in increasing 100 TB readiness:

1. ``cosine_topk`` — exact brute force: one map-side pass computing the
   score + a TakeOrderedAndProject (no full sort, no shuffle of
   vectors). Correctness baseline; O(n·d) per query.
2. ``ivf_probe_topk`` — IVF-style: vectors are pre-blocked by a coarse
   assignment column (here ``label``; at scale a k-means centroid id
   stored as a partition column), the query probes only its own block —
   partition pruning turns O(n) into O(n / #blocks).
3. ``signlsh_topk`` — sign-LSH (random hyperplanes): a 16-bit signature
   per vector, banded 4x4; candidates share >= 1 band with the query,
   then exact cosine re-ranks the candidates. Signature is a map-only
   expression; the only shuffle is the (band, value) candidate join —
   never an all-pairs product. Hyperplane weights are deterministic
   md5-derived constants, embedded as literals on BOTH the Spark and
   oracle side, so the whole ANN structure is exactly reproducible.

All dot products run in double precision via zip_with + aggregate —
JVM expressions inside codegen, no UDF, no vector collect.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NUM_PLANES = 16
BAND_BITS = 4
NUM_BANDS = NUM_PLANES // BAND_BITS


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold double dot product (same fold order as DuckDB's
    list_dot_product, so results are bit-identical)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """cos = dot / (sqrt(|a|^2) * sqrt(|b|^2)) — written exactly this
    way on the oracle side too (not sqrt(|a|^2*|b|^2), which differs in
    ulps)."""
    return dot(a, b) / (F.sqrt(norm_a) * F.sqrt(norm_b))


def hyperplanes(dim: int, num_planes: int = NUM_PLANES) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) is
    md5-derived, uniform in [-1, 1] with 3 decimal digits — exact in
    float64, so literal embedding is lossless in both engines."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[:15], 16)
            row.append((h % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def sign_signature(v: Column, planes: list[list[float]]) -> Column:
    """16-bit sign-LSH signature: bit p set iff dot(w_p, v) > 0.
    One expression per row — map-only, no shuffle."""
    sig = F.lit(0)
    for p, w in enumerate(planes):
        wcol = F.array(*[F.lit(x) for x in w])
        sig = sig + F.when(dot(wcol, v) > 0, F.lit(2**p)).otherwise(F.lit(0))
    return sig.cast("int")


def band_values(sig: Column) -> Column:
    """Split the signature into NUM_BANDS values of BAND_BITS bits."""
    return F.array(
        *[
            F.shiftright(sig, BAND_BITS * b).bitwiseAND(F.lit(2**BAND_BITS - 1))
            for b in range(NUM_BANDS)
        ]
    )


def cosine_topk(
    emb: DataFrame,
    query_vec: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Exact brute-force top-k: broadcast the 1-row query, score every
    vector map-side, TakeOrderedAndProject(k). The 100 TB plan: one
    scan, zero shuffle, k rows to the driver."""
    q = F.broadcast(query_vec.select(F.col(vec_col).alias("qv")))
    scored = emb.crossJoin(q).select(
        F.col(id_col),
        cosine(
            F.col(vec_col),
            F.col("qv"),
            dot(F.col(vec_col), F.col(vec_col)),
            dot(F.col("qv"), F.col("qv")),
        ).alias("cos"),
    )
    return (
        scored.orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, F.round("cos", 6).alias("cosine"))
    )
