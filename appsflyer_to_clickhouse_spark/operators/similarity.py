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

import numpy as np
import pandas as pd
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


def sparse_planes(
    dim: int, num_planes: int, seed: str = "sp"
) -> list[list[int]]:
    """Ternary sparse random projections (Achlioptas 2003): component
    (p, d) is +1 with prob 1/6, -1 with prob 1/6, else 0 — md5-derived,
    so both engines regenerate the identical planes. Sparse planes make
    each hyperplane dot a ~dim/3-term add/subtract of vector elements:
    short enough to compile under whole-stage codegen (dense 64-float
    planes at 60 planes blow the codegen budget and fall back to
    interpreted evaluation — ~30x slower per row, measured at sf0.1)."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{seed}|{p}|{d}".encode()).hexdigest()[:15], 16) % 6
            row.append(1 if h == 0 else (-1 if h == 1 else 0))
        planes.append(row)
    return planes


def sparse_dot_sql(w: list[int], vec_expr: str, index_base: int = 0) -> str:
    """SQL text of dot(ternary plane, vec) as an explicit left-to-right
    add/subtract chain — the SAME evaluation order in every engine, so
    signs are bit-identical (IEEE addition is order-sensitive but both
    sides run the identical sequence). ``index_base`` is 0 for Spark
    SQL array subscripts, 1 for DuckDB."""
    parts = [
        ("+" if x == 1 else "-", f"{vec_expr}[{d + index_base}]")
        for d, x in enumerate(w)
        if x
    ]
    if not parts:
        return "0.0"
    s = parts[0][1] if parts[0][0] == "+" else "-" + parts[0][1]
    for op, t in parts[1:]:
        s += f" {op} {t}"
    return "(" + s + ")"


def sparse_sign_signature_sql(
    planes: list[list[int]], vec_expr: str, dialect: str = "spark"
) -> str:
    """Sign-LSH signature over sparse ternary planes as ONE SQL string
    (bit p set iff sparse_dot > 0), identical bit-for-bit between Spark
    (``dialect='spark'``, 0-based arrays, ``L`` long literals) and
    DuckDB (``dialect='duckdb'``, 1-based, ``::BIGINT``). Built as a
    string so plan construction is a single parse — per-literal Column
    building costs thousands of py4j round trips (measured ~6 s of
    driver time at 60 planes x 64 dims)."""
    if dialect == "spark":
        base, lit = 0, lambda n: f"{n}L"
    else:
        base, lit = 1, lambda n: f"{n}::BIGINT"
    terms = " + ".join(
        f"(CASE WHEN {sparse_dot_sql(w, vec_expr, base)} > 0 "
        f"THEN {lit(2**p)} ELSE {lit(0)} END)"
        for p, w in enumerate(planes)
    )
    if dialect == "spark":
        return f"cast({terms} as bigint)"
    return f"({terms})"


def _dot_sql(w: list[float], vec_expr: str) -> str:
    """Spark-SQL text of dot(literal plane, vec_expr) with the same
    sequential fold order as ``dot`` (and DuckDB's list_dot_product),
    so signs are bit-identical across all three forms."""
    arr = "array(" + ", ".join(f"{x!r}D" for x in w) + ")"
    return (
        f"aggregate(zip_with({arr}, {vec_expr}, (x, y) -> x * y), "
        f"cast(0.0 as double), (acc, x) -> acc + x)"
    )


def sign_signature(vec_expr: str, planes: list[list[float]]) -> Column:
    """Sign-LSH signature (one bit per plane): bit p set iff
    dot(w_p, v) > 0. One expression per row — map-only, no shuffle.
    Returned as bigint so up to 63 planes fit (the dedup blocking uses
    60; the ANN probe uses 16).

    ``vec_expr`` is a SQL expression string (usually a column name):
    the whole signature is assembled as ONE SQL string parsed JVM-side
    by a single ``F.expr`` call. Building it from per-literal Column
    objects costs thousands of py4j round trips (~6 s of DRIVER time
    for 60 planes x 64 dims — measured; the actual execution is
    sub-second), so the string form is a ~10x plan-construction win,
    not a style choice."""
    terms = " + ".join(
        f"(CASE WHEN {_dot_sql(w, vec_expr)} > 0 THEN {2**p}L ELSE 0L END)"
        for p, w in enumerate(planes)
    )
    return F.expr(f"cast({terms} as bigint)")


def sparse_sign_signature_udf(planes: list[list[int]]):
    """Arrow-vectorized twin of ``sparse_sign_signature_sql(...,
    'spark')``: same planes, same strict ``dot > 0`` bit rule, same
    bigint packing — but the batch of dots is ONE numpy matmul
    instead of a ~|planes| x |nonzeros| interpreted SQL expression
    per row (measured at sf0.1: the 60-plane SQL chain evaluates at
    ~2.4 ms/row — far past codegen's budget despite the sparse form —
    vs ~3 us/row here, a ~100x map-stage win).

    Cross-engine sign fidelity: the SQL chain adds terms LEFT TO
    RIGHT while numpy's matmul may sum pairwise, so the two can round
    differently by ~machine epsilon. A sign can only differ where the
    dot's magnitude is below that rounding bound, so every dot with
    |dot| <= 1e-9 * sum(|terms|) (a deliberately loose ceiling on
    order-dependent error) is recomputed with the SQL's exact
    left-to-right chain in Python before the sign test.

    Non-finite inputs: a NaN element would poison EVERY plane's dot
    in the matmul, where the SQL chain only taints planes whose
    nonzero coefficients touch that dimension — so any row containing
    a non-finite value is recomputed per-plane with the exact chain,
    and a NaN accumulation sets the bit (both Spark and DuckDB order
    NaN greater than every value, so ``CASE WHEN nan > 0`` is TRUE —
    verified on both engines). One documented divergence remains:
    a NULL ELEMENT inside a non-null vector reaches pandas as NaN
    (Arrow cannot distinguish them), so it takes the NaN semantics
    (bit 1 on touched planes) where pure Spark SQL would yield NULL
    comparisons (bit 0). Pinned bit-identical to the SQL expression —
    including NaN/inf vectors — in tests/test_scale_evidence.py."""
    mat = np.array(planes, dtype=np.float64).T  # dim x P
    amat = np.abs(mat)
    n_planes = len(planes)
    powers = np.uint64(1) << np.arange(n_planes, dtype=np.uint64)
    chain_terms = [
        [(d, x) for d, x in enumerate(w) if x] for w in planes
    ]

    @F.pandas_udf("bigint")
    def sig(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int64")
        null_mask = vs.isna()
        stack = np.vstack(
            [
                np.zeros(mat.shape[0]) if none else v
                for v, none in zip(vs.to_numpy(), null_mask)
            ]
        )
        finite = np.isfinite(stack).all(axis=1)
        dots = stack @ mat
        ties = np.argwhere(
            (np.abs(dots) <= 1e-9 * (np.abs(stack) @ amat))
            & finite[:, None]
        )
        for r, p in ties:
            acc = 0.0
            row = stack[r]
            for d, x in chain_terms[p]:
                acc = acc + row[d] if x == 1 else acc - row[d]
            dots[r, p] = acc
        bits = dots > 0
        for r in np.nonzero(~finite)[0]:
            row = stack[r]
            for p in range(n_planes):
                acc = 0.0
                for d, x in chain_terms[p]:
                    acc = acc + row[d] if x == 1 else acc - row[d]
                # NaN > 0 is TRUE in Spark and DuckDB (NaN orders
                # greatest) but False in Python — set the bit explicitly
                bits[r, p] = bool(np.isnan(acc)) or acc > 0
        packed = bits.astype(np.uint64) @ powers
        out = packed.astype(np.int64)
        # SQL semantics for a NULL vector: every CASE term is 0 -> 0
        out[null_mask.to_numpy()] = 0
        return pd.Series(out)

    return sig


def band_values(
    sig: Column, band_bits: int = BAND_BITS, num_bands: int = NUM_BANDS
) -> Column:
    """Split the signature into ``num_bands`` values of ``band_bits``
    bits each."""
    return F.array(
        *[
            F.shiftright(sig, band_bits * b).bitwiseAND(F.lit(2**band_bits - 1))
            for b in range(num_bands)
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
