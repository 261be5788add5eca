"""Product quantization (PQ) with asymmetric-distance scoring (ADC) —
the compressed-scan tier of the similarity stack.

Jegou et al., "Product Quantization for Nearest Neighbor Search"
(TPAMI 2011): split each vector into M subvectors, quantize each
against its own K-centroid codebook, and store only the M code ids —
here 8 subspaces x 16 centroids = 8 x 4 bits = 4 BYTES per vector
against 256 bytes of float64, a 64x scan-bandwidth reduction. Query
scoring is ASYMMETRIC: the query stays exact; its squared distance to
every centroid of every subspace is computed ONCE into a lookup table
(M x K = 128 doubles), and a corpus row's approximate distance is just
M table lookups + (M-1) adds — no per-row float vector math at all.

Code budget (round 5): 4-bit codes replaced the original 2-bit tier —
the coarse codes pinned recall@10 at only 0.5-0.8 across SFs, and
FAISS's deployed PQ configurations are byte/nibble codes for the same
reason; with 16 centroids per subspace (+ a 2x shortlist) the pinned
floor is 0.8 at every SF (tests/test_pq_recall.py) while the scan
tier stays 64x smaller than float64.

Spark realization: code assignment is a map-only Project over the
scan (the "index build"); the 32-entry LUT is a ONE-ROW DataFrame
broadcast onto the coded corpus, so each row's ADC distance is an
8-way CASE over broadcast columns; top-k is TakeOrderedAndProject.
Zero shuffles at any scale — the property that lets a 100 TB corpus
be scanned for neighbors at 1/128th the I/O of the exact path (which
``similarity_topk`` remains, for re-ranking ADC survivors).

Cross-engine determinism: codebooks are md5-derived ternary literals
(exactly regenerable in SQL), every squared-distance chain is written
with the same left-to-right term order in both dialects, and argmin
ties resolve to the lowest centroid index via first-match-wins <=
comparisons — so codes, LUT, and ADC scores are all bit-identical.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

M_SUB = 8  # subspaces
K_CENT = 16  # centroids per subspace -> 4-bit codes
# exemplar-codebook derivation: the EXEM_PER_LABEL lowest-vec_id
# vectors of each of the first K_CENT/EXEM_PER_LABEL labels (the
# testdata carries 10 labels, so 16 centroids need 2 exemplars per
# label); exemplar index = label * EXEM_PER_LABEL + (rn - 1)
EXEM_PER_LABEL = 2
# Centroid component magnitude: unit-norm dim-d vectors have component
# scale ~1/sqrt(d); for d=64 that is exactly 0.125 = 2^-3 — exact in
# binary floating point, so the literal is lossless in both engines.
# Unscaled ternary centroids (+-1) sit 8x outside the data shell: every
# distance is then dominated by the centroid's own norm and the code
# assignment collapses to noise (measured recall ~0 before scaling).
CENT_SCALE = 0.125


def pq_codebooks(
    dim: int, m_sub: int = M_SUB, k_cent: int = K_CENT, seed: str = "pq"
) -> list[list[list[int]]]:
    """cent[s][j][d] in {-1, 0, 1}, md5-derived so both engines embed
    the identical codebooks as literals. Uniform over the three values
    (denser than the 1/6 Achlioptas planes — a quantizer needs its
    centroids spread, not sparse)."""
    sub_dim = dim // m_sub
    return [
        [
            [
                int(
                    hashlib.md5(f"{seed}|{s}|{j}|{d}".encode()).hexdigest()[:15],
                    16,
                )
                % 3
                - 1
                for d in range(sub_dim)
            ]
            for j in range(k_cent)
        ]
        for s in range(m_sub)
    ]


def sq_dist_sql(
    cent: list[int], vec_expr: str, dim_offset: int, index_base: int
) -> str:
    """SQL text of ||v[offset : offset+len] - CENT_SCALE*cent||^2 as an
    explicit left-to-right chain of squared terms — identical
    evaluation order in every engine, so the doubles are bit-identical.
    Ternary signs keep each term trivial: c=0 -> v*v, c=+-1 ->
    (v -+ 0.125)^2 (the scale literal is a power of two — lossless)."""
    terms = []
    for d, c in enumerate(cent):
        idx = f"{vec_expr}[{dim_offset + d + index_base}]"
        if c == 0:
            terms.append(f"{idx} * {idx}")
        elif c == 1:
            terms.append(f"({idx} - {CENT_SCALE}) * ({idx} - {CENT_SCALE})")
        else:
            terms.append(f"({idx} + {CENT_SCALE}) * ({idx} + {CENT_SCALE})")
    return "(" + " + ".join(terms) + ")"


def argmin_case_sql(k: int, prefix: str) -> str:
    """CASE choosing the argmin of ``{prefix}0..{prefix}{k-1}`` with
    first-match-wins <= comparisons — ties resolve to the LOWEST index
    in every engine (the same contract as dedup.argmax_case_sql)."""
    whens = []
    for p in range(k - 1):
        rest = [f"{prefix}{q}" for q in range(p + 1, k)]
        cmp = rest[0] if len(rest) == 1 else f"least({', '.join(rest)})"
        whens.append(f"WHEN {prefix}{p} <= {cmp} THEN {p}")
    return "CASE " + " ".join(whens) + f" ELSE {k - 1} END"


def dist_col_exprs(
    books: list[list[list[int]]], vec_expr: str, index_base: int, prefix: str
) -> list[str]:
    """All M x K staged squared-distance columns ``{prefix}{s}_{j}``.
    Staged in their own Project/CTE so each chain is evaluated once,
    however many argmin comparisons reference it."""
    sub_dim = len(books[0][0])
    return [
        f"{sq_dist_sql(c, vec_expr, s * sub_dim, index_base)} AS {prefix}{s}_{j}"
        for s, cents in enumerate(books)
        for j, c in enumerate(cents)
    ]


def seeded_sq_dist_sql(
    vec_expr: str,
    seed_expr: str,
    dim_offset: int,
    sub_dim: int,
    index_base: int,
) -> str:
    """||v_sub - seed_sub||^2 where the centroid is ANOTHER ARRAY
    COLUMN (a sampled-exemplar codebook row) rather than a literal —
    same explicit left-to-right chain, so with identical input doubles
    both engines produce bit-identical distances."""
    terms = []
    for d in range(sub_dim):
        i = dim_offset + d + index_base
        terms.append(
            f"({vec_expr}[{i}] - {seed_expr}[{i}])"
            f" * ({vec_expr}[{i}] - {seed_expr}[{i}])"
        )
    return "(" + " + ".join(terms) + ")"


def seeded_dist_col_exprs(
    vec_expr: str,
    seed_exprs: list[str],
    m_sub: int,
    sub_dim: int,
    index_base: int,
    prefix: str,
) -> list[str]:
    """Staged distance columns ``{prefix}{s}_{k}`` of ``vec_expr``'s
    subspaces against each sampled-codebook column in ``seed_exprs``."""
    return [
        f"{seeded_sq_dist_sql(vec_expr, sv, s * sub_dim, sub_dim, index_base)}"
        f" AS {prefix}{s}_{k}"
        for s in range(m_sub)
        for k, sv in enumerate(seed_exprs)
    ]


def code_col_exprs(m_sub: int, k_cent: int, dist_prefix: str) -> list[str]:
    """Per-subspace 2-bit code columns ``c{s}`` from the staged
    distances — argmin via argmin_case_sql (ONE definition of the
    lowest-index tie rule; the contract is load-bearing for
    cross-engine determinism)."""
    return [
        argmin_case_sql(k_cent, f"{dist_prefix}{s}_") + f" AS c{s}"
        for s in range(m_sub)
    ]


def adc_sql(m_sub: int, k_cent: int, lut_prefix: str) -> str:
    """ADC distance: sum over subspaces of the LUT column the row's
    code selects — M CASE lookups + M-1 adds per row, nothing else."""
    parts = []
    for s in range(m_sub):
        whens = " ".join(
            f"WHEN {j} THEN {lut_prefix}{s}_{j}" for j in range(k_cent)
        )
        parts.append(f"(CASE c{s} {whens} END)")
    return "(" + " + ".join(parts) + ")"


def pq_code_udf(cents, m_sub: int = M_SUB):
    """Arrow-vectorized twin of the staged-SQL encode
    (``seeded_dist_col_exprs`` + ``code_col_exprs``): per batch, ALL
    subspace distances are numpy broadcasting ops and the per-subspace
    argmin is ``np.argmin`` (first-min = the SQL CASE's lowest-index
    tie rule) — vs 128 staged 8-term expression chains per row, which
    evaluate at ~1.2 ms/row at K=16 (the K=4 -> 16 widening for the
    0.8 recall floor quadrupled the chain count). Same pattern as
    operators/similarity.sparse_sign_signature_udf.

    ``cents`` is the K x dim EXEMPLAR codebook collected from the
    one-row book frame — index metadata, KB-sized, the same
    driver-side control-state class as the sketch merges.

    Cross-engine argmin fidelity: the SQL chain sums the 8 squared
    terms LEFT TO RIGHT; numpy may sum pairwise, so two engines can
    round a distance differently by ~machine epsilon. A CODE can only
    differ where the gap between the two smallest distances is inside
    that rounding bound, so every (row, subspace) whose top-2 gap is
    <= 1e-9 * (d1 + d2) is re-ranked with distances recomputed in the
    SQL's exact left-to-right order. Distances are sums of squares
    (every term non-negative), so the relative-error bound is tight.

    SQL NULL/NaN semantics, replicated exactly: a NULL vector makes
    every staged distance NULL, every CASE comparison false, and the
    code falls to ELSE K-1 (all subspaces). A non-finite element
    makes distances NaN; Spark orders NaN GREATEST and NaN = NaN, so
    the argmin ranks by (isnan, value) with lowest-index ties — any
    row containing a non-finite value is re-ranked that way in exact
    arithmetic. (As with the sign kernel, a NULL *element* inside a
    non-null vector reaches Arrow as NaN and takes NaN semantics —
    the one documented divergence.) Pinned code-identical to the SQL
    chains, including NaN/inf/tie fixtures, in tests/test_pq_kernel.py.
    """
    from pyspark.sql import functions as F

    cents = np.asarray(cents, dtype=np.float64)
    k_cent, dim = cents.shape
    sub = dim // m_sub

    def exact_dist(row, cent, s: int) -> float:
        acc = 0.0
        for d in range(s * sub, (s + 1) * sub):
            acc = acc + (row[d] - cent[d]) * (row[d] - cent[d])
        return acc

    def exact_argmin(row, s: int) -> int:
        keyed = [
            ((np.isnan(dd), dd), j)
            for j, dd in enumerate(
                exact_dist(row, cents[j], s) for j in range(k_cent)
            )
        ]
        return min(keyed)[1]

    @F.pandas_udf("array<int>")
    def codes(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="object")
        null_mask = vs.isna().to_numpy()
        stack = np.vstack(
            [
                np.zeros(dim) if none else v
                for v, none in zip(vs.to_numpy(), null_mask)
            ]
        )
        finite = np.isfinite(stack).all(axis=1)
        out = np.empty((len(vs), m_sub), dtype=np.int32)
        for s in range(m_sub):
            v_sub = stack[:, s * sub : (s + 1) * sub]
            c_sub = cents[:, s * sub : (s + 1) * sub]
            diff = v_sub[:, None, :] - c_sub[None, :, :]
            d = np.einsum("nkd,nkd->nk", diff, diff)  # n x K
            order = np.argsort(d, axis=1, kind="stable")
            best = order[:, 0]
            gap = (
                d[np.arange(len(vs)), order[:, 1]]
                - d[np.arange(len(vs)), best]
            )
            scale = (
                d[np.arange(len(vs)), order[:, 1]]
                + d[np.arange(len(vs)), best]
            )
            out[:, s] = best
            # near-ties: re-rank in the SQL's exact fold order
            for r in np.nonzero((gap <= 1e-9 * scale) & finite)[0]:
                out[r, s] = exact_argmin(stack[r], s)
        # non-finite rows: exact re-rank under Spark's NaN-greatest,
        # NaN-equals-NaN ordering
        for r in np.nonzero(~finite)[0]:
            if null_mask[r]:
                continue
            for s in range(m_sub):
                out[r, s] = exact_argmin(stack[r], s)
        # NULL vector: every comparison false -> CASE ELSE K-1
        out[null_mask, :] = k_cent - 1
        return pd.Series(list(out))

    return codes


def pq_query_lut(qv, cents, m_sub: int = M_SUB) -> list[list[float]]:
    """The query's M x K ADC lookup table computed DRIVER-SIDE with
    the SQL chains' exact left-to-right fold (one IEEE rounding per
    op in both Python and SQL, so the doubles are bit-identical to
    what the staged-SQL LUT produced). The LUT is one row of index
    metadata — computing it as a 128-column crossJoin projection cost
    more in Catalyst ANALYSIS of the 1000+-node expression tree than
    the whole corpus scan (measured: the LUT+ADC plan dominated the
    ~3.5 s warm per-query cost at sf0.1; execution is microseconds)."""
    cents = [list(c) for c in cents]
    dim = len(cents[0])
    sub = dim // m_sub
    lut: list[list[float]] = []
    for s in range(m_sub):
        row = []
        for c in cents:
            acc = 0.0
            for d in range(s * sub, (s + 1) * sub):
                acc = acc + (qv[d] - c[d]) * (qv[d] - c[d])
            row.append(acc)
        lut.append(row)
    return lut


def adc_literal_sql(lut: list[list[float]]) -> str:
    """ADC distance with the LUT inlined as double LITERALS (repr() is
    shortest-round-trip, so Spark's literal parser recovers the exact
    bits): M CASEs of K branches — a ~150-node tree, vs the staged
    form's 128 aliased 8-term chains plus a broadcast join."""
    parts = []
    for s, row in enumerate(lut):
        whens = " ".join(
            f"WHEN {j} THEN CAST({v!r} AS DOUBLE)"
            for j, v in enumerate(row)
        )
        parts.append(f"(CASE c{s} {whens} END)")
    return "(" + " + ".join(parts) + ")"
