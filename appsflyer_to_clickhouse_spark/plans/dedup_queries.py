"""SURVEY.md §2 Part C rows 1-2 + the near-dup family, oracle-checked.

Every query here has an exact DuckDB twin: the shared hash primitive is
md5 (identical hex in both engines), tokenization/shingling is mirrored
expression-for-expression, and float similarity scores are computed
with the same formula and rounded identically before hashing
(SURVEY.md §7 risk note).

Oracle CTE fragments are generated from the same H/B/R constants the
Spark operators use, so the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.dedup import (
    dedup_exact,
    dedup_first_by_time,
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_near_pairs,
    simhash_signatures,
)
from .registry import load, register

NUM_HASHES = 8
BANDS = 4
ROWS_PER_BAND = 2
JACCARD_THRESHOLD = 0.8
MAX_HAMMING = 3

# ---------------------------------------------------------------------------
# shared DuckDB oracle fragments (mirror functions/text.py exactly)
# ---------------------------------------------------------------------------

# tokens / distinct word 3-shingles of <src>.text
def shingle_cte(src: str = "documents") -> str:
    return f"""
tk AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x != '') AS t
  FROM {src}
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN list_distinct(list_transform(range(len(t) - 2),
                   i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
              ELSE []::VARCHAR[] END AS ss
  FROM tk
)"""


_SHINGLE_CTE = shingle_cte("documents")

# Two 64-bit permutations per salted digest (hex halves) — mirrors
# functions/text.py:minhash_signature's hash family exactly.
_MIN_EXPRS = ", ".join(
    f"list_aggregate(list_transform(ss, s -> substr(md5('{i}|' || s), {lo}, 16)), 'min')"
    for i in range(NUM_HASHES // 2)
    for lo in (1, 17)
)

_BAND_KEYS = ", ".join(
    f"md5(sig[{b * ROWS_PER_BAND + 1}] || '|' || sig[{b * ROWS_PER_BAND + 2}])"
    for b in range(BANDS)
)

def candidates_cte(src: str = "documents") -> str:
    return f"""
{shingle_cte(src)},
mh AS (
  SELECT doc_id, [{_MIN_EXPRS}] AS sig FROM sh
),
banded AS (
  SELECT doc_id, u.band, ([{_BAND_KEYS}])[u.band + 1] AS bucket
  FROM mh, (SELECT unnest(range({BANDS})) AS band) u
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a
  JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
  WHERE a.bucket IS NOT NULL
)"""


_CANDIDATES_CTE = candidates_cte("documents")


# ---------------------------------------------------------------------------
# dedup_exact / dedup_first_by_time (Part C rows 1-2)
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def q_dedup_exact(spark, sf_dir):
    """Full-row exact dedup via dropDuplicates() — the fix for the
    reference's within-batch-duplicates quirk (main.py:179-180 lets two
    same-ID rows in one batch both insert). Partial-agg map-side, one
    shuffle on the row hash."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type")
    return dedup_exact(ev)


@register(
    "dedup_first_by_time",
    """
    SELECT event_id, ts, user_id, event_type
    FROM (
      SELECT event_id, ts, user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def q_dedup_first_by_time(spark, sf_dir):
    """Keep the earliest event per user — deterministic key dedup
    (SURVEY.md §2 Part C row 2). event_id tiebreak makes the survivor
    unique, so the oracle hash is exact."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    return dedup_first_by_time(
        ev, keys=["user_id"], time_col="ts", tiebreak=["event_id"]
    )


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup candidates + exact Jaccard verification
# ---------------------------------------------------------------------------


@register(
    "dedup_minhash_lsh",
    f"WITH {_CANDIDATES_CTE} SELECT id_a, id_b FROM cand",
)
def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash({NUM_HASHES} perms) + LSH(4 bands x 2 rows) candidate
    pairs over documents.text word 3-shingles. Signatures are map-only
    (zero shuffle); the only shuffle is the (band, bucket) join — never
    an all-pairs product."""
    docs = load(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "text", NUM_HASHES, 3)
    return lsh_candidate_pairs(sigs, "doc_id", BANDS, ROWS_PER_BAND)


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH {_CANDIDATES_CTE}
    SELECT id_a, id_b, jaccard FROM (
      SELECT c.id_a, c.id_b,
             round(len(list_intersect(a.ss, b.ss))::DOUBLE
                   / len(list_distinct(list_concat(a.ss, b.ss)))::DOUBLE,
                   6) AS jaccard
      FROM cand c
      JOIN sh a ON a.doc_id = c.id_a
      JOIN sh b ON b.doc_id = c.id_b
    )
    WHERE jaccard >= {JACCARD_THRESHOLD}
    """,
)
def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard computed ONLY over LSH candidates (the
    verify stage of a near-dup pipeline): intersect/union of distinct
    shingle sets, threshold {JACCARD_THRESHOLD}. At 100 TB the pair
    count is bounded by duplicate-group sizes, not n^2."""
    docs = load(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "text", NUM_HASHES, 3)
    cand = lsh_candidate_pairs(sigs, "doc_id", BANDS, ROWS_PER_BAND)
    return jaccard_verify(cand, sigs, "doc_id", JACCARD_THRESHOLD)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash_oracle_expr() -> str:
    """32-bit simhash as one SQL expression over hs (list of UBIGINT)."""
    bits = []
    for i in range(32):
        vote = (
            f"list_sum(list_transform(hs, h -> CASE WHEN (h >> {i}) & 1 = 1 "
            f"THEN 1 ELSE -1 END))"
        )
        bits.append(f"CASE WHEN {vote} > 0 THEN {2**i}::BIGINT ELSE 0::BIGINT END")
    return " + ".join(bits)


_SIMHASH_CTE = f"""
{_SHINGLE_CTE},
hv AS (
  SELECT doc_id,
         list_transform(ss, s -> ('0x' || substr(md5(s), 1, 15))::UBIGINT) AS hs
  FROM sh
),
sim AS (
  SELECT doc_id,
         CASE WHEN len(hs) > 0 THEN {_simhash_oracle_expr()}
              ELSE NULL END AS simhash
  FROM hv
)"""


@register(
    "dedup_simhash",
    f"WITH {_SIMHASH_CTE} SELECT doc_id, simhash FROM sim",
)
def q_dedup_simhash(spark, sf_dir):
    """32-bit SimHash per document over word 3-shingles (60-bit md5-
    derived item hashes, bit-vote majority). Map-only — zero shuffle;
    the whole signature is one codegen'd expression per row."""
    docs = load(spark, sf_dir, "documents")
    return simhash_signatures(docs, "text", 3).select("doc_id", "simhash")


@register(
    "dedup_simhash_pairs",
    f"""
    WITH {_SIMHASH_CTE},
    banded AS (
      SELECT doc_id, simhash, u.byte_idx,
             (simhash >> (8 * u.byte_idx)) & 255 AS byte_val
      FROM sim, (SELECT unnest(range(4)) AS byte_idx) u
      WHERE simhash IS NOT NULL
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM banded a
    JOIN banded b
      ON a.byte_idx = b.byte_idx AND a.byte_val = b.byte_val
     AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {MAX_HAMMING}
    """,
)
def q_dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs within hamming distance {MAX_HAMMING}:
    band the 32-bit signature into 4 bytes (pigeonhole guarantees a
    shared byte at distance <= 3), join on (byte_idx, byte_val), filter
    exact hamming via bit_count(xor). Linear candidate generation."""
    docs = load(spark, sf_dir, "documents")
    sims = simhash_signatures(docs, "text", 3)
    return simhash_near_pairs(sims, "doc_id", MAX_HAMMING)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (label-blocked exact verification)
# ---------------------------------------------------------------------------

_COS_THRESHOLD = 0.35


@register(
    "dedup_embedding_cosine",
    f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ),
    n AS (
      SELECT vec_id, label, v, list_dot_product(v, v) AS nn FROM e
    )
    SELECT id_a, id_b, cosine FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_dot_product(a.v, b.v) / (sqrt(a.nn) * sqrt(b.nn)),
                   6) AS cosine
      FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
    )
    WHERE cosine >= {_COS_THRESHOLD}
    """,
)
def q_dedup_embedding_cosine(spark, sf_dir):
    """Embedding near-dup pairs: exact cosine >= {_COS_THRESHOLD},
    blocked on ``label`` (the cluster key) so the join is
    per-block, never a full cross product. Dot products in double via
    zip_with+aggregate — JVM expressions, no UDF. At 100 TB the block
    key comes from an LSH/IVF assignment (see similarity_queries)."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    dot_self = F.aggregate(
        F.zip_with("v", "v", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n = emb.withColumn("nn", dot_self)
    a, b = n.alias("a"), n.alias("b")
    dot_ab = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cosine = F.round(
        dot_ab / (F.sqrt(F.col("a.nn")) * F.sqrt(F.col("b.nn"))), 6
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cosine.alias("cosine"),
        )
        .filter(F.col("cosine") >= _COS_THRESHOLD)
    )
