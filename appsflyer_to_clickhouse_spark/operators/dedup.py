"""Deduplication operators (SURVEY.md §2 Part C rows 1-2 + the
training-data near-dup family).

These are the fix for the reference's within-batch-duplicates quirk
(reference main.py:179-180 anti-joins against the *sink* but lets two
same-ID rows in one batch both insert) and the scale-out near-dup
pipeline a 100 TB training-data build needs.

Shuffle budget at scale (the design constraint for every op here):

- ``dedup_exact`` / ``dedup_first_by_time``: exactly ONE hash shuffle
  on the key (partial aggregation map-side first). No driver state.
- MinHash/SimHash signatures: ZERO shuffle — pure per-row expressions
  (see functions/text.py). The only shuffle in the LSH pipeline is the
  candidate-pair join keyed on (band, bucket-key), whose cardinality is
  #docs x #bands rows — independent of document length.
- Candidate verification (exact Jaccard / cosine) touches only the
  LSH-bucketed pairs, never all pairs: the all-pairs O(n^2) join is
  avoided by construction, which is the entire point at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import (
    lsh_band_keys,
    minhash_signature,
    shingle_digests,
    simhash32,
    tokens,
    word_shingles,
)


def dedup_exact(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Exact dedup: full-row when ``subset`` is None (deterministic),
    else keep an arbitrary row per key (prefer ``dedup_first_by_time``
    when the survivor matters). Physical plan: map-side partial
    HashAggregate -> single shuffle on the group key -> final aggregate;
    at 100 TB the partial agg removes most duplicates before the wire."""
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


def dedup_first_by_time(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Keep the earliest row per key — deterministic dedup (SURVEY.md §2
    Part C row 2). ``tiebreak`` columns break time ties so the survivor
    is unique (required for oracle-exact results). One shuffle on the
    key; rank computed within partitions, no global sort."""
    order = [F.col(time_col).asc()] + [F.col(c).asc() for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Append ``shingles`` (distinct word n-grams) and ``sig`` (MinHash
    array<string>) columns. Map-only: staged Projects, no explode, no
    shuffle — signatures for 100 TB of docs cost one pass, with each
    shingle md5-hashed exactly once (the digest stage is its own
    column so the ``num_hashes`` array_min expressions share it instead
    of re-hashing — HOFs are interpreted, no codegen CSE)."""
    sh = word_shingles(tokens(F.col(text_col)), shingle_n)
    return (
        df.withColumn("shingles", sh)
        .withColumn(
            "__digests", shingle_digests(F.col("shingles"), num_hashes // 2)
        )
        .withColumn("sig", minhash_signature(F.col("__digests"), num_hashes))
        .drop("__digests")
    )


def _in_group_pairs(ids: Column) -> Column:
    """All (a, b) pairs with a < b from a sorted id array — pure
    expression. ``ids`` is a materialized column attribute, so the
    nested lambdas only re-read it (cheap), never recompute it."""
    return F.flatten(
        F.transform(
            ids,
            lambda a, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
            ),
        )
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows: int = 2,
) -> DataFrame:
    """MinHash-LSH candidate pairs: docs sharing any band bucket.

    Explodes ``bands`` bucket keys per doc (a bands-x fanout of doc IDs
    only — signatures/text are NOT carried through the shuffle), groups
    by (band, key), and explodes in-group pairs. One aggregation
    instead of a self-join: the signature subplan is computed ONCE (a
    self-join would recompute it on both sides — Spark has no common
    subplan reuse across join inputs). Returns distinct (id_a, id_b),
    id_a < id_b. Skew note: a bucket of k near-identical docs yields
    k^2/2 pairs — bounded by duplicate-group size; collect_set keeps
    only ids, never payloads."""
    banded = sig_df.select(
        F.col(id_col),
        F.posexplode(lsh_band_keys(F.col("sig"), bands, rows)).alias(
            "band", "bucket"
        ),
    ).filter(F.col("bucket").isNotNull())
    groups = (
        banded.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    return (
        groups.select(F.explode(_in_group_pairs(F.col("ids"))).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    sig_df: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs only (never all pairs):
    join shingle arrays back by id, similarity via array_intersect /
    array_union sizes. Returns (id_a, id_b, jaccard) >= threshold."""
    sh = sig_df.select(F.col(id_col), F.col("shingles"))
    joined = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    ).cast("double")
    return (
        joined.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_signatures(
    df: DataFrame, text_col: str = "text", shingle_n: int = 3
) -> DataFrame:
    """Append a 32-bit ``simhash`` column over distinct word n-grams.
    Map-only, zero shuffle (functions/text.py:simhash32)."""
    return df.withColumn(
        "simhash", simhash32(word_shingles(tokens(F.col(text_col)), shingle_n))
    )


def simhash_near_pairs(
    sim_df: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: band the 32-bit signature into 4 bytes;
    by pigeonhole, any pair within hamming distance 3 shares at least
    one byte — group on (byte_index, byte_value), explode in-group
    pairs (signature subplan computed once — see lsh_candidate_pairs),
    then filter exact hamming via bit_count(xor). Candidate generation
    is linear in docs x 4, never all-pairs."""
    bytes_arr = F.array(
        *[
            F.shiftright(F.col("simhash"), 8 * i).bitwiseAND(F.lit(0xFF))
            for i in range(4)
        ]
    )
    banded = sim_df.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(bytes_arr).alias("byte_idx", "byte_val"),
    ).filter(F.col("simhash").isNotNull())
    groups = (
        banded.groupBy("byte_idx", "byte_val")
        .agg(
            F.sort_array(
                F.collect_set(F.struct(F.col(id_col).alias("id"), "simhash"))
            ).alias("items")
        )
        .filter(F.size("items") > 1)
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("items"),
            lambda a, i: F.transform(
                F.slice(F.col("items"), i + 2, F.size(F.col("items"))),
                lambda b: F.struct(
                    a["id"].alias("id_a"),
                    b["id"].alias("id_b"),
                    F.bit_count(a["simhash"].bitwiseXOR(b["simhash"])).alias(
                        "hamming"
                    ),
                ),
            ),
        )
    )
    return (
        groups.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"), F.col("p.hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
