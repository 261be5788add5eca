"""The composite training-data pipeline — the flagship of the Part C
side, fully oracle-checked end-to-end:

    quality gate -> exact dedup (keep lowest doc_id per identical
    text) -> MinHash-LSH near-dup candidates -> exact Jaccard verify
    -> drop the later (higher-id) member of each near-dup pair
    -> surviving corpus

This is the standard pre-training corpus build. Shuffle budget: one
window shuffle (exact dedup), one (band, bucket) join, one anti-join —
everything else is map-only; no stage ever touches all pairs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.dedup import (
    dedup_first_by_time,
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_signatures,
)
from .dedup_queries import (
    BANDS,
    JACCARD_THRESHOLD,
    NUM_HASHES,
    ROWS_PER_BAND,
    candidates_cte,
)
from .registry import load, register
from .text_queries import _STOP_SQL, quality_flags

_QUAL_CTE = f"""
qf AS (
  SELECT doc_id, text, lang,
         len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x != '')) AS n_tokens,
         round(CASE WHEN length(text) > 0
               THEN (length(text) - length(regexp_replace(text,
                    '[^a-z0-9 ]', '', 'g')))::DOUBLE / length(text)
               ELSE 0 END, 6) AS punct_ratio,
         round(CASE WHEN len(list_filter(regexp_split_to_array(lower(text),
                    '[^a-z0-9]+'), x -> x != '')) > 0
               THEN len(list_filter(list_filter(regexp_split_to_array(lower(text),
                    '[^a-z0-9]+'), x -> x != ''),
                    x -> list_contains({_STOP_SQL}, x)))::DOUBLE
                    / len(list_filter(regexp_split_to_array(lower(text),
                    '[^a-z0-9]+'), x -> x != ''))
               ELSE 0 END, 6) AS stopword_ratio
  FROM documents
),
qual AS (
  SELECT doc_id, text, lang, n_tokens FROM qf
  WHERE n_tokens >= 10 AND punct_ratio <= 0.1 AND stopword_ratio >= 0.01
),
uniq AS (
  SELECT doc_id, text, lang, n_tokens FROM (
    SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM qual
  ) WHERE rn = 1
)"""


@register(
    "training_data_pipeline",
    f"""
    WITH {_QUAL_CTE},
    {candidates_cte('uniq')},
    jacc AS (
      SELECT c.id_a, c.id_b,
             len(list_intersect(a.ss, b.ss))::DOUBLE
             / len(list_distinct(list_concat(a.ss, b.ss)))::DOUBLE AS j
      FROM cand c
      JOIN sh a ON a.doc_id = c.id_a
      JOIN sh b ON b.doc_id = c.id_b
    ),
    dropped AS (
      SELECT DISTINCT id_b FROM jacc WHERE round(j, 6) >= {JACCARD_THRESHOLD}
    )
    SELECT u.doc_id, u.lang, u.n_tokens
    FROM uniq u
    WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.id_b = u.doc_id)
    """,
)
def q_training_data_pipeline(spark, sf_dir):
    """Quality gate -> exact dedup -> near-dup dedup -> survivors.
    Every stage is the already-oracle-checked operator; this checks
    their composition end-to-end (the order matters: quality first so
    near-dup never hashes junk; exact dedup before LSH so identical
    texts cost one signature)."""
    docs = load(spark, sf_dir, "documents")
    qual = quality_flags(docs).filter(F.col("keep")).select(
        "doc_id", "text", "lang", "n_tokens"
    )
    uniq = dedup_first_by_time(qual, keys=["text"], time_col="doc_id")
    sigs = minhash_signatures(uniq, "text", NUM_HASHES, 3)
    cand = lsh_candidate_pairs(sigs, "doc_id", BANDS, ROWS_PER_BAND)
    near = jaccard_verify(cand, sigs, "doc_id", JACCARD_THRESHOLD)
    dropped = near.select(F.col("id_b").alias("doc_id")).distinct()
    survivors = uniq.join(dropped, "doc_id", "left_anti")
    return survivors.select("doc_id", "lang", "n_tokens")
