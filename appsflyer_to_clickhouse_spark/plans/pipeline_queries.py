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
from .curation_params import RATE_SQL as _RATE_SQL
from .curation_params import rate_column
from .curation_params import TWO60 as _TWO60
from .registry import load, load_fanout, register
from .stage_cache import shared_stage
from .text_queries import _STOP_SQL, quality_flags


def _uniq_and_sigs(spark, sf_dir):
    """The shared upstream of both composite pipelines: quality gate ->
    exact dedup (uniq) -> MinHash signatures (sigs), materialized once
    per session via the stage cache. ``source`` is always threaded
    through so training_data_pipeline and corpus_build_pipeline build
    the IDENTICAL stage (training simply doesn't select it downstream)
    — the two queries share one materialization instead of deriving
    plan-distinct twins. uniq feeds the signature path AND the survivor
    anti-join; sigs feeds candidate generation AND both verify sides;
    column pruning makes each branch's subplan distinct, so without the
    materialization ReusedExchange could not collapse them."""
    # exact dedup keyed on md5(text), not text itself: identical groups
    # (the window's partition key only needs equality), but the shuffle
    # and in-partition sort carry a 32-char key instead of the full
    # document — ~10x fewer key bytes through the exchange
    uniq = shared_stage(
        spark,
        ("pipeline_uniq", sf_dir),
        lambda: dedup_first_by_time(
            quality_flags(load_fanout(spark, sf_dir, "documents"))
            .filter(F.col("keep"))
            .select(
                "doc_id",
                "text",
                "lang",
                "source",
                "n_tokens",
                F.md5("text").alias("__tk"),
            ),
            keys=["__tk"],
            time_col="doc_id",
        ).drop("__tk"),
    )
    sigs = shared_stage(
        spark,
        ("pipeline_sigs", sf_dir),
        lambda: minhash_signatures(uniq, "text", NUM_HASHES, 3),
    )
    return uniq, sigs


def _near_dup_dropped(spark, sf_dir):
    """(uniq, sigs, dropped): the near-dup drop set — doc_ids whose
    text duplicates an earlier survivor — materialized ONCE per
    session like the upstream it derives from. All three pipeline
    consumers (training_data_pipeline, corpus_build_pipeline,
    corpus_pipeline_report) need the identical set, and the candidate
    join + Jaccard verify producing it is the pipeline family's most
    expensive stage; before this stage landed, each consumer re-ran
    it from the cached signatures (3x the banded shuffle per bench
    pass). The set itself is doc_id-sized — the cheapest possible
    thing to persist."""
    uniq, sigs = _uniq_and_sigs(spark, sf_dir)

    def build():
        cand = lsh_candidate_pairs(sigs, "doc_id", BANDS, ROWS_PER_BAND)
        near = jaccard_verify(cand, sigs, "doc_id", JACCARD_THRESHOLD)
        return near.select(F.col("id_b").alias("doc_id")).distinct()

    dropped = shared_stage(spark, ("pipeline_dropped", sf_dir), build)
    return uniq, sigs, dropped

def _qual_cte(extra_cols: str = "") -> str:
    """quality gate -> exact-dedup CTE chain; ``extra_cols`` (e.g.
    ``", source"``) threads passthrough columns to ``uniq``."""
    return f"""
qf AS (
  SELECT doc_id, text, lang{extra_cols},
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
  SELECT doc_id, text, lang{extra_cols}, n_tokens FROM qf
  WHERE n_tokens >= 10 AND punct_ratio <= 0.1 AND stopword_ratio >= 0.01
),
uniq AS (
  SELECT doc_id, text, lang{extra_cols}, n_tokens FROM (
    SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM qual
  ) WHERE rn = 1
)"""


_QUAL_CTE = _qual_cte()


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
    texts cost one signature). The quality->dedup->signature upstream
    is materialized once per session and shared with
    corpus_build_pipeline (_uniq_and_sigs), as is the near-dup drop
    set (_near_dup_dropped)."""
    uniq, _sigs, dropped = _near_dup_dropped(spark, sf_dir)
    survivors = uniq.join(dropped, "doc_id", "left_anti")
    return survivors.select("doc_id", "lang", "n_tokens")


# ---------------------------------------------------------------------------
# corpus_build_pipeline — the full curation composition
# ---------------------------------------------------------------------------

_PACK_LEN = 128  # sequence length for the packing stage
_PIPE_QUOTA = 15  # per-source cap after sampling


@register(
    "corpus_build_pipeline",
    f"""
    WITH {_qual_cte(', source')},
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
    ),
    samp AS (
      SELECT doc_id, lang, source, n_tokens FROM uniq u
      WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.id_b = u.doc_id)
        AND ('0x' || substr(md5('sample|' || doc_id), 1, 15))::UBIGINT
            / {_TWO60!r} < ({_RATE_SQL})
    ),
    quota AS (
      SELECT doc_id, lang, source, n_tokens, rank_in_source FROM (
        SELECT samp.*,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_tokens DESC, doc_id)
                 AS rank_in_source
        FROM samp
      ) WHERE rank_in_source <= {_PIPE_QUOTA}
    ),
    offs AS (
      SELECT doc_id, lang, source, n_tokens,
             coalesce(CAST(SUM(n_tokens) OVER (PARTITION BY source
                        ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS BIGINT),
                      0) AS start_off
      FROM quota
    )
    SELECT doc_id, lang, source, n_tokens,
           start_off // {_PACK_LEN} AS first_seq,
           (start_off + n_tokens - 1) // {_PACK_LEN} AS last_seq,
           start_off % {_PACK_LEN} AS offset_in_first
    FROM offs
    """,
)
def q_corpus_build_pipeline(spark, sf_dir):
    """The full corpus build: quality gate -> exact dedup -> MinHash-LSH
    near-dup dedup -> deterministic stratified sample (per-lang rates)
    -> per-source quota -> per-source sequence packing. Every stage is
    an already-oracle-checked operator; this checks the end-to-end
    composition a production pre-training data build actually runs.

    Shuffle budget on top of training_data_pipeline's (one window, one
    banded join, one anti-join): the sample is map-only, and the quota
    + packing windows share ONE additional hash shuffle on source —
    quota's partial WindowGroupLimit caps what that exchange carries.
    The quality->dedup->signature upstream AND the near-dup drop set
    are materialized once per session and shared with
    training_data_pipeline (_uniq_and_sigs, _near_dup_dropped)."""
    uniq, _sigs, dropped = _near_dup_dropped(spark, sf_dir)
    survivors = uniq.join(dropped, "doc_id", "left_anti")

    from pyspark.sql import Window

    from ..functions.text import hash60

    u = hash60(
        F.concat(F.lit("sample|"), F.col("doc_id").cast("string"))
    ) / F.lit(_TWO60)
    samp = survivors.filter(u < rate_column()).select(
        "doc_id", "lang", "source", "n_tokens"
    )

    wq = Window.partitionBy("source").orderBy(
        F.col("n_tokens").desc(), F.col("doc_id").asc()
    )
    quota = (
        samp.withColumn("rank_in_source", F.row_number().over(wq))
        .filter(F.col("rank_in_source") <= _PIPE_QUOTA)
        .drop("rank_in_source")
    )

    wp = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(wp), F.lit(0))
    offs = quota.withColumn("start_off", start)
    first_seq = F.expr(f"start_off DIV {_PACK_LEN}")
    last_seq = F.expr(f"(start_off + n_tokens - 1) DIV {_PACK_LEN}")
    return offs.select(
        "doc_id",
        "lang",
        "source",
        "n_tokens",
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        (F.col("start_off") % _PACK_LEN).alias("offset_in_first"),
    )


# ---------------------------------------------------------------------------
# corpus_pipeline_report — the per-stage accounting dashboard
# ---------------------------------------------------------------------------


@register(
    "corpus_pipeline_report",
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
    ),
    stages AS (
      SELECT '00_raw' AS stage, count(*) AS rows_out FROM documents
      UNION ALL
      SELECT '01_quality', count(*) FROM qual
      UNION ALL
      SELECT '02_exact_dedup', count(*) FROM uniq
      UNION ALL
      SELECT '03_near_dup', count(*) FROM uniq u
      WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.id_b = u.doc_id)
    )
    SELECT stage, CAST(rows_out AS BIGINT) AS rows_out,
           CAST(coalesce(lag(rows_out) OVER (ORDER BY stage) - rows_out, 0)
                AS BIGINT) AS n_dropped,
           round(CAST(rows_out AS DOUBLE)
                 / first_value(rows_out) OVER (ORDER BY stage), 6)
             AS retention
    FROM stages
    """,
)
def q_corpus_pipeline_report(spark, sf_dir):
    """The per-stage accounting every corpus build publishes next to
    its output: rows surviving each stage (raw -> quality -> exact
    dedup -> near-dup), rows dropped BY that stage, and cumulative
    retention — the number that catches a mis-tuned filter silently
    deleting a corpus (a 0.4 retention at the quality gate is a bug
    report, not a corpus). Stage counts reuse the SAME session-cached
    upstream as the composite pipelines, so the report costs four
    single-row aggregates over already-materialized stages plus the
    near-dup pair check; the 4-row window at the end is
    stage-dimension-sized, never data-sized."""
    from pyspark.sql import Window as W

    docs = load_fanout(spark, sf_dir, "documents")
    qual = quality_flags(docs).filter(F.col("keep"))
    uniq, _sigs, dropped = _near_dup_dropped(spark, sf_dir)
    survivors = uniq.join(dropped, "doc_id", "left_anti")

    def stage(label, df):
        return df.agg(
            F.lit(label).alias("stage"), F.count("*").alias("rows_out")
        )

    stages = (
        stage("00_raw", docs)
        .unionByName(stage("01_quality", qual))
        .unionByName(stage("02_exact_dedup", uniq))
        .unionByName(stage("03_near_dup", survivors))
    )
    w = W.orderBy("stage")
    return stages.select(
        "stage",
        "rows_out",
        F.coalesce(
            F.lag("rows_out").over(w) - F.col("rows_out"), F.lit(0)
        ).cast("bigint").alias("n_dropped"),
        F.round(
            F.col("rows_out").cast("double")
            / F.first("rows_out").over(w),
            6,
        ).alias("retention"),
    )
