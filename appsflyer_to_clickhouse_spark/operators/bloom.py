"""Bloom-filter ingest pre-filter — sublinear membership state for
arriving-batch dedup.

The reference dedups an arriving batch by scanning the sink's full key
set every run (main.py:169-181 — `SELECT appsflyer_id ...` into a
Python set). That scan is proportional to HISTORY, not batch size: at
100 TB the per-run cost grows without bound. The standard fix is a
Bloom filter over historical keys: ``m`` bits of metadata-sized state
(here 64 Ki bits = 8 KiB) answer "definitely new" with zero false
negatives, so the exact (expensive) membership join runs only for the
``maybe`` keys — a set bounded by true duplicates + the filter's false
positives, both tiny fractions of a batch.

Spark-shaped state: the bitmap is a DataFrame of (word_idx, bits)
rows — at most ``m/32`` rows regardless of corpus size — built with
ONE aggregation whose map-side partial `bit_or` collapses each task's
contribution to <= m/32 rows before the shuffle. Probing broadcasts
the bitmap (KBs) onto the batch's hash positions: no shuffle touches
historical data at all.

Cross-engine determinism: bit positions come from the shared md5
``hash60`` primitive (functions/text.py:65), so DuckDB reproduces the
filter bit-for-bit: ``('0x'||substr(md5(key||'#'||i),1,15))::UBIGINT
% m``. Words are 32 bits wide so every mask/shift stays far from
signed-64 overflow in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash60

M_BITS = 1 << 16  # filter size: 64 Ki bits = 8 KiB of state
K_HASHES = 4  # bits set per key
WORD_BITS = 32  # word width; max shift 31 — no sign games in bigint


def _positions(key: Column, k: int = K_HASHES, m: int = M_BITS) -> Column:
    """array<bigint> of ``k`` md5-derived bit positions in [0, m)."""
    return F.array(
        *[hash60(F.concat(key, F.lit(f"#{i}"))) % F.lit(m) for i in range(k)]
    )


def bloom_build(
    df: DataFrame, key_col: str, k: int = K_HASHES, m: int = M_BITS
) -> DataFrame:
    """Build the (word_idx, bits) bitmap over ``df[key_col]``.

    One explode (k rows per key, k a design constant) and ONE
    aggregation keyed on word_idx: partial ``bit_or`` runs map-side, so
    the shuffle carries at most ``m/32`` rows PER TASK — the state, not
    the data. Output cardinality <= m/32 independent of corpus size.
    """
    pos = df.select(
        F.explode(_positions(F.col(key_col), k, m)).alias("p")
    )
    mask = F.call_function(
        "shiftleft", F.lit(1).cast("bigint"), (F.col("p") % WORD_BITS).cast("int")
    )
    return (
        pos.select(F.expr(f"p DIV {WORD_BITS}").alias("word_idx"),
                   mask.alias("mask"))
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    batch: DataFrame,
    bloom: DataFrame,
    key_col: str,
    k: int = K_HASHES,
    m: int = M_BITS,
) -> DataFrame:
    """Per-key membership verdict: ``bloom_maybe`` true iff all ``k``
    bits are set. False => DEFINITELY not in the corpus (no false
    negatives); true => verify exactly.

    The bitmap is broadcast (<= m/32 rows, KBs) onto the batch's
    exploded positions — probing shuffles only the batch, keyed on its
    own keys, never anything history-sized."""
    pos = batch.select(
        F.col(key_col),
        F.explode(_positions(F.col(key_col), k, m)).alias("p"),
    ).withColumn("word_idx", F.expr(f"p DIV {WORD_BITS}"))
    probed = pos.join(F.broadcast(bloom), "word_idx", "left")
    bit_set = (
        F.getbit(
            F.coalesce(F.col("bits"), F.lit(0).cast("bigint")),
            (F.col("p") % WORD_BITS).cast("int"),
        )
        == 1
    )
    return probed.groupBy(key_col).agg(
        F.bool_and(bit_set).alias("bloom_maybe")
    )


def bloom_prefilter_dedup(
    hist_keys: DataFrame, batch_keys: DataFrame, key_col: str
) -> DataFrame:
    """The full ingest pattern: probe the batch against the historical
    bloom, then run the EXACT membership join only over ``maybe`` keys.

    Returns one row per batch key: (key, bloom_maybe, is_dup). is_dup
    is exact — the Bloom no-false-negative guarantee means keys the
    filter clears skip the join entirely and are new by construction.
    The verification scans history ONCE with the batch-bounded
    maybe-set (true dups + false positives) BROADCAST onto it, so
    history is never shuffled or distinct'd — per-batch cost stays one
    map-side-filtered history pass + O(batch) work, never an
    O(history) shuffle. (The previous shape semi-joined the probe
    against hist.distinct(), which shuffled the full history key set
    every batch — exactly the cost the filter exists to remove.)"""
    bloom = bloom_build(hist_keys, key_col)
    probe = bloom_probe(batch_keys, bloom, key_col)
    maybe = probe.filter(F.col("bloom_maybe")).select(key_col)
    confirmed = (
        hist_keys.select(key_col)
        .join(F.broadcast(maybe), key_col, "leftsemi")
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
    return probe.join(confirmed, key_col, "left").select(
        F.col(key_col),
        F.col("bloom_maybe"),
        F.coalesce(F.col("_hit"), F.lit(False)).alias("is_dup"),
    )
