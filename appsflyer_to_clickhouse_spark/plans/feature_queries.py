"""Feature-engineering ops for training pipelines: numeric scaling and
the hashing-trick featurizer — the last mile between curated corpus
rows and model-ready tensors.

Scale shapes:

- ``features_standardize``: global mean/std/min/max from ONE exact
  decimal aggregate (single row), broadcast back onto the stream — the
  scaling pass itself is map-only. The same two-phase shape works
  per-group (stats keyed by group, broadcast if small, shuffle-joined
  if not).
- ``features_hashed_ngrams``: HashingTF re-expressed deterministically:
  token -> md5 -> bucket in [0, 64), per-doc sparse (bucket, count)
  pairs. md5 is the one hash both engines share, so the bucketing —
  hence the whole feature matrix — is exactly reproducible
  cross-engine (MLlib's murmur3 HashingTF is JVM-internal). One
  exchange keyed (doc_id, bucket), cardinality bounded by docs x 64.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import load, register

# Exact decimal moment fragments, parsed by BOTH engines (the proven
# cross-engine pattern: float sums are partial-order-dependent).
_V = "CAST(value AS DECIMAL(14,6))"

_STD_STATS = (
    f"CAST(SUM({_V}) AS DOUBLE) AS s, "
    f"CAST(SUM({_V} * {_V}) AS DOUBLE) AS sq, "
    "CAST(COUNT(value) AS BIGINT) AS n, "
    "CAST(MIN(value) AS DOUBLE) AS mn, "
    "CAST(MAX(value) AS DOUBLE) AS mx"
)

_STANDARDIZE_ORACLE = f"""
WITH stats AS (
  SELECT {_STD_STATS} FROM events
)
SELECT event_id,
       round((value - s / n)
             / sqrt((n * sq - s * s) / (CAST(n AS DOUBLE) * (n - 1))),
             6) AS value_z,
       round((value - mn) / (mx - mn), 6) AS value_minmax
FROM events CROSS JOIN stats
WHERE value IS NOT NULL
"""


@register("features_standardize", _STANDARDIZE_ORACLE)
def q_features_standardize(spark, sf_dir):
    """Z-score + min-max scaling of a numeric feature. The statistics
    row comes from exact decimal sum / sum-of-squares (sample variance
    via (n*sq - s^2)/(n*(n-1)) in one fixed double expression — a
    float-summed stddev cannot hash-match cross-engine) and broadcasts
    onto the stream, so the scaling pass adds ZERO shuffles to the
    pipeline it feeds."""
    ev = load(spark, sf_dir, "events")
    stats = ev.agg(
        F.expr(f"CAST(SUM({_V}) AS DOUBLE)").alias("s"),
        F.expr(f"CAST(SUM({_V} * {_V}) AS DOUBLE)").alias("sq"),
        F.count("value").alias("n"),
        F.min("value").cast("double").alias("mn"),
        F.max("value").cast("double").alias("mx"),
    )
    s, sq, n = F.col("s"), F.col("sq"), F.col("n")
    # try_divide here too: at n == 1 the sample-variance denominator is
    # 0 and Spark's IEEE double division would yield NaN -> NaN z-score
    # where DuckDB's NULL-on-zero-divisor yields NULL (review r5; the
    # outer try_divide only guards the zero-VARIANCE case)
    std = F.sqrt(F.try_divide(n * sq - s * s, n.cast("double") * (n - 1)))
    return (
        ev.filter(F.col("value").isNotNull())
        .crossJoin(F.broadcast(stats))
        .select(
            "event_id",
            # try_divide: zero variance / constant column / empty input
            # yield NULL scalings (DuckDB NULL-on-zero-divisor) instead
            # of an ANSI divide-by-zero crash
            F.round(
                F.try_divide(F.col("value") - F.try_divide(s, n), std), 6
            ).alias("value_z"),
            F.round(
                F.try_divide(
                    F.col("value") - F.col("mn"), F.col("mx") - F.col("mn")
                ),
                6,
            ).alias("value_minmax"),
        )
    )


# ---------------------------------------------------------------------------
# features_hashed_ngrams — deterministic hashing-trick featurizer
# ---------------------------------------------------------------------------

_N_BUCKETS = 64

_HASHED_ORACLE = f"""
SELECT doc_id,
       CAST(('0x' || substr(md5(tok), 1, 15))::UBIGINT % {_N_BUCKETS}
            AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS tf
FROM (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text),
                '[^a-z0-9]+'), x -> x != '')) AS tok
  FROM documents
)
GROUP BY doc_id, bucket
"""


@register("features_hashed_ngrams", _HASHED_ORACLE)
def q_features_hashed_ngrams(spark, sf_dir):
    """Hashing-trick term featurizer (HashingTF semantics, md5-bucketed
    so both engines derive the identical feature matrix): each token
    maps to one of 64 buckets via the first 60 bits of its
    md5; per-doc (bucket, tf) pairs are the sparse feature rows a
    trainer consumes. Collisions are the accepted trade (fixed
    dimensionality, no vocabulary build, no OOV) — the vocabulary-true
    alternative is text_vocab_encode. Partial aggregation collapses
    the exploded token stream map-side; the one exchange carries at
    most docs x 64 rows."""
    from ..functions.text import tokens
    from .registry import load_fanout

    docs = load_fanout(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10)
        .cast("bigint")
        % _N_BUCKETS
    ).cast("int")
    return (
        tok.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("tf"))
    )
