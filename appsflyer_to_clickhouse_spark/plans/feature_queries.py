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


# ---------------------------------------------------------------------------
# features_target_encoding — leakage-safe K-fold out-of-fold encoding
# ---------------------------------------------------------------------------

_TE_FOLDS = 4
_TE_ALPHA = 10  # smoothing pseudo-count toward the global prior

# fold = md5('te|' || orderkey) % K — the same pure-function-of-the-row
# assignment split_train_test_hash uses, so folds are reproducible
# across engines, runs, and repartitions
_TE_FOLD_DUCK = (
    "CAST(('0x' || substr(md5('te|' || o_orderkey), 1, 15))::UBIGINT"
    f" % {_TE_FOLDS} AS BIGINT)"
)

_TE_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS y,
         {_TE_FOLD_DUCK} AS fold
  FROM orders
), cell AS (
  SELECT o_custkey, fold,
         CAST(SUM(y) AS BIGINT) AS s_cf,
         CAST(COUNT(*) AS BIGINT) AS n_cf
  FROM base GROUP BY 1, 2
), cat AS (
  SELECT o_custkey,
         CAST(SUM(s_cf) AS BIGINT) AS s_c,
         CAST(SUM(n_cf) AS BIGINT) AS n_c
  FROM cell GROUP BY 1
), tot AS (
  SELECT CAST(SUM(s_c) AS BIGINT) AS s_all,
         CAST(SUM(n_c) AS BIGINT) AS n_all
  FROM cat
)
SELECT b.o_orderkey, b.o_custkey, b.fold, b.y,
       round(
         CAST((c.s_c - COALESCE(ce.s_cf, 0)) * g.n_all
              + {_TE_ALPHA} * g.s_all AS DOUBLE)
         / CAST((c.n_c - COALESCE(ce.n_cf, 0) + {_TE_ALPHA}) * g.n_all
                AS DOUBLE),
         6
       ) AS te
FROM base b
JOIN cat c ON c.o_custkey = b.o_custkey
LEFT JOIN cell ce ON ce.o_custkey = b.o_custkey AND ce.fold = b.fold
CROSS JOIN tot g
"""


@register("features_target_encoding", _TE_ORACLE)
def q_features_target_encoding(spark, sf_dir):
    """Leakage-safe K-fold target encoding of a high-cardinality
    categorical (o_custkey, thousands of values per SF) against a binary target: each
    row's encoding is the smoothed target mean computed WITHOUT its
    own fold —
    te = (s_oof + alpha*prior) / (n_oof + alpha) — so the feature
    never sees the row's own label (the leak that makes naive target
    encoding overfit catastrophically).

    Scale shape: the heavy input collapses FIRST — one groupBy on
    (category, fold) produces a cell table of |categories| x K rows
    (KBs at any corpus size), category and global totals roll up from
    the cells without touching the data again, and everything joins
    back BROADCAST onto the row stream: one shuffle of the fact table,
    total. Exactness: the target is 0/1 so every aggregate is a
    BIGINT; the encoding is computed as ONE integer-ratio division —
    (s_oof*n_all + alpha*s_all) / ((n_oof+alpha)*n_all) — with the
    global prior folded into the integers, so both engines round the
    identical quotient (float-sum ordering never enters). Fold
    assignment is md5-derived from the row key: reproducible across
    engines, runs, and repartitions. A category seen in only one fold
    degrades to the global prior by construction (n_oof = 0)."""
    from ..functions.text import hash60

    orders = load(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_custkey",
        F.when(F.col("o_totalprice") > 150000, 1)
        .otherwise(0)
        .alias("y"),
        F.pmod(
            hash60(
                F.concat(
                    F.lit("te|"), F.col("o_orderkey").cast("string")
                )
            ),
            F.lit(_TE_FOLDS),
        )
        .cast("bigint")
        .alias("fold"),
    )
    cell = base.groupBy("o_custkey", "fold").agg(
        F.sum("y").cast("bigint").alias("s_cf"),
        F.count("*").cast("bigint").alias("n_cf"),
    )
    cat = cell.groupBy("o_custkey").agg(
        F.sum("s_cf").cast("bigint").alias("s_c"),
        F.sum("n_cf").cast("bigint").alias("n_c"),
    )
    glob = cat.agg(
        F.sum("s_c").cast("bigint").alias("s_all"),
        F.sum("n_c").cast("bigint").alias("n_all"),
    )
    te = (
        (
            (F.col("s_c") - F.coalesce(F.col("s_cf"), F.lit(0)))
            * F.col("n_all")
            + _TE_ALPHA * F.col("s_all")
        ).cast("double")
        / (
            (
                F.col("n_c")
                - F.coalesce(F.col("n_cf"), F.lit(0))
                + _TE_ALPHA
            )
            * F.col("n_all")
        ).cast("double")
    )
    return (
        base.join(F.broadcast(cat), "o_custkey")
        .join(F.broadcast(cell), ["o_custkey", "fold"], "left")
        .crossJoin(F.broadcast(glob))
        .select(
            "o_orderkey",
            "o_custkey",
            "fold",
            "y",
            F.round(te, 6).alias("te"),
        )
    )
