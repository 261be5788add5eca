"""Data-quality profiling — the pre-flight pass every large ingest
runs before heavier curation (null audit, cardinality audit, sketch
validation).

Scale shapes:

- ``profile_null_stats``: one single-row aggregate per profiled column,
  unioned. Each branch is an independent column-pruned scan (the
  parquet reader materializes ONLY that column) feeding a partial+final
  agg — one row crosses each exchange per task. Column-at-a-time beats
  an unpivot/stack profile at scale: stack multiplies the scanned bytes
  by #columns through one exchange, while independent branches
  parallelize and prune.
- ``agg_approx_distinct_bounded``: pins the HLL++ sketch against the
  exact distinct count INSIDE the query — the result row carries the
  exact counts plus booleans asserting the estimate landed within the
  configured rsd envelope, so the oracle (exact counts + TRUE) verifies
  estimate QUALITY cross-engine without requiring the engines'
  sketches to be byte-identical (they aren't: Spark is HLL++,
  DuckDB's approx_count_distinct is its own HLL).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import load, load_fanout, register

# ---------------------------------------------------------------------------
# profile_null_stats — per-column null ratio + exact cardinality
# ---------------------------------------------------------------------------

_PROFILE_COLS = ["user_id", "event_type", "value", "props"]


def _profile_branch_sql(col: str) -> str:
    return f"""
  SELECT '{col}' AS column_name,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(*) - count({col}) AS BIGINT) AS n_null,
         round((count(*) - count({col})) * 1.0 / count(*), 6) AS null_frac,
         CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct
  FROM events"""


_PROFILE_ORACLE = "\nUNION ALL\n".join(
    _profile_branch_sql(c) for c in _PROFILE_COLS
)


@register("profile_null_stats", _PROFILE_ORACLE)
def q_profile_null_stats(spark, sf_dir):
    """Column profile of the events table: row count, null count/ratio,
    exact distinct cardinality per column. One aggregate branch per
    column, unioned — each branch's scan reads only its own column
    (column pruning), so profiling N columns costs N pruned scans that
    run concurrently, not one scan multiplied N-fold through a stack
    exchange. COUNT(col) counts non-nulls, so n_null is derived without
    a CASE."""
    ev = load(spark, sf_dir, "events")
    branches = [
        ev.agg(
            F.lit(c).alias("column_name"),
            F.count("*").alias("n_rows"),
            (F.count("*") - F.count(c)).alias("n_null"),
            # try_divide: an empty table yields NULL null_frac (DuckDB
            # NULL-on-zero-divisor; ANSI `/` throws)
            F.round(
                F.try_divide(F.count("*") - F.count(c), F.count("*")), 6
            ).alias("null_frac"),
            F.count_distinct(F.col(c)).alias("n_distinct"),
        )
        for c in _PROFILE_COLS
    ]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionAll(b)
    return out


# ---------------------------------------------------------------------------
# agg_approx_distinct_bounded — HLL estimate pinned against exact
# ---------------------------------------------------------------------------

_APPROX_ORACLE = """
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS users_within_5pct,
       CAST(count(DISTINCT event_id) AS BIGINT) AS exact_events,
       TRUE AS events_within_5pct
FROM events
"""


@register("agg_approx_distinct_bounded", _APPROX_ORACLE)
def q_agg_approx_distinct_bounded(spark, sf_dir):
    """approx_count_distinct (HLL++, rsd=2%) validated against the
    exact distinct count in the same aggregate. The estimate itself is
    engine-specific (sketch hashing differs), so the cross-engine
    contract is the exact count plus a boolean that the estimate landed
    within 5% (2.5 sigma of the configured rsd). At 100 TB the approx
    path is the one that survives: a fixed-size sketch merges across
    partitions with no distinct shuffle, while exact COUNT(DISTINCT)
    re-shuffles the keyspace. The low-cardinality column (user_id,
    ~hundreds) exercises HLL's sparse/exact regime; event_id (millions
    at scale) the dense estimating regime.

    Fanned out (projected to the two profiled columns): the plan
    Expands every row once per distinct-aggregate before the partial
    aggregation, and a single-row-group input would run that whole
    blow-up plus both HLL sketch builds on one core (opt guide §2.5 —
    input skew). Sketch merges and exact distincts are
    order-independent, so the round-robin exchange cannot change the
    result."""
    ev = load_fanout(spark, sf_dir, "events", cols=["user_id", "event_id"])

    def ok(est, exact):
        # try_divide: empty input (exact=0) yields NULL, not a crash
        return (
            F.try_divide(
                F.abs(est.cast("double") - exact.cast("double")),
                exact.cast("double"),
            )
            <= 0.05
        )

    agg = ev.agg(
        F.count_distinct(F.col("user_id")).alias("exact_users"),
        F.approx_count_distinct("user_id", 0.02).alias("est_users"),
        F.count_distinct(F.col("event_id")).alias("exact_events"),
        F.approx_count_distinct("event_id", 0.02).alias("est_events"),
    )
    return agg.select(
        F.col("exact_users").cast("bigint").alias("exact_users"),
        ok(F.col("est_users"), F.col("exact_users")).alias("users_within_5pct"),
        F.col("exact_events").cast("bigint").alias("exact_events"),
        ok(F.col("est_events"), F.col("exact_events")).alias(
            "events_within_5pct"
        ),
    )


# ---------------------------------------------------------------------------
# agg_approx_quantile_bounded — KLL/GK quantile sketch pinned vs exact
# ---------------------------------------------------------------------------

_APPROX_Q_ORACLE = """
SELECT round(quantile_cont(value, 0.5)::DOUBLE, 6) AS exact_q50,
       TRUE AS q50_within_1pct,
       round(quantile_cont(value, 0.99)::DOUBLE, 6) AS exact_q99,
       TRUE AS q99_within_1pct
FROM events
"""


@register("agg_approx_quantile_bounded", _APPROX_Q_ORACLE)
def q_agg_approx_quantile_bounded(spark, sf_dir):
    """percentile_approx (Greenwald-Khanna, accuracy=10000) validated
    against the exact interpolated percentile in the same pass — the
    same estimate-quality contract as agg_approx_distinct_bounded:
    exact values cross-check the oracle, booleans pin the sketch
    within 1% relative error. At 100 TB the sketch is the only viable
    path: fixed-size state merging across partitions, while the exact
    percentile must co-locate each group's values."""
    ev = load(spark, sf_dir, "events")

    def ok(est, exact):
        return F.try_divide(F.abs(est - exact), F.abs(exact)) <= 0.01

    agg = ev.agg(
        F.expr("percentile(value, 0.5)").alias("x50"),
        F.expr("percentile_approx(value, 0.5, 10000)").alias("a50"),
        F.expr("percentile(value, 0.99)").alias("x99"),
        F.expr("percentile_approx(value, 0.99, 10000)").alias("a99"),
    )
    return agg.select(
        F.round(F.col("x50"), 6).alias("exact_q50"),
        ok(F.col("a50"), F.col("x50")).alias("q50_within_1pct"),
        F.round(F.col("x99"), 6).alias("exact_q99"),
        ok(F.col("a99"), F.col("x99")).alias("q99_within_1pct"),
    )


# ---------------------------------------------------------------------------
# agg_hll_sketch_merge — mergeable per-partition sketches
# ---------------------------------------------------------------------------

_HLL_MERGE_ORACLE = """
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_total,
       TRUE AS merged_within_5pct,
       CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days
FROM events
"""


@register("agg_hll_sketch_merge", _HLL_MERGE_ORACLE)
def q_agg_hll_sketch_merge(spark, sf_dir):
    """Sketch MERGEABILITY — the property that makes approximate
    distinct counting viable at 100 TB: per-day HLL sketches
    (hll_sketch_agg, Apache DataSketches) union into a global sketch
    (hll_union_agg) whose estimate must land within 5% of the exact
    distinct count. In production the per-partition sketches are
    STORED (a few KB per day) and any date-range's distinct count is a
    sketch union over metadata-sized state — the raw keyspace is never
    re-shuffled. The oracle pins the exact total and the bound; the
    sketch bytes themselves are engine-specific by nature."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("DAY", F.col("ts")).alias("day")).agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    merged = daily.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"),
        F.count("*").alias("n_days"),
    )
    exact = ev.agg(
        F.count_distinct(F.col("user_id")).alias("exact_total")
    )
    return (
        exact.crossJoin(F.broadcast(merged))
        .select(
            F.col("exact_total").cast("bigint").alias("exact_total"),
            (
                F.try_divide(
                    F.abs(
                        F.col("est").cast("double")
                        - F.col("exact_total").cast("double")
                    ),
                    F.col("exact_total").cast("double"),
                )
                <= 0.05
            ).alias("merged_within_5pct"),
            F.col("n_days").cast("bigint").alias("n_days"),
        )
    )


# ---------------------------------------------------------------------------
# profile_expectations — declarative data-quality checks in one pass
# ---------------------------------------------------------------------------

# each check is (name, DuckDB violation-count SQL); the Spark side
# mirrors check-for-check below. Checks are scalar aggregates over
# column-pruned scans — the expectations pattern (Deequ/Great
# Expectations) reduced to plain aggregation.
_EXPECTATIONS_ORACLE = """
  SELECT 'orders_custkey_ri' AS check_name,
         CAST(count(*) AS BIGINT) AS violations
  FROM orders o ANTI JOIN customer c ON o.o_custkey = c.c_custkey
UNION ALL
  SELECT 'lineitem_orderkey_ri',
         CAST(count(*) AS BIGINT)
  FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
  SELECT 'events_event_id_unique',
         CAST(count(*) - count(DISTINCT event_id) AS BIGINT)
  FROM events
UNION ALL
  SELECT 'lineitem_qty_range',
         CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
UNION ALL
  SELECT 'events_ts_in_window',
         CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-01 00:00:00'
                       OR ts >= TIMESTAMP '2024-03-01 00:00:00'
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM events
UNION ALL
  SELECT 'documents_nonempty',
         CAST(sum(CASE WHEN n_chars <= 0 OR text IS NULL
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM documents
"""


@register("profile_expectations", _EXPECTATIONS_ORACLE)
def q_profile_expectations(spark, sf_dir):
    """Expectations-style validation suite — referential integrity,
    key uniqueness, accepted ranges, event-time window membership,
    non-emptiness — as ONE result table of (check_name, violations).
    The production gate pattern (Deequ / Great Expectations) with no
    framework: every check is a scalar aggregate over a column-pruned
    scan, RI checks are broadcast-able anti-joins against the
    dimension's key column, and the output is rows-per-check so a
    pipeline can fail on sum(violations) > 0. At 100 TB each branch
    reads only its own columns and the branches parallelize — this is
    strictly cheaper than one wide scan feeding all checks."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    lineitem = load(spark, sf_dir, "lineitem")
    events = load(spark, sf_dir, "events")
    documents = load(spark, sf_dir, "documents")

    def one(name, df):
        return df.select(
            F.lit(name).alias("check_name"),
            F.col("violations").cast("bigint").alias("violations"),
        )

    ri_orders = one(
        "orders_custkey_ri",
        orders.join(
            customer, orders.o_custkey == customer.c_custkey, "left_anti"
        ).agg(F.count("*").alias("violations")),
    )
    ri_lineitem = one(
        "lineitem_orderkey_ri",
        lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti"
        ).agg(F.count("*").alias("violations")),
    )
    uniq = one(
        "events_event_id_unique",
        events.agg(
            (F.count("*") - F.count_distinct("event_id")).alias("violations")
        ),
    )
    qty = one(
        "lineitem_qty_range",
        lineitem.agg(
            F.sum(
                ((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50))
                .cast("int")
            ).alias("violations")
        ),
    )
    ts_win = one(
        "events_ts_in_window",
        events.agg(
            F.sum(
                (
                    (F.col("ts") < F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"))
                    | (F.col("ts") >= F.lit("2024-03-01 00:00:00").cast("timestamp_ntz"))
                ).cast("int")
            ).alias("violations")
        ),
    )
    nonempty = one(
        "documents_nonempty",
        documents.agg(
            F.sum(
                ((F.col("n_chars") <= 0) | F.col("text").isNull()).cast("int")
            ).alias("violations")
        ),
    )
    return (
        ri_orders.unionByName(ri_lineitem)
        .unionByName(uniq)
        .unionByName(qty)
        .unionByName(ts_win)
        .unionByName(nonempty)
    )


@register(
    "agg_freq_items_bounded",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           TRUE AS covered_ok
    FROM events
    GROUP BY event_type
    HAVING count(*) * 10 > (SELECT count(*) FROM events)
    """,
)
def q_agg_freq_items_bounded(spark, sf_dir):
    """Heavy-hitter sketch accuracy pin: ``df.stat.freqItems`` (the
    Karp/Misra-Gries one-pass summary) must return a SUPERSET of every
    item whose true frequency exceeds the support threshold — that is
    the algorithm's guarantee, so the query returns each exact heavy
    hitter (frequency > 10%) with a boolean asserting it appeared in
    the sketch output. The sketch result is bounded by 1/support items
    (here <= 10), so collecting it driver-side is metadata-sized by
    construction — the same shape as reading back HLL estimates. At
    100 TB the sketch is the survivable path: fixed-size per-partition
    summaries merge without shuffling the keyspace, then one exact
    confirmation pass touches only the <= 1/support candidates."""
    ev = load(spark, sf_dir, "events")
    sketch = set(ev.stat.freqItems(["event_type"], 0.1).collect()[0][0])
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n_events"))
    total = ev.agg(F.count("*").alias("__t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n_events") * 10 > F.col("__t"))
        .select(
            "event_type",
            "n_events",
            F.col("event_type").isin(list(sketch)).alias("covered_ok"),
        )
    )


# ---------------------------------------------------------------------------
# profile_drift_kl — distribution drift between ingest periods
# ---------------------------------------------------------------------------

_DRIFT_SPLIT = "2024-01-15 00:00:00"


@register(
    "profile_drift_kl",
    f"""
    WITH a AS (
      SELECT event_type, count(*) AS c FROM events
      WHERE ts < TIMESTAMP '{_DRIFT_SPLIT}' GROUP BY event_type
    ),
    b AS (
      SELECT event_type, count(*) AS c FROM events
      WHERE ts >= TIMESTAMP '{_DRIFT_SPLIT}' GROUP BY event_type
    ),
    joint AS (
      SELECT COALESCE(a.event_type, b.event_type) AS event_type,
             COALESCE(a.c, 0) AS ca, COALESCE(b.c, 0) AS cb
      FROM a FULL JOIN b ON a.event_type = b.event_type
    ),
    tot AS (
      SELECT CAST(sum(ca) AS DOUBLE) AS na,
             CAST(sum(cb) AS DOUBLE) AS nb,
             CAST(count(*) AS DOUBLE) AS k
      FROM joint
    ),
    terms AS (
      SELECT (ca + 1) / (na + k) AS p, (cb + 1) / (nb + k) AS q,
             na, nb
      FROM joint, tot
    )
    SELECT CAST(any_value(na) AS BIGINT) AS n_a,
           CAST(any_value(nb) AS BIGINT) AS n_b,
           round(CAST(sum(CAST(p * ln(p / q) AS DECIMAL(20,12)))
                      AS DOUBLE), 6) AS kl_ab,
           round(CAST(sum(CAST(q * ln(q / p) AS DECIMAL(20,12)))
                      AS DOUBLE), 6) AS kl_ba,
           round(CAST(sum(CAST(abs(p - q) AS DECIMAL(20,12)))
                      AS DOUBLE) / 2, 6) AS tvd
    FROM terms
    """,
)
def q_profile_drift_kl(spark, sf_dir):
    """Distribution drift between two ingest periods (first vs second
    half-month of events) over the event_type categorical: Laplace-
    smoothed KL divergence both directions + total variation distance
    — the monitor that catches a source silently changing mix before
    it poisons a training corpus. Two column-pruned filtered aggs, a
    category-sized full-outer join, and per-category drift terms cast
    to DECIMAL(20,12) before the final sum (order-independent — the
    text_unigram_logprob pattern), so the statistic hash-matches
    exactly. At 100 TB both period aggregates partial-combine map-side
    and everything after is category-cardinality-sized."""
    ev = load(spark, sf_dir, "events").select("ts", "event_type")
    a = (
        ev.filter(F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp"))
        .groupBy("event_type")
        .agg(F.count("*").alias("ca"))
    )
    b = (
        ev.filter(F.col("ts") >= F.lit(_DRIFT_SPLIT).cast("timestamp"))
        .groupBy("event_type")
        .agg(F.count("*").alias("cb"))
    )
    joint = (
        a.join(b, "event_type", "full")
        .select(
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    tot = joint.agg(
        F.sum("ca").cast("double").alias("na"),
        F.sum("cb").cast("double").alias("nb"),
        F.count("*").cast("double").alias("k"),
    )
    terms = joint.crossJoin(F.broadcast(tot)).select(
        ((F.col("ca") + 1) / (F.col("na") + F.col("k"))).alias("p"),
        ((F.col("cb") + 1) / (F.col("nb") + F.col("k"))).alias("q"),
        "na",
        "nb",
    )
    return terms.agg(
        F.any_value("na").cast("bigint").alias("n_a"),
        F.any_value("nb").cast("bigint").alias("n_b"),
        F.round(
            F.sum(
                (F.col("p") * F.log(F.col("p") / F.col("q"))).cast(
                    "decimal(20,12)"
                )
            ).cast("double"),
            6,
        ).alias("kl_ab"),
        F.round(
            F.sum(
                (F.col("q") * F.log(F.col("q") / F.col("p"))).cast(
                    "decimal(20,12)"
                )
            ).cast("double"),
            6,
        ).alias("kl_ba"),
        F.round(
            F.sum(F.abs(F.col("p") - F.col("q")).cast("decimal(20,12)")).cast(
                "double"
            )
            / 2,
            6,
        ).alias("tvd"),
    )


# ---------------------------------------------------------------------------
# agg_countmin_heavyhitters — mergeable CMS point estimates vs exact
# ---------------------------------------------------------------------------

_CMS_EPS = 0.001     # width ~ e/eps counters per row
_CMS_CONF = 0.99
_CMS_SEED = 42


@register(
    "agg_countmin_heavyhitters",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_exact,
           TRUE AS overestimates_ok,
           TRUE AS within_eps_ok
    FROM events GROUP BY event_type
    """,
)
def q_agg_countmin_heavyhitters(spark, sf_dir):
    """Count-min sketch completes the mergeable-sketch family (HLL
    distinct, GK quantiles, Misra-Gries heavy hitters): ONE CMS per
    day — the stored-sketch layout that answers date-range frequency
    queries from metadata-sized state — merged driver-side (sketches
    are KBs; merging them is the point), then point-estimated per
    event_type. CMS guarantees est >= exact always and
    est <= exact + eps*N with prob 1-conf; with a fixed seed the
    estimate is DETERMINISTIC, so the result row pins both bounds as
    booleans the exact-count oracle must see TRUE (the
    agg_approx_distinct_bounded pattern: estimate QUALITY is verified
    without requiring the oracle to reproduce sketch internals)."""
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "event_type"
    )
    daily = ev.groupBy("d").agg(
        F.count_min_sketch(
            "event_type",
            F.lit(float(_CMS_EPS)),
            F.lit(float(_CMS_CONF)),
            F.lit(_CMS_SEED),
        ).alias("cms")
    )
    sketches = [bytes(r.cms) for r in daily.collect()]
    exact = ev.groupBy("event_type").agg(F.count("*").alias("n_exact"))
    if not sketches:  # empty corpus: no sketches, no categories
        return exact.select(
            "event_type",
            "n_exact",
            F.lit(True).alias("overestimates_ok"),
            F.lit(True).alias("within_eps_ok"),
        )
    jcms_cls = spark._jvm.org.apache.spark.util.sketch.CountMinSketch
    merged = jcms_cls.readFrom(sketches[0])
    for b in sketches[1:]:
        merged.mergeInPlace(jcms_cls.readFrom(b))
    total_n = merged.totalCount()
    est_rows = [
        (r.event_type, int(merged.estimateCount(r.event_type)))
        for r in exact.select("event_type").collect()
    ]
    est = spark.createDataFrame(est_rows, ["event_type", "n_est"])
    slack = int(_CMS_EPS * total_n) + 1
    return exact.join(F.broadcast(est), "event_type").select(
        "event_type",
        "n_exact",
        (F.col("n_est") >= F.col("n_exact")).alias("overestimates_ok"),
        (F.col("n_est") <= F.col("n_exact") + F.lit(slack)).alias(
            "within_eps_ok"
        ),
    )


# ---------------------------------------------------------------------------
# profile_key_skew — join-key skew pre-flight
# ---------------------------------------------------------------------------


@register(
    "profile_key_skew",
    """
    WITH c AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events
      GROUP BY user_id
    ),
    tot AS (
      SELECT CAST(sum(n) AS DOUBLE) AS t, CAST(count(*) AS BIGINT) AS k,
             CAST(max(n) AS BIGINT) AS mx
      FROM c
    ),
    top10 AS (
      SELECT CAST(sum(n) AS DOUBLE) AS s FROM (
        SELECT n FROM c ORDER BY n DESC LIMIT 10
      )
    )
    SELECT CAST(tot.t AS BIGINT) AS n_rows,
           tot.k AS n_keys,
           tot.mx AS max_key_rows,
           round(top10.s / tot.t, 6) AS top10_share,
           round(CAST((SELECT sum(CAST((n / tot.t) * ln(n / tot.t)
                                       AS DECIMAL(20,12))) FROM c)
                      AS DOUBLE) * -1, 6) AS entropy
    FROM tot, top10
    """,
)
def q_profile_key_skew(spark, sf_dir):
    """Join-key skew pre-flight over events.user_id: key cardinality,
    the heaviest key's row count, the top-10 keys' share of all rows,
    and the key-distribution entropy — the numbers that decide BEFORE
    a 100 TB join whether to salt, AQE-split, or broadcast (a
    top10_share near 1 means salting; entropy near ln(k) means the
    hash partitioner is already fair). One count aggregate; the
    heavy-key probe is a 10-row TakeOrdered, tie-insensitive because a
    sum of the 10 largest VALUES doesn't depend on which tied keys
    supply them; entropy terms sum in decimal."""
    from .stage_cache import shared_stage

    # keyed shared stage, not a bare persist(): the per-key counts
    # feed three consumers (totals, top-10, entropy), and a fresh
    # persist per invocation would leak one cached frame per call
    # for the session lifetime under bench/differential sweeps
    c = shared_stage(
        spark,
        ("key_skew_counts", sf_dir),
        lambda: load(spark, sf_dir, "events")
        .select("user_id")
        .groupBy("user_id")
        .agg(F.count("*").alias("n")),
    )
    tot = c.agg(
        F.sum("n").cast("double").alias("t"),
        F.count("*").alias("k"),
        F.max("n").alias("mx"),
    )
    top10 = (
        c.orderBy(F.desc("n"))
        .limit(10)
        .agg(F.sum("n").cast("double").alias("s"))
    )
    ent = (
        c.crossJoin(F.broadcast(tot))
        .select(
            (
                (F.col("n") / F.col("t"))
                * F.log(F.col("n") / F.col("t"))
            )
            .cast("decimal(20,12)")
            .alias("term")
        )
        .agg((F.sum("term").cast("double") * -1).alias("h"))
    )
    return (
        tot.crossJoin(F.broadcast(top10))
        .crossJoin(F.broadcast(ent))
        .select(
            F.col("t").cast("bigint").alias("n_rows"),
            F.col("k").alias("n_keys"),
            F.col("mx").alias("max_key_rows"),
            F.round(F.col("s") / F.col("t"), 6).alias("top10_share"),
            F.round("h", 6).alias("entropy"),
        )
    )


# ---------------------------------------------------------------------------
# observe_write_audit — CollectMetrics: audit counters off the write pass
# ---------------------------------------------------------------------------


@register(
    "observe_write_audit",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
             AS n_purchases,
           CAST(max(user_id) AS BIGINT) AS max_user,
           CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
                AS DOUBLE) AS total_value
    FROM events
    """,
)
def q_observe_write_audit(spark, sf_dir):
    """The Observation API (df.observe -> CollectMetrics): audit
    aggregates computed DURING the consuming action's single pass —
    no second scan, no extra job — which is how a production write
    gets its row-count/invariant counters for free: observe the
    frame, write it, then read the metrics off the handle. Here the
    observed frame is driven by a count() and the observed metrics
    themselves are returned as the result, so the oracle proves the
    piggy-backed counters equal a real aggregate of the data
    (DISTINCT aggregates are disallowed inside CollectMetrics — the
    one observed-metrics restriction — so the distinct-user audit
    belongs in agg_approx_distinct_bounded's sketch instead). The
    money sum rides the usual exact-decimal fragment, making even
    the float column hash-stable. At 100 TB this replaces the
    re-scan-after-write audit pattern (ADVICE r2's doubled-pipeline
    finding) wholesale: one pass, metrics as a side channel."""
    from pyspark.sql import Observation

    ev = load(spark, sf_dir, "events")
    obs = Observation("write_audit")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
        F.max("user_id").alias("max_user"),
        F.expr(
            "CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)"
            " AS DOUBLE)"
        ).alias("total_value"),
    )
    observed.write.format("noop").mode("overwrite").save()  # the one pass
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                int(m["n_purchases"]),
                int(m["max_user"]),
                float(m["total_value"]),
            )
        ],
        "n_rows bigint, n_purchases bigint, max_user bigint, total_value double",
    )
