"""Product-analytics vocabulary over ``events`` / ``orders``: ordered
funnels and retention cohorts — the attribution-adjacent queries an
AppsFlyer-style install pipeline feeds downstream.

Scale shapes:

- ``events_funnel``: a strictly-ordered 3-step funnel (view -> click ->
  purchase, each step at-or-after the previous) as CHAINED unbounded
  windows over one user_id partition: step N's conditional min can
  reference step N-1's window result in the same partitioning, so the
  whole funnel — all three step times, the per-user collapse, and the
  final count — runs over ONE hash exchange of the fact stream
  (pinned in test_plan_shapes; the naive iterated join-agg form plans
  SIX user_id exchanges). Unbounded frames need no per-user sort, and
  nothing is collected into per-user lists.
- ``orders_retention_cohort``: classic cohort retention. Two shuffles
  (first-order month per customer, then (cohort, offset) counts);
  the month arithmetic is integer year*12+month deltas — exact on both
  engines, no interval/float drift.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import load, register

# ---------------------------------------------------------------------------
# events_funnel — strictly-ordered step conversion
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t1
  FROM events GROUP BY user_id
), s2 AS (
  SELECT e.user_id,
         min(CASE WHEN e.event_type = 'click' AND e.ts >= s1.t1
                  THEN e.ts END) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id,
         min(CASE WHEN e.event_type = 'purchase' AND e.ts >= s2.t2
                  THEN e.ts END) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  GROUP BY e.user_id
)
SELECT CAST(count(t1) AS BIGINT) AS n_view,
       CAST(count(t2) AS BIGINT) AS n_view_click,
       CAST(count(t3) AS BIGINT) AS n_view_click_purchase,
       round(count(t2) * 1.0 / count(t1), 6) AS click_rate,
       round(count(t3) * 1.0 / count(t2), 6) AS purchase_rate
FROM s1
LEFT JOIN s2 ON s1.user_id = s2.user_id
LEFT JOIN s3 ON s1.user_id = s3.user_id
"""


@register("events_funnel", _FUNNEL_ORACLE)
def q_events_funnel(spark, sf_dir):
    """Ordered funnel: step N counts only events at-or-after the user's
    step-N-1 time (a user who clicked before ever viewing does NOT
    convert). Each step time is a conditional min WINDOW over
    partitionBy(user_id) that references the previous step's window
    result — chained windows share one partitioning, so the physical
    plan carries exactly ONE user_id exchange for the entire funnel
    (the textbook per-step join-aggregate form re-shuffles the fact
    stream per step — measured six user_id exchanges). The per-user
    groupBy collapses rows over the SAME partitioning (no new
    exchange), and COUNT of the non-null step times yields totals and
    conversion rates in one final single-row aggregate."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = W.partitionBy("user_id")
    t1 = F.min(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(w)
    stepped = ev.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") >= F.col("t1")),
            F.col("ts"),
        )
    ).over(w)
    stepped = stepped.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= F.col("t2")),
            F.col("ts"),
        )
    ).over(w)
    stepped = stepped.withColumn("t3", t3)
    per_user = stepped.groupBy("user_id").agg(
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
        F.max("t3").alias("t3"),
    )
    # try_divide: an empty corpus (or zero clickers) must yield NULL
    # rates, matching DuckDB's NULL-on-zero-divisor — ANSI `/` throws
    return per_user.agg(
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_view_click"),
        F.count("t3").alias("n_view_click_purchase"),
        F.round(F.try_divide(F.count("t2"), F.count("t1")), 6).alias(
            "click_rate"
        ),
        F.round(F.try_divide(F.count("t3"), F.count("t2")), 6).alias(
            "purchase_rate"
        ),
    )


# ---------------------------------------------------------------------------
# orders_retention_cohort — month-cohort retention triangle
# ---------------------------------------------------------------------------

_COHORT_ORACLE = """
WITH first_order AS (
  SELECT o_custkey,
         min(EXTRACT(year FROM o_orderdate) * 12
             + EXTRACT(month FROM o_orderdate)) AS cohort_ym
  FROM orders GROUP BY o_custkey
)
SELECT CAST(f.cohort_ym // 12 AS INTEGER) AS cohort_year,
       CAST(f.cohort_ym % 12 AS INTEGER) AS cohort_month0,
       CAST(EXTRACT(year FROM o.o_orderdate) * 12
            + EXTRACT(month FROM o.o_orderdate) - f.cohort_ym
            AS INTEGER) AS month_offset,
       CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_active
FROM orders o
JOIN first_order f ON o.o_custkey = f.o_custkey
GROUP BY f.cohort_ym, month_offset
"""


@register("orders_retention_cohort", _COHORT_ORACLE)
def q_orders_retention_cohort(spark, sf_dir):
    """Cohort retention triangle: customers bucketed by first-order
    month, activity counted per months-since-first. The cohort key is
    integer year*12+month (exact cross-engine; month arithmetic via
    intervals or months_between drifts on day-of-month edge cases).
    first_order and the enriched aggregate both key on custkey so the
    join reuses the first shuffle; the (cohort, offset) output space is
    months^2/2 — tiny at any scale."""
    orders = load(spark, sf_dir, "orders")
    ym = (
        F.year("o_orderdate") * 12 + F.month("o_orderdate")
    ).alias("ym")
    first = orders.select("o_custkey", ym).groupBy("o_custkey").agg(
        F.min("ym").alias("cohort_ym")
    )
    return (
        orders.select("o_custkey", "o_orderkey", ym)
        .join(first, "o_custkey")
        .groupBy(
            "cohort_ym",
            (F.col("ym") - F.col("cohort_ym")).cast("int").alias("month_offset"),
        )
        .agg(F.count_distinct(F.col("o_custkey")).alias("n_active"))
        .select(
            F.expr("CAST(cohort_ym DIV 12 AS INTEGER) AS cohort_year"),
            F.expr("CAST(cohort_ym % 12 AS INTEGER) AS cohort_month0"),
            "month_offset",
            "n_active",
        )
    )


# ---------------------------------------------------------------------------
# scd2_change_intervals — slowly-changing-dimension type-2 build
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
), changes AS (
  SELECT user_id, event_type, ts,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS INTEGER) AS version
  FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type, version,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
       lead(ts) OVER (PARTITION BY user_id ORDER BY version) IS NULL
         AS is_current
FROM changes
"""


@register("scd2_change_intervals", _SCD2_ORACLE)
def q_scd2_change_intervals(spark, sf_dir):
    """SCD type-2 history build: collapse each user's event stream into
    versioned [valid_from, valid_to) intervals, one row per attribute
    CHANGE (lag detects the edge; the open current version has NULL
    valid_to). The (ts, event_id) order key makes same-second edges
    deterministic. All three windows — change detection, versioning,
    interval close — partition by user_id, so the whole build rides ONE
    hash exchange of the stream; at 100 TB output size tracks change
    count, not event count, and the change filter runs before the
    second/third windows see any data."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w_ord = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w_ord))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id",
            "event_type",
            "ts",
            F.row_number().over(w_ord).cast("int").alias("version"),
        )
    )
    w_ver = W.partitionBy("user_id").orderBy("version")
    return changes.select(
        "user_id",
        "event_type",
        "version",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w_ver).alias("valid_to"),
        F.lead("ts").over(w_ver).isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# orders_rfm_segments — quartile-coded RFM customer segmentation
# ---------------------------------------------------------------------------

_RFM_REF_TS = "TIMESTAMP '1998-08-01 00:00:00'"

_RFM_ORACLE = f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
                        CAST({_RFM_REF_TS} AS DATE)) AS BIGINT) AS recency_days,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4)))
              AS DOUBLE), 2) AS DOUBLE) AS monetary
  FROM orders
  GROUP BY o_custkey
)
SELECT o_custkey, recency_days, frequency, monetary,
       CAST(ntile(4) OVER (ORDER BY recency_days ASC,  o_custkey) AS BIGINT) AS r_q,
       CAST(ntile(4) OVER (ORDER BY frequency   DESC, o_custkey) AS BIGINT) AS f_q,
       CAST(ntile(4) OVER (ORDER BY monetary    DESC, o_custkey) AS BIGINT) AS m_q
FROM per_cust
"""


@register("orders_rfm_segments", _RFM_ORACLE)
def q_orders_rfm_segments(spark, sf_dir):
    """RFM segmentation: per-customer recency (days before a fixed
    reference date — never now(), which would be nondeterministic),
    frequency, and decimal-exact monetary total, then quartile codes
    per dimension. The ntile windows are GLOBAL rankings — ntile
    assigns by row position, so each gets a total order (metric +
    custkey tiebreak). A global ntile is a single-partition window:
    fine here because its input is the per-customer AGGREGATE
    (customers, not orders); at 100 TB swap ntile for a percentile
    threshold join (approx_percentile thresholds broadcast onto the
    stream) — same output contract, no single-task stage."""
    from pyspark.sql import Window as W

    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("1998-08-01").cast("date"), F.max("o_orderdate")
        ).cast("bigint").alias("recency_days"),
        F.count("*").alias("frequency"),
        F.expr(
            "CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4)))"
            " AS DOUBLE), 2) AS DOUBLE)"
        ).alias("monetary"),
    )
    return per_cust.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4)
        .over(W.orderBy(F.asc("recency_days"), F.asc("o_custkey")))
        .cast("bigint")
        .alias("r_q"),
        F.ntile(4)
        .over(W.orderBy(F.desc("frequency"), F.asc("o_custkey")))
        .cast("bigint")
        .alias("f_q"),
        F.ntile(4)
        .over(W.orderBy(F.desc("monetary"), F.asc("o_custkey")))
        .cast("bigint")
        .alias("m_q"),
    )


# ---------------------------------------------------------------------------
# events_markov_transitions — first-order behavior transition matrix
# ---------------------------------------------------------------------------

_MARKOV_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
), pair AS (
  SELECT prev_type, event_type AS next_type,
         CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY prev_type), 6) AS p
FROM pair
"""


@register("events_markov_transitions", _MARKOV_ORACLE)
def q_events_markov_transitions(spark, sf_dir):
    """First-order transition matrix of user behavior: adjacent
    event-type pairs per user (lag over the (ts, event_id) total
    order), counted globally, normalized to row-stochastic
    probabilities. One user_id exchange for the sequencing, one
    (prev, next) aggregate whose keyspace is #types^2 — a constant —
    and the normalizing window runs over that constant-size result.
    The integer-ratio probabilities are engine-exact before
    rounding."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    pair = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").alias("n"))
    wp = W.partitionBy("prev_type")
    return pair.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wp), 6).alias("p"),
    )


# ---------------------------------------------------------------------------
# orders_pareto_concentration — cumulative revenue share (80/20 curve)
# ---------------------------------------------------------------------------

_PARETO_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS rev
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT o_custkey, rev,
         CAST(row_number() OVER (ORDER BY rev DESC, o_custkey) AS BIGINT)
           AS rnk,
         SUM(rev) OVER (ORDER BY rev DESC, o_custkey
                        ROWS UNBOUNDED PRECEDING) AS cum_rev,
         SUM(rev) OVER () AS total_rev,
         CAST(count(*) OVER () AS BIGINT) AS n_cust
  FROM per_cust
)
SELECT rnk, o_custkey,
       CAST(round(CAST(rev AS DOUBLE), 2) AS DOUBLE) AS rev,
       round(CAST(cum_rev AS DOUBLE) / CAST(total_rev AS DOUBLE), 6)
         AS cum_share,
       round(rnk * 1.0 / n_cust, 6) AS cust_share
FROM ranked
WHERE round(CAST(cum_rev AS DOUBLE) / CAST(total_rev AS DOUBLE), 6) <= 0.8
"""


@register("orders_pareto_concentration", _PARETO_ORACLE)
def q_orders_pareto_concentration(spark, sf_dir):
    """Pareto/ABC analysis: the customers whose cumulative revenue
    share stays within 80%, with each one's rank, exact-decimal
    revenue, and the cumulative/population shares — the concentration
    curve behind tiering decisions. The running sum needs a global
    order, but over the per-customer AGGREGATE (like RFM's ntile);
    decimal revenue makes cum/total engine-exact so the 80% cutoff
    can't flake on a float boundary."""
    from pyspark.sql import Window as W

    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.expr("SUM(CAST(o_totalprice AS DECIMAL(14,4)))").alias("rev")
    )
    wo = W.orderBy(F.desc("rev"), F.asc("o_custkey"))
    wall = W.partitionBy()
    ranked = per_cust.select(
        "o_custkey",
        "rev",
        F.row_number().over(wo).cast("bigint").alias("rnk"),
        F.sum("rev").over(wo.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("cum_rev"),
        F.sum("rev").over(wall).alias("total_rev"),
        F.count("*").over(wall).cast("bigint").alias("n_cust"),
    )
    cum_share = F.round(
        F.col("cum_rev").cast("double") / F.col("total_rev").cast("double"), 6
    )
    return ranked.select(
        "rnk",
        "o_custkey",
        F.expr("CAST(ROUND(CAST(rev AS DOUBLE), 2) AS DOUBLE) AS rev"),
        cum_share.alias("cum_share"),
        F.round(F.col("rnk") / F.col("n_cust"), 6).alias("cust_share"),
    ).filter(F.col("cum_share") <= 0.8)


# ---------------------------------------------------------------------------
# market_basket_copurchase — co-occurrence mining with lift
# ---------------------------------------------------------------------------

_BASKET_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM items a
  JOIN items b ON a.l_orderkey = b.l_orderkey
              AND a.l_partkey < b.l_partkey
  GROUP BY part_a, part_b
), cnt AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS c FROM items GROUP BY 1
), tot AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM items
)
SELECT part_a, part_b, n_both,
       round(n_both * 1.0 * n_orders / (ca.c * cb.c), 6) AS lift
FROM pairs
JOIN cnt ca ON ca.l_partkey = part_a
JOIN cnt cb ON cb.l_partkey = part_b
CROSS JOIN tot
ORDER BY n_both DESC, part_a ASC, part_b ASC
LIMIT 20
"""


def _basket_pairs(spark, sf_dir):
    """(part_a, part_b, n_both) co-purchase pairs via grouped in-basket
    explosion — the edge list both market_basket_copurchase and
    graph_pagerank consume, materialized once per (session, sf_dir)
    through the stage cache. Tiny at rest (distinct pairs x 3 ints)
    while the saved work — the distinct + collect_set + pair explosion
    over the full fact table — is the dominant cost of either query;
    in production this IS the co-occurrence table a pipeline writes
    before analytics and graph jobs fan out over it."""
    from ..operators.dedup import _in_group_pairs
    from .stage_cache import shared_stage

    def build():
        li = load(spark, sf_dir, "lineitem")
        # no .distinct() before the groupBy: collect_SET dedups
        # within each basket, so a prior (orderkey, partkey) distinct
        # is a second full exchange of the fact table for the same
        # baskets — one shuffle builds them directly
        baskets = li.select("l_orderkey", "l_partkey").groupBy(
            "l_orderkey"
        ).agg(
            F.sort_array(F.collect_set("l_partkey")).alias("parts")
        )
        return (
            baskets.select(
                F.explode(_in_group_pairs(F.col("parts"))).alias("p")
            )
            .select(
                F.col("p.id_a").alias("part_a"),
                F.col("p.id_b").alias("part_b"),
            )
            .groupBy("part_a", "part_b")
            .agg(F.count("*").alias("n_both"))
        )

    return shared_stage(spark, ("basket_pairs", sf_dir), build)


@register("market_basket_copurchase", _BASKET_ORACLE)
def q_market_basket_copurchase(spark, sf_dir):
    """Market-basket co-occurrence: top part pairs bought in the same
    order, with lift = P(a,b)/(P(a)P(b)). Pair generation groups each
    basket and explodes in-basket combinations — bounded by basket
    size squared (baskets are small by nature), NEVER an item-level
    self-join of the fact table; this is the same grouped in-bucket
    pair machinery the LSH dedup family uses. Per-part supports
    broadcast back onto the pair counts, and lift is an exact integer
    ratio before rounding. Top-20 under a total order."""
    li = load(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    pairs = _basket_pairs(spark, sf_dir)
    cnt = items.groupBy("l_partkey").agg(F.count("*").alias("c"))
    tot = items.agg(
        F.count_distinct(F.col("l_orderkey")).alias("n_orders")
    )
    scored = (
        pairs.join(
            F.broadcast(cnt.select(F.col("l_partkey").alias("part_a"),
                                   F.col("c").alias("ca"))),
            "part_a",
        )
        .join(
            F.broadcast(cnt.select(F.col("l_partkey").alias("part_b"),
                                   F.col("c").alias("cb"))),
            "part_b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "n_both",
            F.round(
                F.col("n_both") * F.col("n_orders") / (F.col("ca") * F.col("cb")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.desc("n_both"), F.asc("part_a"), F.asc("part_b")
    ).limit(20)


# ---------------------------------------------------------------------------
# entity_resolution_match — normalize-then-block record linkage
# ---------------------------------------------------------------------------

# gmail-style canonicalization, written once per dialect: lowercase,
# split local@domain, strip the +tag, drop dots in the local part.
_ER_NORM_SPARK = (
    "concat(replace(substring_index(substring_index(lower({c}), '@', 1),"
    " '+', 1), '.', ''), '@', substring_index(lower({c}), '@', -1))"
)
_ER_NORM_DUCK = (
    "replace(split_part(split_part(lower({c}), '@', 1), '+', 1), '.', '')"
    " || '@' || split_part(lower({c}), '@', 2)"
)

_ER_ORACLE = f"""
WITH ids AS (
  SELECT DISTINCT user_id FROM events
), crm AS (
  SELECT user_id,
         'User.' || CAST(user_id AS VARCHAR) || '+promo@Example.COM'
           AS email
  FROM ids
), billing AS (
  SELECT user_id,
         CASE WHEN user_id % 3 = 0
              THEN 'USER' || CAST(user_id AS VARCHAR) || '@example.com'
              ELSE 'other' || CAST(user_id AS VARCHAR) || '@elsewhere.net'
         END AS email
  FROM ids
)
SELECT c.user_id AS crm_id, b.user_id AS billing_id,
       {_ER_NORM_DUCK.format(c='c.email')} AS matched_key
FROM crm c
JOIN billing b
  ON {_ER_NORM_DUCK.format(c='c.email')}
   = {_ER_NORM_DUCK.format(c='b.email')}
"""


@register("entity_resolution_match", _ER_ORACLE)
def q_entity_resolution_match(spark, sf_dir):
    """Record linkage by canonicalization: two synthesized contact
    sources format the same identity differently (case, dots in the
    local part, +tags); gmail-style normalization produces the
    blocking key and the match is a plain equi-join on it — the
    normalize-then-block shape that replaces quadratic fuzzy matching
    for the deterministic tier of entity resolution (the residual
    fuzzy tier over blocked candidates is what the LSH dedup family
    already provides). Normalization is map-side; the only shuffle is
    the key join, and at scale the smaller source broadcasts."""
    ev = load(spark, sf_dir, "events")
    ids = ev.select("user_id").distinct()
    uid_s = F.col("user_id").cast("string")
    crm = ids.select(
        F.col("user_id").alias("crm_id"),
        F.concat(F.lit("User."), uid_s, F.lit("+promo@Example.COM")).alias(
            "email"
        ),
    )
    billing = ids.select(
        F.col("user_id").alias("billing_id"),
        F.when(
            F.col("user_id") % 3 == 0,
            F.concat(F.lit("USER"), uid_s, F.lit("@example.com")),
        )
        .otherwise(
            F.concat(F.lit("other"), uid_s, F.lit("@elsewhere.net"))
        )
        .alias("email"),
    )
    crm_n = crm.select(
        "crm_id", F.expr(_ER_NORM_SPARK.format(c="email")).alias("k")
    )
    bil_n = billing.select(
        "billing_id", F.expr(_ER_NORM_SPARK.format(c="email")).alias("k")
    )
    return crm_n.join(bil_n, "k").select(
        "crm_id", "billing_id", F.col("k").alias("matched_key")
    )


# ---------------------------------------------------------------------------
# graph_pagerank — centrality over the co-purchase graph
# ---------------------------------------------------------------------------

# 3 unrolled power iterations; each CTE is the same message-passing
# round the Spark loop runs: contributions pr(src)/deg(src) cast to
# DECIMAL(20,12) before the neighbor SUM (order-independent — the
# text_unigram_logprob pattern), damping floor 0.15 outside the sum.
_PAGERANK_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), prs AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM items a
  JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), edges AS (
  SELECT pa AS src, pb AS dst FROM prs
  UNION ALL
  SELECT pb AS src, pa AS dst FROM prs
), deg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src
), pr1 AS (
  SELECT e.dst AS node,
         0.15 + 0.85 * CAST(SUM(CAST(1.0 / d.deg AS DECIMAL(20,12)))
                            AS DOUBLE) AS pr
  FROM edges e JOIN deg d ON d.src = e.src GROUP BY 1
), pr2 AS (
  SELECT e.dst AS node,
         0.15 + 0.85 * CAST(SUM(CAST(p.pr / d.deg AS DECIMAL(20,12)))
                            AS DOUBLE) AS pr
  FROM edges e JOIN deg d ON d.src = e.src
  JOIN pr1 p ON p.node = e.src GROUP BY 1
), pr3 AS (
  SELECT e.dst AS node,
         0.15 + 0.85 * CAST(SUM(CAST(p.pr / d.deg AS DECIMAL(20,12)))
                            AS DOUBLE) AS pr
  FROM edges e JOIN deg d ON d.src = e.src
  JOIN pr2 p ON p.node = e.src GROUP BY 1
)
SELECT node AS part, round(pr, 6) AS pagerank FROM pr3
"""


@register("graph_pagerank", _PAGERANK_ORACLE)
def q_graph_pagerank(spark, sf_dir):
    """PageRank over the co-purchase part graph (parts are linked when
    bought in the same order) — the centrality signal a curation
    pipeline ranks canonical items/documents by. Edge generation is
    the same grouped in-basket explosion as market_basket_copurchase
    (bounded by basket size, never an item-level self-join); the
    3-iteration power loop lives in operators/graph.py:pagerank with
    per-iteration localCheckpoint and graph-sized shuffles. Fixed
    iterations + decimal contribution sums make the result an exact
    deterministic function of the graph, pinned by the unrolled-CTE
    oracle."""
    from ..operators.graph import pagerank

    prs = _basket_pairs(spark, sf_dir).select("part_a", "part_b")
    edges = prs.select(
        F.col("part_a").alias("src"), F.col("part_b").alias("dst")
    ).union(
        prs.select(F.col("part_b").alias("src"), F.col("part_a").alias("dst"))
    )
    # the union symmetrizes the edge list, so every node appears as a
    # source — pagerank can skip its edge-sized dst-distinct pass
    pr = pagerank(edges, iters=3, damping=0.85, every_node_a_source=True)
    return pr.select(
        F.col("node").alias("part"), F.round("pr", 6).alias("pagerank")
    )


# ---------------------------------------------------------------------------
# events_attribution_linear — multi-touch attribution credit
# ---------------------------------------------------------------------------


@register(
    "events_attribution_linear",
    """
    WITH conv AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), tch AS (
      SELECT user_id, ts, event_type FROM events
      WHERE event_type IN ('view', 'click')
    ), pairs AS (
      SELECT c.event_id AS conv_id, t.event_type AS channel,
             count(*) OVER (PARTITION BY c.event_id) AS n
      FROM conv c
      JOIN tch t ON t.user_id = c.user_id
                AND t.ts <= c.ts
                AND t.ts >= c.ts - INTERVAL 7 DAY
    )
    SELECT channel,
           CAST(round(CAST(sum(CAST(1.0 / n AS DECIMAL(20,12))) AS DOUBLE),
                      6) AS DOUBLE) AS credit,
           CAST(count(DISTINCT conv_id) AS BIGINT) AS touched_convs
    FROM pairs GROUP BY channel
    """,
)
def q_events_attribution_linear(spark, sf_dir):
    """Linear multi-touch attribution — the analysis the reference's
    install feed exists to enable: every purchase splits one unit of
    credit equally across that user's view/click touches in the prior
    7 days, credited to the touch channel. Conversion-touch pairing is
    a user_id equi-join with the time window as a residual predicate
    (per-user pair counts are touch-density-bounded, never corpus^2;
    at extreme per-user skew the join_range_bucketed grid applies).
    The per-conversion touch count n comes from a window over the
    SAME conv_id partitioning the join produced, and 1/n is cast to
    decimal before summing — order-independent, so the channel totals
    hash-match exactly."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("c_uid"),
        F.col("ts").alias("c_ts"),
    )
    tch = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_uid"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    pairs = conv.join(
        tch,
        (F.col("t_uid") == F.col("c_uid"))
        & (F.col("t_ts") <= F.col("c_ts"))
        & (F.col("t_ts") >= F.col("c_ts") - F.expr("INTERVAL 7 DAYS")),
    ).select(
        "conv_id",
        "channel",
        F.count("*").over(Window.partitionBy("conv_id")).alias("n"),
    )
    return pairs.groupBy("channel").agg(
        F.round(
            F.sum((F.lit(1.0) / F.col("n")).cast("decimal(20,12)")).cast(
                "double"
            ),
            6,
        ).alias("credit"),
        F.count_distinct("conv_id").alias("touched_convs"),
    )


# ---------------------------------------------------------------------------
# events_attribution_decay — time-decay multi-touch attribution
# ---------------------------------------------------------------------------


@register(
    "events_attribution_decay",
    """
    WITH conv AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), tch AS (
      SELECT user_id, ts, event_type FROM events
      WHERE event_type IN ('view', 'click')
    ), pairs AS (
      SELECT c.event_id AS conv_id, t.event_type AS channel,
             CAST(power(0.5, (epoch_us(c.ts) - epoch_us(t.ts))
                             / 86400000000.0) AS DECIMAL(20,12)) AS w
      FROM conv c
      JOIN tch t ON t.user_id = c.user_id
                AND t.ts <= c.ts
                AND t.ts >= c.ts - INTERVAL 7 DAY
    ), norm AS (
      SELECT conv_id, channel,
             CAST(CAST(w AS DOUBLE)
                  / CAST(sum(w) OVER (PARTITION BY conv_id) AS DOUBLE)
                  AS DECIMAL(20,12)) AS credit
      FROM pairs
    )
    SELECT channel,
           CAST(round(CAST(sum(credit) AS DOUBLE), 6) AS DOUBLE) AS credit
    FROM norm GROUP BY channel
    """,
)
def q_events_attribution_decay(spark, sf_dir):
    """Time-decay multi-touch attribution (half-life 1 day): a touch's
    weight halves per day of distance from the conversion, weights
    normalize to one unit of credit per conversion. Same
    join-then-window shape as the linear model; determinism layering:
    pow() results are cast to decimal BEFORE the per-conversion window
    sum (order-independent, ULP-absorbed), the normalize step divides
    the two decimals AS doubles (one fixed expression), and the
    normalized credit goes back to decimal for the channel sum."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("c_uid"),
        F.col("ts").alias("c_ts"),
    )
    tch = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_uid"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    # events.ts reads as TIMESTAMP_NTZ; unix_micros requires TIMESTAMP
    # (value-preserving cast under the pinned UTC session tz)
    delta_days = (
        F.unix_micros(F.col("c_ts").cast("timestamp"))
        - F.unix_micros(F.col("t_ts").cast("timestamp"))
    ) / F.lit(86400000000.0)
    pairs = conv.join(
        tch,
        (F.col("t_uid") == F.col("c_uid"))
        & (F.col("t_ts") <= F.col("c_ts"))
        & (F.col("t_ts") >= F.col("c_ts") - F.expr("INTERVAL 7 DAYS")),
    ).select(
        "conv_id",
        "channel",
        F.pow(F.lit(0.5), delta_days).cast("decimal(20,12)").alias("w"),
    )
    norm = pairs.select(
        "conv_id",
        "channel",
        (
            F.col("w").cast("double")
            / F.sum("w").over(Window.partitionBy("conv_id")).cast("double")
        )
        .cast("decimal(20,12)")
        .alias("credit"),
    )
    return norm.groupBy("channel").agg(
        F.round(F.sum("credit").cast("double"), 6).alias("credit")
    )


# ---------------------------------------------------------------------------
# events_rolling_dau — daily actives + trailing-7-day actives
# ---------------------------------------------------------------------------


@register(
    "events_rolling_dau",
    """
    WITH ud AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
      FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud),
    contrib AS (
      SELECT ud.d + u.i * INTERVAL 1 DAY AS target_day, ud.user_id
      FROM ud, (SELECT unnest(range(7)) AS i) u
    ),
    wau AS (
      SELECT CAST(c.target_day AS DATE) AS d,
             CAST(count(DISTINCT c.user_id) AS BIGINT) AS wau7
      FROM contrib c JOIN days ON CAST(c.target_day AS DATE) = days.d
      GROUP BY 1
    ),
    dau AS (
      SELECT d, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY d
    )
    SELECT dau.d AS day, dau.dau, wau.wau7,
           round(CAST(dau.dau AS DOUBLE) / wau.wau7, 6) AS stickiness
    FROM dau JOIN wau ON dau.d = wau.d
    """,
)
def q_events_rolling_dau(spark, sf_dir):
    """Daily / trailing-7-day active users + DAU/WAU stickiness — the
    engagement dashboard primitive. The trailing window is computed by
    CONTRIBUTION EXPLOSION, not a per-day range self-join: each
    (user, day) pair fans into the 7 target days it counts toward,
    then ONE distinct aggregation per target day — shuffle is 7x the
    distinct (user, day) pairs, independent of the window length's
    interaction with corpus size (a range join re-scans 7 days' rows
    PER day; this moves each pair once). Target days are restricted
    to observed days via a broadcast of the tiny day dimension."""
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "user_id"
    )
    ud = ev.distinct()
    days = ud.select("d").distinct()
    contrib = ud.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        F.col("d"),
        "user_id",
    ).select(F.date_add("d", F.col("i")).alias("td"), "user_id")
    wau = (
        contrib.join(
            F.broadcast(days.select(F.col("d").alias("td"))), "td"
        )
        .groupBy("td")
        .agg(F.count_distinct("user_id").alias("wau7"))
    )
    dau = ud.groupBy("d").agg(F.count("*").alias("dau"))
    return dau.join(wau, dau.d == wau.td).select(
        F.col("d").alias("day"),
        "dau",
        "wau7",
        F.round(F.col("dau").cast("double") / F.col("wau7"), 6).alias(
            "stickiness"
        ),
    )


# ---------------------------------------------------------------------------
# join_scd2_asof — fact enrichment against versioned dimension intervals
# ---------------------------------------------------------------------------


@register(
    "join_scd2_asof",
    """
    WITH dim_src AS (
      SELECT user_id, event_type, ts, event_id FROM events
      WHERE event_type IN ('view', 'click')
    ),
    ordered AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type,
             event_id
      FROM dim_src
    ),
    changes AS (
      SELECT user_id, event_type, ts,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS INTEGER)
               AS version
      FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    dim AS (
      SELECT user_id, event_type AS status, version,
             ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY version)
               AS valid_to
      FROM changes
    )
    SELECT f.event_id, f.user_id, f.ts, d.status, d.version AS status_version
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') f
    LEFT JOIN dim d
      ON d.user_id = f.user_id
     AND f.ts >= d.valid_from
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    """,
)
def q_join_scd2_asof(spark, sf_dir):
    """The temporal-dimension enrichment every warehouse needs: each
    purchase fact picks up the SCD2 status version valid AT ITS
    TIMESTAMP (user's last view/click state). Physically an equi-join
    on user_id with the interval predicate as a residual — per-user
    interval counts are change-bounded, so matched-pair fan-out tracks
    dim churn, never fact x dim; intervals half-open [from, to) so
    exactly one version matches and the join cannot duplicate facts.
    Facts before a user's first interval keep NULL status (left
    join). At extreme per-key churn the join_range_bucketed grid
    applies unchanged."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    dim_src = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", "event_type", "ts", "event_id"
    )
    w_ord = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        dim_src.withColumn("prev_type", F.lag("event_type").over(w_ord))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id",
            F.col("event_type").alias("status"),
            "ts",
            F.row_number().over(w_ord).cast("int").alias("version"),
        )
    )
    w_ver = W.partitionBy("user_id").orderBy("version")
    dim = changes.select(
        F.col("user_id").alias("d_uid"),
        "status",
        "version",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w_ver).alias("valid_to"),
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return facts.join(
        dim,
        (facts.user_id == dim.d_uid)
        & (facts.ts >= dim.valid_from)
        & (dim.valid_to.isNull() | (facts.ts < dim.valid_to)),
        "left",
    ).select(
        "event_id",
        "user_id",
        "ts",
        "status",
        F.col("version").alias("status_version"),
    )


# ---------------------------------------------------------------------------
# events_funnel_timebound — conversion windows between steps
# ---------------------------------------------------------------------------


@register(
    "events_funnel_timebound",
    """
    WITH s1 AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t1
      FROM events GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id,
             min(CASE WHEN e.event_type = 'click' AND e.ts >= s1.t1
                       AND e.ts <= s1.t1 + INTERVAL 1 DAY
                      THEN e.ts END) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id,
             min(CASE WHEN e.event_type = 'purchase' AND e.ts >= s2.t2
                       AND e.ts <= s2.t2 + INTERVAL 7 DAY
                      THEN e.ts END) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      GROUP BY e.user_id
    )
    SELECT CAST(count(t1) AS BIGINT) AS n_view,
           CAST(count(t2) AS BIGINT) AS n_click_1d,
           CAST(count(t3) AS BIGINT) AS n_purchase_7d,
           round(count(t2) * 1.0 / count(t1), 6) AS click_rate,
           round(count(t3) * 1.0 / count(t2), 6) AS purchase_rate
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
)
def q_events_funnel_timebound(spark, sf_dir):
    """The funnel as product teams actually define it: each step must
    land inside a CONVERSION WINDOW of the previous one (click within
    1 day of first view, purchase within 7 days of that click) — the
    unbounded events_funnel overstates conversion by crediting steps
    months later. Same one-exchange physics: the window bound is just
    two more predicates inside the chained conditional-min windows
    sharing the single user_id partitioning."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = W.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    stepped = ev.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click")
            & (F.col("ts") >= F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 1 DAY")),
            F.col("ts"),
        )
    ).over(w)
    stepped = stepped.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 7 DAY")),
            F.col("ts"),
        )
    ).over(w)
    stepped = stepped.withColumn("t3", t3)
    per_user = stepped.groupBy("user_id").agg(
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
        F.max("t3").alias("t3"),
    )
    return per_user.agg(
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_click_1d"),
        F.count("t3").alias("n_purchase_7d"),
        F.round(F.try_divide(F.count("t2"), F.count("t1")), 6).alias(
            "click_rate"
        ),
        F.round(F.try_divide(F.count("t3"), F.count("t2")), 6).alias(
            "purchase_rate"
        ),
    )


# ---------------------------------------------------------------------------
# events_conversion_paths — top last-3-touch paths before purchase
# ---------------------------------------------------------------------------


@register(
    "events_conversion_paths",
    """
    WITH conv AS (
      SELECT event_id AS conv_id, user_id, ts FROM events
      WHERE event_type = 'purchase'
    ), tch AS (
      SELECT user_id, ts, event_type, event_id FROM events
      WHERE event_type IN ('view', 'click')
    ), pairs AS (
      SELECT c.conv_id, t.event_type AS ch, t.ts, t.event_id AS tid
      FROM conv c
      JOIN tch t ON t.user_id = c.user_id
                AND t.ts <= c.ts
                AND t.ts >= c.ts - INTERVAL 7 DAY
    ), ranked AS (
      SELECT conv_id, ch, ts, tid,
             row_number() OVER (PARTITION BY conv_id
                                ORDER BY ts DESC, tid DESC) AS rn
      FROM pairs
    ), paths AS (
      SELECT conv_id, string_agg(ch, '>' ORDER BY ts, tid) AS path
      FROM ranked WHERE rn <= 3 GROUP BY conv_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_conversions
    FROM paths GROUP BY path
    ORDER BY n_conversions DESC, path LIMIT 10
    """,
)
def q_events_conversion_paths(spark, sf_dir):
    """Top converting paths: each purchase's LAST <=3 view/click
    touches in the prior 7 days, ordered oldest-first into a
    'view>click>click' path string, counted across conversions — the
    sequence-level view multi-touch attribution's per-channel credits
    flatten away. Pairing reuses the attribution join (user_id equi +
    time residual, touch-density-bounded); the last-3 cut is one
    window over the join's own conv_id partitioning; path assembly
    sorts each conversion's <=3 struct rows inside the row (sort_array
    — no cross-row order dependence, so the oracle's ordered
    string_agg matches exactly); top-10 under a total order."""
    ev = load(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("c_uid"),
        F.col("ts").alias("c_ts"),
    )
    tch = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_uid"),
        F.col("ts").alias("ts"),
        F.col("event_type").alias("ch"),
        F.col("event_id").alias("tid"),
    )
    from pyspark.sql import Window as W

    pairs = conv.join(
        tch,
        (conv.c_uid == tch.t_uid)
        & (tch.ts <= conv.c_ts)
        & (tch.ts >= conv.c_ts - F.expr("INTERVAL 7 DAY")),
    ).select("conv_id", "ch", "ts", "tid")
    w = W.partitionBy("conv_id").orderBy(F.desc("ts"), F.desc("tid"))
    last3 = pairs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 3
    )
    paths = last3.groupBy("conv_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("ts", "tid", "ch"))),
                lambda s: s.ch,
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_conversions"))
        .orderBy(F.desc("n_conversions"), F.asc("path"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# graph_triangle_count — degree-oriented triangle enumeration
# ---------------------------------------------------------------------------

_TRIANGLE_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), e AS (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM items a
  JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM e e1
  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
), deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e
  ) GROUP BY node
), w AS (
  SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges FROM deg
)
SELECT n_triangles, n_wedges,
       round(3.0 * n_triangles / n_wedges, 6) AS global_clustering
FROM tri, w
"""

# Broadcast ceiling for the degree-oriented adjacency table: one array
# entry per oriented edge. Byte-derived sizing (ADVICE r10): an edge
# costs ~24 B in the built hash relation (8 B node id + array/UnsafeRow
# framing), so 30M edges ≈ 720 MB resident on the DRIVER and on EVERY
# executor — sized against this repo's 16 GB driver / local-mode heap
# (~4.5% of it), not merely the 8 GB broadcast hard cap. A deployment
# with small executor heaps (e.g. 4 GB) should scale the constant to
# ~heap/20: ceiling_edges ≈ executor_heap_bytes / (24 * 20). Past the
# ceiling the SMJ fallback is the honest cost (exercised at K=64 in
# plans/r11/scaling_sf_spotcheck.md). Same pattern as graph.py's
# pagerank rank-state ceiling.
_ADJ_BROADCAST_MAX_EDGES = 30_000_000


@register("graph_triangle_count", _TRIANGLE_ORACLE)
def q_graph_triangle_count(spark, sf_dir):
    """Triangle count + global clustering coefficient over the
    co-purchase part graph — the cohesion statistic that separates a
    genuine community (near-dup product clusters, citation cliques)
    from a hub-and-spoke artifact, and the standard smoke test of any
    graph stack.

    Spark-first scale design — edge-iterator over degree-oriented
    sorted adjacency (the Latapy / Suri-Vassilvitskii family): edges
    are ORIENTED from the (degree, id)-smaller endpoint to the larger,
    so every out-neighborhood is bounded by O(sqrt m) however skewed
    the degree distribution; per-edge triangles are then
    |out(u) INTERSECT out(v)| — a MAP-SIDE array intersection after
    joining the edge list with the node-sized adjacency table twice.
    Nothing wedge-shaped is ever materialized or shuffled: the naive
    formulation (enumerate wedges, closure-join them against the edge
    list) measured 21 s at sf0.1 vs ~3 s for this one — the
    co-purchase graph is DENSE (avg degree ~120), so wedges are ~50x
    the edge count and shuffling them was the entire cost. Each
    triangle a->b, a->c, b->c in orientation order is counted exactly
    once, at edge (a,b) via c. Wedge COUNT comes straight off the
    degree table (sum C(d,2) — no enumeration). The edge list itself
    is the shared _basket_pairs stage (computed once per session
    across the three graph/basket queries). Exact: joins are
    equi-keyed on ids, counts are integers, the one float division is
    rounded identically in both engines."""
    edges = _basket_pairs(spark, sf_dir).select(
        F.col("part_a").alias("a"), F.col("part_b").alias("b")
    )
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
        # node-sized, consumed three times (two orientation joins +
        # the wedge total) — materialize once instead of re-running
        # the 2|E|-record degree aggregation per consumer
        .localCheckpoint()
    )
    # orient: src = (deg, id)-smaller endpoint; dst = larger. deg is
    # node-sized — AQE broadcasts it onto the edge scan.
    da, db = F.col("da"), F.col("db")
    # node-sized build side, explicitly broadcast under the same
    # ceiling the adjacency uses (nodes <= oriented edges) so the two
    # orientation joins never shuffle the edge list; past the ceiling
    # the planner keeps the shuffled fallback
    degb = (
        F.broadcast(deg)
        if deg.count() <= _ADJ_BROADCAST_MAX_EDGES
        else deg
    )
    with_deg = (
        edges.join(degb.withColumnRenamed("node", "a").withColumnRenamed("d", "da"), "a")
        .join(degb.withColumnRenamed("node", "b").withColumnRenamed("d", "db"), "b")
    )
    a_first = (da < db) | ((da == db) & (F.col("a") < F.col("b")))
    oriented = with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    ).localCheckpoint()  # consumed twice: adjacency build + edge scan
    adj = oriented.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs")
        # consumed twice (u-side and w-side probes) and exchange reuse
        # does not fire across AQE-replanned broadcast subtrees —
        # materialize the node-sized table once
    ).localCheckpoint()
    # Deliberate join strategy (opt guide §3.1): the adjacency table
    # holds exactly ONE array entry per oriented edge, so its size
    # tracks |E| — node-bounded row count, edge-bounded payload. Up to
    # ~30M edges (a few hundred MB framed) broadcasting it to both
    # probe joins removes BOTH edge-sized shuffles, which otherwise
    # carry every neighbor array once per incident edge (measured
    # 1.27 GB / 41M records shuffled at sf0.1 for a 1.2M-edge graph —
    # the Σ deg² blow-up the wedge ban was meant to avoid, sneaking
    # back in through the exchange). Past the ceiling, fall back to
    # the sort-merge path: at that scale the arrays no longer fit on
    # every executor and the shuffle is the honest cost. The count is
    # free — `oriented` is localCheckpoint'd.
    if oriented.count() <= _ADJ_BROADCAST_MAX_EDGES:
        adj = F.broadcast(adj)
    tri = (
        oriented.join(
            adj.select(F.col("src").alias("u"), F.col("nbrs").alias("nu")),
            F.col("src") == F.col("u"),
        )
        .join(
            # inner join is safe: an edge whose dst has no
            # out-neighbors contributes 0 triangles either way
            adj.select(F.col("src").alias("w"), F.col("nbrs").alias("nw")),
            F.col("dst") == F.col("w"),
        )
        .select(F.size(F.array_intersect("nu", "nw")).alias("t"))
        # coalesce: an empty edge set must count 0 triangles like the
        # oracle's count(*), not SUM's empty-input NULL
        .agg(
            F.coalesce(F.sum("t"), F.lit(0))
            .cast("bigint")
            .alias("n_triangles")
        )
    )
    wedge_total = deg.agg(
        F.sum(F.expr("d * (d - 1) DIV 2")).alias("n_wedges")
    )
    return (
        tri.crossJoin(wedge_total)
        .select(
            "n_triangles",
            "n_wedges",
            # try_divide: a wedge-free graph (e.g. a perfect matching)
            # must yield NULL like the oracle's 0-divisor, not IEEE NaN
            F.round(
                F.try_divide(3.0 * F.col("n_triangles"), F.col("n_wedges")),
                6,
            ).alias("global_clustering"),
        )
    )


# ---------------------------------------------------------------------------
# graph_shortest_paths — multi-source BFS hop distances (landmarks)
# ---------------------------------------------------------------------------

_SSSP_MAX_HOPS = 3

_SSSP_ORACLE = f"""
WITH RECURSIVE items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
), edges AS (
  SELECT part_a AS src, part_b AS dst FROM pairs
  UNION ALL
  SELECT part_b AS src, part_a AS dst FROM pairs
), seeds AS (
  SELECT src AS node FROM edges GROUP BY src ORDER BY src LIMIT 3
), walk(node, dist) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT e.dst, w.dist + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.dist < {_SSSP_MAX_HOPS}
)
SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
FROM walk GROUP BY node
"""


@register("graph_shortest_paths", _SSSP_ORACLE)
def q_graph_shortest_paths(spark, sf_dir):
    """Multi-source shortest hop distances (landmark BFS) over the
    co-purchase graph: from the 3 smallest part ids, the minimum hop
    count to every node within _SSSP_MAX_HOPS hops — the landmark /
    k-hop-neighborhood primitive under graph features (node
    reachability, landmark distance embeddings, blast-radius
    queries).

    Level k is distinct(neighbors(level k-1)), levels union, and a
    final groupBy-MIN picks each node's first-reached hop. Each
    frontier is MATERIALIZED (eager ``localCheckpoint`` — at most |V|
    rows of one id column, bounded by the fixed hop cap) before the
    next expansion: a fully-declarative union of level DAGs re-plans
    every prior level inside each branch (measured: 57 exchanges /
    42 scheduler jobs and a 176 M-record shuffle total at sf0.1 —
    exchange reuse does not fire across AQE-replanned union branches),
    while the checkpointed form runs each expansion exactly once —
    one pass of the persisted edge cache per hop, the same unit of
    work as a PageRank iteration — and AQE broadcasts the known-small
    frontier side so the edge list never re-shuffles. The open-radius
    variant (iterate-to-fixpoint with visited-set anti-joins) is what
    ``connected_components`` implements; a landmark feature never
    needs it. Edge list reuses the shared co-purchase stage
    (``_basket_pairs``), symmetrized. Oracle: DuckDB recursive CTE
    with UNION-dedup and MIN(dist).
    """
    pairs = _basket_pairs(spark, sf_dir).select("part_a", "part_b")
    edges = pairs.union(
        pairs.select(
            F.col("part_b").alias("part_a"),
            F.col("part_a").alias("part_b"),
        )
    ).toDF("src", "dst")
    seeds = (
        edges.select("src").distinct().orderBy("src").limit(3)
        .select(F.col("src").alias("node"))
        .localCheckpoint()
    )
    levels = [seeds.withColumn("dist", F.lit(0))]
    frontier = seeds
    for hop in range(1, _SSSP_MAX_HOPS + 1):
        frontier = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .localCheckpoint()
        )
        levels.append(frontier.withColumn("dist", F.lit(hop)))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.groupBy("node").agg(
        F.min("dist").cast("bigint").alias("dist")
    )


# ---------------------------------------------------------------------------
# orders_gini_concentration — exact Gini coefficient per segment
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
WITH o AS (
  SELECT o_orderpriority AS priority,
         CAST(o_totalprice * 100 AS BIGINT) AS cents,
         o_orderkey AS k
  FROM orders
), r AS (
  SELECT priority, cents,
         row_number() OVER (
           PARTITION BY priority ORDER BY cents, k
         ) AS i
  FROM o
), g AS (
  SELECT priority,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
         CAST(SUM(CAST(i AS DECIMAL(38,0)) * cents) AS DECIMAL(38,0))
           AS si
  FROM r GROUP BY priority
)
SELECT priority, n,
       round(
         (2.0 * CAST(si AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
           - (CAST(n AS DOUBLE) + 1) / CAST(n AS DOUBLE),
         6
       ) AS gini
FROM g
"""


@register("orders_gini_concentration", _GINI_ORACLE)
def q_orders_gini_concentration(spark, sf_dir):
    """Exact Gini coefficient of order-value concentration per
    priority segment — the canonical inequality measure next to the
    top-k share `orders_pareto_concentration` reports: gini =
    2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over the within-group value ranking.
    Exactness recipe: amounts integerize to cents (both engines
    truncate the IDENTICAL double product, so the integers agree),
    the rank uses a total order (value, then key — ties can't
    reorder), and both Σx and Σ(i·x) accumulate in DECIMAL(38,0) —
    order-independent integer sums — before ONE double expression
    evaluated identically on both sides. Plan shape: one window
    shuffle keyed by segment (the same exchange the group aggregate
    reuses — Spark plans both over one partitioning), aggregates are
    segment-count-sized. At 100 TB the ranking is the only
    data-sized step and it is exactly one sort within each
    segment's partitions."""
    from pyspark.sql import Window as W

    orders = load(spark, sf_dir, "orders")
    o = orders.select(
        F.col("o_orderpriority").alias("priority"),
        (F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.col("o_orderkey").alias("k"),
    )
    w = W.partitionBy("priority").orderBy("cents", "k")
    r = o.withColumn("i", F.row_number().over(w))
    g = r.groupBy("priority").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).cast(
            "decimal(38,0)"
        ).alias("s"),
        F.sum(
            F.col("i").cast("decimal(38,0)") * F.col("cents")
        ).cast("decimal(38,0)").alias("si"),
    )
    gini = (
        2.0 * F.col("si").cast("double")
        / (F.col("n").cast("double") * F.col("s").cast("double"))
        - (F.col("n").cast("double") + 1) / F.col("n").cast("double")
    )
    return g.select("priority", "n", F.round(gini, 6).alias("gini"))
