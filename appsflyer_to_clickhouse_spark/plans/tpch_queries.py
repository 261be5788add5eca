"""TPC-H shapes beyond q1/q3/q5 (SURVEY.md §2 relational vocabulary,
adapted to the reduced testdata star schema — no partsupp/commitdate/
shipmode columns, so q4/q11/q12 filters are re-expressed on the columns
that exist).

Each query is a distinct physical-plan shape the engine must get right
at 100 TB:

- q6  : scan-filter-aggregate with every predicate pushed to parquet —
        the plan is a zero-shuffle partial/final agg over a pruned scan.
- q7  : multi-way join where the two small dims (supplier, nation)
        broadcast and the one big⋈big join (lineitem⋈orders) is the
        only shuffle; group on derived (nation, nation, year).
- q10 : big⋈big join + high-cardinality groupBy, finished by a
        TakeOrderedAndProject top-k (no global sort materialization).
- q14 : conditional aggregate ratio (promo revenue) — single-row
        output, decimal-exact on both engines.
- q17 : self-aggregation join (per-part avg) feeding a filtered join —
        the shuffle on l_partkey is reused by Spark for both sides.
- q18 : agg-HAVING as a join filter (large orders), then enrich.
- q19 : disjunctive conjunct-groups predicate evaluated INSIDE the
        join — Catalyst extracts the common p_partkey equi-key and the
        OR-of-ANDs becomes a post-join filter, not a cartesian.
- q22 : scalar subquery threshold + NOT EXISTS anti-join with a
        pushed time filter (inactive high-balance accounts).
- q13 : outer join with the filter in the JOIN CONDITION (zero-count
        groups survive) + count-of-counts double aggregate.
- q15 : argmax-of-aggregate — the revenue view is shared-stage
        materialized once and consumed by both the join and the
        broadcast scalar max (no ReuseExchange fires otherwise).
- q16 : distinct-count expand-aggregate behind a broadcast anti-join
        exclusion and a fully-pruned dimension broadcast.
- q21 : the EXISTS/NOT-EXISTS pair collapsed into grouped aggregation
        (two keyed shuffles) instead of two correlated self-joins of
        the fact table.

Money arithmetic goes through the shared DECIMAL fragments
(relational_queries._REV et al.) so Spark and DuckDB cannot drift on
float-sum ordering.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import load, register
from .relational_queries import _REV, _money_sum

_TS = "TIMESTAMP '{}'"


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# ---------------------------------------------------------------------------
# q6 — forecast revenue change: pure pushdown scan-agg
# ---------------------------------------------------------------------------

_Q6_DISC_REV = (
    "CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(12,4))"
)

_Q6_ORACLE = f"""
SELECT {_money_sum(_Q6_DISC_REV, 'revenue')},
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@register("agg_filter_q6", _Q6_ORACLE)
def q_agg_filter_q6(spark, sf_dir):
    """TPC-H Q6: every predicate is scan-pushable (shipdate range,
    discount range, quantity bound), so the physical plan is a pruned
    parquet scan feeding a partial+final agg — one row crosses the
    exchange per task regardless of scale."""
    li = load(spark, sf_dir, "lineitem")
    f = (
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.filter(f).agg(
        F.expr(_money_sum(_Q6_DISC_REV, "revenue")),
        F.expr("CAST(COUNT(*) AS BIGINT) AS n_items"),
    )


# ---------------------------------------------------------------------------
# q7 — volume shipping between two nations
# ---------------------------------------------------------------------------

_Q7_N1, _Q7_N2 = "NATION_3", "NATION_7"

_Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
       {_money_sum(_REV, 'volume')}
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE (n1.n_name = '{_Q7_N1}' AND n2.n_name = '{_Q7_N2}')
   OR (n1.n_name = '{_Q7_N2}' AND n2.n_name = '{_Q7_N1}')
GROUP BY 1, 2, 3
"""


@register("join_volume_q7", _Q7_ORACLE)
def q_join_volume_q7(spark, sf_dir):
    """TPC-H Q7: shipping volume between two nations by year. supplier
    and nation broadcast (supplier is 1/60th of customer in TPC-H; at
    100 TB it may tip to shuffle — AQE decides, the hint is only on the
    two 25-row nation dims). lineitem⋈orders is the sole big shuffle;
    orders⋈customer shuffles on o_custkey. The disjunctive nation pair
    filter runs post-join on broadcast-local columns."""
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    n1 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ))
    pair = (
        (F.col("supp_nation") == _Q7_N1) & (F.col("cust_nation") == _Q7_N2)
    ) | ((F.col("supp_nation") == _Q7_N2) & (F.col("cust_nation") == _Q7_N1))
    joined = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("int").alias("l_year"),
    ).agg(F.expr(_money_sum(_REV, "volume")))


# ---------------------------------------------------------------------------
# q10 — returned-item customer ranking
# ---------------------------------------------------------------------------

_Q10_ORACLE = f"""
SELECT c_custkey, c_name, {_money_sum(_REV, 'revenue')},
       c_acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("join_returns_q10", _Q10_ORACLE)
def q_join_returns_q10(spark, sf_dir):
    """TPC-H Q10: which customers returned the most in a half-year.
    Both filters push to their scans before the joins; the groupBy is
    high-cardinality (per customer) but the LIMIT 20 over ORDER BY
    becomes TakeOrderedAndProject — only 20 rows per partition reach
    the driver-side heap, never a global sort."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1998-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-07-01 00:00:00"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.expr(_money_sum(_REV, "revenue")))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q14 — promo revenue ratio (conditional aggregate)
# ---------------------------------------------------------------------------

_Q14_PROMO = f"CASE WHEN p_type = 'PROMO' THEN {_REV} ELSE CAST(0 AS DECIMAL(12,4)) END"

_Q14_ORACLE = f"""
SELECT CAST(ROUND(
         100.0 * CAST(SUM({_Q14_PROMO}) AS DOUBLE)
               / CAST(SUM({_REV}) AS DOUBLE), 6) AS DOUBLE) AS promo_pct
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1998-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
"""


@register("agg_ratio_q14", _Q14_ORACLE)
def q_agg_ratio_q14(spark, sf_dir):
    """TPC-H Q14: promo revenue share for one month. part joins on its
    key — broadcast at test scale and a plain shuffle join at 100 TB
    (AQE decides; no hint). Both decimal sums happen in ONE aggregate
    pass; the ratio is computed on the two exact decimal totals, so the
    float division happens once on two exact inputs — identical in both
    engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1998-03-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-04-01 00:00:00"))
    )
    part = load(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.agg(
        F.expr(
            f"CAST(ROUND(100.0 * CAST(SUM({_Q14_PROMO}) AS DOUBLE)"
            f" / CAST(SUM({_REV}) AS DOUBLE), 6) AS DOUBLE) AS promo_pct"
        )
    )


# ---------------------------------------------------------------------------
# q17 — small-quantity orders vs per-part average
# ---------------------------------------------------------------------------

_Q17_ORACLE = f"""
WITH part_avg AS (
  SELECT l_partkey AS pk, AVG(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE)
            / 7.0, 6) AS DOUBLE) AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_small
FROM lineitem
JOIN part_avg ON l_partkey = pk
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#15'
  AND l_quantity < 0.5 * avg_qty
"""


@register("subquery_avg_q17", _Q17_ORACLE)
def q_subquery_avg_q17(spark, sf_dir):
    """TPC-H Q17: lineitems ordering less than half the part's average
    quantity. The per-part average is a groupBy on l_partkey and the
    probe side joins on the same key, so the exchange is REUSED (one
    physical shuffle of lineitem by partkey serves both subplans).
    AVG(l_quantity) sums integer-valued doubles — exact in binary, no
    rounding needed before the comparison."""
    li = load(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#15")
    return (
        li.join(part_avg, li.l_partkey == part_avg.pk)
        .join(part, li.l_partkey == part.p_partkey)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.expr(
                "CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)))"
                " AS DOUBLE) / 7.0, 6) AS DOUBLE) AS avg_yearly"
            ),
            F.expr("CAST(COUNT(*) AS BIGINT) AS n_small"),
        )
    )


# ---------------------------------------------------------------------------
# q18 — large orders (agg-HAVING as join filter)
# ---------------------------------------------------------------------------

_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey AS bk, SUM(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 120
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(ROUND(CAST(o_totalprice AS DOUBLE), 2) AS DOUBLE) AS o_totalprice,
       CAST(sum_qty AS DOUBLE) AS sum_qty
FROM big
JOIN orders ON o_orderkey = bk
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@register("having_join_q18", _Q18_ORACLE)
def q_having_join_q18(spark, sf_dir):
    """TPC-H Q18: orders whose total quantity exceeds a threshold,
    enriched with customer data. The HAVING reduces lineitem to a small
    key set BEFORE the joins — at scale the aggregated side is a tiny
    fraction of orders and AQE converts the join to broadcast at
    runtime. Top-100 via TakeOrderedAndProject."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("bk"))
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 120)
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        big.join(orders, big.bk == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice").cast("double"), 2)
            .cast("double")
            .alias("o_totalprice"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q19 — disjunctive conjunct-groups join predicate
# ---------------------------------------------------------------------------

_Q19_PRED = """
   (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
    AND l_quantity BETWEEN 1 AND 20)
OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
    AND l_quantity BETWEEN 10 AND 35)
OR (p_brand = 'Brand#2'  AND p_size BETWEEN 20 AND 50
    AND l_quantity BETWEEN 20 AND 50)
"""

_Q19_ORACLE = f"""
SELECT {_money_sum(_REV, 'revenue')},
       CAST(COUNT(*) AS BIGINT) AS n_matched
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE {_Q19_PRED}
"""


@register("join_disjunctive_q19", _Q19_ORACLE)
def q_join_disjunctive_q19(spark, sf_dir):
    """TPC-H Q19: revenue from three OR'd (brand, size, quantity)
    conjunct groups. The equi-key p_partkey is extracted by Catalyst so
    this stays a hash join with the disjunction as a post-join filter
    — never a nested-loop; the p_brand/p_size prefilter (union of the
    groups) is pushed to the part scan."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey).filter(
        F.expr(_Q19_PRED)
    )
    return joined.agg(
        F.expr(_money_sum(_REV, "revenue")),
        F.expr("CAST(COUNT(*) AS BIGINT) AS n_matched"),
    )


# ---------------------------------------------------------------------------
# q22 — inactive high-balance accounts (scalar subquery + anti join)
# ---------------------------------------------------------------------------

_Q22_ORACLE = """
WITH threshold AS (
  SELECT AVG(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0
), recent AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
)
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE), 2)
            AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg_bal FROM threshold)
  AND c_custkey NOT IN (SELECT o_custkey FROM recent)
GROUP BY c_nationkey
"""


@register("antijoin_subquery_q22", _Q22_ORACLE)
def q_antijoin_subquery_q22(spark, sf_dir):
    """TPC-H Q22 shape: high-balance customers with no recent orders,
    grouped by nation. The scalar average is one tiny aggregate
    broadcast into the filter; the NOT IN is a left-anti join against
    the date-filtered DISTINCT o_custkey set (the filter pushes to the
    orders scan, so the anti build side shrinks before the shuffle)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = (
        orders.filter(F.col("o_orderdate") >= _ts("2000-01-01 00:00:00"))
        .select("o_custkey")
        .distinct()
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    inactive = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return inactive.groupBy("c_nationkey").agg(
        F.expr("CAST(COUNT(*) AS BIGINT) AS numcust"),
        F.expr(
            "CAST(ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE), 2)"
            " AS DOUBLE) AS totacctbal"
        ),
    )


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution (count-of-counts)
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
WITH c_orders AS (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM c_orders
GROUP BY c_count
"""


@register("groupcount_dist_q13", _Q13_ORACLE)
def q_groupcount_dist_q13(spark, sf_dir):
    """TPC-H Q13: per-customer order counts (customers with zero
    surviving orders INCLUDED via the left join + count of the
    nullable key), then the distribution of those counts. The filter
    lives in the JOIN CONDITION, not a WHERE — a WHERE would silently
    turn the outer join inner and drop zero-order customers. Two-level
    aggregate: the first shuffles by custkey, the second's keyspace is
    tiny (distinct counts) so its exchange moves almost nothing."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey)
        & (orders.o_orderpriority != "1-URGENT"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# q15 — top supplier by quarterly revenue (scalar-max subquery)
# ---------------------------------------------------------------------------

_Q15_REV_SQL = f"""
  SELECT l_suppkey AS supplier_no,
         SUM({_REV}) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
"""

_Q15_ORACLE = f"""
WITH revenue AS ({_Q15_REV_SQL})
SELECT s_suppkey, s_name,
       CAST(ROUND(CAST(total_revenue AS DOUBLE), 2) AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register("scalar_max_join_q15", _Q15_ORACLE)
def q_scalar_max_join_q15(spark, sf_dir):
    """TPC-H Q15: quarterly revenue per supplier, keep the one(s) at
    the global max. The revenue view feeds BOTH the join side and the
    scalar max; left as two lazy lineages Spark recomputes the
    scan+agg for each (verified: no ReusedExchange fires, even under
    AQE — the two subplans adapt differently), so the view is
    materialized ONCE via the shared-stage persist (the classic
    'materialize the CTE between phases' answer; at 100 TB the view is
    supplier-cardinality, trivially cacheable). The max then reaches
    the comparison as a 1-row broadcast, on the exact DECIMAL revenue
    — comparing rounded doubles could tie two suppliers the decimal
    keeps distinct."""
    from .stage_cache import shared_stage

    def build_rev():
        li = load(spark, sf_dir, "lineitem")
        return (
            li.filter(
                (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
                & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
            )
            .groupBy(F.col("l_suppkey").alias("supplier_no"))
            .agg(F.expr(f"SUM({_REV}) AS total_revenue"))
        )

    rev = shared_stage(spark, ("q15_revenue", sf_dir), build_rev)
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    supp = load(spark, sf_dir, "supplier")
    return (
        supp.join(rev, supp.s_suppkey == rev.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select(
            "s_suppkey",
            "s_name",
            F.expr(
                "CAST(ROUND(CAST(total_revenue AS DOUBLE), 2) AS DOUBLE)"
                " AS total_revenue"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q16 — supplier diversity per part attribute (adapted: lineitem is the
# part-supplier relation; the testdata has no partsupp table)
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
LIMIT 30
"""


@register("distinct_suppliers_q16", _Q16_ORACLE)
def q_distinct_suppliers_q16(spark, sf_dir):
    """TPC-H Q16 on the reduced schema (lineitem stands in for
    partsupp): distinct-supplier counts per surviving (brand, type,
    size). All three part predicates prune the part scan before its
    broadcast; the complaint-supplier exclusion is a broadcast LEFT
    ANTI join (NOT IN over a subquery — null-safe here because
    s_suppkey is a key). COUNT(DISTINCT) triggers Spark's two-phase
    expand-aggregate; the top-30 orders by a total key so boundary
    ties are deterministic."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad_supp = load(spark, sf_dir, "supplier").filter(
        F.col("s_name").like("%7")
    ).select(F.col("s_suppkey").alias("l_suppkey"))
    return (
        li.join(bad_supp, "l_suppkey", "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"),
            F.asc("p_brand"),
            F.asc("p_type"),
            F.asc("p_size"),
        )
        .limit(30)
    )


# ---------------------------------------------------------------------------
# q21 — suppliers solely to blame for late multi-supplier orders
# (adapted: late = shipped >60 days after order date; the testdata has
# no commitdate/receiptdate)
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
WITH flagged AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey AND o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
), per_order AS (
  SELECT l_orderkey,
         CAST(count(*) AS BIGINT) AS n_supp,
         CAST(sum(late) AS BIGINT) AS n_late,
         max(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
  FROM flagged
  GROUP BY l_orderkey
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_order
JOIN supplier ON s_suppkey = late_supp
WHERE n_supp > 1 AND n_late = 1
GROUP BY s_name
"""


@register("exists_blame_q21", _Q21_ORACLE)
def q_exists_blame_q21(spark, sf_dir):
    """TPC-H Q21's EXISTS / NOT-EXISTS pair re-expressed as grouped
    aggregation — the scale-friendly form: instead of two correlated
    self-joins of lineitem (the textbook plan), ONE shuffle keyed
    (orderkey, suppkey) flags each supplier's lateness, a second keyed
    orderkey derives [other supplier exists] = n_supp > 1 and [no other
    late supplier] = n_late = 1, and max(CASE) recovers the single late
    supplier's key without a join back. The status filter rides the
    join condition into the orders scan."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    flagged = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"),
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("late").cast("bigint").alias("n_late"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias(
            "late_supp"
        ),
    )
    supp = load(spark, sf_dir, "supplier")
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(
            F.broadcast(supp), per_order.late_supp == supp.s_suppkey
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# q8 — national market share: the deepest feasible join tree
# ---------------------------------------------------------------------------

_Q8_FROM = "1995-01-01 00:00:00"
_Q8_TO = "1996-12-31 23:59:59"
_Q8_NATION = "NATION_3"
_Q8_TYPE = "MEDIUM"


@register(
    "join_mktshare_q8",
    f"""
    WITH vol AS (
      SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
             {_REV} AS rev,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part ON p_partkey = l_partkey AND p_type = '{_Q8_TYPE}'
      JOIN orders ON o_orderkey = l_orderkey
       AND o_orderdate >= TIMESTAMP '{_Q8_FROM}'
       AND o_orderdate <= TIMESTAMP '{_Q8_TO}'
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region ON r_regionkey = n1.n_regionkey AND r_name = 'AMERICA'
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = '{_Q8_NATION}'
                          THEN rev ELSE CAST(0 AS DECIMAL(12,4)) END)
                      AS DOUBLE)
                 / CAST(sum(rev) AS DOUBLE), 6) AS mkt_share,
           {_money_sum("rev", "total_volume")}
    FROM vol GROUP BY o_year
    """,
)
def q_join_mktshare_q8(spark, sf_dir):
    """TPC-H q8 (national market share) on the reduced schema — the
    deepest join tree the testdata supports: lineitem x orders is the
    single big-x-big shuffle; part (type-filtered), supplier, both
    nation roles, and region all BROADCAST — at any scale those dims
    are orders of magnitude below the facts, so the 8-table query
    costs one fact shuffle plus map-side probes. The customer
    enrichment rides the orders side BEFORE the fact join so the
    region filter prunes orders early. Share-of-market is a
    conditional decimal sum over the same rows as the total — one
    aggregate, no second pass; division in doubles after exact sums."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == _Q8_TYPE)
        .select("p_partkey")
    )
    ords = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= _ts(_Q8_FROM))
            & (F.col("o_orderdate") <= _ts(_Q8_TO))
        )
        .select("o_orderkey", "o_custkey", F.year("o_orderdate").cast("bigint").alias("o_year"))
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    reg = (
        load(spark, sf_dir, "region")
        .filter(F.col("r_name") == "AMERICA")
        .select("r_regionkey")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")

    american_cust = (
        cust.join(
            F.broadcast(n1), cust.c_nationkey == n1.n_nationkey
        )
        .join(F.broadcast(reg), n1.n_regionkey == reg.r_regionkey)
        .select("c_custkey")
    )
    ords_am = ords.join(
        american_cust, ords.o_custkey == american_cust.c_custkey
    ).select("o_orderkey", "o_year")
    supp_n = sup.join(F.broadcast(n2), sup.s_nationkey == n2.n2_key).select(
        "s_suppkey", "supp_nation"
    )
    rev = F.expr(_REV).alias("rev")
    vol = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(ords_am, li.l_orderkey == ords_am.o_orderkey)
        .join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .select("o_year", "supp_nation", rev)
    )
    zero = F.lit(0).cast("decimal(12,4)")
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == _Q8_NATION, F.col("rev"))
                .otherwise(zero)
            ).cast("double")
            / F.sum("rev").cast("double"),
            6,
        ).alias("mkt_share"),
        F.round(F.sum("rev").cast("double"), 2)
        .cast("double")
        .alias("total_volume"),
    )


# ---------------------------------------------------------------------------
# q2 — correlated per-group minimum (min-cost supplier)
# ---------------------------------------------------------------------------

# The reduced schema has no partsupp; (part, supplier, min shipped
# price) derived from lineitem plays its role so the SHAPE — a
# correlated scalar-subquery equality against a per-group minimum —
# is preserved exactly.
_Q2_ORACLE = """
WITH ps AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         MIN(l_extendedprice) AS cost
  FROM lineitem GROUP BY 1, 2
)
SELECT p_partkey, s_name,
       CAST(ROUND(CAST(cost AS DOUBLE), 2) AS DOUBLE) AS min_cost
FROM ps
JOIN part ON p_partkey = pk
JOIN supplier ON s_suppkey = sk
WHERE p_size <= 5
  AND cost = (SELECT MIN(ps2.cost) FROM ps ps2 WHERE ps2.pk = ps.pk)
ORDER BY p_partkey, s_name
LIMIT 100
"""


@register("correlated_min_q2", _Q2_ORACLE)
def q_correlated_min_q2(spark, sf_dir):
    """TPC-H Q2's shape on the reduced schema: for each small part,
    the supplier(s) achieving the global minimum shipped price, stated
    as a CORRELATED scalar subquery (cost = (SELECT MIN ... WHERE pk =
    outer.pk)). Catalyst decorrelates this into a per-part min
    aggregate joined back on pk — the same single extra shuffle a
    hand-written window/argmin would cost, so the declarative
    correlated form is free at scale (per-outer-row re-execution
    never happens). MIN of a double is exact (no float-sum ordering),
    so the equality join against it is engine-stable."""
    for t in ("lineitem", "part", "supplier"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"_q2_{t}")
    return spark.sql(
        _Q2_ORACLE.replace("FROM lineitem", "FROM _q2_lineitem")
        .replace("JOIN part", "JOIN _q2_part")
        .replace("JOIN supplier", "JOIN _q2_supplier")
    )


# ---------------------------------------------------------------------------
# q4 — EXISTS semi-join feeding an aggregate
# ---------------------------------------------------------------------------

# No l_commitdate/l_receiptdate in the reduced schema: "late line"
# is re-expressed as shipped more than 60 days after the order date.
_Q4_ORACLE = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("semijoin_exists_q4", _Q4_ORACLE)
def q_semijoin_exists_q4(spark, sf_dir):
    """TPC-H Q4: priority counts of orders having at least one late
    lineitem, with the EXISTS planned as a LEFT SEMI join — the probe
    emits each order at most once no matter how many lines match, so
    no post-join distinct is ever needed. The quarter filter prunes
    the orders scan before the join (PushedFilters), the correlated
    date comparison rides the semi-join as a residual condition, and
    the tiny priority-keyed aggregate follows. Distinct from q21/q22:
    this is the canonical EXISTS -> semi-join -> agg pipeline."""
    for t in ("orders", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"_q4_{t}")
    return spark.sql(
        _Q4_ORACLE.replace("FROM orders", "FROM _q4_orders")
        .replace("FROM lineitem", "FROM _q4_lineitem")
    )


# ---------------------------------------------------------------------------
# q9 — product profit by nation and year
# ---------------------------------------------------------------------------

_Q9_AMOUNT = (
    f"{_REV} - CAST(p_retailprice AS DECIMAL(12,4))"
    " * CAST(l_quantity AS DECIMAL(12,4))"
    " * CAST(0.05 AS DECIMAL(12,4))"
)

_Q9_ORACLE = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       {_money_sum(_Q9_AMOUNT, "sum_profit")}
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
ORDER BY nation, o_year DESC
"""


@register("join_profit_q9", _Q9_ORACLE)
def q_join_profit_q9(spark, sf_dir):
    """TPC-H Q9's shape (no partsupp: supply cost proxied by a
    retail-price fraction): profit per nation per year over a 5-way
    join. The physical plan the shape exists to pin: part (LIKE-
    filtered) and supplier+nation BROADCAST onto the lineitem scan —
    the part filter cuts the fact rows before the one genuinely big
    join (lineitem x orders, the only big-big shuffle) — and the
    group keys are DERIVED columns (nation name, extracted year).
    Profit stays in exact decimal until the final round."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.expr("CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)").alias(
                "o_year"
            ),
        )
        .agg(F.expr(_money_sum(_Q9_AMOUNT, "sum_profit")))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# q11 — group value share above a global-sum fraction
# ---------------------------------------------------------------------------

_Q11_VAL = (
    "SUM(CAST(l_extendedprice AS DECIMAL(12,4))"
    " * CAST(l_quantity AS DECIMAL(12,4)))"
)

_Q11_ORACLE = f"""
WITH val AS (
  SELECT l_partkey, {_Q11_VAL} AS v
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey,
       CAST(ROUND(CAST(v AS DOUBLE), 2) AS DOUBLE) AS part_value
FROM val
WHERE v > (SELECT SUM(v) * CAST(0.001 AS DECIMAL(6,4)) FROM val)
ORDER BY part_value DESC, l_partkey
LIMIT 100
"""


@register("having_share_q11", _Q11_ORACLE)
def q_having_share_q11(spark, sf_dir):
    """TPC-H Q11's shape on lineitem (no partsupp): parts whose total
    shipped value exceeds a fixed fraction of the GLOBAL total. The
    per-part aggregate is computed once and consumed twice — by the
    output filter and by the global-sum scalar subquery — and the
    scalar lands as a broadcast into the filter, so the fact table is
    shuffled exactly once. The share threshold is exact decimal
    arithmetic on both engines; a strict > on exact decimals cannot
    flake at the boundary."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_q11_lineitem")
    return spark.sql(_Q11_ORACLE.replace("FROM lineitem", "FROM _q11_lineitem"))


# ---------------------------------------------------------------------------
# q12 — conditional priority counts over a date-filtered join
# ---------------------------------------------------------------------------

# No l_shipmode: l_returnflag plays the mode column; the CASE-counted
# priority split and the date-windowed join are the Q12 shape.
_Q12_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("condcount_q12", _Q12_ORACLE)
def q_condcount_q12(spark, sf_dir):
    """TPC-H Q12's shape (l_returnflag standing in for the absent
    l_shipmode): a year-windowed fact filter pushed to the lineitem
    scan, one big-big join to orders, then CASE-conditional counts
    per flag. Pins conditional aggregation over a join: both branch
    counts come from ONE pass (no per-branch scans), and the priority
    CASE is evaluated post-join in the partial aggregate, so the
    shuffle carries three-ish rows per flag partition, not the fact
    table."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("high_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint").alias("low_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# q20 — nested IN subqueries collapsing to a semi-join chain
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
SELECT s_name,
       CAST(ROUND(CAST(s_acctbal AS DOUBLE), 2) AS DOUBLE) AS s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (
    SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
  )
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING SUM(l_quantity) > 50
)
ORDER BY s_name
"""


@register("nested_semijoin_q20", _Q20_ORACLE)
def q_nested_semijoin_q20(spark, sf_dir):
    """TPC-H Q20: suppliers who moved real volume of a name-filtered
    part family in a year — NESTED IN subqueries, the inner one
    aggregated with HAVING. The plan this pins: the part IN collapses
    to a broadcast semi-join pruning lineitem BEFORE its aggregate,
    the HAVING reduces that to a small supplier-key set, and the
    outer IN becomes a second (broadcast) semi-join against supplier
    — a chain of semi-joins, each shrinking the data, never a
    distinct-then-inner-join rewrite materializing duplicates."""
    for t in ("supplier", "lineitem", "part"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"_q20_{t}")
    return spark.sql(
        _Q20_ORACLE.replace("FROM supplier", "FROM _q20_supplier")
        .replace("FROM lineitem", "FROM _q20_lineitem")
        .replace("FROM part", "FROM _q20_part")
    )
