"""Generic relational vocabulary over the TPC-H-ish star (SURVEY.md §7
step 3): joins, aggregates, windows, sorts, set ops, scalar functions.

Value-parity rules used throughout (the driver hash-compares exact
values):

- Sums of money doubles are NOT reproducible across engines (float
  addition is order-dependent), so every money aggregate goes through
  exact DECIMAL arithmetic — ``SUM(CAST(x AS DECIMAL(12,4)) ...)`` —
  then ``ROUND(CAST(... AS DOUBLE), 2)``. The expression strings are
  shared constants parsed by BOTH Spark SQL and DuckDB, so the two
  sides cannot drift.
- Integer-valued doubles (``l_quantity``) sum exactly in binary — plain
  SUM is safe.
- COUNT/ROW_NUMBER results are cast explicitly (DuckDB COUNT is BIGINT
  but SUM(int) is HUGEINT; DuckDB ROW_NUMBER is BIGINT vs Spark INT).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .registry import load, register

# Shared aggregate expression fragments (valid in Spark SQL AND DuckDB).
_REV = (
    "CAST(l_extendedprice AS DECIMAL(12,4))"
    " * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))"
)
_CHARGE = _REV + " * (CAST(1 AS DECIMAL(12,4)) + CAST(l_tax AS DECIMAL(12,4)))"


def _money_sum(expr: str, alias: str, nd: int = 2) -> str:
    return f"CAST(ROUND(CAST(SUM({expr}) AS DOUBLE), {nd}) AS DOUBLE) AS {alias}"


def _money_avg(col: str, alias: str) -> str:
    return (
        f"CAST(ROUND(CAST(SUM(CAST({col} AS DECIMAL(12,4))) AS DOUBLE)"
        f" / COUNT(*), 6) AS DOUBLE) AS {alias}"
    )


# ---------------------------------------------------------------------------
# TPC-H Q1 — the canonical pricing-summary aggregate
# ---------------------------------------------------------------------------

_Q1_AGGS = [
    "CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty",
    _money_sum("CAST(l_extendedprice AS DECIMAL(12,4))", "sum_base_price"),
    _money_sum(_REV, "sum_disc_price"),
    _money_sum(_CHARGE, "sum_charge"),
    _money_avg("l_quantity", "avg_qty"),
    _money_avg("l_extendedprice", "avg_price"),
    _money_avg("l_discount", "avg_disc"),
    "CAST(COUNT(*) AS BIGINT) AS count_order",
]

_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus, {', '.join(_Q1_AGGS)}
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("agg_groupby_q1", _Q1_ORACLE)
def q_agg_groupby_q1(spark, sf_dir):
    """TPC-H Q1 shape: scan-filter-partial agg-final agg. The filter
    pushes to parquet; the groupBy has map-side partial aggregation on
    only 6 groups, so the shuffle carries 6 rows per task at any scale."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(*[F.expr(a) for a in _Q1_AGGS])
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 — join + agg + top-k
# ---------------------------------------------------------------------------

_Q3_ORACLE = f"""
SELECT l_orderkey, {_money_sum(_REV, 'revenue')}, o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("join_agg_topk_q3", _Q3_ORACLE)
def q_join_agg_topk_q3(spark, sf_dir):
    """TPC-H Q3 shape. customer (150 rows/SF per 10k orders) broadcasts;
    lineitem⋈orders is the only shuffle. LIMIT 10 over the agg becomes
    TakeOrderedAndProject — no global sort materialization."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.expr(_money_sum(_REV, "revenue")))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# multi-way join (Q5 shape, grouped by nation)
# ---------------------------------------------------------------------------

_Q5_ORACLE = f"""
SELECT n_name, {_money_sum(_REV, 'revenue')}, CAST(COUNT(*) AS BIGINT) AS n_items
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE r_name IN ('ASIA', 'EUROPE')
GROUP BY n_name
"""


@register("join_multiway_q5", _Q5_ORACLE)
def q_join_multiway_q5(spark, sf_dir):
    """5-way star join. region/nation/customer are dimensions —
    broadcast all three so the fact⋈fact (orders⋈lineitem) is the only
    shuffle; Catalyst + AQE handle join ordering."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(F.expr(_money_sum(_REV, "revenue")), F.count("*").alias("n_items"))
    )


# ---------------------------------------------------------------------------
# window functions (window_rownum_topk registers before the join family so
# it lands inside the externally-checked 50-query window — see
# plans/__init__.py)
# ---------------------------------------------------------------------------


@register(
    "window_rownum_topk",
    """
    SELECT * FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY l_suppkey
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
             ) AS INTEGER) AS rn
      FROM lineitem
    ) WHERE rn <= 3
    """,
)
def q_window_rownum_topk(spark, sf_dir):
    """Top-3 per supplier via ROW_NUMBER — the scalable top-k-per-group
    idiom: one hash shuffle on the partition key, per-partition sort,
    early filter. Fully deterministic tiebreak."""
    li = load(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# outer / semi / anti joins
# ---------------------------------------------------------------------------


@register(
    "join_left_outer",
    """
    SELECT p_partkey, p_name,
           CAST(COALESCE(s.n_items, 0) AS BIGINT) AS n_items,
           CAST(COALESCE(s.total_qty, 0) AS DOUBLE) AS total_qty
    FROM part
    LEFT JOIN (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_items,
             SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_partkey
    ) s ON s.l_partkey = p_partkey
    """,
)
def q_join_left_outer(spark, sf_dir):
    """Left outer join against a pre-aggregated fact side. Aggregating
    BEFORE the join shrinks the shuffle to one row per part."""
    part = load(spark, sf_dir, "part")
    li_agg = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n_items"), F.sum("l_quantity").alias("total_qty"))
    )
    return part.join(li_agg, part.p_partkey == li_agg.l_partkey, "left").select(
        "p_partkey",
        "p_name",
        F.coalesce("n_items", F.lit(0)).cast("bigint").alias("n_items"),
        F.coalesce("total_qty", F.lit(0.0)).cast("double").alias("total_qty"),
    )


@register(
    "join_semi",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'F')
    """,
)
def q_join_semi(spark, sf_dir):
    """LEFT SEMI join == EXISTS. Probe side streams; no row duplication."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def q_join_anti(spark, sf_dir):
    """LEFT ANTI join == NOT EXISTS (NULL-safe, unlike NOT IN)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "window_running_sum",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE), 2) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def q_window_running_sum(spark, sf_dir):
    """Running total per customer — cumulative frame, decimal-exact."""
    orders = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    running = F.sum(F.col("o_totalprice").cast("decimal(12,4)")).over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(running.cast("double"), 2).cast("double").alias("running_spend"),
    )


@register(
    "window_lag_sessionize",
    """
    WITH gaps AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flags AS (
      SELECT user_id,
             CASE WHEN prev_ts IS NULL
                    OR date_diff('second', prev_ts, ts) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM gaps
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM flags GROUP BY user_id
    """,
)
def q_window_lag_sessionize(spark, sf_dir):
    """Sessionization: lag + gap-threshold flag + per-user session count.
    The standard batch sessionize (streaming variant uses
    session_window); one shuffle on user_id shared by window and agg."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_session = F.when(gap_s.isNull() | (gap_s > 1800), 1).otherwise(0)
    return (
        ev.select("user_id", new_session.alias("new_session"))
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("bigint").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# sort / limit / set ops
# ---------------------------------------------------------------------------


@register(
    "sort_limit_topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def q_sort_limit_topk(spark, sf_dir):
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heap of k + driver merge, never a full sort. O(n) at any scale."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "set_union",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def q_set_union(spark, sf_dir):
    nk_c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    nk_s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return nk_c.union(nk_s).distinct()


@register(
    "set_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def q_set_intersect(spark, sf_dir):
    nk_c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    nk_s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return nk_c.intersect(nk_s)


@register(
    "set_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def q_set_except(spark, sf_dir):
    nk_c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    nk_s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    # EXCEPT has DISTINCT semantics — subtract(), not exceptAll()
    return nk_c.subtract(nk_s)


# ---------------------------------------------------------------------------
# grouping sets / pivot / having / distinct-count
# ---------------------------------------------------------------------------


@register(
    "rollup_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def q_rollup_agg(spark, sf_dir):
    """ROLLUP grouping sets; NULL markers for super-aggregate rows match
    ANSI on both engines."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").cast("double").alias("sum_qty"),
        F.count("*").alias("n"),
    )


@register(
    "cube_agg",
    """
    SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def q_cube_agg(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))


@register(
    "pivot_agg",
    """
    SELECT l_returnflag,
           CAST(SUM(l_quantity) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_o,
           CAST(SUM(l_quantity) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_pivot_agg(spark, sf_dir):
    """Pivot with an explicit value list — explicit values keep it one
    pass (no extra distinct-values job) at scale."""
    li = load(spark, sf_dir, "lineitem")
    p = li.groupBy("l_returnflag").pivot("l_linestatus", ["O", "F"]).agg(
        F.sum("l_quantity")
    )
    return p.select(
        "l_returnflag",
        F.col("O").cast("double").alias("qty_o"),
        F.col("F").cast("double").alias("qty_f"),
    )


@register(
    "having_filter",
    """
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
    """,
)
def q_having_filter(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
    )


@register(
    "agg_distinct_count",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_distinct_count(spark, sf_dir):
    """Exact distinct counts (expand + two-phase agg under the hood).
    At 100 TB prefer approx_count_distinct (HLL) — see bench notes."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n"),
    )


@register(
    "case_bucketize",
    """
    SELECT CASE WHEN l_extendedprice < 20000 THEN 'low'
                WHEN l_extendedprice < 50000 THEN 'mid'
                ELSE 'high' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(l_quantity) AS DOUBLE) AS qty
    FROM lineitem GROUP BY 1
    """,
)
def q_case_bucketize(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    bucket = (
        F.when(F.col("l_extendedprice") < 20000, "low")
        .when(F.col("l_extendedprice") < 50000, "mid")
        .otherwise("high")
    )
    return (
        li.select(bucket.alias("bucket"), "l_quantity")
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").cast("double").alias("qty"))
    )


# ---------------------------------------------------------------------------
# scalar function coverage (string / date / math)
# ---------------------------------------------------------------------------


@register(
    "string_funcs",
    """
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_brand) AS brand_upper,
           CAST(length(p_name) AS INTEGER) AS name_len,
           substr(p_type, 1, 5) AS type_prefix,
           p_brand || '#' || p_type AS brand_type,
           regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
           replace(p_type, ' ', '_') AS type_snake
    FROM part
    """,
)
def q_string_funcs(spark, sf_dir):
    """String kernel coverage (reference main.py:90-100 uses strip/
    zfill/split/regex — generalized here). All JVM codegen built-ins."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").cast("int").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
    )


@register(
    "date_funcs",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(day(o_orderdate) AS INTEGER) AS dom,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
                AS INTEGER) AS days_since_epoch_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
    FROM orders
    """,
)
def q_date_funcs(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("dom"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch_start"),
        F.last_day("o_orderdate").alias("month_end"),
    )


@register(
    "math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           round(sqrt(l_extendedprice), 6) AS price_sqrt,
           round(ln(l_extendedprice + 1), 6) AS price_ln
    FROM lineitem
    """,
)
def q_math_funcs(spark, sf_dir):
    """Math kernels. sqrt is IEEE-correctly-rounded (bit-identical across
    engines); ln may differ in the last ulp between libm and the JVM, so
    it is rounded to 6 decimals on both sides."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
    )


# ---------------------------------------------------------------------------
# bag-semantics set ops + explicit grouping sets (round-3 completions)
# ---------------------------------------------------------------------------


@register(
    "set_intersect_all",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def q_set_intersect_all(spark, sf_dir):
    """Bag-semantics intersect: each nationkey survives min(countL,
    countR) times — physically a count-matching join, not the distinct
    hash of INTERSECT."""
    nk_c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    nk_s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return nk_c.intersectAll(nk_s)


@register(
    "set_except_all",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def q_set_except_all(spark, sf_dir):
    """Bag-semantics except: each key keeps max(countL - countR, 0)
    copies — multiplicity arithmetic the DISTINCT form erases."""
    nk_c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    nk_s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return nk_c.exceptAll(nk_s)


@register(
    "grouping_sets_lineitem",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                AS BIGINT) AS gid,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), ())
    """,
)
def q_grouping_sets_lineitem(spark, sf_dir):
    """Arbitrary GROUPING SETS (not derivable from rollup/cube alone)
    with grouping() flags disambiguating real NULL group keys from
    subtotal rows — the flags are part of the result contract, since a
    NULL l_linestatus detail row and the l_returnflag subtotal are
    otherwise indistinguishable. Spark expands each input row once per
    set (Expand), then one hash aggregate — same single-exchange
    shape as a plain groupBy, multiplied by #sets map-side."""
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                    AS BIGINT) AS gid,
               CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


# ---------------------------------------------------------------------------
# join_lateral_topk — correlated LATERAL subquery with LIMIT
# ---------------------------------------------------------------------------


@register(
    "join_lateral_topk",
    """
    SELECT n.n_name, t.c_custkey, t.c_acctbal
    FROM nation n
    JOIN LATERAL (
      SELECT c_custkey, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2
    ) t ON true
    """,
)
def q_join_lateral_topk(spark, sf_dir):
    """Correlated LATERAL subquery with ORDER BY + LIMIT — per-nation
    top-2 customers by balance, expressed in the SQL-standard lateral
    form rather than a window. Spark decorrelates this into exactly
    the plan you would hand-write (join + per-key WindowGroupLimit
    partial top-k before the exchange), so the declarative form costs
    nothing at scale: no per-outer-row re-execution ever happens.
    Deterministic tie-break on c_custkey keeps both engines aligned."""
    load(spark, sf_dir, "nation").createOrReplaceTempView("_lat_nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM _lat_nation n
        JOIN LATERAL (
          SELECT c_custkey, c_acctbal FROM _lat_customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2
        ) t
        """
    )


# ---------------------------------------------------------------------------
# recursive_cte_ancestry — WITH RECURSIVE traversal (Spark 4.0+)
# ---------------------------------------------------------------------------

# One SQL text, valid in BOTH dialects: the implicit parent of key k is
# k >> 1 (a binary tree over c_custkey), and the recursive member walks
# every key up to the root, counting steps. Bit-shift keeps the
# arithmetic integral in both engines (int/int is DOUBLE in DuckDB).
_RECURSIVE_SQL = """
WITH RECURSIVE walk(cur, depth) AS (
  SELECT c_custkey, 0 FROM customer
  UNION ALL
  SELECT cur >> 1, depth + 1 FROM walk WHERE cur > 1
)
SELECT depth AS root_depth,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM walk WHERE cur = 1
GROUP BY depth
"""


@register("recursive_cte_ancestry", _RECURSIVE_SQL)
def q_recursive_cte_ancestry(spark, sf_dir):
    """WITH RECURSIVE (new surface in Spark 4.0) — iterative hierarchy
    traversal stated declaratively: every customer key walks its
    implicit binary-tree ancestry (parent of k is k >> 1) to the root,
    and the query groups chains by their terminal depth. The engine
    executes the recursive member as a bounded loop of self-joins —
    depth here is ceil(log2(max key)), so ~25 rounds even at 100 TB
    key ranges, each round shrinking (only still-walking rows recurse)
    and each an ordinary shuffle join Catalyst plans like any other.
    The SAME SQL text runs on DuckDB — recursion is SQL-standard, so
    the oracle is the query itself, making this the one operator
    family where Spark-vs-oracle divergence would indicate an engine
    recursion bug rather than a translation gap. Graph siblings
    (connected components, PageRank) live in operators/ as explicit
    driver-controlled loops — use WITH RECURSIVE when the step count
    is key-range-bounded, the explicit loop when convergence must be
    observed (localCheckpoint lineage control, early exit)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_RECURSIVE_SQL)
