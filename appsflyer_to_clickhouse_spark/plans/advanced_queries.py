"""Advanced relational operators beyond the reference's surface —
the joins/aggregates SURVEY.md §2 Part B flags as absent from the
reference but that any real analytics user reaches for. All exact
DuckDB oracles.

Scale notes are per-query; the common theme: non-equi joins broadcast
the small side, ordered analytics use a single hash shuffle on the
partition key, and top-k never globally sorts.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import load, load_fanout, register

# ---------------------------------------------------------------------------
# join_asof — most recent prior event (the time-series workhorse)
# ---------------------------------------------------------------------------


@register(
    "join_asof",
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), views AS (
      SELECT user_id, view_ts, view_value FROM (
        SELECT user_id, ts AS view_ts, value AS view_value,
               row_number() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'view'
      ) WHERE rn = 1
    )
    SELECT c.event_id, c.user_id, c.ts, v.view_ts, v.view_value
    FROM clicks c
    ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND c.ts >= v.view_ts
    """,
)
def q_join_asof(spark, sf_dir):
    """As-of join: each click paired with the user's most recent view
    at-or-before it (DuckDB: native ASOF JOIN). Spark has no asof
    operator, so it composes scalably: union both streams tagged,
    ONE hash shuffle on user_id, and a running last_value(ignorenulls)
    carries the latest view forward — O(n log n) within partitions,
    no range join, no per-row subquery. Views sort before clicks on
    ts ties, matching ASOF's >= bound. Same-ts views are collapsed to
    the max-event_id row FIRST (both engines), otherwise which view
    supplies view_value on a tie is engine-arbitrary and the oracle
    hash can flake."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts",
        F.lit(None).cast("timestamp").alias("v_ts"),
        F.lit(None).cast("double").alias("v_val"),
        F.lit(1).alias("is_click"),
    )
    view_w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    views = (
        ev.filter(F.col("event_type") == "view")
        .withColumn("__rn", F.row_number().over(view_w))
        .filter(F.col("__rn") == 1)
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id", "ts",
            F.col("ts").alias("v_ts"),
            F.col("value").alias("v_val"),
            F.lit(0).alias("is_click"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(views).select(
        "event_id", "user_id", "ts", "is_click",
        F.last("v_ts", ignorenulls=True).over(w).alias("view_ts"),
        F.last("v_val", ignorenulls=True).over(w).alias("view_value"),
    )
    return merged.filter(F.col("is_click") == 1).select(
        "event_id", "user_id", "ts", "view_ts", "view_value"
    )


# ---------------------------------------------------------------------------
# join_range — non-equi bucket join (broadcast nested loop on a dim)
# ---------------------------------------------------------------------------

_BUCKETS = [(i, 50.0 * i, 50.0 * (i + 1)) for i in range(10)]
_BUCKET_SQL = ", ".join(f"({i}, {lo}, {hi})" for i, lo, hi in _BUCKETS)


@register(
    "join_range",
    f"""
    WITH buckets(bucket_id, lo, hi) AS (VALUES {_BUCKET_SQL})
    SELECT e.event_id, b.bucket_id
    FROM events e JOIN buckets b ON e.value >= b.lo AND e.value < b.hi
    """,
)
def q_join_range(spark, sf_dir):
    """True non-equi (range) join: events matched to value intervals.
    The interval dim is tiny and explicitly broadcast, so the physical
    plan is BroadcastNestedLoopJoin — the right 100 TB shape when one
    side is a handful of ranges (the alternative, binning with a CASE,
    is what `case_bucketize` shows; this is the general form for
    runtime-provided intervals)."""
    ev = load(spark, sf_dir, "events")
    buckets = spark.createDataFrame(_BUCKETS, "bucket_id int, lo double, hi double")
    joined = ev.join(
        F.broadcast(buckets),
        (ev["value"] >= buckets["lo"]) & (ev["value"] < buckets["hi"]),
    )
    return joined.select("event_id", "bucket_id")


# ---------------------------------------------------------------------------
# unnest_tokens_topk — explode + aggregate + top-k
# ---------------------------------------------------------------------------


@register(
    "unnest_tokens_topk",
    """
    SELECT tok, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT unnest(list_filter(regexp_split_to_array(lower(text),
                    '[^a-z0-9]+'), x -> x != '')) AS tok
      FROM documents
    )
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
)
def q_unnest_tokens_topk(spark, sf_dir):
    """Lateral explode of the token array -> global term frequencies ->
    top 20 (count desc, token asc tiebreak). Partial aggregation
    collapses the exploded stream map-side, and the final top-k plans
    as TakeOrderedAndProject — no global sort of the vocabulary."""
    from ..functions.text import tokens

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").alias("n"))
    return counts.orderBy(F.col("n").desc(), F.col("tok").asc()).limit(20)


# ---------------------------------------------------------------------------
# agg_percentiles / agg_stats — ordered + moment statistics
# ---------------------------------------------------------------------------


@register(
    "agg_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25)::DOUBLE, 6) AS qty_q25,
           round(quantile_cont(l_quantity, 0.5)::DOUBLE, 6) AS qty_q50,
           round(quantile_cont(l_quantity, 0.9)::DOUBLE, 6) AS qty_q90,
           CAST(min(l_quantity) AS DOUBLE) AS qty_min,
           CAST(max(l_quantity) AS DOUBLE) AS qty_max
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_percentiles(spark, sf_dir):
    """Exact percentiles (linear interpolation — Spark `percentile`
    and DuckDB `quantile_cont` share the definition) per group,
    exposed as SCALAR columns (array-typed result cells break
    pandas-side canonicalizers downstream, and three percentiles of
    the same column share one sort anyway). Exact order statistics
    need the group's values together (one shuffle); at 100 TB swap in
    approx_percentile (t-digest) the same way agg_distinct_count notes
    approx_count_distinct."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile(F.col("l_quantity"), F.lit(0.25)), 6).alias("qty_q25"),
        F.round(F.percentile(F.col("l_quantity"), F.lit(0.5)), 6).alias("qty_q50"),
        F.round(F.percentile(F.col("l_quantity"), F.lit(0.9)), 6).alias("qty_q90"),
        F.min("l_quantity").cast("double").alias("qty_min"),
        F.max("l_quantity").cast("double").alias("qty_max"),
    )


@register(
    "agg_stats",
    """
    SELECT l_returnflag,
           round(avg(l_extendedprice), 4) AS price_avg,
           round(stddev_samp(l_extendedprice), 4) AS price_std,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark, sf_dir):
    """Moment statistics (avg/stddev/corr) per group — single-pass
    partial aggregation (sum/sum-of-squares/co-moments combine
    associatively), so one shuffle regardless of scale. Rounded to
    absorb float fold-order differences between engines."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.avg("l_extendedprice"), 4).alias("price_avg"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_std"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# events_tumbling_window — time-bucketed aggregation (batch twin of the
# streaming windowed agg)
# ---------------------------------------------------------------------------


@register(
    "events_tumbling_window",
    """
    SELECT time_bucket(INTERVAL 1 DAY, ts) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_tumbling_window(spark, sf_dir):
    """Tumbling 1-day windows per event type via F.window — the batch
    form of the Structured Streaming windowed aggregation (same
    expression works under readStream + watermark; the streaming
    variant's semantics are pinned in tests/test_streaming.py)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )


# ---------------------------------------------------------------------------
# fuzzy_levenshtein — edit-distance verify over LSH candidates
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# agg_histogram — width_bucket histogram
# ---------------------------------------------------------------------------


@register(
    "agg_histogram",
    """
    -- width_bucket(value, 0, 500, 10) spelled out (DuckDB 1.0 lacks
    -- the function): bucket width (500-0)/10 = 50, below-range -> 0,
    -- at-or-above hi -> n+1
    SELECT CASE WHEN value < 0 THEN CAST(0 AS BIGINT)
                WHEN value >= 500 THEN CAST(11 AS BIGINT)
                ELSE CAST(floor(value / 50.0) AS BIGINT) + 1 END AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(value), 4) AS lo,
           round(max(value), 4) AS hi
    FROM events
    GROUP BY 1
    """,
)
def q_agg_histogram(spark, sf_dir):
    """Equi-width histogram via width_bucket (identical bucketing rule
    in both engines) — one partial-agg shuffle whatever the row count,
    the constant-memory way to profile a 100 TB column."""
    ev = load(spark, sf_dir, "events")
    b = F.width_bucket("value", F.lit(0), F.lit(500), F.lit(10))
    return ev.groupBy(b.cast("long").alias("bucket")).agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 4).alias("lo"),
        F.round(F.max("value"), 4).alias("hi"),
    )


# ---------------------------------------------------------------------------
# unpivot_melt / null_safety_funcs
# ---------------------------------------------------------------------------


@register(
    "unpivot_melt",
    """
    SELECT l_orderkey, l_linenumber, metric, round(value, 4) AS value
    FROM (
      SELECT l_orderkey, l_linenumber,
             round(l_quantity, 4) AS quantity,
             round(l_extendedprice, 4) AS extendedprice,
             round(l_discount, 4) AS discount
      FROM lineitem WHERE l_orderkey % 100 = 0
    )
    UNPIVOT (value FOR metric IN (quantity, extendedprice, discount))
    """,
)
def q_unpivot_melt(spark, sf_dir):
    """Wide->long unpivot (melt): three measure columns become
    (metric, value) rows — the inverse of pivot_agg. Pure Expand
    projection, no shuffle."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    wide = li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_quantity", 4).alias("quantity"),
        F.round("l_extendedprice", 4).alias("extendedprice"),
        F.round("l_discount", 4).alias("discount"),
    )
    return wide.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "extendedprice", "discount"],
        "metric",
        "value",
    )


@register(
    "null_safety_funcs",
    """
    SELECT event_id,
           coalesce(CASE WHEN event_id % 5 = 0 THEN NULL ELSE event_type END,
                    'unknown') AS etype,
           nullif(event_type, 'error') AS etype_no_error,
           round(value / nullif(CAST(event_id % 4 AS DOUBLE), 0), 4)
               AS value_per_mod,
           TRY_CAST(CASE WHEN event_id % 3 = 0 THEN 'not-a-number'
                         ELSE CAST(event_id AS VARCHAR) END AS INTEGER)
               AS maybe_int
    FROM events
    """,
)
def q_null_safety_funcs(spark, sf_dir):
    """NULL-safety scalar family: coalesce, nullif, try_divide (NULL on
    zero divisor, never an ANSI error), try_cast (NULL on bad input) —
    the defensive layer a dirty 100 TB feed needs instead of
    fail-the-job semantics."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(
            F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(
                F.col("event_type")
            ),
            F.lit("unknown"),
        ).alias("etype"),
        F.nullif(F.col("event_type"), F.lit("error")).alias("etype_no_error"),
        F.round(
            F.try_divide("value", (F.col("event_id") % 4).cast("double")), 4
        ).alias("value_per_mod"),
        F.when(F.col("event_id") % 3 == 0, F.lit("not-a-number"))
        .otherwise(F.col("event_id").cast("string"))
        .try_cast("int")
        .alias("maybe_int"),
    )


# ---------------------------------------------------------------------------
# session_window_agg — gap-based session windows (built-in F.session_window)
# ---------------------------------------------------------------------------


# ONE oracle text for both session-window registrations (batch
# session_window_agg here, streaming stream_session_window in
# extra_queries): the two queries exist to pin the SAME semantics, so
# the gap constant / tiebreak must not be able to drift between them.
SESSION_WINDOW_ORACLE = """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """


@register("session_window_agg", SESSION_WINDOW_ORACLE)
def q_session_window_agg(spark, sf_dir):
    """Gap-based session windows via the built-in F.session_window
    (30-minute inactivity gap): Spark merges overlapping per-event
    windows into sessions in one aggregation. The oracle derives the
    identical sessions relationally (lag > gap -> new-session marker ->
    running sum -> group), pinning the built-in's semantics. Works
    unchanged under readStream + watermark for streaming sessions."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# grouping sets / analytic windows / ordered collect
# ---------------------------------------------------------------------------


@register(
    "grouping_sets_agg",
    """
    SELECT event_type, user_id % 5 AS user_bucket,
           CAST(grouping(event_type) AS INTEGER) AS g_type,
           CAST(grouping(user_id % 5) AS INTEGER) AS g_bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id % 5), ())
    """,
)
def q_grouping_sets_agg(spark, sf_dir):
    """Explicit GROUPING SETS (beyond the rollup/cube queries) with
    grouping() markers disambiguating real NULLs from subtotal rows.
    Plans as a single Expand + aggregate — one shuffle for all three
    granularities."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type, user_id % 5 AS user_bucket,
               CAST(grouping(event_type) AS INT) AS g_type,
               CAST(grouping(user_id % 5) AS INT) AS g_bucket,
               count(*) AS n
        FROM events
        GROUP BY GROUPING SETS ((event_type), (user_id % 5), ())
        """
    )


@register(
    "window_analytics_suite",
    """
    SELECT event_id, user_id,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           first_value(event_id) OVER w AS first_ev,
           nth_value(event_id, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_ev,
           lead(event_id, 1) OVER w AS next_ev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_analytics_suite(spark, sf_dir):
    """The analytic-function family beyond row_number/lag: ntile,
    percent_rank, cume_dist, first/nth_value, lead — all over ONE
    window spec, so a single hash shuffle on user_id serves every
    column (WindowExec shares the sort)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("event_id").over(w).alias("first_ev"),
        F.nth_value("event_id", 2).over(wrows).alias("second_ev"),
        F.lead("event_id", 1).over(w).alias("next_ev"),
    )


@register(
    "agg_array_collect",
    """
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY user_id
    """,
)
def q_agg_array_collect(spark, sf_dir):
    """Ordered collection aggregate: collect_set sorted then joined to
    a deterministic CSV. Collection order is nondeterministic under
    parallelism, so ALWAYS sort before exposing. The result surface is
    scalar-only (array-typed cells break pandas-side canonicalizers
    downstream); the sorted array exists internally."""
    ev = load(spark, sf_dir, "events")
    # collect once, derive CSV + cardinality in a post-aggregation
    # projection — repeating collect_set per output column would run
    # the collection multiple times
    agged = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("types"),
        F.count("*").alias("n"),
    )
    return agged.select(
        "user_id",
        F.array_join("types", ",").alias("types_csv"),
        F.size("types").cast("bigint").alias("n_types"),
        "n",
    )


# ---------------------------------------------------------------------------
# sql_scalar_subquery — the spark.sql() surface with a scalar subquery
# ---------------------------------------------------------------------------


@register(
    "sql_scalar_subquery",
    """
    SELECT event_id, event_type, round(value, 4) AS value
    FROM events
    WHERE value > 2 * (SELECT avg(value) FROM events)
    """,
)
def q_sql_scalar_subquery(spark, sf_dir):
    """The SQL entry point: users can hand the engine SQL text —
    temp views over the loaded frames, then spark.sql with a scalar
    subquery (Catalyst plans it as a broadcast of the 1-row aggregate,
    then a pushable filter). Identical text runs on DuckDB."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_id, event_type, round(value, 4) AS value
        FROM events
        WHERE value > 2 * (SELECT avg(value) FROM events)
        """
    )


@register(
    "join_null_safe",
    """
    WITH a AS (
      SELECT event_id,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE user_id END AS k
      FROM events WHERE event_id % 2 = 0
    ), b AS (
      SELECT DISTINCT CASE WHEN event_id % 7 = 0 THEN NULL ELSE user_id END AS k
      FROM events WHERE event_id % 2 = 1
    )
    SELECT a.event_id, a.k
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def q_join_null_safe(spark, sf_dir):
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys
    match NULL keys — still a hash join (the null bucket joins like
    any other value), unlike a non-equi null workaround."""
    ev = load(spark, sf_dir, "events")
    k = F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("user_id"))
    a = ev.filter(F.col("event_id") % 2 == 0).select("event_id", k.alias("k"))
    b = ev.filter(F.col("event_id") % 2 == 1).select(k.alias("k")).distinct()
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(a["event_id"], a["k"])


# ---------------------------------------------------------------------------
# join_skew_salted — skew-mitigated equi-join, result equals plain join
# ---------------------------------------------------------------------------


@register(
    "join_skew_salted",
    """
    WITH fact AS (
      SELECT event_id,
             CASE WHEN event_id % 10 < 7 THEN 0 ELSE user_id END AS k,
             value
      FROM events
    ), dim AS (
      SELECT user_id AS k, CAST(count(*) AS BIGINT) AS user_events
      FROM events GROUP BY user_id
    )
    SELECT f.event_id, f.k, round(f.value, 4) AS value, d.user_events
    FROM fact f JOIN dim d ON f.k = d.k
    """,
)
def q_join_skew_salted(spark, sf_dir):
    """Salted join under deliberate skew (70% of fact rows share key
    0): the dim replicates 16x, the fact salts deterministically
    (crc32 % 16), and the hot key spreads over 16 shuffle partitions.
    The oracle is the PLAIN join — salting must not change the result
    set, only the partitioning. At 100 TB this (or AQE skew-split) is
    the difference between a straggler task holding 70% of the data
    and even tasks."""
    from ..operators.join_utils import salted_join

    ev = load(spark, sf_dir, "events")
    fact = ev.select(
        "event_id",
        F.when(F.col("event_id") % 10 < 7, 0)
        .otherwise(F.col("user_id"))
        .alias("k"),
        F.round("value", 4).alias("value"),
    )
    dim = ev.groupBy(F.col("user_id").alias("k")).agg(
        F.count("*").alias("user_events")
    )
    salt = F.pmod(F.crc32(F.col("event_id").cast("string")), F.lit(16))
    return salted_join(fact, dim, "k", salt, 16).select(
        "event_id", "k", "value", "user_events"
    )


def _fuzzy_oracle() -> str:
    from .dedup_queries import candidates_cte

    return f"""
    WITH {candidates_cte('documents')}
    SELECT c.id_a, c.id_b,
           levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS lev40
    FROM cand c
    JOIN documents a ON a.doc_id = c.id_a
    JOIN documents b ON b.doc_id = c.id_b
    """


@register("fuzzy_levenshtein", _fuzzy_oracle())
def q_fuzzy_levenshtein(spark, sf_dir):
    """Edit-distance verification over LSH candidate pairs (never all
    pairs — Levenshtein is O(len^2) per pair, so the candidate bound is
    what makes it usable at scale; prefixes cap the per-pair cost)."""
    from .dedup_queries import cand_pairs_frame

    docs = load(spark, sf_dir, "documents")
    cand = cand_pairs_frame(spark, sf_dir)
    texts = docs.select("doc_id", F.substring("text", 1, 40).alias("prefix"))
    return (
        cand.join(texts.withColumnRenamed("doc_id", "id_a").withColumnRenamed("prefix", "p_a"), "id_a")
        .join(texts.withColumnRenamed("doc_id", "id_b").withColumnRenamed("prefix", "p_b"), "id_b")
        .select(
            "id_a", "id_b", F.levenshtein("p_a", "p_b").alias("lev40")
        )
    )


# ---------------------------------------------------------------------------
# window_time_range_sum — interval RANGE frame (rolling 1-hour sum)
# ---------------------------------------------------------------------------


@register(
    "window_time_range_sum",
    """
    SELECT event_id, user_id, ts,
           CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
                 PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
               ) AS DOUBLE), 4) AS DOUBLE) AS rolling_1h_value
    FROM events
    """,
)
def q_window_time_range_sum(spark, sf_dir):
    """Time-interval RANGE frame: per event, the sum of the same
    user's values over the trailing hour — the hypertable-style rolling
    aggregate. The frame is keyed on epoch MICROS (integer-exact in
    both engines; a seconds cast would merge sub-second neighbors), and
    the windowed sum is decimal so frame-internal addition order cannot
    drift. One shuffle on user_id; frames never cross partitions, so
    the state per task is one in-flight hour of one user's events at
    any scale."""
    from pyspark.sql import Window as W2

    ev = load(spark, sf_dir, "events")
    # events.ts reads as TIMESTAMP_NTZ; unix_micros requires TIMESTAMP,
    # and the cast is value-preserving under the pinned UTC session tz
    w = (
        W2.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    rolling = F.sum(F.col("value").cast("decimal(18,6)")).over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(rolling.cast("double"), 4).cast("double").alias("rolling_1h_value"),
    )


# ---------------------------------------------------------------------------
# events_hopping_window — overlapping (sliding) windows
# ---------------------------------------------------------------------------


@register(
    "events_hopping_window",
    """
    SELECT time_bucket(INTERVAL 1 DAY, ts) - k.k * INTERVAL 1 DAY
             AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
                AS DOUBLE) AS total_value
    FROM events, (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))) k(k)
    GROUP BY 1, 2
    """,
)
def q_events_hopping_window(spark, sf_dir):
    """Hopping windows (width 2 days, slide 1 day): every event lands
    in exactly width/slide = 2 overlapping windows. F.window with a
    slideDuration explodes the assignment map-side — the fan-out factor
    is width/slide, a design constant, so the shuffle grows by exactly
    2x and the state by #windows x #types. The oracle derives the same
    two window starts per event arithmetically (epoch-aligned like
    Spark's window())."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 days", "1 day").alias("w"), "event_type")
        .agg(
            F.expr("CAST(count(*) AS BIGINT) AS n"),
            F.expr(
                "CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)"
                " AS DOUBLE) AS total_value"
            ),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


# ---------------------------------------------------------------------------
# window_rank_family — the full ranking vocabulary, tie semantics intact
# ---------------------------------------------------------------------------


@register(
    "window_rank_family",
    """
    SELECT o_orderkey,
           o_orderpriority,
           CAST(rank()       OVER wt AS BIGINT) AS rnk,
           CAST(dense_rank() OVER wt AS BIGINT) AS drnk,
           round(percent_rank() OVER wt, 6) AS prank,
           round(cume_dist()    OVER wt, 6) AS cdist,
           CAST(ntile(4) OVER wu AS BIGINT) AS quartile
    FROM orders
    WINDOW
      wt AS (PARTITION BY o_orderpriority ORDER BY o_orderstatus),
      wu AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_window_rank_family(spark, sf_dir):
    """rank / dense_rank / percent_rank / cume_dist / ntile in one
    pass. The first four order by a TIE-PRONE key on purpose — their
    results are functions of the order-key VALUES alone, so ties are
    cross-engine deterministic; ntile assigns by row POSITION, so its
    window gets a total order (totalprice, orderkey) or bucket
    membership would be engine-arbitrary. Both windows share the
    o_orderpriority partitioning: one hash exchange, two sorts."""
    from pyspark.sql import Window as W2

    orders = load(spark, sf_dir, "orders")
    wt = W2.partitionBy("o_orderpriority").orderBy("o_orderstatus")
    wu = W2.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(wt).cast("bigint").alias("rnk"),
        F.dense_rank().over(wt).cast("bigint").alias("drnk"),
        F.round(F.percent_rank().over(wt), 6).alias("prank"),
        F.round(F.cume_dist().over(wt), 6).alias("cdist"),
        F.ntile(4).over(wu).cast("bigint").alias("quartile"),
    )


# ---------------------------------------------------------------------------
# join_range_bucketed — big x big interval join via grid cells
# ---------------------------------------------------------------------------

_RB_ORACLE = """
WITH purchases AS (
  SELECT event_id AS p_id, ts AS p_ts FROM events
  WHERE event_type = 'purchase'
)
SELECT p.p_id, e.event_id
FROM purchases p
JOIN events e
  ON e.ts >= p.p_ts AND e.ts < p.p_ts + INTERVAL 10 MINUTE
"""


@register("join_range_bucketed", _RB_ORACLE)
def q_join_range_bucketed(spark, sf_dir):
    """Big x big temporal range join — the shape BroadcastNestedLoop
    (join_range) cannot survive when NEITHER side broadcasts. Each
    10-minute interval [p_ts, p_ts+10m) registers in the grid cells it
    can overlap (its start's cell and the next; cell width = max
    interval length, so exactly 2); each probe event maps to its ONE
    cell. The join becomes an EQUI-join on the cell key — a plain hash
    shuffle both sides — plus the residual range predicate, and since
    a probe's cell is unique, no pair can match twice (no distinct
    pass). Cost scales with pairs per cell (data density), never
    |left| x |right|."""
    ev = load(spark, sf_dir, "events")
    cell = lambda c: F.window(c, "10 minutes").getField("start")  # noqa: E731
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
    )
    iv = purchases.select(
        "p_id",
        "p_ts",
        F.explode(
            F.array(
                cell(F.col("p_ts")),
                cell(F.col("p_ts")) + F.expr("INTERVAL 10 MINUTES"),
            )
        ).alias("cell"),
    )
    pts = ev.select("event_id", "ts", cell(F.col("ts")).alias("cell"))
    return (
        iv.join(pts, "cell")
        .filter(
            (F.col("ts") >= F.col("p_ts"))
            & (F.col("ts") < F.col("p_ts") + F.expr("INTERVAL 10 MINUTES"))
        )
        .select("p_id", "event_id")
    )


# ---------------------------------------------------------------------------
# agg_argminmax — positional aggregates (max_by / min_by)
# ---------------------------------------------------------------------------


@register(
    "agg_argminmax",
    """
    SELECT event_type,
           arg_max(event_id, ts) AS latest_event_id,
           arg_min(event_id, ts) AS earliest_event_id,
           round(arg_max(value, ts), 6) AS latest_value,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_argminmax(spark, sf_dir):
    """Positional aggregates: the row-valued argmax/argmin pattern
    (Spark max_by/min_by = DuckDB arg_max/arg_min) that replaces the
    join-back-after-groupBy idiom with ONE aggregate pass — at scale
    that deletes a whole shuffle+join from 'latest row per key'
    queries. The ordering key ts is unique per event_type group in this
    data (microsecond stamps), making the picked rows deterministic;
    on tie-prone keys compose the tiebreak into the ordering value
    (struct(ts, event_id)) — the OHLC query shows the window
    formulation of the same contract."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("max_by(event_id, ts)").alias("latest_event_id"),
        F.expr("min_by(event_id, ts)").alias("earliest_event_id"),
        F.round(F.expr("max_by(value, ts)"), 6).alias("latest_value"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# agg_corr_exact — Pearson correlation from exact decimal co-moments
# ---------------------------------------------------------------------------

# (18,3): DuckDB promotes narrower decimals to a 64-bit DECIMAL(18)
# fast path whose multiplication overflows on squared prices; at 18
# digits it switches to int128, and Spark's product precision
# 18+18+1=37 still fits 38 with NO scale loss — exact on both engines
_CX = "CAST(l_quantity AS DECIMAL(18,3))"
_CY = "CAST(l_extendedprice AS DECIMAL(18,3))"

@register(
    "agg_corr_exact",
    f"""
    WITH m AS (
      SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(SUM({_CX}) AS DOUBLE) AS sx,
             CAST(SUM({_CY}) AS DOUBLE) AS sy,
             CAST(SUM({_CX} * {_CX}) AS DOUBLE) AS sxx,
             CAST(SUM({_CY} * {_CY}) AS DOUBLE) AS syy,
             CAST(SUM({_CX} * {_CY}) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
                 6) AS corr_qty_price,
           round((n * sxy - sx * sy) / (n * (n - 1)), 4) AS covar_samp
    FROM m
    """,
)
def q_agg_corr_exact(spark, sf_dir):
    """Pearson correlation + sample covariance per group from exact
    decimal co-moments — the built-in corr()/covar_samp() stream
    doubles in partial order, so their last digits are
    run-dependent and can never hash-match an independent engine; the
    five decimal sums are exact and the closed form then runs in one
    fixed double expression. Same one-exchange partial/final aggregate
    plan as any groupBy.

    Scan side is fanned out, projected to the three consumed columns
    first (opt guide §2.3/§2.5): the five wide-decimal product-sums
    are the most expensive per-row arithmetic in the relational suite,
    and a single-row-group parquet file would otherwise run ALL of it
    on one core (measured 1.4-22.5 s swing at sf0.1 depending on JIT
    state; fanned out, the partials parallelize). Decimal sums are
    exact integers at fixed scale, so the round-robin exchange cannot
    change the result."""
    li = load_fanout(
        spark, sf_dir, "lineitem",
        cols=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    m = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.expr(f"CAST(SUM({_CX}) AS DOUBLE)").alias("sx"),
        F.expr(f"CAST(SUM({_CY}) AS DOUBLE)").alias("sy"),
        F.expr(f"CAST(SUM({_CX} * {_CX}) AS DOUBLE)").alias("sxx"),
        F.expr(f"CAST(SUM({_CY} * {_CY}) AS DOUBLE)").alias("syy"),
        F.expr(f"CAST(SUM({_CX} * {_CY}) AS DOUBLE)").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return m.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        F.round(
            F.try_divide(
                n * sxy - sx * sy,
                F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy),
            ),
            6,
        ).alias("corr_qty_price"),
        F.round(
            F.try_divide(n * sxy - sx * sy, n * (n - 1)), 4
        ).alias("covar_samp"),
    )


# ---------------------------------------------------------------------------
# agg_mode_deterministic — most-frequent value with a total tiebreak
# ---------------------------------------------------------------------------


@register(
    "agg_mode_deterministic",
    """
    WITH counted AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY count(*) DESC, event_type ASC) AS rn
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id, event_type AS mode_type, c AS mode_count
    FROM counted WHERE rn = 1
    """,
)
def q_agg_mode_deterministic(spark, sf_dir):
    """Per-key mode with an explicit total tiebreak (count desc, value
    asc) — the built-in mode() leaves ties engine-arbitrary, which is
    exactly the nondeterminism a cross-engine contract can't tolerate.
    Count + window share the user_id-prefixed partitioning: one
    exchange, and the rn=1 filter is a WindowGroupLimit partial top-1
    before it."""
    from pyspark.sql import Window as W2

    ev = load(spark, sf_dir, "events")
    counted = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("c")
    )
    w = W2.partitionBy("user_id").orderBy(
        F.desc("c"), F.asc("event_type")
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_type"),
            F.col("c").alias("mode_count"),
        )
    )


# ---------------------------------------------------------------------------
# array_funcs — the array scalar-function family, scalar-typed outputs
# ---------------------------------------------------------------------------


@register(
    "array_funcs",
    """
    SELECT vec_id,
           len(embedding) AS n_dims,
           round(embedding[1]::DOUBLE, 6) AS first_dim,
           round(list_aggregate(embedding[1:8]::DOUBLE[], 'sum'), 6)
             AS head_sum,
           round(list_sort(embedding::DOUBLE[])[1], 6) AS min_dim,
           round(list_sort(embedding::DOUBLE[])[len(embedding)], 6)
             AS max_dim,
           CAST(len(list_filter(embedding::DOUBLE[], x -> x > 0.0))
                AS BIGINT) AS n_positive,
           round(list_aggregate(
                   list_transform(embedding::DOUBLE[], x -> abs(x)), 'max'),
                 6) AS max_abs
    FROM embeddings
    """,
)
def q_array_funcs(spark, sf_dir):
    """The array scalar vocabulary over a real vector column — size,
    subscript, slice+fold, sort-derived min/max, filtered count,
    transform+fold — all in ONE map-only Project (no explode, no
    shuffle; outputs stay scalar because array-typed result cells
    break downstream canonicalizers). The slice fold runs
    left-to-right identically on both engines, so even the float sums
    hash-match after round(6)."""
    emb = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    head_sum = F.aggregate(
        F.slice(v, 1, 8), F.lit(0.0), lambda a, x: a + x
    )
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    return emb.select(
        "vec_id",
        F.size(v).alias("n_dims"),
        F.round(F.element_at(v, 1), 6).alias("first_dim"),
        F.round(head_sum, 6).alias("head_sum"),
        F.round(F.array_min(v), 6).alias("min_dim"),
        F.round(F.array_max(v), 6).alias("max_dim"),
        F.size(F.filter(v, lambda x: x > 0.0)).cast("bigint").alias(
            "n_positive"
        ),
        F.round(max_abs, 6).alias("max_abs"),
    )


# ---------------------------------------------------------------------------
# join_asof_nearest — nearest-in-time match (backward OR forward)
# ---------------------------------------------------------------------------


@register(
    "join_asof_nearest",
    """
    WITH f AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT user_id, ts AS vts, event_id AS vid FROM events
      WHERE event_type = 'view'
    ),
    cand AS (
      SELECT f.event_id, f.user_id, f.ts, v.vts, v.vid,
             abs(epoch_us(f.ts) - epoch_us(v.vts)) AS adt
      FROM f JOIN v ON v.user_id = f.user_id
         AND v.vts >= f.ts - INTERVAL 1 DAY
         AND v.vts <= f.ts + INTERVAL 1 DAY
    ),
    best AS (
      SELECT event_id, user_id, ts, vts, vid,
             row_number() OVER (PARTITION BY event_id
                                ORDER BY adt, vts, vid) AS rn
      FROM cand
    )
    SELECT f.event_id, f.user_id, f.ts,
           b.vts AS nearest_view_ts,
           b.vid AS nearest_view_id
    FROM f LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
      ON b.event_id = f.event_id
    """,
)
def q_join_asof_nearest(spark, sf_dir):
    """NEAREST-in-time join — the sensor-alignment workhorse backward
    as-of can't express: each purchase matches the view with the
    smallest |dt| within +-1 day, whichever side of the event it falls
    on (join_asof only looks backward). Physically the same equi-join
    on user_id with the +-window as a residual; the per-fact winner is
    one window over the join's own event_id partitioning with a total
    (|dt|, ts, id) order so ties are deterministic; unmatched facts
    survive via the left join. |dt| compares in integer microseconds —
    exact cross-engine."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    f = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_uid"),
        F.col("ts").alias("vts"),
        F.col("event_id").alias("vid"),
    )
    cand = f.join(
        v,
        (f.user_id == v.v_uid)
        & (v.vts >= f.ts - F.expr("INTERVAL 1 DAY"))
        & (v.vts <= f.ts + F.expr("INTERVAL 1 DAY")),
    ).withColumn(
        # NTZ -> TIMESTAMP cast is value-preserving under the pinned
        # UTC session tz; unix_micros rejects NTZ directly
        "adt",
        F.abs(
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("vts").cast("timestamp"))
        ),
    )
    w = W.partitionBy("event_id").orderBy("adt", "vts", "vid")
    best = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("event_id").alias("b_eid"),
            F.col("vts").alias("nearest_view_ts"),
            F.col("vid").alias("nearest_view_id"),
        )
    )
    return f.join(best, f.event_id == best.b_eid, "left").select(
        "event_id", "user_id", "ts", "nearest_view_ts", "nearest_view_id"
    )
