"""Time-series depth: gap-filled downsampling and OHLC bars over the
``events`` stream table (the hypertable continuous-aggregate vocabulary;
complements ``window_time_range_sum`` / ``events_hopping_window``).

Scale shapes:

- ``timeseries_gapfill``: the classic `time_bucket_gapfill + locf`
  rollup. One shuffle keyed (user_id, day) for the downsample, the
  per-user calendar spine derives from the SAME exchange (re-grouped by
  user_id), and the fill is a per-user window — state bounded by
  users x days, never raw events. The spine join is 1:1 on
  (user_id, day) so AQE broadcasts whichever side is small.
- ``timeseries_ohlc``: open/high/low/close bars. open/close need a
  total order WITHIN each bar, so both row_number directions share ONE
  hash exchange on the bar key (Spark plans both windows over the same
  partitioning; no second shuffle), and the bar aggregate reuses it
  again — one shuffle total.
- ``timeseries_interpolate``: linear interpolation across gaps — the
  backward (last ignorenulls) and forward (first ignorenulls) neighbor
  contexts are windows over the SAME user_id partitioning as the fill.
- ``timeseries_zscore_anomaly``: trailing 7-day rolling z-score with
  moments from exact decimal sum/sum-of-squares (windowed stddev_samp
  on doubles is partial-order-dependent and flakes cross-engine).

Value parity: per-day sums go through exact DECIMAL(14,6) arithmetic
(float addition is order-dependent; the decimal cast is the proven
cross-engine pattern from relational_queries) and surface as
round(double, 6).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .registry import load, register

_VAL_DEC = "CAST(value AS DECIMAL(14,6))"

# ---------------------------------------------------------------------------
# timeseries_gapfill — per-user daily rollup, calendar spine, LOCF fill
# ---------------------------------------------------------------------------

_GAPFILL_ORACLE = f"""
WITH daily AS (
  SELECT user_id,
         date_trunc('day', ts) AS day,
         SUM({_VAL_DEC}) AS day_value,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events
  GROUP BY 1, 2
), spine AS (
  SELECT user_id,
         unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS day
  FROM daily
  GROUP BY user_id
)
SELECT s.user_id,
       s.day,
       d.day_value IS NOT NULL AS observed,
       COALESCE(d.n_events, 0) AS n_events,
       CAST(round(CAST(last_value(d.day_value IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS DOUBLE), 6) AS DOUBLE) AS locf_value
FROM spine s
LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
"""


@register("timeseries_gapfill", _GAPFILL_ORACLE)
def q_timeseries_gapfill(spark, sf_dir):
    """Downsample events to per-(user, day) sums, generate each user's
    full [first_day, last_day] calendar via ``sequence()``, left-join
    the observations onto the spine, and carry the last observed value
    forward (``last(ignorenulls)`` window) — TimescaleDB's
    ``time_bucket_gapfill(...) + locf(...)`` re-expressed in stock
    Spark. Missing days surface with observed=false, n_events=0, and
    the carried value. Rows before a user's first observation cannot
    exist (the spine starts at the user's min day) so locf is never
    NULL."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("DAY", F.col("ts")).alias("day")
    ).agg(
        F.sum(F.expr(_VAL_DEC)).alias("day_value"),
        F.count("*").alias("n_events"),
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        "day",
        F.col("day_value").isNotNull().alias("observed"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.round(
            F.last("day_value", ignorenulls=True).over(w).cast("double"), 6
        ).cast("double").alias("locf_value"),
    )


# ---------------------------------------------------------------------------
# timeseries_ohlc — open/high/low/close bars per (event_type, day)
# ---------------------------------------------------------------------------

_OHLC_ORACLE = f"""
-- DuckDB date_trunc('day') yields DATE; cast back to TIMESTAMP to
-- match Spark's date_trunc (always timestamp-typed)
WITH ranked AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         value,
         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                            ORDER BY ts ASC,  event_id ASC)  AS rn_first,
         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_last
  FROM events
)
SELECT event_type,
       day,
       round(max(CASE WHEN rn_first = 1 THEN value END), 6) AS open,
       round(max(value), 6) AS high,
       round(min(value), 6) AS low,
       round(max(CASE WHEN rn_last = 1 THEN value END), 6) AS close,
       CAST(round(CAST(SUM({_VAL_DEC}) AS DOUBLE), 6) AS DOUBLE) AS volume,
       CAST(count(*) AS BIGINT) AS n_ticks
FROM ranked
GROUP BY event_type, day
"""


@register("timeseries_ohlc", _OHLC_ORACLE)
def q_timeseries_ohlc(spark, sf_dir):
    """OHLC downsampling bars: first/last need an in-bar total order —
    (ts, event_id) is a deterministic tiebreak for same-second ticks,
    without which open/close are engine-arbitrary and the oracle hash
    flakes. Both row_number directions and the final aggregate share
    one hash exchange on the bar key (event_type, day); max(CASE rn=1)
    turns the positional pick into a plain aggregate so no self-join
    is needed."""
    ev = load(spark, sf_dir, "events")
    # project the bar key FIRST and window over the alias: partitioning
    # on the raw date_trunc expression leaves the groupBy keyed on a
    # different (aliased) attribute and Spark plans a second exchange
    base = ev.select(
        "event_type",
        F.date_trunc("DAY", F.col("ts")).alias("day"),
        "value",
        "ts",
        "event_id",
        F.expr(_VAL_DEC).alias("value_dec"),
    )
    wf = W.partitionBy("event_type", "day").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    wl = W.partitionBy("event_type", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = base.select(
        "event_type",
        "day",
        "value",
        F.row_number().over(wf).alias("rn_first"),
        F.row_number().over(wl).alias("rn_last"),
        "value_dec",
    )
    return ranked.groupBy("event_type", "day").agg(
        F.round(F.max(F.when(F.col("rn_first") == 1, F.col("value"))), 6).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.max(F.when(F.col("rn_last") == 1, F.col("value"))), 6).alias("close"),
        F.round(F.sum("value_dec").cast("double"), 6).cast("double").alias("volume"),
        F.count("*").alias("n_ticks"),
    )


# ---------------------------------------------------------------------------
# timeseries_interpolate — linear interpolation across gaps
# ---------------------------------------------------------------------------

_INTERP_ORACLE = f"""
WITH daily AS (
  SELECT user_id,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         SUM({_VAL_DEC}) AS day_value
  FROM events
  GROUP BY 1, 2
), spine AS (
  SELECT user_id,
         unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS day
  FROM daily
  GROUP BY user_id
), ctx AS (
  SELECT s.user_id, s.day,
         d.day_value IS NOT NULL AS observed,
         last_value(d.day IGNORE NULLS) OVER w_prev AS day_p,
         last_value(d.day_value IGNORE NULLS) OVER w_prev AS val_p,
         first_value(d.day IGNORE NULLS) OVER w_next AS day_n,
         first_value(d.day_value IGNORE NULLS) OVER w_next AS val_n
  FROM spine s
  LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
  WINDOW
    w_prev AS (PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, day, observed,
       CAST(round(CASE
         WHEN observed THEN CAST(val_p AS DOUBLE)
         WHEN day_n IS NULL THEN CAST(val_p AS DOUBLE)
         ELSE CAST(val_p AS DOUBLE)
              + (CAST(val_n AS DOUBLE) - CAST(val_p AS DOUBLE))
              * (date_diff('day', day_p, day) * 1.0
                 / date_diff('day', day_p, day_n))
       END, 6) AS DOUBLE) AS interp_value
FROM ctx
"""


@register("timeseries_interpolate", _INTERP_ORACLE)
def q_timeseries_interpolate(spark, sf_dir):
    """Gap-fill by LINEAR interpolation (TimescaleDB's
    ``interpolate()``): each missing day gets
    v_p + (v_n - v_p) * (day - day_p) / (day_n - day_p) between its
    neighboring observations; trailing days past the last observation
    fall back to carry-forward. Both neighbor contexts come from
    ignore-nulls windows over the SAME user_id partitioning — one
    exchange serves the backward (last) and forward (first) passes and
    the spine join. Day distances are integer datediffs; the value
    arithmetic runs on exact decimal observations widened to double in
    the same expression order on both engines."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("DAY", F.col("ts")).alias("day")
    ).agg(F.sum(F.expr(_VAL_DEC)).alias("day_value"))
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_next = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    observed = F.col("day_value").isNotNull()
    obs_day = F.when(observed, F.col("day"))
    ctx = joined.select(
        "user_id",
        "day",
        observed.alias("observed"),
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("day_p"),
        F.last("day_value", ignorenulls=True).over(w_prev).alias("val_p"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("day_n"),
        F.first("day_value", ignorenulls=True).over(w_next).alias("val_n"),
    )
    vp = F.col("val_p").cast("double")
    vn = F.col("val_n").cast("double")
    frac = F.datediff("day", "day_p") / F.datediff("day_n", "day_p")
    interp = (
        F.when(F.col("observed"), vp)
        .when(F.col("day_n").isNull(), vp)
        .otherwise(vp + (vn - vp) * frac)
    )
    return ctx.select(
        "user_id",
        "day",
        "observed",
        F.round(interp, 6).cast("double").alias("interp_value"),
    )


# ---------------------------------------------------------------------------
# timeseries_zscore_anomaly — trailing-window anomaly flags, exact math
# ---------------------------------------------------------------------------

_ZSCORE_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         SUM({_VAL_DEC}) AS v
  FROM events
  GROUP BY 1, 2
), ctx AS (
  SELECT event_type, day, v,
         CAST(count(*)  OVER w AS BIGINT) AS n,
         SUM(v)     OVER w AS s,
         SUM(v * v) OVER w AS sq
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, day,
       CAST(round(CAST(v AS DOUBLE), 6) AS DOUBLE) AS day_value,
       CAST(round(CASE WHEN n < 3 THEN NULL ELSE
         (CAST(v AS DOUBLE) - CAST(s AS DOUBLE) / n)
         / sqrt((n * CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                / (CAST(n AS DOUBLE) * (n - 1)))
       END, 4) AS DOUBLE) AS zscore
FROM ctx
"""


@register("timeseries_zscore_anomaly", _ZSCORE_ORACLE)
def q_timeseries_zscore_anomaly(spark, sf_dir):
    """Rolling anomaly score: each (event_type, day) rollup scored
    against its trailing 7-day window's mean and sample stddev. The
    moments come from DECIMAL sum and sum-of-squares over the window —
    stddev_samp on doubles is partial-order-dependent and flakes a
    cross-engine hash; the decimal sums are exact, and the variance
    formula (n*sq - s^2) / (n*(n-1)) then runs in double with one
    fixed expression order. Windows under 3 observations emit NULL
    (z-score of a 1-2 sample window is noise). One exchange keyed
    event_type; the frame is ROWS-bounded so state per group is 7
    rows."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("DAY", F.col("ts")).alias("day")
    ).agg(F.sum(F.expr(_VAL_DEC)).alias("v"))
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, W.currentRow)
    )
    ctx = daily.select(
        "event_type",
        "day",
        "v",
        F.count("*").over(w).alias("n"),
        F.sum("v").over(w).alias("s"),
        F.sum(F.col("v") * F.col("v")).over(w).alias("sq"),
    )
    vd = F.col("v").cast("double")
    sd = F.col("s").cast("double")
    sqd = F.col("sq").cast("double")
    n = F.col("n")
    # try_divide on the z itself: a CONSTANT window (3+ identical day
    # sums — a flatlined metric) has stddev exactly 0, where Spark's
    # IEEE 0/0 yields NaN but the oracle's NULL-on-zero-divisor yields
    # NULL (review r5; the n<3 guard only covers short windows)
    z = F.try_divide(
        vd - sd / n,
        F.sqrt((n * sqd - sd * sd) / (n.cast("double") * (n - 1))),
    )
    return ctx.select(
        "event_type",
        "day",
        F.round(vd, 6).cast("double").alias("day_value"),
        F.round(F.when(n < 3, F.lit(None)).otherwise(z), 4)
        .cast("double")
        .alias("zscore"),
    )


# ---------------------------------------------------------------------------
# timeseries_time_weighted_avg — TWA over irregular samples (LOCF-held)
# ---------------------------------------------------------------------------

_TWA_ORACLE = f"""
WITH seq AS (
  SELECT user_id, ts, {_VAL_DEC} AS v,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
), seg AS (
  SELECT user_id, v,
         CAST(date_diff('second', ts, nxt) AS BIGINT) AS dur_s
  FROM seq WHERE nxt IS NOT NULL
)
SELECT user_id,
       CAST(sum(dur_s) AS BIGINT) AS observed_s,
       CAST(round(CAST(sum(v * dur_s) AS DOUBLE) / sum(dur_s), 6)
            AS DOUBLE) AS time_weighted_avg,
       CAST(count(*) AS BIGINT) AS n_segments
FROM seg
GROUP BY user_id
HAVING sum(dur_s) > 0
"""


@register("timeseries_time_weighted_avg", _TWA_ORACLE)
def q_timeseries_time_weighted_avg(spark, sf_dir):
    """Time-weighted average over IRREGULAR samples (TimescaleDB's
    time_weight with LOCF interpolation): each observation holds until
    the next one, so its weight is the integer-second duration of its
    segment — the plain AVG the naive query computes instead
    over-weights bursts of rapid samples. lead() and the aggregate
    share one user_id exchange; decimal value x integer duration keeps
    every product exact, with one double division at the end. Users
    whose samples all share one second (zero observed duration) drop
    via HAVING rather than dividing by zero."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        F.expr(_VAL_DEC).alias("v"),
        F.lead("ts").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    seg = seq.select(
        "user_id",
        "v",
        (
            F.unix_timestamp(F.col("nxt").cast("timestamp"))
            - F.unix_timestamp(F.col("ts").cast("timestamp"))
        ).cast("bigint").alias("dur_s"),
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.sum("dur_s").cast("bigint").alias("observed_s"),
            F.round(
                F.sum(F.col("v") * F.col("dur_s")).cast("double")
                / F.sum("dur_s"),
                6,
            ).cast("double").alias("time_weighted_avg"),
            F.count("*").alias("n_segments"),
        )
        .filter(F.col("observed_s") > 0)
        .select("user_id", "observed_s", "time_weighted_avg", "n_segments")
    )


# ---------------------------------------------------------------------------
# timeseries_ewma — exponentially weighted moving average (recursive)
# ---------------------------------------------------------------------------

_EWMA_ALPHA = "0.3"  # smoothing weight, literal so both engines parse one

_EWMA_ORACLE = f"""
WITH RECURSIVE daily AS (
  SELECT user_id AS uid,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
), seq AS (
  SELECT uid, day, x,
         row_number() OVER (PARTITION BY uid ORDER BY day) AS i
  FROM daily
), ew(uid, day, i, e) AS (
  SELECT uid, day, i, x FROM seq WHERE i = 1
  UNION ALL
  SELECT s.uid, s.day, s.i,
         {_EWMA_ALPHA} * s.x + (1 - {_EWMA_ALPHA}) * ew.e
  FROM ew JOIN seq s ON s.uid = ew.uid AND s.i = ew.i + 1
)
SELECT uid, day, round(e, 6) AS ewma FROM ew
"""


@register("timeseries_ewma", _EWMA_ORACLE)
def q_timeseries_ewma(spark, sf_dir):
    """Exponentially weighted moving average over each user's daily
    event-count series — the inherently RECURSIVE smoother
    (e_i = αx_i + (1-α)e_{i-1}) that window functions cannot express.
    Spark shape: the series collapses to per-user day buckets first
    (one shuffle, state bounded by users × days), each user's ordered
    series folds through ONE ``aggregate`` lambda (JVM higher-order
    function — the recursion runs inside codegen over an array that
    is bounded by the series length per key, never the table), and
    the running outputs explode back to rows. At 100 TB the per-key
    series stays calendar-bounded (days, not events), which is what
    makes the collect safe — the same contract as the gapfill spine.
    Float parity note: both engines evaluate the identical
    α·x + (1-α)·e chain in the identical order, so the doubles agree
    bit-for-bit before the display round; the oracle is a recursive
    CTE stepping the same recurrence. A window-only approximation
    (e.g. weighting a fixed lookback) would mismatch — the hash
    covers every step of the recursion."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("user_id").alias("uid"),
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
    ).agg(F.count("*").cast("double").alias("x"))
    series = daily.groupBy("uid").agg(
        F.sort_array(F.collect_list(F.struct("day", "x"))).alias("s")
    )
    folded = series.select(
        "uid",
        F.expr(
            f"""
            aggregate(
              s,
              named_struct(
                'acc',
                cast(array() as array<struct<day: date, e: double>>),
                'last', cast(null as double)
              ),
              (st, p) -> named_struct(
                'acc',
                st.acc || array(named_struct(
                  'day', p.day,
                  'e',
                  CASE WHEN st.last IS NULL THEN p.x
                       ELSE {_EWMA_ALPHA} * p.x
                            + (1 - {_EWMA_ALPHA}) * st.last END
                )),
                'last',
                CASE WHEN st.last IS NULL THEN p.x
                     ELSE {_EWMA_ALPHA} * p.x
                          + (1 - {_EWMA_ALPHA}) * st.last END
              ),
              st -> st.acc
            )
            """
        ).alias("out"),
    )
    return folded.select(
        "uid", F.explode("out").alias("p")
    ).select(
        "uid",
        F.col("p.day").alias("day"),
        F.round(F.col("p.e"), 6).alias("ewma"),
    )
