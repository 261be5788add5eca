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
