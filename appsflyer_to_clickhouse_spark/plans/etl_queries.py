"""SURVEY.md §2 Part A — ETL parity operators as oracle-checked queries.

The reference consumes AppsFlyer CSV; the driver's tables are the
TPC-H-ish star, so each query *synthesizes* reference-shaped string
inputs deterministically from ``events`` (CASE on ``event_id % N``) and
then applies the operator under test. The oracle SQL synthesizes the
identical input and applies the reference semantics written directly in
DuckDB SQL — two independent implementations of the same kernel.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from ..functions.kernels import null_sentinel_normalize, parse_datetime_lenient
from ..operators.etl import (
    dedup_anti_join,
    filter_time_range,
    reorder_campaignid,
    run_installs_pipeline,
    scan_sink_keys,
    time_window_utc7,
)
from ..schemas import APPSFLYER_TO_CH, DATETIME_CH_COLS
from .registry import load, register

# Window covering the whole events table (ts spans 2024-01); both bounds
# inclusive, matching reference main.py:172-174.
WIN_FROM = "2024-01-08 00:00:00"
WIN_TO = "2024-01-25 00:00:00"
ALL_FROM = "2020-01-01 00:00:00"
ALL_TO = "2030-01-01 00:00:00"

_FMT_SQL = "%Y-%m-%d %H:%M:%S"


# ---------------------------------------------------------------------------
# parse_datetime_lenient
# ---------------------------------------------------------------------------

_PARSE_ORACLE = f"""
WITH src AS (
  SELECT event_id,
    CASE CAST(event_id % 9 AS INTEGER)
      WHEN 0 THEN NULL
      WHEN 1 THEN ' n/a '
      WHEN 2 THEN 'NULL'
      WHEN 3 THEN strftime(ts, '{_FMT_SQL}') || '.999'
      WHEN 4 THEN regexp_replace(strftime(ts, '{_FMT_SQL}'),
                                 '^(\\d{{4}}-\\d{{2}}-\\d{{2}}) 0(\\d):', '\\1 \\2:')
      WHEN 5 THEN replace(strftime(ts, '{_FMT_SQL}'), ' ', 'T')
      WHEN 6 THEN 'not a date'
      WHEN 8 THEN '2025-13-45 23:59:59'
      ELSE strftime(ts, '{_FMT_SQL}')
    END AS raw_dt
  FROM events
), norm AS (
  SELECT event_id, raw_dt,
    regexp_replace(split_part(trim(raw_dt), '.', 1),
                   '^(\\d{{4}}-\\d{{2}}-\\d{{2}}) (\\d):(\\d{{2}}):(\\d{{2}})$',
                   '\\1 0\\2:\\3:\\4') AS s2
  FROM src
)
SELECT event_id, raw_dt,
  CASE
    WHEN raw_dt IS NULL OR lower(trim(raw_dt)) IN ('', 'null', 'none', 'n/a') THEN NULL
    WHEN regexp_matches(s2, '^\\d{{4}}-\\d{{2}}-\\d{{2}} \\d{{2}}:\\d{{2}}:\\d{{2}}$')
      THEN try_strptime(s2, '{_FMT_SQL}')
    ELSE NULL
  END AS parsed
FROM norm
"""


@register("parse_datetime_lenient", _PARSE_ORACLE)
def q_parse_datetime(spark, sf_dir):
    """Lenient datetime kernel (reference main.py:87-105) over synthesized
    dirty inputs: NULLs, sentinels, fractional seconds, unpadded hours,
    ISO-T (rejected), garbage, and a regex-valid but calendar-invalid
    value ('2025-13-45 23:59:59'): the reference CRASHES on it
    (strptime raises, main.py:101-103) — this engine and the oracle
    both return NULL (try_to_timestamp / try_strptime), pinning the
    documented divergence (ADVICE r1)."""
    ev = load(spark, sf_dir, "events")
    base = F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    m = (F.col("event_id") % 9).cast("int")
    raw = (
        F.when(m == 0, F.lit(None).cast("string"))
        .when(m == 1, F.lit(" n/a "))
        .when(m == 2, F.lit("NULL"))
        .when(m == 3, F.concat(base, F.lit(".999")))
        .when(m == 4, F.regexp_replace(base, r"^(\d{4}-\d{2}-\d{2}) 0(\d):", r"$1 $2:"))
        .when(m == 5, F.regexp_replace(base, " ", "T"))
        .when(m == 6, F.lit("not a date"))
        .when(m == 8, F.lit("2025-13-45 23:59:59"))
        .otherwise(base)
    )
    return ev.select(
        "event_id",
        raw.alias("raw_dt"),
        parse_datetime_lenient(raw).alias("parsed"),
    )


# ---------------------------------------------------------------------------
# null_sentinel_normalize
# ---------------------------------------------------------------------------

_SENTINEL_ORACLE = """
WITH src AS (
  SELECT event_id,
    CASE CAST(event_id % 6 AS INTEGER)
      WHEN 0 THEN ''
      WHEN 1 THEN 'null'
      WHEN 2 THEN 'None'
      WHEN 3 THEN 'NULL'
      WHEN 4 THEN ' null '
      ELSE event_type
    END AS raw_val
  FROM events
)
SELECT event_id, raw_val,
  CASE WHEN raw_val IN ('', 'null', 'None') THEN NULL ELSE raw_val END AS normalized
FROM src
"""


@register("null_sentinel_normalize", _SENTINEL_ORACLE)
def q_null_sentinel(spark, sf_dir):
    """Exact-case string sentinel kernel (reference main.py:165).
    'NULL' and ' null ' must pass through — the string set is
    deliberately narrower than the datetime set (SURVEY.md §7)."""
    ev = load(spark, sf_dir, "events")
    m = (F.col("event_id") % 6).cast("int")
    raw = (
        F.when(m == 0, F.lit(""))
        .when(m == 1, F.lit("null"))
        .when(m == 2, F.lit("None"))
        .when(m == 3, F.lit("NULL"))
        .when(m == 4, F.lit(" null "))
        .otherwise(F.col("event_type"))
    )
    return ev.select(
        "event_id", raw.alias("raw_val"), null_sentinel_normalize(raw).alias("normalized")
    )


# ---------------------------------------------------------------------------
# project_rename
# ---------------------------------------------------------------------------


@register(
    "project_rename",
    """
    SELECT event_id AS id, event_type AS etype, props AS props_json,
           CAST(NULL AS VARCHAR) AS missing_col
    FROM events
    """,
)
def q_project_rename(spark, sf_dir):
    """Dict-driven projection+rename with missing-source -> NULL
    (reference main.py:19-69, 157-166). One Project node; unmapped
    columns pruned from the scan."""
    from ..operators.etl import project_rename

    ev = load(spark, sf_dir, "events")
    mapping = {
        "event_id": "id",
        "event_type": "etype",
        "props": "props_json",
        "no_such_column": "missing_col",
    }
    return project_rename(ev, mapping)


@register(
    "reorder_campaignid",
    """
    SELECT event_type AS media_source, props AS campaignid,
           value AS x, event_id
    FROM events
    """,
)
def q_reorder_campaignid(spark, sf_dir):
    """Intended semantics of reference main.py:144-154: campaignid placed
    immediately after media_source in the select-list order. (The
    reference's own implementation duplicates columns and crashes —
    divergence documented in operators.etl.reorder_campaignid.)"""
    ev = load(spark, sf_dir, "events")
    df = ev.select(
        F.col("event_type").alias("media_source"),
        F.col("value").alias("x"),
        F.col("props").alias("campaignid"),
        "event_id",
    )
    return df.select(*reorder_campaignid(df.columns))


# ---------------------------------------------------------------------------
# time window + pushdown filter + key scan + anti join
# ---------------------------------------------------------------------------


@register(
    "time_window_utc7",
    """
    SELECT strftime(TIMESTAMP '2026-01-15 03:04:05' + INTERVAL 5 HOUR,
                    '%Y-%m-%d %H:%M:%S') AS from_time,
           strftime(TIMESTAMP '2026-01-15 03:04:05' + INTERVAL 7 HOUR,
                    '%Y-%m-%d %H:%M:%S') AS to_time
    """,
)
def q_time_window(spark, sf_dir):
    """[now+7h − 2h, now+7h] window strings (reference main.py:107-112),
    pinned to an injected 'now' for determinism. The oracle recomputes
    it independently with interval arithmetic."""
    f, t = time_window_utc7(2, now_utc=datetime(2026, 1, 15, 3, 4, 5, tzinfo=timezone.utc))
    return spark.range(1).select(F.lit(f).alias("from_time"), F.lit(t).alias("to_time"))


@register(
    "filter_time_range_pushdown",
    f"""
    SELECT event_id, ts, user_id, event_type
    FROM events
    WHERE ts >= TIMESTAMP '{WIN_FROM}' AND ts <= TIMESTAMP '{WIN_TO}'
    """,
)
def q_filter_time_range(spark, sf_dir):
    """Inclusive-both-bounds window predicate (reference main.py:116-118,
    172-174), pushed into the parquet scan. The testdata stores ts as
    raw int64 nanos, so the bounds are translated to nanos and applied
    to the physical column (registry.load_windowed) — PushedFilters
    then carries the window into row-group pruning, exactly as a
    TIMESTAMP column would at 100 TB. Plan shape pinned in
    tests/test_plan_shapes.py."""
    from .registry import load_windowed

    return load_windowed(spark, sf_dir, "events", "ts", WIN_FROM, WIN_TO).select(
        "event_id", "ts", "user_id", "event_type"
    )


@register(
    "scan_sink_keys",
    f"""
    SELECT DISTINCT CAST(user_id AS VARCHAR) AS appsflyer_id
    FROM events
    WHERE ts >= TIMESTAMP '{WIN_FROM}' AND ts <= TIMESTAMP '{WIN_TO}'
      AND user_id IS NOT NULL AND CAST(user_id AS VARCHAR) != ''
    """,
)
def q_scan_sink_keys(spark, sf_dir):
    """Windowed distinct non-falsy key scan (reference main.py:169-176).
    Stays distributed — never collected to the driver."""
    ev = load(spark, sf_dir, "events")
    sink = ev.select(F.col("ts").alias("install_time"), F.col("user_id").alias("appsflyer_id"))
    return scan_sink_keys(sink, WIN_FROM, WIN_TO)


@register(
    "distinct_keys",
    "SELECT DISTINCT user_id FROM events",
)
def q_distinct_keys(spark, sf_dir):
    """DISTINCT on one column (reference main.py:175's set())."""
    return load(spark, sf_dir, "events").select("user_id").distinct()


@register(
    "count_rows",
    "SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem",
)
def q_count_rows(spark, sf_dir):
    """COUNT(*) (reference main.py:136/176/181)."""
    return load(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))


_ANTI_ORACLE = """
WITH incoming AS (
  SELECT event_id, CAST(user_id AS VARCHAR) AS appsflyer_id, event_type
  FROM events WHERE event_id % 10 >= 3
), existing AS (
  SELECT DISTINCT CAST(user_id AS VARCHAR) AS appsflyer_id
  FROM events WHERE event_id % 10 < 3
)
SELECT i.event_id, i.appsflyer_id, i.event_type
FROM incoming i
WHERE i.appsflyer_id IS NOT NULL AND i.appsflyer_id != ''
  AND NOT EXISTS (SELECT 1 FROM existing e WHERE e.appsflyer_id = i.appsflyer_id)
"""


@register("dedup_anti_join", _ANTI_ORACLE)
def q_dedup_anti_join(spark, sf_dir):
    """Left ANTI join on a single string key (reference main.py:175-181).
    Physical plan: BroadcastHashJoin LeftAnti — the key side is one
    window's IDs, tiny next to the batch, so the 100 TB side never
    shuffles. Within-batch duplicates survive (reference quirk)."""
    ev = load(spark, sf_dir, "events")
    incoming = ev.filter(F.col("event_id") % 10 >= 3).select(
        "event_id",
        F.col("user_id").cast("string").alias("appsflyer_id"),
        "event_type",
    )
    existing = (
        ev.filter(F.col("event_id") % 10 < 3)
        .select(F.col("user_id").cast("string").alias("appsflyer_id"))
        .distinct()
    )
    return dedup_anti_join(incoming, existing).select(
        "event_id", "appsflyer_id", "event_type"
    )


# ---------------------------------------------------------------------------
# etl_pipeline — the reference's entire main() end-to-end (flagship)
# ---------------------------------------------------------------------------


def _pipeline_oracle() -> str:
    """Generate the 49-column oracle from the same mapping the Spark
    side uses, so the two can't drift."""
    # Non-datetime populated columns go through the same exact-case
    # sentinel normalization the Spark side applies to EVERY string
    # column (ADVICE r1: the oracle must mirror it, and the synthesized
    # batch must actually contain sentinels — see raw CTE below).
    def norm(c: str) -> str:
        return f"CASE WHEN {c} IN ('', 'null', 'None') THEN NULL ELSE {c} END"

    populated = {
        "install_time": f"try_strptime(install_time_s, '{_FMT_SQL}')",
        "event_time": f"try_strptime(split_part(event_time_s, '.', 1), '{_FMT_SQL}')",
        "media_source": norm("media_source"),
        "campaignid": norm("campaignid"),
        "campaign": norm("campaign"),
        "appsflyer_id": norm("appsflyer_id"),
    }
    cols = []
    for c in reorder_campaignid(list(APPSFLYER_TO_CH.values())):
        if c in populated:
            cols.append(f"{populated[c]} AS {c}")
        elif c in DATETIME_CH_COLS:
            cols.append(f"CAST(NULL AS TIMESTAMP) AS {c}")
        else:
            cols.append(f"CAST(NULL AS VARCHAR) AS {c}")
    select_list = ",\n       ".join(cols)
    return f"""
WITH raw AS (
  SELECT strftime(ts, '{_FMT_SQL}') AS install_time_s,
         strftime(ts, '{_FMT_SQL}') || '.123' AS event_time_s,
         CASE WHEN event_id % 89 = 0 THEN ''
              ELSE event_type END AS media_source,
         'c' || CAST(event_id % 50 AS VARCHAR) AS campaignid,
         CASE WHEN event_id % 83 = 0 THEN 'None'
              ELSE props END AS campaign,
         CASE WHEN event_id % 97 = 0 THEN 'null'
              ELSE CAST(event_id // 3 AS VARCHAR) END AS appsflyer_id
  FROM events
), existing AS (
  SELECT DISTINCT CAST(event_id // 3 AS VARCHAR) AS k
  FROM events
  WHERE event_id % 5 = 0
    AND ts >= TIMESTAMP '{ALL_FROM}' AND ts <= TIMESTAMP '{ALL_TO}'
)
SELECT {select_list}
FROM raw
WHERE appsflyer_id IS NOT NULL AND appsflyer_id NOT IN ('', 'null', 'None')
  AND NOT EXISTS (SELECT 1 FROM existing e WHERE e.k = raw.appsflyer_id)
"""


def _synth_af_batch(spark, sf_dir):
    """AppsFlyer-shaped raw frame (display-name string columns)
    synthesized from events."""
    ev = load(spark, sf_dir, "events")
    base = F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    return ev.select(
        base.alias("Install Time"),
        F.concat(base, F.lit(".123")).alias("Event Time"),
        # sentinel values planted so null_sentinel_normalize is
        # exercised end-to-end on every populated column (ADVICE r1)
        F.when(F.col("event_id") % 89 == 0, F.lit(""))
        .otherwise(F.col("event_type"))
        .alias("Media Source"),
        F.concat(F.lit("c"), (F.col("event_id") % 50).cast("string")).alias("Campaign ID"),
        F.when(F.col("event_id") % 83 == 0, F.lit("None"))
        .otherwise(F.col("props"))
        .alias("Campaign"),
        F.when(F.col("event_id") % 97 == 0, F.lit("null"))
        .otherwise(F.expr("event_id DIV 3").cast("string"))
        .alias("AppsFlyer ID"),
    )


@register("etl_pipeline", _pipeline_oracle())
def q_etl_pipeline(spark, sf_dir):
    """Flagship: the reference's main() (main.py:132-192) as one lazy
    lineage — project+rename (43 missing sources -> NULL), both scalar
    kernels, windowed sink-key scan, broadcast anti-join. Returns the
    would-be-inserted rows."""
    raw = _synth_af_batch(spark, sf_dir)
    ev = load(spark, sf_dir, "events")
    sink = ev.filter(F.col("event_id") % 5 == 0).select(
        F.col("ts").alias("install_time"),
        F.expr("event_id DIV 3").cast("string").alias("appsflyer_id"),
    )
    return run_installs_pipeline(raw, sink, ALL_FROM, ALL_TO)
