"""Adversarial-input differential tests for the time-series /
analytics families: a crafted ``events`` table exercises exactly the
edges the sf tables rarely hit — single-observation users, multi-day
gaps, funnel steps out of order, same-timestamp ties — and every query
must STILL hash-match its DuckDB oracle on that input (same contract
as the driver's t2 gate, harder data).
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from appsflyer_to_clickhouse_spark.plans import ORACLE, QUERIES
from appsflyer_to_clickhouse_spark.schemas import TESTDATA_TABLES

from .oracle_harness import compare

_EDGE_QUERIES = [
    "timeseries_gapfill",
    "timeseries_interpolate",
    "timeseries_ohlc",
    "timeseries_zscore_anomaly",
    "events_funnel",
    "scd2_change_intervals",
    "window_lag_sessionize",
    "join_range_bucketed",
    "events_attribution_linear",
    "events_attribution_decay",
    "stream_stream_join",
]


def _t(day: int, h: int = 0, m: int = 0, s: int = 0):
    return dt.datetime(2024, 1, day, h, m, s)


_ROWS = [
    # user 1: a single lone event — 1-day spine, version-1 SCD row,
    # zscore window of one (NULL z)
    (100, _t(3, 12), 1, "view", 10.0, "{}"),
    # user 2: observations on day 1 and day 5 — 3 missing days between;
    # interpolation fractions 1/4, 2/4, 3/4 and LOCF past nothing
    (200, _t(1, 6), 2, "view", 8.0, "{}"),
    (201, _t(5, 6), 2, "view", 16.0, "{}"),
    # user 3: click BEFORE any view — must NOT convert step 2
    (300, _t(2, 1), 3, "click", 1.0, "{}"),
    (301, _t(2, 2), 3, "view", 1.0, "{}"),
    # user 4: click at EXACTLY the first-view timestamp (>= boundary)
    (400, _t(4, 8), 4, "view", 2.0, "{}"),
    (401, _t(4, 8), 4, "click", 2.0, "{}"),
    (402, _t(4, 9), 4, "purchase", 2.0, "{}"),
    # user 5: purchase before its click — the early purchase must not
    # complete the funnel; the later one does
    (500, _t(6, 1), 5, "view", 3.0, "{}"),
    (501, _t(6, 2), 5, "purchase", 3.0, "{}"),
    (502, _t(6, 3), 5, "click", 3.0, "{}"),
    (503, _t(6, 4), 5, "purchase", 3.0, "{}"),
    # user 6: same-timestamp tie with distinct event_ids and values —
    # OHLC open/close and SCD2 ordering must use the event_id tiebreak
    (600, _t(7, 5), 6, "view", 50.0, "{}"),
    (601, _t(7, 5), 6, "click", 60.0, "{}"),
    (602, _t(7, 5), 6, "view", 70.0, "{}"),
    # user 7: its only touch is 8 days before the purchase — outside
    # the 7-day attribution lookback; the conversion earns no credit
    (700, _t(1, 0), 7, "view", 1.0, "{}"),
    (701, _t(9, 0), 7, "purchase", 1.0, "{}"),
    # user 8: one touch exactly AT the conversion instant and one
    # exactly 7 days before it — both INCLUSIVE window boundaries, and
    # the at-instant pair also exercises the stream-stream join's
    # p_ts >= v_ts equality edge
    (800, _t(1, 12), 8, "view", 1.0, "{}"),
    (801, _t(8, 12), 8, "view", 1.0, "{}"),
    (802, _t(8, 12), 8, "purchase", 1.0, "{}"),
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("edge_sf")
    src = "/root/testdata/sf0.001"
    for t in TESTDATA_TABLES:
        if t != "events":
            os.symlink(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))
    # single parquet FILE (like the driver testdata — both engines read
    # the same path), naive microsecond timestamps
    cols = list(zip(*_ROWS))
    table = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], pa.timestamp("us")),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("name", _EDGE_QUERIES)
def test_edge_semantics_match_oracle(spark, edge_dir, name):
    compare(QUERIES[name](spark, edge_dir), ORACLE[name], edge_dir)


def test_funnel_edge_counts(spark, edge_dir):
    """Pin the intended funnel semantics on the crafted rows: 8 viewing
    users (7 and 8 are the attribution-window users — views, no
    clicks); the at-boundary clicks (users 4 and 6, ts == first view)
    and user 5's post-view click convert, while user 3's
    click-before-view does not; users 4 and 5 purchase at-or-after
    their click (user 5's EARLIER purchase alone would not have
    counted — and users 7/8 purchase without ever clicking)."""
    row = QUERIES["events_funnel"](spark, edge_dir).collect()[0]
    assert row.n_view == 8
    assert row.n_view_click == 3  # users 4, 5, 6
    assert row.n_view_click_purchase == 2  # users 4 and 5


# ---------------------------------------------------------------------------
# crafted customer/orders edges: zero-order customers, revenue ties,
# year-boundary cohorts, urgent-only customers
# ---------------------------------------------------------------------------

_CUSTOMERS = [
    (1, "C1", 0, 100.0, "SEG_A"),
    (2, "C2", 1, 200.0, "SEG_A"),
    (3, "C3", 2, 300.0, "SEG_B"),
    (4, "C4", 3, 400.0, "SEG_B"),
    (5, "C5", 4, 500.0, "SEG_C"),  # no orders at all
]

_ORDERS = [
    # c1: single order, 1-URGENT only -> q13 must count it as ZERO
    (10, 1, "F", 1000.0, dt.datetime(2024, 1, 5), "1-URGENT"),
    # c2: orders spanning a year boundary -> cohort offsets 0, 2, 12
    (20, 2, "O", 500.0, dt.datetime(2024, 1, 10), "5-LOW"),
    (21, 2, "O", 500.0, dt.datetime(2024, 3, 15), "5-LOW"),
    (22, 2, "P", 500.0, dt.datetime(2025, 1, 20), "5-LOW"),
    # c3 and c4: IDENTICAL total revenue -> rank tiebreak must decide
    (30, 3, "F", 750.0, dt.datetime(2024, 6, 1), "2-HIGH"),
    (40, 4, "F", 750.0, dt.datetime(2024, 6, 2), "2-HIGH"),
]


@pytest.fixture(scope="module")
def orders_edge_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("edge_orders_sf")
    src = "/root/testdata/sf0.001"
    for t in TESTDATA_TABLES:
        if t not in ("customer", "orders"):
            os.symlink(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))
    ccols = list(zip(*_CUSTOMERS))
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(ccols[0], pa.int64()),
                "c_name": pa.array(ccols[1], pa.string()),
                "c_nationkey": pa.array(ccols[2], pa.int32()),
                "c_acctbal": pa.array(ccols[3], pa.float64()),
                "c_mktsegment": pa.array(ccols[4], pa.string()),
            }
        ),
        str(d / "customer.parquet"),
    )
    ocols = list(zip(*_ORDERS))
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(ocols[0], pa.int64()),
                "o_custkey": pa.array(ocols[1], pa.int64()),
                "o_orderstatus": pa.array(ocols[2], pa.string()),
                "o_totalprice": pa.array(ocols[3], pa.float64()),
                "o_orderdate": pa.array(ocols[4], pa.timestamp("us")),
                "o_orderpriority": pa.array(ocols[5], pa.string()),
            }
        ),
        str(d / "orders.parquet"),
    )
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "orders_retention_cohort",
        "orders_rfm_segments",
        "orders_pareto_concentration",
        "groupcount_dist_q13",
    ],
)
def test_orders_edge_semantics_match_oracle(spark, orders_edge_dir, name):
    compare(QUERIES[name](spark, orders_edge_dir), ORACLE[name], orders_edge_dir)


def test_q13_counts_urgent_only_customer_as_zero(spark, orders_edge_dir):
    """c1 has only a 1-URGENT order (excluded in the join condition)
    and c5 has none: both land in the zero-order bucket, which a WHERE
    instead of a join-condition filter would silently drop."""
    rows = {
        r["c_count"]: r["custdist"]
        for r in QUERIES["groupcount_dist_q13"](spark, orders_edge_dir).collect()
    }
    assert rows[0] == 2  # c1 (urgent-only) and c5 (orderless)


# ---------------------------------------------------------------------------
# empty-events edges: every aggregate/window family must agree with the
# oracle on ZERO input rows (0/0 rates, empty windows, empty spines)
# ---------------------------------------------------------------------------

_EMPTY_QUERIES = [
    "timeseries_gapfill",
    "timeseries_interpolate",
    "timeseries_ohlc",
    "timeseries_zscore_anomaly",
    "events_funnel",          # 0/0 conversion rates
    "scd2_change_intervals",
    "events_markov_transitions",
    "agg_mode_deterministic",
    "profile_null_stats",     # count(*)=0 -> 0/0 null_frac
    "distinct_keys",
    "count_rows",             # lineitem-based: unaffected, sanity
    "features_standardize",   # empty stats row, empty output
    # round-3 events-based additions
    "profile_drift_kl",       # empty joint -> NULL drift statistics
    "events_rolling_dau",     # no days -> empty output
    "join_scd2_asof",         # no facts, no dim intervals
    "agg_countmin_heavyhitters",  # no daily sketches to merge
    "sink_datasource_batch",  # zero flushes, empty manifest round trip
    "sink_schema_evolution",  # two empty writes still reconcile
    # second-batch events queries: funnel's 0/0 parity (try_divide vs
    # DuckDB NULL) and the empty conversion-path join are only
    # guaranteed by this sweep
    "events_funnel_timebound",
    "events_conversion_paths",
]


@pytest.fixture(scope="module")
def empty_events_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("edge_empty_sf")
    src = "/root/testdata/sf0.001"
    for t in TESTDATA_TABLES:
        if t != "events":
            os.symlink(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "value": pa.array([], pa.float64()),
                "props": pa.array([], pa.string()),
            }
        ),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("name", _EMPTY_QUERIES)
def test_empty_events_match_oracle(spark, empty_events_dir, name):
    compare(QUERIES[name](spark, empty_events_dir), ORACLE[name], empty_events_dir)


def test_standardize_single_row_yields_null_not_nan(spark):
    """Review r5: with ONE non-null value the sample-variance
    denominator n*(n-1) is 0 — Spark's IEEE double division produced
    NaN where the oracle's NULL-on-zero-divisor produced NULL. Both
    scalings must be NULL (min==max kills minmax too), never NaN."""
    import math
    from unittest import mock

    import appsflyer_to_clickhouse_spark.plans.feature_queries as fq

    one = spark.createDataFrame(
        [(1, 7.5), (2, None)], "event_id long, value double"
    )
    with mock.patch.object(fq, "load", lambda s, d, t: one):
        rows = fq.q_features_standardize(spark, "unused").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["value_z"] is None and r["value_minmax"] is None
    assert not any(
        isinstance(x, float) and math.isnan(x) for x in r if x is not None
    )


def test_zscore_constant_window_yields_null_not_nan(spark):
    """Review r5: a flatlined metric (3+ identical day sums) has
    stddev exactly 0 — Spark's IEEE 0/0 produced NaN where the
    oracle's NULL-on-zero-divisor produced NULL."""
    import datetime as dt
    import math
    from unittest import mock

    import appsflyer_to_clickhouse_spark.plans.timeseries_queries as tq

    rows = [
        (i, dt.datetime(2024, 1, 1 + d, 10, 0, 0), "flat", 5.0)
        for i, d in enumerate(range(5))
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    with mock.patch.object(tq, "load", lambda s, d, t: ev):
        out = tq.q_timeseries_zscore_anomaly(spark, "unused").collect()
    assert len(out) == 5
    for r in out:
        z = r["zscore"]
        assert z is None or not math.isnan(z), out
    # windows of >= 3 constant observations: NULL, not NaN or 0
    by_day = sorted(out, key=lambda r: r["day"])
    assert all(r["zscore"] is None for r in by_day[2:])
