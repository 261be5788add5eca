"""Pins on the __spark_entry__ driver contract itself: the external
harness hands us ITS session (arbitrary conf), checks the first 50
registered queries, and may call any query repeatedly.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod

from appsflyer_to_clickhouse_spark.plans import ORACLE, QUERIES

import pytest

from .conftest import SF_SMALL
from .oracle_harness import assert_pandas_safe, compare, duckdb_conn


def test_queries_and_oracles_align():
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(osql) <= set(qs)
    # every windowed (first-50) query must have an exact oracle
    window = list(qs)[:50]
    missing = [n for n in window if n not in osql]
    assert not missing, f"windowed queries without oracle: {missing}"
    # the rows-only remainder is the known MLlib set, nothing else
    rows_only = set(qs) - set(osql)
    assert rows_only == {
        "dedup_minhash_mllib",
        "similarity_ivf_kmeans",
        "similarity_brp_mllib",
        "dedup_semantic_kmeans",
        "text_quality_classifier",
    }, rows_only


def test_wrapper_rescues_wrong_session_timezone(spark):
    """The driver may hand us a session with any timezone; the
    queries() wrapper must pin UTC per call or every timestamp compare
    drifts. Probe: break the conf, run a timestamp-heavy query twice,
    hash-match the oracle both times."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        q = entry_mod.queries()["parse_datetime_lenient"]
        for _ in range(2):
            compare(q(spark, SF_SMALL), ORACLE["parse_datetime_lenient"], SF_SMALL)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_registry_window_is_exactly_fifty():
    assert list(QUERIES)[:50] == list(entry_mod.queries())[:50]
    assert len(QUERIES) >= 115


def test_window_order_frozen():
    """The graded surface is position-sensitive: the external gate reads
    the FIRST 50 registered queries. plans/__init__ asserts presence of
    every _WINDOW name but not ORDER — a future registration or an edit
    to _reorder could silently shuffle the graded slots. Pin the exact
    sequence (VERDICT r3 task 8)."""
    from appsflyer_to_clickhouse_spark.plans import _WINDOW

    assert list(QUERIES)[:50] == _WINDOW
    assert list(ORACLE)[:50] == _WINDOW


def test_all_oracles_pandas_safe():
    """Bind every registered oracle in DuckDB and reject result schemas
    containing HUGEINT/LIST/STRUCT/MAP — the types whose pandas
    materialization diverges from fetchall() (rounds 2 and 3 each lost
    a driver row to exactly this class; see oracle_harness)."""
    con = duckdb_conn(SF_SMALL)
    bad = []
    for name, sql in ORACLE.items():
        try:
            assert_pandas_safe(con.sql(sql))
        except AssertionError as e:
            bad.append((name, str(e).split(":")[0]))
    assert not bad, bad


def test_pandas_safe_guard_trips_on_hugeint():
    """Self-test: a windowed SUM(BIGINT) without a cast IS HUGEINT in
    DuckDB and must trip the guard (otherwise the guard is decorative)."""
    con = duckdb_conn(SF_SMALL)
    rel = con.sql(
        "SELECT o_custkey, SUM(o_custkey) OVER (ORDER BY o_orderkey) AS s "
        "FROM orders LIMIT 5"
    )
    with pytest.raises(AssertionError, match="pandas-unsafe"):
        assert_pandas_safe(rel)
    # and the cast that queries are expected to apply makes it safe
    assert_pandas_safe(
        con.sql(
            "SELECT o_custkey, CAST(SUM(o_custkey) OVER (ORDER BY o_orderkey)"
            " AS BIGINT) AS s FROM orders LIMIT 5"
        )
    )


def test_pandas_safe_guard_trips_on_list():
    """Self-test for the round-2 agg_percentiles class: DuckDB renders
    list types as "TYPE[]" (never the word LIST), so the guard must
    match the bracket suffix — pandas materializes these cells as
    unhashable numpy arrays in the external gate."""
    con = duckdb_conn(SF_SMALL)
    rel = con.sql(
        "SELECT list(o_custkey) AS l FROM orders GROUP BY o_orderstatus"
    )
    with pytest.raises(AssertionError, match="pandas-unsafe"):
        assert_pandas_safe(rel)


def test_no_complex_typed_result_columns(spark, built_queries):
    """External canonicalizers hash result CELLS and die on
    list/struct/map-typed values (round-2's agg_percentiles err row:
    pandas TypeError on unhashable list). Pin the whole registry to
    scalar-only result schemas — any array/map/struct/variant/binary
    output column must be flattened (q25/q50/q90 scalars, _csv
    strings, hex digests) BEFORE registration."""
    import re

    bad = []
    for name in entry_mod.queries():
        df = built_queries(name)
        for f in df.schema.fields:
            if re.match(r"array|map|struct|variant|binary",
                        f.dataType.simpleString()):
                bad.append((name, f.name, f.dataType.simpleString()[:40]))
    assert not bad, bad
