"""Differential comparison harness mirroring the driver's t2 gate:
row-count + schema + order-insensitive value comparison between a Spark
DataFrame and a DuckDB oracle query over the same parquet tables.

Comparison is EXACT on values (after canonicalization of container
types) — queries are responsible for making float results
engine-independent (decimal-exact sums, explicit rounding).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from appsflyer_to_clickhouse_spark.schemas import TESTDATA_TABLES


_CONN_CACHE: dict[str, "duckdb.DuckDBPyConnection"] = {}


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    # one connection per sf_dir per process: ~300 compare() calls per
    # suite each paid a fresh connect + 10 view binds otherwise. Views
    # are read-only over immutable parquet, so reuse cannot leak state
    # between tests.
    con = _CONN_CACHE.get(sf_dir)
    if con is not None:
        return con
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    _CONN_CACHE[sf_dir] = con
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        tuple(repr(_canon(r[i])) for i in order) for r in rows
    )
    return [cols[i] for i in order], canon


# DuckDB logical types whose pandas materialization diverges from their
# fetchall() repr.  The external correctness gate hashes results through
# pandas (HUGEINT -> float64, so 1029 hashes as 1029.0; LIST -> ndarray,
# unhashable), while fetchall() canonicalizes them to Python ints/lists.
# Round 2 (agg_percentiles, LIST) and round 3 (text_pack_sequences +
# corpus_build_pipeline, HUGEINT window SUM) both passed this harness and
# failed the external gate for exactly that reason — so any oracle whose
# RESULT schema contains one of these types is rejected outright, even
# when the values match.  Fix the oracle (CAST ... AS BIGINT / unnest)
# rather than loosening this list.
_PANDAS_UNSAFE_TYPES = ("HUGEINT", "UHUGEINT", "LIST", "STRUCT", "MAP", "UNION")
# DuckDB renders list types as "TYPE[]" (e.g. "BIGINT[]"), never as the
# word LIST — the "[]" suffix check below is what actually catches the
# round-2 agg_percentiles class; "LIST" is kept for array-ish aliases.


def assert_pandas_safe(rel) -> None:
    """Reject oracle result schemas that pandas would re-type.

    ``rel`` is a DuckDB relation (``con.sql(query)``).  Raises
    AssertionError naming the offending column(s) and type(s).
    """
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if any(h in str(t).upper() for h in _PANDAS_UNSAFE_TYPES)
        or "[]" in str(t)
    ]
    assert not bad, (
        "oracle result schema contains pandas-unsafe DuckDB types "
        f"{bad}: the external gate hashes through pandas, where these "
        "materialize as float64/ndarray and hash-mismatch Spark even "
        "when values are equal. CAST the column (e.g. a windowed SUM "
        "to BIGINT) or unnest it in the oracle SQL."
    )


def compare(spark_df, oracle_query: str, sf_dir: str) -> None:
    """Raises AssertionError with a diff summary on any mismatch."""
    con = duckdb_conn(sf_dir)
    cur = con.sql(oracle_query)
    assert_pandas_safe(cur)
    o_cols = list(cur.columns)
    o_rows = cur.fetchall()

    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]

    assert sorted(s_cols) == sorted(o_cols), (
        f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )

    _, s_set = _rowset(s_cols, s_rows)
    _, o_set = _rowset(o_cols, o_rows)
    if s_set != o_set:
        diffs = [
            (a, b) for a, b in zip(s_set, o_set) if a != b
        ][:5]
        raise AssertionError(
            f"value mismatch ({sum(1 for a, b in zip(s_set, o_set) if a != b)} rows differ); "
            f"first diffs (spark vs oracle): {diffs}"
        )
