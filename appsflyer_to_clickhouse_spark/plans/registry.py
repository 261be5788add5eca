"""Registration plumbing for the oracle-differential query suite.

Each query is registered under a stable opID (SURVEY.md §2) together
with an equivalent DuckDB ANSI-SQL oracle. The driver (and
``tests/test_oracle_differential.py``) runs both on the same parquet
tables and compares row-count + schema + order-insensitive value-hash,
so every query aliases computed columns identically on both sides and
rounds float aggregates explicitly to make values engine-independent.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

# Tables whose parquet files carry INT64 TIMESTAMP(NANOS) columns —
# illegal for Spark's reader, so the session reads them as raw nanos
# (spark.sql.legacy.parquet.nanosAsLong) and we convert here. Integer
# `DIV 1000` truncates toward zero, matching DuckDB's nanos->micros
# conversion exactly (verified against the testdata residues).
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def register(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame query; ``oracle`` is the
    DuckDB twin (None => non-SQL-expressible, rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    for c in _NANOS_TS_COLS.get(table, ()):
        if isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} DIV 1000")))
    return df
