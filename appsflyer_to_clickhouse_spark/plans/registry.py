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
        # fail at import, not silently: a name collision would DELETE
        # the earlier query from the registry — grouping_sets_agg was
        # registered twice across modules and the first version never
        # ran (or was oracle-checked) until the duplicate was found.
        # ValueError, not assert: the guard must survive `python -O`.
        if name in QUERIES:
            raise ValueError(
                f"duplicate query registration: {name!r} "
                f"({QUERIES[name].__module__} vs {fn.__module__})"
            )
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


def load_fanout(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    cols: list[str] | None = None,
) -> DataFrame:
    """``load()`` plus a round-robin fan-out when the scan yields fewer
    input splits than cores.

    The testdata tables are single-file, single-row-group parquet, so
    Spark's split planning hands the whole scan ONE task — and any
    md5/shingle-heavy map stage downstream would run on one core of 32.
    At production scale the scan has thousands of row-group splits and
    this branch never fires (the repartition is skipped, not merely
    cheap). Round-robin rather than a key: nothing downstream depends
    on the distribution, and the fanned payload is the raw scan output
    — a few MB here, exactly one pass of the source at any scale.

    Use for queries whose cost is per-row hashing (signature families,
    n-gram decontamination); keep plain ``load`` for cheap map-only
    kernels so their zero-Exchange plan pins stay meaningful.

    ``cols``: project to exactly these columns BEFORE the fan-out
    exchange (opt guide §2.3 — shuffle only the bytes the query
    consumes; the scan prunes to the same set)."""
    df = load(spark, sf_dir, table)
    if cols is not None:
        df = df.select(*cols)
    n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        df = df.repartition(n)
    return df


def run_overlapped(spark: SparkSession, fn, items, max_workers: int = 2):
    """Run independent Spark jobs over ``items`` from a small thread
    pool (opt guide §2.6) so one job's commit/teardown tail back-fills
    with the next job's tasks. Each worker pins the JVM-side ACTIVE
    session first: Python Data Source lookup resolves through the
    thread-local active session, which a fresh py4j worker thread does
    not inherit (plain pools raise DATA_SOURCE_NOT_FOUND for every
    registered Python source). Safe only for jobs whose effects are
    order-free — uniquely named outputs, commits serialized by their
    own lock."""
    from concurrent.futures import ThreadPoolExecutor

    jss = spark._jsparkSession

    def run(item):
        spark._jvm.org.apache.spark.sql.SparkSession.setActiveSession(jss)
        return fn(item)

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return list(pool.map(run, items))


def load_windowed(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    col: str,
    from_time: str,
    to_time: str,
) -> DataFrame:
    """Load with the time window pushed into the parquet scan.

    For raw-nanos columns a predicate on the *converted* timestamp sits
    above the conversion expression and cannot push (only IsNotNull
    reaches the scan); translating the bounds to raw int64 nanos
    filters the physical column, so PushedFilters carries the window
    into row-group pruning. Exact translation of the inclusive
    micro-second window: floor(n/1000) >= m  <=>  n >= 1000m, and
    floor(n/1000) <= M  <=>  n <= 1000M + 999.
    """
    from datetime import datetime, timezone

    raw = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if col in _NANOS_TS_COLS.get(table, ()) and isinstance(
        raw.schema[col].dataType, T.LongType
    ):
        fmt = "%Y-%m-%d %H:%M:%S"

        def micros(s: str) -> int:
            dt = datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)
            return int(dt.timestamp()) * 1_000_000

        lo = micros(from_time) * 1000
        hi = micros(to_time) * 1000 + 999
        raw = raw.filter((F.col(col) >= lo) & (F.col(col) <= hi))
        return raw.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    c = F.col(col)
    return load(spark, sf_dir, table).filter(
        (c >= F.lit(from_time)) & (c <= F.lit(to_time))
    )
