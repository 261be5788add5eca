"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship ETL pipeline (the reference's entire
main(), re-expressed as one lazy DataFrame lineage) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the registered operator suite
(SURVEY.md §2) with DuckDB oracle twins.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from appsflyer_to_clickhouse_spark.plans import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return QUERIES["etl_pipeline"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _with_session_conf(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver may hand us a session built without our config;
            # these are runtime confs, safe to set per call.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        return wrapped

    return {name: _with_session_conf(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-ANSI twins for every SQL-expressible query."""
    return dict(ORACLE)
