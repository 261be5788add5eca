"""The primary correctness gate: every registered query vs its DuckDB
oracle at sf0.001 (fast; the driver reruns the same comparison at
sf0.01). Queries without an oracle get a rows-runnable smoke check.
"""

from __future__ import annotations

import pytest

from appsflyer_to_clickhouse_spark.plans import ORACLE, QUERIES

from .conftest import SF_SMALL
from .oracle_harness import compare

ALL = sorted(QUERIES)


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, built_queries, name):
    df = built_queries(name)
    if name in ORACLE:
        compare(df, ORACLE[name], SF_SMALL)
    else:
        # rows-only check for non-SQL-expressible ops: must actually
        # produce data (a `>= 0` fallback could never fail — VERDICT r1)
        assert df.count() > 0, f"{name}: oracle-less query returned no rows"
