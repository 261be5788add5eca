"""Golden pins for the ClickHouse-dialect DDL generator
(sinks/clickhouse_ddl.py — VERDICT r7 task 7): the generated CREATE
TABLE for the 49-column sink, the INSERT column list (reference
main.py:185's shape), the type mapping table, and the JDBC
createTableColumnTypes string. Pure string assertions — the dialect
surface is pinned so a live-server deployment is config-only.
"""

from __future__ import annotations

from pyspark.sql import types as T

from appsflyer_to_clickhouse_spark.schemas import (
    DATETIME_CH_COLS,
    ch_sink_schema,
    sink_columns,
)
from appsflyer_to_clickhouse_spark.sinks.clickhouse_ddl import (
    ch_type,
    create_table_ddl,
    insert_statement,
    jdbc_create_table_column_types,
    sink_table_ddl,
)


def test_type_mapping_golden():
    cases = [
        (T.StringType(), True, "Nullable(String)"),
        (T.StringType(), False, "String"),
        (T.TimestampType(), True, "Nullable(DateTime)"),
        (T.DateType(), True, "Nullable(Date32)"),
        (T.LongType(), True, "Nullable(Int64)"),
        (T.IntegerType(), False, "Int32"),
        (T.ShortType(), True, "Nullable(Int16)"),
        (T.ByteType(), True, "Nullable(Int8)"),
        (T.DoubleType(), True, "Nullable(Float64)"),
        (T.FloatType(), False, "Float32"),
        (T.BooleanType(), True, "Nullable(UInt8)"),
        (T.DecimalType(18, 4), True, "Nullable(Decimal(18, 4))"),
        (T.BinaryType(), True, "Nullable(String)"),
    ]
    for dt, nullable, want in cases:
        assert ch_type(dt, nullable=nullable) == want
    import pytest

    with pytest.raises(ValueError, match="scalar"):
        ch_type(T.ArrayType(T.LongType()))


def test_sink_table_ddl_golden():
    ddl = sink_table_ddl()
    lines = ddl.splitlines()
    assert lines[0] == "CREATE TABLE IF NOT EXISTS appsflyer_installs"
    assert lines[-3] == "PARTITION BY toYYYYMM(install_time)"
    assert lines[-2] == "ORDER BY (`install_time`)"
    assert lines[-1] == "SETTINGS index_granularity = 8192"
    assert "ENGINE = MergeTree" in ddl
    # the sort key is non-nullable with the epoch-zero default; every
    # OTHER datetime column is Nullable(DateTime)
    assert "`install_time` DateTime DEFAULT toDateTime(0)" in ddl
    for c in sorted(DATETIME_CH_COLS - {"install_time"}):
        assert f"`{c}` Nullable(DateTime)" in ddl
    # 49 column definitions, in exact sink order
    col_lines = [ln for ln in lines if ln.startswith("    `")]
    assert len(col_lines) == 49
    assert [ln.split("`")[1] for ln in col_lines] == sink_columns()
    # every non-datetime column is Nullable(String)
    assert (
        sum(
            ln.rstrip(",").endswith("Nullable(String)")
            for ln in col_lines
        )
        == 49 - len(DATETIME_CH_COLS)
    )


def test_insert_statement_matches_reference_shape():
    stmt = insert_statement(ch_sink_schema(), "appsflyer_installs")
    assert stmt.startswith("INSERT INTO appsflyer_installs (`")
    assert stmt.endswith(") VALUES")
    inner = stmt[stmt.index("(") + 1 : stmt.rindex(")")]
    assert [c.strip("` ") for c in inner.split(",")] == sink_columns()


def test_jdbc_create_table_column_types():
    s = jdbc_create_table_column_types(ch_sink_schema())
    parts = s.split(", ")
    # Nullable(Decimal(p, s)) would split on ', ' — sink has none,
    # and the 49 entries map name -> CH type positionally
    assert len(parts) == 49
    assert parts[0].endswith(
        "Nullable(DateTime)"
    ) or parts[0].endswith("Nullable(String)")
    names = [p.split(" ")[0] for p in parts]
    assert names == sink_columns()


def test_order_by_validation_and_custom_engines():
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), True),
            T.StructField("v", T.StringType(), True),
        ]
    )
    import pytest

    with pytest.raises(ValueError, match="not in schema"):
        create_table_ddl(schema, "t", order_by=["missing"])
    ddl = create_table_ddl(
        schema,
        "db.t",
        order_by=["k"],
        engine="ReplacingMergeTree",
    )
    assert "ENGINE = ReplacingMergeTree" in ddl
    assert "`k` Int64 DEFAULT 0" in ddl
    assert "`v` Nullable(String)" in ddl
    assert ddl.rstrip().endswith("ORDER BY (`k`)")


def test_alter_widen_ddl_golden():
    import pytest

    from appsflyer_to_clickhouse_spark.sinks.clickhouse_ddl import (
        alter_widen_ddl,
    )

    old = T.StructType(
        [
            T.StructField("k", T.IntegerType(), True),
            T.StructField("x", T.FloatType(), True),
            T.StructField("s", T.StringType(), True),
        ]
    )
    new = T.StructType(
        [
            T.StructField("k", T.LongType(), True),
            T.StructField("x", T.DoubleType(), True),
            T.StructField("s", T.StringType(), True),
            T.StructField("extra", T.StringType(), True),
        ]
    )
    got = alter_widen_ddl(old, new, "db.t")
    assert got == [
        "ALTER TABLE db.t MODIFY COLUMN `k` Nullable(Int64)",
        "ALTER TABLE db.t MODIFY COLUMN `x` Nullable(Float64)",
        "ALTER TABLE db.t ADD COLUMN `extra` Nullable(String)",
    ]
    # narrowing refused
    with pytest.raises(ValueError, match="not a widening"):
        alter_widen_ddl(
            T.StructType([T.StructField("k", T.LongType(), True)]),
            T.StructType([T.StructField("k", T.IntegerType(), True)]),
            "db.t",
        )
    # int -> float family change refused
    with pytest.raises(ValueError, match="not a widening"):
        alter_widen_ddl(
            T.StructType([T.StructField("k", T.IntegerType(), True)]),
            T.StructType([T.StructField("k", T.DoubleType(), True)]),
            "db.t",
        )
    # dropped column refused
    with pytest.raises(ValueError, match="never drops"):
        alter_widen_ddl(
            T.StructType([T.StructField("k", T.IntegerType(), True)]),
            T.StructType([T.StructField("j", T.IntegerType(), True)]),
            "db.t",
        )
