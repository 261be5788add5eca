"""ClickHouse-dialect DDL / type mapping for the JDBC sink — emitted
as SQL TEXT and golden-pinned, so a live-server deployment is
config-only (VERDICT r7 task 7).

The engine-side writer (sinks/clickhouse_sink.py, exercised E2E
against embedded Derby) is dialect-agnostic by design; what a real
ClickHouse deployment additionally needs is the table definition the
reference assumes exists (main.py:17 ``CH_TABLE`` env var, queried at
main.py:173 and inserted into at main.py:185). This module generates
it from the typed sink schema:

- Spark -> ClickHouse type mapping (timestamps to ``DateTime``,
  everything nullable wrapped in ``Nullable(...)`` — ClickHouse types
  are non-nullable by default, the opposite of SQL);
- ``ENGINE = MergeTree ORDER BY (install_time)`` — the sort key that
  makes the reference's dedup window scan (main.py:173:
  ``WHERE install_time >= ... AND install_time <= ...``) a primary-key
  range read instead of a full scan, which is the entire point of
  MergeTree for this workload;
- ORDER BY columns are made NON-nullable with an explicit DEFAULT
  (ClickHouse rejects nullable sort keys unless
  ``allow_nullable_key=1``, and a sentinel default is the idiomatic
  fix for a column the pipeline always populates anyway);
- the INSERT column-list statement (reference main.py:185) and the
  ``createTableColumnTypes`` string for Spark's own JDBC writer.

Everything here is plain string generation over public ClickHouse SQL
syntax — unit-pinned in tests/test_clickhouse_ddl.py with a golden
file for the 49-column sink table.
"""

from __future__ import annotations

from pyspark.sql import types as T

__all__ = [
    "ch_type",
    "create_table_ddl",
    "insert_statement",
    "jdbc_create_table_column_types",
    "sink_table_ddl",
]


def ch_type(dt: T.DataType, *, nullable: bool = True) -> str:
    """Map one Spark SQL type to its ClickHouse type, wrapping in
    ``Nullable(...)`` when the Spark field is nullable (ClickHouse
    columns reject NULL unless wrapped — inverse of SQL defaults).
    Unsupported nested types raise: a sink column must be scalar."""
    if isinstance(dt, T.StringType):
        base = "String"
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        base = "DateTime"
    elif isinstance(dt, T.DateType):
        base = "Date32"
    elif isinstance(dt, T.LongType):
        base = "Int64"
    elif isinstance(dt, T.IntegerType):
        base = "Int32"
    elif isinstance(dt, T.ShortType):
        base = "Int16"
    elif isinstance(dt, T.ByteType):
        base = "Int8"
    elif isinstance(dt, T.DoubleType):
        base = "Float64"
    elif isinstance(dt, T.FloatType):
        base = "Float32"
    elif isinstance(dt, T.BooleanType):
        base = "UInt8"
    elif isinstance(dt, T.DecimalType):
        base = f"Decimal({dt.precision}, {dt.scale})"
    elif isinstance(dt, T.BinaryType):
        base = "String"
    else:
        raise ValueError(
            f"no ClickHouse mapping for Spark type {dt.simpleString()} "
            "(sink columns must be scalar)"
        )
    return f"Nullable({base})" if nullable else base


def _default_for(base: str) -> str:
    """The sentinel DEFAULT for a sort-key column forced non-nullable
    (ClickHouse's epoch-zero idiom for DateTime keys)."""
    if base == "DateTime":
        return "toDateTime(0)"
    if base.startswith(("Int", "UInt", "Float", "Decimal")):
        return "0"
    return "''"


def create_table_ddl(
    schema: T.StructType,
    table: str,
    *,
    order_by: list[str],
    partition_by: str | None = None,
    engine: str = "MergeTree",
    settings: dict | None = None,
) -> str:
    """CREATE TABLE for ``schema`` with a MergeTree sort key.
    ORDER BY columns are emitted NON-nullable with a sentinel DEFAULT
    (nullable sort keys are rejected by ClickHouse); every other
    nullable field maps to ``Nullable(...)``."""
    unknown = [c for c in order_by if c not in schema.fieldNames()]
    if unknown:
        raise ValueError(f"order_by columns {unknown} not in schema")
    key = set(order_by)
    cols = []
    for f in schema.fields:
        if f.name in key:
            base = ch_type(f.dataType, nullable=False)
            cols.append(
                f"    `{f.name}` {base} DEFAULT {_default_for(base)}"
            )
        else:
            cols.append(
                f"    `{f.name}` {ch_type(f.dataType, nullable=f.nullable)}"
            )
    lines = [
        f"CREATE TABLE IF NOT EXISTS {table}",
        "(",
        ",\n".join(cols),
        ")",
        f"ENGINE = {engine}",
    ]
    if partition_by:
        lines.append(f"PARTITION BY {partition_by}")
    lines.append(
        "ORDER BY (" + ", ".join(f"`{c}`" for c in order_by) + ")"
    )
    if settings:
        lines.append(
            "SETTINGS "
            + ", ".join(f"{k} = {v}" for k, v in sorted(settings.items()))
        )
    return "\n".join(lines)


def insert_statement(schema: T.StructType, table: str) -> str:
    """The reference's INSERT shape (main.py:185): explicit column
    list, VALUES placeholder — what clickhouse-driver/JDBC sends per
    batch."""
    cols = ", ".join(f"`{f.name}`" for f in schema.fields)
    return f"INSERT INTO {table} ({cols}) VALUES"


def jdbc_create_table_column_types(schema: T.StructType) -> str:
    """The ``createTableColumnTypes`` string for Spark's JDBC writer
    (df.write.jdbc(..., createTableColumnTypes=...)): ClickHouse types
    in Spark's expected 'name TYPE, ...' form, so even a
    Spark-initiated CREATE lands with dialect-true column types."""
    return ", ".join(
        f"{f.name} {ch_type(f.dataType, nullable=f.nullable)}"
        for f in schema.fields
    )


def sink_table_ddl(
    table: str = "appsflyer_installs",
    partition_by: str | None = "toYYYYMM(install_time)",
) -> str:
    """The DDL for the reference pipeline's own sink table: the typed
    49-column schema (7 DateTime, 42 Nullable(String)), MergeTree
    ORDER BY install_time — the layout under which the dedup window
    query (main.py:173) is a primary-key range read. Monthly
    partitions bound merge scope and make retention a DROP PARTITION,
    the standard shape for an append-only events table."""
    from ..schemas import ch_sink_schema

    return create_table_ddl(
        ch_sink_schema(),
        table,
        order_by=["install_time"],
        partition_by=partition_by,
        settings={"index_granularity": 8192},
    )


def alter_widen_ddl(
    old_schema: T.StructType, new_schema: T.StructType, table: str
) -> list[str]:
    """ALTER TABLE statements taking a live ClickHouse table from
    ``old_schema`` to ``new_schema`` — the server-side counterpart of
    the manifest reader's type-widening evolution: ADD COLUMN for new
    fields, MODIFY COLUMN for int->wider-int / float->double widens.
    NARROWING and type-family changes raise (same refusal as the
    reader); dropped columns raise too — a sink table never silently
    loses a column (emit an explicit DROP yourself if you mean it)."""
    _WIDTH = {
        "Int8": 8, "Int16": 16, "Int32": 32, "Int64": 64,
        "Float32": 32, "Float64": 64,
    }

    def base(t: str) -> str:
        return t[9:-1] if t.startswith("Nullable(") else t

    old = {f.name: f for f in old_schema.fields}
    new = {f.name: f for f in new_schema.fields}
    gone = [n for n in old if n not in new]
    if gone:
        raise ValueError(
            f"alter_widen_ddl: columns {gone} missing from the new "
            "schema — widening never drops columns"
        )
    out: list[str] = []
    for f in new_schema.fields:
        t_new = ch_type(f.dataType, nullable=f.nullable)
        if f.name not in old:
            out.append(
                f"ALTER TABLE {table} ADD COLUMN `{f.name}` {t_new}"
            )
            continue
        t_old = ch_type(
            old[f.name].dataType, nullable=old[f.name].nullable
        )
        if t_old == t_new:
            continue
        b_old, b_new = base(t_old), base(t_new)
        same_family = (
            b_old.startswith("Int") == b_new.startswith("Int")
            and b_old.startswith("Float") == b_new.startswith("Float")
        )
        if (
            b_old in _WIDTH
            and b_new in _WIDTH
            and same_family
            and _WIDTH[b_old] < _WIDTH[b_new]
        ):
            out.append(
                f"ALTER TABLE {table} MODIFY COLUMN `{f.name}` {t_new}"
            )
            continue
        raise ValueError(
            f"alter_widen_ddl: column {f.name!r} {t_old} -> {t_new} "
            "is not a widening (narrowing/family changes are refused "
            "— they silently corrupt on a live table)"
        )
    return out


def drop_column_ddl(table: str, name: str) -> str:
    """The explicit server-side DROP (VERDICT r8 task 3's DDL
    counterpart): ``alter_widen_ddl`` refuses to emit drops as a
    side effect of schema diffing — losing a column must be a
    deliberate statement, mirroring ``mutations-free``
    ``drop_column`` on the manifest sink (whose dead bytes likewise
    survive until OPTIMIZE + retention erase them; ClickHouse's DROP
    COLUMN is similarly a lazy metadata mutation applied at merge
    time)."""
    return f"ALTER TABLE {table} DROP COLUMN `{name}`"
