"""ADD COLUMN as a manifest metadata commit (VERDICT r9 task 5 —
``datasource_sink.add_column`` + the vectorized typed-NULL backfill
in ``manifest_source``).

Pins:
- the verb is metadata-only: one op='add_column' history entry, a
  ``column_adds`` record with the commit version, zero data files
  touched;
- pre-add parts surface typed NULLs through the Data Source reader
  with NO ``mergeSchema`` anywhere — and they stay on the Arrow
  BATCH path (the reader yields RecordBatches, not rows), so the
  backfill costs no per-row Python after an ADD turns every
  historical part into the 'missing column' case;
- types round-trip: string/long/double/boolean/date/timestamp/
  decimal backfills all land as NULL of the declared type;
  un-backfillable types are refused at the verb;
- conflicts refuse loudly: re-adding an added name, adding a name
  that collides with a live alias;
- dv deletes still mask correctly on backfilled parts (the null
  columns ride the same masked batch path);
- ``column_adds`` carries across appends (both writer tiers),
  commit-log fold, and shallow clone.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    ClickHouseArrowDataSource,
    _manifest_read,
    add_column,
    clone_sink,
    rename_column,
)
from appsflyer_to_clickhouse_spark.sinks.mutations import delete_where
from appsflyer_to_clickhouse_spark.sources.manifest_source import (
    _null_array,
    _read_part,
)

BASE = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("k", T.StringType()),
    ]
)
WIDE = T.StructType(
    [*BASE.fields, T.StructField("campaign", T.StringType())]
)


@pytest.fixture(scope="module")
def reg(spark):
    spark.dataSource.register(ClickHouseArrowDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    return spark


def _tmp():
    return tempfile.mkdtemp(prefix="spark_graft_addcol_") + "/s"


def _write(df, path, **opts):
    w = (
        df.coalesce(1)
        .write.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", "10000000")
    )
    for k, v in opts.items():
        w = w.option(k, v)
    w.mode("append").save()


def _staged(reg, **opts):
    path = _tmp()
    v1 = reg.createDataFrame([(i, f"k{i}") for i in range(100)], BASE)
    _write(v1, path, **opts)
    r = add_column(path, "campaign", "string")
    v2 = reg.createDataFrame(
        [(i, f"k{i}", f"c{i % 3}") for i in range(100, 150)], WIDE
    )
    _write(v2, path, **opts)
    return path, r


def test_metadata_only_commit_and_backfill(reg):
    path, r = _staged(reg)
    assert r == {
        "added": {"name": "campaign", "type": "string"},
        "version": 1,
    }
    m = _manifest_read(path)
    e = next(e for e in m["history"] if e.get("op") == "add_column")
    assert e["files"] == [] and e["added"]["name"] == "campaign"
    assert m["column_adds"] == [
        {"name": "campaign", "type": "string", "v": 1}
    ]
    got = (
        reg.read.format("chbatch_arrow")
        .schema(WIDE)
        .option("path", path)
        .load()
    )
    assert got.count() == 150
    assert got.filter(F.col("campaign").isNull()).count() == 100
    assert got.filter("campaign = 'c0'").count() == 16


def test_backfill_stays_on_arrow_batch_path(reg):
    """The executor read of a pre-add part must yield RecordBatches
    (vectorized), never per-row tuples — the per-row fallback is for
    un-mappable types only."""
    path, _ = _staged(reg)
    m = _manifest_read(path)
    pre = next(
        f
        for f in sorted(m["files"])
        if "campaign" not in (m["stats"].get(os.path.basename(f)) or {})
    )
    convs = [(f.name, f.dataType.typeName()) for f in WIDE.fields]
    out = list(_read_part(os.path.join(path, pre), convs))
    import pyarrow as pa

    assert out and all(isinstance(b, pa.RecordBatch) for b in out)
    t = pa.Table.from_batches(out)
    assert t.column("campaign").null_count == t.num_rows
    assert t.schema.field("campaign").type == pa.string()


def test_typed_backfills_and_refusal(reg):
    path, _ = _staged(reg)
    for name, ddl, sp in [
        ("n_long", "long", T.LongType()),
        ("n_double", "double", T.DoubleType()),
        ("n_bool", "boolean", T.BooleanType()),
        ("n_date", "date", T.DateType()),
        ("n_ts", "timestamp", T.TimestampType()),
        ("n_dec", "decimal(10,2)", T.DecimalType(10, 2)),
    ]:
        add_column(path, name, ddl)
        sch = T.StructType([*WIDE.fields, T.StructField(name, sp)])
        got = (
            reg.read.format("chbatch_arrow")
            .schema(sch)
            .option("path", path)
            .load()
        )
        assert got.filter(F.col(name).isNull()).count() == 150
        sch = WIDE  # noqa: PLW2901 (next loop builds from WIDE)
    with pytest.raises(ValueError, match="no typed NULL backfill"):
        add_column(path, "nested", "array<string>")


def test_conflicts_refused(reg):
    path, _ = _staged(reg)
    with pytest.raises(ValueError, match="already added"):
        add_column(path, "campaign", "string")
    rename_column(path, "k", "key")
    with pytest.raises(ValueError, match="alias"):
        add_column(path, "k", "string")  # k is now a live alias


def test_dv_masks_backfilled_parts(reg):
    path, _ = _staged(reg)
    r = delete_where(
        reg, path, WIDE, "id < 10", mode="dv", write_cdf=False
    )
    assert r["deleted"] == 10
    got = (
        reg.read.format("chbatch_arrow")
        .schema(WIDE)
        .option("path", path)
        .load()
    )
    assert got.count() == 140
    assert got.filter("id < 10").count() == 0
    assert got.filter(F.col("campaign").isNull()).count() == 90


def test_commit_log_and_clone_carry(reg):
    path, _ = _staged(reg, commitlog="2")
    m = _manifest_read(path)
    assert m["column_adds"][0]["name"] == "campaign"
    dst = _tmp()
    clone_sink(path, dst)
    assert _manifest_read(dst)["column_adds"] == m["column_adds"]
    got = (
        reg.read.format("chbatch_arrow")
        .schema(WIDE)
        .option("path", dst)
        .load()
    )
    assert got.filter(F.col("campaign").isNull()).count() == 100


def test_null_array_mapping():
    import pyarrow as pa

    assert _null_array("string", 3).type == pa.string()
    assert _null_array("decimal(5,1)", 0).type == pa.decimal128(5, 1)
    assert _null_array("timestamp", 0).type == pa.timestamp(
        "us", tz="UTC"
    )
    assert _null_array("array<string>", 0) is None
    assert _null_array("decimal(bogus)", 0) is None
