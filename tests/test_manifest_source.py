"""READ side of the manifest sink (sources/manifest_source.py):
batch reads resolve the manifest (current or as-of), filter pushdown
prunes parts via manifest stats, the JSONL converter inverts the
writer's encoding exactly, and the streaming tail emits each append
commit exactly once — skipping REPLACE commits, refusing folds past
its offset and manifest resets.
"""

from __future__ import annotations

import datetime
import decimal
import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    ClickHouseArrowDataSource,
    ClickHouseBatchDataSource,
    optimize_sink,
    truncate_history,
)
from appsflyer_to_clickhouse_spark.sources.manifest_source import (
    ManifestBatchReader,
    ManifestTailReader,
)

_SCHEMA = T.StructType(
    [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
)
_DDL = "k string, v long"


@pytest.fixture(autouse=True)
def _enable_pushdown(spark):
    # runtime-settable; session.py sets it at build time, but the
    # shared test session may predate that config
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


def _append(spark, path, lo, hi, fmt="chbatch", parts=1):
    spark.dataSource.register(ClickHouseBatchDataSource)
    spark.dataSource.register(ClickHouseArrowDataSource)
    df = (
        spark.range(lo, hi)
        .repartition(parts)
        .select(F.col("id").cast("string").alias("k"), F.col("id").alias("v"))
    )
    (
        df.write.format(fmt)
        .option("path", path)
        .option("batchsize", "1000000")
        .mode("append")
        .save()
    )


@pytest.mark.parametrize("fmt", ["chbatch", "chbatch_arrow"])
def test_batch_read_resolves_manifest_both_tiers(spark, fmt):
    path = tempfile.mkdtemp(prefix="mread_") + "/sink"
    _append(spark, path, 0, 500, fmt=fmt, parts=3)
    # an orphan part (crashed writer) must stay invisible
    ext = "jsonl" if fmt == "chbatch" else "parquet"
    with open(os.path.join(path, f"part-orphan.{ext}"), "w") as fh:
        fh.write("")
    got = (
        spark.read.format(fmt)
        .schema(_SCHEMA)
        .option("path", path)
        .load()
    )
    assert got.count() == 500
    assert got.agg(F.sum("v")).first()[0] == 499 * 500 // 2


def test_small_parts_pack_into_few_reader_tasks(spark):
    """r11 optimization pin: many tiny committed parts plan FAR fewer
    reader tasks than parts (Spark's own file-split packing applied to
    the Python DS reader), while a part too big to stat-pack stays
    isolated and JSONL/parquet never share a task (their read paths
    yield different framings)."""
    from appsflyer_to_clickhouse_spark.sources.manifest_source import (
        _pack_specs,
    )

    path = tempfile.mkdtemp(prefix="mpack_") + "/sink"
    for lo in range(0, 600, 100):  # 6 single-part tiny commits
        _append(spark, path, lo, lo + 100)
    r = ManifestBatchReader({"path": path}, _SCHEMA)
    parts = r.partitions()
    specs = [s for p in parts for s in p.value]
    assert len(specs) == 6  # every committed part is still read
    assert len(parts) == 1  # ...by one packed task, not six
    got = (
        spark.read.format("chbatch")
        .schema(_SCHEMA)
        .option("path", path)
        .load()
    )
    assert got.count() == 600
    assert got.agg(F.sum("v")).first()[0] == 599 * 600 // 2

    # pure packing rules: an over-target part is isolated; mixed
    # formats split by framing; unknown sizes charge a full target
    d = tempfile.mkdtemp(prefix="mpacku_")
    small = os.path.join(d, "a.jsonl")
    with open(small, "w") as fh:
        fh.write("x" * 10)
    big = os.path.join(d, "b.jsonl")
    with open(big, "w") as fh:
        fh.write("x" * 300)
    pq = os.path.join(d, "c.parquet")
    with open(pq, "w") as fh:
        fh.write("x" * 10)
    groups = _pack_specs(
        [(small,), (big,), (pq,)], target=200, open_cost=10
    )
    # the over-target jsonl is isolated, the small jsonl won't join it
    # (budget), and the parquet part never groups with jsonl
    flat = sorted(tuple(s[0] for s in g) for g in groups)
    assert flat == sorted([(big,), (small,), (pq,)])
    # under a roomy budget the two jsonl parts DO share one task while
    # the parquet framing stays separate
    groups2 = _pack_specs(
        [(small,), (big,), (pq,)], target=10_000, open_cost=10
    )
    flat2 = sorted(tuple(sorted(s[0] for s in g)) for g in groups2)
    assert flat2 == sorted([tuple(sorted([small, big])), (pq,)])


def test_batch_read_version_as_of(spark):
    path = tempfile.mkdtemp(prefix="mreadv_") + "/sink"
    _append(spark, path, 0, 100)
    _append(spark, path, 100, 300)
    v0 = (
        spark.read.format("chbatch")
        .schema(_SCHEMA)
        .option("path", path)
        .option("version", "0")
        .load()
    )
    assert v0.count() == 100


def test_read_without_schema_raises_helpfully(spark):
    path = tempfile.mkdtemp(prefix="mreadns_") + "/sink"
    _append(spark, path, 0, 10)
    with pytest.raises(Exception, match="need a schema"):
        spark.read.format("chbatch").option("path", path).load().count()


def test_jsonl_converters_invert_writer_encoding(spark):
    """Timestamps, dates, decimals, and binary survive the JSONL
    write->read loop value-exactly (the reader's converters are the
    inverse of the writer's _json_cell)."""
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("d", T.DateType()),
            T.StructField("dec", T.DecimalType(10, 2)),
            T.StructField("b", T.BinaryType()),
            T.StructField("s", T.StringType()),
        ]
    )
    rows = [
        (
            datetime.datetime(2024, 5, 1, 12, 30, 15, 123456),
            datetime.date(2024, 5, 2),
            decimal.Decimal("12345.67"),
            b"\x00\xffbin",
            "plain",
        ),
        (None, None, None, None, None),
    ]
    df = spark.createDataFrame(rows, schema)
    path = tempfile.mkdtemp(prefix="mconv_") + "/sink"
    spark.dataSource.register(ClickHouseBatchDataSource)
    df.write.format("chbatch").option("path", path).mode("append").save()
    back = (
        spark.read.format("chbatch")
        .schema(schema)
        .option("path", path)
        .load()
    )
    assert sorted(back.collect(), key=str) == sorted(df.collect(), key=str)


def test_pushed_filters_prune_partitions_via_stats(spark):
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        IsNotNull,
        LessThanOrEqual,
    )

    path = tempfile.mkdtemp(prefix="mprune_") + "/sink"
    for lo in (0, 100, 200):  # 3 disjoint Arrow parts with stats
        _append(spark, path, lo, lo + 100, fmt="chbatch_arrow")

    def parts_for(filters):
        r = ManifestBatchReader({"path": path}, _SCHEMA)
        returned = r.pushFilters(filters)
        # every filter is handed back to Spark: pruning is advisory
        assert list(returned) == filters
        # count PART SPECS, not InputPartitions: tiny parts pack into
        # shared reader tasks (r11), but pruning is per part
        return [s for p in r.partitions() for s in p.value]

    assert len(parts_for([])) == 3
    assert (
        len(
            parts_for(
                [GreaterThanOrEqual(("v",), 120), LessThanOrEqual(("v",), 180)]
            )
        )
        == 1
    )
    assert len(parts_for([EqualTo(("v",), 250)])) == 1
    assert len(parts_for([IsNotNull(("v",))])) == 3
    # end-to-end: the same predicate through Spark SQL stays exact
    got = (
        spark.read.format("chbatch_arrow")
        .schema(_SCHEMA)
        .option("path", path)
        .load()
        .filter((F.col("v") >= 120) & (F.col("v") <= 180))
    )
    assert got.count() == 61


def _run_tail(spark, path, ckpt, out_dir, fmt="chbatch"):
    """Drain the tail into a parquet sink (memory sink refuses
    checkpoint recovery, which the resume pins need) and return the
    accumulated output."""
    q = (
        spark.readStream.format(fmt)
        .schema(_SCHEMA)
        .option("path", path)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(_SCHEMA).parquet(out_dir)


def test_tail_emits_each_append_once_and_resumes(spark):
    path = tempfile.mkdtemp(prefix="mtail_") + "/sink"
    ckpt = tempfile.mkdtemp(prefix="mtail_ckpt_")
    out_dir = tempfile.mkdtemp(prefix="mtail_out_") + "/out"
    _append(spark, path, 0, 100)
    _append(spark, path, 100, 250)
    out = _run_tail(spark, path, ckpt, out_dir)
    assert out.count() == 250
    assert out.agg(F.sum("v")).first()[0] == 249 * 250 // 2
    # new commit after the first run: the SAME checkpoint resumes and
    # appends only the new rows — every row exactly once overall
    _append(spark, path, 250, 300)
    out2 = _run_tail(spark, path, ckpt, out_dir)
    assert out2.count() == 300
    assert out2.select("v").distinct().count() == 300
    assert out2.agg(F.sum("v")).first()[0] == 299 * 300 // 2


def test_tail_skips_replace_commits(spark):
    path = tempfile.mkdtemp(prefix="mtailc_") + "/sink"
    ckpt = tempfile.mkdtemp(prefix="mtailc_ckpt_")
    for lo in (0, 100, 200):
        _append(spark, path, lo, lo + 100, fmt="chbatch_arrow", parts=2)
    optimize_sink(spark, path, _SCHEMA, target_rows_per_file=10_000)
    _append(spark, path, 300, 350, fmt="chbatch_arrow")
    out_dir = tempfile.mkdtemp(prefix="mtailc_out_") + "/out"
    out = _run_tail(spark, path, ckpt, out_dir, fmt="chbatch_arrow")
    # every appended row exactly once: the compact commit's rewritten
    # files were skipped, the original parts (still on disk) were read
    assert out.count() == 350
    assert out.select("v").distinct().count() == 350


def test_tail_refuses_fold_past_offset(spark):
    path = tempfile.mkdtemp(prefix="mtailf_") + "/sink"
    ckpt = tempfile.mkdtemp(prefix="mtailf_ckpt_")
    out_dir = tempfile.mkdtemp(prefix="mtailf_out_") + "/out"
    _append(spark, path, 0, 50)
    assert _run_tail(spark, path, ckpt, out_dir).count() == 50
    _append(spark, path, 50, 100)
    _append(spark, path, 100, 150)
    truncate_history(path, retain_last=1)  # folds v0..v1, offset is v0
    from pyspark.errors import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="folded the log"):
        _run_tail(spark, path, ckpt, out_dir)


def test_tail_partition_protocol_guards():
    r = ManifestTailReader({"path": "/nonexistent"}, _SCHEMA)
    assert r.initialOffset() == {"version": -1}
    assert r.latestOffset() == {"version": -1}
    with pytest.raises(ValueError, match="went backwards"):
        r.partitions({"version": 5}, {"version": 0})


@pytest.mark.parametrize("fmt", ["chbatch", "chbatch_arrow"])
def test_additive_schema_evolution_null_fills_old_parts(spark, fmt):
    """A part committed before a column existed surfaces NULL for it
    on read — both tiers are self-describing, so evolution is a read-
    time reconciliation, never a history rewrite."""
    path = tempfile.mkdtemp(prefix="mevolve_") + "/sink"
    spark.dataSource.register(ClickHouseBatchDataSource)
    spark.dataSource.register(ClickHouseArrowDataSource)
    v1 = spark.range(5).select(
        F.col("id").cast("string").alias("k"), F.col("id").alias("v")
    )
    v2 = spark.range(5, 10).select(
        F.col("id").cast("string").alias("k"),
        F.col("id").alias("v"),
        F.lit("new").alias("extra"),
    )
    for df in (v1, v2):
        df.write.format(fmt).option("path", path).mode("append").save()
    evolved = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("v", T.LongType()),
            T.StructField("extra", T.StringType()),
        ]
    )
    got = (
        spark.read.format(fmt)
        .schema(evolved)
        .option("path", path)
        .load()
        .orderBy("v")
        .collect()
    )
    assert [r["extra"] for r in got] == [None] * 5 + ["new"] * 5
    assert [r["v"] for r in got] == list(range(10))


def test_tail_starting_version(spark):
    """Delta's startingVersion on the tail: an integer starts the
    fresh stream AT that commit; 'latest' skips the whole backfill and
    emits only commits made after the stream first ran. Restarts keep
    obeying the checkpoint, not the option."""
    path = tempfile.mkdtemp(prefix="mtsv_") + "/sink"
    _append(spark, path, 0, 100)    # v0
    _append(spark, path, 100, 150)  # v1

    # integer form: start at v1 -> backfill excludes v0
    out1 = tempfile.mkdtemp(prefix="mtsv_o1_") + "/out"
    q = (
        spark.readStream.format("chbatch")
        .schema(_SCHEMA)
        .option("path", path)
        .option("startingVersion", "1")
        .load()
        .writeStream.format("parquet")
        .option("path", out1)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="mtsv_c1_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.schema(_SCHEMA).parquet(out1)
    assert got.count() == 50
    assert got.agg(F.min("v")).first()[0] == 100

    # 'latest' form: first run emits nothing; a later commit arrives
    # on the SAME checkpoint (restart -> checkpoint wins over option)
    out2 = tempfile.mkdtemp(prefix="mtsv_o2_") + "/out"
    ckpt2 = tempfile.mkdtemp(prefix="mtsv_c2_")

    def run_latest():
        q = (
            spark.readStream.format("chbatch")
            .schema(_SCHEMA)
            .option("path", path)
            .option("startingVersion", "latest")
            .load()
            .writeStream.format("parquet")
            .option("path", out2)
            .option("checkpointLocation", ckpt2)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        try:
            return spark.read.schema(_SCHEMA).parquet(out2).count()
        except Exception:
            return 0  # no files yet: nothing was emitted

    assert run_latest() == 0
    _append(spark, path, 150, 180)  # v2, after the stream first ran
    assert run_latest() == 30

    # invalid value fails loudly
    import pytest as _pytest

    from appsflyer_to_clickhouse_spark.sources.manifest_source import (
        ManifestTailReader,
    )

    bad = ManifestTailReader(
        {"path": path, "startingversion": "yesterday"}, _SCHEMA
    )
    with _pytest.raises(ValueError, match="integer or 'latest'"):
        bad.initialOffset()


def test_type_widening_int_and_float_parts(spark):
    """VERDICT r7 task 6: parts written with NARROWER physical types
    (int32 under a long reader, float32 under a double reader) widen
    with a per-part Arrow cast at read time — no rewrite of history."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        ClickHouseArrowDataSource,
    )

    spark.dataSource.register(ClickHouseArrowDataSource)
    path = tempfile.mkdtemp(prefix="mwide_") + "/s"
    wide = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("x", T.DoubleType()),
        ]
    )
    # part A: written through the sink with the WIDE schema
    (
        spark.createDataFrame([(1, 1.5), (2, 2.5)], wide)
        .coalesce(1)
        .write.format("chbatch_arrow")
        .option("path", path)
        .mode("append")
        .save()
    )
    # part B: a pre-widening part — physically int32 / float32 —
    # spliced in as a manual append commit (what a table written
    # before an ALTER COLUMN TYPE carries)
    import json as _json
    import os as _os

    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        MANIFEST,
        _manifest_lock,
        _manifest_read,
    )

    narrow = pa.table(
        {
            "k": pa.array([3, 4], pa.int32()),
            "x": pa.array([3.5, 4.5], pa.float32()),
        }
    )
    pq.write_table(narrow, _os.path.join(path, "part-narrow.parquet"))
    with _manifest_lock(path):
        m = _manifest_read(path)
        m["files"] = sorted([*m["files"], "part-narrow.parquet"])
        m["rows"] += 2
        m["history"].append(
            {"v": 1, "files": ["part-narrow.parquet"], "rows_total": 4}
        )
        with open(_os.path.join(path, MANIFEST), "w") as fh:
            _json.dump(m, fh)
    got = (
        spark.read.format("chbatch_arrow")
        .schema(wide)
        .option("path", path)
        .load()
    )
    rows = sorted(map(tuple, got.collect()))
    assert rows == [(1, 1.5), (2, 2.5), (3, 3.5), (4, 4.5)]
    assert [f.dataType.simpleString() for f in got.schema.fields] == [
        "bigint",
        "double",
    ]


def test_type_narrowing_refused_loudly(spark):
    import pytest as _pytest

    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        ClickHouseArrowDataSource,
    )

    spark.dataSource.register(ClickHouseArrowDataSource)
    path = tempfile.mkdtemp(prefix="mnarrow_") + "/s"
    wide = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("x", T.DoubleType()),
        ]
    )
    (
        spark.createDataFrame([(1, 1.5)], wide)
        .coalesce(1)
        .write.format("chbatch_arrow")
        .option("path", path)
        .mode("append")
        .save()
    )
    narrow_reader = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("x", T.DoubleType()),
        ]
    )
    df = (
        spark.read.format("chbatch_arrow")
        .schema(narrow_reader)
        .option("path", path)
        .load()
    )
    with _pytest.raises(Exception, match="NARROWING"):
        df.collect()
