"""Sink maintenance pins: partition-scoped MERGE upsert (latest-wins,
untouched partitions physically untouched) and small-file compaction
(fewer files, identical rows)."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from appsflyer_to_clickhouse_spark.schemas import ch_sink_schema, sink_columns
from appsflyer_to_clickhouse_spark.sinks.maintenance import (
    compact_partitions,
    merge_upsert,
)
from appsflyer_to_clickhouse_spark.sinks.parquet_sink import write_sink


def _rows(spark, triples):
    """Sink-shaped frame from (appsflyer_id, install_time, event_time);
    every other column NULL."""
    base = spark.createDataFrame(
        [(a, i, e) for a, i, e in triples],
        "appsflyer_id string, install_time_s string, event_time_s string",
    ).select(
        F.col("appsflyer_id"),
        F.to_timestamp("install_time_s").alias("install_time"),
        F.to_timestamp("event_time_s").alias("event_time"),
    )
    missing = [
        f for f in ch_sink_schema().fields
        if f.name not in ("appsflyer_id", "install_time", "event_time")
    ]
    for f in missing:
        base = base.withColumn(f.name, F.lit(None).cast(f.dataType))
    return base.select(*sink_columns())


def _files(path: str, date: str) -> dict[str, float]:
    return {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/install_date={date}/*.parquet")
    }


def test_merge_upsert_latest_wins_and_partition_scoped(spark):
    path = tempfile.mkdtemp(prefix="merge_sink_")
    write_sink(
        _rows(
            spark,
            [
                ("a", "2024-01-01 10:00:00", "2024-01-01 10:00:00"),
                ("b", "2024-01-01 11:00:00", "2024-01-01 11:00:00"),
                ("c", "2024-01-02 09:00:00", "2024-01-02 09:00:00"),
            ],
        ),
        path,
    )
    day2_before = _files(path, "2024-01-02")
    assert day2_before

    batch = _rows(
        spark,
        [
            # newer event_time for a -> wins
            ("a", "2024-01-01 10:00:00", "2024-01-01 12:00:00"),
            # OLDER event_time for b -> existing sink row must survive
            ("b", "2024-01-01 11:00:00", "2024-01-01 09:00:00"),
            # brand-new key, same partition
            ("d", "2024-01-01 13:00:00", "2024-01-01 13:00:00"),
        ],
    )
    merge_upsert(spark, batch, path)

    got = {
        r["appsflyer_id"]: r["event_time"].isoformat()
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        "a": "2024-01-01T12:00:00",
        "b": "2024-01-01T11:00:00",
        "c": "2024-01-02T09:00:00",
        "d": "2024-01-01T13:00:00",
    }
    # day-2 partition was not part of the batch: same files, same mtimes
    assert _files(path, "2024-01-02") == day2_before


def test_merge_into_missing_sink_bootstraps(spark):
    path = tempfile.mkdtemp(prefix="merge_boot_") + "/fresh"
    merge_upsert(
        spark,
        _rows(spark, [("x", "2024-01-03 08:00:00", "2024-01-03 08:00:00")]),
        path,
    )
    assert spark.read.parquet(path).count() == 1


def test_compact_reduces_files_preserves_rows(spark):
    path = tempfile.mkdtemp(prefix="compact_sink_")
    for h in range(5):  # five appends -> >= five files in the partition
        write_sink(
            _rows(
                spark,
                [(f"k{h}", f"2024-01-05 0{h}:00:00", f"2024-01-05 0{h}:00:00")],
            ),
            path,
        )
    before = spark.read.parquet(path).collect()
    assert len(_files(path, "2024-01-05")) >= 5

    compact_partitions(spark, path, target_rows_per_file=1_000_000)

    assert len(_files(path, "2024-01-05")) == 1
    after = spark.read.parquet(path).collect()
    assert sorted(map(str, before)) == sorted(map(str, after))


def test_merge_upsert_idempotent(spark):
    """Re-merging the identical batch must be a no-op on CONTENT:
    latest-wins with the batch preferred on ties converges after one
    application (the re-run safety the reference gets from its
    anti-join, extended to updates)."""
    path = tempfile.mkdtemp(prefix="merge_idem_")
    write_sink(
        _rows(spark, [("a", "2024-01-01 10:00:00", "2024-01-01 10:00:00")]),
        path,
    )
    batch = _rows(
        spark, [("a", "2024-01-01 10:00:00", "2024-01-01 12:00:00")]
    )
    merge_upsert(spark, batch, path)
    first = sorted(map(str, spark.read.parquet(path).collect()))
    merge_upsert(spark, batch, path)
    second = sorted(map(str, spark.read.parquet(path).collect()))
    assert first == second


def test_compact_partitions_incremental_scope(spark):
    """compact_partitions(partitions=[...]) must rewrite ONLY the named
    partition; the other keeps its files and mtimes byte-for-byte."""
    path = tempfile.mkdtemp(prefix="compact_scope_")
    for h in range(3):
        write_sink(
            _rows(
                spark,
                [
                    (f"a{h}", f"2024-01-07 0{h}:00:00", f"2024-01-07 0{h}:00:00"),
                    (f"b{h}", f"2024-01-08 0{h}:00:00", f"2024-01-08 0{h}:00:00"),
                ],
            ),
            path,
        )
    day8_before = _files(path, "2024-01-08")
    assert len(_files(path, "2024-01-07")) >= 3

    import datetime as dt

    compact_partitions(
        spark, path, target_rows_per_file=10**6,
        partitions=[dt.date(2024, 1, 7)],
    )
    assert len(_files(path, "2024-01-07")) == 1
    assert _files(path, "2024-01-08") == day8_before


def test_incremental_rollup_refresh_equals_full_recompute(spark):
    """Continuous-aggregate maintenance: after appending a new day and
    updating an existing one, refreshing ONLY the touched dates must
    (a) leave the untouched date's rollup files byte-identical and
    (b) produce exactly the rollup a full recompute would."""
    import datetime as dt

    from appsflyer_to_clickhouse_spark.sinks.maintenance import (
        refresh_rollup_incremental,
    )

    sink = tempfile.mkdtemp(prefix="rollup_sink_")
    rollup = tempfile.mkdtemp(prefix="rollup_agg_")
    write_sink(
        _rows(
            spark,
            [
                ("a", "2024-02-01 08:00:00", "2024-02-01 08:00:00"),
                ("b", "2024-02-01 09:00:00", "2024-02-01 09:00:00"),
                ("c", "2024-02-02 07:00:00", "2024-02-02 07:00:00"),
            ],
        ),
        sink,
    )
    refresh_rollup_incremental(spark, sink, rollup)  # bootstrap: all dates
    day2_rollup_before = _files(rollup, "2024-02-02")

    # day 1 gains a row; day 3 is new; day 2 untouched
    write_sink(
        _rows(
            spark,
            [
                ("d", "2024-02-01 10:00:00", "2024-02-01 10:00:00"),
                ("e", "2024-02-03 11:00:00", "2024-02-03 11:00:00"),
            ],
        ),
        sink,
    )
    refresh_rollup_incremental(
        spark, sink, rollup,
        dates=[dt.date(2024, 2, 1), dt.date(2024, 2, 3)],
    )

    assert _files(rollup, "2024-02-02") == day2_rollup_before

    got = {
        str(r["install_date"]): (r["n_rows"], r["n_keys"])
        for r in spark.read.parquet(rollup).collect()
    }
    assert got == {
        "2024-02-01": (3, 3),
        "2024-02-02": (1, 1),
        "2024-02-03": (1, 1),
    }

    # full recompute agrees row-for-row with the incremental state
    full = tempfile.mkdtemp(prefix="rollup_full_")
    refresh_rollup_incremental(spark, sink, full)
    a = sorted(map(str, spark.read.parquet(rollup).collect()))
    b = sorted(map(str, spark.read.parquet(full).collect()))
    assert a == b


def test_merge_cdc_deletes_rows_and_removes_emptied_partition(spark):
    from appsflyer_to_clickhouse_spark.sinks.maintenance import merge_cdc

    path = tempfile.mkdtemp(prefix="cdc_sink_")
    write_sink(
        _rows(
            spark,
            [
                ("a", "2024-01-01 10:00:00", "2024-01-01 10:00:00"),
                ("b", "2024-01-01 11:00:00", "2024-01-01 11:00:00"),
                ("c", "2024-01-02 09:00:00", "2024-01-02 09:00:00"),
                ("e", "2024-01-03 08:00:00", "2024-01-03 08:00:00"),
            ],
        ),
        path,
    )
    day3_before = _files(path, "2024-01-03")
    assert day3_before

    batch = _rows(
        spark,
        [
            # newer delete for a -> row removed
            ("a", "2024-01-01 10:00:00", "2024-01-01 12:00:00"),
            # STALE delete for b (older event_time) -> sink row survives
            ("b", "2024-01-01 11:00:00", "2024-01-01 09:00:00"),
            # delete of day 2's ONLY row -> whole partition must vanish
            ("c", "2024-01-02 09:00:00", "2024-01-02 10:00:00"),
        ],
    ).withColumn("op", F.lit("d"))
    merge_cdc(spark, batch, path)

    got = sorted(
        r["appsflyer_id"] for r in spark.read.parquet(path).collect()
    )
    assert got == ["b", "e"], got
    # emptied day-2 directory physically gone (dynamic overwrite alone
    # would have left the stale file in place)
    assert not glob.glob(f"{path}/install_date=2024-01-02/*.parquet")
    # untouched day-3 partition byte-identical
    assert _files(path, "2024-01-03") == day3_before


def test_expire_partitions_is_directory_scoped(spark, tmp_path):
    """Retention drops whole partition dirs before the cutoff and
    leaves every surviving partition byte-identical (mtime-stable —
    no rewrite of retained data)."""
    import os

    from appsflyer_to_clickhouse_spark.sinks.maintenance import (
        expire_partitions,
    )

    path = str(tmp_path / "sink")
    rows = [
        ("a1", "2024-01-01"),
        ("a2", "2024-01-05"),
        ("a3", "2024-01-10"),
        ("a4", "2024-01-20"),
    ]
    df = spark.createDataFrame(rows, ["appsflyer_id", "install_date"])
    df.write.partitionBy("install_date").mode("overwrite").parquet(path)

    survivors = {
        d: sorted(
            (f, os.path.getmtime(os.path.join(path, d, f)))
            for f in os.listdir(os.path.join(path, d))
            if not f.startswith(".")
        )
        for d in os.listdir(path)
        if d.startswith("install_date=") and d >= "install_date=2024-01-10"
    }

    expired = expire_partitions(spark, path, "2024-01-10")
    assert expired == ["2024-01-01", "2024-01-05"]

    back = spark.read.parquet(path)
    assert sorted(r.appsflyer_id for r in back.collect()) == ["a3", "a4"]
    for d, files in survivors.items():
        now = sorted(
            (f, os.path.getmtime(os.path.join(path, d, f)))
            for f in os.listdir(os.path.join(path, d))
            if not f.startswith(".")
        )
        assert now == files, f"surviving partition {d} was rewritten"


def _footer_key_ranges(path: str, date: str, col: str):
    """(min, max) of ``col`` per parquet file in one partition dir,
    straight from the footer statistics — the metadata a clustered
    scan prunes on."""
    import pyarrow.parquet as pq

    ranges = []
    for f in sorted(glob.glob(f"{path}/install_date={date}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {
            md.schema.column(i).name: i for i in range(md.num_columns)
        }[col]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    return ranges


def _slim_fragmented_sink(spark, tmp_path, dates, keys_per_date, n_frags):
    """A slim partitioned sink with ``n_frags`` round-robin files per
    date and zero-padded distinct keys (lexical order == numeric)."""
    rows = [
        (f"k{i:03d}", d) for d in dates for i in range(keys_per_date)
    ]
    path = str(tmp_path / "sink")
    df = spark.createDataFrame(rows, ["appsflyer_id", "install_date_s"])
    (
        df.select(
            "appsflyer_id",
            F.to_date("install_date_s").alias("install_date"),
        )
        .repartition(n_frags)
        .write.partitionBy("install_date")
        .mode("overwrite")
        .parquet(path)
    )
    return path


def test_compact_one_pass_exact_file_counts_and_rows(spark, tmp_path):
    """one_pass=True: a single shuffle-by-date write with
    maxRecordsPerFile must leave EXACTLY ceil(rows/target) files per
    partition (each date's rows land in one task, which rolls files
    deterministically at the target) and identical rows — with no
    per-date counting pass and no per-date job loop."""
    dates = ["2024-03-01", "2024-03-02", "2024-03-03"]
    path = _slim_fragmented_sink(spark, tmp_path, dates, 90, 9)
    for d in dates:
        assert len(_files(path, d)) > 3  # genuinely fragmented first

    before = sorted(
        map(str, spark.read.parquet(path).collect())
    )
    compact_partitions(spark, path, target_rows_per_file=30, one_pass=True)

    for d in dates:
        assert len(_files(path, d)) == 3  # ceil(90/30), exact
    after = sorted(map(str, spark.read.parquet(path).collect()))
    assert before == after


def test_compact_sort_by_makes_footer_ranges_disjoint(spark, tmp_path):
    """sort_by clustering: after a sorted rewrite every partition's
    files carry pairwise-DISJOINT footer min/max ranges for the sort
    key, so a key-predicate scan prunes whole files instead of
    reading all of them. Pinned for BOTH strategies (one-pass rides
    sortWithinPartitions on the date shuffle; per-date uses
    repartitionByRange on the key)."""
    dates = ["2024-03-04", "2024-03-05"]

    for strategy in ("one_pass", "per_date"):
        sub = tmp_path / strategy
        sub.mkdir()
        path = _slim_fragmented_sink(spark, sub, dates, 90, 9)
        # fragmented round-robin writes: ranges overlap before compact
        pre = _footer_key_ranges(path, dates[0], "appsflyer_id")
        assert len(pre) > 3
        overlaps = sum(
            1
            for i, (lo1, hi1) in enumerate(pre)
            for lo2, hi2 in pre[i + 1 :]
            if lo1 <= hi2 and lo2 <= hi1
        )
        assert overlaps > 0, "fixture should start unclustered"

        compact_partitions(
            spark,
            path,
            target_rows_per_file=30,
            one_pass=(strategy == "one_pass"),
            sort_by=["appsflyer_id"],
        )
        for d in dates:
            got = sorted(_footer_key_ranges(path, d, "appsflyer_id"))
            assert 1 < len(got) <= 3, got
            for (_, hi), (lo_next, _) in zip(got, got[1:]):
                assert hi < lo_next, f"{strategy}: overlapping files {got}"
        rows = spark.read.parquet(path)
        assert rows.count() == len(dates) * 90
        assert rows.select("appsflyer_id").distinct().count() == 90


def test_maintain_sink_full_policy_pass(spark):
    """maintain_sink runs the standard optimize→fold→vacuum policy:
    a fragmented, dv-laden sink comes out compact, folded, vacuumed,
    and dv-free; a healthy sink's pass is metadata-only."""
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        _manifest_read,
        maintain_sink,
        read_committed_parquet,
    )
    from appsflyer_to_clickhouse_spark.sinks.mutations import delete_where

    spark.dataSource.register(ClickHouseArrowDataSource)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("val", T.DoubleType()),
        ]
    )
    path = tempfile.mkdtemp(prefix="spark_graft_maint_") + "/s"
    for lo in range(0, 100, 10):  # 10 tiny parts
        (
            spark.range(lo, lo + 10)
            .select(F.col("id"), (F.col("id") * 1.0).alias("val"))
            .coalesce(1)
            .write.format("chbatch_arrow")
            .option("path", path)
            .mode("append")
            .save()
        )
    delete_where(spark, path, schema, "id % 10 = 3", mode="dv")  # 10%

    dry = maintain_sink(
        spark, path, schema, retain_history=2, vacuum_min_age_s=0.0,
        dry_run=True,
    )
    assert dry["optimize"]["needed"]
    assert any("fragmented" in r for r in dry["optimize"]["reasons"])
    assert any("dv debt" in r for r in dry["optimize"]["reasons"])
    assert _manifest_read(path)["files"]  # dry run changed nothing
    assert len(_manifest_read(path)["files"]) == 10

    rep = maintain_sink(
        spark, path, schema, retain_history=2, vacuum_min_age_s=0.0
    )
    assert rep["optimize"]["replaced"] == 10
    assert rep["truncate"]["folded"] > 0
    # the replaced originals stay vacuum-protected while the RETAINED
    # replace commit still time-travels to them — reclamation is the
    # NEXT pass's job, once the retention window slides past the
    # compaction (the OPTIMIZE→retention→VACUUM hand-off)
    assert rep["vacuum"]["removed"] == []
    m = _manifest_read(path)
    assert len(m["files"]) == 1 and "dv" not in m
    back = read_committed_parquet(spark, path, schema)
    assert back.count() == 90
    assert back.filter("id % 10 = 3").count() == 0
    # next pass after the window slides (one more commit, tighter
    # retention): optimize skipped (healthy), the fold passes the
    # compaction commit, and vacuum reclaims the 10 originals
    (
        spark.range(100, 101)
        .select(F.col("id"), (F.col("id") * 1.0).alias("val"))
        .coalesce(1)
        .write.format("chbatch_arrow")
        .option("path", path)
        .mode("append")
        .save()
    )
    rep2 = maintain_sink(
        spark, path, schema, retain_history=1, vacuum_min_age_s=0.0
    )
    assert not rep2["optimize"]["needed"]
    assert len(rep2["vacuum"]["removed"]) == 10
    assert read_committed_parquet(spark, path, schema).count() == 91
