"""Deletion-vector SIDECARS (VERDICT r7 task 2): vectors past the
inline threshold land as packed-int64 ``dv-*.bin`` files referenced
from the manifest, raising the merge-on-read cap 100x (10M
positions). Pins: a 1M-row dv delete STAYS merge-on-read
(n_rewritten == 0) and reads exactly; inline + sidecar vectors merge;
OPTIMIZE materializes sidecar vectors and vacuum reaps the orphaned
binary; the Data Source reader and change feed resolve sidecar specs
executor-side; commit-log mode spills merged vectors at checkpoint.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    ClickHouseArrowDataSource,
    _manifest_read,
    dv_current,
    dv_for_version,
    dv_len,
    dv_resolve,
    optimize_sink,
    read_committed_parquet,
    vacuum_sink,
)
from appsflyer_to_clickhouse_spark.sinks.mutations import delete_where

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def _build(spark, n, n_parts=2, prefix="spark_graft_dvsc_"):
    spark.dataSource.register(ClickHouseArrowDataSource)
    path = tempfile.mkdtemp(prefix=prefix) + "/s"
    step = n // n_parts
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 7).cast("string").alias("grp"),
        (F.col("id") * 1.5).alias("val"),
    )
    for p in range(n_parts):
        (
            df.filter(
                (F.col("id") >= p * step) & (F.col("id") < (p + 1) * step)
            )
            .coalesce(1)
            .write.format("chbatch_arrow")
            .option("path", path)
            .option("batchsize", "100000000")
            .mode("append")
            .save()
        )
    return path


def test_million_row_dv_delete_stays_merge_on_read(spark):
    """The headline pin: deleting 1M rows by vector does NOT fall back
    to copy-on-write, the manifest carries a sidecar REFERENCE (not a
    million inline ints), and reads subtract exactly."""
    n = 1_200_000
    path = _build(spark, n)
    r = delete_where(spark, path, SCHEMA, "id % 6 != 5", mode="dv")
    assert r["mode"] == "dv"
    assert r["n_rewritten"] == 0  # merge-on-read, not CoW
    assert r["deleted"] == n - n // 6
    m = _manifest_read(path)
    dv = m["dv"]
    assert all(isinstance(v, dict) and "sidecar" in v for v in dv.values())
    assert sum(dv_len(v) for v in dv.values()) == r["deleted"]
    # the manifest JSON itself stays metadata-sized
    import json

    assert len(json.dumps(m)) < 64_000
    # sidecar binaries exist and are exact
    for v in dv.values():
        assert os.path.exists(os.path.join(path, v["sidecar"]))
    back = read_committed_parquet(spark, path, SCHEMA)
    assert back.count() == n // 6
    assert back.filter("id % 6 != 5").count() == 0


def test_inline_then_sidecar_merge_and_time_travel(spark):
    path = _build(spark, 10_000, n_parts=1)
    r1 = delete_where(
        spark, path, SCHEMA, "id < 100", mode="dv"
    )  # 100 rows: inline
    assert isinstance(_manifest_read(path)["dv"].popitem()[1], list)
    r2 = delete_where(
        spark, path, SCHEMA, "id >= 100 AND id < 5000", mode="dv"
    )  # 4900 more: merged vector goes sidecar
    m = _manifest_read(path)
    (val,) = m["dv"].values()
    assert isinstance(val, dict) and val["n"] == 5000
    assert r1["deleted"] == 100 and r2["deleted"] == 4900
    # time travel: v1 (after first delete) sees 100 gone, v2 all 5000
    assert (
        read_committed_parquet(spark, path, SCHEMA, version=1).count()
        == 9_900
    )
    assert (
        read_committed_parquet(spark, path, SCHEMA, version=2).count()
        == 5_000
    )
    # fold equals cache through the mixed forms
    got = dv_for_version(m, 2, path)
    (fold_val,) = got.values()
    assert sorted(dv_resolve(path, fold_val)) == sorted(
        dv_resolve(path, val)
    )


def test_optimize_materializes_sidecar_and_vacuum_reaps(spark):
    path = _build(spark, 20_000, n_parts=2)
    delete_where(spark, path, SCHEMA, "id % 3 = 0", mode="dv")
    m = _manifest_read(path)
    sidecars = [
        v["sidecar"] for v in m["dv"].values() if isinstance(v, dict)
    ]
    assert sidecars  # 6,667 positions: past the inline threshold
    r = optimize_sink(spark, path, SCHEMA, target_rows_per_file=100_000)
    assert r["written"] >= 1
    m2 = _manifest_read(path)
    assert "dv" not in m2  # materialized away
    back = read_committed_parquet(spark, path, SCHEMA)
    assert back.count() == 20_000 - (20_000 + 2) // 3
    # while retained history references the delete commit, the
    # sidecar is vacuum-protected; after the fold it reaps
    removed = vacuum_sink(path, min_age_s=0.0)
    assert not any(x.startswith("dv-") for x in removed)
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        truncate_history,
    )

    # a fold whose base sits BELOW the compact still carries the
    # vector in its dv_set (time travel to the base must resolve it):
    # push one more commit so the fold point lands past the compact,
    # then the sidecar loses its last reference and reaps
    (
        spark.range(20_000, 20_100)
        .select(
            F.col("id"),
            (F.col("id") % 7).cast("string").alias("grp"),
            (F.col("id") * 1.5).alias("val"),
        )
        .coalesce(1)
        .write.format("chbatch_arrow")
        .option("path", path)
        .mode("append")
        .save()
    )
    truncate_history(path, retain_last=1)
    removed = vacuum_sink(path, min_age_s=0.0)
    assert any(x.startswith("dv-") for x in removed)
    for sc in sidecars:
        assert not os.path.exists(os.path.join(path, sc))


def test_datasource_reader_resolves_sidecar_spec(spark):
    path = _build(spark, 30_000, n_parts=2)
    delete_where(spark, path, SCHEMA, "id % 2 = 0", mode="dv")
    df = (
        spark.read.format("chbatch_arrow")
        .schema(SCHEMA)
        .option("path", path)
        .load()
    )
    assert df.count() == 15_000
    assert df.filter("id % 2 = 0").count() == 0


def test_changefeed_emits_sidecar_delete_rows(spark, tmp_path):
    path = _build(spark, 12_000, n_parts=1)
    r = delete_where(spark, path, SCHEMA, "id % 4 = 1", mode="dv")
    assert r["deleted"] == 3_000
    cdf_schema = T.StructType(
        [
            *SCHEMA.fields,
            T.StructField("_change_type", T.StringType()),
            T.StructField("_commit_version", T.LongType()),
        ]
    )
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("chbatch_arrow")
        .schema(cdf_schema)
        .option("path", path)
        .option("changefeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.schema(cdf_schema).parquet(out)
    deletes = got.filter("_change_type = 'delete'")
    assert deletes.count() == 3_000
    assert deletes.filter("id % 4 != 1").count() == 0
    # batch feed agrees
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        table_changes,
    )

    tc = table_changes(spark, path, SCHEMA, 1, 1)
    assert tc.filter("_change_type = 'delete'").count() == 3_000


def test_commit_log_checkpoint_spills_merged_vector(spark):
    """In commit-log mode, two sidecar dv deletes on one file merge at
    READ time in memory; the checkpoint fold spills the merged vector
    back to a sidecar so the checkpoint JSON stays metadata-sized."""
    import json

    from appsflyer_to_clickhouse_spark.sinks import commit_log as cl
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        MANIFEST,
        _manifest_lock,
    )

    path = _build(spark, 50_000, n_parts=1, prefix="spark_graft_dvcl_")
    cl.enable_commit_log(path, checkpoint_interval=1000)
    delete_where(spark, path, SCHEMA, "id < 20000", mode="dv")
    delete_where(
        spark, path, SCHEMA, "id >= 20000 AND id < 40000", mode="dv"
    )
    assert read_committed_parquet(spark, path, SCHEMA).count() == 10_000
    with _manifest_lock(path):
        cl.fold_pending_locked(path)
    with open(os.path.join(path, MANIFEST)) as fh:
        ckpt = json.load(fh)
    (val,) = ckpt["dv"].values()
    assert isinstance(val, dict) and val["n"] == 40_000
    assert len(json.dumps(ckpt)) < 64_000
    assert read_committed_parquet(spark, path, SCHEMA).count() == 10_000


def test_dv_hit_collection_is_per_file_arrays(spark):
    """ADVICE r8 / VERDICT r8 task 5 pin: the dv match collection
    transfers ONE row per touched file (name + packed positions),
    never one Python Row per deleted position — at the 10M cap that
    is ~80 MB of numpy instead of hundreds of MB of per-row string
    objects. Pinned structurally: the committed vectors are exactly
    the per-file position sets, and an over-cap predicate refuses
    BEFORE collecting (the count guard runs executor-side)."""
    import pytest

    n = 300_000
    path = _build(spark, n, n_parts=3)
    with pytest.raises(ValueError, match="matches 2[0-9]{5} rows"):
        delete_where(
            spark,
            path,
            SCHEMA,
            "id % 3 != 0",
            mode="dv",
            dv_max_rows=100_000,
        )
    # nothing was committed by the refused attempt
    assert not _manifest_read(path).get("dv")
    r = delete_where(
        spark, path, SCHEMA, "id % 3 != 0", mode="dv",
        dv_max_rows=250_000,
    )
    assert r["deleted"] == n - n // 3
    m = _manifest_read(path)
    assert sum(dv_len(v) for v in m["dv"].values()) == r["deleted"]
    got = read_committed_parquet(spark, path, SCHEMA)
    assert got.count() == n // 3
