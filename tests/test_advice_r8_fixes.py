"""Regression pins for the round-8 ADVICE findings + VERDICT r8
tasks 4/8 (writer-API parquet checkpoints, enable crash window):

1. (high) ``clone_sink`` must absolutize deletion-vector SIDECAR
   references — a shallow clone of a table with a >inline-cap delete
   crashed every read with FileNotFoundError because bare ``dv-*.bin``
   names were resolved against the clone's directory.
2. (medium) ``commit_log.read_state`` runs lock-free; a concurrent
   checkpoint fold deletes the record files it just folded, so a
   reader could FileNotFoundError mid-read. It now restarts from the
   (newer) checkpoint.
3. (low) concurrent ``enable_commit_log`` with different settings
   must serialize through the manifest lock: exactly one wins, the
   loser gets the settings-mismatch refusal — never a silent
   last-wins meta overwrite.
4. (low) ``.option("commitlog", "false")`` is a no-op; malformed
   values fail at WRITER CONSTRUCTION with a clear message, not at
   commit time after executor writes.
5. (r8 task 8) a crash between ``makedirs(_chlog)`` and the
   ``_meta.json`` publish leaves the table in SINGLE-FILE mode
   (readable, repairable), never bricked.
6. (r8 task 4) ``checkpoint_format="parquet"`` is reachable through
   the pure writer API via ``.option("commitlogformat", "parquet")``.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from appsflyer_to_clickhouse_spark.sinks import commit_log
from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    ClickHouseArrowDataSource,
    _manifest_read,
    _parse_commitlog,
    clone_sink,
    read_committed_parquet,
)
from appsflyer_to_clickhouse_spark.sinks.mutations import delete_where

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def _build(spark, n, n_parts=2, prefix="spark_graft_advr8_"):
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


# -- 1. clone carries sidecar dv readably -------------------------------


def test_clone_with_sidecar_dv_reads_exact(spark):
    """The ADVICE-high pin: a shallow clone of a table whose dv map
    holds SIDECAR references (the default past 1,024 positions) must
    read exactly — the clone's manifest stores the sidecar as an
    absolute path into the source directory, mirroring the data-file
    absolutization."""
    n = 20_000
    src = _build(spark, n)
    r = delete_where(spark, src, SCHEMA, "id % 3 = 0", mode="dv")
    assert r["n_rewritten"] == 0
    m = _manifest_read(src)
    assert any(
        isinstance(v, dict) and "sidecar" in v
        for v in m["dv"].values()
    ), "precondition: the delete must have produced sidecar vectors"
    dst = tempfile.mkdtemp(prefix="spark_graft_advr8_") + "/c"
    clone_sink(src, dst)
    cm = _manifest_read(dst)
    for v in cm["dv"].values():
        if isinstance(v, dict):
            assert os.path.isabs(v["sidecar"])
            assert os.path.exists(v["sidecar"])
    got = read_committed_parquet(spark, dst, SCHEMA)
    assert got.count() == n - r["deleted"]
    assert got.filter("id % 3 = 0").count() == 0
    # and the clone's history base carries the same absolutized refs
    dv_set = cm["history"][0]["dv_set"]
    assert dv_set == cm["dv"]


# -- 2. read_state survives a concurrent checkpoint fold ----------------


def test_read_state_survives_concurrent_folds(tmp_path):
    """Stress the lock-free read path against a committing writer
    whose tiny checkpoint interval rolls (and deletes record files)
    constantly: every read must return a consistent state, never
    raise FileNotFoundError."""
    path = str(tmp_path / "t")
    os.makedirs(path)
    with open(os.path.join(path, commit_log.MANIFEST), "w") as fh:
        json.dump({"files": [], "rows": 0, "batches": 0, "history": []}, fh)
    commit_log.enable_commit_log(path, checkpoint_interval=2)
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        _manifest_lock,
    )

    errs: list[BaseException] = []
    stop = threading.Event()

    def writer():
        try:
            for i in range(120):
                with _manifest_lock(path):
                    commit_log.append_commit(
                        path,
                        {
                            "entry": {
                                "v": i + 1,
                                "files": [f"part-{i}.parquet"],
                                "rows_total": i + 1,
                            },
                            "set": {"rows": i + 1, "batches": i + 1},
                        },
                    )
        except BaseException as e:  # noqa: BLE001
            errs.append(e)
        finally:
            stop.set()

    def reader():
        try:
            while not stop.is_set():
                st = commit_log.read_state(path)
                assert len(st["files"]) == int(st.get("rows", 0))
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=writer)] + [
        threading.Thread(target=reader) for _ in range(3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errs, errs
    final = commit_log.read_state(path)
    assert len(final["files"]) == 120 and final["rows"] == 120


# -- 3. concurrent enables serialize ------------------------------------


def test_concurrent_enable_divergent_settings(tmp_path):
    """Two racing enables with different intervals: exactly one
    creates the log; the other hits the settings-mismatch refusal
    INSIDE the lock. The surviving meta belongs to the winner."""
    path = str(tmp_path / "t")
    results: list = [None, None]

    def enable(slot, interval):
        try:
            commit_log.enable_commit_log(path, checkpoint_interval=interval)
            results[slot] = interval
        except ValueError as e:
            results[slot] = e

    a = threading.Thread(target=enable, args=(0, 8))
    b = threading.Thread(target=enable, args=(1, 64))
    a.start(), b.start()
    a.join(), b.join()
    wins = [r for r in results if isinstance(r, int)]
    losses = [r for r in results if isinstance(r, ValueError)]
    assert len(wins) == 1 and len(losses) == 1
    assert commit_log._meta(path)["checkpoint_interval"] == wins[0]
    assert "refusing to silently change" in str(losses[0])


# -- 4. commitlog option parsing ----------------------------------------


def test_parse_commitlog_false_and_malformed():
    assert _parse_commitlog({}) is None
    assert _parse_commitlog({"commitlog": "false"}) is None
    assert _parse_commitlog({"commitlog": "true"}) == (32, "json")
    assert _parse_commitlog({"commitlog": "7"}) == (7, "json")
    assert _parse_commitlog({"commitlogformat": "parquet"}) == (
        32,
        "parquet",
    )
    assert _parse_commitlog(
        {"commitlog": "5", "commitlogformat": "parquet"}
    ) == (5, "parquet")
    with pytest.raises(ValueError, match="true.*false.*integer"):
        _parse_commitlog({"commitlog": "bogus"})
    with pytest.raises(ValueError, match="json.*parquet"):
        _parse_commitlog({"commitlogformat": "orc"})
    with pytest.raises(ValueError, match="conflicts"):
        _parse_commitlog(
            {"commitlog": "false", "commitlogformat": "parquet"}
        )


def test_commitlog_false_writer_noop(spark):
    """.option('commitlog', 'false') writes a plain single-file table
    — no _chlog, no error at any stage."""
    spark.dataSource.register(ClickHouseArrowDataSource)
    path = tempfile.mkdtemp(prefix="spark_graft_advr8_") + "/s"
    (
        spark.range(100)
        .select(
            F.col("id"),
            F.lit("x").alias("grp"),
            F.col("id").cast("double").alias("val"),
        )
        .write.format("chbatch_arrow")
        .option("path", path)
        .option("commitlog", "false")
        .mode("append")
        .save()
    )
    assert not commit_log.log_enabled(path)
    assert read_committed_parquet(spark, path, SCHEMA).count() == 100


# -- 5. half-enabled crash window ----------------------------------------


def test_half_enabled_chlog_is_single_file_not_bricked(spark):
    """Crash injection for the enable window: a bare _chlog/ dir with
    no _meta.json (the state a crash between makedirs and the meta
    publish leaves) must read as a single-file table, accept commits,
    and be repairable by a later enable."""
    n = 1_000
    path = _build(spark, n, n_parts=1)
    os.makedirs(commit_log.log_dir(path))  # the crash leftover
    assert not commit_log.log_enabled(path)
    assert read_committed_parquet(spark, path, SCHEMA).count() == n
    # commits keep working in single-file mode
    (
        spark.range(n, n + 50)
        .select(
            F.col("id"),
            F.lit("y").alias("grp"),
            F.col("id").cast("double").alias("val"),
        )
        .write.format("chbatch_arrow")
        .option("path", path)
        .mode("append")
        .save()
    )
    assert read_committed_parquet(spark, path, SCHEMA).count() == n + 50
    # and the repair: enabling now completes the half-enable
    commit_log.enable_commit_log(path, checkpoint_interval=4)
    assert commit_log.log_enabled(path)
    assert read_committed_parquet(spark, path, SCHEMA).count() == n + 50


# -- 6. parquet checkpoints through the pure writer API ------------------


def test_writer_api_parquet_checkpoint(spark):
    """A table BORN through .option('commitlog', 2)
    .option('commitlogformat', 'parquet') rolls columnar checkpoints:
    after enough commits a ckpt-*.parquet exists, _MANIFEST.json
    points at it, and reads stay exact."""
    spark.dataSource.register(ClickHouseArrowDataSource)
    path = tempfile.mkdtemp(prefix="spark_graft_advr8_") + "/s"
    for i in range(5):
        (
            spark.range(i * 100, (i + 1) * 100)
            .select(
                F.col("id"),
                F.lit("x").alias("grp"),
                F.col("id").cast("double").alias("val"),
            )
            .coalesce(1)
            .write.format("chbatch_arrow")
            .option("path", path)
            .option("commitlog", "2")
            .option("commitlogformat", "parquet")
            .mode("append")
            .save()
        )
    assert commit_log._meta(path)["checkpoint_format"] == "parquet"
    ckpts = [
        f
        for f in os.listdir(commit_log.log_dir(path))
        if f.startswith("ckpt-") and f.endswith(".parquet")
    ]
    assert len(ckpts) == 1
    with open(os.path.join(path, commit_log.MANIFEST)) as fh:
        thin = json.load(fh)
    assert thin.get("ckpt_parquet") == ckpts[0]
    assert read_committed_parquet(spark, path, SCHEMA).count() == 500
    # a mismatched-format writer fails loudly, before executor work
    with pytest.raises(Exception, match="refusing to silently diverge"):
        (
            spark.range(5)
            .select(
                F.col("id"),
                F.lit("x").alias("grp"),
                F.col("id").cast("double").alias("val"),
            )
            .write.format("chbatch_arrow")
            .option("path", path)
            .option("commitlog", "2")
            .mode("append")
            .save()
        )
