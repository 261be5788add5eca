"""Commit-log storage mode (sinks/commit_log.py) — VERDICT r7 task 1.

The contract under test: a log-mode sink is STATE-IDENTICAL to a
single-file sink over the full verb sequence (appends, dv and CoW
deletes, update, merge, optimize, restore, constraints, truncate,
vacuum), while commits write O(delta) records instead of rewriting the
O(parts) manifest, and reads parse checkpoint + a bounded record tail.
"""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from appsflyer_to_clickhouse_spark.sinks import commit_log as cl
from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    MANIFEST,
    ClickHouseArrowDataSource,
    _manifest_read,
    add_constraint,
    dv_current,
    dv_for_version,
    optimize_sink,
    read_committed_parquet,
    read_committed_pruned,
    restore_sink,
    sink_versions,
    truncate_history,
    vacuum_sink,
)
from appsflyer_to_clickhouse_spark.sinks.mutations import (
    delete_where,
    merge_sink,
    update_where,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def _append(spark, path, lo, hi):
    (
        spark.range(lo, hi)
        .select(
            F.col("id"),
            (F.col("id") % 7).cast("string").alias("grp"),
            (F.col("id") * 1.5).alias("val"),
        )
        .coalesce(1)
        .write.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", "100000")
        .mode("append")
        .save()
    )


def _strip(m: dict) -> dict:
    """State modulo wall-clock and storage-mode bookkeeping."""
    out = json.loads(json.dumps(m))
    out.pop("applied_seq", None)
    for e in out.get("history") or ():
        e.pop("ts", None)
    return out


def _run_sequence(spark, path):
    """The cross-verb workout, identical for both modes."""
    _append(spark, path, 0, 300)
    _append(spark, path, 300, 600)
    _append(spark, path, 600, 900)
    # constraint added while every part still has complete stats
    # (later rewrites pop touched parts' stats — fail-closed add)
    add_constraint(path, "id_range", "id", min=0, max=10_000)
    delete_where(spark, path, SCHEMA, "id % 100 = 0", mode="dv")
    delete_where(spark, path, SCHEMA, "id >= 850")
    update_where(
        spark, path, SCHEMA, "id < 10", {"grp": "'updated'"}
    )
    src = spark.range(880, 910).select(
        F.col("id"),
        F.lit("merged").alias("grp"),
        (F.col("id") * 2.0).alias("val"),
    )
    merge_sink(spark, path, SCHEMA, src, ["id"])
    optimize_sink(spark, path, SCHEMA, target_rows_per_file=400)
    restore_sink(path, 4)
    _append(spark, path, 2000, 2100)


@pytest.fixture(scope="module")
def both(spark):
    spark.dataSource.register(ClickHouseArrowDataSource)
    v1 = tempfile.mkdtemp(prefix="spark_graft_cl_v1_") + "/s"
    v2 = tempfile.mkdtemp(prefix="spark_graft_cl_v2_") + "/s"
    cl.enable_commit_log(v2, checkpoint_interval=1000)  # no folds
    _run_sequence(spark, v1)
    _run_sequence(spark, v2)
    return v1, v2


def test_modes_state_identical(spark, both):
    v1, v2 = both
    m1, m2 = _manifest_read(v1), _manifest_read(v2)
    # file NAMES differ (uuid parts) but counts and every other piece
    # of state must line up; compare structurally
    s1, s2 = _strip(m1), _strip(m2)
    assert len(s1["files"]) == len(s2["files"])
    assert s1["rows"] == s2["rows"]
    assert s1.get("batches") == s2.get("batches")
    assert s1.get("constraints") == s2.get("constraints")
    assert [
        (e["v"], e.get("op", "append"), len(e["files"]), len(e.get("removes") or ()))
        for e in s1["history"]
    ] == [
        (e["v"], e.get("op", "append"), len(e["files"]), len(e.get("removes") or ()))
        for e in s2["history"]
    ]
    assert sorted(len(v) for v in (s1.get("dv") or {}).values()) == sorted(
        len(v) for v in (s2.get("dv") or {}).values()
    )
    # stats present for the same number of parts
    assert len(s1.get("stats") or {}) == len(s2.get("stats") or {})


def test_modes_rows_identical(spark, both):
    v1, v2 = both
    r1 = read_committed_parquet(spark, v1, SCHEMA)
    r2 = read_committed_parquet(spark, v2, SCHEMA)
    rows1 = sorted(map(tuple, r1.collect()))
    rows2 = sorted(map(tuple, r2.collect()))
    assert rows1 == rows2
    # and across TIME TRAVEL at every shared retained version
    vs1 = [e["v"] for e in sink_versions(v1)]
    vs2 = [e["v"] for e in sink_versions(v2)]
    assert vs1 == vs2
    for v in vs1:
        c1 = read_committed_parquet(spark, v1, SCHEMA, version=v).count()
        c2 = read_committed_parquet(spark, v2, SCHEMA, version=v).count()
        assert c1 == c2, f"version {v}: {c1} != {c2}"
    m2 = _manifest_read(v2)
    assert dv_current(m2) == dv_for_version(m2, vs2[-1])


def test_append_commit_is_o_delta_not_o_table(spark):
    """The headline scale property: an append in log mode writes ONE
    small record and leaves the checkpoint untouched."""
    spark.dataSource.register(ClickHouseArrowDataSource)
    path = tempfile.mkdtemp(prefix="spark_graft_cl_delta_") + "/s"
    cl.enable_commit_log(path, checkpoint_interval=1000)
    _append(spark, path, 0, 100)  # first commit = the checkpoint
    mpath = os.path.join(path, MANIFEST)
    ckpt_before = open(mpath).read()
    _append(spark, path, 100, 200)
    _append(spark, path, 200, 300)
    assert open(mpath).read() == ckpt_before  # checkpoint NOT rewritten
    recs = [
        n
        for n in os.listdir(os.path.join(path, cl.LOG_DIR))
        if n.startswith("rec-")
    ]
    assert len(recs) == 2
    for n in recs:
        sz = os.path.getsize(os.path.join(path, cl.LOG_DIR, n))
        assert sz < 4096  # a delta, not a table dump
    assert read_committed_parquet(spark, path, SCHEMA).count() == 300
    assert _manifest_read(path)["rows"] == 300


def test_checkpoint_rolls_at_interval(spark):
    spark.dataSource.register(ClickHouseArrowDataSource)
    path = tempfile.mkdtemp(prefix="spark_graft_cl_roll_") + "/s"
    cl.enable_commit_log(path, checkpoint_interval=3)
    for i in range(5):
        _append(spark, path, i * 10, (i + 1) * 10)
    d = os.path.join(path, cl.LOG_DIR)
    pending = [n for n in os.listdir(d) if n.startswith("rec-")]
    # 1st commit = checkpoint; commits 2..4 = 3 records -> folded;
    # commit 5 = 1 pending record
    assert len(pending) == 1
    state = _manifest_read(path)
    assert state["rows"] == 50
    assert [e["v"] for e in state["history"]] == [0, 1, 2, 3, 4]
    assert read_committed_parquet(spark, path, SCHEMA).count() == 50


def test_stale_record_skipped_and_reaped(spark):
    """Crash between checkpoint publish and record deletion: the
    leftover record's seq <= applied_seq, so reads skip it and the
    next fold reaps it — never double-applied."""
    spark.dataSource.register(ClickHouseArrowDataSource)
    path = tempfile.mkdtemp(prefix="spark_graft_cl_crash_") + "/s"
    cl.enable_commit_log(path, checkpoint_interval=1000)
    _append(spark, path, 0, 100)
    _append(spark, path, 100, 200)
    state_before = _manifest_read(path)
    # simulate the crash: fold (checkpoint written) but resurrect the
    # record file afterwards
    d = os.path.join(path, cl.LOG_DIR)
    rec = next(n for n in os.listdir(d) if n.startswith("rec-"))
    body = open(os.path.join(d, rec)).read()
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        _manifest_lock,
    )

    with _manifest_lock(path):
        cl.fold_pending_locked(path)
    with open(os.path.join(d, rec), "w") as fh:
        fh.write(body)  # the "crash" left it behind
    assert _strip(_manifest_read(path)) == _strip(state_before)
    assert _manifest_read(path)["rows"] == 200  # not 300 (no double)
    with _manifest_lock(path):
        cl.fold_pending_locked(path)
    assert not [n for n in os.listdir(d) if n.startswith("rec-")]


def test_fold_then_run_verbs_in_log_mode(spark):
    """truncate_history / vacuum / restore operate on the folded
    checkpoint and stay exact in log mode."""
    spark.dataSource.register(ClickHouseArrowDataSource)
    path = tempfile.mkdtemp(prefix="spark_graft_cl_fold_") + "/s"
    cl.enable_commit_log(path, checkpoint_interval=1000)
    for i in range(4):
        _append(spark, path, i * 10, (i + 1) * 10)
    optimize_sink(spark, path, SCHEMA, target_rows_per_file=1000)
    restore_sink(path, 2)
    assert read_committed_parquet(spark, path, SCHEMA).count() == 30
    folded = truncate_history(path, retain_last=2)
    assert folded >= 1
    removed = vacuum_sink(path, min_age_s=0.0)
    # time travel at the retained tail still works (fold base + the
    # 2 retained entries)
    vs = [e["v"] for e in sink_versions(path)]
    assert vs == [3, 4, 5]
    assert (
        read_committed_parquet(spark, path, SCHEMA, version=vs[-1]).count()
        == 30
    )
    # pruned read path too
    got = read_committed_pruned(spark, path, SCHEMA, "id", 0, 15)
    assert got.count() == 16


def test_stream_writer_commits_records(spark, tmp_path):
    path = str(tmp_path / "s")
    cl.enable_commit_log(path, checkpoint_interval=1000)
    spark.dataSource.register(ClickHouseArrowDataSource)
    src = str(tmp_path / "src")
    spark.range(100).select(
        F.col("id"),
        (F.col("id") % 7).cast("string").alias("grp"),
        (F.col("id") * 1.5).alias("val"),
    ).write.parquet(src)
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.schema(SCHEMA)
        .parquet(src)
        .writeStream.format("chbatch_arrow")
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    m = _manifest_read(path)
    assert m["rows"] == 100
    assert m.get("last_batch_id") == 0
    assert read_committed_parquet(spark, path, SCHEMA).count() == 100


def test_enable_is_idempotent_and_guards_interval(spark, tmp_path):
    path = str(tmp_path / "s2")
    cl.enable_commit_log(path, checkpoint_interval=8)
    cl.enable_commit_log(path, checkpoint_interval=8)  # idempotent
    with pytest.raises(ValueError, match="refusing"):
        cl.enable_commit_log(path, checkpoint_interval=16)


def test_parquet_checkpoint_round_trip(spark):
    """checkpoint_format='parquet': the O(parts) maps live in a
    columnar _chlog/ckpt-*.parquet (Delta's checkpoint.parquet) and
    _MANIFEST.json stays metadata-thin — state identical to JSON
    checkpoints, superseded checkpoint files reaped at the next
    fold, and stats of replaced (non-live) parts survive."""
    spark.dataSource.register(ClickHouseArrowDataSource)
    path = tempfile.mkdtemp(prefix="spark_graft_cl_pq_") + "/s"
    cl.enable_commit_log(
        path, checkpoint_interval=2, checkpoint_format="parquet"
    )
    for i in range(5):
        _append(spark, path, i * 10, (i + 1) * 10)
    optimize_sink(spark, path, SCHEMA, target_rows_per_file=1000)
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        _manifest_lock,
        prune_files,
    )

    with _manifest_lock(path):
        cl.fold_pending_locked(path)
    d = os.path.join(path, cl.LOG_DIR)
    ckpts = [n for n in os.listdir(d) if n.startswith("ckpt-")]
    assert len(ckpts) == 1  # superseded checkpoints reaped
    raw = json.load(open(os.path.join(path, MANIFEST)))
    assert "files" not in raw and "stats" not in raw
    assert raw["ckpt_parquet"] == ckpts[0]
    state = _manifest_read(path)
    assert state["rows"] == 50
    assert len(state["files"]) == 1  # compacted
    # replaced parts' stats survived the columnar round trip (the
    # old-version pruning affordance optimize preserves)
    assert len(state["stats"]) > 1
    assert read_committed_parquet(spark, path, SCHEMA).count() == 50
    # stats pruning works off the parquet checkpoint
    assert prune_files(path, "id", 0, 49)
    # further commits append records on top of the parquet checkpoint
    _append(spark, path, 100, 110)
    assert _manifest_read(path)["rows"] == 60
    # time travel across the whole log still exact
    assert (
        read_committed_parquet(spark, path, SCHEMA, version=2).count()
        == 30
    )


def test_parquet_checkpoint_faster_and_smaller_at_scale():
    """Growth evidence for the columnar checkpoint: at 100k parts the
    parquet checkpoint is several times smaller than the JSON
    equivalent and read_state parses it at least as fast."""
    import time

    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        _manifest_lock,
    )

    def build(fmt: str) -> str:
        tmpdir = tempfile.mkdtemp(prefix=f"clpq_{fmt}_")
        files, stats, history = [], {}, []
        for i in range(100_000):
            name = f"part-{i:07d}.parquet"
            files.append(name)
            stats[name] = {
                "v": {"min": 10 * i, "max": 10 * i + 9, "nulls": 0}
            }
            history.append({"v": i, "files": [name]})
        manifest = {
            "files": files,
            "rows": 10 * len(files),
            "batches": len(files),
            "history": history,
            "stats": stats,
        }
        with open(os.path.join(tmpdir, MANIFEST), "w") as fh:
            json.dump(manifest, fh)
        cl.enable_commit_log(
            tmpdir, checkpoint_interval=1, checkpoint_format=fmt
        )
        # one commit -> one fold -> checkpoint in the chosen format
        with _manifest_lock(tmpdir):
            cl.append_commit(
                tmpdir,
                {
                    "entry": {"v": 100_000, "files": ["part-x.parquet"]},
                    "set": {"rows": 10 * len(files) + 1},
                },
            )
        return tmpdir

    pq_dir = build("parquet")
    js_dir = build("json")
    pq_bytes = sum(
        os.path.getsize(os.path.join(pq_dir, cl.LOG_DIR, n))
        for n in os.listdir(os.path.join(pq_dir, cl.LOG_DIR))
        if n.startswith("ckpt-")
    ) + os.path.getsize(os.path.join(pq_dir, MANIFEST))
    js_bytes = os.path.getsize(os.path.join(js_dir, MANIFEST))
    assert pq_bytes < js_bytes / 2, (pq_bytes, js_bytes)
    t0 = time.monotonic()
    s1 = cl.read_state(pq_dir)
    t_pq = time.monotonic() - t0
    t0 = time.monotonic()
    s2 = cl.read_state(js_dir)
    t_js = time.monotonic() - t0
    assert s1["files"] == s2["files"]
    assert s1["stats"] == s2["stats"]
    assert t_pq < max(2 * t_js, 3.0), (t_pq, t_js)


def test_maintain_sink_in_log_mode(spark):
    """The one-pass maintenance policy (optimize -> truncate ->
    vacuum) composes over a commit-log table: the optimize lands as a
    record, the fold-then-run verbs checkpoint first, and the final
    state reads exactly."""
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        maintain_sink,
    )

    spark.dataSource.register(ClickHouseArrowDataSource)
    path = tempfile.mkdtemp(prefix="spark_graft_cl_maint_") + "/s"
    cl.enable_commit_log(path, checkpoint_interval=4)
    for i in range(6):
        _append(spark, path, i * 10, (i + 1) * 10)
    delete_where(spark, path, SCHEMA, "id % 10 = 3", mode="dv")
    report = maintain_sink(
        spark,
        path,
        SCHEMA,
        target_rows_per_file=1000,
        retain_history=3,
        vacuum_min_age_s=0.0,
        dv_fraction=0.01,
    )
    assert report["optimize"]["needed"]
    assert report["truncate"]["folded"] >= 1
    got = read_committed_parquet(spark, path, SCHEMA)
    assert got.count() == 54
    assert got.filter("id % 10 = 3").count() == 0
    # a second pass is a near-no-op and the table still reads
    maintain_sink(
        spark, path, SCHEMA, target_rows_per_file=1000,
        retain_history=3, vacuum_min_age_s=0.0,
    )
    assert read_committed_parquet(spark, path, SCHEMA).count() == 54


def test_writer_option_creates_log_mode_table(spark, tmp_path):
    """`.option("commitlog", N)`: a table born in log mode through
    the pure writer API — no helper call — for both batch tiers and
    the streaming tier."""
    spark.dataSource.register(ClickHouseArrowDataSource)
    path = str(tmp_path / "opt_batch")
    for lo, hi in ((0, 50), (50, 100), (100, 150)):
        (
            spark.range(lo, hi)
            .select(
                F.col("id"),
                (F.col("id") % 7).cast("string").alias("grp"),
                (F.col("id") * 1.5).alias("val"),
            )
            .coalesce(1)
            .write.format("chbatch_arrow")
            .option("path", path)
            .option("commitlog", "2")
            .mode("append")
            .save()
        )
    assert cl.log_enabled(path)
    assert cl._meta(path)["checkpoint_interval"] == 2
    state = _manifest_read(path)
    assert state["rows"] == 150
    assert [e["v"] for e in state["history"]] == [0, 1, 2]
    assert read_committed_parquet(spark, path, SCHEMA).count() == 150
    # streaming tier
    src = str(tmp_path / "opt_src")
    spark.range(100).select(
        F.col("id"),
        (F.col("id") % 7).cast("string").alias("grp"),
        (F.col("id") * 1.5).alias("val"),
    ).write.parquet(src)
    spath = str(tmp_path / "opt_stream")
    q = (
        spark.readStream.schema(SCHEMA)
        .parquet(src)
        .writeStream.format("chbatch_arrow")
        .option("path", spath)
        .option("commitlog", "true")
        .option("checkpointLocation", str(tmp_path / "opt_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert cl.log_enabled(spath)
    assert read_committed_parquet(spark, spath, SCHEMA).count() == 100
    # interval mismatch on an existing log table fails loudly
    with pytest.raises(Exception, match="refusing"):
        (
            spark.range(150, 160)
            .select(
                F.col("id"),
                (F.col("id") % 7).cast("string").alias("grp"),
                (F.col("id") * 1.5).alias("val"),
            )
            .write.format("chbatch_arrow")
            .option("path", path)
            .option("commitlog", "9")
            .mode("append")
            .save()
        )
