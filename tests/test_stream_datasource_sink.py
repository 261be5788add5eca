"""Streaming tier of the Python Data Source writer: the manifest
records the last committed batchId and a replayed epoch's commit is
dropped whole — the sink-side idempotence that turns Structured
Streaming's at-least-once epoch replay into exactly-once effect."""

from __future__ import annotations

import json
import os

from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    MANIFEST,
    _PartCommit,
    _StreamBatchWriter,
)


def _writer(path: str) -> _StreamBatchWriter:
    return _StreamBatchWriter({"path": str(path)}, ["k"])


def _touch_parts(path, names):
    os.makedirs(path, exist_ok=True)
    for n in names:
        with open(os.path.join(path, n), "w") as fh:
            fh.write('{"k": "x"}\n')


def test_commit_tracks_batch_id_and_merges(tmp_path):
    w = _writer(tmp_path)
    _touch_parts(tmp_path, ["p0.jsonl"])
    w.commit([_PartCommit(["p0.jsonl"], 10, 1)], batchId=0)
    _touch_parts(tmp_path, ["p1.jsonl"])
    w.commit([_PartCommit(["p1.jsonl"], 5, 1)], batchId=1)
    m = json.loads((tmp_path / MANIFEST).read_text())
    assert m["files"] == ["p0.jsonl", "p1.jsonl"]
    assert m["rows"] == 15 and m["last_batch_id"] == 1


def test_replayed_epoch_commit_is_dropped(tmp_path):
    """Dirty-failure replay: epoch 1 committed to the SINK but the
    engine's checkpoint commit was lost; the restart re-runs epoch 1.
    The second commit for batchId=1 must publish nothing and delete
    the replay's freshly-written parts."""
    w = _writer(tmp_path)
    _touch_parts(tmp_path, ["p0.jsonl"])
    w.commit([_PartCommit(["p0.jsonl"], 10, 1)], batchId=0)
    _touch_parts(tmp_path, ["p1.jsonl"])
    w.commit([_PartCommit(["p1.jsonl"], 5, 1)], batchId=1)
    before = json.loads((tmp_path / MANIFEST).read_text())
    # replay of epoch 1 writes a NEW uuid part with the same rows
    _touch_parts(tmp_path, ["p1_replay.jsonl"])
    w.commit([_PartCommit(["p1_replay.jsonl"], 5, 1)], batchId=1)
    after = json.loads((tmp_path / MANIFEST).read_text())
    assert after == before  # nothing re-published
    assert not (tmp_path / "p1_replay.jsonl").exists()  # orphan removed
    # and the NEXT epoch proceeds normally
    _touch_parts(tmp_path, ["p2.jsonl"])
    w.commit([_PartCommit(["p2.jsonl"], 2, 1)], batchId=2)
    final = json.loads((tmp_path / MANIFEST).read_text())
    assert final["rows"] == 17 and final["last_batch_id"] == 2


def test_failed_task_none_messages_and_abort(tmp_path):
    w = _writer(tmp_path)
    _touch_parts(tmp_path, ["a.jsonl", "b.jsonl"])
    # a failed task contributes None to the commit-message list
    w.commit([_PartCommit(["a.jsonl"], 3, 1), None], batchId=0)
    m = json.loads((tmp_path / MANIFEST).read_text())
    assert m["files"] == ["a.jsonl"]
    # abort removes the surviving tasks' parts, tolerates None
    w.abort([_PartCommit(["b.jsonl"], 3, 1), None], batchId=1)
    assert not (tmp_path / "b.jsonl").exists()


def _ckpt_writer(path, ckpt: str) -> _StreamBatchWriter:
    return _StreamBatchWriter(
        {"path": str(path), "checkpointlocation": ckpt}, ["k"]
    )


def test_fresh_checkpoint_restart_is_not_swallowed(tmp_path):
    """ADVICE r5 (medium): a stream restarted with a FRESH checkpoint
    restarts batchIds at 0 — against an existing sink manifest the old
    `batchId <= last` guard silently discarded every new batch until
    it passed the dead lineage's high-water mark. The manifest now
    records the checkpoint lineage; a different lineage's batch 0 is a
    new stream and MUST be published."""
    w1 = _ckpt_writer(tmp_path, "/ckpt/run1")
    _touch_parts(tmp_path, ["p0.jsonl", "p1.jsonl"])
    w1.commit([_PartCommit(["p0.jsonl"], 10, 1)], batchId=0)
    w1.commit([_PartCommit(["p1.jsonl"], 5, 1)], batchId=7)
    # new run, new checkpoint dir: batchIds restart at 0
    w2 = _ckpt_writer(tmp_path, "/ckpt/run2")
    _touch_parts(tmp_path, ["q0.jsonl"])
    w2.commit([_PartCommit(["q0.jsonl"], 3, 1)], batchId=0)
    m = json.loads((tmp_path / MANIFEST).read_text())
    assert "q0.jsonl" in m["files"]  # NOT dropped as a "replay"
    assert m["rows"] == 18
    assert m["last_batch_id"] == 0 and m["stream_id"] == "/ckpt/run2"
    # and the new lineage's own replay suppression still works
    _touch_parts(tmp_path, ["q0_replay.jsonl"])
    w2.commit([_PartCommit(["q0_replay.jsonl"], 3, 1)], batchId=0)
    m2 = json.loads((tmp_path / MANIFEST).read_text())
    assert m2["rows"] == 18
    assert not (tmp_path / "q0_replay.jsonl").exists()


def test_same_checkpoint_replay_still_dropped_across_restart(tmp_path):
    """Restart from the SAME checkpoint after a dirty failure replays
    the last epoch (batchId == last): a new writer instance with the
    same checkpointLocation must still suppress it."""
    w1 = _ckpt_writer(tmp_path, "/ckpt/run1")
    _touch_parts(tmp_path, ["p0.jsonl"])
    w1.commit([_PartCommit(["p0.jsonl"], 10, 1)], batchId=4)
    w2 = _ckpt_writer(tmp_path, "/ckpt/run1")  # restart, same lineage
    _touch_parts(tmp_path, ["p0_replay.jsonl"])
    w2.commit([_PartCommit(["p0_replay.jsonl"], 10, 1)], batchId=4)
    m = json.loads((tmp_path / MANIFEST).read_text())
    assert m["rows"] == 10 and m["files"] == ["p0.jsonl"]
    assert not (tmp_path / "p0_replay.jsonl").exists()


def test_same_checkpoint_batch_regression_fails_loudly(tmp_path):
    """Within one lineage Structured Streaming can only replay the
    single last epoch; a regression beyond that means the checkpoint
    was wiped while the sink manifest survived — loud error, never a
    silent drop. The regressed commit's freshly written parts are
    removed BEFORE the raise (ADVICE r6: raising first left them as
    permanent orphans, re-accreting on every retry)."""
    import pytest

    w = _ckpt_writer(tmp_path, "/ckpt/run1")
    _touch_parts(tmp_path, ["p0.jsonl"])
    w.commit([_PartCommit(["p0.jsonl"], 10, 1)], batchId=5)
    _touch_parts(tmp_path, ["old.jsonl"])
    with pytest.raises(ValueError, match="regressed"):
        w.commit([_PartCommit(["old.jsonl"], 1, 1)], batchId=2)
    assert not (tmp_path / "old.jsonl").exists()  # no orphan accretion
    m = json.loads((tmp_path / MANIFEST).read_text())
    assert m["files"] == ["p0.jsonl"] and m["last_batch_id"] == 5


def test_unknown_lineage_restart_replay_still_dropped(tmp_path):
    """ADVICE r6 (medium): Spark only passes checkpointLocation into
    writer options when set via .option() — with the session-conf
    default the sink's lineage is UNKNOWN. A same-checkpoint restart
    then replays batchId == last through a NEW writer instance; the
    old per-run-uuid fallback classified that as a different lineage
    and APPENDED the replay as duplicate rows. Unknown lineage must
    conservatively keep the pre-lineage drop behavior."""
    w1 = _writer(tmp_path)  # no checkpointlocation option
    _touch_parts(tmp_path, ["p0.jsonl"])
    w1.commit([_PartCommit(["p0.jsonl"], 10, 1)], batchId=4)
    w2 = _writer(tmp_path)  # restart: new instance, lineage unknown
    _touch_parts(tmp_path, ["p0_replay.jsonl"])
    w2.commit([_PartCommit(["p0_replay.jsonl"], 10, 1)], batchId=4)
    m = json.loads((tmp_path / MANIFEST).read_text())
    assert m["rows"] == 10 and m["files"] == ["p0.jsonl"]  # NOT doubled
    assert not (tmp_path / "p0_replay.jsonl").exists()
    assert "stream_id" not in m  # unknown lineage is never guessed


def test_unknown_lineage_fresh_restart_batch0_publishes(tmp_path):
    """Unknown lineage, fresh checkpoint: batchId 0 against a nonzero
    high-water mark is the one pattern no single lineage can legally
    produce — it must publish (new stream), not be swallowed."""
    w1 = _writer(tmp_path)
    _touch_parts(tmp_path, ["p0.jsonl", "p1.jsonl"])
    w1.commit([_PartCommit(["p0.jsonl"], 10, 1)], batchId=0)
    w1.commit([_PartCommit(["p1.jsonl"], 5, 1)], batchId=3)
    w2 = _writer(tmp_path)  # fresh checkpoint, batchIds restart at 0
    _touch_parts(tmp_path, ["q0.jsonl"])
    w2.commit([_PartCommit(["q0.jsonl"], 3, 1)], batchId=0)
    m = json.loads((tmp_path / MANIFEST).read_text())
    assert "q0.jsonl" in m["files"] and m["rows"] == 18
    assert m["last_batch_id"] == 0


def test_pre_lineage_manifest_with_known_writer_is_conservative(tmp_path):
    """A manifest written by the pre-lineage code has no stream_id;
    even a lineage-aware writer must then fall back to the
    conservative guard: replay of batchId == last is dropped, and
    only batch 0 vs a nonzero mark publishes as a new lineage."""
    manifest = {
        "files": ["p0.jsonl"],
        "rows": 10,
        "batches": 1,
        "last_batch_id": 4,
    }
    os.makedirs(tmp_path, exist_ok=True)
    (tmp_path / MANIFEST).write_text(json.dumps(manifest))
    _touch_parts(tmp_path, ["p0.jsonl"])
    w = _ckpt_writer(tmp_path, "/ckpt/run1")  # lineage-aware writer
    _touch_parts(tmp_path, ["replay.jsonl"])
    w.commit([_PartCommit(["replay.jsonl"], 10, 1)], batchId=4)
    m = json.loads((tmp_path / MANIFEST).read_text())
    assert m["rows"] == 10 and not (tmp_path / "replay.jsonl").exists()
    _touch_parts(tmp_path, ["fresh0.jsonl"])
    w.commit([_PartCommit(["fresh0.jsonl"], 2, 1)], batchId=0)
    m2 = json.loads((tmp_path / MANIFEST).read_text())
    assert "fresh0.jsonl" in m2["files"] and m2["rows"] == 12
    assert m2["stream_id"] == "/ckpt/run1"  # lineage now tracked


def test_unknown_lineage_drop_warns(tmp_path):
    """The conservative drop under UNKNOWN lineage is a guess — when
    it fires, the operator must be told (a genuinely new stream's rows
    were just suppressed) instead of silent suppression."""
    import warnings

    w1 = _writer(tmp_path)
    _touch_parts(tmp_path, ["p0.jsonl"])
    w1.commit([_PartCommit(["p0.jsonl"], 10, 1)], batchId=4)
    w2 = _writer(tmp_path)
    _touch_parts(tmp_path, ["p0_replay.jsonl"])
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        w2.commit([_PartCommit(["p0_replay.jsonl"], 10, 1)], batchId=4)
    assert any("lineage is unknown" in str(c.message) for c in caught)
    # known lineage drops stay silent (they are certain, not a guess)
    w3 = _ckpt_writer(tmp_path, "/ckpt/k")
    _touch_parts(tmp_path, ["k0.jsonl", "k0_replay.jsonl"])
    w3.commit([_PartCommit(["k0.jsonl"], 1, 1)], batchId=9)
    with warnings.catch_warnings(record=True) as caught2:
        warnings.simplefilter("always")
        w3.commit([_PartCommit(["k0_replay.jsonl"], 1, 1)], batchId=9)
    assert not any("lineage" in str(c.message) for c in caught2)


def test_live_conf_default_checkpoint_has_no_lineage(spark, tmp_path):
    """CANARY (ADVICE r6): with the session-conf default
    spark.sql.streaming.checkpointLocation, Spark does NOT deliver the
    resolved checkpoint dir into the writer options — verified live
    here. The sink must therefore record NO stream_id (never guess).
    If a future Spark version starts delivering it, this test fails —
    that's good news: flip the assertion and drop the conservative
    fallback docs."""
    from pyspark.sql import functions as F

    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        ClickHouseBatchDataSource,
    )

    spark.dataSource.register(ClickHouseBatchDataSource)
    src = str(tmp_path / "src")
    spark.range(25).select(
        F.col("id").cast("string").alias("k")
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema
    sink = str(tmp_path / "sink")
    prev = spark.conf.get("spark.sql.streaming.checkpointLocation", None)
    spark.conf.set(
        "spark.sql.streaming.checkpointLocation", str(tmp_path / "ckroot")
    )
    try:
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.format("chbatch")
            .option("path", sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.checkpointLocation")
        else:
            spark.conf.set("spark.sql.streaming.checkpointLocation", prev)
    m = json.loads((tmp_path / "sink" / MANIFEST).read_text())
    assert m["rows"] == 25
    assert "stream_id" not in m  # unknown stays unknown — never guessed


def test_live_stream_checkpoint_lineage_end_to_end(spark, tmp_path):
    """VERDICT r6 task 7: pin — with a REAL writeStream — that Spark
    delivers the writer-option checkpointLocation into the sink's
    options (manifest stream_id == the checkpoint path), and that a
    restart with a FRESH checkpoint against the same sink publishes
    its batches instead of swallowing them below the dead lineage's
    high-water mark."""
    from pyspark.sql import functions as F

    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        ClickHouseBatchDataSource,
    )

    spark.dataSource.register(ClickHouseBatchDataSource)
    src = str(tmp_path / "src")
    spark.range(100).select(
        F.col("id").cast("string").alias("k")
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema
    sink = str(tmp_path / "sink")

    def run(ckpt: str) -> None:
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.format("chbatch")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    ckpt1 = str(tmp_path / "ckpt1")
    run(ckpt1)
    m1 = json.loads((tmp_path / "sink" / MANIFEST).read_text())
    # Spark delivers the checkpoint location (possibly URI-qualified)
    assert m1["rows"] == 100
    assert ckpt1 in m1["stream_id"]
    # fresh checkpoint, same sink: batchIds restart at 0; the new
    # lineage's batch MUST publish
    ckpt2 = str(tmp_path / "ckpt2")
    run(ckpt2)
    m2 = json.loads((tmp_path / "sink" / MANIFEST).read_text())
    assert m2["rows"] == 200
    assert ckpt2 in m2["stream_id"]
