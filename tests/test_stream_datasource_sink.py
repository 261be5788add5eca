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
    silent drop."""
    import pytest

    w = _ckpt_writer(tmp_path, "/ckpt/run1")
    _touch_parts(tmp_path, ["p0.jsonl"])
    w.commit([_PartCommit(["p0.jsonl"], 10, 1)], batchId=5)
    _touch_parts(tmp_path, ["old.jsonl"])
    with pytest.raises(ValueError, match="regressed"):
        w.commit([_PartCommit(["old.jsonl"], 1, 1)], batchId=2)
