"""Cross-PROCESS mutual exclusion of the manifest commit lock
(VERDICT r7 task 4): the thread-stress pin in test_datasource_sink.py
exercises `_manifest_lock` within one interpreter, but concurrent
Spark JOBS collide as separate processes — O_EXCL + rename semantics
must hold there too. N processes x M commits each, every commit a
read-modify-write of a shared counter manifest: any lost update, torn
read, or double-acquired critical section shows up as a wrong final
count. A second pin drives the stale-lock BREAK path across
processes: one process dies inside the critical section and a fresh
process must take over exactly once.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import tempfile

from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    MANIFEST,
    _manifest_lock,
)

N_PROCS = 8
N_COMMITS = 25


def _hammer(path: str, idx: int) -> None:
    """M serialized read-modify-write commits, each under the lock —
    the exact shape every manifest commit site uses."""
    for i in range(N_COMMITS):
        with _manifest_lock(path):
            mpath = os.path.join(path, MANIFEST)
            with open(mpath) as fh:
                m = json.load(fh)
            m["rows"] += 1
            m["history"].append(
                {"v": len(m["history"]), "files": [], "by": [idx, i]}
            )
            tmp = mpath + f".tmp.{idx}"
            with open(tmp, "w") as fh:
                json.dump(m, fh)
            os.replace(tmp, mpath)


def test_lock_mutual_exclusion_across_processes():
    path = tempfile.mkdtemp(prefix="spark_graft_mplock_")
    with open(os.path.join(path, MANIFEST), "w") as fh:
        json.dump({"rows": 0, "history": []}, fh)
    ctx = mp.get_context("fork")
    procs = [
        ctx.Process(target=_hammer, args=(path, i)) for i in range(N_PROCS)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0
    with open(os.path.join(path, MANIFEST)) as fh:
        m = json.load(fh)
    # no lost update: every one of the N*M commits landed exactly once
    assert m["rows"] == N_PROCS * N_COMMITS
    assert len(m["history"]) == N_PROCS * N_COMMITS
    assert [e["v"] for e in m["history"]] == list(
        range(N_PROCS * N_COMMITS)
    )
    seen = {tuple(e["by"]) for e in m["history"]}
    assert len(seen) == N_PROCS * N_COMMITS
    # the lock file itself was cleanly released
    assert not os.path.exists(os.path.join(path, MANIFEST + ".lock"))


def _die_holding_lock(path: str) -> None:
    """Acquire the lock and hard-exit inside the critical section —
    a crashed committer that leaves its lock file behind."""
    lock = os.path.join(path, MANIFEST + ".lock")
    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.write(fd, b"deadbeef" * 4)
    os.close(fd)
    os._exit(0)  # no cleanup: the lock file survives the process


def _take_over(path: str, q) -> None:
    with _manifest_lock(path, timeout_s=2.0):
        q.put("acquired")


def test_stale_lock_broken_across_processes():
    path = tempfile.mkdtemp(prefix="spark_graft_mpstale_")
    with open(os.path.join(path, MANIFEST), "w") as fh:
        json.dump({"rows": 0, "history": []}, fh)
    ctx = mp.get_context("fork")
    dead = ctx.Process(target=_die_holding_lock, args=(path,))
    dead.start()
    dead.join(timeout=30)
    assert os.path.exists(os.path.join(path, MANIFEST + ".lock"))
    # two fresh processes race to break the stale lock: observation-
    # based staleness (same uuid watched for timeout_s) plus the
    # atomic rename-to-grave break must admit them one at a time
    q = ctx.Queue()
    waiters = [
        ctx.Process(target=_take_over, args=(path, q)) for _ in range(2)
    ]
    for p in waiters:
        p.start()
    for p in waiters:
        p.join(timeout=60)
        assert p.exitcode == 0
    got = [q.get(timeout=5) for _ in range(2)]
    assert got == ["acquired", "acquired"]
    assert not os.path.exists(os.path.join(path, MANIFEST + ".lock"))


def _log_hammer(path: str, idx: int) -> None:
    """M record-appends under the lock — the commit-log mode's hot
    path, with checkpoint rolls interleaving across processes."""
    from appsflyer_to_clickhouse_spark.sinks import commit_log as cl
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        _manifest_read,
    )

    for i in range(N_COMMITS):
        with _manifest_lock(path):
            state = _manifest_read(path)
            v = max(e["v"] for e in state["history"]) + 1
            cl.append_commit(
                path,
                {
                    "entry": {
                        "v": v,
                        "files": [f"part-{idx:02d}-{i:02d}.parquet"],
                        "rows_total": state["rows"] + 1,
                    },
                    "set": {"rows": state["rows"] + 1},
                },
            )


def test_commit_log_records_survive_process_races():
    """N processes x M commit-log records with interval-3 checkpoint
    rolls racing across processes: no lost commit, no double-applied
    record, versions dense."""
    from appsflyer_to_clickhouse_spark.sinks import commit_log as cl
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        _manifest_read,
    )

    path = tempfile.mkdtemp(prefix="spark_graft_mpclog_")
    with open(os.path.join(path, MANIFEST), "w") as fh:
        json.dump(
            {
                "rows": 0,
                "batches": 0,
                "files": [],
                "history": [{"v": 0, "files": [], "rows_total": 0}],
            },
            fh,
        )
    cl.enable_commit_log(path, checkpoint_interval=3)
    ctx = mp.get_context("fork")
    procs = [
        ctx.Process(target=_log_hammer, args=(path, i))
        for i in range(N_PROCS)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=180)
        assert p.exitcode == 0
    state = _manifest_read(path)
    total = N_PROCS * N_COMMITS
    assert state["rows"] == total
    assert len(state["files"]) == total
    assert [e["v"] for e in state["history"]] == list(range(total + 1))
    assert len(set(state["files"])) == total
