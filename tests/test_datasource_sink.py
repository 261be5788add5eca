"""Two-phase commit protocol of the Python Data Source writer
(sinks/datasource_sink.py): only manifest-published parts are visible,
orphan parts from failed/speculative attempts are not, and executor
flush cadence follows batchsize.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    MANIFEST,
    ClickHouseBatchDataSource,
    read_committed,
)

_SCHEMA = T.StructType(
    [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
)


def _write(spark, path: str, n: int, batchsize: int, parts: int = 2) -> None:
    spark.dataSource.register(ClickHouseBatchDataSource)
    df = (
        spark.range(n)
        .repartition(parts)
        .select(F.col("id").cast("string").alias("k"), F.col("id").alias("v"))
    )
    (
        df.write.format("chbatch")
        .option("path", path)
        .option("batchsize", str(batchsize))
        .mode("append")
        .save()
    )


def test_round_trip_preserves_rows_and_batches_by_size(spark):
    path = tempfile.mkdtemp(prefix="chb_") + "/out"
    _write(spark, path, n=2300, batchsize=500, parts=2)
    with open(os.path.join(path, MANIFEST)) as fh:
        manifest = json.load(fh)
    assert manifest["rows"] == 2300
    # 2 partitions x ceil(~1150/500) = 3 flushes each
    assert manifest["batches"] >= 4
    assert len(manifest["files"]) == manifest["batches"]
    back = read_committed(spark, path, _SCHEMA)
    assert back.count() == 2300
    assert back.agg(F.sum("v")).first()[0] == 2300 * 2299 // 2


def test_append_merges_manifest_overwrite_replaces_it(spark):
    """A second append to the same path must MERGE the manifest (both
    runs' rows visible) — replacing it would silently orphan run 1's
    committed rows, append behaving as overwrite with no error. An
    explicit overwrite then replaces it."""
    path = tempfile.mkdtemp(prefix="chb_") + "/out"
    _write(spark, path, n=100, batchsize=50, parts=1)
    _write(spark, path, n=100, batchsize=50, parts=1)
    back = read_committed(spark, path, _SCHEMA)
    assert back.count() == 200  # both appends visible
    with open(os.path.join(path, MANIFEST)) as fh:
        assert json.load(fh)["rows"] == 200
    # overwrite mode: manifest lists ONLY the new run
    spark.dataSource.register(ClickHouseBatchDataSource)
    df = spark.range(7).select(
        F.col("id").cast("string").alias("k"), F.col("id").alias("v")
    )
    (
        df.write.format("chbatch")
        .option("path", path)
        .option("batchsize", "50")
        .mode("overwrite")
        .save()
    )
    assert read_committed(spark, path, _SCHEMA).count() == 7


def test_orphan_parts_are_invisible_to_readers(spark):
    """A part file not named by the manifest — a failed or speculative
    task attempt — must never be read."""
    path = tempfile.mkdtemp(prefix="chb_") + "/out"
    _write(spark, path, n=100, batchsize=50, parts=1)
    orphan = os.path.join(path, "part-orphanorphan.jsonl")
    with open(orphan, "w") as fh:
        fh.write(json.dumps({"k": "ghost", "v": 999999}) + "\n")
    back = read_committed(spark, path, _SCHEMA)
    assert back.count() == 100
    assert back.filter(F.col("k") == "ghost").count() == 0


def test_golden_bytes_full_sink_schema(spark):
    """Byte-pin the JSONL encoder over the FULL 49-column ClickHouse
    sink schema (7 timestamps incl. NULL, 42 strings incl. NULL/empty)
    plus the non-pipeline cell types _json_cell supports (date,
    decimal, binary). The a776c5d serialization fix exists because a
    real column crashed json.dumps; this keeps the gated path honest
    without a server: any change to value rendering — timestamp
    format, decimal losslessness, hex binary, null handling — flips
    exact bytes here."""
    import datetime as dt
    from decimal import Decimal

    from appsflyer_to_clickhouse_spark.schemas import (
        DATETIME_CH_COLS,
        ch_sink_schema,
        sink_columns,
    )
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        _manifest_files,
    )

    spark.dataSource.register(ClickHouseBatchDataSource)
    cols = sink_columns()
    assert len(cols) == 49
    ts = dt.datetime(2025, 9, 26, 4, 3, 22)
    row_full = tuple(
        ts if c in DATETIME_CH_COLS else f"v_{c}" for c in cols
    )
    # every timestamp NULL, strings alternate NULL / empty-string —
    # the sentinel distinction the ETL is contractually required to keep
    row_nulls = tuple(
        None if c in DATETIME_CH_COLS else (None if i % 2 else "")
        for i, c in enumerate(cols)
    )
    path = tempfile.mkdtemp(prefix="chb_gold_") + "/out"
    df = spark.createDataFrame([row_full, row_nulls], ch_sink_schema())
    (
        df.coalesce(1).write.format("chbatch")
        .option("path", path).mode("append").save()
    )
    [part] = _manifest_files(path)
    with open(part, "rb") as fh:
        lines = sorted(fh.read().splitlines())
    assert len(lines) == 2
    # golden bytes, spot-pinned start/end plus exact invariants
    full_line = next(l for l in lines if b"v_ad" in l)
    null_line = next(l for l in lines if b"v_ad" not in l)
    assert full_line.startswith(
        b'{"ad": "v_ad", "ad_type": "v_ad_type", "adset": "v_adset", '
        b'"appsflyer_id": "v_appsflyer_id", '
        b'"attributed_touch_time": "2025-09-26 04:03:22", '
        b'"attributed_touch_type": "v_attributed_touch_type"'
    ), full_line[:250]
    assert b'"install_time": "2025-09-26 04:03:22"' in full_line
    assert full_line.count(b"2025-09-26 04:03:22") == 7
    assert null_line.count(b"null") == 7 + sum(
        1 for i, c in enumerate(cols) if c not in DATETIME_CH_COLS and i % 2
    )
    assert null_line.count(b'""') == sum(
        1 for i, c in enumerate(cols) if c not in DATETIME_CH_COLS and not i % 2
    )

    # scalar cell-type branches, exact golden line
    aux_schema = T.StructType(
        [
            T.StructField("d", T.DateType()),
            T.StructField("dec", T.DecimalType(20, 6)),
            T.StructField("bin", T.BinaryType()),
            T.StructField("s", T.StringType()),
        ]
    )
    aux_path = tempfile.mkdtemp(prefix="chb_gold_aux_") + "/out"
    aux = spark.createDataFrame(
        [(dt.date(1994, 1, 1), Decimal("12345678901234.567890"), b"\x00\xffAB", None)],
        aux_schema,
    )
    aux.coalesce(1).write.format("chbatch").option("path", aux_path).mode(
        "append"
    ).save()
    [aux_part] = _manifest_files(aux_path)
    with open(aux_part, "rb") as fh:
        assert fh.read() == (
            b'{"bin": "00ff4142", "d": "1994-01-01", '
            b'"dec": "12345678901234.567890", "s": null}\n'
        )


def test_manifest_lock_serializes_concurrent_commits(tmp_path):
    """ADVICE r4: two concurrent append commits must not lose files —
    the O_EXCL lock serializes the manifest read-modify-write. Driven
    directly through _manifest_lock from threads (the commit path's
    exact critical section)."""
    import json
    import threading

    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        MANIFEST,
        _manifest_lock,
    )

    path = str(tmp_path)
    mpath = tmp_path / MANIFEST

    def commit(fname: str) -> None:
        with _manifest_lock(path):
            prev = (
                json.loads(mpath.read_text())
                if mpath.exists()
                else {"files": [], "rows": 0, "batches": 0}
            )
            merged = {
                "files": sorted(set(prev["files"]) | {fname}),
                "rows": prev["rows"] + 1,
                "batches": prev["batches"] + 1,
            }
            mpath.write_text(json.dumps(merged))

    threads = [
        threading.Thread(target=commit, args=(f"part-{i}.jsonl",))
        for i in range(16)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    final = json.loads(mpath.read_text())
    assert len(final["files"]) == 16 and final["rows"] == 16
    assert not (tmp_path / (MANIFEST + ".lock")).exists()


def test_manifest_lock_breaks_stale_lock(tmp_path):
    """A lock left by a dead committer is broken after the waiter has
    OBSERVED the same owner uuid for timeout_s (no wall-clock mtime
    comparison — ADVICE r5: mtime vs local time.time() breaks under
    NFS clock skew), instead of deadlocking every future commit."""
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        MANIFEST,
        _manifest_lock,
    )

    lock = tmp_path / (MANIFEST + ".lock")
    lock.write_text("deadbeef-owner-that-died-mid-commit")
    with _manifest_lock(str(tmp_path), timeout_s=0.3):
        pass  # acquired after watching the dead owner for 0.3 s
    assert not lock.exists()


def test_manifest_lock_break_is_single_winner(tmp_path):
    """Two waiters that both observe the same stale lock must not BOTH
    end up inside the critical section: the rename-based break has
    exactly one winner (the remove-then-reacquire break it replaces
    let waiter B remove waiter A's freshly acquired lock)."""
    import threading
    import time

    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        MANIFEST,
        _manifest_lock,
    )

    lock = tmp_path / (MANIFEST + ".lock")
    lock.write_text("dead-owner")
    inside = set()
    overlap = []

    def waiter(i: int) -> None:
        with _manifest_lock(str(tmp_path), timeout_s=0.3):
            inside.add(i)
            if len(inside) > 1:
                overlap.append(tuple(inside))
            time.sleep(0.05)
            inside.discard(i)

    threads = [threading.Thread(target=waiter, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert overlap == []  # mutual exclusion held through the break
    assert not lock.exists()


def test_manifest_lock_fresh_owner_resets_staleness(tmp_path):
    """A lock whose owner uuid CHANGES must never be broken as stale:
    the waiter's staleness clock resets on every observed owner
    turnover (datasource_sink.py `watched != owner` branch). The lock
    is held continuously for >4x timeout_s, but its body rotates to a
    new owner uuid faster than timeout_s — the waiter must never break
    it, and must acquire only after the real release."""
    import threading
    import time

    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        MANIFEST,
        _manifest_lock,
    )

    lock = tmp_path / (MANIFEST + ".lock")
    lock.write_text("owner-initial")
    acquired = threading.Event()

    def waiter() -> None:
        with _manifest_lock(str(tmp_path), timeout_s=0.5):
            acquired.set()

    t = threading.Thread(target=waiter)
    t.start()
    # rotate the owner uuid every 0.3 s (< timeout_s) for ~2.4 s total
    # (> 4x timeout_s of continuous holding); no single owner is ever
    # observable for a full timeout_s, so the lock must survive
    for i in range(8):
        time.sleep(0.3)
        assert not acquired.is_set() and lock.exists(), (
            "lock broken as stale despite live owner turnover"
        )
        lock.write_text(f"owner-{i}")
    lock.unlink()  # the real release
    t.join(timeout=30)
    assert acquired.is_set()


def test_manifest_lock_break_restores_fresh_owner(tmp_path):
    """TOCTOU in the stale break (ADVICE r6): if, between the waiter's
    last read of the stale uuid and its os.rename, the stale owner
    releases and a FRESH owner acquires, the breaker renames a LIVE
    lock. The post-rename verify must notice the body is not the
    watched uuid, RESTORE the lock, and resume waiting. Driven
    deterministically by swapping the lock body to a fresh owner while
    the waiter sleeps just before its staleness deadline expires."""
    import threading
    import time

    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        MANIFEST,
        _manifest_lock,
    )

    lock = tmp_path / (MANIFEST + ".lock")
    lock.write_text("stale-owner")
    acquired = threading.Event()
    orig_rename = os.rename
    swapped = threading.Event()

    def racing_rename(src, dst):
        # interleave the adversary INSIDE the read→rename window:
        # first break attempt renames a lock whose body was swapped
        # to a fresh owner after the waiter's last read
        if src == str(lock) and not swapped.is_set():
            lock.write_text("fresh-owner")
            swapped.set()
        return orig_rename(src, dst)

    def waiter() -> None:
        with _manifest_lock(str(tmp_path), timeout_s=0.3):
            acquired.set()

    import unittest.mock as mock

    with mock.patch(
        "appsflyer_to_clickhouse_spark.sinks.datasource_sink.os.rename",
        side_effect=racing_rename,
    ):
        t = threading.Thread(target=waiter)
        t.start()
        # wait until the first break attempt hit the race
        assert swapped.wait(timeout=10)
        time.sleep(0.1)
        # the fresh owner's lock was restored, not broken
        assert lock.exists() and lock.read_text() == "fresh-owner"
        assert not acquired.is_set()
        # fresh owner now holds past timeout_s without turnover -> the
        # waiter legitimately breaks it and acquires
        t.join(timeout=30)
    assert acquired.is_set()
    assert not lock.exists()


# ---------------------------------------------------------------------------
# snapshot log: version-as-of reads, vacuum, history truncation
# ---------------------------------------------------------------------------


def _manifest(path):
    with open(os.path.join(path, MANIFEST)) as fh:
        return json.load(fh)


def test_as_of_reads_replay_each_append_snapshot(spark):
    """Three appends -> versions 0/1/2; an as-of read of v must see
    exactly the first v+1 appends' rows, and the version log must
    resolve from manifest metadata alone."""
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        sink_versions,
    )

    path = tempfile.mkdtemp(prefix="chb_asof_") + "/out"
    _write(spark, path, n=10, batchsize=100, parts=1)  # v0: ids 0-9
    _write(spark, path, n=25, batchsize=100, parts=1)  # v1: ids 0-24
    _write(spark, path, n=40, batchsize=100, parts=1)  # v2: ids 0-39

    assert [e["v"] for e in sink_versions(path)] == [0, 1, 2]
    assert read_committed(spark, path, _SCHEMA, version=0).count() == 10
    assert read_committed(spark, path, _SCHEMA, version=1).count() == 35
    assert read_committed(spark, path, _SCHEMA, version=2).count() == 75
    # default read == newest snapshot
    assert read_committed(spark, path, _SCHEMA).count() == 75

    import pytest as _pytest

    with _pytest.raises(ValueError, match="no snapshot v7"):
        read_committed(spark, path, _SCHEMA, version=7)


def test_vacuum_removes_only_unreferenced_parts(spark):
    """Vacuum deletes crashed-writer orphans and overwrite leftovers,
    never manifest- or history-referenced parts, and honors the
    min_age_s in-flight safety lag."""
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        vacuum_sink,
    )

    path = tempfile.mkdtemp(prefix="chb_vac_") + "/out"
    _write(spark, path, n=10, batchsize=100, parts=1)
    _write(spark, path, n=20, batchsize=100, parts=1)

    # a crashed pre-commit writer's leftover: part-named, uncommitted
    orphan = os.path.join(path, "part-deadbeef.jsonl")
    with open(orphan, "w") as fh:
        fh.write('{"k": "zombie", "v": -1}\n')
    # a foreign file that must never be touched
    keep = os.path.join(path, "README.txt")
    with open(keep, "w") as fh:
        fh.write("not a part\n")

    # age guard: a "fresh" orphan (simulating an in-flight writer's
    # part) survives a lagged vacuum...
    assert vacuum_sink(path, min_age_s=3600) == []
    assert os.path.exists(orphan)
    # ...and goes when the lag is zero
    assert vacuum_sink(path) == ["part-deadbeef.jsonl"]
    assert not os.path.exists(orphan)
    assert os.path.exists(keep)

    # both committed snapshots still fully readable (history survives)
    assert read_committed(spark, path, _SCHEMA, version=0).count() == 10
    assert read_committed(spark, path, _SCHEMA).count() == 30

    # overwrite starts a new generation: the old parts become
    # unreferenced and vacuumable, the new snapshot intact
    spark.dataSource.register(ClickHouseBatchDataSource)
    (
        spark.range(5)
        .select(F.col("id").cast("string").alias("k"), F.col("id").alias("v"))
        .write.format("chbatch")
        .option("path", path)
        .mode("overwrite")
        .save()
    )
    removed = vacuum_sink(path)
    assert len(removed) == 2  # one part per pre-overwrite append
    assert read_committed(spark, path, _SCHEMA).count() == 5


def test_truncate_history_folds_old_versions_keeps_data(spark):
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        sink_versions,
        truncate_history,
        vacuum_sink,
    )

    path = tempfile.mkdtemp(prefix="chb_trunc_") + "/out"
    for n in (10, 20, 30, 40):
        _write(spark, path, n=n, batchsize=100, parts=1)
    assert [e["v"] for e in sink_versions(path)] == [0, 1, 2, 3]

    assert truncate_history(path, retain_last=2) == 2  # v0+v1 -> base v1
    assert [e["v"] for e in sink_versions(path)] == [1, 2, 3]
    # folded base still resolves: v1 == first two appends
    assert read_committed(spark, path, _SCHEMA, version=1).count() == 30
    # v0 is below the fold now
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no snapshot v0"):
        read_committed(spark, path, _SCHEMA, version=0)
    # truncation freed metadata, not data: vacuum finds no orphans and
    # the current snapshot is untouched
    assert vacuum_sink(path) == []
    assert read_committed(spark, path, _SCHEMA).count() == 100
    assert truncate_history(path, retain_last=3) == 0  # already bounded


def test_stream_commits_log_batch_ids_in_history(spark, tmp_path):
    """The streaming tier's commits append history entries carrying
    their batchId — replays (dropped) must NOT mint versions."""
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        _PartCommit,
        _StreamBatchWriter,
        sink_versions,
    )

    path = str(tmp_path / "sink")
    os.makedirs(path)

    def _commit(batch_id, fname):
        with open(os.path.join(path, fname), "w") as fh:
            fh.write('{"k": "x", "v": 1}\n')
        w = _StreamBatchWriter(
            {"path": path, "checkpointlocation": "/ckpt/a"}, ["k", "v"]
        )
        w.commit([_PartCommit([fname], 1, 1)], batch_id)

    _commit(0, "part-a.jsonl")
    _commit(1, "part-b.jsonl")
    _commit(1, "part-b2.jsonl")  # replay of batch 1: dropped

    log = sink_versions(path)
    assert [(e["v"], e["batch_id"]) for e in log] == [(0, 0), (1, 1)]
    assert not os.path.exists(os.path.join(path, "part-b2.jsonl"))
