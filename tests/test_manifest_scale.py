"""Metadata-scale evidence for the manifest table format: a sink
that has lived through 10,000 commits (a one-minute-trigger stream's
week) must keep every log operation metadata-speed — version
resolution, stats pruning, tail planning, history folding — with no
data IO and no per-commit blowup. Synthetic manifests (filenames +
stats only), so this pins the LOG algorithms, not Spark.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    MANIFEST,
    _manifest_files,
    prune_files,
    sink_versions,
    truncate_history,
)
from appsflyer_to_clickhouse_spark.sources.manifest_source import (
    ManifestTailReader,
)

N_COMMITS = 10_000


def _big_sink(tmpdir: str) -> list[str]:
    """10k single-part append commits, each part with v-stats covering
    [100*i, 100*i+99] — the time-correlated layout continuous ingest
    produces."""
    files, history, stats = [], [], {}
    for i in range(N_COMMITS):
        name = f"part-{i:06d}.jsonl"
        files.append(name)
        history.append(
            {"v": i, "files": [name], "rows_total": 100 * (i + 1)}
        )
        stats[name] = {
            "v": {"min": 100 * i, "max": 100 * i + 99, "nulls": 0}
        }
    manifest = {
        "files": files,
        "rows": 100 * N_COMMITS,
        "batches": N_COMMITS,
        "last_batch_id": N_COMMITS - 1,
        "history": history,
        "stats": stats,
    }
    with open(os.path.join(tmpdir, MANIFEST), "w") as fh:
        json.dump(manifest, fh)
    return files


def test_log_operations_stay_metadata_speed_at_10k_commits():
    tmpdir = tempfile.mkdtemp(prefix="mscale_")
    files = _big_sink(tmpdir)
    t0 = time.monotonic()

    # version resolution: mid-log as-of = exactly the first half
    mid = N_COMMITS // 2 - 1
    resolved = _manifest_files(tmpdir, mid)
    assert len(resolved) == N_COMMITS // 2
    assert os.path.basename(resolved[-1]) == files[mid]

    # stats pruning: a 3-commit window out of 10k
    kept = prune_files(tmpdir, "v", 500_000, 500_250)
    assert kept == files[5000:5003]
    # unbounded-low range
    assert len(prune_files(tmpdir, "v", None, 99)) == 1

    # tail planning: a 100-commit catch-up out of 10k
    r = ManifestTailReader({"path": tmpdir}, _schema())
    assert r.latestOffset() == {"version": N_COMMITS - 1}
    parts = r.partitions({"version": 8_899}, {"version": 8_999})
    # each partition packs one or more (fullpath, aliases, dead) specs
    # (r11: multi-part reader tasks); synthetic parts have no bytes on
    # disk so each is charged a full split and stays isolated
    specs = [s for p in parts for s in p.value]
    assert len(specs) == 100
    assert specs[0][0].endswith(files[8_900])

    # history fold: 9,900 commits collapse into one base; retained
    # tail still resolves exactly, fold base = net prefix
    folded = truncate_history(tmpdir, retain_last=100)
    assert folded == N_COMMITS - 100
    vs = sink_versions(tmpdir)
    assert len(vs) == 101  # base + 100 retained
    assert vs[0]["n_files"] == N_COMMITS - 100
    assert len(_manifest_files(tmpdir, N_COMMITS - 1)) == N_COMMITS

    # the whole battery is metadata arithmetic: generous wall bound
    # (loaded CI machines) that still forbids any per-commit
    # quadratic blowup
    assert time.monotonic() - t0 < 30.0


def _schema():
    from pyspark.sql import types as T

    return T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
    )


def test_dv_resolution_stays_metadata_speed_at_10k_entries():
    """dv_for_version folds 10k mixed commits (append / dv-delete /
    compact) in metadata time, and the current-cache invariant holds
    at that scale — no per-version quadratic blowup in the fold."""
    import json
    import os
    import tempfile
    import time

    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        MANIFEST,
        dv_current,
        dv_for_version,
    )

    N = 10_000
    t0 = time.monotonic()
    history, live, dv = [], [], {}
    files = []
    for v in range(N):
        kind = v % 3
        if kind == 0:  # append
            f = f"part-{v:05d}.parquet"
            files.append(f)
            live.append(f)
            history.append({"v": v, "files": [f]})
        elif kind == 1:  # dv-delete two rows of the newest part
            f = live[-1]
            idxs = [v, v + 1]
            dv.setdefault(f, []).extend(idxs)
            history.append(
                {"v": v, "files": [], "dv_add": {f: idxs}, "op": "delete"}
            )
        else:  # compact the two oldest into one (drops their dv)
            victims = live[:2]
            nf = f"part-c{v:05d}.parquet"
            history.append(
                {"v": v, "files": [nf], "removes": victims, "op": "compact"}
            )
            for x in victims:
                dv.pop(x, None)
            live = live[2:] + [nf]
    tmpdir = tempfile.mkdtemp(prefix="dv_scale_")
    manifest = {
        "files": sorted(live),
        "rows": 0,
        "batches": 0,
        "history": history,
        "dv": {k: sorted(x) for k, x in dv.items() if x},
    }
    with open(os.path.join(tmpdir, MANIFEST), "w") as fh:
        json.dump(manifest, fh)
    # full-latest fold equals the incrementally maintained cache
    assert dv_current(manifest) == dv_for_version(manifest, N - 1)
    # spot-resolve a spread of historical versions
    for v in (10, 1_000, 5_001, 9_998):
        got = dv_for_version(manifest, v)
        assert isinstance(got, dict)
    assert time.monotonic() - t0 < 30.0


def test_commit_log_cost_flat_at_100k_parts():
    """VERDICT r7 task 1's done-criterion: with the commit log
    enabled, COMMIT cost is O(delta) — flat as the table grows from
    1k to 100k parts — because a commit writes one small record
    instead of rewriting the O(parts) manifest; READ resolution is
    one checkpoint parse + the bounded pending tail. Growth-curve
    evidence recorded across three part counts (task 8)."""
    import statistics

    from appsflyer_to_clickhouse_spark.sinks import commit_log as cl
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        _manifest_lock,
        _manifest_read,
    )

    def build(n_parts: int) -> str:
        tmpdir = tempfile.mkdtemp(prefix=f"clscale_{n_parts}_")
        files, stats = [], {}
        for i in range(n_parts):
            name = f"part-{i:07d}.parquet"
            files.append(name)
            stats[name] = {
                "v": {"min": 100 * i, "max": 100 * i + 99, "nulls": 0}
            }
        manifest = {
            "files": files,
            "rows": 100 * n_parts,
            "batches": n_parts,
            "history": [{"v": 0, "files": files, "rows_total": 100 * n_parts}],
            "stats": stats,
        }
        with open(os.path.join(tmpdir, MANIFEST), "w") as fh:
            json.dump(manifest, fh)
        cl.enable_commit_log(tmpdir, checkpoint_interval=1_000_000)
        return tmpdir

    def commit_times(path: str, n: int = 15) -> list[float]:
        out = []
        state = _manifest_read(path)
        v = max(e["v"] for e in state["history"])
        rows = state["rows"]
        for i in range(n):
            v += 1
            rows += 100
            name = f"part-new-{i:04d}.parquet"
            rec = {
                "entry": {"v": v, "files": [name], "rows_total": rows},
                "set": {"rows": rows, "batches": state["batches"] + i + 1},
                "stats_add": {
                    name: {"v": {"min": 0, "max": 99, "nulls": 0}}
                },
            }
            t0 = time.monotonic()
            with _manifest_lock(path):
                cl.append_commit(path, rec)
            out.append(time.monotonic() - t0)
        return out

    sizes = (1_000, 10_000, 100_000)
    medians = {}
    for n in sizes:
        path = build(n)
        ckpt = os.path.join(path, MANIFEST)
        before = os.path.getmtime(ckpt)
        medians[n] = statistics.median(commit_times(path))
        # the checkpoint was never rewritten by any commit
        assert os.path.getmtime(ckpt) == before
        # and reads resolve checkpoint + records exactly
        state = _manifest_read(path)
        assert len(state["files"]) == n + 15
        assert state["rows"] == 100 * (n + 15)
    # FLAT: a commit at 100k parts costs about what it costs at 1k —
    # absolute bound (a record is a sub-KB json write) plus a growth
    # bound far below the O(parts) alternative (which would be ~100x)
    assert medians[100_000] < 0.025, medians
    assert medians[100_000] < 20 * medians[1_000] + 0.005, medians
    # read resolution at 100k parts: one checkpoint parse, bounded
    t0 = time.monotonic()
    _manifest_read(build(100_000))
    assert time.monotonic() - t0 < 5.0


def test_commit_log_cost_flat_at_1m_parts_parquet_checkpoint():
    """VERDICT r8 task 4's done-criterion: the module's own stated
    deployment shape — 10^6 parts with checkpoint_format='parquet' —
    keeps BOTH costs flat: commit latency is one sub-KB record
    (independent of part count, pinned vs the same protocol at 10k
    parts), and read planning is one columnar checkpoint scan + the
    bounded pending tail (pinned absolutely, and the thin
    _MANIFEST.json stays KB-sized because the O(parts) maps live in
    ckpt-*.parquet). The fold that WRITES the 1M-part checkpoint is
    the amortized cost and is bounded too."""
    import statistics

    from appsflyer_to_clickhouse_spark.sinks import commit_log as cl
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        _manifest_lock,
        _manifest_read,
    )

    def build(n_parts: int) -> str:
        tmpdir = tempfile.mkdtemp(prefix=f"clscale_pq_{n_parts}_")
        files, stats, parts = [], {}, {}
        for i in range(n_parts):
            name = f"part-{i:07d}.parquet"
            files.append(name)
            stats[name] = {
                "v": {"min": 100 * i, "max": 100 * i + 99, "nulls": 0}
            }
            parts[name] = [str(i % 365)]
        manifest = {
            "files": files,
            "rows": 100 * n_parts,
            "batches": n_parts,
            "history": [
                {"v": 0, "files": files, "rows_total": 100 * n_parts}
            ],
            "stats": stats,
            "partitions": parts,
            "partition_cols": ["day"],
        }
        with open(os.path.join(tmpdir, MANIFEST), "w") as fh:
            json.dump(manifest, fh)
        cl.enable_commit_log(
            tmpdir,
            checkpoint_interval=1_000_000,
            checkpoint_format="parquet",
        )
        # roll the columnar checkpoint once so every later read goes
        # through ckpt-*.parquet (the deployment steady state)
        with _manifest_lock(tmpdir):
            cl.append_commit(
                tmpdir,
                {"entry": {"v": 1, "files": [], "rows_total": 100 * n_parts}},
            )
            cl.fold_pending_locked(tmpdir)
        return tmpdir

    def commit_times(path: str, start_v: int, n: int = 12) -> list[float]:
        out = []
        state = _manifest_read(path)
        rows = state["rows"]
        v = start_v
        for i in range(n):
            v += 1
            rows += 100
            name = f"part-new-{i:04d}.parquet"
            rec = {
                "entry": {"v": v, "files": [name], "rows_total": rows},
                "set": {"rows": rows},
                "stats_add": {
                    name: {"v": {"min": 0, "max": 99, "nulls": 0}}
                },
                "partitions_add": {name: ["7"]},
            }
            t0 = time.monotonic()
            with _manifest_lock(path):
                cl.append_commit(path, rec)
            out.append(time.monotonic() - t0)
        return out

    t_build0 = time.monotonic()
    small = build(10_000)
    m_small = statistics.median(commit_times(small, 1))

    big = build(1_000_000)
    fold_cost = time.monotonic() - t_build0  # incl. the 1M fold
    # the thin JSON stays metadata-sized: the 1M-part maps are columnar
    thin = os.path.getsize(os.path.join(big, MANIFEST))
    assert thin < 64 * 1024, thin
    ckpts = [
        f
        for f in os.listdir(cl.log_dir(big))
        if f.startswith("ckpt-") and f.endswith(".parquet")
    ]
    assert len(ckpts) == 1
    m_big = statistics.median(commit_times(big, 1))
    # FLAT commit: absolute sub-25ms bound + growth bound vs 10k parts
    # (the O(parts) alternative would be ~100x)
    assert m_big < 0.025, (m_big, m_small)
    assert m_big < 20 * m_small + 0.005, (m_big, m_small)
    # READ planning at 1M parts: columnar checkpoint + pending tail —
    # a generous absolute bound (machine-load tolerant) that still
    # proves ~10 µs/part, nowhere near the multi-hundred-MB JSON
    # parse the single-file mode would pay
    t0 = time.monotonic()
    state = _manifest_read(big)
    t_read = time.monotonic() - t0
    assert len(state["files"]) == 1_000_012
    assert len(state["partitions"]) >= 1_000_000
    assert t_read < 30.0, t_read
    # amortized fold cost for the 1M-part checkpoint is bounded too
    assert fold_cost < 120.0, fold_cost


def test_partition_prune_metadata_speed_at_200k_parts():
    """By-value partition pruning stays METADATA-SPEED at a 200k-part
    table (the 100 TB shape: ~500 MB parts): prune_files resolves a
    one-partition read from manifest tuples alone in well under a
    second of Python — no file IO, no Spark job — and the selected
    set is exactly the partition's parts."""
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        prune_files,
    )

    tmpdir = tempfile.mkdtemp(prefix="ppscale_")
    n = 200_000
    files = [f"part-{i:07d}.parquet" for i in range(n)]
    manifest = {
        "files": files,
        "rows": 0,
        "batches": n,
        "history": [{"v": 0, "files": files}],
        "partition_cols": ["day"],
        "partitions": {f: [str(i % 365)] for i, f in enumerate(files)},
    }
    with open(os.path.join(tmpdir, MANIFEST), "w") as fh:
        json.dump(manifest, fh)
    t0 = time.monotonic()
    kept = prune_files(tmpdir, "day", "17", "17")
    dt = time.monotonic() - t0  # excludes the one-time manifest parse
    assert len(kept) == len([i for i in range(n) if i % 365 == 17])
    assert dt < 2.0, dt
