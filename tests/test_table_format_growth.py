"""Growth-curve evidence for the TABLE-FORMAT tier (VERDICT r7
task 8), mirroring the dedup families' curves in
test_scale_evidence.py: commit latency, manifest/record byte size,
and change-feed planning cost measured at three part/commit counts
and asserted ~flat or ~linear where the design claims it.

All synthetic-manifest (metadata only, no Spark jobs): these pin the
LOG algorithms' complexity, which is exactly what breaks first at
10^6 parts.
"""

from __future__ import annotations

import json
import os
import statistics
import tempfile
import time

from appsflyer_to_clickhouse_spark.sinks import commit_log as cl
from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    MANIFEST,
    _manifest_lock,
    _manifest_read,
)
from appsflyer_to_clickhouse_spark.sources.manifest_source import (
    ManifestTailReader,
)

SIZES = (1_000, 4_000, 16_000)  # 4x steps: quadratic would show 16x


def _build(n_parts: int, *, log_mode: bool, interval: int = 10**9) -> str:
    tmpdir = tempfile.mkdtemp(prefix=f"tfg_{n_parts}_")
    files, stats, history = [], {}, []
    for i in range(n_parts):
        name = f"part-{i:07d}.parquet"
        files.append(name)
        stats[name] = {"v": {"min": 10 * i, "max": 10 * i + 9, "nulls": 0}}
        history.append(
            {"v": i, "files": [name], "rows_total": 10 * (i + 1)}
        )
    manifest = {
        "files": files,
        "rows": 10 * n_parts,
        "batches": n_parts,
        "history": history,
        "stats": stats,
    }
    with open(os.path.join(tmpdir, MANIFEST), "w") as fh:
        json.dump(manifest, fh)
    if log_mode:
        cl.enable_commit_log(tmpdir, checkpoint_interval=interval)
    return tmpdir


def _commit_once(path: str, tag: int) -> float:
    state = _manifest_read(path)
    v = max(e["v"] for e in state["history"]) + 1
    name = f"part-x{tag:05d}.parquet"
    rec = {
        "entry": {"v": v, "files": [name], "rows_total": state["rows"] + 10},
        "set": {"rows": state["rows"] + 10, "batches": state["batches"] + 1},
        "stats_add": {name: {"v": {"min": 0, "max": 9, "nulls": 0}}},
    }
    t0 = time.monotonic()
    with _manifest_lock(path):
        cl.append_commit(path, rec)
    return time.monotonic() - t0


def test_growth_commit_latency_flat_in_log_mode():
    """Record-append latency must NOT grow with table size (the
    single-file mode's O(parts) rewrite is the curve being retired)."""
    medians = []
    for n in SIZES:
        path = _build(n, log_mode=True)
        medians.append(
            statistics.median(_commit_once(path, i) for i in range(9))
        )
    # 16x parts -> commit latency within noise of flat; O(parts)
    # would grow ~16x. Generous 5x envelope for loaded CI.
    assert medians[-1] < 5 * medians[0] + 0.005, medians


def test_growth_record_size_constant_vs_checkpoint_linear():
    """Per-commit record bytes are CONSTANT in table size; the folded
    checkpoint grows ~linearly (it IS the state) — together, the
    amortized write amplification the checkpoint interval controls."""
    rec_sizes, ckpt_sizes = [], []
    for n in SIZES:
        path = _build(n, log_mode=True)
        _commit_once(path, 0)
        d = os.path.join(path, cl.LOG_DIR)
        rec = next(x for x in sorted(os.listdir(d)) if x.startswith("rec-"))
        rec_sizes.append(os.path.getsize(os.path.join(d, rec)))
        ckpt_sizes.append(os.path.getsize(os.path.join(path, MANIFEST)))
    # constant modulo counter digit-width (v/rows grow a few chars)
    assert max(rec_sizes) - min(rec_sizes) < 16, rec_sizes
    assert max(rec_sizes) < 1024
    # checkpoint ~linear: 16x parts within [8x, 32x] bytes
    ratio = ckpt_sizes[-1] / ckpt_sizes[0]
    assert 8 <= ratio <= 32, ckpt_sizes


def test_growth_tail_planning_linear_in_window_not_log():
    """Streaming-tail planning cost scales with the CATCH-UP WINDOW
    (commits consumed), not total log length: the same 50-commit
    window planned out of 1k/4k/16k-commit logs."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
    )
    times = []
    for n in SIZES:
        path = _build(n, log_mode=False)
        r = ManifestTailReader({"path": path}, schema)
        t0 = time.monotonic()
        parts = r.partitions({"version": n - 51}, {"version": n - 1})
        times.append(time.monotonic() - t0)
        assert len(parts) == 50
    # the window is constant, so planning time may grow only with the
    # LOG SCAN (linear, cheap). Anchor on the MID size (the smallest
    # sample is sub-10ms and noise-dominated on a loaded machine):
    # 4x commits from mid to large predicts ~4x linear vs ~16x
    # quadratic — a 10x envelope plus an absolute floor separates
    # them while absorbing shared-JVM load spikes
    assert times[-1] < 10 * times[1] + 0.1, times


def test_growth_cdf_planning_bounded_by_requested_range():
    """Change-feed planning (the partition list for changefeed=true)
    is bounded by the requested commit RANGE: constant range, constant
    partitions, regardless of total history length."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("v", T.LongType()),
            T.StructField("_change_type", T.StringType()),
            T.StructField("_commit_version", T.LongType()),
        ]
    )
    counts = []
    for n in SIZES:
        path = _build(n, log_mode=False)
        r = ManifestTailReader(
            {"path": path, "changefeed": "true"}, schema
        )
        parts = r.partitions({"version": n - 21}, {"version": n - 1})
        counts.append(len(parts))
    assert counts == [20, 20, 20], counts
