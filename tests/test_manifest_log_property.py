"""Property pins for the snapshot log (hypothesis): for ANY sequence
of append/replace commits, `_manifest_files(version)` equals a
brute-force replay of the log, and `truncate_history` preserves the
resolution of every RETAINED version while freeing exactly the parts
no retained snapshot can reach. Pure metadata arithmetic — no Spark.
"""

from __future__ import annotations

import json
import os
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    MANIFEST,
    _manifest_files,
    truncate_history,
)

# a commit script: each step is (n_new_files, replace_fraction_pct)
# or the marker (0, -k) meaning RESTORE to k versions back.
# replace_fraction_pct > 0 makes the step a REPLACE commit that
# removes that deterministic fraction of the live set.
_STEP = st.one_of(
    st.tuples(st.integers(1, 3), st.sampled_from([0, 0, 0, 40, 100])),
    st.tuples(st.just(0), st.integers(-4, -1)),  # restore marker
)


def _play(script):
    """Brute-force interpreter: returns (history, live_sets) where
    live_sets[v] is the expected file set as of version v."""
    history, live_sets = [], []
    live: set[str] = set()
    serial = 0
    for v, (n_new, pct) in enumerate(script):
        if n_new == 0 and pct < 0:
            # RESTORE to (-pct) versions back, clamped; degenerates
            # to an empty append at v=0
            back = min(-pct, len(live_sets))
            target = live_sets[-back] if back else set()
            entry = {
                "v": v,
                "files": sorted(target - live),
                "removes": sorted(live - target),
                "op": "restore",
            }
            live = set(target)
            history.append(entry)
            live_sets.append(set(live))
            continue
        new = [f"part-{serial + i:04d}.x" for i in range(n_new)]
        serial += n_new
        entry = {"v": v, "files": sorted(new)}
        if pct and live:
            victims = sorted(live)[: max(1, len(live) * pct // 100)]
            entry["removes"] = victims
            entry["op"] = "compact"
            live -= set(victims)
        live |= set(new)
        history.append(entry)
        live_sets.append(set(live))
    return history, live_sets


def _write_manifest(tmpdir, history, live):
    manifest = {
        "files": sorted(live),
        "rows": 0,
        "batches": 0,
        "history": history,
    }
    with open(os.path.join(tmpdir, MANIFEST), "w") as fh:
        json.dump(manifest, fh)


@settings(max_examples=200, deadline=None)
@given(script=st.lists(_STEP, min_size=1, max_size=8))
def test_version_resolution_matches_brute_force(script):
    tmpdir = tempfile.mkdtemp(prefix="log_prop_")
    history, live_sets = _play(script)
    _write_manifest(tmpdir, history, live_sets[-1])
    for v, expect in enumerate(live_sets):
        got = {os.path.basename(p) for p in _manifest_files(tmpdir, v)}
        assert got == expect, f"v{v}: {got} != {expect}"
    # version=None is the current snapshot
    cur = {os.path.basename(p) for p in _manifest_files(tmpdir, None)}
    assert cur == live_sets[-1]


@settings(max_examples=120, deadline=None)
@given(
    script=st.lists(_STEP, min_size=2, max_size=8),
    retain=st.integers(1, 4),
)
def test_truncate_preserves_retained_versions(script, retain):
    tmpdir = tempfile.mkdtemp(prefix="log_fold_")
    history, live_sets = _play(script)
    _write_manifest(tmpdir, history, live_sets[-1])
    folded = truncate_history(tmpdir, retain_last=retain)
    n = len(script)
    assert folded == max(0, n - retain)
    # every retained version resolves exactly as before the fold; the
    # fold base (v = n-retain-1, if any) must too — it is a readable
    # version
    first_kept = max(0, n - retain)
    for v in range(first_kept - 1 if first_kept else 0, n):
        if v < 0:
            continue
        got = {os.path.basename(p) for p in _manifest_files(tmpdir, v)}
        assert got == live_sets[v], f"post-fold v{v}"
    # parts reachable from retained history = union of base + kept
    # adds; everything else must have dropped out of the log
    with open(os.path.join(tmpdir, MANIFEST)) as fh:
        m = json.load(fh)
    referenced = {f for e in m["history"] for f in e["files"]}
    needed = set().union(
        *(live_sets[v] for v in range(max(0, first_kept - 1), n))
    ) | {
        f
        for e in history[first_kept:]
        for f in e["files"]
    }
    assert referenced == needed
