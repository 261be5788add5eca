"""Property pins for deletion-vector state resolution (hypothesis):
for ANY interleaving of append / dv-delete / replace(compact) /
restore commits, ``dv_for_version`` equals a brute-force replay of
the log at EVERY version, and a truncate_history fold preserves the
DV resolution of every retained version. Pure metadata arithmetic —
no Spark session."""

from __future__ import annotations

import json
import os
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    MANIFEST,
    dv_current,
    dv_for_version,
    truncate_history,
)

# step kinds:
#   ("append", n)          - add n new parts
#   ("dv", file_pick, k)   - dv-delete k indexes from the file_pick-th
#                            live part (modulo), no-op if none live
#   ("compact", pct)       - replace pct% of live parts with 1 new one
#   ("restore", back)      - roll back `back` versions (clamped)
_STEP = st.one_of(
    st.tuples(st.just("append"), st.integers(1, 2)),
    st.tuples(st.just("dv"), st.integers(0, 5), st.integers(1, 4)),
    st.tuples(st.just("compact"), st.sampled_from([40, 100])),
    st.tuples(st.just("restore"), st.integers(1, 4)),
)


def _play(script):
    """Brute-force interpreter mirroring the commit protocol: returns
    (history, live_sets, dv_sets) with the expected file set and DV
    state as of every version."""
    history, live_sets, dv_sets = [], [], []
    live: set[str] = set()
    dv: dict[str, set[int]] = {}
    serial = 0
    next_idx = 0
    for v, step in enumerate(script):
        kind = step[0]
        entry = {"v": v, "files": []}
        if kind == "append":
            new = [f"part-{serial + i:04d}.x" for i in range(step[1])]
            serial += step[1]
            live |= set(new)
            entry["files"] = sorted(new)
        elif kind == "dv":
            pick, k = step[1], step[2]
            if live:
                f = sorted(live)[pick % len(live)]
                idxs = set(range(next_idx, next_idx + k))
                next_idx += k
                dv.setdefault(f, set()).update(idxs)
                entry["dv_add"] = {f: sorted(idxs)}
                entry["op"] = "delete"
        elif kind == "compact":
            if live:
                victims = sorted(live)[
                    : max(1, len(live) * step[1] // 100)
                ]
                new = [f"part-{serial:04d}.x"]
                serial += 1
                entry["files"] = new
                entry["removes"] = victims
                entry["op"] = "compact"
                live = (live - set(victims)) | set(new)
                for f in victims:
                    dv.pop(f, None)
        elif kind == "restore":
            back = min(step[1], len(live_sets))
            target_live = live_sets[-back] if back else set()
            target_dv = (
                {k: set(x) for k, x in dv_sets[-back].items()}
                if back
                else {}
            )
            entry["files"] = sorted(target_live - live)
            entry["removes"] = sorted(live - target_live)
            entry["op"] = "restore"
            entry["dv_set"] = {
                k: sorted(x) for k, x in target_dv.items() if x
            }
            live = set(target_live)
            dv = target_dv
        history.append(entry)
        live_sets.append(set(live))
        dv_sets.append({k: set(x) for k, x in dv.items() if x})
    return history, live_sets, dv_sets


def _write_manifest(tmpdir, history, live, dv):
    manifest = {
        "files": sorted(live),
        "rows": 0,
        "batches": 0,
        "history": history,
    }
    if dv:
        manifest["dv"] = {k: sorted(v) for k, v in dv.items() if v}
    with open(os.path.join(tmpdir, MANIFEST), "w") as fh:
        json.dump(manifest, fh)


def _norm(dv):
    return {k: sorted(v) for k, v in dv.items() if v}


@settings(max_examples=200, deadline=None)
@given(script=st.lists(_STEP, min_size=1, max_size=10))
def test_dv_resolution_matches_brute_force(script):
    tmpdir = tempfile.mkdtemp(prefix="dv_prop_")
    history, live_sets, dv_sets = _play(script)
    _write_manifest(tmpdir, history, live_sets[-1], dv_sets[-1])
    with open(os.path.join(tmpdir, MANIFEST)) as fh:
        manifest = json.load(fh)
    for v, expect in enumerate(dv_sets):
        got = dv_for_version(manifest, v)
        assert got == _norm(expect), f"v{v}: {got} != {_norm(expect)}"
    # the incremental cache invariant the real verbs maintain
    assert dv_current(manifest) == dv_for_version(
        manifest, len(script) - 1
    )


@settings(max_examples=120, deadline=None)
@given(
    script=st.lists(_STEP, min_size=2, max_size=10),
    retain=st.integers(1, 4),
)
def test_fold_preserves_retained_dv_state(script, retain):
    tmpdir = tempfile.mkdtemp(prefix="dv_fold_")
    history, live_sets, dv_sets = _play(script)
    _write_manifest(tmpdir, history, live_sets[-1], dv_sets[-1])
    truncate_history(tmpdir, retain_last=retain)
    with open(os.path.join(tmpdir, MANIFEST)) as fh:
        m = json.load(fh)
    n = len(script)
    first_kept = max(0, n - retain)
    # every retained version (and the fold base itself) resolves the
    # same DV state as before the fold
    for v in range(max(0, first_kept - 1), n):
        got = dv_for_version(m, v)
        assert got == _norm(dv_sets[v]), f"post-fold v{v}"


def _sidecarify(tmpdir: str, history: list[dict]) -> None:
    """Rewrite every dv_add / dv_set vector in the log as a SIDECAR
    reference (inline_max=0 forces the binary form for any size), so
    the same brute-force replay sweeps the sidecar tier."""
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        dv_store,
    )

    for e in history:
        if e.get("dv_add"):
            e["dv_add"] = {
                f: dv_store(tmpdir, v, inline_max=0)
                for f, v in e["dv_add"].items()
            }
        if e.get("dv_set"):
            e["dv_set"] = {
                f: dv_store(tmpdir, v, inline_max=0)
                for f, v in e["dv_set"].items()
            }


@settings(max_examples=120, deadline=None)
@given(script=st.lists(_STEP, min_size=1, max_size=10))
def test_dv_resolution_matches_brute_force_over_sidecars(script):
    """VERDICT r7 task 2's done-criterion: the replay sweep stays
    green when every vector is a packed-int64 sidecar file instead of
    an inline list — resolution, version folds, and merges all go
    through the binary tier."""
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        dv_resolved,
    )

    tmpdir = tempfile.mkdtemp(prefix="dv_prop_sc_")
    history, live_sets, dv_sets = _play(script)
    _sidecarify(tmpdir, history)
    _write_manifest(tmpdir, history, live_sets[-1], {})
    with open(os.path.join(tmpdir, MANIFEST)) as fh:
        manifest = json.load(fh)
    # current map = fold at latest (stored forms), as the verbs keep it
    cur = dv_for_version(manifest, len(script) - 1, tmpdir)
    if cur:
        manifest["dv"] = cur
    for v, expect in enumerate(dv_sets):
        got = dv_resolved(tmpdir, dv_for_version(manifest, v, tmpdir))
        assert got == _norm(expect), f"v{v}: {got} != {_norm(expect)}"
    assert dv_resolved(tmpdir, dv_current(manifest)) == dv_resolved(
        tmpdir, dv_for_version(manifest, len(script) - 1, tmpdir)
    )


@settings(max_examples=80, deadline=None)
@given(
    script=st.lists(_STEP, min_size=2, max_size=10),
    retain=st.integers(1, 4),
)
def test_fold_preserves_retained_dv_state_over_sidecars(script, retain):
    from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
        dv_resolved,
    )

    tmpdir = tempfile.mkdtemp(prefix="dv_fold_sc_")
    history, live_sets, dv_sets = _play(script)
    _sidecarify(tmpdir, history)
    _write_manifest(tmpdir, history, live_sets[-1], {})
    truncate_history(tmpdir, retain_last=retain)
    with open(os.path.join(tmpdir, MANIFEST)) as fh:
        m = json.load(fh)
    n = len(script)
    first_kept = max(0, n - retain)
    for v in range(max(0, first_kept - 1), n):
        got = dv_resolved(tmpdir, dv_for_version(m, v, tmpdir))
        assert got == _norm(dv_sets[v]), f"post-fold v{v}"
