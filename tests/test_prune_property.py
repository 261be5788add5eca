"""Property pins for the data-skipping layer (hypothesis): for ANY
file contents and ANY query range, a file containing a matching value
is NEVER pruned — the soundness invariant that makes stats an IO
optimization instead of a correctness filter. Exercises the same
_rows_stats -> manifest -> prune_files path the JSONL/stream tier
uses, with no Spark in the loop (pure metadata arithmetic).
"""

from __future__ import annotations

import datetime
import json
import math
import os
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    MANIFEST,
    _rows_stats,
    _stat_cell,
    prune_files,
)

_T0 = datetime.datetime(2024, 1, 1)


def _ints(n=6):
    return st.lists(
        st.one_of(st.none(), st.integers(-1000, 1000)), min_size=1, max_size=n
    )


def _floats(n=6):
    return st.lists(
        st.one_of(
            st.none(),
            st.floats(-1e6, 1e6, allow_nan=False),
            st.just(float("nan")),
        ),
        min_size=1,
        max_size=n,
    )


def _times(n=6):
    return st.lists(
        st.one_of(
            st.none(),
            st.integers(0, 10_000_000).map(
                lambda s: _T0 + datetime.timedelta(seconds=s)
            ),
        ),
        min_size=1,
        max_size=n,
    )


def _build_manifest(tmpdir: str, file_values: list[list]) -> list[str]:
    names = [f"part-{i:04d}.jsonl" for i in range(len(file_values))]
    stats = {
        name: _rows_stats([{"v": v} for v in values], ["v"])
        for name, values in zip(names, file_values)
    }
    manifest = {
        "files": names,
        "rows": sum(len(v) for v in file_values),
        "batches": len(names),
        "history": [{"v": 0, "files": names}],
        "stats": stats,
    }
    with open(os.path.join(tmpdir, MANIFEST), "w") as fh:
        json.dump(manifest, fh)
    return names


def _matches(v, lo, hi) -> bool:
    """The residual predicate prune_files must stay sound against:
    lo <= v <= hi over non-null, non-NaN values."""
    if v is None:
        return False
    if isinstance(v, float) and math.isnan(v):
        return False
    if lo is not None and not v >= lo:
        return False
    if hi is not None and not v <= hi:
        return False
    return True


def _check_soundness(file_values, lo, hi):
    # fresh dir per example (hypothesis + function-scoped fixtures don't mix)
    tmpdir = tempfile.mkdtemp(prefix='prune_prop_')
    names = _build_manifest(tmpdir, file_values)
    kept = set(prune_files(tmpdir, "v", lo, hi))
    for name, values in zip(names, file_values):
        if any(_matches(v, lo, hi) for v in values):
            assert name in kept, (
                f"unsound prune: {name} holds a match for "
                f"[{lo}, {hi}] but was skipped; values={values}, "
                f"stats={_rows_stats([{'v': v} for v in values], ['v'])}"
            )


@settings(max_examples=150, deadline=None)
@given(
    files=st.lists(_ints(), min_size=1, max_size=5),
    lo=st.one_of(st.none(), st.integers(-1200, 1200)),
    hi=st.one_of(st.none(), st.integers(-1200, 1200)),
)
def test_int_prune_never_skips_a_match(files, lo, hi):
    _check_soundness(files, lo, hi)


@settings(max_examples=150, deadline=None)
@given(
    files=st.lists(_floats(), min_size=1, max_size=5),
    lo=st.one_of(st.none(), st.floats(-2e6, 2e6, allow_nan=False)),
    hi=st.one_of(st.none(), st.floats(-2e6, 2e6, allow_nan=False)),
)
def test_float_prune_never_skips_a_match(files, lo, hi):
    # NaN cells force the column's stats to drop for that file
    # (conservative keep); NaN bounds are rejected by prune_files and
    # not generated here
    _check_soundness(files, lo, hi)


@settings(max_examples=150, deadline=None)
@given(
    files=st.lists(_times(), min_size=1, max_size=5),
    lo_s=st.one_of(st.none(), st.integers(-1000, 10_001_000)),
    hi_s=st.one_of(st.none(), st.integers(-1000, 10_001_000)),
)
def test_timestamp_prune_never_skips_a_match(files, lo_s, hi_s):
    """Timestamps prune through the ISO-string encoding: soundness
    here proves lexicographic order on the normalized strings is
    chronological, including sub-second fractions."""
    lo = None if lo_s is None else _T0 + datetime.timedelta(seconds=lo_s)
    hi = None if hi_s is None else _T0 + datetime.timedelta(seconds=hi_s)
    _check_soundness(files, lo, hi)


@settings(max_examples=80, deadline=None)
@given(
    values=st.lists(
        st.one_of(st.none(), st.integers(-50, 50)), min_size=1, max_size=8
    )
)
def test_stats_match_brute_force(values):
    """_rows_stats' min/max/nulls equal the brute-force answer, and
    the recorded bounds compare in normalized space."""
    stats = _rows_stats([{"v": v} for v in values], ["v"])["v"]
    real = [v for v in values if v is not None]
    assert stats["nulls"] == values.count(None)
    if not real:
        assert stats["min"] is None and stats["max"] is None
    else:
        assert stats["min"] == _stat_cell(min(real))
        assert stats["max"] == _stat_cell(max(real))
