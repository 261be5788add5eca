"""Event-time TEMPORAL (as-of) stream join via applyInPandasWithState —
the Flink "temporal table join" / kdb aj-over-a-stream semantics that
Structured Streaming's built-in joins cannot express: enrich each probe
row with the build side's version that was CURRENT at the probe row's
event time (latest build ts <= probe ts), exact under out-of-order
arrival, emitting each probe row exactly once.

Why the built-ins can't do it: a stream-stream interval join emits
EVERY build version inside the interval (not "the latest"), and
aggregating "latest per probe row" post-join needs a per-probe-row
window over an unbounded stream — not expressible with watermarked
windows. The batch twin (``join_asof`` in plans/advanced_queries.py)
solves it with union + ordered window; this operator is the streaming
form of the same idea: both sides arrive TAGGED in one keyed stream,
and per-key state replaces the sort.

Protocol (per key group, every micro-batch invocation):

- append incoming build rows to the per-key version store, incoming
  probe rows to the per-key buffer (both flat LongType arrays in the
  GroupState — timestamps as epoch micros, so no tz arithmetic ever
  happens Python-side);
- FLUSH every buffered probe row with ``ts <= watermark``: the
  source contract (ts-range-split replay files + a watermark delay
  > 0) guarantees every build row at-or-before that ts has already
  arrived, so the match is FINAL — resolve it by binary search over
  the version store sorted by (ts, id), tie-broken to the greatest
  id (identical to the batch join_asof tie rule);
- PRUNE the version store to nothing older than the newest version
  at-or-below the watermark: any still-buffered probe has
  ts > watermark, so older versions can never be its latest-at-or-
  before — state is O(versions inside the watermark lag + buffered
  probes), never O(history);
- a SENTINEL row per key (far-future ts, injected as the replay's
  last file) flushes whatever the final watermark left behind and
  removes the state — bounded replays terminate with empty state,
  and each probe row was emitted exactly once.

At 100 TB the state is keyed and store-backed (RocksDB provider),
sized by per-key churn within the watermark lag — the same bound
Flink's temporal join state carries — while the per-batch work is
one Arrow round trip per active key.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# input rows (one tagged union stream, keyed by user_id):
#   side: 0 = build (purchase version), 1 = probe (click), 2 = sentinel
# timestamps are epoch MICROS (long) — the caller converts once,
# JVM-side, and converts back on the way out.
INPUT_FIELDS = ["user_id", "side", "ts_us", "row_id"]

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("click_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("purchase_id", T.LongType()),
        T.StructField("purchase_ts_us", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("r_ts", T.ArrayType(T.LongType())),
        T.StructField("r_id", T.ArrayType(T.LongType())),
        T.StructField("l_ts", T.ArrayType(T.LongType())),
        T.StructField("l_id", T.ArrayType(T.LongType())),
    ]
)


def _temporal_update(key, pdfs: Iterable, state: GroupState):
    # Vectorized (opt guide §4.2): the whole batch is appended, sorted,
    # matched and pruned with numpy array ops — the per-row Python
    # loop (insort + bisect per event) this replaced was the hot path
    # of every micro-batch. Semantics are bit-identical: the version
    # store sorts by (ts, id) via a stable lexsort, and because every
    # real row_id < 2**62, ``bisect_right(versions, (ts, 1 << 62))``
    # over (ts, id) tuples equals ``searchsorted(v_ts, ts, 'right')``
    # over the ts array — same latest-at-or-before, same
    # greatest-id-on-tie rule.
    import numpy as np
    import pandas as pd

    if state.exists:
        r_ts, r_id, l_ts, l_id = state.get
        v_ts = np.asarray(r_ts, dtype=np.int64)
        v_id = np.asarray(r_id, dtype=np.int64)
        b_ts = np.asarray(l_ts, dtype=np.int64)
        b_id = np.asarray(l_id, dtype=np.int64)
    else:
        v_ts = v_id = b_ts = b_id = np.empty(0, dtype=np.int64)

    saw_sentinel = False
    for pdf in pdfs:
        side = pdf["side"].to_numpy(dtype=np.int64)
        ts = pdf["ts_us"].to_numpy(dtype=np.int64)
        rid = pdf["row_id"].to_numpy(dtype=np.int64)
        bm = side == 0
        if bm.any():
            v_ts = np.concatenate([v_ts, ts[bm]])
            v_id = np.concatenate([v_id, rid[bm]])
        pm = side == 1
        if pm.any():
            b_ts = np.concatenate([b_ts, ts[pm]])
            b_id = np.concatenate([b_id, rid[pm]])
        if not saw_sentinel and (side == 2).any():
            saw_sentinel = True

    if v_ts.size:
        order = np.lexsort((v_id, v_ts))  # (ts, id) ascending
        v_ts, v_id = v_ts[order], v_id[order]

    wm_us = state.getCurrentWatermarkMs() * 1000
    fm = (
        np.ones(b_ts.size, dtype=bool)
        if saw_sentinel
        else b_ts <= wm_us
    )
    f_ts, f_id = b_ts[fm], b_id[fm]
    out = None
    if f_ts.size:
        # latest version at-or-before each flushed probe ts; ties on
        # ts resolve to the greatest id (store is (ts, id)-sorted and
        # we take the element left of the upper bound)
        if v_ts.size:
            idx = np.searchsorted(v_ts, f_ts, side="right")
            has = idx > 0
            at = np.maximum(idx - 1, 0)
            pid = np.where(has, v_id[at], 0)
            pts = np.where(has, v_ts[at], 0)
        else:  # probe rows before any version: all-NULL enrichment
            has = np.zeros(f_ts.size, dtype=bool)
            pid = pts = np.zeros(f_ts.size, dtype=np.int64)
        out = pd.DataFrame(
            {
                "user_id": np.full(f_ts.size, key[0], dtype=np.int64),
                "click_id": f_id,
                "ts_us": f_ts,
                "purchase_id": pd.array(pid, dtype="Int64"),
                "purchase_ts_us": pd.array(pts, dtype="Int64"),
            }
        )
        out.loc[~has, ["purchase_id", "purchase_ts_us"]] = pd.NA

    if saw_sentinel:
        state.remove()
    else:
        km = b_ts > wm_us
        # keep the newest at-or-below-watermark version: every future
        # probe has ts > watermark and may still need it
        cut = int(np.searchsorted(v_ts, wm_us, side="right"))
        keep = max(0, cut - 1)
        state.update(
            (
                v_ts[keep:].tolist(),
                v_id[keep:].tolist(),
                b_ts[km].tolist(),
                b_id[km].tolist(),
            )
        )
    if out is not None:
        yield out


def temporal_join_stream(tagged: DataFrame) -> DataFrame:
    """Apply the temporal-join state machine to a watermarked tagged
    union stream with columns ``user_id, side, ts_us, row_id`` (plus
    the TIMESTAMP event-time column the watermark rides on)."""
    return tagged.groupBy("user_id").applyInPandasWithState(
        _temporal_update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
