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

Protocol (per state group, every micro-batch invocation):

- append incoming build rows to the version store, incoming probe
  rows to the probe buffer (flat LongType arrays in the GroupState —
  timestamps as epoch micros, so no tz arithmetic ever happens
  Python-side). Both stores carry the USER alongside (ts, id): one
  state group may hold many users (see "key bucketing" below);
- FLUSH every buffered probe row with ``ts <= watermark``: the
  source contract (ts-range-split replay files + a watermark delay
  > 0) guarantees every build row at-or-before that ts has already
  arrived, so the match is FINAL — resolved per user by a vectorized
  rank-merge over the version store sorted by (user, ts, id),
  tie-broken to the greatest id (identical to the batch join_asof
  tie rule);
- PRUNE the version store per user to nothing older than that user's
  newest version at-or-below the watermark: any still-buffered probe
  has ts > watermark, so older versions can never be its
  latest-at-or-before — state is O(versions inside the watermark lag
  + buffered probes), never O(history);
- a SENTINEL row per user (far-future ts, side >= 2, injected as the
  replay's last file) flushes whatever the final watermark left
  behind for THAT user and drops the user's state — bounded replays
  terminate with empty state, and each probe row was emitted exactly
  once.

Key bucketing (opt guide §4.1 — fewer, larger Arrow exchanges):
``applyInPandasWithState`` frames one pandas DataFrame and one state
round trip PER KEY per micro-batch; at thousands of active keys the
per-key framing dominates the batch (measured ~1.5 s/batch at 1,500
keys for ~25 k rows — the r10 floor). ``temporal_join_stream(...,
buckets=K)`` groups the stream by ``pmod(user_id, K)`` instead of by
user, so one group carries MANY users and the per-key framing
amortizes; the state machine is exactly the same (the per-user layout
is the K=None special case where every group holds one user).
Trade-off, stated honestly: with DENSE traffic (most keys active
every batch — this operator's replay shape, and the enrichment
workloads it models) total state IO per batch is O(active state)
under either layout, so bucketing only removes framing overhead; with
SPARSE traffic (few active keys) a bucket rewrite touches its
inactive cohabitants' state too, so per-user keying is the right
layout — which is why ``buckets`` is a caller choice, not hardwired.

At 100 TB the state is keyed and store-backed (RocksDB provider),
sized by per-key churn within the watermark lag — the same bound
Flink's temporal join state carries — while the per-batch work is
one Arrow round trip per active state group.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# input rows (one tagged union stream, keyed by user_id or bucket):
#   side: 0 = build (purchase version), 1 = probe (click),
#   >= 2 = sentinel (ADVICE r10: any out-of-contract tag flushes
#   loudly-by-draining rather than silently stranding state)
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
        T.StructField("r_user", T.ArrayType(T.LongType())),
        T.StructField("r_ts", T.ArrayType(T.LongType())),
        T.StructField("r_id", T.ArrayType(T.LongType())),
        T.StructField("l_user", T.ArrayType(T.LongType())),
        T.StructField("l_ts", T.ArrayType(T.LongType())),
        T.StructField("l_id", T.ArrayType(T.LongType())),
    ]
)


def _temporal_update(key, pdfs: Iterable, state: GroupState):
    # Vectorized (opt guide §4.2) and MULTI-USER: the whole batch is
    # appended, sorted, matched and pruned with numpy array ops over
    # (user, ts, id)-keyed flat arrays. Semantics are identical to the
    # per-user form: the version store sorts by (user, ts, id) via a
    # stable lexsort, and each flushed probe takes the store's last
    # entry at-or-before (user, ts) — same latest-at-or-before, same
    # greatest-id-on-tie rule, NULL enrichment when the user has no
    # version yet. The match itself is a rank merge: sort versions and
    # flushed probes together by (user, ts, version-before-probe); a
    # probe's upper bound in its user's version segment is then the
    # running version count at its sorted position minus the segment
    # start — no per-user Python loop.
    import numpy as np
    import pandas as pd

    if state.exists:
        r_user, r_ts, r_id, l_user, l_ts, l_id = state.get
        vu = np.asarray(r_user, dtype=np.int64)
        vt = np.asarray(r_ts, dtype=np.int64)
        vi = np.asarray(r_id, dtype=np.int64)
        bu = np.asarray(l_user, dtype=np.int64)
        bt = np.asarray(l_ts, dtype=np.int64)
        bi = np.asarray(l_id, dtype=np.int64)
    else:
        vu = vt = vi = bu = bt = bi = np.empty(0, dtype=np.int64)

    done = np.empty(0, dtype=np.int64)  # users whose sentinel arrived
    for pdf in pdfs:
        side = pdf["side"].to_numpy(dtype=np.int64)
        ts = pdf["ts_us"].to_numpy(dtype=np.int64)
        rid = pdf["row_id"].to_numpy(dtype=np.int64)
        usr = pdf["user_id"].to_numpy(dtype=np.int64)
        bm = side == 0
        if bm.any():
            vu = np.concatenate([vu, usr[bm]])
            vt = np.concatenate([vt, ts[bm]])
            vi = np.concatenate([vi, rid[bm]])
        pm = side == 1
        if pm.any():
            bu = np.concatenate([bu, usr[pm]])
            bt = np.concatenate([bt, ts[pm]])
            bi = np.concatenate([bi, rid[pm]])
        sm = side >= 2
        if sm.any():
            done = np.concatenate([done, usr[sm]])

    if done.size:
        done = np.unique(done)
    if vt.size:
        order = np.lexsort((vi, vt, vu))  # (user, ts, id) ascending
        vu, vt, vi = vu[order], vt[order], vi[order]

    wm_us = state.getCurrentWatermarkMs() * 1000
    fm = bt <= wm_us
    if done.size and bt.size:
        fm |= np.isin(bu, done)
    f_u, f_t, f_i = bu[fm], bt[fm], bi[fm]
    out = None
    if f_t.size:
        n = f_t.size
        if vt.size:
            m = vt.size
            au = np.concatenate([vu, f_u])
            at = np.concatenate([vt, f_t])
            flag = np.concatenate(
                [np.zeros(m, dtype=np.int8), np.ones(n, dtype=np.int8)]
            )
            order = np.lexsort((flag, at, au))  # versions before probes
            sflag = flag[order]
            csum = np.cumsum(sflag == 0)
            ppos = np.nonzero(sflag == 1)[0]
            orig = order[ppos] - m  # original probe index
            vb = csum[ppos]  # versions (any user) sorted before probe
            lo = np.searchsorted(vu, f_u[orig], side="left")
            within = vb - lo  # user's versions at-or-before probe ts
            has_s = within > 0
            hit = lo + np.maximum(within, 1) - 1
            pid_s = np.where(has_s, vi[hit], 0)
            pts_s = np.where(has_s, vt[hit], 0)
            has = np.empty(n, dtype=bool)
            pid = np.empty(n, dtype=np.int64)
            pts = np.empty(n, dtype=np.int64)
            has[orig], pid[orig], pts[orig] = has_s, pid_s, pts_s
        else:  # probe rows before any version: all-NULL enrichment
            has = np.zeros(n, dtype=bool)
            pid = pts = np.zeros(n, dtype=np.int64)
        out = pd.DataFrame(
            {
                "user_id": f_u,
                "click_id": f_i,
                "ts_us": f_t,
                "purchase_id": pd.array(pid, dtype="Int64"),
                "purchase_ts_us": pd.array(pts, dtype="Int64"),
            }
        )
        out.loc[~has, ["purchase_id", "purchase_ts_us"]] = pd.NA

    # prune: per user keep versions above the watermark plus the
    # newest at-or-below one (every future probe has ts > watermark
    # and may still need it); drop everything owned by a done user
    if vt.size:
        below = vt <= wm_us
        nxt_same = np.empty(vt.size, dtype=bool)
        nxt_same[:-1] = vu[1:] == vu[:-1]
        nxt_same[-1] = False
        nxt_below = np.empty(vt.size, dtype=bool)
        nxt_below[:-1] = below[1:]
        nxt_below[-1] = False
        keepv = ~below | (below & ~(nxt_same & nxt_below))
        if done.size:
            keepv &= ~np.isin(vu, done)
        vu, vt, vi = vu[keepv], vt[keepv], vi[keepv]
    km = ~fm
    bu, bt, bi = bu[km], bt[km], bi[km]

    if not (vt.size or bt.size):
        state.remove()  # drained group: bounded replays end empty
    else:
        state.update(
            (
                vu.tolist(),
                vt.tolist(),
                vi.tolist(),
                bu.tolist(),
                bt.tolist(),
                bi.tolist(),
            )
        )
    if out is not None:
        yield out


def temporal_join_stream(
    tagged: DataFrame, buckets: int | None = None
) -> DataFrame:
    """Apply the temporal-join state machine to a watermarked tagged
    union stream with columns ``user_id, side, ts_us, row_id`` (plus
    the TIMESTAMP event-time column the watermark rides on).

    ``buckets=None`` keys state per user (the framing-heavy layout,
    right for sparse traffic); ``buckets=K`` keys state by
    ``pmod(user_id, K)`` so each state group serves many users and the
    per-key Arrow framing amortizes (right for dense traffic — see the
    module docstring). The state machine and its semantics are
    IDENTICAL under both; tests/test_temporal_join.py replays the same
    corners through each."""
    if buckets is None:
        keyed = tagged.groupBy("user_id")
    else:
        keyed = tagged.withColumn(
            "_bkt", F.pmod(F.col("user_id"), F.lit(int(buckets)))
        ).groupBy("_bkt")
    return keyed.applyInPandasWithState(
        _temporal_update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
