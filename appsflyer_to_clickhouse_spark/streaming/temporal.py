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

from bisect import bisect_right, insort
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
    import pandas as pd

    if state.exists:
        r_ts, r_id, l_ts, l_id = state.get
        versions = sorted(zip(r_ts, r_id))
        buffered = list(zip(l_ts, l_id))
    else:
        versions, buffered = [], []

    saw_sentinel = False
    for pdf in pdfs:
        for side, ts_us, row_id in zip(
            pdf["side"], pdf["ts_us"], pdf["row_id"]
        ):
            if side == 0:
                insort(versions, (int(ts_us), int(row_id)))
            elif side == 1:
                buffered.append((int(ts_us), int(row_id)))
            else:
                saw_sentinel = True

    wm_us = state.getCurrentWatermarkMs() * 1000
    flush = (
        buffered
        if saw_sentinel
        else [p for p in buffered if p[0] <= wm_us]
    )
    out = {k: [] for k in OUTPUT_SCHEMA.fieldNames()}
    for ts_us, click_id in flush:
        # latest version at-or-before ts_us; ties on ts resolve to the
        # greatest id because the store sorts by (ts, id) and we take
        # the element left of the upper bound
        i = bisect_right(versions, (ts_us, 1 << 62))
        out["user_id"].append(key[0])
        out["click_id"].append(click_id)
        out["ts_us"].append(ts_us)
        out["purchase_id"].append(versions[i - 1][1] if i else None)
        out["purchase_ts_us"].append(versions[i - 1][0] if i else None)

    if saw_sentinel:
        state.remove()
    else:
        buffered = [p for p in buffered if p[0] > wm_us]
        # keep the newest at-or-below-watermark version: every future
        # probe has ts > watermark and may still need it
        cut = bisect_right(versions, (wm_us, 1 << 62))
        versions = versions[max(0, cut - 1) :]
        state.update(
            (
                [v[0] for v in versions],
                [v[1] for v in versions],
                [p[0] for p in buffered],
                [p[1] for p in buffered],
            )
        )
    if out["user_id"]:
        yield pd.DataFrame(out)


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
