"""Custom stateful streaming operator via applyInPandasWithState —
the escape hatch for semantics Structured Streaming's built-ins can't
express (SURVEY.md §2 Part B: the reference has no managed state at
all; this is the Spark-native form of "remember what I saw per key").

Operator: per-key running deduplicating counter. For each key the
state holds (count_distinct_batches, last_event_time, seen_count);
every trigger emits one row per updated key. State is keyed and
partitioned — it scales with distinct keys, never with events. The
registered query runs with GroupStateTimeout.NoTimeout DELIBERATELY:
its contract is an exact all-time count per key (oracle: COUNT(*)),
and any eviction would reset a returning key's count and break
exactness. The trade is explicit: all-time-exact state grows with
the distinct-key count (the same state class as a batch groupBy's).
A production deployment whose key space outgrows memory swaps in
ProcessingTimeTimeout/EventTimeTimeout + state.setTimeout... in
_update — which changes the semantics from "all-time count" to
"count since last idle period", the same bounded-memory trade
dropDuplicatesWithinWatermark makes.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("events_seen", T.LongType()),
        T.StructField("batches_seen", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("events_seen", T.LongType()),
        T.StructField("batches_seen", T.LongType()),
    ]
)


def _update(key, pdfs: Iterable, state: GroupState):
    import pandas as pd

    n = sum(len(pdf) for pdf in pdfs)
    if state.exists:
        (events_seen, batches_seen) = state.get
    else:
        events_seen, batches_seen = 0, 0
    events_seen += n
    batches_seen += 1
    state.update((events_seen, batches_seen))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "events_seen": [events_seen],
            "batches_seen": [batches_seen],
        }
    )


def stateful_user_counter(stream_df: DataFrame) -> DataFrame:
    """Arrow-batched per-key stateful transform: one state row per
    user_id, updated per micro-batch, emitted on change."""
    return stream_df.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas — the Spark 4 successor API
# ---------------------------------------------------------------------------

TWS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("events_seen", T.LongType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)


def user_stats_transform_with_state(stream_df: DataFrame) -> DataFrame:
    """Per-key running (count, max event time) on the Spark 4
    ``transformWithStateInPandas`` API — the successor to
    applyInPandasWithState with a materially better state model:
    NAMED state variables managed through a handle (each its own
    column-family in the store, so adding one never rewrites the
    whole state row), per-state TTL, timers, and initial-state
    bootstrap. The processor below keeps two independent ValueStates;
    at 100 TB state still scales with distinct keys only, and the
    RocksDB state store backend this API is designed around spills
    per-key state off-heap (exercised for this repo's stateful tier in
    tests/test_rocksdb_state_store.py: result-parity across providers,
    rocksdb metrics engaged, changelog checkpointing transparent). The
    class is defined inline so the Arrow worker pickles a
    self-contained processor.

    GATED like the multimodal codecs: the driver<->worker state
    protocol of this API is protobuf-framed, and ``protobuf`` is not
    installed in this environment — the query would crash in the
    StreamingPythonRunner before reaching user code. The gate raises
    up front with the real reason; tests/test_stateful_streaming.py
    pins BOTH the gate and (when protobuf is present) the semantics
    against the applyInPandasWithState twin, which covers the same
    per-key-managed-state contract on the older protocol and stays
    the registered, oracle-checked query (stream_stateful_counter)."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf package "
            "(state-server protocol); not installed in this environment"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState("events_seen", "n BIGINT")
            self._last = handle.getValueState("last_ts", "ts TIMESTAMP")

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            n, last = 0, None
            for pdf in rows:
                n += len(pdf)
                m = pdf["ts"].max()
                last = m if last is None else max(last, m)
            prev_n = self._count.get()
            total = (prev_n[0] if prev_n else 0) + n
            prev_ts = self._last.get()
            if prev_ts and (last is None or prev_ts[0] > last):
                last = prev_ts[0]
            self._count.update((total,))
            self._last.update((last,))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "events_seen": [total],
                    "last_ts": [last],
                }
            )

        def close(self) -> None:
            pass

    return stream_df.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_UserStats(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
