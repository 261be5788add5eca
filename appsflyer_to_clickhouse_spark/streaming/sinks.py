"""foreachBatch streaming sinks — the streaming end of the reference's
append-only pipeline (reference main.py:183-187 bulk-inserts each cron
batch; here each micro-batch goes through the SAME dedup-then-append
contract, continuously).

``foreachBatch`` hands every micro-batch to a normal batch writer, so
the batch sinks (``sinks/clickhouse_sink.py``, parquet) are reused
verbatim — one sink implementation, two execution modes. Batches run
sequentially within a query, so the anti-join against the sink sees
all previously committed batches (the cross-batch half of dedup; the
in-batch half is a dropDuplicates).

ClickHouse remains gated exactly like the batch sink: no server/driver
jar in this container, so the offline test path writes parquet and the
JDBC fn is exercised up to the driver boundary.
"""

from __future__ import annotations

import tempfile
from typing import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame

from ..config import PipelineConfig
from ..sinks.clickhouse_sink import write_clickhouse

BatchFn = Callable[[DataFrame, int], None]


def dedup_append_batch_fn(sink_path: str, keys: list[str]) -> BatchFn:
    """Batch writer: drop in-batch duplicate keys, anti-join against
    every key already committed, append the survivors — the
    reference's idempotent-insert contract per micro-batch.

    Key state is INCREMENTAL, not a per-batch sink re-scan: global key
    dedup cannot be partition-pruned (a key may recur under any date),
    so the committed key set — distinct keys, the same node-sized
    state class as stream_dedup_watermark's store — is read from the
    sink ONCE per run, then maintained in the closure with an O(batch)
    union per micro-batch (batches run sequentially within a query).
    After a restart the first batch rebuilds it with one column-pruned
    key scan. localCheckpoint keeps the state's lineage constant
    across arbitrarily many batches. Sub-O(keys) alternatives when
    even the key set outgrows memory: the persistent bloom prefilter
    (operators/bloom.py, dedup_incremental_ingest) or a key-bucketed
    sink for a co-located anti-join.

    Crash/replay safety: foreachBatch is at-least-once — after a dirty
    failure (or a restart that reuses this closure) the engine replays
    the last uncommitted ``batch_id``. A replayed batch must NOT
    anti-join against in-memory state that already unioned its own
    keys (it would drop everything and under-write) nor against state
    missing a crashed append (it would re-append). So on any
    non-monotone batch_id the key state is rebuilt from the SINK — the
    one source that reflects exactly what committed — making the
    replay idempotent in both directions."""

    state: dict = {"keys": None, "loaded": False, "last_batch_id": None}

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates(keys)
        if state["last_batch_id"] is not None and batch_id <= state["last_batch_id"]:
            # replayed epoch: discard in-memory state, re-read the sink
            state["keys"] = None
            state["loaded"] = False
        if not state["loaded"]:
            try:
                state["keys"] = (
                    spark.read.parquet(sink_path)
                    .select(*keys)
                    .distinct()
                    .localCheckpoint()
                )
            except AnalysisException:  # first batch: no sink yet
                state["keys"] = None
            state["loaded"] = True
        if state["keys"] is not None:
            batch = batch.join(state["keys"], keys, "left_anti")
        # survivors are consumed twice (sink append + key-state
        # update); checkpoint so the dedup plan runs once
        batch = batch.localCheckpoint()
        batch.write.mode("append").parquet(sink_path)
        new_keys = batch.select(*keys).distinct()
        # no distinct over the union (r11, guide §2.4): both sides are
        # already distinct and the anti-join made them DISJOINT, so
        # the union is duplicate-free by construction — the distinct
        # was a full extra exchange of the key state every micro-batch
        state["keys"] = (
            new_keys
            if state["keys"] is None
            else state["keys"].unionByName(new_keys)
        ).localCheckpoint()
        state["last_batch_id"] = batch_id

    return fn


def clickhouse_batch_fn(cfg: PipelineConfig) -> BatchFn:
    """Batch writer that bulk-inserts each micro-batch into ClickHouse
    via the batch sink (gated on the JDBC driver, like the batch
    path)."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        write_clickhouse(batch_df, cfg)

    return fn


def run_foreach_batch_availablenow(
    df: DataFrame, batch_fn: BatchFn, checkpoint_dir: str | None = None
) -> None:
    """Drain all currently-available input through ``batch_fn`` (one
    availableNow run) and block until done. In production the same
    writer runs with a processing-time trigger; availableNow makes the
    run finite and testable."""
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="spark_graft_fb_ckpt_")
    q = (
        df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def merge_upsert_batch_fn(
    sink_path: str,
    key: str = "appsflyer_id",
    order_col: str = "event_time",
) -> BatchFn:
    """CDC-style streaming upsert: every micro-batch MERGEs into the
    partitioned sink with latest-wins semantics
    (sinks/maintenance.merge_upsert), so the sink converges to the
    newest version of every key no matter how updates are spread
    across batches — and an out-of-order batch can never overwrite a
    newer committed row (the order_col window decides, not arrival
    order). Each merge touches only the batch's install_date
    partitions; foreachBatch runs batches sequentially, so merge N+1
    reads merge N's commits."""
    from ..sinks.maintenance import merge_upsert

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert(
            batch_df.sparkSession, batch_df, sink_path, key, order_col
        )

    return fn
