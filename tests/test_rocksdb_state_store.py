"""RocksDB state store tier (VERDICT r5 task 2): every stateful
streaming query in this repo must be result-identical under the
default heap-resident HDFSBackedStateStoreProvider AND the
RocksDBStateStoreProvider that ships inside Spark — the backend a
100 TB ingest actually runs on, because per-key state spills to local
disk instead of capping at executor heap. The tests pin (a) that the
RocksDB provider genuinely engages (rocksdb* custom metrics appear in
the query progress), and (b) semantic equivalence across providers
for the registered stateful queries (watermark dedup, stateful
counter, full streaming ETL)."""

from __future__ import annotations

import contextlib
import tempfile

import pytest

from pyspark.sql import types as T

from appsflyer_to_clickhouse_spark.streaming.stateful import stateful_user_counter

from .conftest import SF_SMALL

_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
HDFS_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


@contextlib.contextmanager
def state_store(spark, provider_class: str):
    """Scope the state-store backend; the conf is read at query START,
    so setting it around the registered query functions switches every
    stream they run internally."""
    prev = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, provider_class)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, prev)


_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
    ]
)


def _run_counter(spark, tag: str):
    """Two-micro-batch applyInPandasWithState run; returns the final
    per-key rows and the last progress dict (for state-store custom
    metrics)."""
    src = tempfile.mkdtemp(prefix=f"rdb_src_{tag}_")
    ckpt = tempfile.mkdtemp(prefix=f"rdb_ckpt_{tag}_")

    def write_batch(rows, seq):
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/batch_{seq}")

    write_batch([(1, 10), (1, 11), (2, 20)], 1)
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/batch_*")
    )
    q = (
        stateful_user_counter(stream)
        .writeStream.format("memory")
        .queryName(f"rdb_counts_{tag}")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        write_batch([(1, 12), (3, 30)], 2)
        q.processAllAvailable()
        progress = q.lastProgress
        rows = sorted(
            (r.user_id, r.events_seen, r.batches_seen)
            for r in spark.table(f"rdb_counts_{tag}").collect()
        )
    finally:
        q.stop()
    return rows, progress


def test_rocksdb_provider_engages_and_matches_heap(spark):
    with state_store(spark, HDFS_PROVIDER):
        heap_rows, heap_prog = _run_counter(spark, "heap")
    with state_store(spark, ROCKSDB_PROVIDER):
        rocks_rows, rocks_prog = _run_counter(spark, "rocks")
    assert rocks_rows == heap_rows
    # cumulative semantics held: user 1 carried 2 -> 3 across batches
    assert (1, 3, 2) in rocks_rows and (3, 1, 1) in rocks_rows
    # the provider genuinely engaged: RocksDB-specific custom metrics
    # are present under RocksDB and ABSENT under the heap provider
    rocks_metrics = rocks_prog["stateOperators"][0].get("customMetrics", {})
    heap_metrics = heap_prog["stateOperators"][0].get("customMetrics", {})
    assert any(k.startswith("rocksdb") for k in rocks_metrics), rocks_metrics
    assert not any(k.startswith("rocksdb") for k in heap_metrics)
    # state scales with keys, not events: 3 distinct keys in the store
    assert rocks_prog["stateOperators"][0]["numRowsTotal"] == 3


def test_rocksdb_changelog_checkpointing_matches(spark):
    """Changelog checkpointing is the production RocksDB mode at large
    state (per-batch uploads become the delta, not the full snapshot);
    it must be a pure execution detail — same results, rocksdb metrics
    still present."""
    conf = (
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled"
    )
    prev = spark.conf.get(conf, None)
    spark.conf.set(conf, "true")
    try:
        with state_store(spark, ROCKSDB_PROVIDER):
            rows, prog = _run_counter(spark, "rockslog")
    finally:
        if prev is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, prev)
    assert (1, 3, 2) in rows and (3, 1, 1) in rows and (2, 1, 1) in rows
    metrics = prog["stateOperators"][0].get("customMetrics", {})
    assert any(k.startswith("rocksdb") for k in metrics)


@pytest.mark.parametrize(
    "qname",
    ["stream_stateful_counter", "stream_dedup_watermark", "stream_etl_pipeline"],
)
def test_registered_stateful_queries_identical_under_rocksdb(spark, qname):
    """The registered stateful queries (each oracle-checked on the
    default provider by the driver) must return IDENTICAL results on
    RocksDB — the state backend is an execution detail, never a
    semantics knob."""
    from appsflyer_to_clickhouse_spark.plans import QUERIES

    def rows(df):
        cols = sorted(df.columns)
        return sorted(
            tuple(r[c] for c in cols) for r in df.collect()
        ), cols

    with state_store(spark, HDFS_PROVIDER):
        heap, heap_cols = rows(QUERIES[qname](spark, SF_SMALL))
    with state_store(spark, ROCKSDB_PROVIDER):
        rocks, rocks_cols = rows(QUERIES[qname](spark, SF_SMALL))
    assert rocks_cols == heap_cols
    assert rocks == heap
