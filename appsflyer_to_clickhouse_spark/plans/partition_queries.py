"""Graded queries for PARTITION COLUMNS on the manifest sink
(VERDICT r8 task 1 — the reference's own access pattern: its window
predicate at main.py:172-174 is a date-partition scan, which at
100 TB is served by by-value partition pruning, not min/max stats).

Both queries build the partitioned table from ``events`` with
INTERLEAVED appends — each append covers the full key range, the
write order that degenerates min/max stats to keep-everything — and
grade the by-value path:

- ``sink_partition_prune``: the partitioned writer splits every
  flush by value, and a one-partition read plans EXACTLY the
  matching parts; ``n_scanned`` pins the pruning decision into the
  value hash (a layer that degrades to keep-all returns 15, not 3,
  and hash-mismatches) at every SF.
- ``sink_drop_partition``: ALTER TABLE DROP PARTITION as ONE
  metadata commit — no data file read or written — with exact row
  accounting; ``n_live_parts`` pins that exactly one partition's
  parts left the snapshot.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from .registry import load, register

_EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _staged_partitioned(spark, sf_dir, n_appends=3, prefix="prune"):
    """events → a sink partitioned by event_type, written as
    ``n_appends`` INTERLEAVED appends (split on event_id residue, so
    every append carries every event_type and the full id/ts range —
    the stats-degenerate layout)."""
    from ..sinks.datasource_sink import ClickHouseArrowDataSource

    spark.dataSource.register(ClickHouseArrowDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    path = tempfile.mkdtemp(prefix=f"spark_graft_part_{prefix}_") + "/s"
    for i in range(n_appends):
        (
            ev.filter(F.col("event_id") % n_appends == i)
            .coalesce(1)
            .write.format("chbatch_arrow")
            .option("path", path)
            .option("partitionby", "event_type")
            .option("batchsize", "100000000")
            .mode("append")
            .save()
        )
    return path


@register(
    "sink_partition_prune",
    """
    SELECT event_id, ts, user_id, event_type, value,
           CAST(3 AS BIGINT) AS n_scanned
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def q_sink_partition_prune(spark, sf_dir):
    """PARTITION COLUMNS + by-value pruning (datasource_sink
    partitionby / prune_files / manifest_source._tuple_survives).
    Three interleaved appends land events as 15 parts (3 appends x 5
    event_type values — the writer splits each flush by value and
    records the tuple in the manifest). Each part's min/max on
    event_id and ts span the FULL range (interleaved ingest), so
    stats alone could not prune a thing for this predicate shape at
    scale; the recorded tuples prune the one-event_type read to
    EXACTLY its 3 parts before Spark plans a task. Graded: every
    surviving row plus ``n_scanned`` — the by-value pruning decision
    itself (keep-all would return 15 and hash-mismatch). The judge's
    interleaved-vs-stats pin and the spec-refusal/OPTIMIZE/DML
    contracts live in tests/test_sink_partitions.py."""
    from ..sinks.datasource_sink import _manifest_read, prune_files

    path = _staged_partitioned(spark, sf_dir, prefix="prune")
    kept = prune_files(path, "event_type", "purchase", "purchase")
    # pin the decision is BY VALUE, not stats: every kept part's
    # recorded tuple is ('purchase',)
    pmap = _manifest_read(path)["partitions"]
    assert all(
        pmap[os.path.basename(f)] == ["purchase"] for f in kept
    )
    n_scanned = len(kept)
    got = (
        spark.read.format("chbatch_arrow")
        .schema(_EV_SCHEMA)
        .option("path", path)
        .load()
        .filter(F.col("event_type") == "purchase")
    )
    return got.withColumn(
        "n_scanned", F.lit(n_scanned).cast("long")
    )


@register(
    "sink_drop_partition",
    """
    SELECT event_type,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS n_users,
           MIN(event_id) AS min_id,
           MAX(event_id) AS max_id,
           CAST(12 AS BIGINT) AS n_live_parts
    FROM events
    WHERE event_type <> 'error'
    GROUP BY event_type
    """,
)
def q_sink_drop_partition(spark, sf_dir):
    """ALTER TABLE DROP PARTITION (mutations.drop_partition —
    ClickHouse MergeTree's partition-expiry verb, the retention
    pattern the reference's day-windowed sink implies): dropping
    event_type='error' removes its 3 parts as ONE metadata commit —
    no data file is read or written at any table size; the parts
    stay on disk for time travel until retention folds them out.
    Graded: the per-type aggregate over the survivors (exact rows
    and ids prove nothing else was touched) plus ``n_live_parts``
    (15 - 3 = 12 — pins that exactly the dropped partition's parts
    left the snapshot, by tuple, not by scan)."""
    from ..sinks.datasource_sink import (
        _manifest_read,
        read_committed_parquet,
    )
    from ..sinks.mutations import drop_partition

    path = _staged_partitioned(spark, sf_dir, prefix="drop")
    r = drop_partition(path, {"event_type": "error"})
    assert r["dropped_parts"] == 3
    n_live = len(_manifest_read(path)["files"])
    return (
        read_committed_parquet(spark, path, _EV_SCHEMA)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
        .withColumn("n_live_parts", F.lit(n_live).cast("long"))
    )


@register(
    "stream_partition_tail",
    """
    SELECT event_id, user_id, event_type
    FROM events
    WHERE event_type IN ('purchase', 'signup')
    """,
)
def q_stream_partition_tail(spark, sf_dir):
    """The streaming tail's BY-VALUE PARTITION SUBSCRIPTION
    (manifest_source.ManifestTailReader + ``partitionfilter`` — the
    streaming half of VERDICT r8 task 1): Python stream readers get
    no pushed filters, so the option is the tail's only pruning
    channel — a consumer subscribed to two event_type partitions
    reads EXACTLY those partitions' parts per micro-batch, planned
    from manifest tuples, and the other three partitions' files are
    never opened. Two interleaved appends (both carrying all five
    types, split by value at flush) land as commits v0/v1; an
    availableNow tail with the IN-list filter replays them into
    parquet. The oracle is the full two-type slice — a subscription
    that leaks another partition, drops a matching part, or reads an
    untupled file twice hash-mismatches. At 100 TB this is
    'tail one tenant/date of a shared firehose table' — per-batch IO
    proportional to the SUBSCRIBED partition, not the table."""
    import json as _json

    from pyspark.sql import types as T

    from ..sinks.datasource_sink import ClickHouseArrowDataSource

    spark.dataSource.register(ClickHouseArrowDataSource)
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    path = tempfile.mkdtemp(prefix="spark_graft_ptail_") + "/s"
    for i in range(2):
        (
            ev.filter(F.col("event_id") % 2 == i)
            .coalesce(1)
            .write.format("chbatch_arrow")
            .option("path", path)
            .option("partitionby", "event_type")
            .option("batchsize", "100000000")
            .mode("append")
            .save()
        )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    out_dir = tempfile.mkdtemp(prefix="spark_graft_ptail_") + "/out"
    ckpt = tempfile.mkdtemp(prefix="spark_graft_ptail_") + "/ckpt"
    q = (
        spark.readStream.format("chbatch_arrow")
        .schema(schema)
        .option("path", path)
        .option("startingVersion", "0")
        .option(
            "partitionfilter",
            _json.dumps({"event_type": ["purchase", "signup"]}),
        )
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(schema).parquet(out_dir)


@register(
    "sink_partition_evolve",
    """
    SELECT event_id, user_id, event_type, CAST(ts AS DATE) AS day,
           CAST(2 AS BIGINT) AS n_old_kept,
           CAST(2 AS BIGINT) AS n_new_kept,
           (SELECT COUNT(*) FROM events WHERE event_id % 4 < 2)
             AS n_rows_v1
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def q_sink_partition_evolve(spark, sf_dir):
    """PARTITION SPEC EVOLUTION (datasource_sink.evolve_partition_spec
    — Iceberg's evolve-spec as one metadata commit, VERDICT r9 task
    2): two appends land partitioned by event_type (gen A), the spec
    evolves to day with ZERO data files touched, two more appends
    land by day (gen B). Graded, all in the value hash:

    - every purchase row across BOTH generations through the Data
      Source reader (a reader that loses either generation, or
      double-reads re-keyed tuples, hash-mismatches);
    - ``n_old_kept`` — a point probe on the OLD key still prunes the
      gen-A parts to exactly its 2 matching parts (their re-keyed
      dict tuples decide by name; a layer that degrades them to
      untupled returns 10);
    - ``n_new_kept`` — the NEW key prunes gen B to exactly its 2
      parts while gen A is kept conservatively (undecidable, never
      wrongly pruned);
    - ``n_rows_v1`` — time travel to the pre-evolution snapshot
      still resolves exactly the gen-A rows.

    Migration (OPTIMIZE re-tuples gen A under the new spec),
    refusals, de-partitioning, and commit-log/clone carry are pinned
    in tests/test_spec_evolution.py."""
    from ..sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        _manifest_read,
        evolve_partition_spec,
        prune_files,
    )

    spark.dataSource.register(ClickHouseArrowDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    ev = (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "ts")
        .withColumn("day", F.to_date("ts"))
        .drop("ts")
    )
    path = tempfile.mkdtemp(prefix="spark_graft_pevolve_") + "/s"

    def _append(i, pby):
        (
            ev.filter(F.col("event_id") % 4 == i)
            .coalesce(1)
            .write.format("chbatch_arrow")
            .option("path", path)
            .option("partitionby", pby)
            .option("batchsize", "100000000")
            .mode("append")
            .save()
        )

    # the two appends WITHIN a generation are independent (uniquely
    # named parts, commit serialized on the manifest lock) — overlap
    # them (opt guide §2.6); the evolve commit stays a hard barrier
    # between the generations
    from .registry import run_overlapped

    run_overlapped(spark, lambda i: _append(i, "event_type"), (0, 1))
    gen_a = set(_manifest_read(path)["files"])
    evolve_partition_spec(path, ["day"])
    run_overlapped(spark, lambda i: _append(i, "day"), (2, 3))
    m = _manifest_read(path)
    gen_b = set(m["files"]) - gen_a
    # OLD key: gen-A parts prune by their re-keyed dict tuples
    kept_old = set(
        prune_files(path, "event_type", "purchase", "purchase")
    )
    n_old_kept = len(kept_old & gen_a)
    # gen-B parts are undecidable on the OLD key (their tuples name
    # only `day`) and fall through to exact per-part string stats —
    # which may legitimately prune sparse days; no assertion there
    # NEW key: a day present in BOTH gen-B appends (deterministic:
    # the smallest such day), so exactly 2 gen-B parts match
    # one job, not one per append: a day present in both gen-B
    # appends is one whose (day, residue) pairs count 2 distinct
    # residues — day-bounded rows, never collected raw
    days_b = sorted(
        r["day"]
        for r in (
            ev.filter((F.col("event_id") % 4).isin(2, 3))
            .select("day", (F.col("event_id") % 4).alias("i"))
            .distinct()
            .groupBy("day")
            .count()
            .filter(F.col("count") == 2)
            .collect()
        )
    )
    probe_day = days_b[0]
    kept_new = set(prune_files(path, "day", probe_day, probe_day))
    n_new_kept = len(kept_new & gen_b)
    # gen-A parts fall through to exact per-part day stats (their
    # tuples name only event_type) — sparse types may prune; the
    # value hash is the exactness check either way
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("day", T.DateType()),
        ]
    )
    n_rows_v1 = (
        spark.read.format("chbatch_arrow")
        .schema(schema)
        .option("path", path)
        .option("version", "1")
        .load()
        .count()
    )
    got = (
        spark.read.format("chbatch_arrow")
        .schema(schema)
        .option("path", path)
        .load()
        .filter(F.col("event_type") == "purchase")
    )
    return (
        got.withColumn("n_old_kept", F.lit(n_old_kept).cast("long"))
        .withColumn("n_new_kept", F.lit(n_new_kept).cast("long"))
        .withColumn("n_rows_v1", F.lit(n_rows_v1).cast("long"))
    )
