"""The streaming form of the reference's whole job: install stream ->
watermark dedup -> foreachBatch append into the partitioned parquet
sink. foreachBatch is the production pattern for sinks without a
native streaming writer (JDBC/ClickHouse included): each micro-batch
is a normal batch write, idempotent per epoch."""

from __future__ import annotations

import tempfile
from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from appsflyer_to_clickhouse_spark.schemas import ch_sink_schema, sink_columns
from appsflyer_to_clickhouse_spark.sinks.parquet_sink import read_sink, write_sink
from appsflyer_to_clickhouse_spark.streaming.dedup import stream_dedup_watermark

_IN_SCHEMA = T.StructType(
    [
        T.StructField("appsflyer_id", T.StringType()),
        T.StructField("install_time", T.TimestampType()),
        T.StructField("media_source", T.StringType()),
    ]
)


def _to_sink_shape(df):
    cols = []
    present = set(df.columns)
    for c in sink_columns():
        if c in present:
            cols.append(F.col(c))
        else:
            dt = "timestamp" if c in {f.name for f in ch_sink_schema().fields if f.dataType.typeName()=="timestamp"} else "string"
            cols.append(F.lit(None).cast(dt).alias(c))
    return df.select(*cols)


def test_stream_to_partitioned_sink(spark):
    src = tempfile.mkdtemp(prefix="sp_src_")
    ckpt = tempfile.mkdtemp(prefix="sp_ckpt_")
    sink = tempfile.mkdtemp(prefix="sp_sink_")

    rows = [
        ("id-1", datetime(2024, 1, 5, 10, 0), "meta"),
        ("id-1", datetime(2024, 1, 5, 10, 30), "meta"),  # in-window dup
        ("id-2", datetime(2024, 1, 6, 9, 0), "google"),
    ]
    spark.createDataFrame(rows, _IN_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/b1")

    stream = spark.readStream.schema(_IN_SCHEMA).parquet(f"{src}/b*")
    deduped = stream_dedup_watermark(
        stream, key="appsflyer_id", ts_col="install_time", watermark="2 hours"
    )

    q = (
        deduped.writeStream.foreachBatch(
            lambda batch, epoch: write_sink(_to_sink_shape(batch), sink)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = read_sink(spark, sink)
    got = {
        (r["appsflyer_id"], r["install_time"].isoformat(), r["media_source"])
        for r in out.collect()
    }
    assert got == {
        ("id-1", "2024-01-05T10:00:00", "meta"),
        ("id-2", "2024-01-06T09:00:00", "google"),
    }
    # partition layout: one dir per install_date
    import os

    dates = {d for d in os.listdir(sink) if d.startswith("install_date=")}
    assert dates == {"install_date=2024-01-05", "install_date=2024-01-06"}


def test_streaming_merge_upsert_converges_to_latest(spark, tmp_path):
    """CDC upsert through foreachBatch: updates to the same key spread
    over micro-batches (including an out-of-order OLD update arriving
    last) must converge to the per-key latest-wins state a single
    batch merge would produce."""
    from pyspark.sql import functions as F

    from appsflyer_to_clickhouse_spark.schemas import (
        ch_sink_schema,
        sink_columns,
    )
    from appsflyer_to_clickhouse_spark.streaming.sinks import (
        merge_upsert_batch_fn,
        run_foreach_batch_availablenow,
    )

    def shaped(triples):
        base = spark.createDataFrame(
            triples,
            "appsflyer_id string, install_time_s string, event_time_s string",
        ).select(
            "appsflyer_id",
            F.to_timestamp("install_time_s").alias("install_time"),
            F.to_timestamp("event_time_s").alias("event_time"),
        )
        for f in ch_sink_schema().fields:
            if f.name not in ("appsflyer_id", "install_time", "event_time"):
                base = base.withColumn(f.name, F.lit(None).cast(f.dataType))
        return base.select(*sink_columns())

    src = str(tmp_path / "src")
    batches = [
        [("k1", "2024-01-01 08:00:00", "2024-01-01 08:00:00"),
         ("k2", "2024-01-01 09:00:00", "2024-01-01 09:00:00")],
        [("k1", "2024-01-01 08:00:00", "2024-01-01 10:00:00"),  # newer k1
         ("k3", "2024-01-02 07:00:00", "2024-01-02 07:00:00")],
        [("k2", "2024-01-01 09:00:00", "2024-01-01 07:30:00")],  # STALE k2
    ]
    for i, rows in enumerate(batches):
        shaped(rows).repartition(1).write.parquet(f"{src}/b{i}")
    paths = [f"{src}/b{i}" for i in range(len(batches))]
    stream = (
        spark.readStream.schema(spark.read.parquet(*paths).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/b*")
    )
    sink = str(tmp_path / "sink")
    run_foreach_batch_availablenow(stream, merge_upsert_batch_fn(sink))

    got = {
        r["appsflyer_id"]: r["event_time"].isoformat()
        for r in spark.read.parquet(sink).collect()
    }
    assert got == {
        "k1": "2024-01-01T10:00:00",
        "k2": "2024-01-01T09:00:00",  # stale update did not regress
        "k3": "2024-01-02T07:00:00",
    }
