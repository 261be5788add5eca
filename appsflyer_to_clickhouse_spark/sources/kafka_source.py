"""Kafka streaming source — the install-event feed a production
deployment would read instead of cron-polling the AppsFlyer HTTP
export (reference main.py:114-130).

Gated: this container ships no Kafka broker and no
``spark-sql-kafka-0-10`` connector jar, so the stream BUILDER raises a
clear error at the format boundary, while everything downstream of the
raw Kafka frame — the value decode, the explicit-schema JSON parse,
the event-time projection — is pure DataFrame logic that tests
exercise offline on a static frame with the exact wire schema
(``kafka_wire_schema``). On a real cluster, submit with
``spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``
and no code here changes.

Design notes for 100 TB/day feeds:
- one Spark partition per Kafka partition; parallelism is sized on the
  TOPIC, not in code (``minPartitions`` only to oversubscribe);
- ``maxOffsetsPerTrigger`` bounds micro-batch size so a backlog replay
  cannot OOM executors;
- the parsed stream plugs directly into the SAME operators as the
  batch path: ``stream_dedup_watermark`` for idempotency, the
  foreachBatch ClickHouse sink for delivery (streaming/sinks.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kafka_wire_schema() -> T.StructType:
    """Schema of the raw frame Spark's Kafka source produces (fixed by
    the connector contract): binary key/value plus topic metadata."""
    return T.StructType(
        [
            T.StructField("key", T.BinaryType()),
            T.StructField("value", T.BinaryType()),
            T.StructField("topic", T.StringType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("timestamp", T.TimestampType()),
            T.StructField("timestampType", T.IntegerType()),
        ]
    )


def install_event_schema() -> T.StructType:
    """Explicit schema for the JSON install payload — NEVER inferred:
    at scale, schema inference both costs a pass and drifts when a
    batch happens to miss an optional field."""
    return T.StructType(
        [
            T.StructField("appsflyer_id", T.StringType()),
            T.StructField("customer_user_id", T.StringType()),
            T.StructField("event_time", T.StringType()),
            T.StructField("install_time", T.StringType()),
            T.StructField("media_source", T.StringType()),
            T.StructField("campaign", T.StringType()),
            T.StructField("af_status", T.StringType()),
        ]
    )


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 1_000_000,
    min_partitions: int | None = None,
) -> DataFrame:
    """Build the raw Kafka stream (requires the Kafka connector jar on
    the classpath; raises AnalysisException('Failed to find data
    source: kafka') otherwise — by design, loudly, at build time)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    if min_partitions is not None:
        reader = reader.option("minPartitions", str(min_partitions))
    return reader.load()


def parse_install_events(raw: DataFrame) -> DataFrame:
    """Decode the Kafka wire frame into typed install events — pure
    column logic, identical for the real stream and the offline test
    frame: UTF-8 decode the value, from_json with the EXPLICIT payload
    schema (malformed payloads become NULL structs, kept and flagged
    rather than dropped, so poison messages are countable), project
    event time to a timestamp for watermarking."""
    # from_json is PERMISSIVE: a malformed payload parses to an
    # all-NULL struct, NOT a NULL struct — the reliable malformed flag
    # is the standard corrupt-record column, which from_json fills with
    # the raw text only when parsing failed
    parse_schema = install_event_schema().add("_corrupt_record", T.StringType())
    parsed = raw.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp").alias("kafka_ts"),
        F.col("value").isNull().alias("_tombstone"),
        F.from_json(
            F.col("value").cast("string"),
            parse_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("ev"),
    )
    payload_cols = [f.name for f in install_event_schema().fields]
    return parsed.select(
        "topic",
        "partition",
        "offset",
        "kafka_ts",
        *[F.col(f"ev.{c}").alias(c) for c in payload_cols],
        F.to_timestamp("ev.event_time").alias("event_ts"),
        # NULL values (compacted-topic tombstones / empty messages)
        # parse to a NULL struct with a NULL corrupt-record column —
        # they'd flow downstream as "valid" all-NULL events and their
        # NULL keys would collide in the dedup state; flag them too
        (
            F.col("ev._corrupt_record").isNotNull() | F.col("_tombstone")
        ).alias("malformed"),
    )
