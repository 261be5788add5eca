"""Graded queries for PER-PART BLOOM-FILTER skipping indexes
(VERDICT r9 task 1 — sinks/bloom_index.py).

The reference's core read is a POINT LOOKUP on a high-cardinality
string: its dedup window scan pulls recent ``appsflyer_id`` keys and
anti-joins the incoming batch (reference main.py:172-180). For that
key shape min/max footer stats degenerate to keep-everything — every
part of a uuid-ish column spans the full lexicographic range — so at
100 TB the probe scans the table. A per-part bloom filter turns the
same lookup into ~FPP of the parts: a miss is a proof of absence.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from .registry import load, register

_KEY_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("key", T.StringType()),
    ]
)


@register(
    "sink_key_lookup_bloom",
    """
    SELECT event_id, user_id, event_type,
           md5(CAST(event_id AS VARCHAR)) AS key,
           CAST(4 AS BIGINT) AS n_stats_kept,
           CAST(1 AS BIGINT) AS n_scanned
    FROM events
    WHERE event_id = 123
    """,
)
def q_sink_key_lookup_bloom(spark, sf_dir):
    """BLOOM-INDEX point lookup (sinks/bloom_index.py +
    prune_files/ManifestBatchReader.pushFilters — Delta's bloom-filter
    index / ClickHouse's skip index, graded on the reference's own
    access shape, main.py:172-180). Four interleaved appends land a
    uuid-ish md5 key whose per-part min/max all span the full hex
    range, so stats pruning keeps ALL 4 parts (``n_stats_kept`` pins
    the degeneration into the value hash); the per-part blooms
    written at flush (fpp 1e-4) prune the same equality probe to
    EXACTLY the 1 part holding the key (``n_scanned`` — a false
    positive or a layer that degrades to stats returns >1 and
    hash-mismatches). The row itself is read back through the Data
    Source reader's pushed EqualTo filter, which consults the same
    bitmaps at planning time. Lifecycle/conservatism pins live in
    tests/test_bloom_skipping.py."""
    from ..sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        _manifest_read,
        prune_files,
    )

    spark.dataSource.register(ClickHouseArrowDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    ev = (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type")
        .withColumn("key", F.md5(F.col("event_id").cast("string")))
    )
    path = tempfile.mkdtemp(prefix="spark_graft_bloom_") + "/s"

    def _append(i: int) -> None:
        (
            ev.filter(F.col("event_id") % 4 == i)
            .coalesce(1)
            .write.format("chbatch_arrow")
            .option("path", path)
            .option("bloomfilter", "key")
            .option("bloomfpp", "0.0001")
            .option("batchsize", "100000000")
            .mode("append")
            .save()
        )

    # overlap the 4 independent appends (opt guide §2.6): parts are
    # uniquely named, only the manifest COMMIT serializes (on the
    # O_EXCL lock — the exact two-writer case the multiwriter stress
    # tests pin), and every graded value below is append-order-free
    # (stats/blooms are keyed by part filename)
    from .registry import run_overlapped

    run_overlapped(spark, _append, range(4))
    probe = __import__("hashlib").md5(b"123").hexdigest()
    m = _manifest_read(path)
    n_stats_kept = sum(
        1
        for f in m["files"]
        if (st := (m["stats"].get(f) or {}).get("key")) is None
        or (st["min"] <= probe <= st["max"])
    )
    n_scanned = len(prune_files(path, "key", probe, probe))
    got = (
        spark.read.format("chbatch_arrow")
        .schema(_KEY_SCHEMA)
        .option("path", path)
        .load()
        .filter(F.col("key") == probe)
    )
    return got.withColumn(
        "n_stats_kept", F.lit(n_stats_kept).cast("long")
    ).withColumn("n_scanned", F.lit(n_scanned).cast("long"))


@register(
    "sink_add_column",
    """
    SELECT CAST(event_id AS VARCHAR) AS appsflyer_id,
           user_id AS uid,
           CAST(NULL AS VARCHAR) AS campaign,
           CAST(1 AS BIGINT) AS v_added
    FROM events WHERE event_id % 10 = 0
    UNION ALL
    SELECT CAST(event_id AS VARCHAR) AS appsflyer_id,
           user_id AS uid,
           event_type AS campaign,
           CAST(1 AS BIGINT) AS v_added
    FROM events WHERE event_id % 10 = 1
    """,
)
def q_sink_add_column(spark, sf_dir):
    """ADD COLUMN as a manifest metadata commit (VERDICT r9 task 5 —
    datasource_sink.add_column + the vectorized typed-NULL backfill
    in manifest_source._read_part): batch v1 lands, the column is
    ADDED as one zero-rewrite commit (``v_added`` pins its version
    into the value hash), batch v2 lands WITH it, and the Data
    Source reader reconciles per part with NO ``mergeSchema``
    footer pass — pre-add parts surface typed NULLs on the Arrow
    batch path, so read planning stays O(manifest) at any part
    count. The oracle is the explicit UNION with a NULL column, so
    the backfill is value-checked. Audit/refusal/carry pins live in
    tests/test_add_column.py."""
    from pyspark.sql import types as T

    from ..sinks.datasource_sink import (
        ClickHouseArrowDataSource,
        add_column,
    )

    spark.dataSource.register(ClickHouseArrowDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    ev = load(spark, sf_dir, "events")
    v1 = ev.filter(F.col("event_id") % 10 == 0).select(
        F.col("event_id").cast("string").alias("appsflyer_id"),
        F.col("user_id").alias("uid"),
    )
    v2 = ev.filter(F.col("event_id") % 10 == 1).select(
        F.col("event_id").cast("string").alias("appsflyer_id"),
        F.col("user_id").alias("uid"),
        F.col("event_type").alias("campaign"),
    )
    path = tempfile.mkdtemp(prefix="spark_graft_addcol_") + "/s"
    (
        v1.write.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", "100000000")
        .mode("append")
        .save()
    )
    r = add_column(path, "campaign", "string")
    (
        v2.write.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", "100000000")
        .mode("append")
        .save()
    )
    schema = T.StructType(
        [
            T.StructField("appsflyer_id", T.StringType()),
            T.StructField("uid", T.LongType()),
            T.StructField("campaign", T.StringType()),
        ]
    )
    return (
        spark.read.format("chbatch_arrow")
        .schema(schema)
        .option("path", path)
        .load()
        .withColumn("v_added", F.lit(r["version"]).cast("long"))
    )
