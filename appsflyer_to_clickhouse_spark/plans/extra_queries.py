"""Supplementary scale-robustness variants.

Registered LAST (after the relational vocabulary) on purpose: the
first 50 registration slots are reserved for SURVEY.md §2 operators +
the LLM-pipeline family plus the relational classics (see
plans/__init__.py). Everything here is still covered by the repo's own
oracle-differential pytest; these queries exist to demonstrate the
scale-hardened variant of an already-green operator, not to claim new
operator surface.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from pyspark.sql import functions as F

from ..operators.dedup import (
    connected_components,
    lsh_candidate_pairs,
    lsh_candidate_pairs_salted,
    minhash_signatures,
)
from ..streaming.sinks import dedup_append_batch_fn, run_foreach_batch_availablenow
from ..streaming.stateful import stateful_user_counter
from ..functions.zorder import zorder_sql
from .dedup_queries import (
    BANDS,
    NUM_HASHES,
    ROWS_PER_BAND,
    candidates_cte,
    components_cte,
)
from .registry import load, load_fanout, register
from .streaming_queries import _replay_src, _RUN_SEQ, stream_shuffle_partitions


@register(
    "dedup_minhash_lsh_salted",
    f"WITH {candidates_cte('documents')} SELECT id_a, id_b FROM cand",
)
def q_dedup_minhash_lsh_salted(spark, sf_dir):
    """Skew-bounded twin of ``dedup_minhash_lsh`` — IDENTICAL output
    (same DuckDB oracle), different pair-generation physics: each
    (band, bucket) id list is sliced into salt=4 chunks and the 10
    chunk-pairs are repartitioned so an adversarial duplicate cluster
    of k docs spreads its k^2/2 candidate pairs over ~salt^2/2 tasks
    instead of stalling one (operators/dedup.py:
    lsh_candidate_pairs_salted). This is the variant you run at 100 TB
    when duplicate-group sizes are unknown."""
    docs = load_fanout(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "text", NUM_HASHES, 3)
    return lsh_candidate_pairs_salted(sigs, "doc_id", BANDS, ROWS_PER_BAND, salt=4)


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE
    {candidates_cte('documents')},
    {components_cte()}
    SELECT doc_id, component FROM comp
    """,
)
def q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERS: connected components over the MinHash-LSH
    candidate pairs via the O(log n)-round large-star/small-star
    rewrite (operators/dedup.py:connected_components_star — VERDICT r5
    task 4; the min-label twin remains as algorithm="minlabel"). This
    is the step that makes dedup actionable — keep min(doc_id) per
    component, drop the rest. The oracle computes the identical
    components via a recursive transitive-closure CTE, so an ITERATIVE
    Spark algorithm is still exactly oracle-checked. At 100 TB:
    round count stays logarithmic even for chain-shaped components
    (template drift), where label propagation would need
    diameter-many shuffles; candidate graphs are sparse (LSH-bounded),
    so the edge list — not the corpus — is the working set."""
    from pyspark.sql import functions as F2

    from .dedup_queries import cc_star_frame

    return cc_star_frame(spark, sf_dir).select(
        F2.col("id").alias("doc_id"), "component"
    )


@register(
    "stream_foreachbatch_dedup_sink",
    "SELECT DISTINCT user_id FROM events",
)
def q_stream_foreachbatch_dedup_sink(spark, sf_dir):
    """End-to-end streaming append pipeline: events replayed as a
    multi-batch file stream (maxFilesPerTrigger=1) -> foreachBatch
    writer that drops in-batch duplicate keys, anti-joins against the
    sink-so-far, and appends (streaming/sinks.py — the reference's
    idempotent-insert contract per micro-batch, reusing the batch sink
    code verbatim). Output: the sink read back — exactly DISTINCT
    user_id regardless of how the input split into batches. Survivor
    rows are batch-order-dependent, so only the key column is
    exposed."""
    src = _replay_src(spark, sf_dir, ["event_id", "ts", "user_id"], "streamfb")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    sink_path = tempfile.mkdtemp(prefix="spark_graft_fb_sink_") + "/out"
    with stream_shuffle_partitions(spark):
        run_foreach_batch_availablenow(
            stream, dedup_append_batch_fn(sink_path, ["user_id"])
        )
    return spark.read.parquet(sink_path).select("user_id")


# shared with the batch twin so the pinned semantics cannot drift
from .advanced_queries import SESSION_WINDOW_ORACLE  # noqa: E402


@register("stream_session_window", SESSION_WINDOW_ORACLE)
def q_stream_session_window(spark, sf_dir):
    """STREAMING gap-based session windows: events replayed as a file
    stream -> groupBy(F.session_window('ts', '30 minutes'), user_id)
    -> complete-mode memory sink (availableNow). The final merged
    sessions equal the batch session_window_agg whatever the
    micro-batch boundaries were — pinned by the same relational
    lag/cumsum oracle. In production this runs with a watermark in
    update mode so session state is evicted once the gap can no longer
    be extended."""
    src = _replay_src(spark, sf_dir, ["ts", "user_id"], "streamsess")
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    agg = (
        stream.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    name = f"stream_session_window_{next(_RUN_SEQ)}"
    ckpt = tempfile.mkdtemp(prefix=f"spark_graft_ckpt_{name}_")
    with stream_shuffle_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


@register(
    "stream_stateful_counter",
    """
    SELECT user_id, CAST(count(*) AS BIGINT) AS events_seen
    FROM events WHERE user_id % 10 = 0 GROUP BY user_id
    """,
)
def q_stream_stateful_counter(spark, sf_dir):
    """Custom stateful operator end-to-end: events replayed as a
    multi-batch file stream -> applyInPandasWithState per-user counter
    (streaming/stateful.py; Arrow-batched, state scales with keys not
    events) -> update-mode memory sink. The per-batch emissions are
    batch-boundary-dependent, but the FINAL per-key counter equals the
    batch COUNT(*) per user exactly — so taking max(events_seen) per
    key gives a deterministic, oracle-checkable surface for a
    non-relational stateful operator. Keyspace sampled to 1/10 of
    users (mirrored in the oracle): applyInPandasWithState round-trips
    one pandas frame per key per batch, so the demo cost scales with
    keys — the full-key form is the same operator, just slower."""
    import pyspark.sql.functions as F2

    src = _replay_src(spark, sf_dir, ["ts", "user_id"], "streamstate")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(src)
        .filter(F2.col("user_id") % 10 == 0)
    )
    counted = stateful_user_counter(stream)
    name = f"stream_stateful_counter_{next(_RUN_SEQ)}"
    ckpt = tempfile.mkdtemp(prefix=f"spark_graft_ckpt_{name}_")
    with stream_shuffle_partitions(spark):
        q = (
            counted.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(F2.max("events_seen").alias("events_seen"))
    )


@register(
    "stream_stateful_counter_rocksdb",
    """
    SELECT user_id, CAST(count(*) AS BIGINT) AS events_seen
    FROM events WHERE user_id % 10 = 0 GROUP BY user_id
    """,
)
def q_stream_stateful_counter_rocksdb(spark, sf_dir):
    """The stateful counter on the RocksDBStateStoreProvider — the
    state backend a 100 TB ingest actually runs on (per-key state
    spills to local disk instead of capping at executor heap; ships
    inside Spark, no extra dependency). SAME oracle as
    stream_stateful_counter: the provider is an execution detail and
    must never change the answer — this registration makes that claim
    driver-graded, not just pytest-pinned
    (tests/test_rocksdb_state_store.py carries the metrics-engaged
    proof and the changelog-checkpointing variant)."""
    conf = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf, None)
    spark.conf.set(
        conf,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        # the stream runs to completion inside (awaitTermination);
        # only the final batch-side groupBy escapes the conf scope
        return q_stream_stateful_counter(spark, sf_dir)
    finally:
        if prev is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, prev)


@register(
    "dedup_clusters_minlabel",
    f"""
    WITH RECURSIVE
    {candidates_cte('documents')},
    {components_cte()}
    SELECT doc_id, component FROM comp
    """,
)
def q_dedup_clusters_minlabel(spark, sf_dir):
    """dedup_clusters on the min-label propagation engine — the
    O(component-diameter) twin of the default large-star/small-star
    path, kept driver-graded so BOTH connected-components engines stay
    continuously differentials against the same recursive-CTE oracle
    (LSH candidate graphs are dense and shallow, so min-label is
    competitive here; the star engine wins on chain-shaped components
    — round-count pins in tests/test_connected_components.py)."""
    from pyspark.sql import functions as F2

    from .dedup_queries import cand_pairs_frame

    pairs = cand_pairs_frame(spark, sf_dir)
    return connected_components(pairs, algorithm="minlabel").select(
        F2.col("id").alias("doc_id"), "component"
    )


@register(
    "stream_static_join",
    """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
                AS DOUBLE) AS total_value
    FROM events
    JOIN customer ON c_custkey = user_id
    GROUP BY c_mktsegment
    """,
)
def q_stream_static_join(spark, sf_dir):
    """Stream-static enrichment join: the events stream joins the
    customer dim BATCH-side (re-read per micro-batch, broadcast — the
    standard pattern for slowly-changing dims; no state, no watermark
    needed for inner equi-joins against static data), then a streaming
    groupBy aggregates per segment in complete mode under availableNow.
    The final state equals the batch join+agg whatever the batch
    boundaries were, so the oracle is exact. At 100 TB the dim
    broadcast is per-executor-once and the only shuffle is the
    6-segment aggregation."""
    src = _replay_src(spark, sf_dir, ["user_id", "value"], "streamsj")
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    dim = F.broadcast(
        load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    )
    joined = stream.join(dim, stream.user_id == dim.c_custkey)
    agg = joined.groupBy("c_mktsegment").agg(
        F.expr("CAST(count(*) AS BIGINT) AS n_events"),
        F.expr(
            "CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)"
            " AS DOUBLE) AS total_value"
        ),
    )
    name = f"stream_static_join_{next(_RUN_SEQ)}"
    ckpt = tempfile.mkdtemp(prefix=f"spark_graft_ckpt_{name}_")
    with stream_shuffle_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


# bucketed-table cache: (session id, sf_dir) -> (orders_table, lineitem_table)
_BUCKET_TABLES: dict[tuple, tuple[str, str]] = {}
_N_BUCKETS = 8


def _bucketed_tables(spark, sf_dir: str) -> tuple[str, str]:
    """Write orders + lineitem as bucketed tables (bucketBy the join
    key, same bucket count both sides) once per (session, sf_dir).
    External location under /tmp so no warehouse dir lands in the repo;
    the in-session catalog carries the bucketing metadata."""
    key = (id(spark._jsparkSession), sf_dir)
    cached = _BUCKET_TABLES.get(key)
    if cached is not None and all(spark.catalog.tableExists(t) for t in cached):
        return cached
    # tag from the FULL path, not the basename: two sf_dirs sharing a
    # basename (/run_a/sf0.1 vs /run_b/sf0.1) would otherwise alias one
    # catalog table — the second write overwrites it while the first
    # sf_dir's cache entry still passes tableExists and silently serves
    # the wrong dataset
    import hashlib as _hl

    base = "".join(
        c if c.isalnum() else "_" for c in sf_dir.rstrip("/").split("/")[-1]
    )
    tag = f"{base}_{_hl.md5(sf_dir.rstrip('/').encode()).hexdigest()[:8]}"
    names = (f"b_orders_{tag}", f"b_lineitem_{tag}")
    for name, table, bkey in (
        (names[0], "orders", "o_orderkey"),
        (names[1], "lineitem", "l_orderkey"),
    ):
        path = tempfile.mkdtemp(prefix=f"spark_graft_bucket_{name}_")
        (
            load(spark, sf_dir, table)
            # repartition by the bucket key with the bucket count:
            # HashPartitioning(key, N) is exactly the bucket spec, so
            # each task holds whole buckets — the write parallelizes
            # across N tasks and emits ONE file per bucket, instead of
            # a single scan task sorting and writing all N buckets
            # serially (the docstring's own file-count advice applied
            # to the fixture; measured 6.8 s -> see OPTIMIZATION_r10)
            .repartition(_N_BUCKETS, F.col(bkey))
            .write.mode("overwrite")
            .option("path", path)
            .bucketBy(_N_BUCKETS, bkey)
            .sortBy(bkey)
            .saveAsTable(name)
        )
    _BUCKET_TABLES[key] = names
    return names


@register(
    "join_bucketed_colocate",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)))
                AS DOUBLE), 2) AS DOUBLE) AS total_price
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_join_bucketed_colocate(spark, sf_dir):
    """Co-located big⋈big join via bucketing: both sides are written
    bucketBy(N, join_key) + sortBy, so the join consumes the on-disk
    bucket layout directly — NO Exchange on either join input (pinned
    in tests/test_plan_shapes.py). This is THE technique for repeated
    large-fact joins at 100 TB: the shuffle is paid once at write time
    and amortized over every subsequent join; only the final 5-row
    segment aggregation exchanges. Bucket count at production scale is
    sized so each bucket fits an executor core's memory (~2-4k buckets
    for 100 TB facts), and writers emit one file per bucket per task —
    repartition by the bucket key first keeps file counts linear."""
    t_orders, t_lineitem = _bucketed_tables(spark, sf_dir)
    o = spark.table(t_orders)
    li = spark.table(t_lineitem)
    # merge hint: at test scale the orders side fits the broadcast
    # threshold and Catalyst would ignore the bucket layout; at 100 TB
    # both sides exceed it and SMJ-over-buckets is what happens anyway.
    return (
        li.hint("merge").join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.expr("CAST(count(*) AS BIGINT) AS n_items"),
            F.expr(
                "CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)))"
                " AS DOUBLE), 2) AS DOUBLE) AS total_price"
            ),
        )
    )


# ---------------------------------------------------------------------------
# layout_zorder_cells — Morton-key clustering cells bound 2-D rectangles
# ---------------------------------------------------------------------------


@register(
    "layout_zorder_cells",
    f"""
    WITH st AS (
      SELECT max(l_partkey) AS pk_max, max(l_suppkey) AS sk_max
      FROM lineitem
    ), keyed AS (
      SELECT {zorder_sql('((l_partkey * 256) // (pk_max + 1))',
                         '((l_suppkey * 256) // (sk_max + 1))')} AS z,
             l_partkey, l_suppkey
      FROM lineitem CROSS JOIN st
    )
    SELECT CAST(z >> 8 AS BIGINT) AS zcell,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(l_partkey) AS BIGINT) AS pk_min,
           CAST(max(l_partkey) AS BIGINT) AS pk_max,
           CAST(min(l_suppkey) AS BIGINT) AS sk_min,
           CAST(max(l_suppkey) AS BIGINT) AS sk_max
    FROM keyed GROUP BY 1
    """,
)
def q_layout_zorder_cells(spark, sf_dir):
    """Z-order clustering key over (l_partkey, l_suppkey): both keys
    width-scale to 8 bits (monotone (x*256) intdiv (max+1) — never a
    modulo), bit-interleave into a 16-bit Morton key, and the coarse
    cell (z >> 8) bounds a RECTANGLE in both dimensions — per-cell
    min/max of each raw key prove it. Sorting the table by z at write
    time is what makes range predicates on EITHER column prune row
    groups from footer stats (the single-column sort prunes only its
    own column); pinned against real parquet footers in
    tests/test_scale_techniques.py. functions/zorder.py; the key is a
    ~32-term integer Project — map-only, exact cross-engine."""
    from ..functions.zorder import zorder_interleave

    li = load(spark, sf_dir, "lineitem")
    st = F.broadcast(
        li.agg(
            F.max("l_partkey").alias("pk_mx"), F.max("l_suppkey").alias("sk_mx")
        )
    )
    keyed = li.crossJoin(st).select(
        zorder_interleave(
            F.expr("(l_partkey * 256) div (pk_mx + 1)"),
            F.expr("(l_suppkey * 256) div (sk_mx + 1)"),
            8,
        ).alias("z"),
        "l_partkey",
        "l_suppkey",
    )
    return keyed.groupBy(
        F.shiftright("z", 8).cast("bigint").alias("zcell")
    ).agg(
        F.count("*").alias("n"),
        F.min("l_partkey").cast("bigint").alias("pk_min"),
        F.max("l_partkey").cast("bigint").alias("pk_max"),
        F.min("l_suppkey").cast("bigint").alias("sk_min"),
        F.max("l_suppkey").cast("bigint").alias("sk_max"),
    )


# ---------------------------------------------------------------------------
# join_geo_grid — 2-D proximity join via grid cells (big x big, no NL)
# ---------------------------------------------------------------------------

_GEO_R = 2.0  # proximity radius == grid cell width, in coordinate units
_TWO52 = float(1 << 52)

# deterministic synthetic positions: 52-bit md5 uniforms (exact in a
# double on both engines) scaled to lon [-180, 180) / lat [-90, 90)
def _geo_pos_sql(tag: str, key: str) -> tuple[str, str]:
    def u(axis: str) -> str:
        return (
            f"(('0x' || substr(md5('{axis}|{tag}|' || {key}), 1, 13))::UBIGINT"
            f" / {_TWO52})"
        )

    return f"({u('lon')} * 360.0 - 180.0)", f"({u('lat')} * 180.0 - 90.0)"


@register(
    "join_geo_grid",
    f"""
    WITH cpos AS (
      SELECT c_custkey AS cid,
             {_geo_pos_sql('c', 'c_custkey')[0]} AS lon,
             {_geo_pos_sql('c', 'c_custkey')[1]} AS lat
      FROM customer
    ), spos AS (
      SELECT s_suppkey AS sid,
             {_geo_pos_sql('s', 's_suppkey')[0]} AS lon,
             {_geo_pos_sql('s', 's_suppkey')[1]} AS lat
      FROM supplier
    ), probe AS (
      SELECT cid, lon, lat,
             CAST(floor(lon / {_GEO_R}) AS BIGINT) + dx.d AS cx,
             CAST(floor(lat / {_GEO_R}) AS BIGINT) + dy.d AS cy
      FROM cpos,
           (SELECT unnest([-1, 0, 1]) AS d) dx,
           (SELECT unnest([-1, 0, 1]) AS d) dy
    ), build AS (
      SELECT sid, lon, lat,
             CAST(floor(lon / {_GEO_R}) AS BIGINT) AS cx,
             CAST(floor(lat / {_GEO_R}) AS BIGINT) AS cy
      FROM spos
    )
    SELECT p.cid, b.sid,
           round(sqrt((p.lon - b.lon) * (p.lon - b.lon)
                      + (p.lat - b.lat) * (p.lat - b.lat)), 6) AS dist
    FROM probe p
    JOIN build b ON p.cx = b.cx AND p.cy = b.cy
    WHERE (p.lon - b.lon) * (p.lon - b.lon)
          + (p.lat - b.lat) * (p.lat - b.lat) <= {_GEO_R} * {_GEO_R}
    """,
)
def q_join_geo_grid(spark, sf_dir):
    """2-D proximity join (customer x supplier positions within radius
    {_GEO_R}) via GRID CELLS — the planar generalization of
    join_range_bucketed: build-side points register in ONE cell of
    width r, probe-side points probe their 3x3 neighborhood (any pair
    within r is provably in adjacent cells), the join is a plain
    equi-join on (cx, cy) with the exact distance as a residual — a
    NestedLoop never appears at any scale, and shuffle traffic is 9x
    probe + 1x build, never |A| x |B|. Positions are 52-bit md5
    uniforms (exact in doubles on both engines; planar distance — the
    technique under PostGIS/Sedona ST_DWithin gridding, minus
    geodesy). Duplicate (probe, build) matches are impossible because
    the build side registers once."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey")

    def u(axis, tag, key):
        return (
            F.expr(
                f"CAST(conv(substring(md5(concat('{axis}|{tag}|', "
                f"CAST({key} AS STRING))), 1, 13), 16, 10) AS DOUBLE)"
            )
            / F.lit(_TWO52)
        )

    cpos = cust.select(
        F.col("c_custkey").alias("cid"),
        (u("lon", "c", "c_custkey") * 360.0 - 180.0).alias("lon"),
        (u("lat", "c", "c_custkey") * 180.0 - 90.0).alias("lat"),
    )
    spos = supp.select(
        F.col("s_suppkey").alias("sid"),
        (u("lon", "s", "s_suppkey") * 360.0 - 180.0).alias("lon"),
        (u("lat", "s", "s_suppkey") * 180.0 - 90.0).alias("lat"),
    )
    d = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    probe = (
        cpos.withColumn("dx", d)
        .withColumn("dy", d)
        .select(
            "cid",
            F.col("lon").alias("p_lon"),
            F.col("lat").alias("p_lat"),
            (F.floor(F.col("lon") / _GEO_R).cast("bigint") + F.col("dx")).alias("cx"),
            (F.floor(F.col("lat") / _GEO_R).cast("bigint") + F.col("dy")).alias("cy"),
        )
    )
    build = spos.select(
        "sid",
        F.col("lon").alias("b_lon"),
        F.col("lat").alias("b_lat"),
        F.floor(F.col("lon") / _GEO_R).cast("bigint").alias("cx"),
        F.floor(F.col("lat") / _GEO_R).cast("bigint").alias("cy"),
    )
    dsq = (F.col("p_lon") - F.col("b_lon")) * (
        F.col("p_lon") - F.col("b_lon")
    ) + (F.col("p_lat") - F.col("b_lat")) * (F.col("p_lat") - F.col("b_lat"))
    return (
        probe.join(build, ["cx", "cy"])
        .filter(dsq <= F.lit(_GEO_R * _GEO_R))
        .select("cid", "sid", F.round(F.sqrt(dsq), 6).alias("dist"))
    )


# ---------------------------------------------------------------------------
# join_dpp_partitioned — dynamic partition pruning on a date-partitioned fact
# ---------------------------------------------------------------------------

# (session id, sf_dir) -> (fact_path, dim_path)
_DPP_PATHS: dict[tuple, tuple[str, str]] = {}


def _dpp_tables(spark, sf_dir: str) -> tuple[str, str]:
    """Write events as a date-PARTITIONED parquet fact plus a tiny date
    dim, once per (session, sf_dir) — the layout every warehouse fact
    table has at 100 TB (one directory per ingestion date)."""
    key = (id(spark._jsparkSession), sf_dir)
    cached = _DPP_PATHS.get(key)
    # verify the temp dirs still exist (same guard as _replay_src):
    # /tmp cleanup or id() reuse after session GC would otherwise
    # surface as an opaque 'Path does not exist' read error instead of
    # a rebuild
    if cached is not None and all(os.path.isdir(p) for p in cached):
        return cached
    ev = load(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    fact_path = tempfile.mkdtemp(prefix="spark_graft_dpp_fact_") + "/events"
    ev.write.mode("overwrite").partitionBy("event_date").parquet(fact_path)
    dim_path = tempfile.mkdtemp(prefix="spark_graft_dpp_dim_") + "/dates"
    (
        ev.select("event_date")
        .distinct()
        .withColumn(
            "dow", F.datediff(F.col("event_date"), F.lit("1970-01-01")) % 7
        )
        .write.mode("overwrite")
        .parquet(dim_path)
    )
    _DPP_PATHS[key] = (fact_path, dim_path)
    return _DPP_PATHS[key]


@register(
    "join_dpp_partitioned",
    """
    WITH f AS (
      SELECT CAST(ts AS DATE) AS event_date, value FROM events
    ),
    dim AS (
      SELECT DISTINCT event_date,
             date_diff('day', DATE '1970-01-01', event_date) % 7 AS dow
      FROM f
    )
    SELECT f.event_date,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,3)))
                AS DOUBLE), 2) AS DOUBLE) AS total_value
    FROM f JOIN dim ON f.event_date = dim.event_date
    WHERE dim.dow = 1
    GROUP BY f.event_date
    """,
)
def q_join_dpp_partitioned(spark, sf_dir):
    """Dynamic partition pruning: the fact is parquet PARTITIONED BY
    event_date; the dim's selective ``dow = 1`` filter is only known at
    run time, so Catalyst injects a dynamicpruning subquery into the
    fact scan's PartitionFilters — the broadcast result doubles as the
    partition list and the fact reads ~1/7 of its directories instead
    of all of them (pinned in tests/test_plan_shapes.py). At 100 TB
    this is THE difference between scanning 100 TB and scanning one
    week-day's partitions on every dim-filtered join; static pruning
    can't do it because the surviving dates aren't in the query text."""
    fact_path, dim_path = _dpp_tables(spark, sf_dir)
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("dow") == 1)
    return (
        fact.join(F.broadcast(dim), "event_date")
        .groupBy("event_date")
        .agg(
            F.count("*").alias("n_events"),
            F.expr(
                "CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,3)))"
                " AS DOUBLE), 2) AS DOUBLE) AS total_value"
            ),
        )
    )


@register(
    "dedup_cluster_representatives",
    f"""
    WITH RECURSIVE
    {candidates_cte('documents')},
    {components_cte()},
    j AS (
      SELECT c.component, c.doc_id, d.n_chars
      FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    ),
    ranked AS (
      SELECT component, doc_id,
             row_number() OVER (PARTITION BY component
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM j
    )
    SELECT ranked.component, ranked.doc_id AS rep_doc_id,
           CAST(m.n AS BIGINT) AS n_members
    FROM ranked
    JOIN (SELECT component, count(*) AS n FROM j GROUP BY component) m
      ON ranked.component = m.component
    WHERE ranked.rn = 1
    """,
)
def q_dedup_cluster_representatives(spark, sf_dir):
    """The ACTIONABLE end of the dedup pipeline: per near-dup cluster,
    the canonical survivor (longest text wins, doc_id breaks ties —
    a deterministic quality-based policy, not min-id) plus member
    count; the corpus keeps singletons + these representatives and
    drops everything else. One window over the component partitioning
    of the (sparse, LSH-bounded) cluster assignment joined to a
    column-pruned (doc_id, n_chars) scan — cluster-sized work, never
    corpus^2."""
    from pyspark.sql import Window as W

    from .dedup_queries import cc_star_frame

    clusters = cc_star_frame(spark, sf_dir).select(
        F.col("id").alias("doc_id"), "component"
    )
    joined = clusters.join(
        load(spark, sf_dir, "documents").select("doc_id", "n_chars"),
        "doc_id",
    )
    w = W.partitionBy("component").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ranked = joined.select(
        "component",
        "doc_id",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(W.partitionBy("component")).alias("n_members"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "component", F.col("doc_id").alias("rep_doc_id"), "n_members"
    )


# ---------------------------------------------------------------------------
# udaf_grouped_median — vectorized pandas UDAF (GROUPED_AGG)
# ---------------------------------------------------------------------------


@register(
    "udaf_grouped_median",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5)::DOUBLE, 6) AS median_value,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def q_udaf_grouped_median(spark, sf_dir):
    """The UDAF surface done the sanctioned way: a GROUPED_AGG
    @pandas_udf (whole group arrives as one Arrow-backed Series,
    aggregates vectorized in numpy) computing the per-event-type
    median alongside a pandas count (Spark refuses to MIX pandas and
    JVM aggregates in one .agg —INVALID_PANDAS_UDF_PLACEMENT— so both
    columns are pandas, planned as one AggregateInPandas pass).
    Median, not mean, on purpose: an order STATISTIC is reduction-order-independent, so
    the Python aggregate hash-matches DuckDB's quantile_cont exactly
    where a float sum would drift. The scale contract of GROUPED_AGG:
    no partial aggregation — every group's values ship to one task —
    so it's for moderate group cardinality x bounded group size;
    unboundedly hot groups want the built-in sketch
    (percentile_approx) instead, registered as
    agg_approx_quantile_bounded."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    # NOTE: the module uses postponed annotations, so the hint below
    # is resolved by name at decoration time — pandas must be a
    # module-level import for 'pd.Series' to resolve.
    @pandas_udf("double")
    def _median(v: pd.Series) -> float:
        return float(np.median(v.to_numpy()))

    @pandas_udf("long")
    def _n(v: pd.Series) -> int:
        return len(v)

    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(_median("value"), 6).alias("median_value"),
        _n("value").cast("bigint").alias("n"),
    )
