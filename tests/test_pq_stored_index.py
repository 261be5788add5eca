"""Stored PQ index on the manifest sink (VERDICT r7 task 5): the
codes table round-trips byte-exactly through the chbatch_arrow sink,
serves the same shortlist as the session-stage codes, and — written
CLUSTERED BY IVF CELL — lets a cell probe prune whole parts from
manifest stats alone (the 10 TB-index scan shape).
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from appsflyer_to_clickhouse_spark.plans.registry import QUERIES
from appsflyer_to_clickhouse_spark.plans.similarity_queries import (
    _pq_codes,
    _pq_codes_schema,
)
from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    ClickHouseArrowDataSource,
    optimize_sink,
    prune_files,
    read_committed_parquet,
    read_committed_pruned,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stored(spark):
    spark.dataSource.register(ClickHouseArrowDataSource)
    codes = _pq_codes(spark, SF)
    path = tempfile.mkdtemp(prefix="spark_graft_pqidx_t_") + "/index"
    (
        codes.write.format("chbatch_arrow")
        .option("path", path)
        .option("batchsize", "1000000")
        .mode("append")
        .save()
    )
    return path, codes


def test_stored_codes_round_trip_exact(spark, stored):
    path, codes = stored
    back = read_committed_parquet(spark, path, _pq_codes_schema())
    want = sorted(map(tuple, codes.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == want  # every code byte-identical through the sink


def test_stored_query_registered_and_matches_session_stage(spark):
    """The graded entry exists and its result equals the
    session-stage similarity_pq_adc result (same oracle, same codes)."""
    assert "similarity_pq_stored" in QUERIES
    a = sorted(
        map(tuple, QUERIES["similarity_pq_adc"](spark, SF).collect())
    )
    b = sorted(
        map(tuple, QUERIES["similarity_pq_stored"](spark, SF).collect())
    )
    assert a == b


def test_cell_clustered_index_prunes_parts(spark, stored):
    """The 10 TB shape: codes written clustered by a coarse cell id
    (here vec_id buckets stand in for IVF cells — the layout property
    is what's under test) let a single-cell probe prune to ~1/4 of
    the parts from manifest stats, before Spark plans a task."""
    path, codes = stored
    clustered = tempfile.mkdtemp(prefix="spark_graft_pqcl_") + "/index"
    from pyspark.sql import types as T

    cell_schema = T.StructType(
        [T.StructField("cell", T.IntegerType()), *_pq_codes_schema().fields]
    )
    (
        codes.withColumn(
            "cell", (F.col("vec_id") % 4).cast("int")
        )
        .select("cell", *codes.columns)
        .repartition(4, "cell")
        .sortWithinPartitions("cell")
        .write.format("chbatch_arrow")
        .option("path", clustered)
        .option("batchsize", "1000000")
        .mode("append")
        .save()
    )
    # cluster for DISJOINT per-part cell ranges (range partition)
    optimize_sink(
        spark,
        clustered,
        cell_schema,
        target_rows_per_file=max(1, codes.count() // 4),
        sort_by=["cell"],
    )
    total = len(prune_files(clustered, "cell"))
    probe = prune_files(clustered, "cell", 2, 2)
    assert total >= 4
    assert len(probe) <= max(1, total // 2)  # stats pruned the rest
    got = read_committed_pruned(
        spark, clustered, cell_schema, "cell", 2, 2
    )
    want = codes.filter(F.col("vec_id") % 4 == 2).count()
    assert got.count() == want


def test_ivf_stored_matches_ivfpq_and_prunes(spark):
    """similarity_ivf_stored (VERDICT r9 task 3) serves EXACTLY the
    same ranked answer as similarity_ivfpq — the cell-partitioned
    stored index changes WHICH FILES are opened (nprobe cells via
    partitionfilter instead of a semi-join over ids), never the
    candidate set — and its own n_cells_scanned column pins that the
    by-value plan touched only probed cells. Recall floors for the
    shared pipeline live in test_pq_recall.py."""
    sf = "/root/testdata/sf0.001"
    stored_rows = [
        (r.vec_id, r.l2_dist)
        for r in QUERIES["similarity_ivf_stored"](spark, sf).collect()
    ]
    ivfpq_rows = [
        (r.vec_id, r.l2_dist)
        for r in QUERIES["similarity_ivfpq"](spark, sf).collect()
    ]
    assert stored_rows == ivfpq_rows
    got = QUERIES["similarity_ivf_stored"](spark, sf).first()
    assert got.n_cells_scanned <= 5 < got.n_cells_total == 8
