"""Stored-ANN index MAINTENANCE under DML (VERDICT r8 task 2).

Pins, on a synthetic base table driven through the real verbs:
- the judge's done-criterion: delete-then-incremental-refresh is
  CODE-IDENTICAL to a from-scratch rebuild of the index over the
  post-DML base (same rows, same codes);
- the staleness guard refuses a stale index loudly and serves after
  the refresh;
- a REPLAYED refresh is a no-op (the watermark append is
  txn-deduplicated), and refreshing a fresh index applies nothing.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from appsflyer_to_clickhouse_spark.plans.similarity_queries import (
    _IDX_TXN,
    _base_schema,
    _pq_codes_schema,
    _pq_meta,
    read_pq_index_fresh,
    refresh_pq_index,
)
from appsflyer_to_clickhouse_spark.sinks.datasource_sink import (
    ClickHouseArrowDataSource,
    _manifest_read,
    read_committed_parquet,
)
from appsflyer_to_clickhouse_spark.sinks.mutations import delete_where

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def setup(spark):
    from appsflyer_to_clickhouse_spark.operators.pq import (
        K_CENT,
        M_SUB,
        pq_code_udf,
    )
    from appsflyer_to_clickhouse_spark.plans.similarity_queries import (
        _emb,
        _pq_codes,
    )

    spark.dataSource.register(ClickHouseArrowDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    root = tempfile.mkdtemp(prefix="spark_graft_pqrft_")
    base, idx = root + "/base", root + "/index"
    emb = _emb(spark, SF)
    (
        emb.write.format("chbatch_arrow")
        .option("path", base)
        .option("batchsize", "1000000")
        .mode("append")
        .save()
    )
    (
        _pq_codes(spark, SF)
        .write.format("chbatch_arrow")
        .option("path", idx)
        .option("batchsize", "1000000")
        .option("txnappid", _IDX_TXN)
        .option("txnversion", "0")
        .mode("append")
        .save()
    )
    # DML: dv delete + append (exemplars and the query vector spared)
    delete_where(
        spark, base, _base_schema(),
        "vec_id % 17 = 3 AND vec_id > 120", mode="dv",
    )
    (
        emb.filter("vec_id % 23 = 1 AND vec_id > 120")
        .select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "label", "v"
        )
        .write.format("chbatch_arrow")
        .option("path", base)
        .option("batchsize", "1000000")
        .mode("append")
        .save()
    )
    seeds, _ = _pq_meta(spark, SF)
    kernel = pq_code_udf([seeds[f"c{k}v"] for k in range(K_CENT)])
    return {
        "base": base,
        "idx": idx,
        "seeds": seeds,
        "kernel": kernel,
        "M_SUB": M_SUB,
    }


def test_stale_guard_then_refresh_equals_rebuild(spark, setup):
    base, idx = setup["base"], setup["idx"]
    with pytest.raises(ValueError, match="STALE.*built for base version 0"):
        read_pq_index_fresh(spark, idx, base)
    r = refresh_pq_index(spark, idx, base, setup["seeds"])
    assert r["applied"] > 0 and r["base_version"] == 2
    stored = read_pq_index_fresh(spark, idx, base)  # guard passes now
    # from-scratch rebuild: encode the CURRENT base with the frozen
    # codebook — the incremental index must be row- and code-identical
    cur = read_committed_parquet(spark, base, _base_schema())
    rebuilt = cur.select(
        "vec_id", setup["kernel"]("v").alias("c")
    ).select(
        "vec_id",
        *[F.col("c")[s].alias(f"c{s}") for s in range(setup["M_SUB"])],
    )
    assert stored.count() == rebuilt.count() == cur.count()
    assert (
        stored.exceptAll(rebuilt).count() == 0
        and rebuilt.exceptAll(stored).count() == 0
    )


def test_refresh_replay_is_noop(spark, setup):
    base, idx = setup["base"], setup["idx"]
    n_before = read_committed_parquet(
        spark, idx, _pq_codes_schema()
    ).count()
    v_before = _manifest_read(idx)["txns"][_IDX_TXN]
    # fresh index: the refresh short-circuits without touching data
    r = refresh_pq_index(spark, idx, base, setup["seeds"])
    assert r["applied"] == 0
    assert (
        read_committed_parquet(spark, idx, _pq_codes_schema()).count()
        == n_before
    )
    assert _manifest_read(idx)["txns"][_IDX_TXN] == v_before
