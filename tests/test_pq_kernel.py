"""The Arrow PQ encode kernel (operators/pq.py:pq_code_udf) must be
CODE-IDENTICAL to the staged-SQL encode it replaced — over the full
corpus and over the adversarial inputs where float fold order or NaN
semantics could diverge (exact ties, NaN/inf elements, NULL vectors).
The DuckDB oracles still run the SQL chains, so any kernel divergence
would also surface as a differential mismatch; this test localizes it.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from appsflyer_to_clickhouse_spark.operators.pq import (
    K_CENT,
    M_SUB,
    code_col_exprs,
    pq_code_udf,
    seeded_dist_col_exprs,
)
from appsflyer_to_clickhouse_spark.plans.similarity_queries import (
    _PQ_SEEDS,
    _PQ_SUB_DIM,
    _emb,
    _pq_book_df,
)

from .conftest import SF_SMALL


def _both_codes(spark, emb, book, seeds):
    """(sql_codes, kernel_codes) keyed by vec_id, as M-tuples."""
    staged = emb.crossJoin(F.broadcast(book)).selectExpr(
        "vec_id",
        *seeded_dist_col_exprs("v", _PQ_SEEDS, M_SUB, _PQ_SUB_DIM, 0, "d"),
    )
    sql_rows = staged.selectExpr(
        "vec_id", *code_col_exprs(M_SUB, K_CENT, "d")
    ).collect()
    sql = {
        r["vec_id"]: tuple(r[f"c{s}"] for s in range(M_SUB)) for r in sql_rows
    }
    kernel_udf = pq_code_udf([seeds[f"c{k}v"] for k in range(K_CENT)])
    k_rows = emb.select("vec_id", kernel_udf("v").alias("c")).collect()
    kern = {r["vec_id"]: tuple(r["c"]) for r in k_rows}
    return sql, kern


def test_kernel_matches_sql_over_full_corpus(spark):
    emb = _emb(spark, SF_SMALL)
    book = _pq_book_df(emb)
    seeds = book.first()
    sql, kern = _both_codes(spark, emb, book, seeds)
    assert kern == sql
    assert len(sql) == emb.count()


def test_kernel_matches_sql_on_adversarial_vectors(spark):
    """Exact ties (midpoint of two centroids in one subspace), NaN and
    inf elements, and a NULL vector — each class exercises a rescue
    path in the kernel; SQL is ground truth."""
    emb = _emb(spark, SF_SMALL)
    book = _pq_book_df(emb)
    seeds = book.first()
    c0, c1 = seeds["c0v"], seeds["c1v"]
    dim = len(c0)
    mid = [
        (a + b) / 2.0 if i < _PQ_SUB_DIM else 0.0
        for i, (a, b) in enumerate(zip(c0, c1))
    ]  # equidistant to centroids 0 and 1 in subspace 0 -> exact tie
    nan_vec = [0.1] * dim
    nan_vec[3] = float("nan")
    inf_vec = [0.1] * dim
    inf_vec[40] = float("inf")
    neg_inf = [0.1] * dim
    neg_inf[0] = float("-inf")
    fixtures = [
        (100001, mid),
        (100002, nan_vec),
        (100003, inf_vec),
        (100004, neg_inf),
        (100005, [float("nan")] * dim),  # every distance NaN
        (100006, None),  # NULL vector -> CASE ELSE K-1 everywhere
        (100007, list(c0)),  # exactly a centroid: zero distance
    ]
    adv = spark.createDataFrame(
        [(i, None, v) for i, v in fixtures],
        "vec_id long, label long, v array<double>",
    )
    sql, kern = _both_codes(spark, adv, book, seeds)
    assert kern == sql, {
        k: (sql[k], kern[k]) for k in sql if sql[k] != kern[k]
    }
    # spot semantics: the tie resolves to the LOWEST index, the
    # centroid vector encodes to itself, NULL falls through to K-1
    assert kern[100001][0] in (0, 1) and kern[100001][0] == sql[100001][0]
    assert kern[100007][0] == 0
    assert kern[100006] == tuple([K_CENT - 1] * M_SUB)
    assert not any(
        math.isnan(x) for cs in kern.values() for x in cs
    )
