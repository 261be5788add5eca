"""Unit pins for operators/graph.py:pagerank beyond the registered
query's 3-iteration oracle: the checkpoint-cadence branch (ckpt_every
fires only on longer runs) and rank-mass conservation.

On a graph where every node has out-degree >= 1 (always true here:
edges are symmetrized, so every node is also a source), power
iteration preserves total rank mass: sum(pr) == n exactly at every
iteration (up to float addition noise), because each node's rank is
redistributed in full and the damping floor re-injects what damping
removes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from appsflyer_to_clickhouse_spark.operators.graph import pagerank


def _ring_edges(spark, n: int = 40):
    # directed ring + a chord every 5 nodes, symmetrized
    rows = []
    for i in range(n):
        rows.append((i, (i + 1) % n))
        if i % 5 == 0:
            rows.append((i, (i + n // 2) % n))
    df = spark.createDataFrame(rows, "src long, dst long")
    return df.union(
        df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def test_pagerank_mass_conserved_short_run(spark):
    edges = _ring_edges(spark)
    pr = pagerank(edges, iters=3)
    n = pr.count()
    total = pr.agg(F.sum("pr")).collect()[0][0]
    assert abs(total - n) < 1e-6, (total, n)


def test_pagerank_ckpt_branch_matches_chained(spark):
    """iters=6 crosses ckpt_every=4, so the lineage-cut branch runs;
    the result must be IDENTICAL to the same run with checkpointing
    effectively disabled — a checkpoint is a materialization barrier,
    never a semantic change."""
    edges = _ring_edges(spark)
    with_ckpt = {
        r["node"]: r["pr"] for r in pagerank(edges, iters=6, ckpt_every=4).collect()
    }
    chained = {
        r["node"]: r["pr"] for r in pagerank(edges, iters=6, ckpt_every=100).collect()
    }
    assert with_ckpt.keys() == chained.keys()
    for k in with_ckpt:
        assert abs(with_ckpt[k] - chained[k]) < 1e-12, k


def test_pagerank_includes_destination_only_nodes(spark):
    """Directed edge list 1->2: node 2 (a sink, never a source) must
    appear in the result with the rank mass it received; building the
    node set from sources alone silently dropped it."""
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r["node"]: r["pr"] for r in pagerank(edges, iters=1).collect()}
    assert set(got) == {1, 2}
    assert abs(got[1] - 0.15) < 1e-12          # no in-edges: floor
    assert abs(got[2] - (0.15 + 0.85)) < 1e-12  # all of node 1's mass
