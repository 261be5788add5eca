"""Iterative graph algorithms over DataFrame edge lists.

The reference has no graph surface (SURVEY.md §2 Part B); this module
extends the training-data family: near-dup PAIRS become GROUPS via
``operators.dedup.connected_components``, and PageRank below ranks
nodes of a similarity/co-occurrence graph by centrality — the signal a
curation pipeline uses to pick canonical documents or important
entities. Same iterative-Spark discipline as connected_components:
localCheckpoint per iteration (lineage would otherwise double per
step), shuffles sized to the GRAPH (not the session's batch width),
and the driver holds nothing but loop control.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    ckpt_every: int = 4,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list (``src``,
    ``dst``); returns (node, pr) after ``iters`` rounds from a uniform
    pr=1.0 start. Fixed iteration count, not convergence, so the
    result is a deterministic function of the graph — exactly
    reproducible by an unrolled-CTE oracle.

    Cross-engine determinism: each contribution pr(src)/deg(src) is a
    double (IEEE-identical everywhere) cast to DECIMAL(20,12) BEFORE
    the neighbor sum, so the sum is order-independent — the same
    cast-then-decimal-sum pattern text_unigram_logprob pins. Nodes
    with no in-edges keep the damping floor (1 - d).

    Each iteration is ONE edge-sized join + ONE groupBy, and the rank
    state (node-sized, orders of magnitude below the edge list) is
    broadcast so the edges never re-shuffle — right whenever ranks fit
    executor memory (entity/item graphs; ~100M nodes x 16B is 1.6 GB).
    At web scale, where ranks outgrow a broadcast, the same loop runs
    with edges AND ranks hash-partitioned on src so the join is
    co-located — the GraphFrames/Pregel layout.

    Checkpoint cadence: an EAGER localCheckpoint is a full job
    (materialize + fixed scheduling cost), so taking one every
    iteration triples the wall clock of a 3-iteration run (measured:
    12.2 s -> the chained form at sf0.1). But letting lineage run
    unbounded re-plans a linearly growing DAG and, past ~10 chained
    shuffles, trips Catalyst re-optimization cost and executor stack
    depth. ``ckpt_every`` cuts lineage every N iterations — the loop
    runs chained within a window and pays one materialization per
    window, which preserves the bounded-lineage contract at iters=30
    while a short run executes as a single job."""
    spark = edges.sparkSession
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # deg is node-sized — the same broadcastability argument as the
    # rank state below. Broadcasting it means the edge list is NEVER
    # shuffled in this whole operator (measured at sf0.1: the SMJ
    # form wrote 125 MB / 13M shuffle records building e; this writes
    # only deg's partial-agg output). At web scale where node state
    # outgrows broadcast, hash-partition edges and deg on src once
    # and both this join and the iteration co-locate.
    # At high iteration counts, additionally .repartition("dst")
    # before the checkpoint: the per-iteration groupBy(dst) partial
    # aggregate then combines fully map-side (~|nodes| records per
    # iteration instead of |nodes| x #partitions). Measured at sf0.1
    # the repartition's own 2.4M-record shuffle only amortizes past
    # ~8 iterations, so the 3-iteration default skips it.
    e = edges.join(F.broadcast(deg), "src").localCheckpoint()
    n_edges = e.count()
    npart = max(1, min(32, n_edges // 100_000 + 1))
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(npart))
    try:
        # the node set must cover BOTH endpoints: sources come free as
        # deg's group keys, but a node appearing only as a destination
        # (a sink in a directed graph) still accumulates rank and must
        # appear in the result — building nodes from src alone would
        # silently drop it (and disagree with the dst-keyed oracle)
        nodes = (
            deg.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
            .localCheckpoint()
        )
        pr = nodes.withColumn("pr", F.lit(1.0))
        for it in range(iters):
            # rank state is node-sized (orders of magnitude below the
            # edge list) — broadcast it so the edge side never moves;
            # the only exchange per iteration is the partial-aggregated
            # contribution sum, node-sized after map-side combine
            contrib = e.join(F.broadcast(pr), e.src == pr.node).select(
                F.col("dst").alias("node"),
                (F.col("pr") / F.col("deg"))
                .cast("decimal(20,12)")
                .alias("c"),
            )
            recv = contrib.groupBy("node").agg(F.sum("c").alias("s"))
            pr = nodes.join(recv, "node", "left").select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping)
                    * F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                ).alias("pr"),
            )
            if (it + 1) % ckpt_every == 0 and it != iters - 1:
                pr = pr.localCheckpoint()
        return pr
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
