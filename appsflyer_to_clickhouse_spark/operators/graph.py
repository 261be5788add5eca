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

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sizing import graph_partitions


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    ckpt_every: int = 1,
    repartition_at: int = 8,
    every_node_a_source: bool = False,
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

    Checkpoint cadence: every iteration's ``broadcast(pr)`` is built
    in its OWN job, and a broadcast build re-executes its input
    subtree — so within a chained (un-checkpointed) window, iteration
    k's broadcast re-runs iterations 1..k-1's edge joins all over
    again: the loop's total edge work is QUADRATIC in the window
    length. Checkpointing the node-sized pr every iteration caps each
    broadcast build at exactly one edge join (re-measured at sf0.1,
    iters=3: ckpt_every=4 ran 9-10 edge-scale jobs in 5.7-8.3 s /
    306 MB shuffled; ckpt_every=1 runs 3 in 4.0-5.9 s / 211 MB — the
    earlier 12.2 s per-iteration-checkpoint measurement predates the
    checkpointed-e/broadcast-pr layout and is superseded). The
    parameter stays for graphs where the rank state is large enough
    that the per-iteration materialization job dominates — raise it
    and pay the chained re-execution instead.

    ``every_node_a_source=True`` is a caller-supplied structural fact
    (e.g. a symmetrized undirected edge list): every node appears as a
    source, so the node set IS deg's key set and the edge-sized
    dst-distinct pass is skipped. Only a hint for work elision — a
    caller that misstates it would drop pure-sink nodes, so leave it
    False for genuinely directed graphs.
    """
    spark = edges.sparkSession
    # node-sized and consumed twice (the edge join AND the node set) —
    # materialize once instead of re-running the edge-sized degree
    # aggregation per consumer
    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).localCheckpoint()
    # deg is node-sized — the same broadcastability argument as the
    # rank state below. Broadcasting it means the edge list is NEVER
    # shuffled in this whole operator (measured at sf0.1: the SMJ
    # form wrote 125 MB / 13M shuffle records building e; this writes
    # only deg's partial-agg output). At web scale where node state
    # outgrows broadcast, hash-partition edges and deg on src once
    # and both this join and the iteration co-locate.
    # At high iteration counts (>= repartition_at), additionally
    # .repartition(npart, "dst") before the checkpoint: the
    # checkpointed LogicalRDD keeps its HashPartitioning(dst), the
    # broadcast join and the dst->node alias preserve it
    # (alias-aware output partitioning), so EVERY per-iteration
    # groupBy(node) runs exchange-free — the iteration loop does
    # ZERO shuffles instead of emitting ~|nodes| x #partitions
    # partial-agg records per iteration. The repartition's own
    # edge-sized shuffle is paid ONCE; measured at sf0.1 it
    # amortizes past ~8 iterations, so the 3-iteration default
    # skips it (plan shape pinned in tests/test_pagerank.py).
    ej = edges.join(F.broadcast(deg), "src")
    if iters >= repartition_at:
        # the repartition needs the edge count BEFORE building e —
        # this is the one branch that pays a full extra execution of
        # the caller's edge subplan for it.
        n_edges = edges.count()
        npart = graph_partitions(n_edges)
        # persist, NOT localCheckpoint: under AQE a checkpointed
        # LogicalRDD reports UnknownPartitioning (the adaptive plan's
        # final partitioning isn't known when the RDD handle is
        # captured), which would silently re-insert the per-iteration
        # exchange this layout exists to remove. InMemoryTableScan
        # keeps the cached plan's HashPartitioning.
        e = ej.repartition(npart, "dst").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        e.count()
    else:
        # SHORT runs checkpoint too: each iteration's broadcast(pr) is
        # its own JOB (broadcast exchanges materialize their subtree
        # when built, and cross-JOB reuse needs a materialized input —
        # ReuseExchange only dedupes within one execution), so a lazy e
        # makes iteration k's broadcast re-run the edge join k times
        # over. Measured at sf0.1 (cold stage cache, bench conditions):
        # lazy 24.5 s cold / ~15 s warm vs the checkpointed form's
        # ~9.5 s cold — the materialization job pays for itself on the
        # FIRST iteration's broadcast. Counting the CHECKPOINTED frame
        # is then free (no second execution of the edge subplan).
        e = ej.localCheckpoint()
        n_edges = e.count()
        npart = graph_partitions(n_edges)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(npart))
    nodes = None
    try:
        # the node set must cover BOTH endpoints: sources come free as
        # deg's group keys, but a node appearing only as a destination
        # (a sink in a directed graph) still accumulates rank and must
        # appear in the result — building nodes from src alone would
        # silently drop it (and disagree with the dst-keyed oracle)
        if every_node_a_source:
            # structural fact from the caller: sources cover the node
            # set, so skip the edge-sized dst-distinct pass entirely
            nodes = deg.select(F.col("src").alias("node"))
        else:
            nodes = (
                deg.select(F.col("src").alias("node"))
                .union(e.select(F.col("dst").alias("node")))
                .distinct()
            )
        if iters >= repartition_at:
            # persist nodes on the same hash(node) layout so the
            # per-iteration nodes-vs-recv join starts co-partitioned
            # wherever Catalyst's attribute dedup preserves the cached
            # partitioning (the node-sized exchanges it can't elide
            # are |nodes|-records each — small next to the partial-agg
            # saving pinned in tests/test_pagerank.py)
            nodes = nodes.repartition(npart, "node").persist(
                StorageLevel.MEMORY_AND_DISK
            )
            nodes.count()
        else:
            # short runs checkpoint nodes for the same per-broadcast
            # re-execution reason as e above: nodes feeds every
            # iteration's pr (hence every broadcast job) AND the final
            # left join.
            nodes = nodes.localCheckpoint()
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
        if iters >= repartition_at:
            # materialize the final ranks so the persisted loop state
            # can be released before returning
            pr = pr.localCheckpoint()
        return pr
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        if iters >= repartition_at:
            # release the edge-sized cache blocks on EVERY exit path —
            # an exception mid-iteration must not leak them for the
            # session's lifetime (unpersist on a frame that never
            # materialized is a harmless no-op)
            e.unpersist()
            if nodes is not None:
                nodes.unpersist()
