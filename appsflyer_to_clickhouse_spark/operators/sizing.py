"""Shuffle-partition sizing for graph-shaped fixpoint loops.

The candidate graph (LSH pairs, co-purchase edges) is orders of
magnitude smaller than the corpus, so running its iteration shuffles
at the session's batch width is pure scheduling overhead (measured
~19 s -> ~4 s at sf0.1 for connected components). One definition so a
tuning change reaches every iterative operator — this rule previously
lived verbatim in three places (connected_components + both pagerank
branches).
"""

from __future__ import annotations


def graph_partitions(
    n_edges: int, rows_per_partition: int = 100_000, cap: int = 32
) -> int:
    """Partition count proportional to the edge list: ~``rows_per_
    partition`` edges per task, at least 1, capped at ``cap`` (the
    local-mode core count; a cluster deployment raises the cap to its
    parallelism). At 100 TB the GRAPH is the working set of these
    loops, so sizing scales with it — not with the corpus."""
    return max(1, min(cap, n_edges // rows_per_partition + 1))
