"""connected_components: both engines (min-label propagation and the
O(log n) large-star/small-star rewrite) must converge to the
component-min label on multi-component graphs, including chains whose
diameter forces several propagation rounds — plus the round-count pin
that separates them: on a path graph min-label needs DIAMETER rounds,
the star rewrite O(log n) (VERDICT r5 task 4)."""

from __future__ import annotations

import math

import pytest

from appsflyer_to_clickhouse_spark.operators.dedup import (
    connected_components,
    connected_components_minlabel,
    connected_components_star,
)

ALGOS = ["star", "minlabel"]


def _cc(spark, pairs, algorithm):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    return {
        (r.id, r.component)
        for r in connected_components(df, algorithm=algorithm).collect()
    }


@pytest.mark.parametrize("algo", ALGOS)
def test_two_components_and_chain(spark, algo):
    # component {1..5} as a chain (diameter 4) + component {10, 11}
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)]
    got = _cc(spark, pairs, algo)
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (10, 10), (11, 10)}


@pytest.mark.parametrize("algo", ALGOS)
def test_cycle_and_cross_links(spark, algo):
    # cycle 1-2-3-1 merged with 4 via 3-4; separate pair (7, 9)
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (7, 9)]
    got = _cc(spark, pairs, algo)
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (7, 7), (9, 7)}


@pytest.mark.parametrize("algo", ALGOS)
def test_min_id_not_always_first_column(spark, algo):
    # min id appears only on the id_b side; label must still be the min
    pairs = [(5, 3), (3, 9)]
    got = _cc(spark, pairs, algo)
    assert got == {(3, 3), (5, 3), (9, 3)}


@pytest.mark.parametrize("algo", ALGOS)
def test_string_ids_converge_correctly(spark, algo):
    """Regression: the old sum(label) convergence check was NULL over
    string labels (non-numeric cast), so NULL == NULL declared
    convergence after ONE iteration and a diameter-2+ chain came back
    split. The changed-count check is exact for ids of any type."""
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "id_a string, id_b string",
    )
    got = {
        (r.id, r.component)
        for r in connected_components(df, algorithm=algo).collect()
    }
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"), ("d", "a"),
        ("x", "x"), ("y", "x"),
    }


@pytest.mark.parametrize("algo", ALGOS)
def test_empty_pair_list(spark, algo):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df, algorithm=algo).count() == 0


def test_star_rounds_logarithmic_on_path_graph(spark):
    """THE scale pin (VERDICT r5 task 4): a path graph 0-1-...-n-1 has
    diameter n-1, the worst shape for label propagation — min-label
    needs ~n rounds to drag 0's label to the far end (verified below
    on a short path), while the star rewrite must contract it in
    O(log n) rounds. n=128: the pin allows 2*log2(n)+2 = 16 rounds;
    a linear-round regression would need 127."""
    n = 128
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    stats: dict = {}
    labels = {
        (r.id, r.component)
        for r in connected_components_star(
            path, max_iter=2 * int(math.log2(n)) + 2, stats=stats
        ).collect()
    }
    assert labels == {(i, 0) for i in range(n)}
    assert stats["rounds"] <= 2 * int(math.log2(n)) + 2
    # differential twin on a short path: min-label's round count IS
    # the diameter (8 nodes -> 7 propagation rounds + 1 to observe
    # fixpoint), pinning that the star pin above is a real contrast
    short = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], "id_a long, id_b long"
    )
    mstats: dict = {}
    mlabels = {
        (r.id, r.component)
        for r in connected_components_minlabel(
            short, max_iter=20, stats=mstats
        ).collect()
    }
    assert mlabels == {(i, 0) for i in range(8)}
    assert mstats["rounds"] >= 7  # diameter-bound propagation


def test_unknown_algorithm_raises(spark):
    df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="algorithm"):
        connected_components(df, algorithm="bogus")


def test_star_round_growth_curve_is_logarithmic(spark):
    """Three-point growth curve (the repo's standard scale-evidence
    shape): quadrupling a path graph's length must add only a constant
    handful of star rounds (~log4 = 2, plus rewrite slack), never
    quadruple them — the empirical form of the O(log n) claim that a
    single-size pin can't distinguish from O(n/c)."""
    import math

    rounds = {}
    for n in (64, 256, 1024):
        path = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
        )
        stats: dict = {}
        labels = connected_components_star(
            path, max_iter=2 * int(math.log2(n)) + 2, stats=stats
        )
        assert labels.filter("component != 0").count() == 0
        rounds[n] = stats["rounds"]
    # each 4x size step adds at most ~2xlog4 + slack rounds, and the
    # absolute counts stay under the 2*log2(n)+2 cap enforced above
    assert rounds[256] - rounds[64] <= 5, rounds
    assert rounds[1024] - rounds[256] <= 5, rounds


def _union_find(pairs):
    """Driver-side exact ground truth for small graphs."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_star_and_minlabel_agree_on_random_graphs(spark):
    """Randomized differential: on seeded random graphs (mixed shapes:
    sparse forests, a dense blob, a chain-heavy mix) BOTH engines must
    match an exact driver-side union-find — the adversarial sweep for
    rewrite bugs hand-picked fixtures can't cover (e.g. a rewrite that
    loses an edge only when a mid-id node bridges two low-id stars)."""
    import random

    rng = random.Random(0x5CC7)
    # one graph per adversarial SHAPE (sparse forest, dense blob,
    # chain-heavy) — r11 dropped the two redundant mid-density trials
    # for suite wall time; each kept trial runs both engines
    for trial, (n, m) in enumerate([(30, 18), (25, 60), (60, 55)]):
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        truth = _union_find(pairs)
        df = spark.createDataFrame(pairs, "id_a long, id_b long")
        for algo in ALGOS:
            got = {
                (r.id, r.component)
                for r in connected_components(df, algorithm=algo).collect()
            }
            want = set(truth.items())
            assert got == want, f"trial {trial} algo {algo}"
