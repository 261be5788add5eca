"""connected_components: min-label propagation must converge to the
component-min label on multi-component graphs, including chains whose
diameter forces several propagation rounds."""

from __future__ import annotations

from appsflyer_to_clickhouse_spark.operators.dedup import connected_components


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    return {
        (r.id, r.component) for r in connected_components(df).collect()
    }


def test_two_components_and_chain(spark):
    # component {1..5} as a chain (diameter 4) + component {10, 11}
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)]
    got = _cc(spark, pairs)
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (10, 10), (11, 10)}


def test_cycle_and_cross_links(spark):
    # cycle 1-2-3-1 merged with 4 via 3-4; separate pair (7, 9)
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (7, 9)]
    got = _cc(spark, pairs)
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (7, 7), (9, 7)}


def test_min_id_not_always_first_column(spark):
    # min id appears only on the id_b side; label must still be the min
    pairs = [(5, 3), (3, 9)]
    got = _cc(spark, pairs)
    assert got == {(3, 3), (5, 3), (9, 3)}


def test_string_ids_converge_correctly(spark):
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
        for r in connected_components(df).collect()
    }
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"), ("d", "a"),
        ("x", "x"), ("y", "x"),
    }
