"""property_path (operators/graph.py) — BFS semantics vs hand-computed
paths: min-hop labeling, cycle termination, hop cap, include_start."""

import pytest

from face_hunter_spark.operators.graph import property_path


@pytest.fixture(scope="module")
def edges(spark):
    # a -> b -> c -> a (cycle), b -> d, d -> e, plus a shortcut a -> d
    rows = [("a", "b"), ("b", "c"), ("c", "a"), ("b", "d"),
            ("d", "e"), ("a", "d")]
    return spark.createDataFrame(rows, "src string, dst string")


def test_min_hops_and_shortcut(edges):
    got = {r.node: r.hops for r in property_path(edges, "a", 4).collect()}
    # d via the shortcut (1), not via b (2); start excluded though the
    # cycle returns to it at hop 3
    assert got == {"b": 1, "d": 1, "c": 2, "e": 2}


def test_hop_cap(edges):
    got = {r.node: r.hops for r in property_path(edges, "a", 1).collect()}
    assert got == {"b": 1, "d": 1}


def test_include_start(edges):
    got = {r.node: r.hops
           for r in property_path(edges, "a", 4, include_start=True).collect()}
    assert got["a"] == 0 and got["e"] == 2


def test_early_exit_on_exhausted_frontier(edges):
    # e is a sink: frontier empties after hop 0 regardless of the cap
    assert property_path(edges, "e", 10).count() == 0


def test_unknown_start_is_empty(edges):
    assert property_path(edges, "zzz", 3).count() == 0


def test_duplicate_edges_collapse(spark):
    e = spark.createDataFrame(
        [("x", "y")] * 5, "src string, dst string"
    )
    got = [(r.node, r.hops) for r in property_path(e, "x", 3).collect()]
    assert got == [("y", 1)]


def test_max_hops_validation(edges):
    with pytest.raises(ValueError):
        property_path(edges, "a", 0)
