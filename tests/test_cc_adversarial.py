"""Adversarial-depth gate for the connected-components twins.

Min-label propagation needs diameter rounds, so a long-chain graph
(diameter > max_iter) must trigger its loud non-convergence warning;
the large-star/small-star variant is the documented upgrade path and
must converge to exactly the labels a driver-side union-find (the
ground truth both operators claim to distribute) produces on the same
graph. Pins both the warning path and the star upgrade (VERDICT r02
next-round #8).
"""

from __future__ import annotations

import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_invoice_stream_analysis_spark.operators import dedup as DD  # noqa: E402

CHAIN_N = 60  # diameter 59 — well past propagation's max_iter=25 default


def _ground_truth(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find component labels (min id per component)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _chain_edges() -> list[tuple[int, int]]:
    # shuffled ids so min-id canonical labels aren't trivially adjacent
    ids = list(range(1000, 1000 + CHAIN_N))
    random.Random(7).shuffle(ids)
    return list(zip(ids, ids[1:]))


def _random_edges() -> list[tuple[int, int]]:
    rng = random.Random(11)
    return [
        (rng.randrange(0, 200), rng.randrange(0, 200)) for _ in range(150)
    ] + _chain_edges()


def _labels(df) -> dict[int, int]:
    return {r["node"]: r["component"] for r in df.collect()}


def test_propagation_warns_past_diameter(spark):
    e = spark.createDataFrame(_chain_edges(), "id_a long, id_b long")
    with pytest.warns(RuntimeWarning, match="did not reach"):
        DD.connected_components(e, max_iter=5).collect()


def test_star_converges_on_deep_chain(spark):
    edges = _chain_edges()
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    got = _labels(DD.connected_components_star(e))
    assert got == _ground_truth(edges)


def test_twins_match_union_find_on_mixed_graph(spark):
    """Random graph + embedded deep chain: star (default budget) and
    propagation (budget raised past the diameter) both equal
    union-find — i.e. the twins disagree only when propagation's
    budget is exhausted, and then it says so."""
    edges = _random_edges()
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    truth = _ground_truth(edges)
    assert _labels(DD.connected_components_star(e)) == truth
    assert _labels(DD.connected_components(e, max_iter=CHAIN_N + 2)) == truth
