"""bounded_cheapest_paths (min-plus Bellman-Ford) — brute-force
differential + the catalog entry's non-degeneracy contract."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from power_generation_etl_spark.operators.graph import bounded_cheapest_paths


def _brute(edges: list[tuple[int, int, int]], src: int, k: int):
    """Enumerate every path of <= k edges from src; lexicographic
    (cost, hops) min per destination."""
    best: dict[int, tuple[int, int]] = {}
    frontier = [(src, 0, 0)]
    for _ in range(k):
        nxt = []
        for node, cost, hops in frontier:
            for u, v, w in edges:
                if u == node:
                    cand = (cost + w, hops + 1)
                    if v not in best or cand < best[v]:
                        best[v] = cand
                    nxt.append((v, cost + w, hops + 1))
        frontier = nxt
    best.pop(src, None)
    return sorted((v, c, h) for v, (c, h) in best.items())


def test_brute_force_differential(spark):
    # Deterministic pseudo-random sparse digraph: 12 nodes, costs where
    # cheap 2-3-hop detours beat expensive direct edges.
    edges = []
    for i in range(12):
        for j in range(12):
            if i == j:
                continue
            h = (i * 31 + j * 17) % 23
            if h < 7:  # ~30% density
                edges.append((i, j, 1 + (h * h * 13) % 97))
    df = spark.createDataFrame(edges, "u bigint, v bigint, w bigint")
    got = sorted(
        tuple(r) for r in bounded_cheapest_paths(df, source_id=0, k=4).collect()
    )
    assert got == _brute(edges, 0, 4)


def test_multihop_beats_direct(spark):
    edges = spark.createDataFrame(
        [(0, 1, 100), (0, 2, 1), (2, 1, 1)], "u bigint, v bigint, w bigint"
    )
    got = {
        r["id"]: (r["cost"], r["hops"])
        for r in bounded_cheapest_paths(edges, source_id=0, k=2).collect()
    }
    assert got[1] == (2, 2)  # detour through 2 beats the direct edge
    assert got[2] == (1, 1)


def test_k_bounds_rejected(spark):
    edges = spark.createDataFrame([(0, 1, 1)], "u bigint, v bigint, w bigint")
    with pytest.raises(ValueError):
        bounded_cheapest_paths(edges, source_id=0, k=0)
    with pytest.raises(ValueError):
        bounded_cheapest_paths(edges, source_id=0, k=9)


def test_catalog_entry_has_multihop_routes(spark, sf_dir):
    """The trade-route entry only evidences min-plus relaxation if
    some destination's cheapest route uses >= 2 edges at the shipped
    corpus — pin it so a corpus/sparsification change can't silently
    degenerate the entry to 1-hop lookups."""
    from power_generation_etl_spark.plans.scale_queries import (
        cheapest_trade_route,
    )

    rows = cheapest_trade_route(spark, sf_dir).collect()
    assert rows, "entry empty at the shipped corpus"
    assert any(r["hops"] >= 2 for r in rows)
