"""Bounded-distance sampled Brandes betweenness vs a Python reference."""

from __future__ import annotations

from collections import deque

from pyspark.sql import functions as F

from graphlite_spark.algos.betweenness import MICRO, betweenness_sampled
from tests.reference_sim import random_digraph


def py_betweenness(edges, n, sources, max_depth):
    """Textbook Brandes with the same hop bound and the same per-term
    integer micro-unit division as the Spark/DuckDB implementations."""
    adj: dict[int, list[int]] = {}
    for s, d in sorted(set(edges)):
        if s != d:
            adj.setdefault(s, []).append(d)
    b = {i: 0 for i in range(n)}
    for src in sources:
        dist = {src: 0}
        sigma = {src: 1}
        order = [src]
        dq = deque([src])
        while dq:
            u = dq.popleft()
            if dist[u] == max_depth:
                continue
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sigma[w] = 0
                    order.append(w)
                    dq.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        delta = {v: 0 for v in order}
        for u in reversed(order):
            if dist[u] in (0, max_depth):
                continue  # sources excluded; deepest level has delta 0
            acc = 0
            for w in adj.get(u, ()):
                if dist.get(w) == dist[u] + 1:
                    acc += (sigma[u] * (MICRO + delta[w])) // sigma[w]
            delta[u] = acc
            b[u] += acc
    return b


def _run(spark, edges, n, sources, max_depth):
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    v = spark.range(n).select("id")
    got = betweenness_sampled(v, e, sources, max_depth=max_depth)
    return {r["id"]: r["betweenness_micros"] for r in got.collect()}


def test_betweenness_chain(spark):
    # 0->1->2->3->4: from source 0 with depth 4, interior vertices lie
    # on every path; delta(3)=1e6 (one path to 4), delta(2)=1e6+delta(3),
    # delta(1)=1e6+delta(2)
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    got = _run(spark, edges, 5, [0], 4)
    assert got == {0: 0, 1: 3 * MICRO, 2: 2 * MICRO, 3: MICRO, 4: 0}


def test_betweenness_diamond_split_paths(spark):
    # 0->{1,2}->3->4: sigma(3)=2; each of 1,2 carries half the
    # dependency of 3 — the sigma ratio path
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    got = _run(spark, edges, 5, [0], 4)
    # delta(3) = 1e6 (to 4); delta(1) = (1*(1e6+1e6))//2 = 1e6
    assert got[3] == MICRO and got[1] == MICRO and got[2] == MICRO
    assert got[0] == 0 and got[4] == 0


def test_betweenness_depth_truncation(spark):
    # depth 2 on the 5-chain: only paths of length <= 2 count
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    got = _run(spark, edges, 5, [0], 2)
    assert got == {0: 0, 1: MICRO, 2: 0, 3: 0, 4: 0}


def test_betweenness_bruteforce_random(spark):
    edges = random_digraph(40, 120, seed=37)
    sources = [0, 5, 9, 17]
    want = py_betweenness(edges, 40, sources, 4)
    got = _run(spark, edges, 40, sources, 4)
    assert got == want


def test_betweenness_multiarc_selfloop_collapse(spark):
    # duplicate arcs and self-loops must not inflate sigma
    edges = [(0, 1), (0, 1), (1, 1), (1, 2), (2, 3)]
    got = _run(spark, edges, 4, [0], 3)
    assert got == {0: 0, 1: 2 * MICRO, 2: MICRO, 3: 0}
