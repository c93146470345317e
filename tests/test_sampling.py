"""k-hop neighbor sampling vs a Python replay of the identical hash-rank
rule, including a hub whose adjacency must be truncated to the fanout."""

from __future__ import annotations

import hashlib

import pytest

from graphlite_spark.algos.sampling import sample_neighbors
from tests.reference_sim import random_digraph


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def test_sample_neighbors_bruteforce(spark):
    edges = random_digraph(30, 70, seed=23)
    # graft a hub: vertex 0 connected to everyone — its expansion must be
    # truncated to the fanout, never the full adjacency
    edges = list(set(edges) | {(0, i) for i in range(1, 30)})
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    seeds = spark.range(6).select("id")
    fanouts = (3, 2)
    got = {(r["seed"], r["hop"], r["src"], r["dst"])
           for r in sample_neighbors(e, seeds, fanouts=fanouts).collect()}

    nbrs: dict[int, set[int]] = {}
    for s, d in edges:
        if s != d:
            nbrs.setdefault(s, set()).add(d)
            nbrs.setdefault(d, set()).add(s)
    want = set()
    for seed in range(6):
        frontier = {seed}
        for h, f in enumerate(fanouts, start=1):
            nxt = set()
            for u in sorted(frontier):
                ranked = sorted(
                    nbrs.get(u, ()),
                    key=lambda v: (_h48(f"{seed}:{h}:{u}:{v}"), v),
                )[:f]
                for v in ranked:
                    want.add((seed, h, u, v))
                    nxt.add(v)
            frontier = nxt
    assert got == want
    # the hub's hop-1 expansion for seed 0 is exactly fanout-sized
    assert sum(1 for (s, h, u, _) in got if s == 0 and h == 1 and u == 0) == 3


def test_sample_neighbors_bad_fanouts(spark):
    e = spark.createDataFrame([(0, 1, 1.0)],
                              "src long, dst long, weight double")
    seeds = spark.range(1).select("id")
    with pytest.raises(ValueError):
        sample_neighbors(e, seeds, fanouts=())
    with pytest.raises(ValueError):
        sample_neighbors(e, seeds, fanouts=(2, 0))
