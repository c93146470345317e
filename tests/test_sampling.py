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


def test_negative_edges_replay(spark):
    """Exact python replay: candidate = h48('neg:src:dst:slot') mod V,
    dropped iff self or a real (symmetrized) neighbor; nothing else is
    dropped and every surviving row matches the replay."""
    from pyspark.sql import functions as F

    from graphlite_spark.algos.sampling import negative_edges

    edges = random_digraph(25, 60, seed=9)
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    v = spark.range(25).select(F.col("id"))
    got = {(r["src"], r["dst"], r["slot"], r["neg_dst"])
           for r in negative_edges(e, v, k=3).collect()}

    sym = set()
    for s, d in edges:
        if s != d:
            sym.add((s, d))
            sym.add((d, s))
    want = set()
    for s, d in edges:
        for slot in range(3):
            nd = _h48(f"neg:{s}:{d}:{slot}") % 25
            if nd != s and (s, nd) not in sym:
                want.add((s, d, slot, nd))
    assert got == want
    # no sampled pair is a real edge or a self-loop
    assert all((s, nd) not in sym and nd != s for s, _, _, nd in got)
