"""Deterministic random walks vs a Python simulation of the same
hash-pick rule."""

from __future__ import annotations

import hashlib

from graphlite_spark.algos.walks import node2vec_walks, random_walks
from tests.reference_sim import random_digraph


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _und_nbrs(edges) -> dict[int, set[int]]:
    nbrs: dict[int, set[int]] = {}
    for s, d in edges:
        if s != d:
            nbrs.setdefault(s, set()).add(d)
            nbrs.setdefault(d, set()).add(s)
    return nbrs


def test_random_walks_bruteforce(spark):
    edges = random_digraph(30, 60, seed=13)
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    v = spark.range(30).select("id")
    got = {(r["walk_id"], r["step"]): r["vertex"]
           for r in random_walks(v, e, walks_per_vertex=2,
                                 walk_length=5).collect()}
    nbrs: dict[int, set[int]] = {}
    for s, d in edges:
        if s != d:
            nbrs.setdefault(s, set()).add(d)
            nbrs.setdefault(d, set()).add(s)
    want = {}
    for vid in range(30):
        for w in (0, 1):
            walk_id = vid * 2 + w
            cur = vid
            want[(walk_id, 0)] = cur
            for t in range(1, 6):
                ns = sorted(nbrs.get(cur, ()))
                if not ns:
                    break  # sink: walk ends early
                cur = ns[_h48(f"{walk_id}:{t}") % len(ns)]
                want[(walk_id, t)] = cur
    assert got == want
    # every length-5 walk from a non-isolated vertex has 6 rows
    full = [wid for (wid, st) in want if st == 5]
    assert full, "expected at least one full-length walk"


def test_random_walks_long_lineage_truncated(spark):
    """walk_length=64: the in-loop localCheckpoint every 8 steps keeps the
    analyzed plan bounded (without it the 64-step chain of joins+unions is
    hundreds of operators) — and truncation must not change the corpus."""
    edges = random_digraph(20, 45, seed=5)
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    v = spark.range(20).select("id")
    out = random_walks(v, e, walks_per_vertex=1, walk_length=64,
                       checkpoint_every=8)
    got = {(r["walk_id"], r["step"]): r["vertex"] for r in out.collect()}
    nbrs = _und_nbrs(edges)
    want = {}
    for vid in range(20):
        cur = vid
        want[(vid, 0)] = cur
        for t in range(1, 65):
            ns = sorted(nbrs.get(cur, ()))
            if not ns:
                break
            cur = ns[_h48(f"{vid}:{t}") % len(ns)]
            want[(vid, t)] = cur
    assert got == want
    # the returned frame is eagerly checkpointed: its plan is a scan, not
    # the 64-step join chain (lineage truncation is observable)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan.splitlines()) < 10, plan[:500]


def test_node2vec_walks_bruteforce(spark):
    """Second-order bias vs a Python simulation of the identical integer
    cumulative-weight rule (return 0.5e6 / distance-1 1e6 / distance-2
    2e6)."""
    ret, d1, io = 500_000, 1_000_000, 2_000_000
    edges = random_digraph(30, 70, seed=11)
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    v = spark.range(30).select("id")
    got = {(r["walk_id"], r["step"]): r["vertex"]
           for r in node2vec_walks(v, e, walks_per_vertex=1, walk_length=4,
                                   return_micros=ret,
                                   inout_micros=io).collect()}
    nbrs = _und_nbrs(edges)
    want = {}
    for vid in range(30):
        cur = vid
        want[(vid, 0)] = cur
        ns = sorted(nbrs.get(cur, ()))
        if not ns:
            continue
        prev, cur = cur, ns[_h48(f"{vid}:1") % len(ns)]
        want[(vid, 1)] = cur
        for t in range(2, 5):
            ns = sorted(nbrs.get(cur, ()))
            if not ns:
                break
            wts = [ret if x == prev
                   else d1 if x in nbrs.get(prev, ())
                   else io
                   for x in ns]
            r = _h48(f"{vid}:{t}") % sum(wts)
            cum = 0
            for x, wt in zip(ns, wts):
                if cum <= r < cum + wt:
                    pick = x
                    break
                cum += wt
            prev, cur = cur, pick
            want[(vid, t)] = cur
    assert got == want
    # the bias must actually bite: same machinery and hash draws with
    # uniform weights (p=q=1) must yield a different corpus than the
    # biased run on this graph
    uni = {(r["walk_id"], r["step"]): r["vertex"]
           for r in node2vec_walks(v, e, walks_per_vertex=1, walk_length=4,
                                   return_micros=d1,
                                   inout_micros=d1).collect()}
    assert any(want.get(k) != uni.get(k) for k in want)


def test_node2vec_rejects_zero_length(spark):
    import pytest

    e = spark.createDataFrame([(0, 1, 1.0)],
                              "src long, dst long, weight double")
    v = spark.range(2).select("id")
    with pytest.raises(ValueError):
        node2vec_walks(v, e, walk_length=0)
    with pytest.raises(ValueError):
        node2vec_walks(v, e, walks_per_vertex=0)


def test_node2vec_max_degree_cap(spark):
    """The hub knob: max_degree deterministically caps each vertex's
    neighbor list (hash-rank sample) so a hub can't dominate candidate
    scoring.  With cap >= max degree the walks are IDENTICAL to the
    exact path; with a binding cap every traversed edge is one the
    capped adjacency kept, and the corpus is run-to-run deterministic."""
    # star: hub 0 -- {1..20}, plus a chain 1-2-3 so walks can leave
    edges = [(0, i) for i in range(1, 21)] + [(1, 2), (2, 3)]
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    v = spark.range(21).select("id")

    exact = {(r["walk_id"], r["step"], r["vertex"])
             for r in node2vec_walks(v, e, walks_per_vertex=1,
                                     walk_length=4).collect()}
    uncapped = {(r["walk_id"], r["step"], r["vertex"])
                for r in node2vec_walks(v, e, walks_per_vertex=1,
                                        walk_length=4,
                                        max_degree=100).collect()}
    assert uncapped == exact  # non-binding cap changes nothing

    capped1 = node2vec_walks(v, e, walks_per_vertex=1, walk_length=4,
                             max_degree=5).collect()
    capped2 = node2vec_walks(v, e, walks_per_vertex=1, walk_length=4,
                             max_degree=5).collect()
    s1 = {(r["walk_id"], r["step"], r["vertex"]) for r in capped1}
    s2 = {(r["walk_id"], r["step"], r["vertex"]) for r in capped2}
    assert s1 == s2  # deterministic under the cap

    # replicate the kept-neighbor rule and check every traversed edge
    # lies in the capped adjacency
    nbrs = _und_nbrs(edges)
    kept: dict[int, set[int]] = {}
    for s, ds in nbrs.items():
        ranked = sorted(ds, key=lambda d: (_h48(f"{s}:{d}"), d))
        kept[s] = set(ranked[:5])
    bywalk: dict[int, dict[int, int]] = {}
    for r in capped1:
        bywalk.setdefault(r["walk_id"], {})[r["step"]] = r["vertex"]
    for steps in bywalk.values():
        for t in range(1, max(steps) + 1):
            a, b = steps[t - 1], steps[t]
            assert b in kept[a], (a, b)
