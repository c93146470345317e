"""Deterministic random walks vs a Python simulation of the same
hash-pick rule."""

from __future__ import annotations

import hashlib

from graphlite_spark.algos.walks import random_walks
from tests.reference_sim import random_digraph


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


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
