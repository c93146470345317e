"""Boruvka MSF vs Kruskal (plain python, same (w, lo, hi) total order) —
the two classical algorithms must produce the identical unique forest."""

from __future__ import annotations

import hashlib

from graphlite_spark.algos.msf import boruvka_msf


def _kruskal(n_ids, edges):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for w, lo, hi in sorted(edges):
        a, b = find(lo), find(hi)
        if a != b:
            parent[a] = b
            out.add((lo, hi, w))
    return out


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def test_boruvka_matches_kruskal_random(spark):
    # deterministic pseudo-random multigraph incl. parallel edges,
    # self-loops, duplicate weights and an isolated vertex
    raw = []
    for i in range(120):
        a = _h48(f"e:{i}:a") % 30
        b = _h48(f"e:{i}:b") % 30
        w = 1 + _h48(f"e:{i}:w") % 7  # deliberately FEW weight values
        raw.append((a, b, w))
    ids = list(range(31))  # 30 is isolated
    v = spark.createDataFrame([(i,) for i in ids], "id long")
    e = spark.createDataFrame(raw, "src long, dst long, w long")
    got = {
        (r["lo"], r["hi"], r["w"])
        for r in boruvka_msf(v, e, weight_col="w").collect()
    }
    # collapse to the canonical undirected min-weight simple graph
    simple = {}
    for a, b, w in raw:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        simple[k] = min(simple.get(k, w), w)
    want = _kruskal(ids, [(w, lo, hi) for (lo, hi), w in simple.items()])
    assert got == want
    # forest property: |MSF| = V - #components
    comps = len(ids) - len(want)
    assert comps >= 1


def test_boruvka_empty_and_single_edge(spark):
    v = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    e0 = spark.createDataFrame([], "src long, dst long, w long")
    assert boruvka_msf(v, e0).count() == 0
    e1 = spark.createDataFrame([(0, 1, 5)], "src long, dst long, w long")
    assert [
        (r["lo"], r["hi"], r["w"]) for r in boruvka_msf(v, e1).collect()
    ] == [(0, 1, 5)]
