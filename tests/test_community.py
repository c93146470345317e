"""Louvain one-round refinement: exact python replay of the integer gain
rule + a hand-checked merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphlite_spark.algos.community import louvain_move
from tests.reference_sim import random_digraph
from tests.test_algorithms import make_graph


def _replay(edges, n, labels):
    und = {i: set() for i in range(n)}
    for s, d in edges:
        if s != d:
            und[s].add(d); und[d].add(s)
    deg = {i: len(und[i]) for i in range(n)}
    m2 = sum(deg.values())
    strength = {}
    for i in range(n):
        strength[labels[i]] = strength.get(labels[i], 0) + deg[i]
    out = {}
    for v in range(n):
        a = labels[v]
        evc = {}
        for w in und[v]:
            evc[labels[w]] = evc.get(labels[w], 0) + 1
        ea = evc.get(a, 0)
        best, best_score = None, 0
        for c in sorted(k for k in evc if k != a):
            score = m2 * (evc[c] - ea) - deg[v] * (
                strength[c] - strength[a] + deg[v]
            )
            if score > best_score:
                best, best_score = c, score
        out[v] = best if best is not None else a
    return out


def test_louvain_move_replay(spark):
    edges, n = random_digraph(100, 400, seed=7), 100
    labels = {i: i % 7 for i in range(n)}
    v, e = make_graph(spark, edges, n)
    ldf = spark.createDataFrame(list(labels.items()), "id long, label long")
    got = {r["id"]: r["label"] for r in louvain_move(e, ldf).collect()}
    assert got == _replay(edges, n, labels)


def test_louvain_move_merges_split_triangle(spark):
    # triangle {0,1,2} split across two communities + far pair {3,4}:
    # vertex 2 must join the {0,1} community (only positive-gain move)
    edges = [(0, 1), (1, 2), (0, 2), (3, 4)]
    labels = [(0, 10), (1, 10), (2, 20), (3, 30), (4, 30)]
    v, e = make_graph(spark, edges, 5)
    ldf = spark.createDataFrame(labels, "id long, label long")
    got = {r["id"]: r["label"] for r in louvain_move(e, ldf).collect()}
    assert got[2] == 10
    assert got[0] == 10 and got[1] == 10
    assert got[3] == 30 and got[4] == 30
