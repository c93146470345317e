"""Strongly connected components (algos/scc.py) on hand-built directed
graphs, cross-checked against an independent pure-Python Tarjan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphlite_spark.algos.scc import (
    conversation_loop_edges,
    strongly_connected_components,
)


def _run(spark, n, edges, **kw):
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "src long, dst long"
    )
    if not edges:
        e = e.where(F.lit(False))
    out = strongly_connected_components(v, e, **kw)
    return {r["id"]: r["scc"] for r in out.collect()}


def _tarjan(n, edges):
    """Iterative Tarjan; returns {v: min id of its SCC}."""
    adj = {v: [] for v in range(n)}
    for a, b in edges:
        if a != b:
            adj[a].append(b)
    index = {}
    low = {}
    on = set()
    stack = []
    label = {}
    counter = [0]
    for root in range(n):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on.add(v)
            recursed = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recursed = True
                    break
                elif w in on:
                    low[v] = min(low[v], index[w])
            if recursed:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    label[w] = m
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return label


def test_scc_two_cycles_one_way_bridge(spark):
    # cycle {0,1,2} -> cycle {3,4}: bridge is one-way, so two SCCs
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3)]
    got = _run(spark, 5, edges)
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3}


def test_scc_dag_all_singletons(spark):
    # chain DAG: undirected CC would merge everything; SCC must not.
    # also exercises the class-split path (phase 1 assigns only part)
    edges = [(i, i + 1) for i in range(9)]
    got = _run(spark, 10, edges)
    assert got == {v: v for v in range(10)}


def test_scc_self_loops_and_duplicates_ignored(spark):
    edges = [(0, 0), (1, 2), (2, 1), (1, 2), (3, 3)]
    got = _run(spark, 4, edges)
    assert got == {0: 0, 1: 1, 2: 1, 3: 3}


def test_scc_cycle_with_tails(spark):
    # in-tail 5->0, cycle {0,1,2}, out-tail 2->3->4: tails stay singleton
    edges = [(5, 0), (0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    got = _run(spark, 6, edges)
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5}


def test_scc_empty_edges(spark):
    got = _run(spark, 3, [])
    assert got == {0: 0, 1: 1, 2: 2}


def test_scc_matches_tarjan_on_hash_graph(spark):
    # deterministic pseudo-random digraph: edges from a fixed congruence
    n = 40
    edges = []
    for v in range(n):
        for j in range(3):
            w = (v * 17 + j * 29 + 7) % n
            edges.append((v, w))
    # add a few long back-edges to create multi-vertex SCCs
    edges += [(35, 2), (20, 1), (39, 0)]
    got = _run(spark, n, edges)
    assert got == _tarjan(n, edges)


def test_scc_nested_classes_need_multiple_phases(spark):
    # DAG of three 2-cycles a->b->c: phase 1 assigns the minimum class;
    # survivors re-peel — exercises the intra-class edge filter
    edges = [
        (0, 1), (1, 0),
        (2, 3), (3, 2),
        (4, 5), (5, 4),
        (1, 2), (3, 4),
    ]
    got = _run(spark, 6, edges)
    assert got == {0: 0, 1: 0, 2: 2, 3: 2, 4: 4, 5: 4}


def test_conversation_loop_edges(spark):
    v = spark.createDataFrame(
        [(0, "a", 0), (1, "a", 1), (2, "a", 2), (3, "b", 0), (4, "c", 0),
         (5, "c", 1)],
        "id long, conv_id string, turn_idx int",
    )
    got = {(r["src"], r["dst"])
           for r in conversation_loop_edges(v).collect()}
    # single-turn conversation b contributes no closure edge
    assert got == {(2, 0), (5, 4)}


def test_scc_max_rounds_cap_warns(spark):
    # a 20-chain with closure needs ~log2(20) rounds; max_rounds=1 binds
    edges = [(i, i + 1) for i in range(19)] + [(19, 0)]
    with pytest.warns(UserWarning, match="max_rounds|max_phases"):
        _run(spark, 20, edges, max_rounds=1, max_phases=2)
