"""Eccentricity from the MS-BFS aggregator timeline
(algos/centrality.eccentricity) on hand-built graphs."""

from __future__ import annotations

from graphlite_spark.algos.centrality import eccentricity


def _run(spark, n, edges, sources, **kw):
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )
    out = eccentricity(v, e, sources=sources, **kw)
    return {
        r["source"]: (r["eccentricity"], r["reached"]) for r in out.collect()
    }


def test_ecc_directed_path(spark):
    # 0->1->2->3: ecc(0)=3 reaching all 4; the sink reaches only itself
    edges = [(0, 1), (1, 2), (2, 3)]
    got = _run(spark, 4, edges, sources=[0, 3])
    assert got == {0: (3, 4), 3: (0, 1)}


def test_ecc_branching(spark):
    # star-out plus a 2-hop tail: ecc(0) = 2, reaches 5 of 6
    edges = [(0, 1), (0, 2), (0, 3), (3, 4)]
    got = _run(spark, 6, edges, sources=[0, 5])
    assert got == {0: (2, 5), 5: (0, 1)}


def test_ecc_horizon_cap(spark):
    # 6-chain but only a 2-hop horizon (fixed_supersteps=3): capped at 2
    edges = [(i, i + 1) for i in range(5)]
    got = _run(spark, 6, edges, sources=[0], fixed_supersteps=3)
    assert got == {0: (2, 3)}


def test_ecc_cycle(spark):
    # directed 4-cycle: every vertex reaches all others, ecc = 3
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    got = _run(spark, 4, edges, sources=[0, 2])
    assert got == {0: (3, 4), 2: (3, 4)}
