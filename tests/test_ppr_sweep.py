"""PPR sweep cut: per-prefix recount brute force (cut/vol recomputed
from scratch for every k against the engine's own PPR ranking) on a
two-cluster bridge graph where the best sweep cut is known."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphlite_spark.algos.pagerank import personalized_pagerank, ppr_sweep_cut
from tests.test_algorithms import make_graph


def test_ppr_sweep_cut_recount(spark):
    # two 5-cliques joined by a single bridge edge; source in clique A
    A = list(range(5))
    B = list(range(5, 10))
    edges = []
    for grp in (A, B):
        edges += [(u, v) for u in grp for v in grp if u != v]
    edges += [(0, 5), (5, 0)]
    n, L = 10, 8
    v, e = make_graph(spark, edges, n)

    got = {
        r["k"]: (r["cut"], r["vol"], r["conductance"])
        for r in ppr_sweep_cut(v, e, source=0, supersteps=8, top_l=L).collect()
    }
    assert set(got) == set(range(1, L + 1))

    # ranking exactly as the operator derives it
    res = personalized_pagerank(v, e, source=0, fixed_supersteps=8)
    ranked = [
        r["id"]
        for r in res.state.select(
            "id", F.round("value", 6).alias("rank")
        ).orderBy(F.col("rank").desc(), F.col("id").asc()).limit(L).collect()
    ]
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    deg = {i: sum(1 for p in und if i in p) for i in range(n)}
    vol_total = sum(deg.values())
    for k in range(1, L + 1):
        S = set(ranked[:k])
        cut = sum(1 for (a, b) in und if (a in S) != (b in S))
        vol = sum(deg[i] for i in S)
        phi = (
            0.0
            if min(vol, vol_total - vol) == 0
            else round(cut / min(vol, vol_total - vol), 6)
        )
        assert got[k] == (cut, vol, phi), k

    # the sweep's best prefix is clique A: cut = 1 (the bridge), and the
    # source's whole clique outranks everything across the bridge
    assert set(ranked[:5]) == set(A)
    best_k = min(got, key=lambda k: (got[k][2], k))
    assert best_k == 5 and got[5][0] == 1
