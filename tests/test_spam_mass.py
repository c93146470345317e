"""Relative spam mass vs numpy brute force on a hand graph."""

from __future__ import annotations

from graphlite_spark.algos.pagerank import spam_mass

# trusted core 0->1->0, honest tail 1->2; spam farm {3,4} pumping 5
EDGES = [(0, 1), (1, 0), (1, 2), (3, 5), (4, 5), (5, 3)]
N = 6
SEEDS = [0]
SS = 8


def _brute():
    outdeg = [0] * N
    for s, _ in EDGES:
        outdeg[s] += 1
    pr = [1.0] * N
    tr = [1.0 if i in SEEDS else 0.0 for i in range(N)]
    for _ in range(SS - 1):
        inbox_pr = [0.0] * N
        inbox_tr = [0.0] * N
        for s, d in EDGES:
            inbox_pr[d] += pr[s] / outdeg[s]
            inbox_tr[d] += tr[s] / outdeg[s]
        pr = [0.15 + 0.85 * m for m in inbox_pr]
        tr = [
            (0.15 if i in SEEDS else 0.0) + 0.85 * inbox_tr[i]
            for i in range(N)
        ]
    return pr, tr


def test_spam_mass_bruteforce(spark):
    v = spark.createDataFrame([(i,) for i in range(N)], "id long")
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in EDGES], "src long, dst long, weight double"
    )
    got = {r["id"]: r for r in spam_mass(v, e, SEEDS, SS).collect()}
    pr, tr = _brute()
    for i in range(N):
        assert got[i]["pagerank"] == round(pr[i], 6), i
        assert got[i]["trustrank"] == round(tr[i], 6), i
        assert got[i]["spam_mass"] == round((pr[i] - N * tr[i]) / pr[i], 6), i
    # the farm-pumped page earns all rank outside trust; the seed core
    # is trust-rich (negative mass)
    assert got[5]["spam_mass"] == 1.0
    assert got[0]["spam_mass"] < 0
