"""Wave-7 operators vs python brute force on hand-built inputs."""

from __future__ import annotations


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _und_deg(pairs):
    und = set()
    for a, b in pairs:
        und.add((a, b))
        und.add((b, a))
    deg = {}
    for a, _ in und:
        deg[a] = deg.get(a, 0) + 1
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
    return und, deg, nbrs


# star hub 0 with leaves 1-4 (deg 5 incl. chord), a triangle (1,2,5),
# plus a path 6-7-8 giving a deg-2 center
PAIRS = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (1, 5), (2, 5), (6, 7), (7, 8)]


def test_resource_allocation_bruteforce(spark):
    from graphlite_spark.algos.linkpred import resource_allocation

    got = {
        (r["u"], r["v"]): r["ra_micros"]
        for r in resource_allocation(
            _edges(spark, PAIRS), max_wedge_degree=100, min_score_micros=1
        ).collect()
    }

    und, deg, nbrs = _und_deg(PAIRS)
    want = {}
    verts = sorted(deg)
    for i, u in enumerate(verts):
        for v in verts[i + 1:]:
            if (u, v) in und:
                continue
            s = sum(
                round(1_000_000.0 / deg[w])
                for w in nbrs[u] & nbrs[v]
                if deg[w] >= 2
            )
            if s >= 1:
                want[(u, v)] = s
    assert got == want
    # sanity: 6-8 share only the deg-2 center 7 → exactly 500000
    assert want[(6, 8)] == 500_000


def test_resource_allocation_hub_cap(spark):
    from graphlite_spark.algos.linkpred import resource_allocation

    # cap at 2: only deg-2 centers survive (vertex 5 and 7); the hub 0
    # and the deg-4 vertices 1/2 are excluded BEFORE the wedge join
    got = {
        (r["u"], r["v"]): r["ra_micros"]
        for r in resource_allocation(
            _edges(spark, PAIRS), max_wedge_degree=2, min_score_micros=1
        ).collect()
    }
    und, deg, nbrs = _und_deg(PAIRS)
    want = {}
    verts = sorted(deg)
    for i, u in enumerate(verts):
        for v in verts[i + 1:]:
            if (u, v) in und:
                continue
            s = sum(
                round(1_000_000.0 / deg[w])
                for w in nbrs[u] & nbrs[v]
                if 2 <= deg[w] <= 2
            )
            if s >= 1:
                want[(u, v)] = s
    assert got == want
    assert (6, 8) in got


def test_preferential_attachment_bruteforce(spark):
    from graphlite_spark.algos.linkpred import preferential_attachment

    got = {
        (r["u"], r["v"]): (r["cn"], r["pa_score"])
        for r in preferential_attachment(
            _edges(spark, PAIRS), max_wedge_degree=100
        ).collect()
    }

    und, deg, nbrs = _und_deg(PAIRS)
    want = {}
    verts = sorted(deg)
    for i, u in enumerate(verts):
        for v in verts[i + 1:]:
            if (u, v) in und:
                continue
            cn = sum(1 for w in nbrs[u] & nbrs[v] if deg[w] >= 2)
            if cn >= 1:
                want[(u, v)] = (cn, deg[u] * deg[v])
    assert got == want
    # leaves 3-4 share only the hub 0: one common neighbor, deg 1 each
    assert want[(3, 4)] == (1, 1)


def test_pa_score_uses_full_degree(spark):
    from graphlite_spark.algos.linkpred import preferential_attachment

    und, deg, _ = _und_deg(PAIRS)
    rows = preferential_attachment(
        _edges(spark, PAIRS), max_wedge_degree=100
    ).collect()
    for r in rows:
        assert r["pa_score"] == deg[r["u"]] * deg[r["v"]]
