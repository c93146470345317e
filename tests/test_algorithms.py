"""Reference-parity tests for the four built-in algorithms (SURVEY.md §5.2)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graphlite_spark.algos import (
    connected_components,
    label_propagation,
    pagerank,
    triangle_count,
    triangle_count_per_vertex,
)
from graphlite_spark.sources import load_tinygraph
from graphlite_spark.sources.transcripts import TINYGRAPH_EDGES
from tests.reference_sim import (
    random_digraph,
    simulate_components,
    simulate_lpa,
    simulate_pagerank,
    simulate_triangles,
)


def make_graph(spark, edges, n):
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    v = spark.range(n).select(F.col("id"))
    return v, e


def collect_values(result_state):
    rows = result_state.orderBy("id").collect()
    return [r["value"] for r in rows]


GRAPHS = {
    "tinygraph": (TINYGRAPH_EDGES, 5),
    "random_100": (random_digraph(100, 400, seed=7), 100),
    "random_dangling": (random_digraph(60, 150, seed=11), 60),
}


@pytest.mark.parametrize("gname", list(GRAPHS))
def test_pagerank_matches_reference_simulator(spark, gname):
    edges, n = GRAPHS[gname]
    v, e = make_graph(spark, edges, n)
    res = pagerank(v, e)
    expected, ss = simulate_pagerank(edges, n)
    got = collect_values(res.state)
    assert res.supersteps == ss, f"iteration count {res.supersteps} != {ss}"
    assert res.converged
    for i, (a, b) in enumerate(zip(got, expected)):
        assert math.isclose(a, b, abs_tol=1e-6), f"vertex {i}: {a} vs {b}"


def test_pagerank_tinygraph_text_parity(spark):
    """Reference output format '%lld: %f' parity (PageRankVertex.cc:115)."""
    v, e = make_graph(spark, *GRAPHS["tinygraph"])
    res = pagerank(v, e)
    lines = [
        f"{r['id']}: {r['value']:f}" for r in res.state.orderBy("id").collect()
    ]
    expected, _ = simulate_pagerank(*GRAPHS["tinygraph"])
    ref_lines = [f"{i}: {x:f}" for i, x in enumerate(expected)]
    assert lines == ref_lines


def test_pagerank_fixed_supersteps(spark):
    edges, n = GRAPHS["tinygraph"]
    v, e = make_graph(spark, edges, n)
    res = pagerank(v, e, fixed_supersteps=10)
    expected, ss = simulate_pagerank(edges, n, fixed=10)
    assert res.supersteps == 10 == ss
    got = collect_values(res.state)
    for a, b in zip(got, expected):
        assert math.isclose(a, b, abs_tol=1e-9)


def test_pagerank_partition_count_invariance(spark):
    """Same results at different partition counts (SURVEY.md §5.2.3)."""
    edges, n = GRAPHS["random_100"]
    v, e = make_graph(spark, edges, n)
    r2 = pagerank(v, e, num_partitions=2)
    r8 = pagerank(v, e, num_partitions=8)
    g2, g8 = collect_values(r2.state), collect_values(r8.state)
    assert r2.supersteps == r8.supersteps
    for a, b in zip(g2, g8):
        assert math.isclose(a, b, abs_tol=1e-9)


@pytest.mark.parametrize("gname", ["tinygraph", "random_100", "random_dangling"])
def test_connected_components_exact(spark, gname):
    edges, n = GRAPHS[gname]
    v, e = make_graph(spark, edges, n)
    res = connected_components(v, e)
    got = collect_values(res.state)
    assert got == simulate_components(edges, n)
    assert res.converged


def test_connected_components_multi_component(spark):
    # two disjoint cliques + 2 isolated vertices
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5)]
    v, e = make_graph(spark, edges, 8)
    res = connected_components(v, e)
    got = collect_values(res.state)
    assert got == [0, 0, 0, 3, 3, 3, 6, 7]


@pytest.mark.parametrize("gname", ["tinygraph", "random_100"])
def test_lpa_matches_simulator(spark, gname):
    edges, n = GRAPHS[gname]
    v, e = make_graph(spark, edges, n)
    res = label_propagation(v, e, iterations=5)
    got = collect_values(res.state)
    assert got == simulate_lpa(edges, n, iterations=5)


@pytest.mark.parametrize("gname", ["tinygraph", "random_100", "random_dangling"])
@pytest.mark.parametrize("orient", ["id", "degree"])
def test_triangles_exact(spark, gname, orient):
    edges, n = GRAPHS[gname]
    v, e = make_graph(spark, edges, n)
    per, total = simulate_triangles(edges, n)
    got_total = triangle_count(e, orient=orient).collect()[0]["triangles"]
    assert got_total == total
    got_per = {
        r["id"]: r["count"]
        for r in triangle_count_per_vertex(v, e, orient=orient).collect()
    }
    assert got_per == {i: c for i, c in enumerate(per)}


def test_pagerank_permutation_invariance(spark):
    """Relabeling vertices permutes outputs (SURVEY.md §5.2.3)."""
    edges, n = GRAPHS["tinygraph"]
    perm = [3, 0, 4, 1, 2]
    pedges = [(perm[s], perm[d]) for s, d in edges]
    v1, e1 = make_graph(spark, edges, n)
    v2, e2 = make_graph(spark, pedges, n)
    r1 = collect_values(pagerank(v1, e1).state)
    r2 = collect_values(pagerank(v2, e2).state)
    for i in range(n):
        assert math.isclose(r1[i], r2[perm[i]], abs_tol=1e-9)


@pytest.mark.parametrize("gname", list(GRAPHS))
def test_components_fast_matches_simulator(spark, gname):
    """O(log d) label-doubling CC reaches the same fixpoint as union-find."""
    from graphlite_spark.algos.components import connected_components_fast

    edges, n = GRAPHS[gname]
    v, e = make_graph(spark, edges, n)
    got = {
        r["id"]: r["component"]
        for r in connected_components_fast(v, e).collect()
    }
    want = simulate_components(edges, n)
    assert got == {i: want[i] for i in range(n)}


def test_components_fast_long_chain_round_count(spark):
    """A 200-vertex chain must converge in ~log2(200) rounds, not 200 —
    checked indirectly by a tight wall bound being unnecessary: assert
    correctness on a chain whose diameter would exceed the Pregel default
    iteration budget of small fixed runs."""
    from graphlite_spark.algos.components import connected_components_fast

    n = 200
    edges = [(i, i + 1) for i in range(n - 1)]
    v, e = make_graph(spark, edges, n)
    got = connected_components_fast(v, e).select("component").distinct().collect()
    assert [r["component"] for r in got] == [0]


def test_kcore_properties(spark):
    """Every in-core vertex has >= k in-core neighbors; peeled toy graph
    matches hand calculation (triangle + tail)."""
    from graphlite_spark.algos.components import k_core

    # triangle 0-1-2 plus a tail 2-3-4: 2-core = {0,1,2}, tail peels off
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
    v, e = make_graph(spark, edges, 5)
    got = {r["id"]: r["in_core"] for r in k_core(v, e, k=2).collect()}
    assert got == {0: True, 1: True, 2: True, 3: False, 4: False}

    # invariant on a random graph: in-core vertices have >=k in-core nbrs
    edges, n = GRAPHS["random_100"]
    v, e = make_graph(spark, edges, n)
    core = {r["id"] for r in k_core(v, e, k=2).collect() if r["in_core"]}
    und = set()
    for s, d in edges:
        if s != d:
            und.add((s, d)); und.add((d, s))
    for u in core:
        deg = sum(1 for (s, d) in und if s == u and d in core)
        assert deg >= 2, (u, deg)


def test_coreness_decomposition(spark):
    """Full core numbers: hand-checked toy graph, exact agreement with the
    boolean k_core at k=2, and a brute-force oracle on a random graph."""
    from graphlite_spark.algos.components import coreness, k_core

    # triangle 0-1-2 plus tail 2-3-4 plus isolated 5:
    # coreness = 2,2,2 (triangle), 1,1 (tail), 0 (isolated)
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
    v, e = make_graph(spark, edges, 6)
    got = {r["id"]: r["coreness"] for r in coreness(v, e).collect()}
    assert got == {0: 2, 1: 2, 2: 2, 3: 1, 4: 1, 5: 0}

    # agreement with k_core membership at k=2 on a random graph
    edges, n = GRAPHS["random_100"]
    v, e = make_graph(spark, edges, n)
    core2 = {r["id"]: r["in_core"] for r in k_core(v, e, k=2).collect()}
    cn = {r["id"]: r["coreness"] for r in coreness(v, e).collect()}
    assert all((cn[i] >= 2) == core2[i] for i in range(n))

    # brute-force peel oracle (pure python) for every k
    und = {}
    for s, d in edges:
        if s != d:
            und.setdefault(s, set()).add(d)
            und.setdefault(d, set()).add(s)
    expected = {i: 0 for i in range(n)}
    alive = {i for i in range(n)}
    k = 1
    while alive:
        while True:
            drop = {u for u in alive if len(und.get(u, set()) & alive) < k}
            if not drop:
                break
            alive -= drop
        for u in alive:
            expected[u] = k
        k += 1
        if k > 4:  # mirrors the query's max_k cap
            break
    assert cn == expected


def test_personalized_pagerank_source_mass(spark):
    """PPR: all rank mass reachable only from the source; vertices not
    reachable from it score 0."""
    from graphlite_spark.algos.pagerank import personalized_pagerank

    # two disjoint chains: 0->1->2 and 3->4
    edges = [(0, 1), (1, 2), (3, 4)]
    v, e = make_graph(spark, edges, 5)
    res = personalized_pagerank(v, e, source=0, fixed_supersteps=8)
    got = {r["id"]: r["value"] for r in res.state.collect()}
    assert got[0] > 0 and got[1] > 0 and got[2] > 0
    assert got[3] == 0.0 and got[4] == 0.0
    # source retains the teleport term exactly (no in-edges to 0)
    assert math.isclose(got[0], 0.15, rel_tol=0, abs_tol=1e-12)


def test_ktruss_membership(spark):
    """Hand-checked toy graphs + a brute-force peel oracle on random_100;
    degree and id orientations agree."""
    from graphlite_spark.algos.triangles import k_truss

    # two triangles sharing edge (1,2), plus a tail 3-4:
    # 3-truss = the five triangle edges; (3,4) peels off
    edges = [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3), (3, 4)]
    v, e = make_graph(spark, edges, 5)
    got = {(r["lo"], r["hi"]): r["in_truss"] for r in k_truss(e, k=3).collect()}
    assert got == {
        (0, 1): True, (1, 2): True, (0, 2): True,
        (1, 3): True, (2, 3): True, (3, 4): False,
    }
    # 4-truss: only (1,2) has support 2, but alone it has no triangles
    # left after the first peel -> empty
    got4 = {(r["lo"], r["hi"]): r["in_truss"] for r in k_truss(e, k=4).collect()}
    assert not any(got4.values())

    # brute-force peel oracle on a random graph, both orientations
    edges, n = GRAPHS["random_100"]
    und = set()
    for s, d in edges:
        if s != d:
            und.add((min(s, d), max(s, d)))
    alive = set(und)
    while True:
        support = {ed: 0 for ed in alive}
        al = sorted({x for ed in alive for x in ed})
        nbrs = {u: set() for u in al}
        for a, b in alive:
            nbrs[a].add(b); nbrs[b].add(a)
        for a, b in alive:
            support[(a, b)] = len(nbrs[a] & nbrs[b])
        drop = {ed for ed, s_ in support.items() if s_ < 1}
        if not drop:
            break
        alive -= drop
    v, e = make_graph(spark, edges, n)
    for orient in ("id", "degree"):
        got = {
            (r["lo"], r["hi"]): r["in_truss"]
            for r in k_truss(e, k=3, max_rounds=16, orient=orient).collect()
        }
        assert set(got) == und
        assert {ed for ed, m in got.items() if m} == alive, orient


def test_katz_centrality_replay(spark):
    """Exact python replay of the integer micro-unit Katz rounds, plus
    the prestige ordering on a simple chain-with-hub graph."""
    from graphlite_spark.algos.centrality import katz_centrality

    edges = [(0, 2), (1, 2), (2, 3), (3, 4), (0, 4)]
    v, e = make_graph(spark, edges, 5)
    got = {r["id"]: r["katz"] for r in
           katz_centrality(v, e, iterations=6, alpha_den=8).collect()}
    MICRO = 1_000_000
    k = {i: MICRO for i in range(5)}
    for _ in range(6):
        nxt = {i: MICRO for i in range(5)}
        for s, d in edges:
            nxt[d] += k[s] // 8
        k = nxt
    assert got == k
    # sources have no in-edges -> base score; receivers accumulate
    assert got[0] == got[1] == MICRO
    assert min(got[2], got[3], got[4]) > MICRO
    assert got[4] > got[3]  # 4 hears 3's (already-boosted) score plus 0's


def test_rectangle_count_brute_force(spark):
    """Square toy graph + brute-force 4-cycle enumeration on random_100."""
    from itertools import combinations

    from graphlite_spark.algos.triangles import rectangle_count

    # a single square 0-1-2-3 (+ diagonal chord 0-2 must not change R)
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    v, e = make_graph(spark, edges, 4)
    assert rectangle_count(e).collect()[0]["rectangles"] == 1
    v, e = make_graph(spark, edges + [(0, 2)], 4)
    assert rectangle_count(e).collect()[0]["rectangles"] == 1

    edges, n = GRAPHS["random_100"]
    und = set()
    for s, d in edges:
        if s != d:
            und.add((min(s, d), max(s, d)))
    nbr = {}
    for a, b in und:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    brute = 0
    for a, b in combinations(sorted(nbr), 2):
        cn = len(nbr[a] & nbr[b])
        brute += cn * (cn - 1) // 2
    brute //= 2
    v, e = make_graph(spark, edges, n)
    assert rectangle_count(e).collect()[0]["rectangles"] == brute


def test_round4_ops_partition_invariance(spark):
    """The deterministic round-4 operators are pure functions of the
    graph: identical outputs when the input arrives repartitioned with a
    different partition count / row order."""
    from graphlite_spark.algos.bfs import stress_from_source
    from graphlite_spark.algos.centrality import katz_centrality
    from graphlite_spark.algos.mis import greedy_coloring, maximal_independent_set
    from graphlite_spark.algos.triangles import k_truss

    edges, n = GRAPHS["random_100"]
    v, e = make_graph(spark, edges, n)
    v3, e3 = v.repartition(3), e.repartition(7, "dst")

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    for fn in (
        lambda vv, ee: maximal_independent_set(vv, ee),
        lambda vv, ee: greedy_coloring(vv, ee),
        lambda vv, ee: katz_centrality(vv, ee, iterations=4),
        lambda vv, ee: stress_from_source(vv, ee, source=0, depth=5),
        lambda vv, ee: k_truss(ee, k=3, max_rounds=16),
    ):
        assert rows(fn(v, e)) == rows(fn(v3, e3))


def test_wl_refinement_properties(spark):
    """WL invariants: isomorphic placements get equal colors, the
    refinement distinguishes a path's interior from its ends, and a
    python replay of the exact hash chain agrees."""
    import hashlib

    from graphlite_spark.algos.wl import wl_refinement

    def h48(x: str) -> int:
        return int(hashlib.md5(x.encode()).hexdigest()[:12], 16)

    # path 0-1-2-3: ends {0,3} one color, interior {1,2} another
    edges = [(0, 1), (1, 2), (2, 3)]
    v, e = make_graph(spark, edges, 4)
    got = {r["id"]: r["color"] for r in wl_refinement(v, e, 3).collect()}
    assert got[0] == got[3] and got[1] == got[2] and got[0] != got[1]

    # python replay on random_100
    edges, n = GRAPHS["random_100"]
    und = {i: [] for i in range(n)}
    for s, d in edges:
        if s != d:
            und[s].append(d)
            und[d].append(s)
    und = {i: sorted(set(ws)) for i, ws in und.items()}
    col = {i: h48("wl:0") for i in range(n)}
    for _ in range(3):
        nxt = {}
        for i in range(n):
            nbrs = ",".join(str(c) for c in sorted(col[w] for w in und[i]))
            nxt[i] = h48(f"wl:{col[i]}:{nbrs}")
        col = nxt
    v, e = make_graph(spark, edges, n)
    got = {r["id"]: r["color"] for r in wl_refinement(v, e, 3).collect()}
    assert got == col


def test_wl_conv_fingerprints(spark):
    """Structurally identical conversations share a fingerprint (and a
    duplicate class); a structurally different one does not."""
    from graphlite_spark.algos.wl import wl_conv_fingerprints

    # conv a: chain of 3; conv b: chain of 3 (isomorphic); conv c:
    # star of 4 (different shape, different vertex count)
    v = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "a"),
         (3, "b"), (4, "b"), (5, "b"),
         (6, "c"), (7, "c"), (8, "c"), (9, "c")],
        "id long, conv_id string",
    )
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (4, 5), (6, 7), (6, 8), (6, 9)],
        "src long, dst long",
    ).withColumn("weight", F.lit(1.0))
    got = {r["conv_id"]: r for r in wl_conv_fingerprints(v, e, 3).collect()}
    assert got["a"]["fingerprint"] == got["b"]["fingerprint"]
    assert got["a"]["class_size"] == 2 and got["b"]["class_size"] == 2
    assert got["c"]["fingerprint"] != got["a"]["fingerprint"]
    assert got["c"]["class_size"] == 1
    assert got["a"]["n_vertices"] == 3 and got["c"]["n_vertices"] == 4


def test_attribute_assortativity_known_values(spark):
    """Hand-checked mixing: perfectly assortative = 1; a checkerboard
    bipartite-by-label graph is maximally disassortative; python replay
    on a random labeled graph."""
    from graphlite_spark.algos.stats import attribute_assortativity

    def run(edges, labels, n):
        v, e = make_graph(spark, edges, n)
        ldf = spark.createDataFrame(list(labels.items()), "id long, label string")
        return attribute_assortativity(e, ldf).collect()[0]

    # two label-pure components: r = 1
    r = run([(0, 1), (1, 0), (2, 3), (3, 2)],
            {0: "a", 1: "a", 2: "b", 3: "b"}, 4)
    assert r["n_edges"] == 4 and r["assortativity"] == 1.0

    # all edges cross labels: e_ii = 0
    r = run([(0, 2), (2, 1), (1, 3), (3, 0)],
            {0: "a", 1: "a", 2: "b", 3: "b"}, 4)
    assert r["assortativity"] < 0

    # replay
    edges, n = GRAPHS["random_100"]
    labels = {i: "lbl%d" % (i % 3) for i in range(n)}
    got = run(edges, labels, n)
    per = {}
    for s, d in edges:
        per[(labels[s], labels[d])] = per.get((labels[s], labels[d]), 0) + 1
    m = sum(per.values())
    same = sum(c for (a, b), c in per.items() if a == b)
    cats = {x for ab in per for x in ab}
    sab = sum(
        sum(c for (a, _), c in per.items() if a == x)
        * sum(c for (_, b), c in per.items() if b == x)
        for x in cats
    )
    expect = round((m * same - sab) / (m * m - sab), 6)
    assert got["n_edges"] == m and abs(got["assortativity"] - expect) < 1e-9


def test_pagerank_warm_restart_reconverges_faster(spark):
    # the maintenance claim, stated honestly for a diameter-bound chain
    # graph: warm restart reaches the SAME fixpoint, never needs more
    # supersteps than cold, and starts from a perturbation (first-update
    # global sum_delta) orders of magnitude below the cold start's —
    # the log(delta0) savings a 0.85-contraction can actually deliver
    from graphlite_spark.algos.pagerank import WarmPageRank, pagerank
    from graphlite_spark.functions.hashes import hash48
    from graphlite_spark.operators.pregel import PregelEngine
    from graphlite_spark.plans.derive import derive_edges, derive_vertices
    from graphlite_spark.sources.transcripts import transcripts_from_events

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    tr = transcripts_from_events(ev)
    v, e = derive_vertices(tr), derive_edges(tr)
    is_new = (
        hash48(
            F.concat_ws(
                ":", F.col("src").cast("string"), F.col("dst").cast("string")
            )
        )
        % 100
        == 0
    )
    cold = pagerank(v, e, eps=1e-6, num_partitions=4)
    old = pagerank(v, e.where(~is_new), eps=1e-6, num_partitions=4)
    init = old.state.select("id", F.col("value").alias("init_value"))
    warm = PregelEngine(num_partitions=4, run_id="warm_test").run(
        v.select("id").join(init, "id", "left"),
        e,
        WarmPageRank(eps=1e-6),
    )
    assert cold.converged and warm.converged
    # same fixpoint (1e-6 halting -> agree well past 6dp)
    a = {r["id"]: r["value"] for r in cold.state.collect()}
    b = {r["id"]: r["value"] for r in warm.state.collect()}
    assert all(abs(a[i] - b[i]) < 1e-4 for i in a)
    assert warm.supersteps <= cold.supersteps
    # the warm start's first real update moves a fraction of the rank
    # mass the cold start moves (cold: every vertex jumps from 1.0)
    cold_d0 = cold.metrics[1].aggregates["sum_delta"]
    warm_d0 = warm.metrics[1].aggregates["sum_delta"]
    assert warm_d0 < cold_d0 / 10, (warm_d0, cold_d0)


def test_salsa_matches_python_replay(spark):
    # fixed-point SALSA vs a plain-python replay of the identical
    # per-vertex truncating-division recurrence
    from graphlite_spark.algos.hits import salsa

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 1), (1, 2)]
    vs = [0, 1, 2, 3, 9]  # 9 isolated
    v = spark.createDataFrame([(i,) for i in vs], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")

    ind, outd = {}, {}
    for s, d in edges:
        outd[s] = outd.get(s, 0) + 1
        ind[d] = ind.get(d, 0) + 1
    a = {i: 1_000_000 for i in vs}
    h = {}
    for _ in range(3):
        adiv = {i: a[i] // ind[i] for i in vs if i in ind}
        h = {i: 0 for i in vs}
        for s, d in edges:
            h[s] += adiv.get(d, 0)
        hdiv = {i: h[i] // outd[i] for i in vs if i in outd}
        a = {i: 0 for i in vs}
        for s, d in edges:
            a[d] += hdiv.get(s, 0)
    got = {
        r["id"]: (r["auth_m"], r["hub_m"])
        for r in salsa(v, e, iterations=3).collect()
    }
    assert got == {i: (a[i], h[i]) for i in vs}


def test_edge_support_known_values(spark):
    """K4 minus one edge: the shared edge of the two triangles has
    support 2, the other four edges support 1, and a pendant edge
    surfaces with support 0."""
    from graphlite_spark.algos.triangles import edge_support

    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)]
    _, e = make_graph(spark, edges, 6)
    got = {(r["lo"], r["hi"]): r["support"]
           for r in edge_support(e).collect()}
    assert got == {
        (1, 2): 1, (1, 3): 1, (2, 3): 2, (2, 4): 1, (3, 4): 1, (4, 5): 0,
    }
