"""Brute-force cross-checks for Adamic-Adar, local clustering coefficient,
and the KMV distinct sketch."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from graphlite_spark.algos.linkpred import adamic_adar
from graphlite_spark.algos.triangles import local_clustering_coefficient
from graphlite_spark.operators.sketches import (
    cms_build,
    cms_estimate_heavy_hitters,
    hll_distinct_by,
    hll_union_overlap,
    kmv_distinct_by,
    kmv_set_overlap,
)
from tests.reference_sim import random_digraph


def _und(edges):
    nbrs = {}
    for s, d in edges:
        if s != d:
            nbrs.setdefault(s, set()).add(d)
            nbrs.setdefault(d, set()).add(s)
    return nbrs


def test_adamic_adar_bruteforce(spark):
    edges = random_digraph(60, 200, seed=21)
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    got = {(r["u"], r["v"]): r["aa_micros"]
           for r in adamic_adar(e, max_wedge_degree=100,
                                min_score_micros=1).collect()}
    nbrs = _und(edges)
    want = {}
    nodes = sorted(nbrs)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if v in nbrs[u]:
                continue  # existing edge excluded
            s = sum(
                round(1_000_000.0 / math.log(len(nbrs[w])))
                for w in nbrs[u] & nbrs[v]
                if 2 <= len(nbrs[w]) <= 100
            )
            if s >= 1:
                want[(u, v)] = s
    assert got == want


def test_lcc_bruteforce(spark):
    edges = random_digraph(50, 180, seed=4)
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    v = spark.range(50).select(F.col("id"))
    got = {r["id"]: (r["degree"], r["triangles"], r["lcc"])
           for r in local_clustering_coefficient(v, e).collect()}
    nbrs = _und(edges)
    for i in range(50):
        ns = nbrs.get(i, set())
        d = len(ns)
        t = sum(
            1 for a in ns for b in ns if a < b and b in nbrs.get(a, set())
        )
        lcc = round(2.0 * t / (d * (d - 1)), 6) if d >= 2 else 0.0
        assert got[i] == (d, t, lcc), (i, got[i], (d, t, lcc))


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def test_kmv_sketch(spark):
    # below k: the sketch is exact; above k: matches the closed-form KMV
    # estimate over the deterministic md5 hashes
    rows = [("a", i % 10) for i in range(100)] + [("b", i) for i in range(500)]
    df = spark.createDataFrame(rows, "grp string, val long")
    got = {r["grp"]: (r["est_distinct"], r["exact_distinct"])
           for r in kmv_distinct_by(df, "grp", "val", k=64).collect()}
    assert got["a"] == (10, 10)  # n < k -> exact
    hs = sorted({_h48(str(i)) for i in range(500)})
    est = (63 * (1 << 48)) // hs[63]
    assert got["b"] == (est, 500)
    # sanity: the estimate lands in a plausible band for k=64
    assert 300 < got["b"][0] < 800


def test_contamination_report(spark):
    """Containment flags a doc embedding a benchmark prompt even when
    the doc is much longer (the directional case Jaccard misses)."""
    from graphlite_spark.operators.dedup import contamination_report

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            # contains the benchmark 4-gram inside a longer doc
            (1, "x y z alpha beta gamma delta p q r s t u v w"),
            # no overlap
            (2, "one two three four five six seven"),
            # partial: shares one 3-gram
            (3, "alpha beta gamma nine ten eleven twelve"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           contamination_report(docs, bench, threshold=0.05).collect()}
    assert 2 not in got
    assert got[1]["bench_id"] == 100 and got[1]["shared"] == 2
    assert got[3]["shared"] == 1
    # containment = shared / doc's own shingles
    assert got[1]["containment"] == round(2 / 13, 6)
    # jaccard for doc 1 would be 2/(13+2-2)=0.154 vs containment 0.154...
    # the directional property: lengthen doc 1 and containment falls but
    # stays proportional to the doc, never diluted by the bench size


def test_jaccard_linkpred_bruteforce(spark):
    from graphlite_spark.algos.linkpred import jaccard_similarity

    edges = random_digraph(60, 200, seed=33)
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    got = {(r["u"], r["v"]): (r["cn"], r["jaccard_micros"])
           for r in jaccard_similarity(e, max_wedge_degree=100,
                                       min_score_micros=1).collect()}
    nbrs = _und(edges)
    want = {}
    nodes = sorted(nbrs)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if v in nbrs[u]:
                continue
            cn = sum(1 for w in nbrs[u] & nbrs[v] if 2 <= len(nbrs[w]) <= 100)
            if cn == 0:
                continue
            j = (1_000_000 * cn) // (len(nbrs[u]) + len(nbrs[v]) - cn)
            if j >= 1:
                want[(u, v)] = (cn, j)
    assert got == want


def test_jaccard_hub_cap_binds(spark):
    from graphlite_spark.algos.linkpred import jaccard_similarity

    # star center 0 (deg 5) with leaves 1..5 plus a wedge 1-6-2: with the
    # cap at 4 the star center is excluded BEFORE the wedge join, so the
    # star's leaf pairs never appear; surviving wedges are 1-6-2 (center
    # 6, deg 2) giving pair (1,2), and 0-1-6 / 0-2-6 (centers 1 and 2)
    # giving pair (0,6) with cn=2.  Denominators use FULL degrees even
    # where the cap binds (deg 0 = 5).
    edges = [(0, i) for i in range(1, 6)] + [(1, 6), (6, 2)]
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    got = {(r["u"], r["v"]): (r["cn"], r["jaccard_micros"])
           for r in jaccard_similarity(e, max_wedge_degree=4,
                                       min_score_micros=1).collect()}
    assert got == {
        (1, 2): (1, 1_000_000 * 1 // (2 + 2 - 1)),
        (0, 6): (2, 1_000_000 * 2 // (5 + 2 - 2)),
    }


def test_hll_sketch(spark):
    # bit-identical to a pure-Python HLL over the same 48-bit md5
    # hashes (bucket = bottom b bits, rho = leading-zero count of the
    # top 48-b bits + 1), and the estimate lands within the standard
    # 1.04/sqrt(m) error band of the truth
    b, m = 6, 64
    rows = [("a", i % 10) for i in range(100)] + [("b", i) for i in range(2000)]
    df = spark.createDataFrame(rows, "grp string, val long")
    got = {r["grp"]: (r["est_hll"], r["n_zero_buckets"], r["exact_distinct"])
           for r in hll_distinct_by(df, "grp", "val", b=b).collect()}

    def sim(values):
        regs = [0] * m
        for v in values:
            h = _h48(str(v))
            bucket, w = h % m, h // m
            rho = (48 - b + 1) if w == 0 else (48 - b + 1) - w.bit_length()
            regs[bucket] = max(regs[bucket], rho)
        zeros = sum(1 for r in regs if r == 0)
        alpha = 0.7213 / (1 + 1.079 / m)
        raw = alpha * m * m / (sum(2.0 ** -r for r in regs if r) + float(zeros))
        if raw <= 2.5 * m and zeros > 0:
            return round(float(m) * math.log(float(m) / zeros), 6), zeros
        return round(raw, 6), zeros

    for grp, vals in (("a", range(10)), ("b", range(2000))):
        est, zeros = sim(vals)
        assert got[grp][0] == est and got[grp][1] == zeros, (grp, got[grp], est, zeros)
    # accuracy: within 3 standard errors of exact (1.04/sqrt(64) = 13%)
    assert abs(got["b"][0] - 2000) < 3 * 1.04 / math.sqrt(m) * 2000


def test_cms_point_queries(spark):
    # skewed key distribution; narrow width forces real collisions so the
    # test exercises overestimation, and the Python replay must agree
    from collections import Counter

    rows = [(i % 7,) for i in range(200)] + [(100 + i % 40,) for i in range(80)]
    df = spark.createDataFrame(rows, "user_id long")
    depth, width = 4, 16
    got = {
        r["user_id"]: (r["exact_n"], r["cms_est"])
        for r in cms_estimate_heavy_hitters(
            df, "user_id", k=10, depth=depth, width=width
        ).collect()
    }
    cnt = Counter(u for (u,) in rows)
    sketch = Counter()
    for u, n in cnt.items():
        for r in range(depth):
            sketch[(r, _h48(f"cms:{r}:{u}") % width)] += n
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    want = {
        u: (n, min(sketch[(r, _h48(f"cms:{r}:{u}") % width)] for r in range(depth)))
        for u, n in top
    }
    assert got == want
    # CMS never underestimates
    assert all(est >= exact for exact, est in got.values())
    # with width 16 and 47 distinct keys, at least one probe must collide
    assert any(est > exact for exact, est in got.values())


def test_cms_sketch_size_bounded(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "user_id long")
    sk = cms_build(df, "user_id", depth=3, width=8)
    assert sk.count() <= 3 * 8
    total = sk.groupBy("row").agg(F.sum("n").alias("t")).collect()
    assert {r["t"] for r in total} == {1000}  # each row sees every key once


def test_kmv_set_overlap_merge_property(spark):
    """The merged union sketch equals the sketch OF the union (the KMV
    mergeability theorem) — est_union from the pair operator must match
    the plain KMV estimate computed directly on A | B; exact witnesses
    and the rho-scaled intersection/Jaccard are replayed in python."""
    k = 16
    A = set(range(0, 300))          # 300 values
    B = set(range(200, 450))        # 250 values, 100 shared
    rows = [("a", v) for v in A] + [("b", v) for v in B]
    df = spark.createDataFrame(rows, "grp string, val long")
    got = kmv_set_overlap(df, "grp", "val", k=k).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["group_a"], r["group_b"]) == ("a", "b")
    assert r["exact_union"] == len(A | B)
    assert r["exact_intersection"] == len(A & B)

    hs_a = sorted({_h48(str(v)) for v in A})
    hs_b = sorted({_h48(str(v)) for v in B})
    union_sk = sorted(set(hs_a[:k]) | set(hs_b[:k]))[:k]
    direct = sorted({_h48(str(v)) for v in A | B})[:k]
    assert union_sk == direct  # mergeability
    est_union = (k - 1) * (1 << 48) // union_sk[-1]
    assert r["est_union"] == est_union
    rho = sum(1 for h in union_sk if h in set(hs_a[:k]) and h in set(hs_b[:k]))
    assert r["est_intersection"] == rho * est_union // k
    assert r["jaccard_micros"] == 1_000_000 * rho // k
    # accuracy sanity: jaccard within 3 standard errors for k=16
    true_j = len(A & B) / len(A | B)
    assert abs(r["jaccard_micros"] / 1e6 - true_j) < 3 * (true_j * (1 - true_j) / k) ** 0.5 + 0.1


def test_hll_union_merge_property(spark):
    """The merged (register-max) union estimate equals the plain HLL
    estimate computed directly on A | B — HLL mergeability as a test —
    and inclusion-exclusion lands within the combined error band."""
    b, m = 6, 64
    A = set(range(0, 1200))
    B = set(range(800, 1800))  # 400 shared
    rows = [("a", v) for v in A] + [("b", v) for v in B]
    df = spark.createDataFrame(rows, "grp string, val long")
    got = hll_union_overlap(df, "grp", "val", b=b).collect()
    assert len(got) == 1
    r = got[0]
    assert r["exact_union"] == len(A | B)

    direct = {x["grp"]: x["est_hll"] for x in hll_distinct_by(
        spark.createDataFrame([("u", v) for v in A | B], "grp string, val long"),
        "grp", "val", b=b, include_exact=False).collect()}
    assert r["est_union"] == direct["u"]  # mergeability, bit-exact
    # inclusion-exclusion intersection within 3 combined standard errors
    se = 3 * 1.04 / (m ** 0.5)
    assert abs(r["est_intersection"] - len(A & B)) < se * (len(A) + len(B))


def test_clustering_by_degree_bruteforce(spark):
    from graphlite_spark.algos.triangles import clustering_by_degree

    edges = random_digraph(50, 180, seed=4)
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    v = spark.range(50).select(F.col("id"))
    got = {r["bucket"]: (r["n_vertices"], r["n_triangles"], r["avg_cc_micros"])
           for r in clustering_by_degree(v, e).collect()}
    nbrs = _und(edges)
    per = {}
    for i in range(50):
        ns = nbrs.get(i, set())
        d = len(ns)
        t = sum(
            1 for a in ns for b in ns if a < b and b in nbrs.get(a, set())
        )
        cc = (
            (2_000_000 * t - (2_000_000 * t) % (d * (d - 1))) // (d * (d - 1))
            if d >= 2 else 0
        )
        per.setdefault(len(bin(d)) - 2, []).append((t, cc))
    want = {}
    for b, vals in per.items():
        n = len(vals)
        s = sum(c for _, c in vals)
        want[b] = (n, sum(t for t, _ in vals), (s - s % n) // n)
    assert got == want, (got, want)
