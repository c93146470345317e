"""IVF ANN search vs a Python replay: the replayed k-means codebook
drives corpus cell assignment and nprobe probing, candidates are
restricted to probed cells, and the cosine top-k tie rule matches."""

from __future__ import annotations

import math

from graphlite_spark.operators.similarity import ivf_topk
from tests.test_kmeans import _h48, _make_vectors, _replay


def _centroids(rows, k, iterations):
    q = {i: [round(x * 1_000_000) for x in vec] for i, vec in rows}
    seeds = sorted(q, key=lambda i: (_h48(f"kmeans:{i}"), i))[:k]
    cents = [list(q[i]) for i in seeds]

    def dist(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    for _ in range(iterations):
        sums, cnts = {}, {}
        for i, v in q.items():
            ds = [dist(v, c) for c in cents]
            cl = ds.index(min(ds))
            cnts[cl] = cnts.get(cl, 0) + 1
            s = sums.setdefault(cl, [0] * len(v))
            for p, x in enumerate(v):
                s[p] += x
        from graphlite_spark.operators.kmeans import _tdiv
        cents = [
            [_tdiv(sums[ci][p], cnts[ci]) for p in range(len(c))]
            if ci in cnts else list(c)
            for ci, c in enumerate(cents)
        ]
    return q, cents


def _replay_ivf(rows, k, nprobe, n_clusters, iterations, num_queries):
    q, cents = _centroids(rows, n_clusters, iterations)

    def dist(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    cell = {}
    for i, v in q.items():
        ds = [dist(v, c) for c in cents]
        cell[i] = ds.index(min(ds))
    vecs = dict(rows)

    def cos(a, b):
        # same fold order as F.aggregate: left-to-right over the array
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return round(dot / (math.sqrt(na) * math.sqrt(nb)), 6)

    want = set()
    for qid in [i for i, _ in rows if i < num_queries]:
        ds = sorted((dist(q[qid], c), ci) for ci, c in enumerate(cents))
        probed = {ci for _, ci in ds[:nprobe]}
        cand = [
            (cos(vecs[qid], vecs[nid]), nid)
            for nid in q
            if nid != qid and cell[nid] in probed
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        for r, (sim, nid) in enumerate(cand[:k], start=1):
            want.add((qid, nid, r, sim))
    return want


def test_ivf_matches_replay(spark):
    rows = _make_vectors(80, 6)
    df = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id long, embedding array<double>"
    )
    from pyspark.sql import functions as F

    got = {
        (r["query_id"], r["neighbor_id"], r["rank"], r["sim"])
        for r in ivf_topk(
            df, df.where(F.col("vec_id") < 10), k=3, nprobe=2,
            n_clusters=4, iterations=2,
        ).collect()
    }
    want = _replay_ivf(rows, k=3, nprobe=2, n_clusters=4, iterations=2,
                       num_queries=10)
    assert got == want
    assert len(got) > 0


def test_ivf_full_probe_equals_bruteforce(spark):
    # probing every cell must reproduce the exact brute-force top-k
    from pyspark.sql import functions as F

    from graphlite_spark.operators.similarity import cosine_topk

    rows = _make_vectors(50, 5)
    df = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id long, embedding array<double>"
    )
    qs = df.where(F.col("vec_id") < 8)
    a = sorted(
        map(tuple, ivf_topk(df, qs, k=4, nprobe=3, n_clusters=3,
                            iterations=1).collect())
    )
    b = sorted(map(tuple, cosine_topk(df, qs, k=4).collect()))
    assert a == b


def test_hard_negatives_label_filter(spark):
    # two tight same-label pairs per label: without the filter each
    # vector's nearest neighbor is its same-label twin; with label_col
    # the twin must vanish and different-label vectors fill ALL slots
    # (filter-before-window, not a post-hoc drop)
    vecs = [
        (0, [1.00, 0.00], 0), (1, [0.99, 0.01], 0),
        (2, [0.00, 1.00], 1), (3, [0.01, 0.99], 1),
        (4, [0.70, 0.70], 2), (5, [0.71, 0.69], 2),
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in vecs],
        "vec_id long, embedding array<float>, label int",
    )
    out = ivf_topk(
        df, df, k=2, nprobe=3, n_clusters=3, iterations=2,
        label_col="label",
    ).collect()
    assert out, "hard-negative search returned nothing"
    labels = {i: l for i, _, l in vecs}
    by_q: dict[int, list] = {}
    for r in out:
        assert r["query_label"] == labels[r["query_id"]]
        assert r["neighbor_label"] == labels[r["neighbor_id"]]
        assert r["query_label"] != r["neighbor_label"]
        by_q.setdefault(r["query_id"], []).append(r)
    # every query got its k=2 different-label slots filled (the twin
    # did not consume a slot) and ranks are contiguous from 1
    for qid, rows in by_q.items():
        assert sorted(r["rank"] for r in rows) == [1, 2], qid
    # vector 4's hardest negatives are the diagonal-adjacent ones from
    # labels 0 and 1, not its twin 5
    top4 = {r["neighbor_id"] for r in by_q[4]}
    assert 5 not in top4 and top4 <= {0, 1, 2, 3}


def test_rrf_fuse_bruteforce(spark):
    from graphlite_spark.operators.similarity import rrf_fuse

    # two hand-built rankings with a shared pair, a ranking-only pair,
    # and a tie broken by neighbor_id
    r1 = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 20, 1)],
        "query_id long, neighbor_id long, rank int",
    )
    r2 = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2), (2, 21, 1)],
        "query_id long, neighbor_id long, rank int",
    )
    out = {
        (r["query_id"], r["neighbor_id"]):
            (r["rrf_micros"], r["n_lists"], r["rank"])
        for r in rrf_fuse([r1, r2], k=3, c=60).collect()
    }
    m1 = round(1e6 / 61)   # rank 1 term
    m2 = round(1e6 / 62)   # rank 2 term
    assert out[(1, 11)] == (m1 + m2, 2, 1)   # in both lists -> wins
    # 10 and 12 tie at m1... no: 10 has m1 (rank1 in r1), 12 has m2
    assert out[(1, 10)] == (m1, 1, 2)
    assert out[(1, 12)] == (m2, 1, 3)
    # query 2: both singles score m1 — tie breaks to smaller neighbor
    assert out[(2, 20)] == (m1, 1, 1)
    assert out[(2, 21)] == (m1, 1, 2)
