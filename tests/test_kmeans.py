"""Integer-exact k-means vs a Python replay of the identical algorithm
(micro-unit quantization, hash-min seeding, smallest-cluster tie-break,
truncating-division updates), plus partition-count invariance and the
empty-cluster contract."""

from __future__ import annotations

import hashlib

from graphlite_spark.operators.kmeans import _tdiv, kmeans_embeddings


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _make_vectors(n: int, d: int) -> list[tuple[int, list[float]]]:
    # components are exact multiples of 1e-3 so round(x*1e6) is exact in
    # both engines (no rounding-mode sensitivity in the fixture)
    out = []
    for i in range(n):
        vec = [((_h48(f"v:{i}:{j}") % 2001) - 1000) / 1000.0 for j in range(d)]
        out.append((i, vec))
    return out


def _replay(rows: list[tuple[int, list[float]]], k: int, iterations: int):
    q = {i: [round(x * 1_000_000) for x in vec] for i, vec in rows}
    seeds = sorted(q, key=lambda i: (_h48(f"kmeans:{i}"), i))[:k]
    cents = [list(q[i]) for i in seeds]

    def dist(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def assign():
        out = {}
        for i, v in q.items():
            ds = [dist(v, c) for c in cents]
            m = min(ds)
            cl = ds.index(m)  # smallest cluster index on ties
            out[i] = (cl, m)
        return out

    for _ in range(iterations):
        asg = assign()
        sums: dict[int, list[int]] = {}
        cnts: dict[int, int] = {}
        for i, (cl, _) in asg.items():
            cnts[cl] = cnts.get(cl, 0) + 1
            s = sums.setdefault(cl, [0] * len(q[i]))
            for p, x in enumerate(q[i]):
                s[p] += x
        cents = [
            [_tdiv(sums[ci][p], cnts[ci]) for p in range(len(c))]
            if ci in cnts else list(c)  # empty cluster keeps its centroid
            for ci, c in enumerate(cents)
        ]
    return assign()


def test_kmeans_matches_replay(spark):
    rows = _make_vectors(60, 6)
    df = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"]: (r["cluster"], r["dist_sq"])
        for r in kmeans_embeddings(df, k=5, iterations=3).collect()
    }
    want = _replay(rows, k=5, iterations=3)
    assert got == want
    assert len({cl for cl, _ in got.values()}) > 1  # non-degenerate fixture


def test_kmeans_partition_invariance(spark):
    rows = _make_vectors(40, 4)
    df = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id long, embedding array<double>"
    )
    a = sorted(map(tuple, kmeans_embeddings(df, k=3, iterations=2).collect()))
    b = sorted(
        map(tuple, kmeans_embeddings(df.repartition(13), k=3, iterations=2).collect())
    )
    assert a == b


def test_kmeans_fewer_vectors_than_k(spark):
    rows = _make_vectors(3, 4)
    df = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id long, embedding array<double>"
    )
    out = kmeans_embeddings(df, k=8, iterations=2).collect()
    assert len(out) == 3
    # every vector is its own seed -> sits on its own centroid at dist 0
    assert sorted(r["dist_sq"] for r in out) == [0, 0, 0]


def test_tdiv_truncates_toward_zero():
    assert _tdiv(7, 2) == 3
    assert _tdiv(-7, 2) == -3
    assert _tdiv(-1, 3) == 0


def _pq_replay(rows, m, k, iterations):
    """Python replay of pq_encode: per-subspace hash-min-seeded integer
    Lloyd + argmin codes."""
    d = len(rows[0][1])
    sub = d // m
    q = {i: [round(x * 1_000_000) for x in vec] for i, vec in rows}

    def dist(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    out = {}
    for s in range(m):
        qs = {i: v[s * sub:(s + 1) * sub] for i, v in q.items()}
        seeds = sorted(qs, key=lambda i: (_h48(f"kmeans:{i}"), i))[:k]
        cents = [list(qs[i]) for i in seeds]
        for _ in range(iterations):
            groups = {}
            for i, v in qs.items():
                ds = [dist(v, c) for c in cents]
                groups.setdefault(ds.index(min(ds)), []).append(v)
            cents = [
                [
                    _tdiv(sum(v[p] for v in g), len(g))
                    for p in range(sub)
                ]
                if (g := groups.get(ci))
                else c
                for ci, c in enumerate(cents)
            ]
        for i, v in qs.items():
            ds = [dist(v, c) for c in cents]
            mn = min(ds)
            out[(i, s)] = (ds.index(mn), mn)
    return out


def test_pq_encode_matches_replay(spark):
    from graphlite_spark.operators.kmeans import pq_encode

    rows = _make_vectors(30, 16)
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    got = {
        (r["vec_id"], r["sub"]): (r["code"], r["dist_sq"])
        for r in pq_encode(emb, m=4, k=4, iterations=2).collect()
    }
    want = _pq_replay(rows, m=4, k=4, iterations=2)
    assert got == want
    assert len(got) == 30 * 4  # one row per (vector, subspace)


def test_pq_encode_guards(spark):
    from graphlite_spark.operators.kmeans import pq_encode
    import pytest

    emb = spark.createDataFrame(
        _make_vectors(4, 10), "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="not divisible"):
        pq_encode(emb, m=4)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert pq_encode(empty, m=4).count() == 0


def test_kcenter_select_replay(spark):
    """Exact numpy replay of greedy farthest-first: same hash-min seed,
    same micro-unit BIGINT distances, same (dist DESC, id ASC) argmax;
    radius is non-increasing (the greedy certificate)."""
    import numpy as np

    from graphlite_spark.operators.kmeans import kcenter_select

    rng = np.random.RandomState(7)
    vecs = {i: rng.randn(8).astype("float32") for i in range(40)}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    got = [
        (r["center_rank"], r["vec_id"], r["radius_sq"])
        for r in kcenter_select(df, k=5).orderBy("center_rank").collect()
    ]

    q = {
        i: np.array(
            [int(round(float(x) * 1_000_000)) for x in v], dtype=object
        )
        for i, v in vecs.items()
    }
    seed = min(vecs, key=lambda i: (_h48(f"kcenter:{i}"), i))
    sel = [(0, seed, 0)]
    md = {i: int(((q[i] - q[seed]) ** 2).sum()) for i in vecs}
    for r in range(1, 5):
        far = max(md, key=lambda i: (md[i], -i))
        sel.append((r, far, md[far]))
        md = {
            i: min(md[i], int(((q[i] - q[far]) ** 2).sum())) for i in vecs
        }
    assert got == sel
    radii = [c[2] for c in got[1:]]
    assert radii == sorted(radii, reverse=True)
