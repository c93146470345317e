"""Embedding-quality readouts vs Python brute force: matryoshka
(dimension-truncation) recall, centroid outliers, PQ distortion."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(x * x for x in b) ** 0.5
    return round(d / (na * nb), 6)


def _topk(vecs, qid, k, dims=None):
    q = vecs[qid][:dims] if dims else vecs[qid]
    scored = sorted(
        ((-_cos(q, v[:dims] if dims else v), i)
         for i, v in vecs.items() if i != qid),
    )
    return {i for _, i in scored[:k]}


def test_matryoshka_recall_bruteforce(spark):
    from graphlite_spark.operators.similarity import matryoshka_recall

    # 8 vectors, 4 dims; the last 2 dims carry most of the signal so a
    # dims=2 prefix search must visibly lose recall
    vecs = {
        0: [1.0, 0.0, 5.0, 0.0],
        1: [1.0, 0.1, 0.0, 5.0],
        2: [0.9, 0.0, 4.8, 0.1],
        3: [1.0, 0.0, 0.1, 4.9],
        4: [0.0, 1.0, 5.0, 0.2],
        5: [0.1, 1.0, 0.2, 5.0],
        6: [0.5, 0.5, 2.5, 2.5],
        7: [1.0, 0.05, 2.4, 2.6],
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["query_id"]: r
        for r in matryoshka_recall(
            df, df.where(F.col("vec_id") < 3), k=3, dims=2
        ).collect()
    }
    assert set(got) == {0, 1, 2}
    for qid in range(3):
        # float32 storage: recompute truth on the float32-rounded values
        import numpy as np
        v32 = {i: list(np.array(v, dtype=np.float32).astype(float))
               for i, v in vecs.items()}
        truth = _topk(v32, qid, 3)
        approx = _topk(v32, qid, 3, dims=2)
        r = got[qid]
        assert r["n_truth"] == 3 and r["n_approx"] == 3
        assert r["n_hits"] == len(truth & approx)
        assert r["recall"] == pytest.approx(
            round(len(truth & approx) / 3, 6), abs=1e-9)


def _tdiv(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_centroid_outliers_bruteforce(spark):
    from graphlite_spark.operators.similarity import centroid_outliers

    vecs = {
        0: [0.0, 0.0],
        1: [1.0, 1.0],
        2: [-1.0, -1.0],
        3: [10.0, -10.0],   # the outlier
        4: [0.5, -0.5],
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    got = centroid_outliers(df, k=3).collect()
    q = {i: [round(x * 1_000_000) for x in v] for i, v in vecs.items()}
    n = len(q)
    cent = [_tdiv(sum(v[j] for v in q.values()), n) for j in range(2)]
    dist = {
        i: sum((v[j] - cent[j]) ** 2 for j in range(2))
        for i, v in q.items()
    }
    want = sorted(dist.items(), key=lambda t: (-t[1], t[0]))[:3]
    assert [(r["vec_id"], r["dist_sq"], r["rank"]) for r in got] == [
        (i, d, rk + 1) for rk, (i, d) in enumerate(want)
    ]
    # negative-sum centroid exercised: mean of dim 1 is negative when
    # the outlier dominates -> truncation toward zero, not floor
    assert cent[1] < 0


def test_pq_distortion_consistent_with_encode(spark):
    from graphlite_spark.operators.kmeans import pq_distortion, pq_encode

    import random

    random.seed(7)
    df = spark.createDataFrame(
        [(i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    enc = pq_encode(df, m=2, k=4, iterations=2).collect()
    got = {r["sub"]: r for r in pq_distortion(df, m=2, k=4, iterations=2).collect()}
    assert set(got) == {0, 1}
    for s in (0, 1):
        rows = [r for r in enc if r["sub"] == s]
        tot = sum(r["dist_sq"] for r in rows)
        assert got[s]["n_vectors"] == len(rows) == 40
        assert got[s]["total_err"] == tot
        assert got[s]["mean_err"] == tot // 40


def test_embedding_health_bruteforce(spark):
    import math

    from graphlite_spark.operators.similarity import embedding_health

    vecs = {
        0: [3.0, 4.0],     # norm 5.0
        1: [0.0, 0.0],     # zero-norm
        2: [1.0, 0.0],
        3: [float("nan"), 1.0],   # non-finite coordinate
        4: [6.0, 8.0],     # norm 10.0
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    got = embedding_health(df).collect()[0]
    assert got["n_vectors"] == 5
    assert got["n_zero"] == 1
    assert got["n_nonfinite"] == 1
    assert got["min_norm"] == 0
    assert got["max_norm"] == 10_000_000
    # sanitized norms: NaN coord -> 0, so row 3's norm = |(0, 1)| = 1e6;
    # sorted {0, 1e6, 1e6, 5e6, 10e6} -> median (rank 3) = 1e6
    norms = sorted(
        round(math.sqrt(sum(
            (round(x * 1_000_000) if math.isfinite(x) else 0) ** 2
            for x in v
        )))
        for v in vecs.values()
    )
    assert got["p50_norm"] == norms[(5 * 50 + 99) // 100 - 1] == 1_000_000
