"""SemDeDup: numpy replay of the within-cluster dominance rule over the
(already oracle-pinned) k-means assignment, plus a planted-duplicate
fixture where the expected survivors are known."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from graphlite_spark.operators.dedup import semdedup
from graphlite_spark.operators.kmeans import kmeans_embeddings


def _frame(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_semdedup_replay_and_planted_dups(spark):
    rng = np.random.RandomState(3)
    # three well-separated directions; each with a planted near-duplicate
    base = rng.randn(3, 16).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = []
    for b in base:
        vecs.append(b)
        vecs.append(b + rng.randn(16).astype(np.float32) * 0.01)  # near-dup
    for _ in range(6):  # fillers
        v = rng.randn(16).astype(np.float32)
        vecs.append(v / np.linalg.norm(v))
    df = _frame(spark, vecs)
    tau, k, iters = 0.9, 4, 2

    got = {
        r["vec_id"]: (r["cluster"], r["dist_sq"], r["keep"])
        for r in semdedup(df, k=k, iterations=iters, tau=tau).collect()
    }
    assert set(got) == set(range(len(vecs)))

    # replay dominance over the Spark k-means assignment (itself pinned
    # by kmeans_embeddings' own oracle tests): float32-cast then double
    # cosine, rounded to 6dp, rank = (dist_sq, id)
    assign = {
        r["vec_id"]: (r["cluster"], r["dist_sq"])
        for r in kmeans_embeddings(df, k=k, iterations=iters).collect()
    }
    V = [np.asarray(v, dtype=np.float32).astype(np.float64) for v in vecs]

    def cos(a, b):
        return round(
            float(V[a] @ V[b])
            / (float(np.sqrt(V[a] @ V[a])) * float(np.sqrt(V[b] @ V[b]))),
            6,
        )

    for x in range(len(vecs)):
        cx, dx = assign[x]
        dominated = any(
            assign[y][0] == cx
            and (assign[y][1], y) < (dx, x)
            and cos(x, y) >= tau
            for y in range(len(vecs))
            if y != x
        )
        assert got[x] == (cx, dx, 0 if dominated else 1), x

    # each planted pair loses exactly its farther-from-centroid member
    # whenever the pair landed in one cluster (cos ~0.9999 >> tau)
    for i in (0, 2, 4):
        a, b = got[i], got[i + 1]
        if a[0] == b[0]:
            assert a[2] + b[2] == 1, (i, a, b)
    # something survives in every cluster
    for cl in {c for (c, _, _) in got.values()}:
        assert any(c == cl and kp == 1 for (c, _, kp) in got.values())


def test_boilerplate_coverage_bruteforce(spark):
    from graphlite_spark.operators.dedup import boilerplate_coverage

    # source A (4 docs): "x y z" appears in 3/4 docs (75% >= 50%o cut of
    # 200 permille=20%); doc3 has < 3 tokens -> coverage 0
    rows = [
        (0, "x y z a b", "A"),      # shingles: xyz, yza, zab
        (1, "x y z c", "A"),        # xyz, yzc
        (2, "x y z", "A"),          # xyz
        (3, "q r", "A"),            # no shingles
        (4, "u v w t", "B"),        # uvw, vwt (each df=1 of 1 doc=100%)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: (r["n_docs"], r["n_boiler_shingles"],
                         r["mean_coverage_micros"])
           for r in boilerplate_coverage(docs, permille=200).collect()}

    def cov(nb, ns):
        return (1_000_000 * nb - (1_000_000 * nb) % ns) // ns

    # A: boiler shingles = those with df*1000 >= 4*200 (df >= 0.8 -> df>=1)
    # ... every shingle passes at 20% of 4 docs; distinct types are
    # {xyz, yza, zab, yzc} = 4
    a_covs = [cov(3, 3), cov(2, 2), cov(1, 1), 0]
    sa = sum(a_covs)
    assert got["A"] == (4, 4, (sa - sa % 4) // 4)
    assert got["B"] == (1, 2, 1_000_000)

    # stricter cut: 800 permille -> df >= 3.2 -> only xyz (df 3) fails;
    # nothing is boilerplate in A
    got2 = {r["source"]: (r["n_boiler_shingles"], r["mean_coverage_micros"])
            for r in boilerplate_coverage(docs, permille=800).collect()}
    assert got2["A"] == (0, 0)
    assert got2["B"] == (2, 1_000_000)


def test_cross_source_duplication_bruteforce(spark):
    from graphlite_spark.operators.dedup import cross_source_duplication

    rows = [
        (0, "same text", "A"), (1, "same text", "B"),   # shared digest
        (2, "same text", "B"),                           # dup WITHIN B: no extra pair
        (3, "other", "A"), (4, "other", "C"),            # A-C share one
        (5, "only a", "A"), (6, "same text", "C"),       # A-C and B-C via "same text"
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {(r["source_a"], r["source_b"]): r["n_shared_digests"]
           for r in cross_source_duplication(docs).collect()}
    assert got == {("A", "B"): 1, ("A", "C"): 2, ("B", "C"): 1}, got


def test_cross_source_duplication_prefix_mode(spark):
    from graphlite_spark.operators.dedup import cross_source_duplication

    # full texts differ, but the first-2-token leads collide across
    # sources ("breaking news ..." syndicated opening)
    rows = [
        (0, "breaking news body one", "A"),
        (1, "breaking news body two", "B"),
        (2, "totally different text", "B"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    full = cross_source_duplication(docs).collect()
    assert full == []  # no full-text dup anywhere
    pre = {(r["source_a"], r["source_b"]): r["n_shared_digests"]
           for r in cross_source_duplication(docs, prefix_tokens=2).collect()}
    assert pre == {("A", "B"): 1}
