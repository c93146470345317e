"""Brute-force cross-check for neighborhood feature aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphlite_spark.operators.neighborhood import neighborhood_agg
from tests.reference_sim import random_digraph


def test_neighborhood_agg_directions(spark):
    edges = random_digraph(40, 90, seed=17)
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    v = spark.range(40).select("id")
    vals = spark.createDataFrame(
        [(i, (7 * i + 3) % 23) for i in range(40)], "id long, value long"
    )
    und: dict[int, set[int]] = {i: set() for i in range(40)}
    outs: dict[int, set[int]] = {i: set() for i in range(40)}
    ins: dict[int, set[int]] = {i: set() for i in range(40)}
    for s, d in edges:
        if s != d:
            und[s].add(d), und[d].add(s)
            outs[s].add(d), ins[d].add(s)
    val = {i: (7 * i + 3) % 23 for i in range(40)}
    for direction, nbrs in (("both", und), ("out", outs), ("in", ins)):
        got = {r["id"]: (r["n_nbrs"], r["sum_val"], r["min_val"],
                         r["max_val"], r["mean_val"])
               for r in neighborhood_agg(v, e, vals, "value",
                                         direction).collect()}
        for i in range(40):
            ns = nbrs[i]
            if not ns:
                assert got[i] == (0, None, None, None, None), (direction, i)
            else:
                vs = [val[j] for j in ns]
                want = (len(vs), sum(vs), min(vs), max(vs),
                        round(sum(vs) / len(vs), 6))
                assert got[i] == want, (direction, i, got[i], want)


def test_neighborhood_agg_fractional_values(spark):
    """Fractional attributes must come back as doubles, not silently
    truncated to long (the round-3 advisory)."""
    e = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 1.0)], "src long, dst long, weight double"
    )
    v = spark.range(3).select("id")
    vals = spark.createDataFrame(
        [(0, 0.5), (1, 1.25), (2, 2.5)], "id long, value double"
    )
    got = {r["id"]: (r["n_nbrs"], r["sum_val"], r["min_val"],
                     r["max_val"], r["mean_val"])
           for r in neighborhood_agg(v, e, vals, "value", "out").collect()}
    assert got[0] == (2, 3.75, 1.25, 2.5, 1.875)
    out_schema = dict(neighborhood_agg(v, e, vals, "value", "out").dtypes)
    assert out_schema["sum_val"] == "double"
    # integral inputs keep the exact BIGINT surface
    ivals = spark.createDataFrame([(0, 5), (1, 7), (2, 9)],
                                  "id long, value long")
    ischema = dict(neighborhood_agg(v, e, ivals, "value", "out").dtypes)
    assert ischema["sum_val"] == "bigint"


def test_neighborhood_agg_bad_direction(spark):
    import pytest

    e = spark.createDataFrame([(0, 1, 1.0)],
                              "src long, dst long, weight double")
    v = spark.range(2).select("id")
    vals = v.withColumn("value", F.lit(1).cast("long"))
    with pytest.raises(ValueError, match="direction"):
        neighborhood_agg(v, e, vals, "value", "sideways")


def test_token_cooccurrence_bruteforce(spark):
    from itertools import combinations

    from graphlite_spark.functions.text import STOPWORDS
    from graphlite_spark.operators.cooccurrence import token_cooccurrence

    rows = [
        (0, "red fox the red dog"),
        (1, "fox dog"),
        (2, "red cat"),
        (3, "dog cat red"),
        (4, "the the the"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["tok_a"], r["tok_b"]): r["n_docs"]
           for r in token_cooccurrence(docs, min_count=1).collect()}
    want: dict[tuple[str, str], int] = {}
    for _, text in rows:
        toks = sorted({t for t in text.split() if t not in STOPWORDS})
        for a, b in combinations(toks, 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want
    # min_count filters the tail
    got2 = {(r["tok_a"], r["tok_b"]): r["n_docs"]
            for r in token_cooccurrence(docs, min_count=2).collect()}
    assert got2 == {k: v for k, v in want.items() if v >= 2}


def test_tf_idf_bruteforce(spark):
    import math

    from graphlite_spark.operators.tfidf import tf_idf

    rows = [(0, "red fox red"), (1, "fox dog"), (2, "red cat dog dog")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_id"], r["term"]): (r["tf"], r["df"], r["tfidf_micros"])
           for r in tf_idf(docs).collect()}
    tf: dict[tuple[int, str], int] = {}
    for did, text in rows:
        for t in text.split():
            tf[(did, t)] = tf.get((did, t), 0) + 1
    df_: dict[str, int] = {}
    for (_, t) in tf:
        df_[t] = df_.get(t, 0) + 1
    want = {
        (did, t): (c, df_[t], c * round(1_000_000.0 * math.log(3.0 / df_[t])))
        for (did, t), c in tf.items()
    }
    assert got == want


def test_weighted_pagerank_equals_uniform_at_equal_weights(spark):
    from graphlite_spark.algos.pagerank import pagerank, weighted_pagerank
    from pyspark.sql import functions as F

    edges = random_digraph(50, 140, seed=3)
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    ).distinct()
    v = spark.range(50).select("id")
    got = {r["id"]: r["rank_micros"] / 1e6
           for r in weighted_pagerank(v, e, supersteps=6).collect()}
    res = pagerank(v, e, fixed_supersteps=6)
    want = {r["id"]: r["value"] for r in res.state.collect()}
    assert set(got) == set(want)
    for k in got:
        # fixed-point floor truncation: <= ~1 micro per in-edge per round
        assert abs(got[k] - want[k]) < 1e-4, (k, got[k], want[k])


def test_weighted_pagerank_weights_matter(spark):
    from graphlite_spark.algos.pagerank import weighted_pagerank

    # 0 -> 1 (heavy), 0 -> 2 (light): rank must follow the weight
    e = spark.createDataFrame(
        [(0, 1, 9.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)],
        "src long, dst long, weight double",
    )
    v = spark.range(3).select("id")
    got = {r["id"]: r["rank_micros"]
           for r in weighted_pagerank(v, e, supersteps=8).collect()}
    assert got[1] > got[2]


def test_degree_assortativity_bruteforce(spark):
    import math

    from graphlite_spark.algos.stats import degree_assortativity

    edges = random_digraph(40, 90, seed=21)
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    und = {(s, d) for s, d in edges if s != d} | {
        (d, s) for s, d in edges if s != d
    }
    deg: dict[int, int] = {}
    for s, _ in und:
        deg[s] = deg.get(s, 0) + 1
    xs = [deg[s] for s, d in und]
    ys = [deg[d] for s, d in und]
    m = len(und)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    want = (m * sxy - sx * sy) / math.sqrt(
        float(m * sxx - sx * sx) * float(m * syy - sy * sy)
    )
    row = degree_assortativity(e).collect()[0]
    assert row["m"] == m
    assert abs(row["assortativity"] - round(want, 6)) < 1e-9


def test_dedup_representatives_bruteforce(spark):
    from graphlite_spark.functions.text import quality_exprs, tokens_expr
    from graphlite_spark.operators.dedup import (
        dedup_representatives,
        near_dup_clusters,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again!"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "completely different text about graph engines and sparks"),
        (4, "completely different text about graph engines and sparks too"),
        (5, "a lone unrelated document"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    clusters = {r["doc_id"]: r["cluster"]
                for r in near_dup_clusters(docs, threshold=0.3).collect()}
    q = {r["doc_id"]: r["q"]
         for r in docs.select(
             "doc_id", quality_exprs(tokens_expr("text"))["quality"].alias("q")
         ).collect()}
    want: dict[int, tuple] = {}
    for did, cl in clusters.items():
        key = (-q[did], did)
        if cl not in want or key < want[cl][0]:
            want[cl] = (key, did)
    sizes: dict[int, int] = {}
    for cl in clusters.values():
        sizes[cl] = sizes.get(cl, 0) + 1
    got = {r["cluster"]: (r["rep_doc_id"], r["n_docs"], r["rep_quality"])
           for r in dedup_representatives(docs, threshold=0.3).collect()}
    assert set(got) == set(sizes)
    for cl, (rep, n, rq) in got.items():
        assert rep == want[cl][1], (cl, rep, want[cl])
        assert n == sizes[cl]
        assert rq == q[rep]
    # the dup groups must actually cluster (the test is vacuous otherwise)
    assert clusters[0] == clusters[1]
    assert len(set(clusters.values())) < len(rows)


def test_modularity_bruteforce(spark):
    from graphlite_spark.algos.stats import modularity

    edges = random_digraph(30, 70, seed=33)
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    labels = spark.createDataFrame(
        [(i, i % 4) for i in range(30)], "id long, label long"
    )
    und = {(s, d) for s, d in edges if s != d} | {
        (d, s) for s, d in edges if s != d
    }
    lab = {i: i % 4 for i in range(30)}
    m2 = len(und)
    same = sum(1 for s, d in und if lab[s] == lab[d])
    dc: dict[int, int] = {}
    for s, _ in und:
        dc[lab[s]] = dc.get(lab[s], 0) + 1
    sdd = sum(c * c for c in dc.values())
    want = round((m2 * same - sdd) / (m2 * m2), 6)
    row = modularity(e, labels).collect()[0]
    assert row["m2"] == m2
    assert abs(row["modularity"] - want) < 1e-9
    # a perfectly modular partition (each community one component) beats
    # the random partition above when communities align with edges: the
    # all-in-one partition scores exactly 0
    one = spark.createDataFrame([(i, 0) for i in range(30)],
                                "id long, label long")
    assert modularity(e, one).collect()[0]["modularity"] == 0.0


def test_tfidf_cosine_pairs_bruteforce(spark):
    import math

    from graphlite_spark.operators.tfidf import tfidf_cosine_pairs

    rows = [
        (0, "red fox jumps high"),
        (1, "red fox jumps low"),
        (2, "blue whale swims deep"),
        (3, "blue whale swims deep today"),
        (4, "unrelated words entirely here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["a"], r["b"]): r["cos"]
           for r in tfidf_cosine_pairs(docs, min_cos=0.01,
                                       max_df_permille=1000).collect()}
    n = len(rows)
    tf: dict[tuple[int, str], int] = {}
    for did, text in rows:
        for t in text.split():
            tf[(did, t)] = tf.get((did, t), 0) + 1
    df: dict[str, int] = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    w = {(did, t): c * round(1_000_000.0 * math.log(n / df[t]))
         for (did, t), c in tf.items()}
    want = {}
    for a in range(n):
        for b in range(a + 1, n):
            dot = sum(w[(a, t)] * w[(b, t)]
                      for t in {t for (d, t) in w if d == a}
                      if (b, t) in w)
            if dot == 0:
                continue
            na = math.sqrt(sum(v * v for (d, _), v in w.items() if d == a))
            nb = math.sqrt(sum(v * v for (d, _), v in w.items() if d == b))
            c = round(dot / (na * nb), 6)
            if c >= 0.01:
                want[(a, b)] = c
    assert got == want
    # sibling pairs score high, cross-topic pairs are absent or tiny
    assert got[(0, 1)] > 0.4 and got[(2, 3)] > 0.5
    assert (0, 2) not in got


def test_bm25_topk_bruteforce(spark):
    import math

    from graphlite_spark.operators.tfidf import bm25_topk

    rows = [
        (0, "red fox red fox red"),
        (1, "fox dog"),
        (2, "red cat dog dog cat cat"),
        (3, "bird bird bird"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["doc_id"], r["n_terms"], r["score_micros"])
           for r in bm25_topk(docs, ["red", "dog"], k=3).collect()]

    k1, b = 1.2, 0.75
    toks = {d: t.split() for d, t in rows}
    n = len(rows)
    tot = sum(len(t) for t in toks.values())
    tf = {(d, w): toks[d].count(w) for d in toks for w in ("red", "dog")
          if w in toks[d]}
    df_ = {w: sum(1 for (d2, w2) in tf if w2 == w) for w in ("red", "dog")}
    idf = {w: round(1e6 * math.log((n - df_[w] + 0.5) / (df_[w] + 0.5) + 1.0))
           for w in df_}
    score: dict[int, list[int]] = {}
    for (d, w), f in tf.items():
        denom = f + k1 * (1.0 - b) + k1 * b * (len(toks[d]) * n / tot)
        score.setdefault(d, []).append(round(idf[w] * f * (k1 + 1.0) / denom))
    want = sorted(
        ((d, len(v), sum(v)) for d, v in score.items()),
        key=lambda r: (-r[2], r[0]),
    )[:3]
    assert got == want, (got, want)
    # the all-"bird" doc never matches; the two-term doc 2 outranks the
    # saturating single-term docs (BM25's tf saturation doing its job)
    assert got[0][0] == 2 and all(d != 3 for d, _, _ in got)


def test_top_terms_per_doc_bruteforce(spark):
    import math

    from graphlite_spark.operators.tfidf import top_terms_per_doc

    rows = [(0, "red fox red"), (1, "fox dog"), (2, "red cat dog dog")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["doc_id"], r["rank"], r["term"], r["tf"], r["tfidf_micros"])
           for r in top_terms_per_doc(docs, k=2).collect()]
    tf: dict[tuple[int, str], int] = {}
    for did, text in rows:
        for t in text.split():
            tf[(did, t)] = tf.get((did, t), 0) + 1
    df_: dict[str, int] = {}
    for (_, t) in tf:
        df_[t] = df_.get(t, 0) + 1
    scored: dict[int, list] = {}
    for (did, t), c in tf.items():
        s = c * round(1_000_000.0 * math.log(3.0 / df_[t]))
        scored.setdefault(did, []).append((t, c, s))
    want = []
    for did in sorted(scored):
        ordered = sorted(scored[did], key=lambda x: (-x[2], x[0]))[:2]
        for i, (t, c, s) in enumerate(ordered, 1):
            want.append((did, i, t, c, s))
    assert sorted(got) == sorted(want), (got, want)
