"""Round-5 operators vs Python brute force: dyad census, vocabulary Zipf
MLE, tool transition matrix, sorted-neighborhood dedup."""

from __future__ import annotations

import hashlib
import itertools
import math
import random

import pytest

from pyspark.sql import functions as F


def test_dyad_census_bruteforce(spark):
    from graphlite_spark.algos.stats import dyad_census

    random.seed(11)
    n = 12
    arcs = [(a, b) for a in range(n) for b in range(n)
            if a != b and random.random() < 0.3]
    v = spark.range(n).select("id")
    e = spark.createDataFrame(arcs, "src long, dst long")
    got = dyad_census(v, e).collect()[0]
    arcset = set(arcs)
    m = a = 0
    for x, y in itertools.combinations(range(n), 2):
        fwd, rev = (x, y) in arcset, (y, x) in arcset
        if fwd and rev:
            m += 1
        elif fwd or rev:
            a += 1
    null = n * (n - 1) // 2 - m - a
    assert (got["n_mutual"], got["n_asym"], got["n_null"]) == (m, a, null)

    # empty graph: all dyads null, one row
    e0 = spark.createDataFrame([], "src long, dst long")
    g0 = dyad_census(v, e0).collect()[0]
    assert (g0["n_mutual"], g0["n_asym"], g0["n_null"]) == (0, 0, n * (n - 1) // 2)


def test_vocab_zipf_alpha_bruteforce(spark):
    from graphlite_spark.operators.profiling import vocab_zipf_alpha

    docs = [
        (0, "the the the cat cat sat"),
        (1, "the cat ran far"),
        (2, "a dog sat sat the"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = vocab_zipf_alpha(df, fmin=2).collect()[0]
    counts: dict[str, int] = {}
    for _, t in docs:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    tail = [c for c in counts.values() if c >= 2]
    slt = sum(round(math.log(c / 1.5) * 1_000_000) for c in tail)
    assert got["n_tail"] == len(tail)
    assert got["alpha"] == pytest.approx(
        round(1.0 + len(tail) * 1_000_000.0 / slt, 6), abs=1e-9)

    # no term reaches fmin -> NULL alpha, 0 tail
    tiny = spark.createDataFrame([(0, "x y z")], "doc_id long, text string")
    g0 = vocab_zipf_alpha(tiny, fmin=2).collect()[0]
    assert g0["n_tail"] == 0 and g0["alpha"] is None


def test_tool_transitions_bruteforce(spark):
    from graphlite_spark.sources.transcripts import tool_transitions

    rows = [
        # conv A: a -> b -> a  (tool turns 1, 3, 7; non-tool turns between)
        ("A", 0, None), ("A", 1, "a"), ("A", 2, None), ("A", 3, "b"),
        ("A", 7, "a"),
        # conv B: a -> a
        ("B", 1, "a"), ("B", 2, "a"),
        # conv C: single tool turn -> no transition
        ("C", 5, "b"),
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, tool string")
    got = {(r["prev_tool"], r["tool"]): (r["n"], r["p"])
           for r in tool_transitions(t).collect()}
    # transitions: a->b (A), b->a (A), a->a (B)
    assert got[("a", "b")] == (1, 0.5)
    assert got[("a", "a")] == (1, 0.5)
    assert got[("b", "a")] == (1, 1.0)
    assert len(got) == 3


def test_sorted_neighborhood_bruteforce(spark):
    from graphlite_spark.operators.dedup import sorted_neighborhood_pairs

    docs = [
        (0, "alpha beta gamma delta epsilon common tail"),
        (1, "alpha beta gamma delta epsilon common tail!"),  # near-dup of 0
        (2, "alpha beta gamma delta zeta other words"),      # shares prefix
        (3, "zzz completely different text entirely here"),
        (4, "zzz completely different text entirely here"),  # exact dup of 3
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = sorted_neighborhood_pairs(df, window=2, threshold=0.3).collect()
    pairs = {(r["a"], r["b"]): r for r in out}
    # replicate: sort key = first 16 alnum chars of lowercased text
    def key(t):
        return "".join(c for c in t.lower() if c.isalnum())[:16]
    order = sorted(range(5), key=lambda i: (key(docs[i][1]), i))
    # doc 1 strips to the same key as doc 0 -> adjacent; 3/4 adjacent
    i0, i1 = order.index(0), order.index(1)
    assert abs(i0 - i1) <= 2
    lo, hi = (0, 1) if i0 < i1 else (1, 0)
    assert (lo, hi) in pairs and pairs[(lo, hi)]["jaccard"] > 0.5
    i3, i4 = order.index(3), order.index(4)
    lo, hi = (3, 4) if i3 < i4 else (4, 3)
    assert (lo, hi) in pairs and pairs[(lo, hi)]["jaccard"] == 1.0
    # every reported pair is within the rank window and above threshold
    for r in out:
        assert 1 <= r["rank_gap"] <= 2 and r["jaccard"] >= 0.3
    # determinism
    out2 = sorted_neighborhood_pairs(df, window=2, threshold=0.3).collect()
    assert sorted(map(str, out)) == sorted(map(str, out2))

    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, window=0)


def test_round5_ops_partition_invariance(spark):
    """The round-5 operators are pure functions of their inputs:
    identical outputs when the input arrives repartitioned with a
    different partition count / row order (the determinism property the
    whole oracle design rests on)."""
    import random

    from graphlite_spark.algos.stats import dyad_census
    from graphlite_spark.operators.dedup import sorted_neighborhood_pairs
    from graphlite_spark.operators.profiling import vocab_zipf_alpha
    from graphlite_spark.sources.transcripts import tool_transitions

    random.seed(23)
    arcs = [(a, b) for a in range(40) for b in range(40)
            if a != b and random.random() < 0.08]
    v = spark.range(40).select("id")
    e = spark.createDataFrame(arcs, "src long, dst long")

    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "common"]
    docs = spark.createDataFrame(
        [(i, " ".join(random.choice(words) for _ in range(12)))
         for i in range(60)],
        "doc_id long, text string",
    )
    tr = spark.createDataFrame(
        [(f"c{i % 5}", i, random.choice(["a", "b", None])) for i in range(80)],
        "conv_id string, turn_idx int, tool string",
    )

    def rows(df):
        return sorted(map(str, df.collect()))

    from graphlite_spark.algos.centrality import eigenvector_centrality

    for build, frame in (
        (lambda f: dyad_census(v, f), e),
        (lambda f: eigenvector_centrality(v, f, iterations=4), e),
        (lambda f: vocab_zipf_alpha(f), docs),
        (lambda f: tool_transitions(f), tr),
        (lambda f: sorted_neighborhood_pairs(f, window=3, threshold=0.1), docs),
    ):
        a = rows(build(frame))
        b = rows(build(frame.repartition(7)))
        c = rows(build(frame.repartition(3, frame.columns[0])))
        assert a == b == c and a  # non-empty and partition-invariant


def test_eigenvector_centrality_bruteforce(spark):
    from graphlite_spark.algos.centrality import eigenvector_centrality

    random.seed(31)
    n = 25
    arcs = [(a, b) for a in range(n) for b in range(n)
            if a != b and random.random() < 0.12]
    # guarantee a cycle so mass survives
    arcs += [(0, 1), (1, 2), (2, 0)]
    arcs = sorted(set(arcs))
    v = spark.range(n).select("id")
    e = spark.createDataFrame(arcs, "src long, dst long")
    got = {r["id"]: r["eig"]
           for r in eigenvector_centrality(v, e, iterations=5).collect()}
    x = {i: 1_000_000 for i in range(n)}
    for _ in range(5):
        s = {i: 0 for i in range(n)}
        for a, b in arcs:
            s[b] += x[a]
        mx = max(s.values())
        x = {i: (1_000_000 * s[i]) // mx if mx > 0 else 0 for i in range(n)}
    assert got == x
    assert max(got.values()) == 1_000_000  # max-normalized each round

    # empty edge set: everything decays to zero after one round
    e0 = spark.createDataFrame([], "src long, dst long")
    z = eigenvector_centrality(v, e0, iterations=2).collect()
    assert all(r["eig"] == 0 for r in z)


def test_conv_dedup_minhash_finds_near_dup_convs(spark):
    """Two conversations sharing most turn text land in the same LSH
    bucket with high verified Jaccard; an unrelated one never pairs.
    (The entry query's sf parity runs on diverse synthetic convs where
    0 pairs is the truth — this test proves the positive path.)"""
    from pyspark.sql import functions as F

    from graphlite_spark.operators.dedup import minhash_lsh_candidates

    base = ("please run the data pipeline now and report the status "
            "of every stage including shuffle spill and skew").split()
    rows = []
    for i, w in enumerate(base):
        rows.append(("ca", i, " ".join(base[max(0, i - 2):i + 3])))
        # cb: same turns, one word tweaked at the end
        rows.append(("cb", i, " ".join(base[max(0, i - 2):i + 3])))
    rows.append(("cb", len(base), "one extra closing turn"))
    for i in range(8):
        rows.append(("cx", i, f"completely different topic {i} about cooking recipes"))
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    convdocs = t.groupBy("conv_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("turn_idx", "text"))),
                lambda s: s.text,
            ),
            " ",
        ).alias("text")
    )
    got = {(r["a"], r["b"]): r["jaccard"]
           for r in minhash_lsh_candidates(convdocs, id_col="conv_id").collect()}
    assert ("ca", "cb") in got and got[("ca", "cb")] > 0.8
    assert not any("cx" in pair for pair in got)


def test_simhash_hamming1_multiprobe(spark):
    """Multiprobe finds hamming-0 AND hamming-1 pairs that exact
    buckets alone would split, never a pair at distance >= 2; verified
    against a python brute force over the same signatures."""
    from graphlite_spark.operators.dedup import (
        simhash_hamming_pairs,
        simhash_signatures,
    )

    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lam mu nu xi omicron pi rho sigma tau upsilon").split()
    rows = []
    for d in range(12):
        # heavy overlap between consecutive docs -> small hamming gaps
        rows.append((d, " ".join(words[(d % 4):(d % 4) + 14])))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["doc_id"]: r["simhash"]
            for r in simhash_signatures(docs).collect()}
    got = {(r["a"], r["b"]): r["hamming"]
           for r in simhash_hamming_pairs(docs).collect()}
    want = {}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= 1:
                want[(a, b)] = h
    assert got == want
    assert any(h == 0 for h in got.values())  # identical-sig docs exist


def test_zorder_layout_grid(spark):
    """16x16 full grid, bits=4, files=16: every z bucket is a 4x4
    Morton tile (span 4 on BOTH dims), every linear bucket one x value
    (span 1 on x, 16 on day) — hand-computed exact micro ratios."""
    import datetime

    from graphlite_spark.operators.partitioning import zorder_layout

    rows = [
        (x, datetime.datetime(1970, 1, 1) + datetime.timedelta(days=d))
        for x in range(16)
        for d in range(16)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["layout"], r["dim"]): (
            r["n_buckets"], r["avg_span_micros"], r["max_span"]
        )
        for r in zorder_layout(df, bits=4, files=16).collect()
    }
    assert got == {
        ("zorder", "user_id"): (16, 250000, 4),
        ("zorder", "day"): (16, 250000, 4),
        ("linear", "user_id"): (16, 62500, 1),
        ("linear", "day"): (16, 1000000, 16),
    }


def test_zorder_layout_brute(spark):
    """Scattered deterministic points vs a python brute force of the
    identical scale/interleave/bucket/rollup math."""
    import datetime

    from graphlite_spark.operators.partitioning import zorder_layout

    bits, files, dom = 5, 8, 32
    pts = [((i * 37) % 200, (i * 91) % 150) for i in range(300)]
    rows = [
        (x, datetime.datetime(1970, 1, 1) + datetime.timedelta(days=d))
        for x, d in pts
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["layout"], r["dim"]): (
            r["n_buckets"], r["avg_span_micros"], r["max_span"]
        )
        for r in zorder_layout(df, bits=bits, files=files).collect()
    }

    xmn, xmx = min(p[0] for p in pts), max(p[0] for p in pts)
    ymn, ymx = min(p[1] for p in pts), max(p[1] for p in pts)
    scaledpts = [
        (
            ((x - xmn) * (dom - 1)) // (xmx - xmn),
            ((y - ymn) * (dom - 1)) // (ymx - ymn),
        )
        for x, y in pts
    ]

    def morton(xs, ys):
        return sum(
            (((xs >> i) & 1) << (2 * i)) + (((ys >> i) & 1) << (2 * i + 1))
            for i in range(bits)
        )

    def rollup(bucket_of):
        buckets: dict = {}
        for xs, ys in scaledpts:
            buckets.setdefault(bucket_of(xs, ys), []).append((xs, ys))
        spans = [
            (
                max(x for x, _ in v) - min(x for x, _ in v) + 1,
                max(y for _, y in v) - min(y for _, y in v) + 1,
            )
            for v in buckets.values()
        ]
        nb = len(spans)
        return {
            "user_id": (
                nb,
                (1000000 * sum(s[0] for s in spans)) // (nb * dom),
                max(s[0] for s in spans),
            ),
            "day": (
                nb,
                (1000000 * sum(s[1] for s in spans)) // (nb * dom),
                max(s[1] for s in spans),
            ),
        }

    zstep, lstep = (dom * dom) // files, dom // files
    want = {}
    for dim, v in rollup(lambda xs, ys: morton(xs, ys) // zstep).items():
        want[("zorder", dim)] = v
    for dim, v in rollup(lambda xs, ys: xs // lstep).items():
        want[("linear", dim)] = v
    assert got == want
    # the layout story itself: z-order must bound the day span strictly
    # below the linear layout's (which can't cluster the second key)
    assert (
        got[("zorder", "day")][1] < got[("linear", "day")][1]
    )
