"""Bigram LM table: hand-checked counts and ranking."""

from __future__ import annotations

from graphlite_spark.operators.ngram_lm import bigram_counts, bigram_next_topk


def test_bigram_counts_and_topk(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c a b"),
            (2, "a b a c"),
            (3, "x"),          # single token: no bigrams
            (4, ""),           # empty: no bigrams
        ],
        "doc_id long, text string",
    )
    got = {(r["w1"], r["w2"]): r["n_pairs"] for r in bigram_counts(docs).collect()}
    assert got == {
        ("a", "b"): 3, ("b", "c"): 1, ("c", "a"): 1, ("b", "a"): 1,
        ("a", "c"): 1,
    }
    top = [
        (r["w1"], r["w2"], r["n_pairs"], r["rn"])
        for r in bigram_next_topk(docs, k=2, min_count=1)
        .orderBy("w1", "rn")
        .collect()
    ]
    # per w1: count desc, then w2 asc
    assert top == [
        ("a", "b", 3, 1), ("a", "c", 1, 2),
        ("b", "a", 1, 1), ("b", "c", 1, 2),
        ("c", "a", 1, 1),
    ]


def test_skipgram_pairs_bruteforce(spark):
    from collections import Counter

    from graphlite_spark.operators.cooccurrence import skipgram_pairs

    texts = [
        "a b c d",
        "a a b",       # repeated center tokens -> multiplicities
        "solo",        # 1 token -> no pairs
        "x y",
    ]
    exp = Counter()
    for t in texts:
        ts = t.split()
        for i, c in enumerate(ts):
            for j in range(max(0, i - 2), min(len(ts), i + 3)):
                if j != i:
                    exp[(c, ts[j])] += 1
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r["center"], r["context"]): r["n_pairs"]
        for r in skipgram_pairs(df, window=2, min_count=1).collect()
    }
    assert got == dict(exp)
    # directed convention: (a, b) appears 2x ("a b c", "a a b" pos2)
    # while ("d", "a") never does (outside the window)
    assert ("d", "a") not in got


def test_source_vocab_overlap_bruteforce(spark):
    from graphlite_spark.operators.cooccurrence import source_vocab_overlap

    rows = [
        (0, "alpha beta gamma", "s1"),
        (1, "beta gamma delta", "s1"),
        (2, "alpha beta epsilon", "s2"),
        (3, "zeta eta", "s3"),          # disjoint from s1 vocabulary
        (4, "beta zeta", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["source_a"], r["source_b"]):
            (r["n_a"], r["n_b"], r["overlap"], r["jaccard"])
        for r in source_vocab_overlap(df).collect()
    }
    vocab = {}
    for _, t, s in rows:
        vocab.setdefault(s, set()).update(t.split())
    exp = {}
    for a in sorted(vocab):
        for b in sorted(vocab):
            if a < b and vocab[a] & vocab[b]:
                o = len(vocab[a] & vocab[b])
                exp[(a, b)] = (
                    len(vocab[a]), len(vocab[b]), o,
                    round(o / len(vocab[a] | vocab[b]), 6),
                )
    assert got == exp
    # disjoint pair (s1, s3) produces NO row (inner join on shared tokens)
    assert ("s1", "s3") not in got
