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
