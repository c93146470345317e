"""Repetition-signal expressions vs handcrafted documents with known
n-gram repeat and top-token counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphlite_spark.functions.text import repetition_exprs, tokens_expr


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    re_ = repetition_exprs(tokens_expr("text"), n=2)
    return {
        r["doc_id"]: r.asDict()
        for r in df.select("doc_id", *[re_[c].alias(c) for c in re_]).collect()
    }


def test_repetition_known_values(spark):
    out = _run(spark, [
        "a b a b a b",        # bigrams: ab,ba,ab,ba,ab -> 5 grams, 2 distinct
        "x y z w",            # no repeats
        "q",                  # no bigrams at all
        "",                   # empty
        "t t t t",            # tt,tt,tt -> 3 grams 1 distinct; top token 4/4
    ])
    assert out[0] == {"doc_id": 0, "n_tokens": 6, "n_grams": 5,
                      "n_dup_grams": 3, "dup_gram_micros": 600000,
                      "top_token_micros": 500000}
    assert out[1]["n_dup_grams"] == 0 and out[1]["dup_gram_micros"] == 0
    assert out[1]["top_token_micros"] == 250000
    assert out[2] == {"doc_id": 2, "n_tokens": 1, "n_grams": 0,
                      "n_dup_grams": 0, "dup_gram_micros": 0,
                      "top_token_micros": 1000000}
    assert out[3] == {"doc_id": 3, "n_tokens": 0, "n_grams": 0,
                      "n_dup_grams": 0, "dup_gram_micros": 0,
                      "top_token_micros": 0}
    assert out[4] == {"doc_id": 4, "n_tokens": 4, "n_grams": 3,
                      "n_dup_grams": 2, "dup_gram_micros": 666666,
                      "top_token_micros": 1000000}


def test_repetition_trigram(spark):
    df = spark.createDataFrame([(0, "a b c a b c a b c")],
                               "doc_id long, text string")
    re_ = repetition_exprs(tokens_expr("text"), n=3)
    row = df.select(*[re_[c].alias(c) for c in re_]).collect()[0]
    # trigrams: abc bca cab abc bca cab abc -> 7 grams, 3 distinct
    assert row["n_grams"] == 7
    assert row["n_dup_grams"] == 4
    assert row["dup_gram_micros"] == (1_000_000 * 4) // 7
