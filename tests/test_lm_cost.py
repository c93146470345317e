"""Smoothed bigram LM cost vs Python brute force."""

from __future__ import annotations

import math
from collections import Counter

from graphlite_spark.operators.ngram_lm import doc_lm_cost


def _brute(texts):
    toks = {i: t.lower().split() for i, t in enumerate(texts)}
    bigrams = {
        i: list(zip(ts, ts[1:])) for i, ts in toks.items()
    }
    c12 = Counter(b for bs in bigrams.values() for b in bs)
    c1 = Counter()
    for (w1, _), n in c12.items():
        c1[w1] += n
    vocab = {w for ts in toks.values() for w in ts}
    v = len(vocab)
    cost = {
        b: round(1e6 * math.log((c1[b[0]] + v) / (n + 1.0)))
        for b, n in c12.items()
    }
    out = {}
    for i, bs in bigrams.items():
        n = len(bs)
        s = sum(cost[b] for b in bs)
        out[i] = (n, s, 0 if n == 0 else s // n)
    return out


def test_doc_lm_cost_bruteforce(spark):
    texts = [
        "the cat sat on the mat",
        "the cat ran",
        "the the the",          # repeated bigram -> multiplicity m > 1
        "solo",                 # 1 token -> zero bigrams
        "a b a b a",            # alternating, cross-doc-unique vocab
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_bigrams"],
            r["sum_cost_micros"],
            r["avg_cost_micros"],
        )
        for r in doc_lm_cost(df).collect()
    }
    assert got == _brute(texts)
    # boilerplate ("the the the", every transition ultra-common relative
    # to its context) must cost less per bigram than the novel doc
    assert got[2][2] < got[0][2]
