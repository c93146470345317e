"""Doc n-gram novelty and temperature-scaled mixture vs Python brute
force."""

from __future__ import annotations

import math


def test_doc_novelty_bruteforce(spark):
    from graphlite_spark.operators.dedup import doc_novelty

    docs = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "alpha beta gamma zeta eta theta"),   # shares 1 gram with 0
        (2, "alpha beta gamma delta epsilon"),    # exact dup of 0
        (3, "one two"),                           # < 3 tokens: no grams
        (4, "totally novel content here now"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in doc_novelty(df, n=3).collect()}

    grams = {
        i: {
            " ".join(t.split()[j : j + 3])
            for j in range(len(t.split()) - 2)
        }
        for i, t in docs
    }
    first: dict[str, int] = {}
    for i in sorted(grams):
        for g in grams[i]:
            first.setdefault(g, i)
    assert set(got) == {0, 1, 2, 4}  # doc 3 absent (no grams)
    for i in got:
        n_g = len(grams[i])
        n_nov = sum(1 for g in grams[i] if first[g] == i)
        mic = (1_000_000 * n_nov - (1_000_000 * n_nov) % n_g) // n_g
        r = got[i]
        assert (r["n_grams"], r["n_novel"], r["novelty_micros"]) == (
            n_g, n_nov, mic,
        )
    assert got[0]["novelty_micros"] == 1_000_000   # first doc: all novel
    assert got[2]["novelty_micros"] == 0           # exact dup: none novel
    assert 0 < got[1]["novelty_micros"] < 1_000_000


def test_temperature_mixture_bruteforce(spark):
    from graphlite_spark.operators.packing import temperature_mixture

    docs = [
        (0, "a", "w w w w w w w w w"),       # 9 tokens
        (1, "a", "x x x x x x x"),           # 7
        (2, "b", "y y y y"),                 # 4
        (3, "c", "z"),                       # 1
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    got = {r["stratum"]: r for r in temperature_mixture(df).collect()}

    toks = {"a": 16, "b": 4, "c": 1}
    ndocs = {"a": 2, "b": 1, "c": 1}
    w = {s: round(math.sqrt(t) * 1_000_000) for s, t in toks.items()}
    d = sum(w.values())
    for s in toks:
        share = (1_000_000 * w[s] - (1_000_000 * w[s]) % d) // d
        r = got[s]
        assert (r["n_docs"], r["n_tokens"], r["weight_micros"]) == (
            ndocs[s], toks[s], w[s],
        )
        assert r["share_micros"] == share
    # sqrt flattens: source a has 16x source c's tokens but only 4x weight
    assert got["a"]["weight_micros"] == 4 * got["c"]["weight_micros"]
