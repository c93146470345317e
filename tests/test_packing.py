"""Brute-force checks for sequence packing and vocab construction."""

from __future__ import annotations

import hashlib

import pytest

from graphlite_spark.operators.packing import build_vocab, pack_documents


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


ROWS = [
    (0, "alpha beta gamma delta"),
    (1, "alpha alpha beta"),
    (2, "gamma"),
    (3, ""),
    (4, "epsilon zeta eta theta iota kappa"),
    (5, "beta beta beta alpha"),
    (6, "one two three four five six seven eight nine ten"),
]


def test_pack_documents_bruteforce(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           pack_documents(docs, max_tokens=5, num_shards=3).collect()}
    # python replay of the identical rule
    streams: dict[int, int] = {}
    want = {}
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for did, text in ROWS:
        n = len(text.split())
        if n == 0:
            continue
        by_shard.setdefault(_h48(str(did)) % 3, []).append((did, n))
    for shard, members in by_shard.items():
        cum = 0
        for did, n in sorted(members):
            start, end = cum, cum + n
            cum = end
            want[did] = (shard, n, start, end, start // 5, (end - 1) // 5)
    assert set(got) == set(want)
    for did, (shard, n, s, e, fb, lb) in want.items():
        r = got[did]
        assert (r["shard"], r["n_tokens"], r["start_tok"], r["end_tok"],
                r["first_bin"], r["last_bin"]) == (shard, n, s, e, fb, lb)
    # empty doc excluded; spans are contiguous per shard
    assert 3 not in got
    # at least one doc must straddle a window boundary for the test to
    # exercise first_bin != last_bin
    assert any(r["first_bin"] != r["last_bin"] for r in got.values())


def test_pack_documents_bad_args(spark):
    docs = spark.createDataFrame(ROWS[:2], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_documents(docs, max_tokens=0)
    with pytest.raises(ValueError):
        pack_documents(docs, num_shards=0)


def test_build_vocab_bruteforce(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {r["term"]: (r["tf_total"], r["df"], r["vocab_id"])
           for r in build_vocab(docs, min_df=1).collect()}
    tf: dict[str, int] = {}
    df: dict[str, int] = {}
    for _, text in ROWS:
        toks = text.split()
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    order = sorted(tf, key=lambda t: (-tf[t], t))
    want = {t: (tf[t], df[t], i) for i, t in enumerate(order)}
    assert got == want
    # min_df filter keeps ids dense over the surviving set
    got2 = {r["term"]: r["vocab_id"]
            for r in build_vocab(docs, min_df=2).collect()}
    keep = sorted((t for t in tf if df[t] >= 2), key=lambda t: (-tf[t], t))
    assert got2 == {t: i for i, t in enumerate(keep)}


def test_sample_stratified_bruteforce(spark):
    from graphlite_spark.operators.packing import sample_stratified

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, stratum string")
    rates = {"a": 1.0, "b": 0.5, "c": 0.0}
    got = {r["k"] for r in sample_stratified(
        df, "stratum", rates, key_col="k").collect()}
    want = set()
    for k, s in rows:
        h = _h48(f"sample:{k}")
        if h < int(rates[s] * (1 << 48)):
            want.add(k)
    assert got == want
    # rate 1.0 keeps everything in the stratum; 0.0 keeps nothing
    assert {k for k, s in rows if s == "a"} <= got
    assert not any(s == "c" for k, s in rows if k in got)
    # determinism: same salt+key → identical sample on a rerun
    again = {r["k"] for r in sample_stratified(
        df, "stratum", rates, key_col="k").collect()}
    assert again == got
    # unlisted strata fall back to default_rate
    got_d = {r["k"] for r in sample_stratified(
        df, "stratum", {"a": 1.0}, key_col="k", default_rate=1.0).collect()}
    assert got_d == {k for k, _ in rows}


def test_mixture_targets_largest_remainder():
    from graphlite_spark.operators.packing import mixture_targets

    # floors 21/12/12/8/4 = 57; extras by remainder (12,12,8) -> b,c,d
    got = mixture_targets({"a": 5, "b": 3, "c": 3, "d": 2, "e": 1}, 60)
    assert got == {"a": 21, "b": 13, "c": 13, "d": 9, "e": 4}
    assert sum(got.values()) == 60
    # remainder tie between b and c broken by stratum ASC when only one
    # extra is available
    got2 = mixture_targets({"b": 1, "c": 1}, 3)
    assert got2 == {"b": 2, "c": 1}
    # exact division: no extras
    assert mixture_targets({"x": 1, "y": 1}, 4) == {"x": 2, "y": 2}
    assert mixture_targets({"x": 1}, 0) == {"x": 0}
    with pytest.raises(ValueError):
        mixture_targets({"x": 0}, 5)
    with pytest.raises(ValueError):
        mixture_targets({"x": -1, "y": 2}, 5)


def test_mix_corpus_bruteforce_and_shortfall(spark):
    from graphlite_spark.operators.packing import mix_corpus, mixture_targets

    def h48(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    # stratum a: only 3 docs but weighted to want far more (shortfall);
    # strata b, c populated enough
    rows = (
        [(i, "a") for i in range(3)]
        + [(100 + i, "b") for i in range(20)]
        + [(200 + i, "c") for i in range(20)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    weights = {"a": 10, "b": 2, "c": 1}
    got = sorted(
        (r["doc_id"], r["source"], r["mix_rank"])
        for r in mix_corpus(docs, "source", weights, total=26).collect()
    )
    targets = mixture_targets(weights, 26)  # a:20, b:4, c:2
    assert targets == {"a": 20, "b": 4, "c": 2}
    want = []
    for s, t in targets.items():
        pop = sorted(
            (d for d, src in rows if src == s),
            key=lambda d: (h48(f"mix:{d}"), d),
        )
        want += [(d, s, i + 1) for i, d in enumerate(pop[:t])]
    assert got == sorted(want)
    # the shortfall contract: stratum a contributes all 3 of its docs
    assert sum(1 for _, s, _ in got if s == "a") == 3
    assert len(got) == 3 + 4 + 2


def test_assign_splits(spark):
    """Cumulative-threshold semantics replayed in python; fractions
    land near 90/5/5; membership is a pure function of (salt, key) —
    a derived table sharing the key gets the identical assignment."""
    from graphlite_spark.operators.packing import assign_splits

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(2000)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["split"]
           for r in assign_splits(df, "doc_id").collect()}
    t1, t2 = int(0.9 * (1 << 48)), int(0.95 * (1 << 48))
    for i in range(2000):
        h = _h48(f"split:{i}")
        want = "train" if h < t1 else ("val" if h < t2 else "test")
        assert got[i] == want
    from collections import Counter
    c = Counter(got.values())
    assert 0.88 < c["train"] / 2000 < 0.92
    assert 0.03 < c["val"] / 2000 < 0.07
    assert 0.03 < c["test"] / 2000 < 0.07
    # leakage safety: chunks table keyed by the same doc_id splits same
    chunks = spark.createDataFrame(
        [(i % 2000, j) for i in range(0, 4000) for j in (0, 1)],
        "doc_id long, chunk int",
    )
    got2 = {(r["doc_id"], r["chunk"]): r["split"]
            for r in assign_splits(chunks, "doc_id").collect()}
    assert all(got2[(d, c)] == got[d] for d, c in got2)


def test_quality_calibrated_bruteforce(spark):
    from graphlite_spark.operators.packing import quality_calibrated

    rows = [
        (0, "the cat sat on the mat today", "en"),
        (1, "short", "en"),
        (2, "a much longer english sentence with many common words", "en"),
        (3, "le chat noir", "fr"),
        (4, "le chat noir dort bien ce soir", "fr"),
        (5, "solo", "de"),  # singleton group -> pct 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: (r["lang"], r["pct_micros"])
        for r in quality_calibrated(df).collect()
    }
    # replay: rank within lang by (6dp quality, doc_id) ascending
    import math

    from graphlite_spark.functions.text import STOPWORDS

    def qual(t):
        ts = t.lower().split()
        stop = sum(1 for x in ts if x in STOPWORDS) / max(len(ts), 1)
        ml = sum(len(x) for x in ts) / max(len(ts), 1)
        return round(0.2 + 1.5 * stop + 0.02 * ml + 0.1 * math.log1p(len(ts)), 6)

    by_lang: dict[str, list] = {}
    for i, t, lang in rows:
        by_lang.setdefault(lang, []).append((qual(t), i))
    exp = {}
    for lang, docs in by_lang.items():
        docs.sort()
        n = len(docs)
        for pos, (_, i) in enumerate(docs):
            exp[i] = (lang, (pos * 1_000_000) // max(n - 1, 1))
    assert got == exp
    # singleton group pinned to 0; each multi-doc group tops out at 1e6
    assert got[5][1] == 0
    assert max(p for lang, p in got.values() if lang == "en") == 1_000_000


def test_vocab_coverage_bruteforce(spark):
    from collections import Counter

    from graphlite_spark.operators.packing import vocab_coverage

    texts = [
        "a a a a b b c",
        "a b b d e",
        "a c f",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["vocab_size"]: (
            r["n_types"], r["covered_tokens"], r["coverage_micros"]
        )
        for r in vocab_coverage(df, cutoffs=(2, 4, 100)).collect()
    }
    counts = Counter(w for t in texts for w in t.split())
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(counts.values())
    exp = {}
    for v in (2, 4, 100):
        top = ranked[:v]
        cov = sum(c for _, c in top)
        exp[v] = (len(top), cov, (1_000_000 * cov) // total)
    assert got == exp
    # coverage is monotone in the cutoff and saturates at 1e6
    assert got[2][2] < got[4][2] < got[100][2] == 1_000_000
