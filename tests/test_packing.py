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
