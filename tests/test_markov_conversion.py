"""Absorbing-chain conversion probability and Kneser–Ney bigram LM vs
Python brute force."""

from __future__ import annotations

import datetime

import pytest


def _ev(user, seq):
    base = datetime.datetime(2024, 1, 1)
    return [
        (user * 1000 + i, user, et, base + datetime.timedelta(minutes=i))
        for i, et in enumerate(seq)
    ]


def test_conversion_prob_bruteforce(spark):
    from graphlite_spark.operators.cooccurrence import conversion_prob

    rows = (
        _ev(1, ["view", "click", "purchase"])
        + _ev(2, ["view", "click", "error"])
        + _ev(3, ["view", "purchase"])
        + _ev(4, ["click", "view", "click", "purchase"])
    )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {
        r["state"]: r["p_micros"]
        for r in conversion_prob(
            df, target="purchase", sink="error", iterations=8
        ).collect()
    }

    # brute force: same lag chain, same per-term truncating division
    chains = [
        ["view", "click", "purchase"],
        ["view", "click", "error"],
        ["view", "purchase"],
        ["click", "view", "click", "purchase"],
    ]
    cnt: dict[tuple[str, str], int] = {}
    for ch in chains:
        for a, b in zip(ch, ch[1:]):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    tot: dict[str, int] = {}
    for (a, _), n in cnt.items():
        tot[a] = tot.get(a, 0) + n
    states = {"view", "click", "purchase", "error"}
    p = {s: 0 for s in states}
    for _ in range(8):
        nxt = {}
        for s in states:
            if s == "purchase":
                nxt[s] = 1_000_000
            elif s == "error":
                nxt[s] = 0
            else:
                nxt[s] = sum(
                    (p[b] * n) // tot[a]
                    for (a, b), n in cnt.items()
                    if a == s
                )
        p = nxt
    assert got == p
    assert got["purchase"] == 1_000_000 and got["error"] == 0
    # both transient states must have strictly-interior probabilities
    assert 0 < got["view"] < 1_000_000 and 0 < got["click"] < 1_000_000


def test_kneser_ney_bruteforce(spark):
    from graphlite_spark.operators.ngram_lm import kneser_ney_bigram

    docs = [
        (0, "the cat sat on the mat"),
        (1, "the cat ran to the mat"),
        (2, "a dog sat on a log"),
        (3, "the cat sat on a log"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["w1"], r["w2"]): r
        for r in kneser_ney_bigram(df, top=50, min_count=2).collect()
    }

    cnt: dict[tuple[str, str], int] = {}
    for _, t in docs:
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    tot: dict[str, int] = {}
    n1f: dict[str, int] = {}
    n1r: dict[str, int] = {}
    for (a, b), n in cnt.items():
        tot[a] = tot.get(a, 0) + n
        n1f[a] = n1f.get(a, 0) + 1
        n1r[b] = n1r.get(b, 0) + 1
    nbt = float(len(cnt))
    want = {
        (a, b): round(
            (n - 0.75) / tot[a] + ((0.75 * n1f[a]) / tot[a]) * (n1r[b] / nbt),
            6,
        )
        for (a, b), n in cnt.items()
        if n >= 2
    }
    assert set(got) == set(want)
    for key, r in got.items():
        assert r["p_kn"] == pytest.approx(want[key], abs=1e-9)
        assert r["n_pairs"] == cnt[key]
        assert r["n1_fwd"] == n1f[key[0]] and r["n1_rev"] == n1r[key[1]]
    # ('the','cat') appears 3x with rich continuations: sanity-check one
    assert got[("the", "cat")]["n_pairs"] == 3


def test_markov_attribution_bruteforce(spark):
    """Removal-effect attribution vs a python brute force of the full
    product-space iteration, start weighting, and effect ratio."""
    from graphlite_spark.operators.cooccurrence import markov_attribution

    chains = [
        ["view", "click", "purchase"],
        ["view", "click", "error"],
        ["view", "purchase"],
        ["click", "view", "click", "purchase"],
        ["signup", "view", "purchase"],
        ["signup", "error"],
    ]
    rows = []
    for u, ch in enumerate(chains, start=1):
        rows += _ev(u, ch)
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {
        r["channel"]: (
            r["p_full_micros"],
            r["p_removed_micros"],
            r["removal_effect_micros"],
        )
        for r in markov_attribution(
            df, target="purchase", sink="error", iterations=8
        ).collect()
    }

    cnt: dict[tuple[str, str], int] = {}
    for ch in chains:
        for a, b in zip(ch, ch[1:]):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    tot: dict[str, int] = {}
    for (a, _), n in cnt.items():
        tot[a] = tot.get(a, 0) + n
    states = {"view", "click", "purchase", "error", "signup"}

    def absorb(removed):
        p = {s: 0 for s in states}
        for _ in range(8):
            nxt = {}
            for s in states:
                if s == "purchase":
                    nxt[s] = 1_000_000
                elif s == "error" or s == removed:
                    nxt[s] = 0
                else:
                    nxt[s] = sum(
                        (p[b] * n) // tot[a]
                        for (a, b), n in cnt.items()
                        if a == s
                    )
            p = nxt
        return p

    firsts: dict[str, int] = {}
    for ch in chains:
        firsts[ch[0]] = firsts.get(ch[0], 0) + 1
    na = len(chains)

    def start_p(removed):
        p = absorb(removed)
        return sum((fc * p[s]) // na for s, fc in firsts.items())

    p_full = start_p(None)
    want = {}
    for c in sorted(states - {"purchase", "error"}):
        p_rm = start_p(c)
        eff = (
            ((p_full - p_rm) * 1_000_000) // p_full if p_full > 0 else None
        )
        want[c] = (p_full, p_rm, eff)
    assert got == want
    # removal can only hurt conversion; the effects must be ordered
    # by how load-bearing each channel is on these journeys
    assert all(v[1] <= v[0] for v in got.values())
    assert got["view"][2] > got["signup"][2]
