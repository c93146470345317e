"""DSIR hashed-bigram importance weights vs pure-Python brute force."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from graphlite_spark.operators.dsir import dsir_weights

SEP = "\x1f"


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _brute(rows, target_lang="en", n_buckets=64):
    buckets = {
        i: [
            _h48(w1 + SEP + w2) % n_buckets
            for w1, w2 in zip(t.lower().split(), t.lower().split()[1:])
        ]
        for i, (t, _) in enumerate(rows)
    }
    ct: Counter = Counter()
    cr: Counter = Counter()
    for i, (_, lang) in enumerate(rows):
        for b in buckets[i]:
            cr[b] += 1
            if lang == target_lang:
                ct[b] += 1
    nt, nr = sum(ct.values()), sum(cr.values())
    lw = {
        b: round(
            1e6
            * math.log(
                ((ct[b] + 1) * (nr + n_buckets))
                / ((cr[b] + 1) * (nt + n_buckets))
            )
        )
        for b in cr
    }
    return {
        i: (len(bs), sum(lw[b] for b in bs)) for i, bs in buckets.items()
    }


def test_dsir_weights_bruteforce(spark):
    rows = [
        ("the cat sat on the mat", "en"),
        ("the cat ran fast", "en"),
        ("le chat noir dort", "fr"),
        ("le chat a faim", "fr"),
        ("the cat sat on le chat", "de"),  # mixed: scores between poles
        ("solo", "en"),                    # 1 token -> zero bigrams
    ]
    df = spark.createDataFrame(
        [(i, t, lang) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["logweight_micros"])
        for r in dsir_weights(df, n_buckets=64).collect()
    }
    assert got == _brute(rows)
    # directionally (weights are length-additive, so compare equal
    # bigram counts): the en doc beats both fr docs at 3 bigrams, and
    # the pure-en doc beats the mixed en/fr doc at 5 bigrams
    assert got[1][1] > got[2][1] and got[1][1] > got[3][1]
    assert got[0][1] > got[4][1]
    # the zero-bigram doc carries weight 0
    assert got[5] == (0, 0)
