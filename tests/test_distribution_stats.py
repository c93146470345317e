"""Benford first-digit screen and deterministic bootstrap CI vs Python
brute force (same hash, same truncating divisions)."""

from __future__ import annotations

import hashlib
import math


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def test_benford_deviation_bruteforce(spark):
    from graphlite_spark.operators.profiling import benford_deviation

    vals = [1.23, 19.5, 0.031, 2.4, 250.0, 0.9, 1.01, 34.5, 3.3, 0.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "event_id long, value double"
    )
    got = {r["digit"]: r for r in benford_deviation(df).collect()}

    digits: dict[int, int] = {}
    for v in vals:
        vm = round(v * 1_000_000)
        if vm > 0:
            d = int(str(vm)[0])
            digits[d] = digits.get(d, 0) + 1
    tot = sum(digits.values())
    assert tot == 9  # the 0.0 row is excluded
    assert set(got) == set(digits)
    for d, n in digits.items():
        share = (1_000_000 * n - (1_000_000 * n) % tot) // tot
        exp = int(round(math.log10(1.0 + 1.0 / d) * 1_000_000))
        r = got[d]
        assert (r["n"], r["share_micros"], r["expected_micros"]) == (
            n, share, exp,
        )
        assert r["dev_micros"] == share - exp
    # digit 1 expectation is the Benford 30.103% constant
    assert got[1]["expected_micros"] == 301030


def test_bootstrap_ci_bruteforce(spark):
    from graphlite_spark.operators.profiling import bootstrap_ci

    vals = [(i, 10.0 + (i % 7) * 3.5) for i in range(60)]
    df = spark.createDataFrame(vals, "event_id long, value double")
    B, rate, alpha = 16, 0.5, 0.125
    got = bootstrap_ci(df, replicates=B, rate=rate, alpha=alpha).collect()[0]

    vm = {str(i): round(v * 1_000_000) for i, v in vals}
    thresh = int(rate * (1 << 48))
    means = []
    for b in range(B):
        kept = [
            m for k, m in vm.items()
            if _h48(f"boot:{b}:{k}") < thresh
        ]
        if kept:
            means.append((sum(kept) // len(kept), b))
    means.sort()
    lo_rank = int(alpha * B) + 1
    hi_rank = B - int(alpha * B)
    full_mean = sum(vm.values()) // len(vm)
    assert got["n_events"] == 60
    assert got["n_replicates"] == len(means)
    assert got["mean_micros"] == full_mean
    assert got["lo_micros"] == means[lo_rank - 1][0]
    assert got["hi_micros"] == means[hi_rank - 1][0]
    assert got["lo_micros"] <= got["mean_micros"] <= got["hi_micros"]
