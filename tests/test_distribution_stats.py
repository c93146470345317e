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


def test_behavior_entropy_bruteforce(spark):
    import datetime

    from graphlite_spark.operators.cooccurrence import behavior_entropy

    base = datetime.datetime(2024, 1, 1)
    chains = {
        1: ["a", "b", "a", "c"],
        2: ["a", "b", "b"],
        3: ["c", "a", "b"],
    }
    rows = [
        (u * 100 + i, u, et, base + datetime.timedelta(minutes=i))
        for u, ch in chains.items()
        for i, et in enumerate(ch)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {r["state"]: r for r in behavior_entropy(df).collect()}

    cnt: dict[tuple[str, str], int] = {}
    for ch in chains.values():
        for a, b in zip(ch, ch[1:]):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    tot: dict[str, int] = {}
    for (a, _), n in cnt.items():
        tot[a] = tot.get(a, 0) + n
    for a in tot:
        terms = [
            round((n / tot[a]) * math.log(n / tot[a]) * 1_000_000)
            for (x, _), n in cnt.items()
            if x == a
        ]
        nn = sum(1 for (x, _) in cnt if x == a)
        r = got[a]
        assert (r["n_next"], r["tot"], r["entropy_micros"]) == (
            nn, tot[a], -sum(terms),
        )
    # 'b' -> {a:1, b:1} is a 2-way uniform branch: entropy = ln 2 micro-nats
    assert got["b"]["entropy_micros"] == 693148  # 2 * round(0.5*ln(0.5)*1e6)


def test_embedding_covariance_bruteforce(spark):
    from graphlite_spark.operators.similarity import (
        _trunc_div, embedding_covariance_topk,
    )

    vecs = {
        0: [1.0, 1.1, -2.0, 0.3],
        1: [2.0, 2.2, 1.0, -0.4],
        2: [-1.0, -0.9, 3.0, 0.1],
        3: [0.5, 0.4, -1.0, 0.9],
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    got = [
        (r["i"], r["j"], r["cov_sum"], r["rank"])
        for r in embedding_covariance_topk(df, k=3).collect()
    ]
    q = {i: [round(x * 1_000_000) for x in v] for i, v in vecs.items()}
    n, d = len(q), 4
    cent = [_trunc_div(sum(v[t] for v in q.values()), n) for t in range(d)]
    cov = {}
    for i in range(d):
        for j in range(i + 1, d):
            cov[(i, j)] = sum(
                (v[i] - cent[i]) * (v[j] - cent[j]) for v in q.values()
            )
    want = sorted(cov.items(), key=lambda t: (-abs(t[1]), t[0]))[:3]
    assert got == [
        (i, j, c, rk + 1) for rk, ((i, j), c) in enumerate(want)
    ]
    # dims 0 and 1 are nearly collinear by construction: they must lead
    assert (got[0][0], got[0][1]) == (0, 1) or (got[0][0], got[0][1]) == (0, 2)


def test_empty_input_guards(spark):
    from graphlite_spark.operators.kmeans import label_separability
    from graphlite_spark.operators.profiling import bootstrap_ci

    empty_ev = spark.createDataFrame([], "event_id long, value double")
    assert bootstrap_ci(empty_ev).collect() == []

    empty_emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    assert label_separability(empty_emb).collect() == []


def test_dispersion_index_bruteforce(spark):
    import datetime

    from graphlite_spark.operators.profiling import dispersion_index

    base = datetime.datetime(2024, 7, 1)
    # 'a': counts per user [1, 1, 1, 1] -> variance 0, VMR 0
    # 'b': counts per user [1, 9]       -> heavy overdispersion
    rows = []
    eid = 0
    for u in (1, 2, 3, 4):
        rows.append((eid, u, "a", base)); eid += 1
    rows.append((eid, 5, "b", base)); eid += 1
    for _ in range(9):
        rows.append((eid, 6, "b", base)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {r["event_type"]: r for r in dispersion_index(df).collect()}

    def want(xs):
        n, s1, s2 = len(xs), sum(xs), sum(x * x for x in xs)
        mean = (1_000_000 * s1 - (1_000_000 * s1) % n) // n
        vmr = round((n * s2 - s1 * s1) / ((n - 1) * s1), 6)
        return n, mean, vmr
    na, ma, va = want([1, 1, 1, 1])
    assert (got["a"]["n_units"], got["a"]["mean_micros"]) == (na, ma)
    assert got["a"]["vmr"] == 0.0
    nb, mb, vb = want([1, 9])
    assert (got["b"]["n_units"], got["b"]["mean_micros"]) == (nb, mb)
    assert got["b"]["vmr"] == vb and vb > 1.0


def test_error_rate_by_activity_bruteforce(spark):
    import datetime

    from graphlite_spark.operators.analytics import error_rate_by_activity

    base = datetime.datetime(2024, 8, 1)
    rows = []
    eid = 0
    # u1: 1 event (bucket 1, no errors); u2: 3 events, 1 error (bucket 2)
    # u3: 5 events, 2 errors (bucket 3); u4: 4 events 0 errors (bucket 3)
    plan = {1: ("view",), 2: ("view", "error", "click"),
            3: ("error", "view", "error", "view", "view"),
            4: ("view", "click", "view", "click")}
    for u, seq in plan.items():
        for et in seq:
            rows.append((eid, u, et, base)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {r["bucket"]: r for r in error_rate_by_activity(df).collect()}

    def share(err, tot):
        return (1_000_000 * err - (1_000_000 * err) % tot) // tot
    assert got[1]["n_units"] == 1 and got[1]["error_micros"] == 0
    assert (got[2]["n_units"], got[2]["n_events"], got[2]["n_errors"]) == (
        1, 3, 1,
    )
    assert got[2]["error_micros"] == share(1, 3)
    # bucket 3 = counts 4..7: users 3 and 4 pooled
    assert (got[3]["n_units"], got[3]["n_events"], got[3]["n_errors"]) == (
        2, 9, 2,
    )
    assert got[3]["error_micros"] == share(2, 9)


def test_mutual_information_bruteforce(spark):
    import math

    from graphlite_spark.operators.analytics import mutual_information

    # source A: 3 en + 1 de; source B: 1 en + 3 de — dependent, MI > 0
    rows = (
        [("A", "en")] * 3 + [("A", "de")] * 1
        + [("B", "en")] * 1 + [("B", "de")] * 3
    )
    df = spark.createDataFrame(rows, "source string, lang string")
    got = {(r["x"], r["y"]): (r["n"], r["pmi_micros"], r["mi_contrib_micros"])
           for r in mutual_information(df, "source", "lang").collect()}
    from collections import Counter

    joint = Counter(rows)
    nx = Counter(s for s, _ in rows)
    ny = Counter(l for _, l in rows)
    nt = len(rows)
    want = {}
    for (x, y), n in joint.items():
        arg = (n * nt) / (nx[x] * ny[y])
        want[(x, y)] = (
            n,
            round(1_000_000.0 * math.log(arg)),
            round(1_000_000.0 * n * math.log(arg) / nt),
        )
    assert got == want, (got, want)
    # total MI positive for the dependent table
    assert sum(c for _, _, c in got.values()) > 0
    # independent table -> every cell PMI == 0
    indep = spark.createDataFrame(
        [("A", "en"), ("A", "de"), ("B", "en"), ("B", "de")],
        "source string, lang string",
    )
    got0 = mutual_information(indep, "source", "lang").collect()
    assert all(r["pmi_micros"] == 0 and r["mi_contrib_micros"] == 0
               for r in got0)


def test_lexicon_flag_rate_bruteforce(spark):
    from graphlite_spark.operators.profiling import lexicon_flag_rate

    rows = [
        (0, "the DUP table dup", "a"),
        (1, "clean text here", "a"),
        (2, "slow join slow scan slow", "b"),
        (3, "", "b"),
        (4, "error", "b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: (r["n_docs"], r["n_flagged"], r["n_hits"],
                         r["flag_micros"])
           for r in lexicon_flag_rate(docs, ["slow", "dup", "error"]).collect()}
    # source a: doc0 has 2 hits (case-folded dup x2), doc1 clean
    assert got["a"] == (2, 1, 2, 500_000)
    # source b: doc2 3x slow, doc3 empty, doc4 error
    assert got["b"] == (
        3, 2, 4, (1_000_000 * 2 - (1_000_000 * 2) % 3) // 3,
    )


def test_corpus_concentration_bruteforce(spark):
    from graphlite_spark.operators.profiling import corpus_concentration

    rows = [
        (0, "a b c d", "s1"), (1, "e f", "s1"),      # s1: 6 tokens
        (2, "g h i", "s2"),                          # s2: 3 tokens
        (3, "j", "s3"),                              # s3: 1 token
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    r = corpus_concentration(docs).collect()[0]
    t = 10
    ssq = 36 + 9 + 1
    assert r["n_sources"] == 3
    assert r["total_tokens"] == t
    assert r["hhi_micros"] == (
        1_000_000 * ssq - (1_000_000 * ssq) % (t * t)
    ) // (t * t)
    assert r["top_share_micros"] == 600_000
