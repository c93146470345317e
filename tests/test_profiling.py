"""Profiling operators: exactness + the TakeOrderedAndProject plan shape
(the scalable global top-k — regression-guard against a global sort)."""

from __future__ import annotations

from collections import Counter

from graphlite_spark.operators.profiling import heavy_hitters, partition_histogram


def test_partition_histogram_partitions_everything(spark):
    df = spark.createDataFrame(
        [(i % 17, i) for i in range(500)], "k long, v long"
    )
    rows = partition_histogram(df, "k", num_buckets=8).collect()
    assert sum(r["n_rows"] for r in rows) == 500
    assert sum(r["n_keys"] for r in rows) == 17  # buckets partition the keys
    assert all(0 <= r["bucket"] < 8 for r in rows)


def test_heavy_hitters_exact_and_plan(spark):
    data = [(i % 10,) for i in range(100)] + [(99,)] * 50 + [(98,)] * 30
    df = spark.createDataFrame(data, "k long")
    hh = heavy_hitters(df, "k", k=3)
    plan = hh._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:500]
    got = [(r["key"], r["n_rows"]) for r in hh.collect()]
    truth = Counter(k for (k,) in data)
    expect = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == expect


def test_profile_columns_nulls_and_kinds(spark):
    """Null counting, per-kind normalization (micros / epoch / lex),
    and distinct-ignores-null semantics; no Expand in the plan (the
    melt + single distinct agg, not a multi-countDistinct)."""
    from graphlite_spark.operators.profiling import profile_columns

    t = spark.createDataFrame(
        [(1, "x", None), (2, None, 3.5), (None, "x", 3.5)],
        "a long, b string, c double",
    )
    df = profile_columns(t, numeric=("a", "c"), string=("b",))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    p = {r["column"]: r for r in df.collect()}
    assert p["a"]["n_rows"] == 3 and p["a"]["n_null"] == 1
    assert p["a"]["n_distinct"] == 2 and p["a"]["min_num"] == 1_000_000
    assert p["b"]["n_null"] == 1 and p["b"]["n_distinct"] == 1
    assert p["b"]["min_str"] == "x" and p["b"]["min_num"] is None
    assert p["c"]["n_distinct"] == 1 and p["c"]["max_num"] == 3_500_000


def test_behavior_correlations_numpy(spark):
    """Exact agreement with numpy's corrcoef over the dense per-unit
    count matrix (zeros included), to 6dp; constant columns -> NULL."""
    import numpy as np

    from graphlite_spark.operators.analytics import behavior_correlations

    rng = np.random.RandomState(3)
    rows = []
    for u in range(30):
        for g, lam in (("a", 3), ("b", 5), ("c", 1)):
            for _ in range(int(rng.poisson(lam))):
                rows.append((u, g))
    rows += [(u, "const") for u in range(30)]  # every unit exactly once
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {(r["type_a"], r["type_b"]): r["corr"]
           for r in behavior_correlations(df).collect()}

    units = sorted({u for u, _ in rows})
    groups = sorted({g for _, g in rows})
    from collections import Counter
    cnt = Counter(rows)
    mat = np.array(
        [[cnt[(u, g)] for g in groups] for u in units], dtype=float
    )
    cc = np.corrcoef(mat, rowvar=False)
    for i, ga in enumerate(groups):
        for j, gb in enumerate(groups):
            if ga >= gb:
                continue
            if ga == "const" or gb == "const":
                assert got[(ga, gb)] is None
            else:
                assert got[(ga, gb)] == round(float(cc[i, j]), 6), (
                    ga, gb, got[(ga, gb)], cc[i, j])


def test_activity_trend_numpy(spark):
    """Slope matches numpy polyfit over the dense daily series (absent
    days = 0) to the exact integer micro-floor; a constant single-day
    group yields NULL (zero x-variance)."""
    import numpy as np

    from graphlite_spark.operators.analytics import activity_trend

    day_us = 86_400_000_000
    rows = []
    # "up": counts 1,2,3,...,8 across 8 days; "down": 8,...,1;
    # "gap": day 0 and day 7 only (zeros between)
    import datetime
    base = datetime.datetime(2024, 1, 1)
    def ts(d):
        return base + datetime.timedelta(days=d)
    for d in range(8):
        rows += [("up", ts(d))] * (d + 1)
        rows += [("down", ts(d))] * (8 - d)
    rows += [("gap", ts(0))] * 4 + [("gap", ts(7))] * 4
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {r["event_type"]: (r["n_days"], r["sum_y"], r["slope_micros"])
           for r in activity_trend(df).collect()}
    x = np.arange(8)
    for g, ys in (("up", np.arange(1, 9)),
                  ("down", np.arange(8, 0, -1)),
                  ("gap", np.array([4, 0, 0, 0, 0, 0, 0, 4]))):
        slope = np.polyfit(x, ys, 1)[0]
        n, sx, sxx = 8, 28, 140
        num = n * int((x * ys).sum()) - sx * int(ys.sum())
        den = n * sxx - sx * sx
        # Spark `div` / DuckDB `//` truncate toward zero
        want = (1_000_000 * num) // den if num >= 0 else -((1_000_000 * -num) // den)
        assert got[g] == (8, int(ys.sum()), want), (g, got[g], want, slope)
        assert abs(want / 1e6 - slope) < 1e-5


def test_dau_wau_replay(spark):
    """Python replay of the rolling-distinct semantics: WAU(d) =
    |union of active sets over [d-6, d]|; silent days surface with
    dau 0 and a correct trailing WAU."""
    import datetime

    from graphlite_spark.operators.analytics import dau_wau

    base = datetime.datetime(2024, 3, 1)
    act = {0: {1, 2, 3}, 1: {2}, 4: {4, 5}, 10: {1}}  # gaps: 2-3, 5-9
    rows = [(u, base + datetime.timedelta(days=d))
            for d, us in act.items() for u in us]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r["day"]: (r["dau"], r["wau"], r["stickiness_micros"])
           for r in dau_wau(df).collect()}
    d0 = min(got)
    assert len(got) == 11  # full spine incl. silent days
    for off in range(11):
        dau = len(act.get(off, set()))
        wau_set = set()
        for k in range(max(0, off - 6), off + 1):
            wau_set |= act.get(k, set())
        wau = len(wau_set)
        stick = (1_000_000 * dau) // wau if wau else 0
        assert got[d0 + off] == (dau, wau, stick), (off, got[d0 + off])


def test_activity_gini_known_values(spark):
    """Closed-form cases: uniform counts -> G = 0; one unit holding
    everything of n -> G = (n-1)/n (both exact in micro-floor); a
    numpy replay of the rank-sum identity on a random profile."""
    import numpy as np

    from graphlite_spark.operators.analytics import activity_gini

    def gini_of(counts):
        rows = [(u, 0) for u, c in enumerate(counts) for _ in range(c)]
        df = spark.createDataFrame(rows, "user_id long, pad int")
        return activity_gini(df).collect()[0]

    r = gini_of([5, 5, 5, 5])
    assert (r["n_units"], r["total_events"], r["gini_micros"]) == (4, 20, 0)

    r = gini_of([1, 1, 1, 97])  # near-total concentration
    xs = np.array(sorted([1, 1, 1, 97]))
    i = np.arange(1, 5)
    num = 2 * int((i * xs).sum()) - 5 * int(xs.sum())
    want = (1_000_000 * num) // (4 * int(xs.sum()))
    assert r["gini_micros"] == want

    rng = np.random.RandomState(11)
    counts = [int(c) for c in rng.randint(1, 50, size=40)]
    r = gini_of(counts)
    xs = np.array(sorted(counts)); n = len(xs)
    i = np.arange(1, n + 1)
    num = 2 * int((i * xs).sum()) - (n + 1) * int(xs.sum())
    want = (1_000_000 * num) // (n * int(xs.sum()))
    assert r["gini_micros"] == want
    # sanity: matches the textbook float formula to the micro-floor
    g = num / (n * xs.sum())
    assert abs(r["gini_micros"] / 1e6 - g) < 1e-6


def test_user_type_entropy_and_ttr(spark):
    """Entropy: single-type user -> 0; uniform over k -> ln(k) within a
    per-term rounding ulp; python replay of the per-term micro-rounding.
    TTR: all-distinct doc -> 10^6; repetitive doc -> exact ratio."""
    import math

    from graphlite_spark.operators.analytics import (
        text_type_token_ratio,
        user_type_entropy,
    )

    rows = ([(1, "a")] * 10
            + [(2, "a"), (2, "b"), (2, "c"), (2, "d")]
            + [(3, "a")] * 3 + [(3, "b")] * 1)
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {r["user_id"]: (r["n_events"], r["n_types"], r["entropy_micros"])
           for r in user_type_entropy(ev).collect()}
    assert got[1] == (10, 1, 0)
    assert got[2][2] == 4 * round(-(0.25 * math.log(0.25)) * 1e6)
    assert abs(got[2][2] / 1e6 - math.log(4)) < 4e-6
    want3 = (round(-(0.75 * math.log(0.75)) * 1e6)
             + round(-(0.25 * math.log(0.25)) * 1e6))
    assert got[3] == (4, 2, want3)

    docs = spark.createDataFrame(
        [(1, "one two three four"), (2, "a a a a b"), (3, "x")],
        "doc_id long, text string",
    )
    ttr = {r["doc_id"]: (r["n_tokens"], r["n_types"], r["ttr_micros"])
           for r in text_type_token_ratio(docs).collect()}
    assert ttr[1] == (4, 4, 1_000_000)
    assert ttr[2] == (5, 2, (1_000_000 * 2) // 5)
    assert ttr[3] == (1, 1, 1_000_000)


def test_user_burstiness_known_values(spark):
    """Perfectly regular gaps -> B = -0? (sigma=0, mu>0 => B=-1);
    python replay of the exact-moment identity on irregular gaps."""
    import datetime
    import math

    from graphlite_spark.operators.analytics import user_burstiness

    base = datetime.datetime(2024, 5, 1)
    rows = []
    # user 1: regular 60 s gaps -> sigma 0, B = -1
    for i in range(5):
        rows.append((1, i, base + datetime.timedelta(seconds=60 * i)))
    # user 2: bursty: gaps 1,1,1,597 s
    offs = [0, 1, 2, 3, 600]
    for i, o in enumerate(offs):
        rows.append((2, 10 + i, base + datetime.timedelta(seconds=o)))
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = {r["user_id"]: (r["n_gaps"], r["sum_gap_s"], r["burstiness"])
           for r in user_burstiness(df).collect()}
    assert got[1] == (4, 240, -1.0)
    gaps = [1, 1, 1, 597]
    n, s1, s2 = 4, sum(gaps), sum(g * g for g in gaps)
    r = n * s2 - s1 * s1
    want = round((math.sqrt(r) - s1) / (math.sqrt(r) + s1), 6)
    assert got[2] == (4, 600, want)
    # near the n=4 ceiling B_max = (sqrt(3)-1)/(sqrt(3)+1) ~= 0.268
    assert want > 0.25


def test_tool_pmi_known_values(spark):
    """Hand-computed PMI on 4 conversations: co-present pair above
    independence gets pmi > 0, anti-associated pair < 0."""
    import math

    from graphlite_spark.sources.transcripts import tool_cooccurrence_pmi

    rows = []
    # convs 1,2: {a, b} together; conv 3: {a, c}; conv 4: {b, c}
    for conv, tools in (("c1", "ab"), ("c2", "ab"), ("c3", "ac"), ("c4", "bc")):
        for i, t in enumerate(tools):
            rows.append((conv, i, "assistant", "x", t, None))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp")
    got = {(r["tool_a"], r["tool_b"]): (r["n_both"], r["pmi"])
           for r in tool_cooccurrence_pmi(df).collect()}
    # N=4, c_a=3, c_b=3, c_c=2
    assert got[("a", "b")] == (2, round(math.log(2 * 4 / (3 * 3)), 6))
    assert got[("a", "c")] == (1, round(math.log(1 * 4 / (3 * 2)), 6))
    assert got[("b", "c")] == (1, round(math.log(1 * 4 / (3 * 2)), 6))
    assert got[("a", "b")][1] < 0 or got[("a", "b")][1] > -0.2  # ln(8/9)


def test_daily_anomaly_replay(spark):
    """numpy replay: z = (y - trailing-mean)/trailing-sample-std; NULL
    until the window is full and when the window is flat; a spiked day
    scores > 3 sigma."""
    import datetime

    import numpy as np

    from graphlite_spark.operators.analytics import daily_anomaly

    base = datetime.datetime(2024, 6, 1)
    counts = [5, 6, 5, 4, 5, 6, 5, 5, 50, 5, 6, 4, 5, 7]  # spike day 8
    rows = [("a", base + datetime.timedelta(days=d))
            for d, c in enumerate(counts) for _ in range(c)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {r["day"]: (r["y"], r["z"])
           for r in daily_anomaly(df).collect()}
    d0 = min(got)
    for off in range(len(counts)):
        y, z = got[d0 + off]
        assert y == counts[off]
        if off < 7:
            assert z is None  # window not full
            continue
        win = np.array(counts[off - 7:off], dtype=float)
        if win.std(ddof=1) == 0:
            assert z is None  # flat window
        else:
            want = round(float((counts[off] - win.mean()) / win.std(ddof=1)), 6)
            assert z == want, (off, z, want)
    assert got[d0 + 8][1] > 3  # the spike is flagged


def test_pareto_concentration_replay(spark):
    """The distributed bucketed prefix-sum equals the plain sorted
    cumsum, incl. with a bucket size smaller than the unit count (so
    the bucket-boundary path actually exercises); exact 80% crossing."""
    import numpy as np

    from graphlite_spark.operators.analytics import pareto_concentration

    rng = np.random.RandomState(5)
    counts = [int(c) for c in rng.zipf(1.6, size=200).clip(1, 500)]
    rows = [(u, 0) for u, c in enumerate(counts) for _ in range(c)]
    df = spark.createDataFrame(rows, "user_id long, pad int")
    r = pareto_concentration(df, bucket_size=16).collect()[0]

    xs = sorted(counts, reverse=True)
    total = sum(xs)
    cum, k = 0, None
    for i, x in enumerate(xs):
        cum += x
        if cum * 5 >= total * 4:
            k = i + 1
            break
    assert (r["n_units"], r["total_events"], r["k_units"]) == (200, total, k)
    assert r["unit_share_micros"] == (1_000_000 * k) // 200
    assert k < 200 * 0.5  # zipf: few units dominate
