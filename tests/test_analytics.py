"""Cohort/rollup/pivot/MAD operators vs Python brute force."""

from __future__ import annotations

import datetime
import statistics

from graphlite_spark.operators.analytics import (
    WEEK_US,
    events_pivot,
    events_rollup,
    retention_cohorts,
    value_outliers_mad,
)

BASE = datetime.datetime(2024, 1, 1)


def _events(spark, rows):
    # rows: (event_id, day_offset_hours, user_id, event_type, value)
    data = [
        (i, BASE + datetime.timedelta(hours=h), u, t, v)
        for i, h, u, t, v in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )


def test_retention_cohorts_bruteforce(spark):
    # user 0 first week w0 active w0,w1,w3; user 1 first w1 active w1
    rows = [
        (0, 0, 0, "click", 1.0),
        (1, 24 * 7, 0, "click", 1.0),
        (2, 24 * 21, 0, "view", 1.0),
        (3, 24 * 7 + 5, 1, "click", 1.0),
        (4, 24 * 7 + 9, 1, "error", 1.0),  # same week — counts once
    ]
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in retention_cohorts(_events(spark, rows)).collect()
    }
    w0 = int(BASE.replace(tzinfo=datetime.timezone.utc).timestamp()
             * 1_000_000) // WEEK_US
    assert got == {
        (w0, 0): 1,
        (w0, 1): 1,
        (w0, 3): 1,
        (w0 + 1, 0): 1,
    }


def test_events_rollup_lattice(spark):
    rows = [
        (0, 1, 0, "click", 1.25),
        (1, 2, 0, "click", 2.00),
        (2, 30, 1, "view", 0.50),
    ]
    out = {
        (r["event_type"], r["day_us"], r["gid"]): (
            r["n"],
            r["sum_value_micros"],
        )
        for r in events_rollup(_events(spark, rows)).collect()
    }
    day0 = int(BASE.replace(tzinfo=datetime.timezone.utc).timestamp()
               * 1_000_000)
    day1 = day0 + 24 * 3600 * 1_000_000
    # leaf rows (gid 0), per-type subtotals (gid 1), grand total (gid 3)
    assert out[("click", day0, 0)] == (2, 3_250_000)
    assert out[("view", day1, 0)] == (1, 500_000)
    assert out[("click", -1, 1)] == (2, 3_250_000)
    assert out[("view", -1, 1)] == (1, 500_000)
    assert out[("(all)", -1, 3)] == (3, 3_750_000)
    assert len(out) == 5


def test_events_pivot_counts(spark):
    rows = [
        (0, 0, 0, "click", 1.0),
        (1, 1, 0, "click", 1.0),
        (2, 2, 0, "purchase", 1.0),
        (3, 3, 1, "view", 1.0),
    ]
    got = {r["user_id"]: r for r in events_pivot(_events(spark, rows)).collect()}
    assert got[0]["n_click"] == 2
    assert got[0]["n_purchase"] == 1
    assert got[0]["n_view"] == 0
    assert got[0]["n_total"] == 3
    assert got[1]["n_view"] == 1
    assert got[1]["n_total"] == 1


def test_value_outliers_mad_bruteforce(spark):
    vals = [1.00, 1.10, 1.20, 1.30, 1.40, 9.99]
    rows = [(i, i, 0, "click", v) for i, v in enumerate(vals)]
    got = value_outliers_mad(_events(spark, rows), k=3).collect()
    assert len(got) == 1
    r = got[0]
    cents = sorted(round(v * 100) for v in vals)
    med = cents[(len(cents) + 1) // 2 - 1]  # lower median
    dev = sorted(abs(c - med) for c in cents)
    mad = dev[(len(dev) + 1) // 2 - 1]
    n_out = sum(1 for c in cents if abs(c - med) > 3 * mad)
    assert (r["n"], r["median_cents"], r["mad_cents"], r["n_outliers"]) == (
        len(vals), med, mad, n_out,
    )
    assert r["n_outliers"] == 1  # the 9.99 row

    # statistics.median_low agrees with the rank rule on odd counts
    assert statistics.median_low(cents) == med


def test_kaplan_meier_bruteforce(spark):
    """KM product-limit vs a python fold: lifetimes, horizon censoring,
    descending at-risk counts, per-step truncating micro products."""
    from graphlite_spark.operators.analytics import kaplan_meier

    # users with lifetimes (days): u1: 0..3 (dies t=3), u2: 0..1 (t=1),
    # u3: 2..5 (last day == horizon -> censored, t=3), u4: 5..5
    # (censored, t=0), u5: 1..2 (t=1)
    spans = {1: (0, 3), 2: (0, 1), 3: (2, 5), 4: (5, 5), 5: (1, 2)}
    rows = []
    eid = 0
    for u, (a, b) in spans.items():
        for d in (a, b):
            rows.append((eid, 24 * d, u, "click", 1.0))
            eid += 1
    df = _events(spark, rows)
    got = {
        r["duration_days"]: (
            r["n_risk"], r["n_deaths"], r["survival_micros"]
        )
        for r in kaplan_meier(df).collect()
    }

    hi = max(b for _, b in spans.values())
    lives = [(b - a, b == hi) for a, b in spans.values()]
    deaths: dict[int, int] = {}
    for t, cens in lives:
        if not cens:
            deaths[t] = deaths.get(t, 0) + 1
    want = {}
    s = 1_000_000
    for t in sorted(deaths):
        n = sum(1 for lt, _ in lives if lt >= t)
        d = deaths[t]
        s = (s * (n - d)) // n
        want[t] = (n, d, s)
    assert got == want
    # survival is monotone nonincreasing over death times
    svals = [want[t][2] for t in sorted(want)]
    assert svals == sorted(svals, reverse=True)


def test_rfm_segments_bruteforce(spark):
    """RFM lattice vs python: closed-form bucket rule over
    (metric, user) rank, per-event cents rounding."""
    from graphlite_spark.operators.analytics import rfm_segments

    rows = [
        (0, 0, 1, "view", 1.25),
        (1, 24, 1, "click", 2.00),
        (2, 48, 2, "view", 10.00),
        (3, 72, 3, "purchase", 0.10),
        (4, 72, 3, "view", 0.20),
        (5, 96, 4, "view", 5.00),
        (6, 120, 5, "click", 3.33),
        (7, 120, 5, "view", 3.33),
        (8, 120, 5, "error", 3.34),
    ]
    df = _events(spark, rows)
    got = {
        (r["r_quartile"], r["f_quartile"], r["m_quartile"]): (
            r["n_users"], r["sum_events"], r["sum_monetary_cents"]
        )
        for r in rfm_segments(df).collect()
    }

    per: dict[int, list] = {}
    for eid, h, u, t, v in rows:
        d = h // 24
        rec = per.setdefault(u, [0, 0, 0])
        rec[0] = max(rec[0], d)
        rec[1] += 1
        rec[2] += round(v * 100)
    hi = max(r[0] for r in per.values())
    base = {u: (hi - r[0], r[1], r[2]) for u, r in per.items()}
    n = len(base)

    def bucket(metric_idx):
        order = sorted(base, key=lambda u: (base[u][metric_idx], u))
        return {
            u: ((i * 4) // n) + 1 for i, u in enumerate(order)
        }

    rq, fq, mq = bucket(0), bucket(1), bucket(2)
    want: dict[tuple, list] = {}
    for u, (r, f, m) in base.items():
        key = (rq[u], fq[u], mq[u])
        acc = want.setdefault(key, [0, 0, 0])
        acc[0] += 1
        acc[1] += f
        acc[2] += m
    assert got == {k: tuple(v) for k, v in want.items()}


def test_acf_daily_bruteforce(spark):
    """Integer ACF vs python: zero-filled spine, n^2-scaled deviations,
    truncation toward zero on a negative numerator."""
    from graphlite_spark.operators.analytics import acf_daily

    # alternating-ish daily counts over days 0..6 (day 3 missing -> 0):
    # [3, 1, 4, 0, 5, 1, 4] — lag-1 acf is strongly negative
    counts = {0: 3, 1: 1, 2: 4, 4: 5, 5: 1, 6: 4}
    rows = []
    eid = 0
    for d, c in counts.items():
        for j in range(c):
            rows.append((eid, 24 * d + j, eid % 3, "view", 1.0))
            eid += 1
    df = _events(spark, rows)
    got = {
        r["lag"]: (r["n_days"], r["acf_micros"])
        for r in acf_daily(df, max_lag=3).collect()
    }

    xs = [counts.get(d, 0) for d in range(7)]
    n, s = len(xs), sum(xs)
    dev = [n * x - s for x in xs]
    den = sum(v * v for v in dev)

    def trunc_div(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    want = {}
    for k in (1, 2, 3):
        num = sum(dev[t] * dev[t + k] for t in range(n - k))
        want[k] = (n, trunc_div(num * 1_000_000, den))
    assert got == want
    assert got[1][1] < 0  # the alternating series anti-correlates


def test_flesch_bruteforce(spark):
    """Flesch counts + micro score vs python over hand-built docs,
    including the zero-word and no-sentence-mark edges."""
    from pyspark.sql import functions as F

    from graphlite_spark.functions.text import (
        flesch_exprs,
        flesch_micros_expr,
        tokens_expr,
    )
    import re

    docs = [
        (1, "The cat sat. The dog ran!"),
        (2, "no sentence marks here just words"),
        (3, "Xyzzy qrst zzz."),          # consonant tokens -> 1 syl each
        (4, "   "),                       # zero words
        (5, "Why? Try my gym!"),          # y-as-vowel runs
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    toks = df.select("doc_id", "text", tokens_expr("text").alias("toks"))
    fe = flesch_exprs(F.col("text"), F.col("toks"))
    counts = toks.select(
        "doc_id",
        fe["n_words"].alias("n_words"),
        fe["n_sentences"].alias("n_sentences"),
        fe["n_syllables"].alias("n_syllables"),
    )
    out = counts.select(
        "doc_id", "n_words", "n_sentences", "n_syllables",
        flesch_micros_expr(
            F.col("n_words"), F.col("n_sentences"), F.col("n_syllables")
        ).alias("flesch_micros"),
    )
    got = {r["doc_id"]: tuple(r)[1:] for r in out.collect()}

    want = {}
    for doc_id, text in docs:
        words = [w for w in re.split(r"\s+", text.lower()) if w]
        n_w = len(words)
        n_s = max(len(re.findall(r"[.!?]+", text)), 1)
        n_y = sum(
            max(len(re.findall(r"[aeiouy]+", w)), 1) for w in words
        )
        fl = (
            206_835_000 - (1_015_000 * n_w) // n_s - (84_600_000 * n_y) // n_w
            if n_w > 0 else None
        )
        want[doc_id] = (n_w, n_s, n_y, fl)
    assert got == want
