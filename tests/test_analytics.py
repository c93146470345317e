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
