"""Incremental CC maintenance == full recompute; discrete quantile rank
rule vs a Python reimplementation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from graphlite_spark.algos.components import (
    connected_components_fast,
    incremental_components,
)
from graphlite_spark.operators.quantiles import grouped_quantiles
from tests.reference_sim import random_digraph


def _labels(df):
    return {r["id"]: r["component"] for r in df.collect()}


def test_incremental_cc_matches_full(spark):
    edges = random_digraph(80, 160, seed=9)
    old, new = edges[: len(edges) * 3 // 4], edges[len(edges) * 3 // 4:]
    v = spark.range(80).select("id")
    mk = lambda es: spark.createDataFrame(
        [(s, d, 1.0) for s, d in es], "src long, dst long, weight double"
    )
    prev = connected_components_fast(v, mk(old))
    got = _labels(incremental_components(prev, mk(new)))
    want = _labels(connected_components_fast(v, mk(edges)))
    assert got == want


def test_incremental_cc_new_vertices(spark):
    # the batch introduces vertices never seen before, including one whose
    # id is smaller than every existing label in its merged component
    v = spark.range(10, 20).select("id")
    old = [(10, 11), (12, 13), (14, 15)]
    new = [(5, 11), (11, 12), (99, 98), (98, 15)]
    mk = lambda es: spark.createDataFrame(
        [(s, d, 1.0) for s, d in es], "src long, dst long, weight double"
    )
    prev = connected_components_fast(v, mk(old))
    got = _labels(incremental_components(prev, mk(new)))
    allv = spark.createDataFrame(
        [(i,) for i in sorted(set(range(10, 20))
                              | {x for e in old + new for x in e})], "id long"
    )
    want = _labels(connected_components_fast(allv, mk(old + new)))
    assert got == want
    assert got[13] == 5  # new vertex 5 becomes the min label of the merge
    assert got[99] == got[14] == 14


def test_incremental_cc_self_loop_only_vertex(spark):
    # a brand-new vertex whose ONLY batch edges are self-loops must still
    # appear in the output, labeled with its own id — exactly what a full
    # recompute over vertices ∪ endpoints produces (round-3 advisory)
    v = spark.range(2).select("id")
    mk = lambda es: spark.createDataFrame(
        [(s, d, 1.0) for s, d in es], "src long, dst long, weight double"
    )
    prev = connected_components_fast(v, mk([(0, 1)]))
    got = _labels(incremental_components(prev, mk([(7, 7), (0, 1)])))
    assert got == {0: 0, 1: 0, 7: 7}


def test_grouped_quantiles_bruteforce(spark):
    rows = [("a", float(i * i % 97)) for i in range(40)] + [
        ("b", float(i)) for i in range(7)
    ] + [("c", None), ("c", 3.5)]
    df = spark.createDataFrame(rows, "grp string, value double")
    got = {r["grp"]: (r["n"], r["p50"], r["p90"], r["p99"])
           for r in grouped_quantiles(df, "grp", "value").collect()}
    by = {}
    for g, x in rows:
        if x is not None:
            by.setdefault(g, []).append(x)
    for g, xs in by.items():
        xs.sort()
        n = len(xs)
        want = tuple(
            round(xs[(n * pct + 99) // 100 - 1], 6) for pct in (50, 90, 99)
        )
        assert got[g] == (n, *want), (g, got[g], (n, *want))
    assert math.isclose(got["c"][1], 3.5)  # single non-null value


def test_quantile_bucketize_equal_frequency(spark):
    """Quartile assignment: each group's buckets are balanced to within
    the discrete-tie slack, and the bucket rule replays in python."""
    from graphlite_spark.operators.quantiles import quantile_bucketize

    rows = [(i, "g%d" % (i % 2), float((i * 37) % 101)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = quantile_bucketize(df, "g", "v", "id", 4).collect()
    assert len(got) == 400
    import math
    by_group = {}
    for (i, g, v) in rows:
        by_group.setdefault(g, []).append(v)
    cuts = {}
    for g, vs in by_group.items():
        vs = sorted(vs)
        n = len(vs)
        cuts[g] = [round(vs[math.ceil(n * p / 100) - 1], 6) for p in (25, 50, 75)]
    for r in got:
        expect = sum(1 for c in cuts[r["g"]] if r["v"] > c)
        assert r["bucket"] == expect, (r, cuts[r["g"]])
    # balance: each bucket holds ~25% (ties can skew by duplicates only)
    from collections import Counter
    for g in by_group:
        c = Counter(r["bucket"] for r in got if r["g"] == g)
        assert set(c) == {0, 1, 2, 3}
        assert max(c.values()) - min(c.values()) <= 4
