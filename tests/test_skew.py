"""Hub-skew scatter split: identical results with and without it on a
hub-heavy (star + chains) graph."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from graphlite_spark.algos.pagerank import PageRank
from graphlite_spark.operators.pregel import PregelEngine
from tests.reference_sim import simulate_pagerank


def hub_graph():
    """One hub (vertex 0) pointing at everyone + a few back-edges/chains."""
    n = 300
    edges = [(0, i) for i in range(1, n)]          # hub fan-out 299
    edges += [(i, i + 1) for i in range(1, n - 1, 3)]
    edges += [(i, 0) for i in range(1, n, 7)]      # fan-in to the hub
    return edges, n


def test_hub_split_parity(spark):
    edges, n = hub_graph()
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    v = spark.range(n).select(F.col("id"))

    plain = PregelEngine(num_partitions=4).run(v, e, PageRank())
    skewed = PregelEngine(num_partitions=4, hub_threshold=50).run(v, e, PageRank())
    expected, ss = simulate_pagerank(edges, n)

    assert plain.supersteps == skewed.supersteps == ss
    got_p = {r["id"]: r["value"] for r in plain.state.collect()}
    got_s = {r["id"]: r["value"] for r in skewed.state.collect()}
    for i in range(n):
        assert math.isclose(got_s[i], expected[i], abs_tol=1e-6)
        assert math.isclose(got_s[i], got_p[i], abs_tol=1e-9)
