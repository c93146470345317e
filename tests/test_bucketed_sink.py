"""Bucketed-table sink: the co-located-join layout must actually remove
the shuffle — the plan assertion, not just a round trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphlite_spark.sources.sinks import write_bucketed_table
from tests.reference_sim import random_digraph


@pytest.fixture()
def bucketed_edges(spark):
    edges = random_digraph(200, 600, seed=31)
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double"
    )
    write_bucketed_table(e, "bucketed_edges_t", "src", num_buckets=8,
                         sort_col="src")
    yield spark.table("bucketed_edges_t"), edges
    spark.sql("DROP TABLE IF EXISTS bucketed_edges_t")


def test_bucketed_join_has_no_exchange(spark, bucketed_edges):
    be, edges = bucketed_edges
    # the test table is tiny, so the planner would broadcast it (which
    # bypasses bucketing entirely); disable broadcast to get the big-big
    # SortMergeJoin shape a 100 TB edge self-join actually takes
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # both sides read the same bucketed layout: the equi-join on the
        # bucket key must need NO exchange on either side
        a, b = be.alias("a"), be.alias("b")
        joined = a.join(b, F.col("a.src") == F.col("b.src"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:1500]
        assert "SortMergeJoin" in plan
        # and the result is still correct
        per_src: dict[int, int] = {}
        for s, _ in edges:
            per_src[s] = per_src.get(s, 0) + 1
        want = sum(c * c for c in per_src.values())
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_edges):
    be, edges = bucketed_edges
    # aggregation on the bucket key also rides the bucket partitioning
    agg = be.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:1500]
    got = {r["src"]: r["outdeg"] for r in agg.collect()}
    per_src: dict[int, int] = {}
    for s, _ in edges:
        per_src[s] = per_src.get(s, 0) + 1
    assert got == per_src


def test_bucketed_round_trip_preserves_rows(spark, bucketed_edges):
    be, edges = bucketed_edges
    got = {(r["src"], r["dst"]) for r in be.collect()}
    assert got == set(edges)
