"""Deterministic Zipf-tail graph generator (skew-stress substrate)."""

from __future__ import annotations

import pytest

from graphlite_spark.sources.synthetic import zipf_edges


def test_zipf_edges_deterministic_and_skewed(spark):
    a = zipf_edges(spark, 5000, 50000, hub_rank=10, seed=5)
    b = zipf_edges(spark, 5000, 50000, hub_rank=10, seed=5)
    ra = sorted((r["src"], r["dst"]) for r in a.collect())
    rb = sorted((r["src"], r["dst"]) for r in b.collect())
    assert ra == rb and len(ra) > 45000  # pure function of (seed, index)

    from pyspark.sql import functions as F

    deg = (
        a.select(F.col("dst").alias("v"))
        .groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    )
    top = deg.orderBy(F.desc("d")).limit(1).collect()[0]
    n_v = deg.count()
    # power-law shape: the top in-degree dwarfs the mean by an order of
    # magnitude+, endpoints stay in range, no self-loops
    assert top["d"] > 20 * (len(ra) / n_v)
    mm = a.agg(F.min("src"), F.max("src"), F.min("dst"), F.max("dst")).collect()[0]
    assert mm[0] >= 0 and mm[1] < 5000 and mm[2] >= 0 and mm[3] < 5000
    assert a.where(F.col("src") == F.col("dst")).count() == 0

    # different seed => different graph
    c = zipf_edges(spark, 5000, 50000, hub_rank=10, seed=6)
    assert sorted((r["src"], r["dst"]) for r in c.collect()) != ra


def test_zipf_edges_rejects_bad_hub_rank(spark):
    with pytest.raises(ValueError):
        zipf_edges(spark, 100, 1000, hub_rank=0)
    with pytest.raises(ValueError):
        zipf_edges(spark, 100, 1000, hub_rank=100)
