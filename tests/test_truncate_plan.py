"""Regression guard for checkpoint.truncate_plan: inherited plan
statistics must NOT compound through checkpointed self-join loops.

Without the stats reset, sizeInBytes squares every pointer-doubling
round (localCheckpoint preserves originStats), and after a few dozen
rounds Catalyst is Toom-Cook-multiplying megabyte BigIntegers — the
bow-tie query went from unfinishable to 85 s when this was fixed.  This
test would stay GREEN on a correctness-only revert, so it pins the
plan-size behavior explicitly."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphlite_spark.checkpoint import truncate_plan


def _stats_bits(df) -> int:
    return int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    ).bit_length()


def test_truncate_plan_keeps_stats_bounded(spark):
    a = spark.createDataFrame(
        [(i,) for i in range(4)], "id long"
    ).select("id", F.col("id").alias("lab"))
    e = truncate_plan(
        spark.createDataFrame(
            [(0, 1), (1, 0), (1, 2)], "src long, dst long"
        ),
        eager=True,
    )
    for _ in range(12):
        nbr = (
            e.join(
                a.select(F.col("id").alias("src"), F.col("lab").alias("sl")),
                "src",
            )
            .groupBy(F.col("dst").alias("v"))
            .agg(F.min("sl").alias("nmin"))
        )
        b = a.join(nbr, a["id"] == nbr["v"], "left").select(
            "id", F.least("lab", F.coalesce("nmin", "lab")).alias("relaxed")
        )
        pt = b.select(F.col("id").alias("pid"), F.col("relaxed").alias("pl"))
        a = truncate_plan(
            b.join(pt, b["relaxed"] == pt["pid"]).select(
                "id", F.least("relaxed", "pl").alias("lab")
            )
        )
        a.count()
        # constant leaf stats: one LogicalRDD, never the compounded
        # product of every previous round's joins
        assert _stats_bits(a) < 256, _stats_bits(a)
    labs = {r["id"]: r["lab"] for r in a.collect()}
    assert labs == {0: 0, 1: 0, 2: 0, 3: 3}


def test_plain_checkpoint_inherits_stats(spark):
    # documents the Spark behavior the fix works around: one self-join
    # behind a PLAIN localCheckpoint already carries product stats
    x = spark.createDataFrame([(i,) for i in range(4)], "id long")
    j = x.join(x.withColumnRenamed("id", "id2"), x["id"] == F.col("id2"))
    assert _stats_bits(j.localCheckpoint(eager=True)) >= 120
    assert _stats_bits(truncate_plan(j, eager=True)) < 100
