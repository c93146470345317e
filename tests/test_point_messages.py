"""sendMessageTo parity (SURVEY.md §2.1 #5): an algorithm that uses ONLY
targeted point sends (no edge table at all) — a ring rotation."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphlite_spark.algos.rotate import RingRotate, ring_rotate
from graphlite_spark.operators.pregel import PregelEngine


def test_point_send_ring(spark):
    n = 24
    v = spark.range(n).select(F.col("id"))
    e = spark.createDataFrame([], "src long, dst long, weight double")
    res = PregelEngine(num_partitions=3).run(v, e, RingRotate(n, rounds=1))
    got = [r["value"] for r in res.state.orderBy("id").collect()]
    assert got == [(i - 1) % n for i in range(n)]
    assert res.converged
    # ss0 sent n point messages; ss1 delivered them, no further sends
    assert res.metrics[0].sent == n
    assert res.metrics[-1].sent == 0


def test_multi_round_rotation(spark):
    n = 17
    v = spark.range(n).select(F.col("id"))
    res = ring_rotate(v, rounds=4, num_partitions=2)
    got = [r["value"] for r in res.state.orderBy("id").collect()]
    assert got == [(i - 4) % n for i in range(n)]
    assert res.converged
