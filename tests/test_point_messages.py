"""sendMessageTo parity (SURVEY.md §2.1 #5): an algorithm that uses ONLY
targeted point sends (no edge table at all) — a ring rotation."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphlite_spark.operators.pregel import PregelAlgorithm, PregelEngine


class RingRotate(PregelAlgorithm):
    """ss0: every vertex point-sends its id to (id+1) % n; ss1: adopt the
    message and halt.  No edges anywhere — exercises the sendMessageTo
    path including its contribution to the `sent` termination counter."""

    name = "ring_rotate"
    value_type = "long"
    combine_expr = staticmethod(F.min)

    def __init__(self, n: int):
        self.n = n
        self.max_supersteps = 10

    def init_value(self):
        return F.col("id")

    def update_value(self, superstep, aggr):
        return F.when(F.col("has_msg"), F.col("msg")).otherwise(F.col("value"))

    def update_send(self, superstep, aggr):
        return F.lit(False)  # never uses the edge scatter

    def update_halt(self, superstep, aggr):
        return F.lit(True)

    def message(self, superstep, aggr):
        return F.col("value")

    def point_messages(self, state: DataFrame, superstep, aggr):
        if superstep > 0:
            return None
        return state.select(
            ((F.col("id") + 1) % self.n).alias("dst"), F.col("value").alias("msg")
        )


def test_point_send_ring(spark):
    n = 24
    v = spark.range(n).select(F.col("id"))
    e = spark.createDataFrame([], "src long, dst long, weight double")
    res = PregelEngine(num_partitions=3).run(v, e, RingRotate(n))
    got = [r["value"] for r in res.state.orderBy("id").collect()]
    assert got == [(i - 1) % n for i in range(n)]
    assert res.converged
    # ss0 sent n point messages; ss1 delivered them, no further sends
    assert res.metrics[0].sent == n
    assert res.metrics[-1].sent == 0
