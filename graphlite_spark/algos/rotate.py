"""Ring rotation — a pure ``sendMessageTo`` vertex program.

Exercises the reference's targeted point-send surface
(include/Vertex.h:226-228, routed by Node.cc:103-137) with NO edge table
at all: every round, each vertex point-sends its value to ``(id+1) % n``;
receivers adopt.  After K rounds, ``value(id) = (id - K) mod n`` — a
closed form the SQL oracle checks exactly, making the point-message path
oracle-verified rather than test-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphlite_spark.operators.pregel import (
    PregelAlgorithm,
    PregelEngine,
    PregelResult,
)


class RingRotate(PregelAlgorithm):
    name = "ring_rotate"
    value_type = "long"
    combine_expr = staticmethod(F.min)

    def __init__(self, n: int, rounds: int = 1):
        self.n = n
        self.rounds = rounds
        self.max_supersteps = rounds + 2

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
        if superstep >= self.rounds:
            return None
        return state.select(
            ((F.col("id") + 1) % self.n).alias("dst"), F.col("value").alias("msg")
        )

    def point_sent_count(self, superstep, aggr):
        # one targeted send per vertex per rotation round — folding this
        # into the stats action keeps the one-action-per-superstep
        # invariant (no pm.count() job)
        return F.lit(1)


def ring_rotate(
    vertices: DataFrame, rounds: int = 1, num_partitions: int | None = None
) -> PregelResult:
    spark = vertices.sparkSession
    n = vertices.count()
    empty_edges = spark.createDataFrame([], "src long, dst long, weight double")
    eng = PregelEngine(num_partitions=num_partitions)
    return eng.run(vertices, empty_edges, RingRotate(n, rounds=rounds))
