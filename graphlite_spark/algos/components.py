"""Connected components via min-label propagation (Pregel HashMin).

Named by the north rule as a built-in the reference lacks (GraphLite ships
only PageRank — example/Makefile); follows the same vertex-program shape as
example/PageRankVertex.cc.  Components are defined over the *undirected*
closure of the edge set (FIXTURES.md §4): component(v) = min vertex id
reachable from v treating edges as undirected.

Semantics per superstep:
  ss0   : every vertex sends its own id to all neighbors, votes to halt.
  ss>=1 : reactivated vertices take m = min(inbox); if m < value, adopt it
          and re-broadcast; always vote to halt after compute.
Termination is the engine's built-in ``act==0 && sent==0`` test.
Converges in O(diameter) supersteps; every reduction is min (commutative +
associative), so Spark's map-side partial agg acts as the combiner.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphlite_spark.operators.pregel import (
    PregelAlgorithm,
    PregelEngine,
    PregelResult,
    warn_if_not_converged,
)


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected closure: src<->dst union, self-loops dropped, deduped."""
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (
        fwd.unionByName(rev)
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )


class ConnectedComponents(PregelAlgorithm):
    name = "connected_components"
    value_type = "long"
    combine_expr = staticmethod(F.min)

    def __init__(self, max_supersteps: int = 200):
        self.max_supersteps = max_supersteps

    def init_value(self) -> Column:
        return F.col("id")

    def update_value(self, superstep: int, aggr: dict[str, float]) -> Column:
        if superstep == 0:
            return F.col("value")
        return F.when(
            F.col("has_msg") & (F.col("msg") < F.col("value")), F.col("msg")
        ).otherwise(F.col("value"))

    def update_send(self, superstep: int, aggr: dict[str, float]) -> Column:
        if superstep == 0:
            return F.lit(True)
        return F.col("has_msg") & (F.col("msg") < F.col("value"))

    def update_halt(self, superstep: int, aggr: dict[str, float]) -> Column:
        return F.lit(True)

    def message(self, superstep: int, aggr: dict[str, float]) -> Column:
        return F.col("value")

    # vectorized kernel hooks for the CSR engine (operators/csr.py)
    reduce_kind = "min"
    msg_dtype = "int64"

    def message_numpy(self, values, out_degree, superstep, aggr):
        return values


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    num_partitions: int | None = None,
    checkpointer=None,
    run_id: str = "cc",
    already_undirected: bool = False,
) -> PregelResult:
    und = edges if already_undirected else symmetrize(edges)
    eng = PregelEngine(num_partitions=num_partitions, checkpointer=checkpointer,
                       run_id=run_id)
    return warn_if_not_converged(
        eng.run(vertices, und, ConnectedComponents()), "connected_components"
    )
