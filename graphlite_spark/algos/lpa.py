"""Synchronous label propagation (community detection flavor).

Built-in named by the north rule (absent from the reference, which ships
only PageRank).  Deterministic variant so golden tests and the SQL oracle
are exact:

  * labels start as the vertex id;
  * each iteration, every vertex broadcasts its label over the undirected
    edge set, then adopts the **most frequent** incoming label, breaking
    ties by **minimum label**; vertices with no neighbors keep their label;
  * runs a fixed number of iterations (LPA has no monotone convergence
    guarantee, so fixed-iteration is the reproducible contract; the
    iteration count is mirrored by the unrolled oracle SQL).

Superstep mapping: ss0 broadcasts initial labels only; ss 1..K update then
broadcast; the run exhausts max_supersteps = K+1 (no vote-to-halt).

The combine step is NOT a simple aggregate expression — mode with tie-break
needs (dst, label) counts + an argmax.  It stays entirely JVM-side:
groupBy(dst, msg).count() then max_by via a struct-ordering trick.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphlite_spark.algos.components import symmetrize
from graphlite_spark.operators.pregel import PregelAlgorithm, PregelEngine, PregelResult


class LabelPropagation(PregelAlgorithm):
    name = "label_propagation"
    value_type = "long"

    def __init__(self, iterations: int = 5):
        self.iterations = iterations
        self.max_supersteps = iterations + 1

    def init_value(self) -> Column:
        return F.col("id")

    def expr_cache_token(self, superstep: int, aggr: dict) -> object:
        # update_send bakes ``superstep < iterations`` into a literal, so
        # the token carries that flag alongside the ss0 branch (pregel.py
        # expr_cache_token contract)
        return (superstep == 0, superstep < self.iterations)

    def update_value(self, superstep: int, aggr: dict[str, float]) -> Column:
        if superstep == 0:
            return F.col("value")
        return F.when(F.col("has_msg"), F.col("msg")).otherwise(F.col("value"))

    def update_send(self, superstep: int, aggr: dict[str, float]) -> Column:
        # last superstep updates only (its sends would never be delivered)
        return F.lit(superstep < self.iterations)

    def message(self, superstep: int, aggr: dict[str, float]) -> Column:
        return F.col("value")

    def combine(self, msgs: DataFrame) -> DataFrame:
        """mode(msg) per dst, min tie-break: argmax over (count, -label).

        ``max_by(msg, struct(cnt, -msg))`` picks the label with the highest
        count, then the smallest label — one hash-agg pass, with map-side
        partial aggregation on (dst, msg) first so hub vertices don't funnel
        raw messages into one reducer.
        """
        counted = msgs.groupBy("dst", "msg").agg(F.count(F.lit(1)).alias("cnt"))
        return counted.groupBy("dst").agg(
            F.max_by("msg", F.struct(F.col("cnt"), (-F.col("msg")).alias("neg"))).alias(
                "msg"
            )
        )


def label_propagation(
    vertices: DataFrame,
    edges: DataFrame,
    iterations: int = 5,
    num_partitions: int | None = None,
    checkpointer=None,
    run_id: str = "lpa",
    already_undirected: bool = False,
) -> PregelResult:
    und = edges if already_undirected else symmetrize(edges)
    eng = PregelEngine(num_partitions=num_partitions, checkpointer=checkpointer,
                       run_id=run_id)
    return eng.run(vertices, und, LabelPropagation(iterations=iterations))
