"""BFS / single-source shortest hop-distance.

Demonstrates the user-program surface (the Spark analogue of writing a new
GraphLite vertex program against include/Vertex.h): a fourth+ algorithm on
the same Pregel contract.  Unit edge weights => hop distance; min-combine;
classic reactivation semantics:

  ss0   : the source adopts distance 0 and broadcasts 1; everyone halts.
  ss>=1 : a reactivated vertex takes m = min(inbox); if m < dist it adopts
          m and broadcasts m+1; always votes to halt.

Unreached vertices keep the sentinel ``INF`` (long max / 4 to keep +1
arithmetic overflow-free).  Converges in O(eccentricity) supersteps via
the engine's act==0 && sent==0 test; ``fixed_supersteps`` caps the run for
the SQL-oracle parity query (k-hop bounded BFS, unrolled min-plus SQL).
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

INF = (1 << 62) - 1


class BFS(PregelAlgorithm):
    name = "bfs"
    value_type = "long"
    combine_expr = staticmethod(F.min)

    def __init__(self, source: int = 0, max_supersteps: int = 200,
                 fixed_supersteps: int | None = None):
        self.source = source
        self.max_supersteps = (
            fixed_supersteps if fixed_supersteps is not None else max_supersteps
        )

    def init_value(self) -> Column:
        return F.lit(INF)

    def update_value(self, superstep: int, aggr: dict[str, float]) -> Column:
        if superstep == 0:
            return F.when(F.col("id") == self.source, F.lit(0)).otherwise(F.col("value"))
        return F.when(
            F.col("has_msg") & (F.col("msg") < F.col("value")), F.col("msg")
        ).otherwise(F.col("value"))

    def update_send(self, superstep: int, aggr: dict[str, float]) -> Column:
        if superstep == 0:
            return F.col("id") == self.source
        return F.col("has_msg") & (F.col("msg") < F.col("value"))

    def update_halt(self, superstep: int, aggr: dict[str, float]) -> Column:
        return F.lit(True)

    def message(self, superstep: int, aggr: dict[str, float]) -> Column:
        return F.col("value") + 1

    # CSR kernel hooks
    reduce_kind = "min"
    msg_dtype = "int64"

    def message_numpy(self, values, out_degree, superstep, aggr):
        return values + 1


def bfs(
    vertices: DataFrame,
    edges: DataFrame,
    source: int = 0,
    num_partitions: int | None = None,
    checkpointer=None,
    run_id: str = "bfs",
    fixed_supersteps: int | None = None,
) -> PregelResult:
    algo = BFS(source=source, fixed_supersteps=fixed_supersteps)
    eng = PregelEngine(num_partitions=num_partitions, checkpointer=checkpointer,
                       run_id=run_id)
    res = eng.run(vertices, edges, algo)
    if fixed_supersteps is None:
        warn_if_not_converged(res, "bfs")
    return res
