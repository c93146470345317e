"""SGC-style k-hop feature smoothing — the GNN precompute primitive.

Simplified Graph Convolution (Wu et al., ICML 2019) showed that for many
graph-ML tasks the expensive part of a GCN is just the fixed feature
propagation ``X' = Â^k X`` (Â = self-loop-normalized adjacency), which
can be PRECOMPUTED once and handed to a plain classifier.  That
precompute is the canonical distributed sparse-adjacency × dense-feature
multiply, and this module implements it exactly — the feature-engineering
sibling of the k-hop samplers in :mod:`graphlite_spark.algos.sampling`.

Representation: features ride in LONG form ``(id, feature, val_micros)``
with absent rows meaning exact zero — sparsity is preserved hop to hop
(a row only exists where the k-hop neighborhood carries mass), so the
frame never densifies to V×d.  One smoothing hop is one equi-join on the
edge source + one map-side-combined (id, feature) sum + one V-sized
degree join: the Pregel gather shuffle shape, linear in E·d_avg.

Exactness discipline: values are integer micros and each hop's mean is
the exact integer division ``sum div (deg + 1)`` (mean over neighbors ∪
self, the A+I convention).  All values are non-negative, so Spark's
``div`` (toward zero) and DuckDB's ``//`` (floor) agree — the reason
the operator requires non-negative inputs rather than verifying sign
parity per hop.

At 100 TB: bucket both the feature table and the symmetrized edge table
by id (`sources.sinks.write_bucketed_table`) and every hop's join runs
exchange-free; the per-hop groupBy partial-aggregates map-side, so the
shuffle carries at most one row per (vertex, feature) regardless of
degree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def smooth_features(
    features: DataFrame,
    edges: DataFrame,
    hops: int = 2,
    id_col: str = "id",
    feat_col: str = "feature",
    val_col: str = "val_micros",
) -> DataFrame:
    """(id, feature, val_micros) — ``hops`` rounds of exact mean
    smoothing over neighbors ∪ self.  ``edges`` (src, dst) must be
    SYMMETRIC, distinct and self-loop-free; ``val_micros`` non-negative
    BIGINT micros.  Vertices absent from ``edges`` (isolates) keep their
    own features unchanged (deg 0 → divide by 1)."""
    deg = edges.groupBy(F.col("src").alias(id_col)).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    f = features.select(
        F.col(id_col), F.col(feat_col), F.col(val_col).cast("long").alias("v")
    )
    for _ in range(hops):
        gathered = f.join(edges, f[id_col] == edges["src"]).select(
            F.col("dst").alias(id_col), F.col(feat_col), F.col("v")
        )
        summed = (
            f.unionByName(gathered)
            .groupBy(id_col, feat_col)
            .agg(F.sum("v").cast("long").alias("s"))
        )
        f = (
            summed.join(deg, id_col, "left")
            .withColumn("deg", F.coalesce("deg", F.lit(0)))
            .select(
                id_col,
                feat_col,
                F.expr("s div (deg + 1)").cast("long").alias("v"),
            )
        )
    return f.select(id_col, feat_col, F.col("v").alias(val_col))
