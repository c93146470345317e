"""Neighborhood feature aggregation (GNN/feature-engineering prep).

The standard pre-training transform for graph ML: for every vertex,
aggregate a numeric attribute over its neighbors (one message-passing
layer, materialized).  Also yields classic graph statistics directly —
the entry query computes average neighbor degree (degree assortativity's
raw ingredient) by feeding the degree table back in as the attribute.

Scale shape: one equi-join of the edge table against the (id, value)
attribute table on the neighbor side, then one map-side-combined
groupBy on the ego side — sum/min/max/count are all
partial-aggregatable, so a hub's reducer sees at most P partial rows.
The mean is derived as one double division over the exact integer/sum
pair, rounded to 6dp (the repo's cross-engine float discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphlite_spark.algos.components import symmetrize


def neighborhood_agg(
    vertices: DataFrame,
    edges: DataFrame,
    values: DataFrame,
    value_col: str = "value",
    direction: str = "both",
) -> DataFrame:
    """(id, n_nbrs, sum_val, min_val, max_val, mean_val) — aggregate
    ``values``' ``value_col`` over each vertex's neighbors.

    ``direction``: "both" aggregates over the undirected closure, "out"
    over out-neighbors, "in" over in-neighbors.  Vertices with no
    neighbors report n_nbrs=0 and NULL aggregates.
    """
    if direction == "both":
        adj = symmetrize(edges).select("src", "dst")
    elif direction == "out":
        adj = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    elif direction == "in":
        adj = (
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
    else:
        raise ValueError(f"direction must be both|out|in, got {direction!r}")
    nbr_vals = adj.join(
        values.select(F.col("id").alias("dst"), F.col(value_col).alias("v")),
        "dst",
    )
    agg = nbr_vals.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("n_nbrs"),
        F.sum("v").alias("sum_val"),
        F.min("v").alias("min_val"),
        F.max("v").alias("max_val"),
    )
    out = vertices.select("id").join(agg, "id", "left")
    # preserve the attribute's numeric family: integral inputs stay exact
    # BIGINT (sum of longs can't be narrowed silently), fractional inputs
    # come back as rounded doubles — a blanket long cast would silently
    # truncate fractional attribute values
    integral = dict(values.dtypes)[value_col] in (
        "tinyint", "smallint", "int", "bigint"
    )
    if integral:
        svals = [F.col(c).cast("long").alias(c)
                 for c in ("sum_val", "min_val", "max_val")]
    else:
        svals = [F.round(F.col(c).cast("double"), 6).alias(c)
                 for c in ("sum_val", "min_val", "max_val")]
    return out.select(
        "id",
        F.coalesce("n_nbrs", F.lit(0)).cast("long").alias("n_nbrs"),
        *svals,
        F.round(F.col("sum_val") / F.col("n_nbrs"), 6).alias("mean_val"),
    )
