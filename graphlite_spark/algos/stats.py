"""Whole-graph summary statistics.

Degree assortativity (Newman 2002, public literature): the Pearson
correlation of the degrees at either end of an edge, over the undirected
closure.  Positive = hubs attach to hubs (social networks), negative =
hubs attach to leaves (star-shaped link graphs — the transcript graph is
strongly negative because conversation chains hang off tool hubs).

Cross-engine exactness discipline: every Σ (count, Σx, Σxy, Σx², …) is an
exact INTEGER aggregate in both engines; floats enter only in the final
correlation expression, written with the identical structure on both
sides (each long subexpression cast to double before the one multiply
that could overflow 64 bits), so the 6dp-rounded result cannot diverge.

Scale shape: two equi-joins of the edge table against the degree table
(broadcast-able — the degree table is vertex-sized), then ONE map-side-
combined global aggregate: six partial sums per partition, a single
1-row reduce.  No window, no collect-loop.  At 10^12-edge scale the
raw long sums Σ(dx·dy) can exceed 2^63 — pre-aggregate by (dx, dy)
degree pair and sum counts in DECIMAL(38,0) there; at any scale this
module's shape (join + one global agg) is the right plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphlite_spark.algos.components import symmetrize


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """One row: (m, assortativity) — m = directed representations of the
    undirected edge set; assortativity = Pearson r of (deg(u), deg(v))
    over those edge endpoints, rounded to 6dp.  NULL when the graph is
    degree-regular (zero variance)."""
    und = symmetrize(edges).select("src", "dst")
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    dx = deg.select(F.col("src").alias("u"), F.col("d").alias("dx"))
    dy = deg.select(F.col("src").alias("v"), F.col("d").alias("dy"))
    ee = (
        und.join(dx, und["src"] == dx["u"])
        .join(dy, und["dst"] == dy["v"])
        .select("dx", "dy")
    )
    s = ee.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    m, sx, sy = F.col("m"), F.col("sx"), F.col("sy")
    num = (m * F.col("sxy") - sx * sy).cast("double")
    varx = (m * F.col("sxx") - sx * sx).cast("double")
    vary = (m * F.col("syy") - sy * sy).cast("double")
    return s.select(
        "m",
        F.round(num / F.sqrt(varx * vary), 6).alias("assortativity"),
    )
