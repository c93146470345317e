"""Partition-quality profiling: the measured edge-cut of a vertex
partitioning strategy.

The north rule demands EXPLICIT partitioning decisions; this operator
makes them measurable: for a vertex-partitioned graph, an edge whose
endpoints land in different partitions costs one network message per
superstep, so the CUT FRACTION is the direct per-superstep shuffle-volume
multiplier.  The repo's dense-id derivation (plans/derive.py) assigns
conversation-contiguous ids, which is exactly what makes RANGE
partitioning co-locate whole conversations — this profiler turns that
design claim into a checked number (reply edges cut ~0 under range vs
~(P-1)/P under hash).

Determinism: the hash strategy uses the repo-wide 48-bit md5 (both
engines share it), NOT Spark's Murmur3 (DuckDB cannot replicate that);
range uses ceil-division blocks over [min_id, max_id].  Exact integer
counts, one 6dp division per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphlite_spark.functions.hashes import hash48


def partition_cut_report(
    edges: DataFrame,
    num_partitions: int = 8,
    salt: str = "cut",
) -> DataFrame:
    """(strategy, n_edges, cut_edges, cut_fraction) — one row per
    strategy in {hash, range}: how many directed edges cross partition
    boundaries when vertices are placed by ``hash48(salt:id) % P`` vs by
    contiguous id blocks of ceil(span / P).

    One pass over the edge table computing both strategies as
    expressions, one map-side-combined aggregate, then a 2-row
    unpivot — no join, no window."""
    spark = edges.sparkSession
    b = edges.agg(
        F.min(F.least("src", "dst")).alias("mn"),
        F.max(F.greatest("src", "dst")).alias("mx"),
    ).first()
    if b["mn"] is None:
        return spark.createDataFrame(
            [("hash", 0, 0, None), ("range", 0, 0, None)],
            "strategy string, n_edges long, cut_edges long,"
            " cut_fraction double",
        )
    span = b["mx"] - b["mn"] + 1
    block = -(-span // num_partitions)  # ceil

    def hpart(c):
        return hash48(
            F.concat_ws(":", F.lit(salt), F.col(c).cast("string"))
        ) % num_partitions

    def rpart(c):
        return (F.col(c) - F.lit(b["mn"])) / F.lit(block)

    cuts = edges.select(
        (hpart("src") != hpart("dst")).cast("long").alias("hcut"),
        (
            F.floor(rpart("src")).cast("long")
            != F.floor(rpart("dst")).cast("long")
        )
        .cast("long")
        .alias("rcut"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("hcut").cast("long").alias("hc"),
        F.sum("rcut").cast("long").alias("rc"),
    )
    row = cuts.first()
    n, hc, rc = int(row["n"]), int(row["hc"]), int(row["rc"])
    base = spark.createDataFrame(
        [("hash", n, hc), ("range", n, rc)],
        "strategy string, n_edges long, cut_edges long",
    )
    # fraction as a SPARK expression (half-up rounding, matching the
    # oracle's SQL round) — python's round() is banker's and can differ
    return base.select(
        "strategy",
        "n_edges",
        "cut_edges",
        F.when(
            F.col("n_edges") > 0,
            F.round(
                F.col("cut_edges").cast("double") / F.col("n_edges"), 6
            ),
        ).alias("cut_fraction"),
    )
