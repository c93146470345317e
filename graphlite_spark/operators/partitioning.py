"""Partition-quality profiling: the measured edge-cut of a vertex
partitioning strategy, plus multidimensional data-layout (Z-order)
effectiveness.

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


def zorder_layout(
    events: DataFrame,
    x_col: str = "user_id",
    ts_col: str = "ts",
    bits: int = 8,
    files: int = 64,
) -> DataFrame:
    """(layout, dim, n_buckets, avg_span_micros, max_span) — measured
    file-skipping effectiveness of a Z-ORDER (Morton-interleaved) data
    layout vs the naive single-key linear sort, on the (``x_col``,
    day-of-``ts_col``) plane.

    This is the operator behind ``OPTIMIZE ... ZORDER BY`` (Delta) /
    Iceberg sort orders: at 100 TB a table is pruned by per-file min/max
    column ranges, so the quantity that decides scan cost for a point
    filter is each file's VALUE SPAN per dimension.  A linear layout
    (sort by ``x_col`` only) gives spans of ~domain/files on the sort
    key but the FULL domain on every other dimension — second-key
    filters scan everything.  Interleaving the top ``bits`` of both
    dimensions (Morton order) and range-bucketing the interleaved key
    into ``files`` buckets bounds BOTH spans at ~domain/sqrt(files):
    the measured ``avg_span_micros`` (mean bucket span as an exact
    millionths-of-domain ratio) is the expected fraction of files a
    point query must touch under uniform queries, and ``max_span`` the
    worst bucket.  Four rows: {zorder, linear} x {x, day}.

    Exactness: dimensions are scaled to ``2**bits`` ranks with exact
    integer floor division, the Morton key is an integer bit-fold
    (``aggregate(sequence(...))`` — codegen, no UDF), spans and the
    micro-ratio are exact BIGINT arithmetic; no float anywhere.

    Scale shape: one 4-way min/max aggregate (1-row bounds action, the
    ``partition_cut_report`` precedent), then a narrow 4-column
    projection feeding two map-side-combined groupBys (``files`` rows
    each) and two 1-row rollups — bounded state everywhere, no join,
    no window, nothing driver-side beyond the bounds row.  ``files``
    must divide ``4**bits`` (z buckets) and ``2**bits`` (linear
    buckets) to keep the bucketing exact."""
    dom = 1 << bits
    if (dom * dom) % files or files > dom or dom % files:
        raise ValueError(
            f"files={files} must divide 2**bits={dom} (and its square)"
        )
    spark = events.sparkSession
    ev = events.select(
        F.col(x_col).cast("long").alias("x"),
        F.datediff(
            F.col(ts_col).cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("y"),
    ).where(F.col("x").isNotNull() & F.col("y").isNotNull())
    b = ev.agg(
        F.min("x").alias("xmn"),
        F.max("x").alias("xmx"),
        F.min("y").alias("ymn"),
        F.max("y").alias("ymx"),
    ).first()
    schema = (
        "layout string, dim string, n_buckets long,"
        " avg_span_micros long, max_span long"
    )
    if b["xmn"] is None:
        return spark.createDataFrame([], schema)

    def scaled(c: str, mn: int, mx: int) -> str:
        d = mx - mn
        if d == 0:
            return "CAST(0 AS BIGINT)"
        return f"(({c} - {mn}) * {dom - 1}) div {d}"

    zstep = (dom * dom) // files
    lstep = dom // files
    fold = (
        f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT),"
        " (acc, i) -> acc"
        " + shiftleft(shiftright(xs, i) & 1, 2 * i)"
        " + shiftleft(shiftright(ys, i) & 1, 2 * i + 1))"
    )
    keyed = ev.select(
        F.expr(scaled("x", b["xmn"], b["xmx"])).alias("xs"),
        F.expr(scaled("y", b["ymn"], b["ymx"])).alias("ys"),
    ).select(
        "xs",
        "ys",
        F.expr(f"({fold}) div {zstep}").alias("zb"),
        F.expr(f"xs div {lstep}").alias("lb"),
    )

    def layout(bucket: str, name: str) -> DataFrame:
        per = keyed.groupBy(bucket).agg(
            (F.max("xs") - F.min("xs") + 1).alias("sx"),
            (F.max("ys") - F.min("ys") + 1).alias("sy"),
        )
        roll = per.agg(
            F.count(F.lit(1)).cast("long").alias("nb"),
            F.sum("sx").alias("tx"),
            F.max("sx").alias("mx"),
            F.sum("sy").alias("ty"),
            F.max("sy").alias("my"),
        )
        return roll.selectExpr(
            f"stack(2, '{x_col}', (1000000 * tx) div (nb * {dom}), mx,"
            f" 'day', (1000000 * ty) div (nb * {dom}), my)"
            " AS (dim, avg_span_micros, max_span)",
            "nb AS n_buckets",
        ).select(
            F.lit(name).alias("layout"),
            "dim",
            F.col("n_buckets").cast("long"),
            F.col("avg_span_micros").cast("long"),
            F.col("max_span").cast("long"),
        )

    return layout("zb", "zorder").unionAll(layout("lb", "linear"))
