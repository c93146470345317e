"""Grouped exact discrete quantiles with an engine-portable rank rule.

``percentile``/``quantile_cont`` interpolate, and the interpolation
formulas (and their float evaluation order) differ between engines —
useless for a hash-exact oracle.  Discrete quantiles pick an ACTUAL
element: the SQL-standard ``percentile_disc(p)`` value is the smallest
element whose cumulative rank reaches ``p``, i.e. the element at
1-indexed rank ``ceil(p·n)``.  Both sides here compute that rank in
pure integer arithmetic (``(n·pct + 99) div 100`` for an integer
percent) over the same ``row_number`` ordering, so the selected values
are bit-identical across engines (ties between equal values don't
matter — the picked VALUE is the same whichever duplicate wins).

Scale shape: one hash shuffle on the group key, a per-group sort window
(``partitionBy(group).orderBy(value)`` — sort-based, spillable, never a
single global window), plus a broadcast-able per-group count join.  At
100 TB with heavy groups the drop-in approximation is
``percentile_approx`` — this operator is the exact path and the oracle
anchor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percents: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """(group, n, p<pct>...) — exact discrete quantiles of ``value_col``
    per group (NULL values excluded), one output column per requested
    integer percent, each rounded to 6dp for cross-engine hashing."""
    src = df.select(group_col, value_col).where(F.col(value_col).isNotNull())
    w = Window.partitionBy(group_col).orderBy(value_col)
    ranked = src.withColumn("rn", F.row_number().over(w))
    cnt = src.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    j = ranked.join(cnt, group_col)
    aggs = [F.max("n").cast("long").alias("n")]
    for pct in percents:
        rank = F.expr(f"(n * {pct} + 99) div 100")
        aggs.append(
            F.round(
                F.max(F.when(F.col("rn") == rank, F.col(value_col))), 6
            ).alias(f"p{pct}")
        )
    return j.groupBy(group_col).agg(*aggs)


def quantile_bucketize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    num_buckets: int = 4,
) -> DataFrame:
    """(id, group, value, bucket) — per-group equal-frequency binning:
    bucket(v) = how many of the group's B-1 discrete quantile cut points
    v strictly exceeds (0..B-1).  The ML feature-prep step
    (``QuantileDiscretizer``) re-expressed on the exact,
    engine-portable rank rule of :func:`grouped_quantiles`, so bucket
    assignments are integer-exact across engines — the oracle anchor for
    an approximate discretizer at 100 TB.

    Scale shape: the quantile pass (one per-group sort window), then one
    broadcast-able join of the tiny per-group cut table back to the
    rows; the bucket expression is pure whole-stage codegen.
    ``num_buckets`` must divide 100 (integer percents keep the rank rule
    exact)."""
    if 100 % num_buckets != 0:
        raise ValueError("num_buckets must divide 100")
    percents = tuple(
        (100 // num_buckets) * i for i in range(1, num_buckets)
    )
    cuts = grouped_quantiles(df, group_col, value_col, percents)
    src = df.select(id_col, group_col, value_col).where(
        F.col(value_col).isNotNull()
    )
    j = src.join(cuts.drop("n"), group_col)
    bucket = None
    for pct in percents:
        term = (F.col(value_col) > F.col(f"p{pct}")).cast("long")
        bucket = term if bucket is None else bucket + term
    return j.select(
        id_col, group_col, value_col, bucket.cast("long").alias("bucket")
    )


def median_two_pass(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    bin_width_cents: int = 1000,
) -> DataFrame:
    """(group, n, median_cents) — the SCALE path for an exact grouped
    median: instead of one per-group sort window over all rows (the
    definition, fine until a group stops fitting a sort spill budget),
    locate the median in TWO bounded passes — (1) a map-side-combined
    histogram over ``bin_width_cents`` bins picks the bin holding rank
    ``ceil(n/2)`` via a cumulative sum over the BIN table (bounded by
    value range / width, not rows); (2) only that bin's rows are
    re-scanned and the exact in-bin rank is selected with a window
    whose partitions hold one bin's worth of rows.  The oracle is the
    plain single-sort discrete median — same value by construction, so
    the green row PROVES the two-pass algorithm, not just the plan.

    Exactness: integer cents, the shared lower-median rank rule
    (``rank = (n + (n % 2)) div 2`` == ceil(n/2))."""
    cents = events.select(
        F.col(group_col).alias("g"),
        F.round(F.col(value_col) * 100).cast("long").alias("c"),
    )
    W = int(bin_width_cents)
    bins = cents.groupBy(
        "g", F.expr(f"(c - (c % {W} + {W}) % {W}) div {W}").alias("b")
    ).agg(F.count(F.lit(1)).cast("long").alias("bc"))
    wb = Window.partitionBy("g").orderBy("b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wn = Window.partitionBy("g")
    located = bins.select(
        "g", "b", "bc",
        F.coalesce(F.sum("bc").over(wb), F.lit(0)).alias("before"),
        F.sum("bc").over(wn).cast("long").alias("n"),
    ).where(
        (F.col("before") < F.expr("(n + n % 2) div 2"))
        & (
            F.col("before") + F.col("bc")
            >= F.expr("(n + n % 2) div 2")
        )
    )
    # pass 2: rows of the located bin only; in-bin rank selection
    tgt = located.select(
        "g", "b", "before", "n",
        (F.expr("(n + n % 2) div 2") - F.col("before")).alias("ib"),
    )
    tgt2 = tgt.select(
        F.col("g").alias("g2"), F.col("b").alias("b2"), "ib", "n"
    )
    inbin = cents.withColumn(
        "cb", F.expr(f"(c - (c % {W} + {W}) % {W}) div {W}")
    ).join(
        tgt2,
        (F.col("g") == F.col("g2")) & (F.col("cb") == F.col("b2")),
    ).select("g", "c", "ib", "n")
    wr = Window.partitionBy("g").orderBy("c")
    return (
        inbin.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == F.col("ib"))
        .select(
            F.col("g").alias(group_col),
            F.col("n"),
            F.col("c").alias("median_cents"),
        )
    )
