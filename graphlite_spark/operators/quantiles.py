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
