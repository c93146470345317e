"""Key-distribution profiling — the numbers read before sizing a shuffle.

Before joining or aggregating a 100 TB table on a key, two questions
decide the physical plan: how evenly does the key hash-partition
(salting decision), and which keys are heavy (broadcast/skew-join
decision).  Both are one map-side-combined aggregation:

* :func:`partition_histogram` — rows per hash bucket under the
  engine-portable ``hash48(key) % num_buckets``: a direct preview of
  what ``repartition(num_buckets, key)`` would do to this column.  The
  md5 hash differs from Spark's internal murmur, but uniformity behaves
  the same and the report is oracle-exact.
* :func:`heavy_hitters` — the exact top-k keys by count.  The grouped
  count is map-side-combined and the top-k compiles to
  ``TakeOrderedAndProject`` (per-partition partial top-k, then a k-row
  merge on the driver) — the scalable global-top-k shape, never a
  single-partition window.  Deterministic (count DESC, key ASC)
  tie-break so the k rows are engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphlite_spark.functions.hashes import hash48


def partition_histogram(
    df: DataFrame, key_col: str, num_buckets: int = 32
) -> DataFrame:
    """(bucket, n_rows, n_keys) — per-hash-bucket row count and distinct
    key count; empty buckets are absent (at production key cardinality
    every bucket is hit)."""
    b = (hash48(F.col(key_col).cast("string")) % num_buckets).alias("bucket")
    return (
        df.select(b, F.col(key_col).alias("k"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("k").cast("long").alias("n_keys"),
        )
    )


def heavy_hitters(df: DataFrame, key_col: str, k: int = 20) -> DataFrame:
    """(key, n_rows) — the exact k most frequent keys, (count DESC, key
    ASC) tie-break.  orderBy().limit() compiles to TakeOrderedAndProject:
    each partition keeps k rows, the driver merges k·P — no global sort,
    no single-partition window."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    return counts.orderBy(F.col("n_rows").desc(), F.col("key").asc()).limit(k)


def vocab_zipf_alpha(
    docs: DataFrame, fmin: int = 2, text_col: str = "text"
) -> DataFrame:
    """One row (n_tail, alpha) — the continuous-approximation MLE for the
    token-frequency power-law exponent (Clauset, Shalizi & Newman 2009,
    public literature — the same estimator algos.stats.powerlaw_alpha
    applies to degrees, here over the corpus vocabulary): alpha =
    1 + n / Σ ln(f / (fmin − 1/2)) over term totals f >= fmin.  Zipf's
    law over the vocabulary is the standard sanity readout of a text
    corpus before training (a truncated or template-heavy crawl shows up
    as a broken tail).

    Determinism discipline (the powerlaw_alpha rules): one 6dp-stable
    micro-unit rounding per TERM before an exact BIGINT sum, then a
    single float division.  NULL alpha when no term reaches fmin.

    Shape: one tokenize+explode pass, one map-side-combined term count,
    one 1-row aggregate — no window, no join."""
    from graphlite_spark.functions.text import tokens_expr

    counts = (
        docs.select(F.explode(tokens_expr(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
        .where(F.col("f") >= fmin)
    )
    terms = counts.select(
        F.round(
            F.log(F.col("f").cast("double") / (fmin - 0.5)) * 1_000_000
        )
        .cast("long")
        .alias("lt")
    )
    s = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.sum("lt").alias("slt"),
    )
    return s.select(
        "n_tail",
        F.when(
            F.col("slt") > 0,
            F.round(
                F.lit(1.0)
                + F.col("n_tail").cast("double") * 1_000_000.0
                / F.col("slt").cast("double"),
                6,
            ),
        ).alias("alpha"),
    )


def profile_columns(
    df: DataFrame,
    numeric: tuple = (),
    string: tuple = (),
    timestamp: tuple = (),
) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_null,
    n_distinct, min_num, max_num, min_str, max_str) — the data-quality
    pass a pipeline runs before trusting a new table.  Numerics are
    normalized to BIGINT micro-units and timestamps to epoch micros
    (min/max land in min_num/max_num, exact on both engines); strings
    compare lexicographically in min_str/max_str.  n_distinct counts
    distinct NON-NULL values.

    Scale shape: the table is melted once to (column, value) — rows x
    n_cols, one projection, no Expand — then ONE groupBy("column")
    computes every statistic; the distinct count is the only two-phase
    aggregate, keyed by (column, value) so it partial-aggregates
    map-side.  At 100 TB swap the exact distinct for the HLL register
    path in sketches.hll_distinct_by — same melt, bounded state."""
    kinds: list[tuple[str, str]] = (
        [(c, "num") for c in numeric]
        + [(c, "str") for c in string]
        + [(c, "ts") for c in timestamp]
    )
    structs = []
    for c, kind in kinds:
        if kind == "num":
            v_num = F.round(F.col(c).cast("double") * 1_000_000).cast(
                "long"
            )
            v_str = F.lit(None).cast("string")
        elif kind == "ts":
            v_num = F.unix_micros(F.col(c).cast("timestamp"))
            v_str = F.lit(None).cast("string")
        else:
            v_num = F.lit(None).cast("long")
            v_str = F.col(c).cast("string")
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(c).isNull().cast("long").alias("is_null"),
                v_num.alias("v_num"),
                v_str.alias("v_str"),
                F.coalesce(
                    v_num.cast("string"), v_str
                ).alias("v_key"),
            )
        )
    melted = df.select(
        F.explode(F.array(*structs)).alias("m")
    ).select("m.*")
    return melted.groupBy("column").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("is_null").cast("long").alias("n_null"),
        F.countDistinct("v_key").cast("long").alias("n_distinct"),
        F.min("v_num").alias("min_num"),
        F.max("v_num").alias("max_num"),
        F.min("v_str").alias("min_str"),
        F.max("v_str").alias("max_str"),
    )


def k_anonymity(
    events: DataFrame,
    qi_cols: list | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """(class_size, n_classes, n_rows) — the k-anonymity risk histogram
    (Sweeney 2002): rows grouped by the quasi-identifier tuple
    (event_type, day, hour by default) form equivalence classes; a
    released table is k-anonymous iff every class has size >= k, so the
    histogram's low end IS the re-identification risk (size-1 classes
    are unique fingerprints).  n_rows = class_size * n_classes makes
    rows-at-risk one filter away.

    Scale shape: two map-side-combined groupBys (QI tuple -> class
    sizes -> histogram), nothing else — the canonical double-aggregation
    that never materializes per-individual state."""
    from pyspark.sql import functions as F

    if qi_cols is None:
        t = F.col(ts_col).cast("timestamp")
        qi = [
            F.col("event_type"),
            F.to_date(t).alias("day"),
            F.hour(t).alias("hour"),
        ]
    else:
        qi = [F.col(c) for c in qi_cols]
    classes = events.groupBy(*qi).agg(
        F.count(F.lit(1)).cast("long").alias("class_size")
    )
    return (
        classes.groupBy("class_size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_classes"))
        .select(
            "class_size",
            "n_classes",
            (F.col("class_size") * F.col("n_classes"))
            .cast("long")
            .alias("n_rows"),
        )
    )
