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
