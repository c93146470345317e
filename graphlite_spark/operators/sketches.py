"""Approximate-distinct sketches for 100 TB pipelines, oracle-exact.

``approx_count_distinct`` exists in both Spark and DuckDB, but their HLL
implementations differ — useless for a cross-engine correctness gate.
The K-Minimum-Values (KMV) sketch (Bar-Yossef et al., RANDOM 2002) over
the engine-portable 48-bit md5 hash (:mod:`graphlite_spark.functions.
hashes`) is DETERMINISTIC and engine-identical, so the estimate itself is
hash-exact against the DuckDB oracle:

    est = (k - 1) * 2^48 / h_k        (h_k = k-th smallest distinct hash)

computed in integer arithmetic (``div``), no float discipline needed.
When a group has fewer than k distinct values the sketch IS exact.

Scale shape: one map-side-combined ``distinct`` on (group, hash), then a
per-group window for the k smallest — ``partitionBy(group)``, never a
single-partition window; sketch state per group is k longs (the property
that lets 10^12-row distinct counts fit in memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphlite_spark.functions.hashes import hash48

#: 2^48 — the hash space size of hash48
HASH_SPACE = 1 << 48


def kmv_distinct_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    include_exact: bool = True,
) -> DataFrame:
    """(group, est_distinct[, exact_distinct]) — KMV distinct estimate per
    group.  ``include_exact`` adds the true distinct-hash count (cheap at
    test scale; the accuracy witness) — disable at 100 TB where exact
    is the thing being avoided."""
    h = hash48(F.col(value_col).cast("string"))
    hashes = df.select(group_col, h.alias("h")).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    topk = hashes.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    mult = (k - 1) * HASH_SPACE
    est = topk.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"), F.max("h").alias("hk")
    ).select(
        group_col,
        F.when(F.col("n") < k, F.col("n"))
        .otherwise(F.expr(f"{mult} div hk"))
        .cast("long")
        .alias("est_distinct"),
    )
    if not include_exact:
        return est
    exact = hashes.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("exact_distinct")
    )
    return est.join(exact, group_col)


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    salt: str = "cms",
) -> DataFrame:
    """(row, cell, n) — a Count-Min sketch (Cormode & Muthukrishnan 2005)
    of the key's frequency distribution.  ``depth`` independent hash rows
    come from salting the shared 48-bit md5, so the sketch — and every
    estimate read from it — is deterministic and engine-identical.

    Scale shape: one explode(depth) + map-side-combined groupBy; the
    whole sketch is ``depth * width`` longs regardless of input size, the
    point of a sketch.  Heavy keys create NO reducer skew: each hot key
    folds into ``depth`` cells via the partial aggregation."""
    keyed = df.select(F.col(key_col).cast("string").alias("k")).select(
        "k", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    )
    cell = hash48(
        F.concat_ws(":", F.lit(salt), F.col("row").cast("string"), F.col("k"))
    ) % width
    return (
        keyed.select(F.col("row").cast("long").alias("row"), cell.alias("cell"))
        .groupBy("row", "cell")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def cms_estimate_heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 512,
    salt: str = "cms",
) -> DataFrame:
    """(key, exact_n, cms_est) for the k most frequent keys — the
    sketch's point-query ``min`` over its rows, joined against the exact
    counts as the accuracy witness (CMS never underestimates, so
    ``cms_est >= exact_n`` is an invariant the tests assert).  The exact
    side is affordable here by construction (top-k only); at 100 TB the
    sketch answers point queries the exact plan can't."""
    sketch = cms_build(df, key_col, depth, width, salt)
    exact = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc(key_col))
        .limit(k)
    )
    probes = exact.select(
        F.col(key_col),
        F.col("exact_n"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    ).select(
        key_col, "exact_n", F.col("row").cast("long").alias("row"),
        (
            hash48(
                F.concat_ws(
                    ":", F.lit(salt), F.col("row").cast("string"),
                    F.col(key_col).cast("string"),
                )
            ) % width
        ).alias("cell"),
    )
    # the probe side is k*depth rows — broadcast it into the sketch
    joined = sketch.join(
        F.broadcast(probes), ["row", "cell"], "inner"
    )
    return joined.groupBy(key_col, "exact_n").agg(
        F.min("n").alias("cms_est")
    )
