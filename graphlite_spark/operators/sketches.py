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


#: HLL bias-correction constant for m buckets: 0.7213 / (1 + 1.079/m).
#: Embedded as a full-precision literal on BOTH engines so the estimate
#: arithmetic is bit-identical.
def _hll_alpha(m: int) -> float:
    return 0.7213 / (1 + 1.079 / m)


def hll_distinct_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    b: int = 6,
    include_exact: bool = True,
) -> DataFrame:
    """(group, est_hll, n_zero_buckets[, exact_distinct]) — a
    HyperLogLog distinct estimate per group (Flajolet et al., AofA
    2007) over the engine-portable 48-bit md5 hash, DETERMINISTIC and
    engine-identical (the reason not to use ``approx_count_distinct``:
    Spark's and DuckDB's native HLLs disagree, useless for the gate).

    Register construction is pure integer/string arithmetic: bucket =
    ``h % m`` (bottom ``b`` bits), rho = leading zeros of the remaining
    ``48-b`` bits + 1 via ``length(bin(w))`` (both engines render bin()
    without leading zeros).  The harmonic sum Σ 2^-M_j is EXACT in
    double — every term is a dyadic rational ≥ 2^-43 and the total is
    < m, so all partial sums fit the 53-bit mantissa and the float sum
    is order-independent.  The only rounding-sensitive steps are the
    final one multiply + one divide (+ one ln in the small-range
    branch), identical single expressions on both engines, then
    rounded to 6dp per the house float discipline.

    Scale shape: one map-side-combined groupBy to (group, bucket)
    max-registers — sketch state is m longs per group however many
    rows feed it; no window, no shuffle beyond the grouped max.  The
    exact witness is one distinct-count, disabled at 100 TB."""
    m = 1 << b
    rho_max = 48 - b + 1
    h = hash48(F.col(value_col).cast("string"))
    keyed = df.select(group_col, h.alias("h")).select(
        group_col,
        (F.col("h") % m).alias("bucket"),
        F.expr(f"h div {m}").alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(rho_max)).otherwise(
        F.lit(rho_max) - F.length(F.expr("bin(w)"))
    )
    regs = keyed.select(group_col, "bucket", rho.alias("rho")).groupBy(
        group_col, "bucket"
    ).agg(F.max("rho").alias("reg"))
    alpha = _hll_alpha(m)
    per_group = regs.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("nonzero"),
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("sum_pow"),
    )
    zeros = (F.lit(m) - F.col("nonzero")).cast("long")
    raw = F.lit(alpha * m * m) / (
        F.col("sum_pow") + zeros.cast("double")
    )
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    out = per_group.select(
        group_col,
        F.round(est, 6).alias("est_hll"),
        zeros.alias("n_zero_buckets"),
    )
    if not include_exact:
        return out
    exact = (
        df.select(group_col, F.col(value_col).cast("string").alias("v"))
        .distinct()
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).cast("long").alias("exact_distinct"))
    )
    return out.join(exact, group_col)


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


def kmv_set_overlap(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    include_exact: bool = True,
) -> DataFrame:
    """(group_a, group_b, est_union, est_intersection, jaccard_micros
    [, exact_union, exact_intersection]) — set-operation estimates for
    every ORDERED pair of groups (group_a < group_b) from MERGED KMV
    sketches (Beyer et al., SIGMOD 2007): the union sketch is the k
    smallest of the two sketches' union, est_union the usual KMV
    estimate over it, and with rho = |both-members among the union
    sketch| the intersection estimate is ``rho * est_union div L`` and
    Jaccard ``10^6 * rho div L`` (L = union sketch size, < k when the
    union is small — then everything is exact).  All integer
    arithmetic over the shared 48-bit md5 — hash-exact cross-engine.

    The sketch-ALGEBRA story is the scale point: per-group state is k
    longs, and every pairwise overlap is computed from sketches alone
    — the raw data is touched once, never per pair.

    Scale shape: one map-side-combined distinct + one per-group window
    builds the sketches (group-partitioned); the pair stage fans each
    sketch row out to the other groups via a broadcast inequality join
    (G^2/2 pairs x k rows — group-count-sized, not data-sized; the
    nested-loop build side is the G-row group list); exact witnesses
    are one distinct self-join, disabled at 100 TB."""
    h = hash48(F.col(value_col).cast("string"))
    hashes = df.select(
        F.col(group_col).alias("g"), h.alias("h")
    ).distinct()
    w = Window.partitionBy("g").orderBy("h")
    sk = hashes.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    ).select("g", "h")
    groups = sk.select("g").distinct()
    # membership-tagged union rows per pair: each sketch row fans out
    # to every pair it belongs to, then (pair, h) rows merge the tags
    pair_rows = (
        sk.join(
            F.broadcast(groups.select(F.col("g").alias("g2"))),
            F.col("g") < F.col("g2"),
        )
        .select(
            F.col("g").alias("group_a"),
            F.col("g2").alias("group_b"),
            "h",
            F.lit(1).alias("in_a"),
            F.lit(0).alias("in_b"),
        )
        .unionByName(
            sk.join(
                F.broadcast(groups.select(F.col("g").alias("g2"))),
                F.col("g2") < F.col("g"),
            ).select(
                F.col("g2").alias("group_a"),
                F.col("g").alias("group_b"),
                "h",
                F.lit(0).alias("in_a"),
                F.lit(1).alias("in_b"),
            )
        )
        .groupBy("group_a", "group_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wp = Window.partitionBy("group_a", "group_b").orderBy("h")
    union_sk = pair_rows.withColumn(
        "rn", F.row_number().over(wp)
    ).where(F.col("rn") <= k)
    mult = (k - 1) * HASH_SPACE
    agg = union_sk.groupBy("group_a", "group_b").agg(
        F.count(F.lit(1)).alias("L"),
        F.max("h").alias("hk"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("rho"),
    ).withColumn(
        "est_union",
        F.when(F.col("L") < k, F.col("L"))
        .otherwise(F.expr(f"{mult} div hk"))
        .cast("long"),
    )
    out = agg.select(
        "group_a",
        "group_b",
        "est_union",
        F.expr("(rho * est_union) div L")
        .cast("long")
        .alias("est_intersection"),
        F.expr("(1000000 * rho) div L")
        .cast("long")
        .alias("jaccard_micros"),
    )
    if not include_exact:
        return out
    ex_i = (
        hashes.select(F.col("g").alias("group_a"), "h")
        .join(hashes.select(F.col("g").alias("group_b"), "h"), "h")
        .where(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_intersection"))
    )
    sizes = hashes.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    return (
        out.join(
            F.broadcast(
                sizes.select(
                    F.col("g").alias("group_a"), F.col("n").alias("na")
                )
            ),
            "group_a",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col("g").alias("group_b"), F.col("n").alias("nb")
                )
            ),
            "group_b",
        )
        .join(ex_i, ["group_a", "group_b"], "left")
        .select(
            "group_a",
            "group_b",
            "est_union",
            "est_intersection",
            "jaccard_micros",
            (
                F.col("na") + F.col("nb")
                - F.coalesce("exact_intersection", F.lit(0))
            )
            .cast("long")
            .alias("exact_union"),
            F.coalesce("exact_intersection", F.lit(0))
            .cast("long")
            .alias("exact_intersection"),
        )
    )


def hll_union_overlap(
    df: DataFrame,
    group_col: str,
    value_col: str,
    b: int = 6,
    include_exact: bool = True,
) -> DataFrame:
    """(group_a, group_b, est_a, est_b, est_union, est_intersection
    [, exact_union]) — HLL set algebra for every ordered group pair:
    the union sketch is the REGISTER-WISE MAX of the two groups'
    registers (the HLL mergeability property — lossless, unlike any
    intersection trick), the union estimate is the standard formula
    over the merged registers, and the intersection estimate is
    inclusion-exclusion est_a + est_b − est_union (can be noisy-low,
    clamped at 0 — stated).  Deterministic md5 registers as in
    hll_distinct_by, so every estimate is oracle-exact.

    Scale shape: registers build once per group (map-side-combined max
    over (group, bucket)); the pair stage joins REGISTER rows only
    (G·m longs — group-count-sized); exact witness disabled at
    100 TB."""
    m = 1 << b
    rho_max = 48 - b + 1
    h = hash48(F.col(value_col).cast("string"))
    keyed = df.select(
        F.col(group_col).alias("g"), h.alias("h")
    ).select(
        "g",
        (F.col("h") % m).alias("bucket"),
        F.expr(f"h div {m}").alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(rho_max)).otherwise(
        F.lit(rho_max) - F.length(F.expr("bin(w)"))
    )
    regs = (
        keyed.select("g", "bucket", rho.alias("rho"))
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("reg"))
    )

    def _estimate(reg_col: str, nz_col: str) -> F.Column:
        alpha = _hll_alpha(m)
        zeros = (F.lit(m) - F.col(nz_col)).cast("double")
        raw = F.lit(alpha * m * m) / (F.col(reg_col) + zeros)
        return F.when(
            (raw <= 2.5 * m) & (zeros > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
        ).otherwise(raw)

    def _per_group(r: DataFrame) -> DataFrame:
        return r.groupBy("g").agg(
            F.count(F.lit(1)).alias("nz"),
            F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("sp"),
        )

    est_g = _per_group(regs).select(
        "g", F.round(_estimate("sp", "nz"), 6).alias("est")
    )
    # fan each group's registers to its pairs, grouped max = merged
    # registers (a naive bucket full-outer would cross-join groups)
    gs = regs.select("g").distinct()
    fan = (
        regs.join(
            F.broadcast(gs.select(F.col("g").alias("g2"))),
            F.col("g") < F.col("g2"),
        )
        .select(
            F.col("g").alias("group_a"),
            F.col("g2").alias("group_b"),
            "bucket",
            "reg",
        )
        .unionByName(
            regs.join(
                F.broadcast(gs.select(F.col("g").alias("g2"))),
                F.col("g2") < F.col("g"),
            ).select(
                F.col("g2").alias("group_a"),
                F.col("g").alias("group_b"),
                "bucket",
                "reg",
            )
        )
        .groupBy("group_a", "group_b", "bucket")
        .agg(F.max("reg").alias("reg"))
    )
    est_u = fan.groupBy("group_a", "group_b").agg(
        F.count(F.lit(1)).alias("nz"),
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("sp"),
    ).select(
        "group_a",
        "group_b",
        F.round(_estimate("sp", "nz"), 6).alias("est_union"),
    )
    out = (
        est_u.join(
            F.broadcast(
                est_g.select(
                    F.col("g").alias("group_a"), F.col("est").alias("est_a")
                )
            ),
            "group_a",
        )
        .join(
            F.broadcast(
                est_g.select(
                    F.col("g").alias("group_b"), F.col("est").alias("est_b")
                )
            ),
            "group_b",
        )
        .select(
            "group_a",
            "group_b",
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.greatest(
                    F.col("est_a") + F.col("est_b") - F.col("est_union"),
                    F.lit(0.0),
                ),
                6,
            ).alias("est_intersection"),
        )
    )
    if not include_exact:
        return out
    hs = df.select(
        F.col(group_col).alias("g"), h.alias("h")
    ).distinct()
    exu = (
        hs.join(
            F.broadcast(gs.select(F.col("g").alias("g2"))),
            F.col("g") < F.col("g2"),
        )
        .select(F.col("g").alias("group_a"), F.col("g2").alias("group_b"), "h")
        .unionByName(
            hs.join(
                F.broadcast(gs.select(F.col("g").alias("g2"))),
                F.col("g2") < F.col("g"),
            ).select(
                F.col("g2").alias("group_a"),
                F.col("g").alias("group_b"),
                "h",
            )
        )
        .groupBy("group_a", "group_b")
        .agg(F.countDistinct("h").cast("long").alias("exact_union"))
    )
    return out.join(exu, ["group_a", "group_b"])


def ams_f2_error(
    events: DataFrame,
    key_col: str = "user_id",
    n_counters: int = 16,
    group_size: int = 4,
) -> DataFrame:
    """One row (n_keys, exact_f2, est_f2, err_micros) — the AMS
    second-frequency-moment sketch (Alon, Matias & Szegedy 1996,
    public literature) with its measured error against the exact
    F₂ = Σ f_k²: ``n_counters`` ±1-signed counters (sign = bit j of
    the key hash), estimate = median of ``group_size``-means of the
    squared counters — the O(1)-space self-join-size/skew estimator,
    and the estimator-error readout discipline of
    :func:`~graphlite_spark.operators.dedup.minhash_estimate_error`
    applied to it (is 16 counters enough for THIS distribution?).

    Exactness: counters are exact BIGINT signed sums; means truncate
    (div group_size); the median is the lower-median rank rule; the
    error is one truncating micros ratio.

    Scale shape: ONE map-side-combined groupBy builds all counters
    (key-level pre-aggregation first, then an n_counters-way
    fan-out over the key table); exact F₂ shares the key table."""
    per = events.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    h = hash48(F.concat(F.lit("ams:"), F.col("k").cast("string")))
    fan = per.select(
        "f", h.alias("h"),
        F.explode(
            F.sequence(F.lit(0), F.lit(int(n_counters) - 1))
        ).alias("j"),
    ).select(
        "j",
        (
            F.col("f")
            * (F.expr("(shiftright(h, cast(j as int)) % 2) * 2 - 1"))
        ).cast("long").alias("t"),
    )
    counters = fan.groupBy("j").agg(
        F.sum("t").cast("long").alias("c")
    )
    means = (
        counters.select(
            (F.col("j") / group_size).cast("int").alias("grp"),
            (F.col("c") * F.col("c")).cast("long").alias("c2"),
        )
        .groupBy("grp")
        .agg(
            F.expr(f"sum(c2) div {int(group_size)}").cast("long")
            .alias("m")
        )
    )
    n_groups = int(n_counters) // int(group_size)
    wm = Window.orderBy(F.col("m").asc(), F.col("grp").asc())
    est = (
        means.withColumn("rn", F.row_number().over(wm))
        .where(F.col("rn") == (n_groups + n_groups % 2) // 2)
        .select(F.col("m").alias("est_f2"))
    )
    exact = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(F.col("f") * F.col("f")).cast("long").alias("exact_f2"),
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "n_keys", "exact_f2", "est_f2",
        F.when(
            F.col("exact_f2") > 0,
            F.expr(
                "(1000000 * abs(est_f2 - exact_f2)) div exact_f2"
            ),
        ).cast("long").alias("err_micros"),
    )
