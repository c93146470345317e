"""Bloom-filter semi-join pruning — the 100 TB join-reduction pattern.

Joining a 100 TB fact table against a small key set should not shuffle
the fact table: build a Bloom filter over the build side's keys,
broadcast it as a *literal bitmap* (an array of longs bound into the
filter expression — no UDF, no join, whole-stage codegen), and keep only
probe rows whose k hash positions are all set.  Survivors are a superset
of the true matches (false positives only); the exact equi-join then runs
on the pruned remainder.  Spark ships a runtime version of this
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) whose hash is not
reproducible in DuckDB; this operator uses the engine-portable
``hash48`` (md5) positions so the candidate set — and therefore the
measured false-positive count — is deterministic and oracle-exact.

Build-side cost: one distinct + one map-side-combined ``bit_or`` groupBy
into at most ``num_bits/64`` word rows, collected to the driver (bounded
by the bitmap size, never by the build side's row count).  Probe-side
cost: a pure filter — pushdown-eligible, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphlite_spark.functions.hashes import hash48


def _pos(col: Column, i: int, num_bits: int, salt: str) -> Column:
    return hash48(
        F.concat(F.lit(f"{salt}:{i}:"), col.cast("string"))
    ) % num_bits


def build_bloom_words(
    keys: DataFrame,
    key_col: str,
    num_hashes: int = 2,
    num_bits: int = 256,
    salt: str = "bloom",
) -> list[int]:
    """The filter as ``num_bits/64`` longs (word w holds bits
    [64w, 64w+63]).  One distinct + one bit_or groupBy; the collect is
    bounded by the bitmap size."""
    if num_bits % 64 != 0:
        raise ValueError("num_bits must be a multiple of 64")
    k = keys.select(F.col(key_col).alias("k")).distinct()
    # all num_hashes positions in ONE pass over the distinct keys (an
    # exploded array of the k position expressions), preserving the
    # documented one-distinct + one-groupBy build cost
    pos = k.select(
        F.explode(
            F.array(*[_pos(F.col("k"), i, num_bits, salt)
                      for i in range(num_hashes)])
        ).alias("pos")
    )
    words = (
        pos.distinct()
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "b"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("word"))
        .collect()
    )
    out = [0] * (num_bits // 64)
    for r in words:
        out[r["w"]] = r["word"]
    return out


def bloom_candidates(
    probe: DataFrame,
    key_col: str,
    words: list[int],
    num_hashes: int = 2,
    salt: str = "bloom",
) -> DataFrame:
    """Probe rows whose every hash position is set — a pure filter over a
    literal bitmap, no shuffle, no UDF."""
    num_bits = len(words) * 64
    arr = F.array(*[F.lit(int(w)) for w in words])
    out = probe
    conds = []
    for i in range(num_hashes):
        pcol, wcol = f"_bloom_p{i}", f"_bloom_w{i}"
        out = out.withColumn(
            pcol, _pos(F.col(key_col), i, num_bits, salt)
        ).withColumn(wcol, F.element_at(arr, (F.col(pcol) / 64).cast("int") + 1))
        conds.append(
            F.expr(f"(shiftright({wcol}, CAST({pcol} % 64 AS INT)) & 1) = 1")
        )
    keep = conds[0]
    for c in conds[1:]:
        keep = keep & c
    return out.where(keep).drop(
        *[f"_bloom_p{i}" for i in range(num_hashes)],
        *[f"_bloom_w{i}" for i in range(num_hashes)],
    )


def bloom_semi_join_stats(
    probe: DataFrame,
    probe_key: str,
    build: DataFrame,
    build_key: str,
    group_col: str,
    num_hashes: int = 2,
    num_bits: int = 256,
    salt: str = "bloom",
) -> DataFrame:
    """(group, total, bloom_candidates, exact_matches, false_positives) —
    the pruning quality report: how many probe rows the broadcast bitmap
    admits vs the true semi-join, per group.  All counts exact integers,
    so the oracle comparison is hash-exact; this is the number a pipeline
    reads before sizing ``num_bits`` for a 100 TB probe side."""
    words = build_bloom_words(build, build_key, num_hashes, num_bits, salt)
    keys = build.select(F.col(build_key).alias(probe_key)).distinct()
    cand = bloom_candidates(probe, probe_key, words, num_hashes, salt).select(
        group_col, probe_key
    )
    exact = probe.join(keys, probe_key, "left_semi").select(group_col)
    totals = probe.groupBy(group_col).agg(F.count(F.lit(1)).alias("total"))
    c = cand.groupBy(group_col).agg(F.count(F.lit(1)).alias("bloom_candidates"))
    ex = exact.groupBy(group_col).agg(F.count(F.lit(1)).alias("exact_matches"))
    return (
        totals.join(c, group_col, "left")
        .join(ex, group_col, "left")
        .select(
            group_col,
            F.col("total").cast("long").alias("total"),
            F.coalesce("bloom_candidates", F.lit(0))
            .cast("long")
            .alias("bloom_candidates"),
            F.coalesce("exact_matches", F.lit(0)).cast("long").alias("exact_matches"),
            (F.coalesce("bloom_candidates", F.lit(0)) - F.coalesce("exact_matches", F.lit(0)))
            .cast("long")
            .alias("false_positives"),
        )
    )
