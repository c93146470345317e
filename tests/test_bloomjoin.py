"""Bloom semi-join pruning: bitmap correctness (no false negatives),
python replay of the md5 positions, and the stats contract."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from graphlite_spark.operators.bloomjoin import (
    bloom_candidates,
    bloom_semi_join_stats,
    build_bloom_words,
)


def _pos(val, i, num_bits, salt="bloom"):
    h = hashlib.md5(f"{salt}:{i}:{val}".encode()).hexdigest()[:12]
    return int(h, 16) % num_bits


def test_bitmap_matches_python_replay(spark):
    keys = spark.createDataFrame([(k,) for k in range(0, 50, 3)], "k long")
    words = build_bloom_words(keys, "k", num_hashes=2, num_bits=128)
    expect = [0] * 2
    for k in range(0, 50, 3):
        for i in range(2):
            p = _pos(k, i, 128)
            expect[p // 64] |= 1 << (p % 64)
    assert words == expect


def test_no_false_negatives_and_stats(spark):
    probe = spark.createDataFrame(
        [(k, "a" if k % 2 == 0 else "b") for k in range(200)], "k long, g string"
    )
    build = spark.createDataFrame([(k,) for k in range(0, 200, 5)], "k long")
    words = build_bloom_words(build, "k", num_hashes=2, num_bits=128)
    cand = {r["k"] for r in bloom_candidates(probe, "k", words, 2).collect()}
    truth = set(range(0, 200, 5))
    assert truth <= cand, "bloom filter dropped a true match"

    stats = {
        r["g"]: r
        for r in bloom_semi_join_stats(
            probe, "k", build, "k", "g", num_hashes=2, num_bits=128
        ).collect()
    }
    assert set(stats) == {"a", "b"}
    for g, r in stats.items():
        assert r["total"] == 100
        assert r["false_positives"] == r["bloom_candidates"] - r["exact_matches"]
        assert r["bloom_candidates"] >= r["exact_matches"]
    # exact matches: multiples of 5, split by parity
    assert stats["a"]["exact_matches"] == sum(
        1 for k in range(200) if k % 5 == 0 and k % 2 == 0
    )
    assert stats["b"]["exact_matches"] == sum(
        1 for k in range(200) if k % 5 == 0 and k % 2 == 1
    )
    # candidate set equals the python-replay bitmap admission
    admitted = {
        k
        for k in range(200)
        if all(
            (words[_pos(k, i, 128) // 64] >> (_pos(k, i, 128) % 64)) & 1
            for i in range(2)
        )
    }
    assert cand == admitted


def test_empty_build_side(spark):
    probe = spark.createDataFrame([(1, "a")], "k long, g string")
    build = probe.where(F.lit(False)).select("k")
    words = build_bloom_words(build, "k", num_hashes=2, num_bits=128)
    assert words == [0, 0]
    assert bloom_candidates(probe, "k", words, 2).count() == 0
