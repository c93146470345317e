"""Rehearsal of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry AND its ``oracle_sql()`` in DuckDB on
the same parquet (sf0.001 for speed; the driver uses sf0.01) and compare
row count, column names, and the order-insensitive value multiset."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

import os

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _norm(v):
    if v is None:
        return ("\x00null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("\x00nan",)
        return ("f", round(v, 9))
    if isinstance(v, int):
        return ("f", float(v)) if abs(v) < 2**52 else ("i", v)
    return ("s", str(v))


def compare(spark_df, duck_rel, name):
    a = spark_df.toPandas()
    b = duck_rel.df()
    assert sorted(a.columns) == sorted(b.columns), (
        f"{name}: columns {sorted(a.columns)} != {sorted(b.columns)}"
    )
    cols = sorted(a.columns)
    rows_a = sorted(tuple(_norm(v) for v in row) for row in a[cols].itertuples(index=False))
    rows_b = sorted(tuple(_norm(v) for v in row) for row in b[cols].itertuples(index=False))
    assert len(rows_a) == len(rows_b), f"{name}: {len(rows_a)} vs {len(rows_b)} rows"
    mismatches = [i for i, (x, y) in enumerate(zip(rows_a, rows_b)) if x != y]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows, first at {mismatches[0]}: "
        f"{rows_a[mismatches[0]]} vs {rows_b[mismatches[0]]}"
    )


ORACLES = entrymod.oracle_sql()
ALL = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, con, name):
    q = ALL[name]
    compare(q(spark, SF_DIR), con.sql(ORACLES[name]), name)


def test_rows_only_queries_run(spark):
    for name in sorted(set(ALL) - set(ORACLES)):
        df = ALL[name](spark, SF_DIR)
        assert df.count() >= 0 and len(df.schema) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
