"""Harness-table loading + derived-graph cache.

``/root/testdata/sf*/`` holds the driver's parquet tables (TESTDATA.md).
The engine's graph is derived from ``events`` via the transcript adapter
(FIXTURES.md §5); deriving it is a global sort + two window passes, so the
result is cached per (session, sf_dir) — every graph query in
``__spark_entry__.queries()`` reuses one derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from graphlite_spark.plans.derive import derive_edges, derive_vertices
from graphlite_spark.sources.transcripts import transcripts_from_events

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

_GRAPH_CACHE: dict[tuple[str, str], tuple[DataFrame, DataFrame, DataFrame]] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def graph_tables(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(transcripts, vertices, edges) for sf_dir, cached per session.

    Keyed by ``applicationId`` (unique per SparkContext), not ``id(spark)``:
    a stopped-and-recreated session can reuse the same Python object
    address, which would hand back DataFrames bound to a dead context."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _GRAPH_CACHE:
        # evict graphs of other (stopped) applications — their DataFrames
        # are bound to dead contexts and can never be served again
        for stale in [k for k in _GRAPH_CACHE if k[0] != key[0]]:
            del _GRAPH_CACHE[stale]
        t = transcripts_from_events(load_table(spark, sf_dir, "events"))
        v = derive_vertices(t).persist()
        e = derive_edges(t, v).persist()
        v.count(), e.count()  # materialize once
        _GRAPH_CACHE[key] = (t, v, e)
    return _GRAPH_CACHE[key]
