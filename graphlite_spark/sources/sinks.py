"""Result sinks.

The reference dumps per-worker text files of user-formatted ``vid: value``
lines (engine/OutputFormatter.cc:34-73, example/PageRankVertex.cc:106-119
— format string ``"%lld: %f\\n"``).  Spark-native results are parquet (or
Iceberg on clusters); the text mode exists for golden-file parity with the
reference's output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_result_parquet(state: DataFrame, path: str) -> None:
    state.select("id", "value").write.mode("overwrite").parquet(path)


def result_text_lines(state: DataFrame) -> DataFrame:
    """One 'vid: value' line per vertex, the reference's %lld: %f format
    (6 fixed decimals, C printf %f semantics)."""
    return state.select(
        F.format_string("%d: %f", F.col("id"), F.col("value").cast("double")).alias(
            "value"
        )
    )


def write_result_text(state: DataFrame, path: str, partitions: int | None = None) -> None:
    """Per-partition text files, like the reference's per-worker files
    ('<out>_<worker_id>', engine/Worker.cc:166-177)."""
    lines = result_text_lines(state.orderBy("id"))
    if partitions:
        lines = lines.repartitionByRange(partitions, F.col("value"))
    lines.write.mode("overwrite").text(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a BUCKETED (+ optionally sorted) managed table —
    the co-located-join layout for repeatedly-joined big tables.

    The 100 TB story this exists for: the edge table is joined on ``src``
    by every graph job; written bucketed by src, any equi-join between
    two tables bucketed the same way on the same key runs with NO
    exchange on either side (Catalyst proves the partitioning from the
    bucket spec), and with ``sort_col`` the sort inside SortMergeJoin is
    free too.  One shuffle at WRITE time buys it back on every read —
    the Spark-native equivalent of the reference's static offline
    hash-partitioner (bin/hash-partitioner.pl).  Verified by
    test_bucketed_sink.py: the bucketed self-join plan contains zero
    Exchange operators."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, bucket_col
    )
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)
