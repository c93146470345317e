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
