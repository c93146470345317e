"""Per-superstep metrics persistence.

Mirrors the counters the reference ships to the master each superstep
(GraphLite-0.20/engine/WM.curss_finish.proto:10-19: compute count,
sent_msg, recv_msg, act_vertex) plus wall time and the merged aggregator
globals.  Schema per FIXTURES.md §4 ``metrics``.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from graphlite_spark.operators.pregel import SuperstepMetrics

METRICS_SCHEMA = (
    "run_id string, superstep int, active long, sent long, wall_ms double, "
    "aggregates string"
)


def metrics_df(
    spark: SparkSession, metrics: list[SuperstepMetrics], run_id: str
) -> DataFrame:
    rows = [
        (run_id, m.superstep, m.active, m.sent, m.wall_ms, json.dumps(m.aggregates))
        for m in metrics
    ]
    return spark.createDataFrame(rows, METRICS_SCHEMA)


def write_metrics(
    spark: SparkSession,
    metrics: list[SuperstepMetrics],
    path: str,
    run_id: str,
) -> None:
    metrics_df(spark, metrics, run_id).write.mode("append").parquet(path)


def edges_per_second(metrics: list[SuperstepMetrics]) -> float:
    """The north metric: Σ messages generated along edges / total wall time."""
    total_sent = sum(m.sent for m in metrics)
    total_s = sum(m.wall_ms for m in metrics) / 1000.0
    return total_sent / total_s if total_s > 0 else 0.0
