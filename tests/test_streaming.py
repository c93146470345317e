"""Structured-Streaming ingestion tests: file-source transcript turns
drive the stateful reply-edge pairing and windowed counts to completion
via processAllAvailable()."""

from __future__ import annotations

import pytest

from graphlite_spark.sources.transcripts import generate_transcripts
from graphlite_spark.streaming import streaming_edge_counts, streaming_reply_edges


@pytest.fixture()
def turn_stream(spark, tmp_path):
    t = generate_transcripts(spark, n_convs=12, max_turns=10, seed=42)
    path = str(tmp_path / "turns")
    t.write.mode("overwrite").parquet(path)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    return t, stream


def _run_to_memory(stream_df, name, mode):
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_streaming_reply_edges_match_batch(spark, turn_stream):
    t, stream = turn_stream
    _run_to_memory(streaming_reply_edges(stream), "edges_out", "append")
    got = {
        (r["conv_id"], r["src_turn"], r["dst_turn"])
        for r in spark.sql("SELECT * FROM edges_out").collect()
    }
    # batch truth: consecutive turn pairs per conversation
    rows = sorted(
        (r["conv_id"], r["turn_idx"]) for r in t.select("conv_id", "turn_idx").collect()
    )
    want = set()
    for (c1, i1), (c2, i2) in zip(rows, rows[1:]):
        if c1 == c2:
            want.add((c1, i1, i2))
    assert got == want


def test_streaming_windowed_counts_match_batch(spark, turn_stream):
    t, stream = turn_stream
    # complete mode: append would (correctly) hold back the final window,
    # since nothing ever advances the watermark past it on a finite input
    _run_to_memory(streaming_edge_counts(stream, "5 minutes"), "wc_out", "complete")
    got = {
        (r["window_start"], r["role"]): r["n_turns"]
        for r in spark.sql("SELECT * FROM wc_out").collect()
    }
    from pyspark.sql import functions as F

    want = {
        (r["w"]["start"], r["role"]): r["n"]
        for r in t.groupBy(F.window("ts", "5 minutes").alias("w"), "role")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
