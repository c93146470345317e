"""Structured-Streaming ingestion of transcript turns.

The reference has no streaming surface (BSP supersteps are synchronous
batch rounds — SURVEY.md §2.2); this module covers the ingestion half a
production deployment needs: transcript turns arriving continuously are
turned into reply edges and per-window activity metrics *incrementally*,
and the Pregel engine periodically recomputes over the accumulated edge
table (batch-on-snapshot — the standard lambda shape for iterative graph
algorithms, which are not expressible as incremental streaming operators).

* :func:`streaming_reply_edges` — stateful pairing of consecutive turns per
  conversation via ``applyInPandasWithState``: state = the last seen
  (turn_idx, ts) per conv_id, emitting a (conv_id, src_turn, dst_turn) edge
  per arriving successor.  Event-time timeout evicts idle conversations.
* :func:`streaming_edge_counts` — watermarked tumbling-window counts per
  role (late data dropped after the watermark), the streaming analogue of
  the per-superstep metrics table.

Both run against any streaming source with the transcript schema; tests
drive them with a file source + ``processAllAvailable()``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EDGE_SCHEMA = "conv_id string, src_turn int, dst_turn int"
STATE_SCHEMA = "max_turn int"


def _make_pair_turns(idle_timeout_ms: int | None):
    def pair_turns(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Emit (i -> i+1) reply edges as turns of a conversation arrive.

        State keeps the highest turn index seen; arriving turns are sorted
        per batch, paired internally, and joined to the stored frontier.
        Turns arrive in order per conversation (ts-ordered source); an
        out-of-order turn at/below the frontier is ignored (late policy).
        """
        (conv_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        max_turn = state.get[0] if state.exists else None
        rows = []
        for pdf in pdfs:
            for turn in sorted(int(x) for x in pdf["turn_idx"]):
                if max_turn is None:
                    max_turn = turn
                    continue
                if turn <= max_turn:
                    continue  # duplicate / late
                rows.append((conv_id, max_turn, turn))
                max_turn = turn
        if max_turn is not None:
            state.update((int(max_turn),))
            if idle_timeout_ms:
                state.setTimeoutDuration(idle_timeout_ms)
        if rows:
            yield pd.DataFrame(rows, columns=["conv_id", "src_turn", "dst_turn"])

    return pair_turns


def streaming_reply_edges(
    turns: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Streaming DF of reply edges from a streaming transcript source.

    ``idle_timeout_ms`` evicts conversations idle that long (bounds state
    size on unbounded streams).  It is None by default because processing-
    time timeouts make the engine schedule wake-up batches forever, which
    prevents ``processAllAvailable()`` from settling in finite-input tests.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return (
        turns.groupBy("conv_id")
        .applyInPandasWithState(
            _make_pair_turns(idle_timeout_ms),
            outputStructType=EDGE_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def streaming_edge_counts(
    turns: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-window turn counts per role (late data beyond
    the watermark dropped) — streaming metrics over the ingest."""
    return (
        turns.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "role")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(F.col("w.start").alias("window_start"), "role", "n_turns")
    )
