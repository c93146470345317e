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

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EDGE_SCHEMA = "conv_id string, src_turn int, dst_turn int"
# (frontier turn, max event-time ms seen) — the latter keeps the
# event-time timeout MONOTONE: a late-arriving duplicate must never
# re-register an earlier eviction than the frontier already earned
STATE_SCHEMA = "max_turn int, last_ts_ms long"


def _make_pair_turns(idle_timeout_ms: int | None, event_time_gap_ms: int | None):
    def pair_turns(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Emit (i -> i+1) reply edges as turns of a conversation arrive.

        State keeps the highest turn index seen (the frontier).  The
        pairing is vectorized per Arrow batch: sorted-unique turn indices
        above the frontier, frontier prepended, then a shift — consecutive
        pairs ARE the reply edges.  Python touches arrays, never rows.
        Out-of-order turns at/below the frontier are dropped (late policy).
        """
        (conv_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        max_turn = last_ts_ms = None
        if state.exists:
            max_turn, last_ts_ms = state.get
        chunks = []
        for pdf in pdfs:
            chunks.append(pdf)
        if chunks:
            batch = pd.concat(chunks, ignore_index=True)
            turns = np.unique(batch["turn_idx"].to_numpy(dtype="int64"))
            if max_turn is not None:
                turns = turns[turns > max_turn]
                turns = np.concatenate(([max_turn], turns))
            if event_time_gap_ms and "ts" not in batch.columns:
                # Silent-degradation guard (round-4 advisor): without ts,
                # last_ts_ms would stay 0 and the timeout would register at
                # max(gap, wm+1) — near-immediate eviction once the global
                # watermark is ahead.  A schema mismatch must be loud.
                raise ValueError(
                    "streaming_reply_edges: event_time_gap is configured "
                    "but the batch schema has no 'ts' column — the "
                    "event-time eviction contract cannot be honoured "
                    "(conversations would be evicted almost immediately). "
                    "Select/rename a timestamp column to 'ts' or use "
                    "idle_timeout_ms instead."
                )
            if event_time_gap_ms and "ts" in batch.columns:
                # monotone max over the life of the conversation — a batch
                # of only-late rows cannot pull the timeout earlier
                batch_ms = int(batch["ts"].max().value // 1_000_000)
                last_ts_ms = max(batch_ms, last_ts_ms or 0)
            if len(turns) >= 2:
                yield pd.DataFrame(
                    {
                        "conv_id": conv_id,
                        "src_turn": turns[:-1].astype("int32"),
                        "dst_turn": turns[1:].astype("int32"),
                    }
                )
            max_turn = int(turns[-1]) if len(turns) else max_turn
        if max_turn is not None:
            state.update((int(max_turn), int(last_ts_ms or 0)))
            if event_time_gap_ms and last_ts_ms is not None:
                # evict once the watermark passes the conversation's last
                # event time + gap: bounded state on unbounded streams.
                # Clamp above the current watermark — a conversation whose
                # events lag the global watermark may otherwise request a
                # timeout in the past, which the state store rejects.
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(
                    max(last_ts_ms + event_time_gap_ms, wm + 1)
                )
            elif idle_timeout_ms:
                state.setTimeoutDuration(idle_timeout_ms)

    return pair_turns


def streaming_reply_edges(
    turns: DataFrame,
    idle_timeout_ms: int | None = None,
    event_time_gap: str | None = None,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming DF of reply edges from a streaming transcript source.

    State-eviction knobs (both bound state size on unbounded streams):

    * ``event_time_gap`` (e.g. ``"30 seconds"``) — PREFERRED: watermark the
      stream on ``ts`` and evict a conversation once the watermark passes
      its last event time + gap.  Deterministic w.r.t. the data, and
      finite-input tests settle (`processAllAvailable` completes once the
      watermark stops advancing).
    * ``idle_timeout_ms`` — processing-time idle eviction.  None by default
      because processing-time timeouts make the engine schedule wake-up
      batches forever, which prevents ``processAllAvailable()`` from
      settling in finite-input tests.
    """
    if event_time_gap is not None and idle_timeout_ms is not None:
        # one timeout mode per query: mixing them would make the kernel
        # call setTimeoutDuration under EventTimeTimeout (batch failure)
        raise ValueError("pass either idle_timeout_ms or event_time_gap, not both")
    gap_ms = None
    if event_time_gap is not None:
        m = re.fullmatch(
            r"\s*(\d+)\s+(millisecond|second|minute|hour)s?\s*", event_time_gap
        )
        if m is None:
            raise ValueError(
                f"event_time_gap {event_time_gap!r}: expected "
                "'<integer> millisecond[s]|second[s]|minute[s]|hour[s]', "
                "e.g. '30 seconds'"
            )
        unit = {"millisecond": 1, "second": 1000, "minute": 60_000,
                "hour": 3_600_000}[m.group(2)]
        gap_ms = int(m.group(1)) * unit
        turns = turns.withWatermark("ts", watermark)
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = (
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms
            else GroupStateTimeout.NoTimeout
        )
    return (
        turns.groupBy("conv_id")
        .applyInPandasWithState(
            _make_pair_turns(idle_timeout_ms, gap_ms),
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


# ---------------------------------------------------------------------------
# streaming sessionization — the incremental analogue of
# operators/sessions.sessionize (same gap rule, same output columns)
# ---------------------------------------------------------------------------

SESSION_SCHEMA = (
    "user_id bigint, session_seq bigint, n_events bigint, "
    "start_us bigint, end_us bigint"
)
SESSION_STATE_SCHEMA = (
    "session_seq bigint, start_us bigint, end_us bigint, n_events bigint"
)


def _make_sessionizer(gap_us: int, gap_ms: int):
    def kern(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Fold arriving event times into gap-separated sessions.

        State = the one OPEN session (seq, start, end, count).  A batch's
        event times are sorted and split where the gap exceeds the
        threshold (vectorized diff — Python loops only over the handful
        of resulting chunks); chunks merge into the open session when
        within the gap, otherwise the open session is emitted CLOSED and
        a new one opens.  The open session emits on event-time timeout —
        once the watermark passes its end + gap nothing can extend it, so
        the emission is final (exactly the batch operator's session).
        Late rows that would land inside or before the open session
        extend/clamp it (count kept; start may move back) — in-order
        streams never hit that path.
        """
        (user_id,) = key

        def row(seq, st, en, n):
            return pd.DataFrame(
                {
                    "user_id": [int(user_id)],
                    "session_seq": [int(seq)],
                    "n_events": [int(n)],
                    "start_us": [int(st)],
                    "end_us": [int(en)],
                }
            )

        if state.hasTimedOut:
            if state.exists:
                seq, st, en, n = state.get
                yield row(seq, st, en, n)
            state.remove()
            return
        parts = []
        for pdf in pdfs:
            parts.append(
                pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            )
        ts = np.sort(np.concatenate(parts)) if parts else np.empty(0, "int64")
        if len(ts) == 0:
            return
        if state.exists:
            seq, st, en, n = state.get
        else:
            seq, st, en, n = 0, None, None, 0
        splits = np.flatnonzero(np.diff(ts) > gap_us)
        starts = np.concatenate(([0], splits + 1))
        ends = np.concatenate((splits, [len(ts) - 1]))
        for s_i, e_i in zip(starts, ends):
            c_st, c_en, c_n = int(ts[s_i]), int(ts[e_i]), int(e_i - s_i + 1)
            if st is not None and c_st - en <= gap_us:
                st, en, n = min(st, c_st), max(en, c_en), n + c_n
            else:
                if st is not None:
                    yield row(seq, st, en, n)
                seq, st, en, n = seq + 1, c_st, c_en, c_n
        state.update((int(seq), int(st), int(en), int(n)))
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(en // 1000 + gap_ms, wm + 1))

    return kern


def streaming_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming (user_id, session_seq, n_events, start_us, end_us) —
    sessions emit as soon as the event-time watermark proves them closed
    (end + gap behind the watermark).  Same gap rule and columns as the
    batch ``sessionize``; the integration test snapshots both and checks
    every emitted session equals its batch counterpart.  State per user =
    one open session (4 longs) — bounded regardless of stream length."""
    gap_us = gap_minutes * 60 * 1_000_000
    gap_ms = gap_minutes * 60 * 1_000
    return (
        events.select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionizer(gap_us, gap_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_dedup_documents(
    docs: DataFrame,
    watermark: str = "10 seconds",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Streaming exact-dedup of an unbounded document stream: the first
    arrival of each md5(text) fingerprint passes, later copies are
    dropped — the in-stream counterpart of operators/dedup.exact_dedup
    for an ingest pipeline that must not re-admit yesterday's crawl.

    Built on ``dropDuplicatesWithinWatermark`` (Spark 3.5+), which is the
    operator that actually implements the documented contract: state holds
    one (fingerprint) key per distinct doc inside the watermark horizon
    and is EVICTED once the event-time watermark passes the key's event
    time — bounded state on an unbounded stream, the same eviction
    contract as the reply-edge pairer above.  (Plain watermarked
    ``dropDuplicates`` on a non-event-time subset never evicts: Spark only
    drops dedup state when the event-time column is part of the subset,
    so the fingerprint store would grow without bound — the round-4
    advisor flagged exactly this.)  Exactly-once semantics within the
    horizon; duplicates farther apart than the watermark are the stated
    residual (batch dedup downstream catches them — the standard two-tier
    design)."""
    fp = docs.withColumn(
        "fingerprint", F.md5(F.col(text_col).cast("string"))
    ).withWatermark(ts_col, watermark)
    return fp.dropDuplicatesWithinWatermark(["fingerprint"])


def streaming_click_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """STREAM-STREAM event-time interval join: every purchase paired
    with the SAME user's clicks at most ``horizon`` before it — the
    attribution query (batch sibling: operators/temporal.py's funnel),
    and the one Structured Streaming join shape with bounded state.

    Both inputs carry watermarks and the join condition bounds
    ``click_ts`` to ``[purchase_ts − horizon, purchase_ts]``, which is
    exactly what lets Spark EVICT buffered rows: a click older than
    (watermark + horizon) can never match a future purchase and is
    dropped from the state store; same for purchases past the
    watermark.  Without the time-range conjunct the state grows without
    bound — the dropDuplicates lesson (streaming_dedup_documents) in
    join form.

    Output: (user_id, click_id, purchase_id, click_ts, purchase_ts),
    append-mode safe.  ALL in-horizon clicks attribute (multi-touch);
    a last-touch policy is a batch groupBy over the sink, kept out of
    the stream so the streaming state stays row-bounded."""
    c = (
        clicks.select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").cast("timestamp").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    p = (
        purchases.select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").cast("timestamp").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return p.join(
        c,
        F.expr(
            "c_user = p_user AND click_ts <= purchase_ts "
            f"AND click_ts >= purchase_ts - INTERVAL {horizon}"
        ),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
    )


def streaming_enrich_events(
    events: DataFrame,
    dimension: DataFrame,
    key: str = "user_id",
) -> DataFrame:
    """STREAM-STATIC enrichment join — the remaining join shape in the
    streaming taxonomy (next to the stream-stream interval join and
    the stateful pairings): each micro-batch of the event stream hash-
    joins a STATIC dimension table (user attributes, allow/deny lists,
    experiment assignments).

    State story: a stream-static join keeps NO streaming join state at
    all — the static side is just re-planned per micro-batch (and
    broadcast when small), so there is nothing to watermark and
    nothing to evict; left join keeps unmatched events flowing with
    NULL attributes rather than silently dropping them (admission
    decisions belong to a filter, not a join).

    At 100 TB the dimension side should be a bucketed/broadcastable
    table; the stream side is never shuffled by this join when the
    dimension broadcasts."""
    dim = F.broadcast(dimension)
    return events.join(dim, key, "left")


def streaming_session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming (user_id, start_us, end_us, n_events) via Spark's
    NATIVE ``session_window`` aggregation — the built-in state-store
    sibling of :func:`streaming_sessionize` (which demonstrates the
    custom ``applyInPandasWithState`` path).  Two differences, stated:
    the native operator's session END is last-event-time + gap (Spark's
    session_window semantics; the custom path reports the last event
    itself), and output is the aggregate row only (no per-user session
    sequence number — that ordering needs custom state).  Sessions emit
    once the watermark passes their end; state is managed by the engine
    (merging session windows in the state store), bounded per open
    session.

    Use this form at 100 TB unless the per-session output needs custom
    shaping: the engine's session merge is JVM-side, incremental, and
    spill-aware — no Python in the loop."""
    gap = f"{gap_minutes} minutes"
    return (
        events.select(
            "user_id", F.col("ts").cast("timestamp").alias("ts")
        )
        .withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("start_us"),
            F.unix_micros(F.col("w.end")).alias("end_us"),
            "n_events",
        )
    )
