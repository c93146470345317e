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


TURN_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def _turn(conv, idx, ts):
    from datetime import datetime

    return (conv, idx, "user", f"{conv}:{idx}", None, datetime.fromisoformat(ts))


def test_event_time_state_eviction(spark, tmp_path):
    """Event-time timeout EVICTS idle conversation state: after the
    watermark passes conv A's last event + gap, a later A turn starts a
    fresh frontier instead of pairing with the evicted one."""
    path = str(tmp_path / "turns")

    def write(rows):
        spark.createDataFrame(rows, TURN_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    write([_turn("A", 0, "2024-01-01 10:00:00"), _turn("A", 1, "2024-01-01 10:00:05")])
    stream = spark.readStream.schema(TURN_SCHEMA).parquet(path)
    q = (
        streaming_reply_edges(stream, event_time_gap="30 seconds",
                              watermark="10 seconds")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("evict_out")
        .start()
    )
    try:
        q.processAllAvailable()  # b1: edge (A,0,1); A timeout = 10:00:35
        write([_turn("B", 0, "2024-01-01 11:00:00")])
        q.processAllAvailable()  # b2: watermark -> 10:59:50 (past A timeout)
        write([_turn("C", 0, "2024-01-01 12:00:00")])
        q.processAllAvailable()  # b3: A's timer fires -> state removed
        write([_turn("A", 2, "2024-01-01 12:00:05")])
        q.processAllAvailable()  # b4: A re-initializes; must NOT pair 1->2
    finally:
        q.stop()
    got = {
        (r["conv_id"], r["src_turn"], r["dst_turn"])
        for r in spark.sql("SELECT * FROM evict_out").collect()
    }
    assert got == {("A", 0, 1)}, got

    # control: same files, no eviction -> one batch sees everything and the
    # frontier survives, so (A,1,2) IS paired
    stream2 = spark.readStream.schema(TURN_SCHEMA).parquet(path)
    q2 = (
        streaming_reply_edges(stream2)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("evict_ctl")
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    ctl = {
        (r["conv_id"], r["src_turn"], r["dst_turn"])
        for r in spark.sql("SELECT * FROM evict_ctl").collect()
    }
    assert ("A", 1, 2) in ctl, ctl


def test_streaming_snapshot_feeds_batch_cc(spark, tmp_path):
    """The lambda shape the module docstring promises, demonstrated
    end-to-end: turns stream in (two waves), the accumulated reply-edge
    table is snapshotted after each wave, and the batch Pregel engine
    recomputes connected components over the snapshot — components equal
    the conversation grouping (min dense id per conversation), i.e. the
    same answer a pure-batch run over the same turns gives."""
    from pyspark.sql import functions as F

    from graphlite_spark.algos.components import connected_components
    from graphlite_spark.plans.derive import derive_vertices
    from graphlite_spark.sources.transcripts import generate_transcripts

    t = generate_transcripts(spark, n_convs=10, max_turns=8, seed=7)
    path = str(tmp_path / "turns")
    t.where("turn_idx < 4").write.mode("append").parquet(path)
    schema = spark.read.parquet(path).schema
    q = (
        streaming_reply_edges(spark.readStream.schema(schema).parquet(path))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("snap_edges")
        .start()
    )

    def snapshot_cc(turns):
        # snapshot the accumulated streaming edge table and hand it to the
        # batch engine: (conv_id, turn) -> dense ids -> Pregel CC
        v = derive_vertices(turns)
        snap = spark.sql("SELECT * FROM snap_edges")
        s = v.select("conv_id", F.col("turn_idx").alias("src_turn"),
                     F.col("id").alias("src"))
        d = v.select("conv_id", F.col("turn_idx").alias("dst_turn"),
                     F.col("id").alias("dst"))
        e = (
            snap.join(s, ["conv_id", "src_turn"])
            .join(d, ["conv_id", "dst_turn"])
            .select("src", "dst", F.lit(1.0).alias("weight"))
        )
        res = connected_components(v.select("id"), e)
        comp = {r["id"]: r["value"] for r in res.state.collect()}
        meta = {r["id"]: r["conv_id"] for r in v.collect()}
        # truth: component = min dense id within the conversation (ids are
        # assigned in (conv_id, turn_idx) order, so that's the first turn)
        first = {}
        for vid, conv in meta.items():
            first[conv] = min(first.get(conv, vid), vid)
        return comp, {vid: first[conv] for vid, conv in meta.items()}

    try:
        q.processAllAvailable()
        comp1, want1 = snapshot_cc(t.where("turn_idx < 4"))
        assert comp1 == want1  # mid-stream recompute already correct
        t.where("turn_idx >= 4").write.mode("append").parquet(path)
        q.processAllAvailable()
    finally:
        q.stop()
    comp2, want2 = snapshot_cc(t)
    assert comp2 == want2  # final snapshot == pure-batch answer


def test_streaming_incremental_cc_maintenance(spark, tmp_path):
    """The true streaming-maintenance shape: the first wave is labeled
    once with the batch engine; when the second wave arrives, ONLY the
    newly streamed edges are folded in via incremental_components (the
    old edge set is never rescanned) — and the maintained labels equal a
    full batch recompute over everything streamed so far."""
    from pyspark.sql import functions as F

    from graphlite_spark.algos.components import (
        connected_components_fast,
        incremental_components,
    )
    from graphlite_spark.plans.derive import derive_vertices

    t = generate_transcripts(spark, n_convs=10, max_turns=8, seed=11)
    path = str(tmp_path / "turns_inc")
    t.where("turn_idx < 4").write.mode("append").parquet(path)
    schema = spark.read.parquet(path).schema
    q = (
        streaming_reply_edges(spark.readStream.schema(schema).parquet(path))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("inc_edges")
        .start()
    )

    def dense_edges(turns, snap):
        v = derive_vertices(turns)
        s = v.select("conv_id", F.col("turn_idx").alias("src_turn"),
                     F.col("id").alias("src"))
        d = v.select("conv_id", F.col("turn_idx").alias("dst_turn"),
                     F.col("id").alias("dst"))
        return v, (
            snap.join(s, ["conv_id", "src_turn"])
            .join(d, ["conv_id", "dst_turn"])
            .select("src", "dst", F.lit(1.0).alias("weight"))
        )

    try:
        q.processAllAvailable()
        snap1 = spark.sql("SELECT * FROM inc_edges")
        # rebuild the first snapshot as an independent frame so the later
        # exceptAll against a second read of the same view doesn't
        # self-reference the memory sink's attributes
        wave1 = spark.createDataFrame(snap1.collect(), snap1.schema)
        v1, e1 = dense_edges(t, wave1)
        prev = incremental_components(
            v1.select("id", F.col("id").alias("component")), e1
        )
        prev = spark.createDataFrame(prev.collect(), prev.schema)
        t.where("turn_idx >= 4").write.mode("append").parquet(path)
        q.processAllAvailable()
        # only the edges that arrived AFTER the first labeling
        new = spark.sql("SELECT * FROM inc_edges").exceptAll(wave1)
        _, e_new = dense_edges(t, new)
        got = {r["id"]: r["component"]
               for r in incremental_components(prev, e_new).collect()}
    finally:
        q.stop()
    v_all, e_all = dense_edges(t, spark.sql("SELECT * FROM inc_edges"))
    want = {r["id"]: r["component"]
            for r in connected_components_fast(v_all.select("id"), e_all).collect()}
    assert got == want


EVENT_SCHEMA = "user_id bigint, event_id bigint, ts timestamp"


def _ev(uid, eid, ts):
    from datetime import datetime

    return (uid, eid, datetime.fromisoformat(ts))


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """Every session the streaming operator emits equals its batch
    counterpart; sessions emit exactly when the watermark proves them
    closed, and the still-open tail session is withheld."""
    from graphlite_spark.operators.sessions import sessionize
    from graphlite_spark.streaming import streaming_sessionize

    path = str(tmp_path / "events")

    def write(rows):
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    # u1: two sessions (09:00-09:10, then 10:00); u2: one session
    write([
        _ev(1, 1, "2024-01-01 09:00:00"),
        _ev(1, 2, "2024-01-01 09:05:00"),
        _ev(1, 3, "2024-01-01 09:10:00"),
        _ev(2, 4, "2024-01-01 09:02:00"),
    ])
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(path)
    q = (
        streaming_sessionize(stream, gap_minutes=30, watermark="10 seconds")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # second batch: u1 starts session 2; sentinel u99 far in the
        # future drives the watermark past everyone's end + gap
        write([
            _ev(1, 5, "2024-01-01 10:00:00"),
            _ev(99, 6, "2024-01-01 23:00:00"),
        ])
        q.processAllAvailable()
        write([_ev(99, 7, "2024-01-01 23:30:00")])  # timers fire this batch
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["user_id"], r["session_seq"], r["n_events"], r["start_us"],
         r["end_us"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    batch = spark.createDataFrame(
        [
            _ev(1, 1, "2024-01-01 09:00:00"),
            _ev(1, 2, "2024-01-01 09:05:00"),
            _ev(1, 3, "2024-01-01 09:10:00"),
            _ev(2, 4, "2024-01-01 09:02:00"),
            _ev(1, 5, "2024-01-01 10:00:00"),
        ],
        EVENT_SCHEMA,
    )
    want = {
        (r["user_id"], r["session_seq"], r["n_events"], r["start_us"],
         r["end_us"])
        for r in sessionize(batch, gap_minutes=30).collect()
    }
    # u99's own session never closes (nothing outlasts it by gap+watermark)
    assert got == want, (sorted(got), sorted(want))


def test_streaming_dedup_documents(spark, tmp_path):
    """First arrival of each distinct text passes, later exact copies are
    dropped across micro-batches; distinct texts all survive."""
    from graphlite_spark.streaming.ingest import streaming_dedup_documents

    schema = "doc_id long, text string, ts timestamp"
    path = str(tmp_path / "docs")

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    from datetime import datetime

    def d(i, text, s):
        return (i, text, datetime(2024, 1, 1, 9, 0, s))

    write([d(1, "alpha beta", 0), d(2, "gamma", 1), d(3, "alpha beta", 2)])
    stream = spark.readStream.schema(schema).parquet(path)
    q = (
        streaming_dedup_documents(stream, watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # later micro-batch: one repeat (dropped) + one new doc (kept)
        write([d(4, "gamma", 3), d(5, "delta", 4)])
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT doc_id, text FROM dedup_out ORDER BY doc_id"
        ).collect()
    finally:
        q.stop()
    kept_texts = sorted(r["text"] for r in rows)
    assert kept_texts == ["alpha beta", "delta", "gamma"]
    # the kept copy of each text is its first arrival
    assert {r["text"]: r["doc_id"] for r in rows} == {
        "alpha beta": 1, "gamma": 2, "delta": 5,
    }


def test_streaming_click_attribution_matches_batch(spark, tmp_path):
    """Stream-stream interval join == the batch join on the same rows,
    incl. the horizon boundary (exactly-30-min click attributes; 31-min
    click does not) and multi-touch (two in-horizon clicks, two rows)."""
    from datetime import datetime as DT

    from graphlite_spark.streaming import streaming_click_attribution

    EV = "event_id long, ts timestamp, user_id long, event_type string"

    def ev(eid, ts, uid, et):
        return (eid, DT.fromisoformat(ts), uid, et)

    rows = [
        # user 1: click 10:00 and 10:20, purchase 10:30 -> both attribute
        ev(1, "2024-01-01 10:00:00", 1, "click"),
        ev(2, "2024-01-01 10:20:00", 1, "click"),
        ev(3, "2024-01-01 10:30:00", 1, "purchase"),
        # user 2: click exactly horizon before purchase -> attributes
        ev(4, "2024-01-01 09:00:00", 2, "click"),
        ev(5, "2024-01-01 09:30:00", 2, "purchase"),
        # user 3: click 31 min before -> outside horizon
        ev(6, "2024-01-01 08:00:00", 3, "click"),
        ev(7, "2024-01-01 08:31:00", 3, "purchase"),
        # user 4: click AFTER purchase -> no attribution
        ev(8, "2024-01-01 12:10:00", 4, "click"),
        ev(9, "2024-01-01 12:00:00", 4, "purchase"),
        # cross-user within horizon -> must not join
        ev(10, "2024-01-01 10:29:00", 5, "click"),
    ]
    batch = spark.createDataFrame(rows, EV)
    path = str(tmp_path / "events")
    batch.write.mode("overwrite").parquet(path)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    out = streaming_click_attribution(
        stream.where("event_type = 'click'"),
        stream.where("event_type = 'purchase'"),
        horizon="30 minutes",
    )
    _run_to_memory(out, "attr_out", "append")
    got = {
        (r["user_id"], r["click_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM attr_out").collect()
    }
    assert got == {(1, 1, 3), (1, 2, 3), (2, 4, 5)}


def test_streaming_enrich_matches_batch(spark, tmp_path):
    """Stream-static left enrichment equals the batch join, keeps
    unmatched rows (NULL attributes), and holds no streaming state
    (no stateful operator in the progress metrics)."""
    import pyspark.sql.functions as F

    from graphlite_spark.streaming.ingest import streaming_enrich_events

    ev = spark.createDataFrame(
        [(i, i % 5, f"e{i}") for i in range(40)],
        "event_id long, user_id long, kind string",
    )
    path = str(tmp_path / "ev")
    ev.write.mode("overwrite").parquet(path)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    dim = spark.createDataFrame(
        [(0, "gold"), (1, "silver"), (2, "gold")],  # users 3,4 unmatched
        "user_id long, tier string",
    )
    q = (
        streaming_enrich_events(stream, dim)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("enriched")
        .start()
    )
    q.processAllAvailable()
    progress = q.lastProgress
    q.stop()
    got = {(r["event_id"], r["tier"])
           for r in spark.sql("SELECT event_id, tier FROM enriched").collect()}
    want = {(r["event_id"], r["tier"])
            for r in ev.join(F.broadcast(dim), "user_id", "left")
            .select("event_id", "tier").collect()}
    assert got == want
    assert any(t is None for _, t in got)  # unmatched kept
    assert not progress["stateOperators"]  # stream-static: zero state


def test_streaming_session_stats_matches_batch(spark, tmp_path):
    """The NATIVE session_window aggregation emits exactly the closed
    sessions the same batch session_window expression produces."""
    from pyspark.sql import functions as F

    from graphlite_spark.streaming import streaming_session_stats

    path = str(tmp_path / "events_native")

    def write(rows):
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    write([
        _ev(1, 1, "2024-01-01 09:00:00"),
        _ev(1, 2, "2024-01-01 09:05:00"),
        _ev(2, 3, "2024-01-01 09:02:00"),
    ])
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(path)
    q = (
        streaming_session_stats(stream, gap_minutes=30,
                                watermark="10 seconds")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("native_sess")
        .start()
    )
    try:
        q.processAllAvailable()
        # u1 session 2 + a far-future sentinel to push the watermark
        write([
            _ev(1, 4, "2024-01-01 11:00:00"),
            _ev(99, 5, "2024-01-01 23:00:00"),
        ])
        q.processAllAvailable()
        write([_ev(99, 6, "2024-01-01 23:30:00")])
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"])
        for r in spark.sql("SELECT * FROM native_sess").collect()
    }
    batch = spark.createDataFrame(
        [
            _ev(1, 1, "2024-01-01 09:00:00"),
            _ev(1, 2, "2024-01-01 09:05:00"),
            _ev(2, 3, "2024-01-01 09:02:00"),
            _ev(1, 4, "2024-01-01 11:00:00"),
        ],
        EVENT_SCHEMA,
    )
    want = {
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"])
        for r in (
            batch.groupBy(
                "user_id",
                F.session_window(F.col("ts"), "30 minutes").alias("w"),
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
            .select(
                "user_id",
                F.unix_micros(F.col("w.start")).alias("start_us"),
                F.unix_micros(F.col("w.end")).alias("end_us"),
                "n_events",
            )
            .collect()
        )
    }
    # u99's own session never closes (the watermark never outruns it)
    assert got == want, (sorted(got), sorted(want))
    # native semantics: end = last event + gap
    assert all(e - s >= 30 * 60 * 1_000_000 for _, s, e, _ in got)
