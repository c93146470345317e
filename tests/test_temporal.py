"""As-of join and range join vs hand-computed expectations, with the
edge cases that matter: equal timestamps, ties among right rows, no
preceding right row, and pairs exactly at the bucket/gap boundary."""

from __future__ import annotations

from graphlite_spark.operators.temporal import asof_join, range_join


def test_asof_join_edge_cases(spark):
    left = spark.createDataFrame(
        [(1, 100, 10), (2, 100, 50), (3, 100, 200), (4, 200, 5)],
        "event_id long, user_id long, ts_us long",
    )
    right = spark.createDataFrame(
        # user 100: rows at ts 10 (tie: ids 7 and 8), 60; user 300 only
        [(7, 100, 10, 1.0), (8, 100, 10, 2.0), (9, 100, 60, 3.0),
         (11, 300, 1, 9.0)],
        "event_id long, user_id long, ts_us long, value double",
    )
    out = {r["event_id"]: (r["r_event_id"], r["r_ts_us"], r["r_value"])
           for r in asof_join(
               left, right, on="user_id", ts_col="ts_us",
               left_cols=["event_id"], right_cols=["event_id", "value"],
               tie_col="event_id",
           ).collect()}
    # equal ts counts (<=); tie at ts=10 resolves to the larger event_id
    assert out[1] == (8, 10, 2.0)
    # latest at-or-before 50 is still ts=10
    assert out[2] == (8, 10, 2.0)
    # ts=200 sees the ts=60 row
    assert out[3] == (9, 60, 3.0)
    # user 200 has no right rows at all -> NULLs, row preserved
    assert out[4] == (None, None, None)


def test_range_join_bruteforce(spark):
    rows_l = [(i, i % 3, 1000 * i) for i in range(30)]
    rows_r = [(100 + i, i % 3, 1000 * i + 137 * i) for i in range(30)]
    left = spark.createDataFrame(rows_l, "event_id long, user_id long, ts_us long")
    right = spark.createDataFrame(rows_r, "event_id long, user_id long, ts_us long")
    gap = 2500
    got = {(r["event_id"], r["r_event_id"]): r["gap"]
           for r in range_join(
               left, right, on="user_id", ts_col="ts_us", max_gap=gap,
               left_cols=["event_id"], right_cols=["event_id"],
           ).collect()}
    want = {}
    for le, lu, lt in rows_l:
        for re_, ru, rt in rows_r:
            if lu == ru and abs(lt - rt) <= gap:
                want[(le, re_)] = rt - lt
    assert got == want
    # (boundary inclusivity is pinned by test_range_join_exact_boundary)


def test_range_join_exact_boundary(spark):
    left = spark.createDataFrame([(1, 5, 1000)],
                                 "event_id long, user_id long, ts_us long")
    right = spark.createDataFrame(
        [(2, 5, 1500), (3, 5, 1501), (4, 5, 500), (5, 5, 499)],
        "event_id long, user_id long, ts_us long",
    )
    got = {r["r_event_id"] for r in range_join(
        left, right, on="user_id", ts_col="ts_us", max_gap=500,
        left_cols=["event_id"], right_cols=["event_id"],
    ).collect()}
    # inclusive at exactly max_gap on both sides; exclusive one past it
    assert got == {2, 4}


def test_asof_join_rejects_empty_payload(spark):
    import pytest

    left = spark.createDataFrame([(1, 5, 100)],
                                 "event_id long, user_id long, ts_us long")
    right = spark.createDataFrame([(5, 90)], "user_id long, ts_us long")
    with pytest.raises(ValueError, match="payload column"):
        from graphlite_spark.operators.temporal import asof_join

        asof_join(left, right, on="user_id", ts_col="ts_us")


def test_contact_edges_chains_and_drops_self(spark):
    from graphlite_spark.operators.temporal import contact_edges

    ev = spark.createDataFrame(
        [
            # one stream 'a': users 1,1,2,3 -> edges 1->2@30, 2->3@40
            (10, 1, "a", 10), (11, 1, "a", 20), (12, 2, "a", 30),
            (13, 3, "a", 40),
            # stream 'b': tie on ts broken by event_id: 5 then 6
            (20, 5, "b", 100), (21, 6, "b", 100),
        ],
        "event_id long, user_id long, event_type string, ts_us long",
    )
    got = sorted(
        (r["src"], r["dst"], r["t"]) for r in contact_edges(ev).collect()
    )
    assert got == [(1, 2, 30), (2, 3, 40), (5, 6, 100)]


def test_temporal_reachability_respects_time(spark):
    """The defining case: 1->2@t=50 then 2->3@t=10 is structurally a
    path 1..3 but runs BACKWARDS in time — plain BFS reaches 3, temporal
    reachability must not.  4 is reached via a forward chain."""
    from graphlite_spark.operators.temporal import temporal_reachability

    edges = spark.createDataFrame(
        [(1, 2, 50), (2, 3, 10), (2, 4, 60), (9, 1, 5)],
        "src long, dst long, t long",
    )
    actors = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 9)], "user_id long"
    )
    got = {
        r["user_id"]: r["arr_us"]
        for r in temporal_reachability(
            edges, actors, source=1, source_ts=0, rounds=5
        ).collect()
    }
    assert got == {1: 0, 2: 50, 4: 60}  # 3 unreachable, 9 never seeded


def test_temporal_reachability_waits_for_arrival(spark):
    """An edge whose contact time precedes the arrival at its source
    cannot forward even though the source IS eventually reached."""
    from graphlite_spark.operators.temporal import temporal_reachability

    # source 1 reaches 2 only at t=100; the 2->3 contact at t=90 is too
    # early, but a later 2->3 contact at t=120 delivers
    edges = spark.createDataFrame(
        [(1, 2, 100), (2, 3, 90), (2, 3, 120)],
        "src long, dst long, t long",
    )
    actors = spark.createDataFrame([(1,), (2,), (3,)], "user_id long")
    got = {
        r["user_id"]: r["arr_us"]
        for r in temporal_reachability(
            edges, actors, source=1, source_ts=0, rounds=4
        ).collect()
    }
    assert got == {1: 0, 2: 100, 3: 120}


def test_triadic_closure_rate_bruteforce(spark):
    from graphlite_spark.operators.temporal import triadic_closure_rate

    # window 0..9 -> midpoint 4.  Old graph (t<4): 1-2, 2-3, 1-4.
    # New-only pairs (t>=4): 1-3 (closes the 1-2-3 wedge), 4-5 (vertex 5
    # unseen before -> cannot close).  Pair 1-2 recurs late -> kept, not
    # added.
    rows = [
        (1, 2, 0), (2, 3, 1), (1, 4, 3),
        (1, 3, 5), (4, 5, 7), (1, 2, 9),
    ]
    e = spark.createDataFrame(rows, "src long, dst long, t long")
    got = triadic_closure_rate(e).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n_added"], r["n_closing"], r["closure_micros"]) == (
        2, 1, 500_000,
    )

    # no new edges at all -> 0/0 guard
    e2 = spark.createDataFrame([(1, 2, 0), (2, 3, 1)], "src long, dst long, t long")
    # midpoint (0+1)//2 = 0 -> everything is new, nothing old
    r2 = triadic_closure_rate(e2).collect()[0]
    assert r2["n_closing"] == 0


def test_intercontact_histogram_bruteforce(spark):
    from collections import Counter

    from graphlite_spark.operators.temporal import intercontact_histogram

    # pair 1-2 meets at 0, 1, 5 (gaps 1, 4); pair 3-4 at 10, 10
    # (gap 0 -> bucket 1); pair 5-6 meets once (no gap); self-loop
    # dropped; direction folds (2,1) into (1,2)
    rows = [
        (1, 2, 0), (2, 1, 1), (1, 2, 5),
        (3, 4, 10), (3, 4, 10),
        (5, 6, 3), (7, 7, 0),
    ]
    e = spark.createDataFrame(rows, "src long, dst long, t long")
    got = {r["bucket"]: (r["n_gaps"], r["n_pairs"])
           for r in intercontact_histogram(e).collect()}
    gaps = {(1, 2): [1, 4], (3, 4): [0]}
    want: dict[int, list] = {}
    for pair, gs in gaps.items():
        for g in gs:
            want.setdefault(len(bin(g)) - 2 if g else 1, []).append(pair)
    expect = {b: (len(ps), len(set(ps))) for b, ps in want.items()}
    assert got == expect, (got, expect)
