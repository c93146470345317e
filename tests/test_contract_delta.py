"""Quotient-graph contraction and snapshot delta vs hand answers."""

from __future__ import annotations

from graphlite_spark.algos.community import contract_graph
from graphlite_spark.operators.temporal import snapshot_delta


def test_contract_graph_hand(spark):
    # communities: {0,1} -> A(=10), {2,3} -> B(=20)
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 2), (1, 3), (2, 3), (3, 0)],
        "src long, dst long",
    )
    labels = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 20), (3, 20)], "id long, label long"
    )
    got = {
        (r["c_src"], r["c_dst"]): r["n_edges"]
        for r in contract_graph(edges, labels).collect()
    }
    assert got == {(10, 10): 2, (10, 20): 2, (20, 20): 1, (20, 10): 1}


def test_snapshot_delta_hand(spark):
    # span 0..100 -> mid 50.  src 1: (1,2) both halves (kept, bursty in
    # the old half), (1,3) old only (removed), (1,4) new only (added).
    # src 2: nothing old, (2,3) new (added).
    rows = [
        (1, 2, 0),
        (1, 2, 10),
        (1, 2, 60),
        (1, 3, 20),
        (1, 4, 70),
        (2, 3, 100),
    ]
    df = spark.createDataFrame(rows, "src long, dst long, t long")
    got = {
        r["id"]: (
            r["n_kept"],
            r["n_added"],
            r["n_removed"],
            r["deg_old"],
            r["deg_new"],
        )
        for r in snapshot_delta(df).collect()
    }
    assert got == {1: (1, 1, 1, 2, 2), 2: (0, 1, 0, 0, 1)}


def test_snapshot_delta_midpoint_integer(spark):
    # odd span: (1 + 4) div 2 = 2 -> t=1 old, t in {2,3,4} new
    df = spark.createDataFrame(
        [(7, 8, 1), (7, 9, 2), (7, 8, 4)], "src long, dst long, t long"
    )
    got = snapshot_delta(df).collect()
    r = {x["id"]: x for x in got}[7]
    assert (r["n_kept"], r["n_added"], r["n_removed"]) == (1, 1, 0)
