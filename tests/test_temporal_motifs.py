"""Temporal motifs: pure-python brute force over a hand-built contact
sequence, pinning the window boundaries (t2 = t1+delta counts, t2 = t1
does not) and the w != u wedge rule."""

from __future__ import annotations

from graphlite_spark.operators.temporal import temporal_motifs

D = 10  # delta


def _brute(edges):
    p2 = [
        (e1, e2)
        for e1 in edges
        for e2 in edges
        if e1[1] == e2[0]
        and e1[2] < e2[2] <= e1[2] + D
        and e2[1] != e1[0]
    ]
    c3 = [
        (e1, e2, e3)
        for (e1, e2) in p2
        for e3 in edges
        if e3[0] == e2[1] and e3[1] == e1[0]
        and e2[2] < e3[2] <= e1[2] + D
    ]
    return len(p2), len(c3)


def test_temporal_motifs_bruteforce(spark):
    edges = [
        # a cycle 1->2->3->1 inside the window
        (1, 2, 100), (2, 3, 105), (3, 1, 109),
        # boundary: t2 exactly t1 + D counts, t1 + D + 1 does not
        (4, 5, 200), (5, 6, 210), (5, 7, 211),
        # tie excluded (strict order)
        (8, 9, 300), (9, 10, 300),
        # w == u excluded (back-and-forth is not a 2-path)
        (11, 12, 400), (12, 11, 405),
        # multi-edge instances each count
        (13, 14, 500), (14, 15, 502), (14, 15, 503),
        # cycle closure must land AFTER t2: this one closes too early
        (16, 17, 600), (17, 18, 604), (18, 16, 603),
    ]
    want_p2, want_c3 = _brute(edges)
    assert want_p2 >= 6 and want_c3 == 1  # fixture sanity

    df = spark.createDataFrame(edges, "src long, dst long, t long")
    got = {
        r["motif"]: r["n"] for r in temporal_motifs(df, delta=D).collect()
    }
    assert got == {"path2": want_p2, "cycle3": want_c3}
