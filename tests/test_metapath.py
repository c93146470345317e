"""Metapath-constrained walks vs Python brute force (same hash picks)."""

from __future__ import annotations

import hashlib


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def test_metapath_walks_bruteforce(spark):
    from graphlite_spark.algos.walks import metapath_walks

    # bipartite-ish typed graph: users 0-2, assistants 10-12, tool 20.
    # Edges (undirected after symmetrize) include a tool vertex that the
    # metapath must never visit.
    arcs = [
        (0, 10), (0, 11), (1, 10), (1, 12), (2, 11),
        (10, 20), (11, 20),          # tool links — forbidden targets
        (10, 1),                     # duplicate direction (dedup check)
    ]
    vtype = {0: "user", 1: "user", 2: "user",
             10: "assistant", 11: "assistant", 12: "assistant",
             20: "tool"}
    v = spark.createDataFrame([(i,) for i in vtype], "id long")
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in arcs], "src long, dst long, weight double"
    )
    ty = spark.createDataFrame(list(vtype.items()), "id long, vtype string")
    got = sorted(
        (r["walk_id"], r["step"], r["vertex"])
        for r in metapath_walks(
            v, e, ty, ["user", "assistant"], walk_length=4,
            walks_per_vertex=1,
        ).collect()
    )

    # brute force
    und: dict[int, set[int]] = {}
    for a, b in arcs:
        if a != b:
            und.setdefault(a, set()).add(b)
            und.setdefault(b, set()).add(a)
    path = ["user", "assistant"]
    rows = []
    for start, t0 in vtype.items():
        if t0 != "user":
            continue
        wid, cur = start, start
        rows.append((wid, 0, cur))
        for t in range(1, 5):
            tt = path[t % 2]
            cands = sorted(x for x in und.get(cur, ()) if vtype[x] == tt)
            if not cands:
                break
            cur = cands[_h48(f"{wid}:{t}") % len(cands)]
            rows.append((wid, t, cur))
    assert got == sorted(rows)
    # no tool vertex is ever visited
    assert all(vtype[vx] != "tool" for _, _, vx in got)
    # every odd step is an assistant, every even step a user
    assert all(
        vtype[vx] == ("assistant" if s % 2 else "user")
        for _, s, vx in got
    )
