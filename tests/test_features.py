"""SGC feature smoothing vs pure-Python brute force."""

from __future__ import annotations

from graphlite_spark.algos.features import smooth_features


def _brute(feats, sym, hops):
    # feats: {(id, feature): val}; sym: list of (src, dst), symmetric
    nbrs: dict[int, list[int]] = {}
    for s, d in sym:
        nbrs.setdefault(s, []).append(d)
    f = dict(feats)
    for _ in range(hops):
        nxt: dict[tuple[int, str], int] = {}
        for (i, t), v in f.items():
            nxt[(i, t)] = nxt.get((i, t), 0) + v
            for d in nbrs.get(i, []):
                nxt[(d, t)] = nxt.get((d, t), 0) + v
        f = {
            (i, t): s // (len(nbrs.get(i, [])) + 1)
            for (i, t), s in nxt.items()
        }
    return f


def test_smooth_features_bruteforce(spark):
    # path 0-1-2 plus isolate 3; two feature channels
    und = [(0, 1), (1, 2)]
    sym = und + [(d, s) for s, d in und]
    feats = {
        (0, "a"): 3_000_000,
        (1, "a"): 1_000_000,
        (2, "b"): 2_000_000,
        (3, "a"): 5_000_000,
    }
    fdf = spark.createDataFrame(
        [(i, t, v) for (i, t), v in feats.items()],
        "id long, feature string, val_micros long",
    )
    edf = spark.createDataFrame(sym, "src long, dst long")
    for hops in (1, 2):
        got = {
            (r["id"], r["feature"]): r["val_micros"]
            for r in smooth_features(fdf, edf, hops=hops).collect()
        }
        assert got == _brute(feats, sym, hops), hops
    got2 = {
        (r["id"], r["feature"]): r["val_micros"]
        for r in smooth_features(fdf, edf, hops=2).collect()
    }
    # the isolate keeps its feature verbatim at every hop
    assert got2[(3, "a")] == 5_000_000
    # channel b diffused from vertex 2 through 1 into 0 after 2 hops
    assert got2[(0, "b")] > 0
    # sparsity: no row materializes where the 2-hop mass is zero
    assert (3, "b") not in got2
