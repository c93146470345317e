"""Wave-6 operators (4-cliques, widest path, EWMA, IPF raking) vs
python brute force on hand-built inputs."""

from __future__ import annotations

import datetime
import itertools

from pyspark.sql import functions as F

BASE = datetime.datetime(2024, 1, 1)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def test_four_cliques_bruteforce(spark):
    """K4 count vs itertools over the undirected closure — includes a
    5-clique (5 K4s), a chordless 4-cycle (0), and a dangling edge."""
    from graphlite_spark.algos.triangles import four_clique_count

    k5 = list(itertools.combinations(range(5), 2))
    c4 = [(10, 11), (11, 12), (12, 13), (13, 10)]  # chordless square
    extra = [(0, 20), (20, 21)]
    pairs = k5 + c4 + extra
    got = four_clique_count(_edges(spark, pairs)).collect()[0]["cliques4"]

    und = set()
    verts = set()
    for a, b in pairs:
        und.add((min(a, b), max(a, b)))
        verts |= {a, b}
    want = sum(
        1
        for quad in itertools.combinations(sorted(verts), 4)
        if all(
            (min(x, y), max(x, y)) in und
            for x, y in itertools.combinations(quad, 2)
        )
    )
    assert want == 5  # C(5,4) from the 5-clique only
    assert got == want

    # both orientations agree
    got_id = four_clique_count(_edges(spark, pairs), orient="id").collect()[
        0
    ]["cliques4"]
    assert got_id == want


def test_widest_path_bruteforce(spark):
    """Max-min semiring vs python relaxation on a weighted digraph where
    the widest route differs from the shortest route."""
    from graphlite_spark.algos.sssp import INF, widest_path

    # 0->1 (cap 1) ->3 direct, vs 0->2 (cap 5) ->3 (cap 4): widest to 3
    # is 4 via the longer route
    wedges = [
        (0, 1, 1.0), (1, 3, 9.0),
        (0, 2, 5.0), (2, 3, 4.0),
        (3, 4, 2.0), (5, 0, 7.0),  # 5 unreached from 0; feeds 0
    ]
    v = spark.createDataFrame([(i,) for i in range(6)], "id long")
    e = spark.createDataFrame(wedges, "src long, dst long, weight double")
    res = widest_path(v, e, source=0, fixed_supersteps=7)
    got = {
        r["id"]: r["value"] for r in res.state.select("id", "value").collect()
    }

    width = {i: 0.0 for i in range(6)}
    width[0] = INF
    for _ in range(7):
        nxt = dict(width)
        for s, d, w in wedges:
            if width[s] > 0:
                nxt[d] = max(nxt[d], min(width[s], w))
        width = nxt
    assert got == width
    assert got[3] == 4.0 and got[4] == 2.0 and got[5] == 0.0


def test_ewma_daily_bruteforce(spark):
    """EWMA fold vs python: zero-filled gap day, truncating quarters,
    first-day NULL residual."""
    from graphlite_spark.operators.analytics import ewma_daily

    counts = {0: 5, 1: 2, 3: 7}  # day 2 missing -> 0
    rows = []
    eid = 0
    for d, c in counts.items():
        for j in range(c):
            rows.append(
                (eid, BASE + datetime.timedelta(days=d, minutes=j), 1,
                 "view", 1.0)
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    )
    out = sorted(
        (r["d"], r["y"], r["ewma_micros"], r["resid_micros"])
        for r in ewma_daily(df).collect()
    )

    xs = [counts.get(d, 0) for d in range(4)]
    s = 1_000_000 * xs[0]
    want = [(out[0][0], xs[0], s, None)]
    d0 = out[0][0]
    for t in range(1, 4):
        r = 1_000_000 * xs[t] - s
        s = (1 * 1_000_000 * xs[t] + 3 * s) // 4
        want.append((d0 + t, xs[t], s, r))
    assert out == want


def test_ipf_raking_bruteforce(spark):
    """Raking vs python: after 4 rounds the weighted language margins
    approach uniform while source margins hold."""
    from graphlite_spark.operators.packing import ipf_raking

    rows = []
    did = 0
    cells = {("en", "web"): 6, ("en", "code"): 2,
             ("fr", "web"): 1, ("fr", "code"): 3}
    for (lang, src), c in cells.items():
        for _ in range(c):
            rows.append((did, "t", lang, src, 1))
            did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    got = {
        (r["lang"], r["source"]): (r["n_docs"], r["weight_micros"])
        for r in ipf_raking(df, iterations=4).collect()
    }

    total = sum(cells.values())
    langs = sorted({k[0] for k in cells})
    t_row = total // len(langs)
    t_col = {}
    for (lang, src), c in cells.items():
        t_col[src] = t_col.get(src, 0) + c
    w = {k: 1_000_000 for k in cells}
    for _ in range(4):
        for axis, target in ((0, None), (1, t_col)):
            ms = {}
            for k, c in cells.items():
                ms[k[axis]] = ms.get(k[axis], 0) + c * w[k]
            for k in w:
                t = t_row if axis == 0 else target[k[1]]
                if ms[k[axis]] > 0:
                    w[k] = (w[k] * t * 1_000_000) // ms[k[axis]]
    want = {k: (cells[k], w[k]) for k in cells}
    assert got == want
    # the raked language margins are near-uniform (within truncation)
    for lang in langs:
        m = sum(cells[k] * w[k] for k in cells if k[0] == lang)
        assert abs(m - t_row * 1_000_000) <= total * 1_000_000 // 100


def test_label_spreading_bruteforce(spark):
    """Harmonic spreading vs python on a path graph: seeds pinned,
    truncating neighbor averages, isolated non-seed stays zero."""
    from graphlite_spark.algos.community import label_spreading

    # path 0-1-2-3-4, isolated 5 (non-seed), isolated 6 (seed)
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4)]
    v = spark.createDataFrame([(i,) for i in range(7)], "id long")
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs],
        "src long, dst long, weight double",
    )
    roles = {0: "user", 1: "assistant", 2: "user", 3: "tool",
             4: "user", 5: "assistant", 6: "tool"}
    labels = spark.createDataFrame(
        list(roles.items()), "id long, label string"
    )
    got = {
        r["id"]: (r["seed"], r["p_user_micros"],
                  r["p_assistant_micros"], r["p_tool_micros"])
        for r in label_spreading(
            v, e, labels, ("user", "assistant", "tool"),
            seed_mod=3, iterations=6,
        ).collect()
    }

    und = {}
    for a, b in pairs:
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
    classes = ("user", "assistant", "tool")
    p = {}
    for i in range(7):
        if i % 3 == 0:
            p[i] = tuple(
                1_000_000 if roles[i] == c else 0 for c in classes
            )
        else:
            p[i] = (0, 0, 0)
    for _ in range(6):
        nxt = {}
        for i in range(7):
            if i % 3 == 0:
                nxt[i] = p[i]
            elif i in und:
                dg = len(und[i])
                nxt[i] = tuple(
                    sum(p[j][k] for j in und[i]) // dg for k in range(3)
                )
            else:
                nxt[i] = (0, 0, 0)
        p = nxt
    want = {i: (1 if i % 3 == 0 else 0, *p[i]) for i in range(7)}
    assert got == want
    assert got[5] == (0, 0, 0, 0)          # isolated non-seed
    assert got[6] == (1, 0, 0, 1_000_000)  # isolated seed pinned


def test_deanon_uniqueness_bruteforce(spark):
    """Signature classes vs python: a symmetric pair shares a class, a
    hub is unique; numeric (not lexicographic) degree-list sort."""
    from graphlite_spark.algos.stats import deanon_uniqueness

    # star 0-(1..11) plus edge 1-2: leaves 3..11 share a signature,
    # 1 and 2 share one, hub 0 unique (degree 11 sorted after 2 only
    # under NUMERIC sort of its neighbor list)
    pairs = [(0, i) for i in range(1, 12)] + [(1, 2)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["class_size"]: (r["n_classes"], r["n_vertices"])
        for r in deanon_uniqueness(e).collect()
    }

    und = {}
    for a, b in pairs:
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
    sig = {}
    for v, nbrs in und.items():
        s = (len(nbrs), tuple(sorted(len(und[n]) for n in nbrs)))
        sig.setdefault(s, []).append(v)
    want = {}
    for members in sig.values():
        k = len(members)
        n_classes, n_vertices = want.get(k, (0, 0))
        want[k] = (n_classes + 1, n_vertices + k)
    assert got == want
    assert got[9] == (1, 9) and got[2] == (1, 2) and got[1] == (1, 1)


def test_dow_seasonality_bruteforce(spark):
    """Weekday means vs python over a 10-day spine with an empty day."""
    from graphlite_spark.operators.analytics import dow_seasonality

    counts = {0: 4, 1: 1, 2: 2, 4: 6, 7: 3, 9: 5}  # days 3,5,6,8 empty
    rows = []
    eid = 0
    for d, c in counts.items():
        for j in range(c):
            rows.append(
                (eid, BASE + datetime.timedelta(days=d, minutes=j),
                 1, "view", 1.0)
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    )
    got = {
        r["dow"]: (r["n_days"], r["sum_events"],
                   r["mean_daily_micros"], r["dev_micros"])
        for r in dow_seasonality(df).collect()
    }

    d0 = (BASE - datetime.datetime(1970, 1, 1)).days
    xs = {d0 + d: counts.get(d, 0) for d in range(10)}
    nd, sy = len(xs), sum(xs.values())
    overall = (1_000_000 * sy) // nd
    want = {}
    for d, y in xs.items():
        dow = (d + 3) % 7
        n, s = want.get(dow, (0, 0))
        want[dow] = (n + 1, s + y)
    want = {
        k: (n, s, (1_000_000 * s) // n, (1_000_000 * s) // n - overall)
        for k, (n, s) in want.items()
    }
    assert got == want
    # BASE is a Monday: epoch-day formula must agree with the calendar
    assert BASE.weekday() == (d0 + 3) % 7


def test_event_trigrams_bruteforce(spark):
    """Top-k trigram paths vs python, deterministic tie order."""
    from graphlite_spark.operators.temporal import event_trigrams

    seqs = {
        1: ["view", "click", "purchase", "view", "click", "purchase"],
        2: ["view", "click", "purchase"],
        3: ["signup", "view", "click"],
    }
    rows = []
    eid = 0
    for u, seq in seqs.items():
        for j, t in enumerate(seq):
            rows.append(
                (eid, BASE + datetime.timedelta(minutes=j), u, t, 1.0)
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    )
    got = [
        (r["a"], r["b"], r["c"], r["n"])
        for r in event_trigrams(df, k=3).collect()
    ]

    cnt: dict[tuple, int] = {}
    for seq in seqs.values():
        for i in range(len(seq) - 2):
            t = tuple(seq[i:i + 3])
            cnt[t] = cnt.get(t, 0) + 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert got == [(a, b, c, n) for (a, b, c), n in want]
    assert got[0] == ("view", "click", "purchase", 3)


def test_props_json_stats_bruteforce(spark):
    """JSON field profile vs python, incl. missing-field and NULL
    payload accounting."""
    from graphlite_spark.operators.profiling import props_json_stats

    rows = [
        (0, BASE, 1, "view", 1.0, '{"k": 5}'),
        (1, BASE, 1, "view", 1.0, '{"k": -2}'),
        (2, BASE, 2, "view", 1.0, '{"other": 9}'),   # no k
        (3, BASE, 2, "click", 1.0, None),             # null payload
        (4, BASE, 3, "click", 1.0, '{"k": 100}'),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {
        r["event_type"]: (
            r["n"], r["n_with_field"], r["min_f"], r["max_f"], r["sum_f"]
        )
        for r in props_json_stats(df).collect()
    }
    assert got == {
        "view": (3, 2, -2, 5, 3),
        "click": (2, 1, 100, 100, 100),
    }


def test_cohort_ltv_bruteforce(spark):
    """LTV triangle vs python: cohorts, per-event cents, cumulative."""
    from graphlite_spark.operators.analytics import cohort_ltv

    # u1 joins w0, spends w0 and w2; u2 joins w0, spends w1;
    # u3 joins w1, spends w1
    rows = [
        (0, 0, 1, "purchase", 10.00),
        (1, 24 * 14, 1, "purchase", 2.50),
        (2, 5, 2, "view", 1.00),
        (3, 24 * 7, 2, "purchase", 4.00),
        (4, 24 * 7 + 1, 3, "purchase", 8.00),
    ]
    df = _events_w(spark, rows)
    got = {
        (r["cohort_week"], r["week_offset"]): (
            r["n_users"], r["sum_cents"], r["cum_cents"]
        )
        for r in cohort_ltv(df).collect()
    }
    w0 = next(k[0] for k in got if k[1] == 0 and got[k][0] == 2)
    assert got[(w0, 0)] == (2, 1100, 1100)     # u1 1000 + u2 100
    assert got[(w0, 1)] == (1, 400, 1500)      # u2 purchase
    assert got[(w0, 2)] == (1, 250, 1750)      # u1 late purchase
    assert got[(w0 + 1, 0)] == (1, 800, 800)   # u3's own cohort


def _events_w(spark, rows):
    data = [
        (i, BASE + datetime.timedelta(hours=h), u, t, v)
        for i, h, u, t, v in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    )


def test_audience_overlap_exact_bruteforce(spark):
    """Pairwise exact Jaccard vs python sets."""
    from graphlite_spark.operators.analytics import audience_overlap_exact

    aud = {
        "view": {1, 2, 3, 4},
        "click": {2, 3, 5},
        "purchase": {3},
        "error": {9},  # disjoint from all -> no rows with error
    }
    rows = []
    eid = 0
    for t, us in aud.items():
        for u in us:
            rows.append((eid, 0, u, t, 1.0))
            eid += 1
    df = _events_w(spark, rows)
    got = {
        (r["g_a"], r["g_b"]): (
            r["n_a"], r["n_b"], r["n_inter"], r["n_union"],
            r["jaccard_micros"],
        )
        for r in audience_overlap_exact(df).collect()
    }
    want = {}
    for a in aud:
        for b in aud:
            if a < b and aud[a] & aud[b]:
                i = len(aud[a] & aud[b])
                un = len(aud[a] | aud[b])
                want[(a, b)] = (
                    len(aud[a]), len(aud[b]), i, un,
                    (1_000_000 * i) // un,
                )
    assert got == want
    assert all("error" not in k for k in got)


def test_conversion_lag_bruteforce(spark):
    """Lag quantiles vs python: strict ordering filter, rank rule."""
    from graphlite_spark.operators.temporal import conversion_lag_quantiles

    # lags (hours): u1=2, u2=5, u3=1, u4 never purchases,
    # u5 purchase BEFORE view (excluded), u6=10
    rows = [
        (0, 0, 1, "view", 1.0), (1, 2, 1, "purchase", 1.0),
        (2, 0, 2, "view", 1.0), (3, 5, 2, "purchase", 1.0),
        (4, 0, 3, "view", 1.0), (5, 1, 3, "purchase", 1.0),
        (6, 0, 4, "view", 1.0),
        (7, 3, 5, "view", 1.0), (8, 1, 5, "purchase", 1.0),
        (9, 0, 6, "view", 1.0), (10, 10, 6, "purchase", 1.0),
    ]
    df = _events_w(spark, rows)
    row = conversion_lag_quantiles(df).collect()[0]

    lags = sorted([2, 5, 1, 10])
    n = len(lags)
    pick = lambda p: lags[(n * p + 99) // 100 - 1] * 3600  # noqa: E731
    assert (row["n"], row["p25"], row["p50"], row["p75"]) == (
        n, pick(25), pick(50), pick(75)
    )


def test_naive_bayes_bruteforce(spark):
    """NB confusion matrix vs a python reimplementation of the exact
    truncating fold, smoothing, and struct-max tie rule."""
    from graphlite_spark.operators.classify import naive_bayes_confusion
    from graphlite_spark.functions.text import STOPWORDS

    texts = {
        0: ("en", "the cat and the dog"),
        1: ("en", "it is for on a"),
        2: ("fr", "le chat xyz qq"),
        3: ("fr", "le chien zz ww"),
        4: ("en", "of the in to"),
        5: ("fr", "bonjour le monde"),
        6: ("en", "a of and"),
        7: ("fr", "qq zz le"),
    }
    rows = [
        (did, txt, lang, "src0", len(txt))
        for did, (lang, txt) in texts.items()
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    labels = ("en", "fr")
    got = {
        (r["true_label"], r["pred_label"]): r["n"]
        for r in naive_bayes_confusion(df, label_values=labels).collect()
    }

    def feats(txt):
        toks = set(txt.lower().split())
        return [1 if w in toks else 0 for w in STOPWORDS]

    train = {d: v for d, v in texts.items() if d % 2 == 0}
    test = {d: v for d, v in texts.items() if d % 2 == 1}
    ntr, L = len(train), len(labels)
    params = {}
    for lab in labels:
        members = [feats(t) for (lg, t) in train.values() if lg == lab]
        nl = len(members)
        prior = ((nl + 1) * 1_000_000) // (ntr + L)
        p1 = [
            ((sum(m[i] for m in members) + 1) * 1_000_000) // (nl + 2)
            for i in range(len(STOPWORDS))
        ]
        params[lab] = (prior, p1)
    want: dict[tuple, int] = {}
    for d, (lg, txt) in test.items():
        b = feats(txt)
        best = None
        for lab in labels:
            prior, p1 = params[lab]
            s = prior * 1_000_000
            for i in range(len(STOPWORDS)):
                q = p1[i] if b[i] == 1 else 1_000_000 - p1[i]
                s = (s * q) // 1_000_000
            if best is None or (s, lab) > best[:2]:
                best = (s, lab)
        key = (lg, best[1])
        want[key] = want.get(key, 0) + 1
    assert got == want


def test_dataset_fingerprint_bruteforce(spark):
    """Manifest vs python md5 carve-outs; '(all)' rollup row; a
    single-doc change flips xor48."""
    import hashlib

    from graphlite_spark.operators.profiling import dataset_fingerprint

    docs = [(i, f"text {i}", "en", f"s{i % 2}", 6) for i in range(6)]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    got = {
        r["source"]: (r["n_docs"], r["xor48"], r["min_h"], r["max_h"])
        for r in dataset_fingerprint(df).collect()
    }

    def h48(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:12], 16)

    want: dict[str, list] = {}
    for _, t, _, s, _ in docs:
        for key in (s, "(all)"):
            h = h48(t)
            if key not in want:
                want[key] = [0, 0, h, h]
            want[key][0] += 1
            want[key][1] ^= h
            want[key][2] = min(want[key][2], h)
            want[key][3] = max(want[key][3], h)
    assert got == {k: tuple(v) for k, v in want.items()}

    df2 = spark.createDataFrame(
        [d if d[0] != 3 else (3, "CHANGED", "en", "s1", 7) for d in docs],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    got2 = {
        r["source"]: r["xor48"] for r in dataset_fingerprint(df2).collect()
    }
    assert got2["s1"] != got["s1"][1] and got2["s0"] == got["s0"][1]


def test_ab_ztest_bruteforce(spark):
    """z statistic vs python math on exact flags."""
    import math

    from graphlite_spark.operators.analytics import ab_conversion_ztest

    # A (signup): u1 converts, u2 no; B: u3 converts, u4 no, u5 no
    rows = [
        (0, 0, 1, "signup", 1.0), (1, 1, 1, "purchase", 1.0),
        (2, 0, 2, "signup", 1.0),
        (3, 0, 3, "view", 1.0), (4, 1, 3, "purchase", 1.0),
        (5, 0, 4, "view", 1.0), (6, 0, 5, "click", 1.0),
    ]
    df = _events_w(spark, rows)
    r = ab_conversion_ztest(df).collect()[0]
    n_a, conv_a, n_b, conv_b = 2, 1, 3, 1
    pa, pb = conv_a / n_a, conv_b / n_b
    pp = (conv_a + conv_b) / (n_a + n_b)
    z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1 / n_a + 1 / n_b))
    assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (
        n_a, conv_a, n_b, conv_b
    )
    assert r["rate_a"] == round(pa, 6) and r["rate_b"] == round(pb, 6)
    assert abs(r["z"] - z) < 1e-6


def test_mann_whitney_bruteforce(spark):
    """Doubled-U vs scipy-free python ranks, with ties across groups."""
    from graphlite_spark.operators.analytics import mann_whitney_u

    a_vals = [1.00, 2.50, 2.50, 4.00]
    b_vals = [0.50, 2.50, 3.00]
    rows = []
    eid = 0
    for v in a_vals:
        rows.append((eid, 0, 1, "purchase", v)); eid += 1
    for v in b_vals:
        rows.append((eid, 0, 2, "click", v)); eid += 1
    rows.append((eid, 0, 3, "view", 99.0))  # excluded type
    df = _events_w(spark, rows)
    r = mann_whitney_u(df).collect()[0]

    allv = sorted(
        [(v, "a") for v in a_vals] + [(v, "b") for v in b_vals]
    )
    # doubled average ranks
    r2 = {}
    i = 0
    while i < len(allv):
        j = i
        while j < len(allv) and allv[j][0] == allv[i][0]:
            j += 1
        dr = (i + 1) + j  # 2*avg of ranks i+1..j
        for k in range(i, j):
            r2[k] = dr
        i = j
    r2a = sum(dr for k, dr in r2.items() if allv[k][1] == "a")
    n_a, n_b = len(a_vals), len(b_vals)
    u_a_x2 = r2a - n_a * (n_a + 1)
    assert (r["n_a"], r["n_b"], r["u_a_x2"], r["u_b_x2"]) == (
        n_a, n_b, u_a_x2, 2 * n_a * n_b - u_a_x2
    )


def test_burst_rate_max_bruteforce(spark):
    """RANGE-window burst vs python sliding count, incl. a burst that
    straddles a fixed-bucket boundary."""
    from graphlite_spark.operators.analytics import burst_rate_max

    # u1: 4 events within 60s spanning a minute boundary (secs 30..80);
    # u2: evenly spread, never more than 1 per window
    stamps = {1: [30, 45, 60, 80, 300], 2: [0, 120, 240]}
    rows = []
    eid = 0
    for u, ss in stamps.items():
        for s in ss:
            rows.append(
                (eid, BASE + datetime.timedelta(seconds=s), u, "view", 1.0)
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    )
    got = {
        r["max_burst"]: r["n_users"]
        for r in burst_rate_max(df, window_seconds=60).collect()
    }

    want: dict[int, int] = {}
    for ss in stamps.values():
        m = max(
            sum(1 for t in ss if s - 59 <= t <= s) for s in ss
        )
        want[m] = want.get(m, 0) + 1
    assert got == want
    assert got.get(4) == 1 and got.get(1) == 1


def test_hour_dow_cube_bruteforce(spark):
    """Heatmap shares and CUBE lattice vs python."""
    from graphlite_spark.operators.analytics import (
        events_cube,
        hour_dow_heatmap,
    )

    rows = [
        (0, BASE + datetime.timedelta(hours=1), 1, "view", 1.0),
        (1, BASE + datetime.timedelta(hours=1, minutes=5), 2, "view", 2.0),
        (2, BASE + datetime.timedelta(days=1, hours=23), 1, "click", 0.5),
        (3, BASE + datetime.timedelta(days=5), 2, "view", 1.5),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    )
    hm = {
        (r["dow"], r["hour"]): (r["n"], r["share_micros"])
        for r in hour_dow_heatmap(df).collect()
    }
    cells: dict[tuple, int] = {}
    for _, ts, _, _, _ in rows:
        d = (ts - datetime.datetime(1970, 1, 1)).days
        dow, hour = (d + 3) % 7, ts.hour
        cells[(dow, hour)] = cells.get((dow, hour), 0) + 1
    tot = sum(cells.values())
    assert hm == {
        k: (n, (1_000_000 * n) // tot) for k, n in cells.items()
    }
    # BASE is Monday -> dow 0 for the first two rows
    assert (0, 1) in hm and hm[(0, 1)][0] == 2

    cube = {
        (r["event_type"], r["dow"]): (r["gid"], r["n"],
                                      r["sum_value_micros"])
        for r in events_cube(df).collect()
    }
    # 4 data rows -> lattice: cells + type marginals + dow marginals
    # + grand total; spot-check each tier
    assert cube[("(all)", -1)] == (3, 4, 5_000_000)
    assert cube[("view", -1)][1:] == (3, 4_500_000) and cube[
        ("view", -1)
    ][0] == 1
    assert cube[("(all)", 0)][0] == 2 and cube[("(all)", 0)][1] == 2
    assert cube[("view", 0)] == (0, 2, 3_000_000)


def test_feature_hash_collisions_bruteforce(spark):
    """Occupancy histogram vs python md5 buckets with tiny B so
    collisions are certain; empty slots are real rows."""
    import hashlib

    from graphlite_spark.operators.tfidf import feature_hash_collisions

    docs = [
        (0, "alpha beta gamma delta", "en", "s0", 22),
        (1, "beta epsilon zeta", "en", "s0", 17),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    B = 4
    got = {
        r["tokens_in_bucket"]: (r["n_buckets"], r["n_tokens"])
        for r in feature_hash_collisions(df, num_buckets=B).collect()
    }

    vocab = {w for _, t, _, _, _ in docs for w in t.lower().split()}
    occ = [0] * B
    for w in vocab:
        h = int(hashlib.md5(f"fh:{w}".encode()).hexdigest()[:12], 16)
        occ[h % B] += 1
    want: dict[int, list] = {}
    for k in occ:
        e = want.setdefault(k, [0, 0])
        e[0] += 1
        e[1] += k
    assert got == {k: tuple(v) for k, v in want.items()}
    assert sum(n for _, n in got.values()) == len(vocab)


def test_isotonic_minimax_bruteforce(spark):
    """The minimax fit vs a classic python PAV stack on the same
    bucket stats — and vs direct python minimax (all three agree)."""
    from graphlite_spark.operators.packing import isotonic_calibration

    # craft docs so quality orders by doc length and 'en' labels are
    # NON-monotone along that order (PAV has real pooling to do)
    langs = ["en", "de", "en", "en", "de", "en", "de", "en",
             "de", "de", "en", "en"]
    rows = [
        (i, " ".join(["word"] * (3 + i)), lang, "s0", 10)
        for i, lang in enumerate(langs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    B = 4
    got = sorted(
        (r["bucket"], r["n"], r["pos"], r["rate_micros"],
         r["fitted_micros"])
        for r in isotonic_calibration(df, num_buckets=B).collect()
    )

    # quality is monotone in doc length here (same tokens), so bucket
    # b of doc i = (rank*B)//N + 1 with rank = i
    N = len(langs)
    buckets: dict[int, list] = {}
    for i, lang in enumerate(langs):
        b = (i * B) // N + 1
        e = buckets.setdefault(b, [0, 0])
        e[0] += 1
        e[1] += 1 if lang == "en" else 0
    bs = sorted(buckets)
    ns = [buckets[b][0] for b in bs]
    ps = [buckets[b][1] for b in bs]
    cn = [0]
    cp = [0]
    for n, p in zip(ns, ps):
        cn.append(cn[-1] + n)
        cp.append(cp[-1] + p)
    k = len(bs)

    def rate(j, kk):
        return (1_000_000 * (cp[kk] - cp[j - 1])) // (cn[kk] - cn[j - 1])

    fit = [
        max(
            min(rate(j, kk) for kk in range(i, k + 1))
            for j in range(1, i + 1)
        )
        for i in range(1, k + 1)
    ]
    want = sorted(
        (bs[i], ns[i], ps[i], (1_000_000 * ps[i]) // ns[i], fit[i])
        for i in range(k)
    )
    assert got == want
    # fitted sequence is monotone nondecreasing (the isotonic contract)
    fseq = [x[4] for x in got]
    assert fseq == sorted(fseq)
    # and it actually pooled something (raw rates are non-monotone)
    rseq = [x[3] for x in got]
    assert rseq != sorted(rseq)


def test_int8_quant_error_bruteforce(spark):
    """Scalar-quant errors vs python, incl. a constant dimension."""
    from graphlite_spark.operators.similarity import int8_quant_error

    vecs = [
        (0, [0.0, 1.0, 0.5], 0),
        (1, [1.0, 1.0, 0.25], 0),
        (2, [0.5, 1.0, 0.75], 1),
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    r = int8_quant_error(df).collect()[0]

    qv = [[round(x * 1_000_000) for x in v] for _, v, _ in vecs]
    d = 3
    mins = [min(v[i] for v in qv) for i in range(d)]
    maxs = [max(v[i] for v in qv) for i in range(d)]
    errs = []
    for v in qv:
        for i in range(d):
            rng = maxs[i] - mins[i]
            if rng > 0:
                code = ((v[i] - mins[i]) * 255) // rng
                recon = mins[i] + (code * rng) // 255
                errs.append(v[i] - recon)
            else:
                errs.append(0)
    assert (r["n_vecs"], r["dims"]) == (3, 3)
    assert r["sum_sq_err"] == sum(e * e for e in errs)
    assert r["max_abs_err"] == max(abs(e) for e in errs)
    assert r["mean_sq_err"] == sum(e * e for e in errs) // 9
    # dim 2 is constant -> contributes zero error
    assert all(e == 0 for e in errs[1::3])


def test_pareto_frontier_bruteforce(spark):
    """Skyline vs itertools domination check, with an interior point,
    an equal-point tie, and a same-f lower-m dominated user."""
    from graphlite_spark.operators.analytics import pareto_frontier

    profile = {
        1: (3, 10.0), 2: (3, 10.0),   # tied frontier point
        3: (3, 2.0),                   # same f, lower m -> dominated
        4: (5, 4.0),                   # frontier (higher f)
        5: (1, 20.0),                  # frontier (higher m)
        6: (2, 3.0),                   # interior -> dominated
    }
    rows = []
    eid = 0
    for u, (f, total) in profile.items():
        for j in range(f):
            v = total / f
            rows.append((eid, j, u, "view", v))
            eid += 1
    df = _events_w(spark, rows)
    got = {
        (r["f"], r["m"]): r["n_users"]
        for r in pareto_frontier(df).collect()
    }

    pts = {
        u: (f, sum(round((total / f) * 100) for _ in range(f)))
        for u, (f, total) in profile.items()
    }
    def dominated(a, b):
        return (b[0] >= a[0] and b[1] >= a[1]) and b != a
    want: dict[tuple, int] = {}
    for u, p in pts.items():
        if not any(dominated(p, q) for q in pts.values()):
            want[p] = want.get(p, 0) + 1
    assert got == want
    assert got[pts[1]] == 2 and pts[6] not in got


def test_scc_condensation_bruteforce(spark):
    """Contract-and-layer vs python Tarjan-free brute force on a graph
    with two cycles feeding a chain."""
    from graphlite_spark.algos.scc import scc_condensation_layers

    # cycle A {0,1,2} -> cycle B {3,4} -> chain 5 -> 6; isolated 7
    arcs = [
        (0, 1), (1, 2), (2, 0),
        (2, 3), (3, 4), (4, 3),
        (4, 5), (5, 6),
    ]
    v = spark.createDataFrame([(i,) for i in range(8)], "id long")
    e = spark.createDataFrame(arcs, "src long, dst long")
    got = {
        r["scc"]: (r["members"], r["layer"])
        for r in scc_condensation_layers(v, e, depth=8).collect()
    }

    # python: reachability-based SCC + longest-path layers
    import itertools

    reach = {i: {i} for i in range(8)}
    for _ in range(8):
        for s, d in arcs:
            for src in list(reach):
                if s in reach[src]:
                    reach[src].add(d)
    scc_of = {}
    for i in range(8):
        comp = min(
            j for j in range(8) if j in reach[i] and i in reach[j]
        )
        scc_of[i] = comp
    cedges = {
        (scc_of[s], scc_of[d]) for s, d in arcs if scc_of[s] != scc_of[d]
    }
    members: dict[int, int] = {}
    for i, c in scc_of.items():
        members[c] = members.get(c, 0) + 1
    layer = {c: 0 for c in members}
    for _ in range(8):
        for s, d in cedges:
            layer[d] = max(layer[d], layer[s] + 1)
    want = {c: (members[c], layer[c]) for c in members}
    assert got == want
    assert got[0] == (3, 0) and got[3] == (2, 1)
    assert got[5] == (1, 2) and got[6] == (1, 3) and got[7] == (1, 0)


def test_bounce_rate_bruteforce(spark):
    """Bounce share vs hand-counted sessions around the 30-min gap."""
    from graphlite_spark.operators.sessions import bounce_rate

    rows = [
        # u1: two events 10 min apart (one session), then one 2h later
        # (bounce session)
        (0, BASE, 1, "view", 1.0),
        (1, BASE + datetime.timedelta(minutes=10), 1, "click", 1.0),
        (2, BASE + datetime.timedelta(hours=2), 1, "view", 1.0),
        # u2: single event (bounce)
        (3, BASE, 2, "view", 1.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    )
    r = bounce_rate(df).collect()[0]
    assert (r["n_sessions"], r["n_bounces"], r["n_users"],
            r["max_session_events"]) == (3, 2, 2, 2)
    assert r["bounce_micros"] == (1_000_000 * 2) // 3


def test_embedding_distance_profile_bruteforce(spark):
    """Pair distances vs python md5 bucketing and rank pairing."""
    import hashlib

    from graphlite_spark.operators.similarity import (
        embedding_distance_profile,
    )

    vecs = [(i, [float(i), float(i % 3)], i % 2) for i in range(11)]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    G = 2
    r = embedding_distance_profile(df, num_groups=G).collect()[0]

    buckets: dict[int, list] = {}
    for i, v, _ in vecs:
        h = int(hashlib.md5(f"edp:{i}".encode()).hexdigest()[:12], 16)
        buckets.setdefault(h % G, []).append((i, v))
    d2s = []
    for g, mem in buckets.items():
        mem.sort()
        for j in range(0, len(mem) - 1, 2):
            a = [round(x * 1_000_000) for x in mem[j][1]]
            b = [round(x * 1_000_000) for x in mem[j + 1][1]]
            d2s.append(sum((x - y) ** 2 for x, y in zip(a, b)))
    d2s.sort()
    n = len(d2s)
    pick = lambda p: d2s[(n * p + 99) // 100 - 1]  # noqa: E731
    assert (r["n_pairs"], r["p25"], r["p50"], r["p75"]) == (
        n, pick(25), pick(50), pick(75)
    )


def test_touch_attribution_bruteforce(spark):
    """First/last-touch credit vs hand-walked journeys, incl. a
    (direct) conversion and a mid-journey second conversion."""
    from graphlite_spark.operators.temporal import touch_attribution

    seqs = {
        1: [("view", 0.0), ("click", 0.0), ("purchase", 10.0)],
        2: [("purchase", 5.0)],  # no touch -> (direct)
        3: [("signup", 0.0), ("purchase", 2.0), ("click", 0.0),
            ("purchase", 4.0)],
    }
    rows = []
    eid = 0
    for u, seq in seqs.items():
        for j, (t, v) in enumerate(seq):
            rows.append((eid, j, u, t, v))
            eid += 1
    df = _events_w(spark, rows)
    got = {
        (r["model"], r["channel"]): (r["n_conversions"], r["sum_cents"])
        for r in touch_attribution(df).collect()
    }
    want = {
        ("first_touch", "view"): (1, 1000),
        ("first_touch", "(direct)"): (1, 500),
        ("first_touch", "signup"): (2, 600),   # both of u3's purchases
        ("last_touch", "click"): (2, 1400),    # u1's and u3's second
        ("last_touch", "(direct)"): (1, 500),
        ("last_touch", "signup"): (1, 200),    # u3's first purchase
    }
    assert got == want


def test_dose_response_bruteforce(spark):
    """Bucketed conversion rates vs python, incl. the capped bucket."""
    from graphlite_spark.operators.analytics import dose_response

    profiles = {
        1: (0, 0), 2: (0, 1), 3: (1, 0), 4: (2, 1),
        5: (5, 1), 6: (7, 0), 7: (3, 1),
    }
    rows = []
    eid = 0
    for u, (views, buys) in profiles.items():
        for _ in range(views):
            rows.append((eid, 0, u, "view", 1.0)); eid += 1
        for _ in range(buys):
            rows.append((eid, 1, u, "purchase", 1.0)); eid += 1
        if views == 0 and buys == 0:
            rows.append((eid, 0, u, "error", 1.0)); eid += 1
    df = _events_w(spark, rows)
    got = {
        r["exposure_bucket"]: (r["n_units"], r["n_converted"],
                               r["rate_micros"])
        for r in dose_response(df).collect()
    }
    want: dict[int, list] = {}
    for views, buys in profiles.values():
        b = min(views, 3)
        e = want.setdefault(b, [0, 0])
        e[0] += 1
        e[1] += 1 if buys else 0
    assert got == {
        b: (n, c, (1_000_000 * c) // n) for b, (n, c) in want.items()
    }
    assert got[3] == (3, 2, (2_000_000) // 3)  # 5,7,3 views capped


def test_popularity_hitrate_bruteforce(spark):
    """Leave-one-out popularity baseline vs python."""
    from graphlite_spark.operators.analytics import popularity_hitrate

    seqs = {
        1: ["view", "view", "click"],     # held: click
        2: ["view", "purchase"],          # held: purchase
        3: ["click", "view"],             # held: view
        4: ["error"],                     # held: error (empty history)
    }
    rows = []
    eid = 0
    for u, seq in seqs.items():
        for j, t in enumerate(seq):
            rows.append((eid, j, u, t, 1.0))
            eid += 1
    df = _events_w(spark, rows)
    r = popularity_hitrate(df, k=2).collect()[0]

    # train (all but last per user): view x3, click x1, purchase? no
    # (u2's purchase is held), error? no (u4's only event is held)
    # top-2 by (n desc, item asc): view(3), click(1)
    # held items: click (hit), purchase (miss), view (hit), error (miss)
    assert (r["n_users"], r["n_hits"]) == (4, 2)
    assert r["hitrate_micros"] == 500000


def test_psi_time_drift_bruteforce(spark):
    """PSI contributions vs python math, incl. a one-sided group."""
    import math

    from graphlite_spark.operators.analytics import psi_time_drift

    # range 0..100h; early half = first 50h
    rows = [
        (0, 0, 1, "view", 1.0), (1, 10, 1, "view", 1.0),
        (2, 60, 1, "view", 1.0),
        (3, 5, 2, "click", 1.0),           # click only early (x2 — a
        (6, 6, 2, "click", 1.0),           # 1-count floor would hide x1)
        (4, 70, 3, "error", 1.0),          # error only late
        (5, 100, 4, "view", 1.0),
    ]
    df = _events_w(spark, rows)
    got = {
        r["event_type"]: (
            r["n_early"], r["n_late"], r["share_early_micros"],
            r["share_late_micros"], r["psi_contrib_micros"],
        )
        for r in psi_time_drift(df).collect()
    }

    counts = {"view": (2, 2), "click": (2, 0), "error": (0, 1)}
    te = sum(e for e, _ in counts.values())
    tl = sum(l for _, l in counts.values())
    want = {}
    for g, (e, l) in counts.items():
        pe, pl = max(e, 1) / te, max(l, 1) / tl
        want[g] = (
            e, l, (1_000_000 * e) // te, (1_000_000 * l) // tl,
            round(1_000_000.0 * (pl - pe) * math.log(pl / pe)),
        )
    assert got == want
    assert got["click"][4] != 0  # a 2->0 extinction survives the floor


def test_knn_accuracy_bruteforce(spark):
    """1-NN accuracy vs python cosine on separable clusters."""
    from graphlite_spark.operators.similarity import knn_accuracy

    vecs = [
        (0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0), (2, [1.0, 0.1], 0),
        (3, [0.0, 1.0], 1), (4, [0.1, 0.9], 1),
        (5, [0.6, 0.6], 0),  # midway -> nearest decides
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    r = knn_accuracy(df).collect()[0]

    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(
            d / (math.sqrt(sum(x * x for x in a))
                 * math.sqrt(sum(y * y for y in b))), 6
        )

    correct = 0
    for i, v, lab in vecs:
        best = max(
            ((cos(v, w), -j, lj) for j, w, lj in vecs if j != i),
        )
        correct += 1 if best[2] == lab else 0
    assert (r["n_vecs"], r["n_correct"]) == (6, correct)
    assert r["accuracy_micros"] == (1_000_000 * correct) // 6


def test_minhash_estimate_error_bruteforce(spark):
    """Estimator-error summary vs python md5 minhashing on docs with
    one exact-duplicate pair (est == exact == 1.0 there)."""
    import hashlib

    from graphlite_spark.operators.dedup import minhash_estimate_error

    texts = {
        0: "alpha beta gamma delta epsilon zeta",
        1: "alpha beta gamma delta epsilon zeta",     # dup of 0
        2: "alpha beta gamma delta epsilon eta",       # near-dup
        3: "one two three four five six seven",        # unrelated
    }
    df = spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in texts.items()],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    K, B, n = 8, 4, 3
    r = minhash_estimate_error(df, num_hashes=K, bands=B, n=n).collect()[0]

    def shingles(t):
        toks = t.lower().split()
        return {
            " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
        }

    def h48(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    sig = {}
    for i, t in texts.items():
        sig[i] = [
            min(h48(f"{k}\x1f{s}") for s in shingles(t))
            for k in range(K)
        ]
    bandkey = {}
    for i in sig:
        bandkey[i] = [
            hashlib.md5(
                "\x1f".join([str(b)] + [str(sig[i][b * 2 + r_])
                                        for r_ in range(2)]).encode()
            ).hexdigest()
            for b in range(B)
        ]
    cand = set()
    for i in texts:
        for j in texts:
            if i < j and any(
                x == y for x, y in zip(bandkey[i], bandkey[j])
            ):
                cand.add((i, j))
    stats = []
    for a, b in cand:
        m = sum(1 for k in range(K) if sig[a][k] == sig[b][k])
        est = (m * 1_000_000) // K
        sa, sb = shingles(texts[a]), shingles(texts[b])
        c = len(sa & sb)
        ex = (1_000_000 * c) // (len(sa) + len(sb) - c)
        stats.append((abs(est - ex), est, ex))
    n_pairs = len(stats)
    assert (0, 1) in cand  # the exact dup must be found
    assert r["n_pairs"] == n_pairs
    assert r["mean_abs_err_micros"] == sum(s[0] for s in stats) // n_pairs
    assert r["max_abs_err_micros"] == max(s[0] for s in stats)
    assert r["mean_est_micros"] == sum(s[1] for s in stats) // n_pairs
    assert r["mean_exact_micros"] == sum(s[2] for s in stats) // n_pairs


def test_distinctive_terms_bruteforce(spark):
    """Log-odds z vs python math; the source-exclusive token wins."""
    import math

    from graphlite_spark.operators.tfidf import distinctive_terms_logodds

    docs = [
        (0, "common words here and kubernetes kubernetes", "en", "sA", 1),
        (1, "common words here and again", "en", "sA", 1),
        (2, "common words here and poetry poetry poetry", "en", "sB", 1),
        (3, "common words more filler", "en", "sB", 1),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    got = {}
    for r in distinctive_terms_logodds(df, k=2).collect():
        got.setdefault(r["source"], []).append(
            (r["token"], r["c_source"], r["z"])
        )

    cnt: dict[tuple, int] = {}
    for _, t, _, s, _ in docs:
        for w in t.lower().split():
            cnt[(s, w)] = cnt.get((s, w), 0) + 1
    ct: dict[str, int] = {}
    ns: dict[str, int] = {}
    for (s, w), c in cnt.items():
        ct[w] = ct.get(w, 0) + c
        ns[s] = ns.get(s, 0) + c
    nn, vv = sum(ns.values()), len(ct)
    want: dict[str, list] = {}
    for (s, w), c in cnt.items():
        cr = ct[w] - c
        nr = nn - ns[s]
        z = (
            math.log((c + 1) / (ns[s] + vv - c - 1))
            - math.log((cr + 1) / (nr + vv - cr - 1))
        ) / math.sqrt(1 / (c + 1) + 1 / (cr + 1))
        want.setdefault(s, []).append((w, c, round(z, 6)))
    for s in want:
        want[s] = sorted(want[s], key=lambda x: (-x[2], x[0]))[:2]
    got = {s: sorted(v, key=lambda x: (-x[2], x[0])) for s, v in got.items()}
    assert got == want
    assert got["sA"][0][0] == "kubernetes"
    assert got["sB"][0][0] == "poetry"


def test_textrank_bruteforce(spark):
    """Damped integer power iteration vs python on a doc where the
    hub sentence (sharing tokens with all others) must win."""
    from graphlite_spark.operators.tfidf import textrank_top_sentence

    text = (
        "apple banana cherry. apple dog. banana egg! cherry fig? "
        "unrelated words here"
    )
    docs = [(1, text, "en", "s0", len(text)),
            (2, "single sentence only", "en", "s0", 20)]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    got = {
        r["doc_id"]: (r["n_sentences"], r["sent_idx"], r["score_micros"])
        for r in textrank_top_sentence(df, iterations=4).collect()
    }

    import re

    def run(text):
        parts = re.split(r"[.!?]+", text)
        sents = {}
        for i, p in enumerate(parts):
            toks = set(t for t in re.split(r"\s+", p.lower()) if t)
            if toks:
                sents[i] = toks
        w = {}
        for i in sents:
            for j in sents:
                if i != j:
                    c = len(sents[i] & sents[j])
                    if c:
                        w[(i, j)] = c
        wt = {}
        for (i, j), c in w.items():
            wt[i] = wt.get(i, 0) + c
        r = {i: 1_000_000 for i in sents}
        for _ in range(4):
            nxt = {}
            for i in sents:
                s = sum(
                    (r[j] * w[(j, i)]) // wt[j]
                    for j in sents
                    if (j, i) in w
                )
                nxt[i] = 150_000 + (85 * s) // 100
            r = nxt
        best = max(sents, key=lambda i: (r[i], -i))
        return len(sents), best, r[best]

    for did, text_, _, _, _ in docs:
        assert got[did] == run(text_)
    # the single-sentence doc scores the no-inbox fixpoint
    assert got[2] == (1, 0, 150_000)
    assert got[1][1] == 0  # the hub sentence wins in doc 1


def test_ols_user_value_bruteforce(spark):
    """Exact OLS closed forms vs python on a hand regression."""
    from graphlite_spark.operators.analytics import ols_user_value

    profiles = {1: (2, 10.0), 2: (4, 18.0), 3: (6, 31.0), 4: (1, 6.0)}
    rows = []
    eid = 0
    for u, (f, total) in profiles.items():
        for j in range(f):
            rows.append((eid, j, u, "view", total / f))
            eid += 1
    df = _events_w(spark, rows)
    r = ols_user_value(df).collect()[0]

    pts = [
        (f, sum(round((total / f) * 100) for _ in range(f)))
        for f, total in profiles.values()
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    deny = n * syy - sy * sy

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b > 0) else -q

    slope = tdiv(num * 1_000_000, den)
    intercept = tdiv(sy * 1_000_000 - slope * sx, n)
    r2 = round((num * num) / (den * deny), 6)
    assert (r["n"], r["slope_micros"], r["intercept_micros"]) == (
        n, slope, intercept
    )
    assert r["r2"] == r2 and r["slope_micros"] > 0


def test_max_streak_bruteforce(spark):
    """Gaps-and-islands longest run vs python."""
    from graphlite_spark.operators.analytics import max_streak_hist

    days = {1: [0, 1, 2, 5, 6], 2: [0, 2, 4], 3: [3, 4, 5, 6]}
    rows = []
    eid = 0
    for u, ds in days.items():
        for d in ds:
            rows.append((eid, 24 * d, u, "view", 1.0))
            rows.append((eid + 1000, 24 * d + 1, u, "click", 1.0))
            eid += 1
    df = _events_w(spark, rows)
    got = {
        r["streak_days"]: r["n_users"]
        for r in max_streak_hist(df).collect()
    }

    want: dict[int, int] = {}
    for ds in days.values():
        best = cur = 1
        for a, b in zip(ds, ds[1:]):
            cur = cur + 1 if b == a + 1 else 1
            best = max(best, cur)
        want[best] = want.get(best, 0) + 1
    assert got == want
    assert got == {3: 1, 1: 1, 4: 1}


def test_median_two_pass_bruteforce(spark):
    """Two-pass histogram median vs python sort, incl. negative cents,
    an even-count group, and a group entirely inside one bin."""
    from graphlite_spark.operators.quantiles import median_two_pass

    vals = {
        "view": [1.0, 2.0, 3.0, 4.0],          # even: lower median 2.0
        "click": [-5.0, -1.0, 120.5],           # negatives, spans bins
        "error": [0.01, 0.02, 0.03],            # all in bin 0
    }
    rows = []
    eid = 0
    for t, vs in vals.items():
        for v in vs:
            rows.append((eid, 0, 1, t, v))
            eid += 1
    df = _events_w(spark, rows)
    got = {
        r["event_type"]: (r["n"], r["median_cents"])
        for r in median_two_pass(df, bin_width_cents=100).collect()
    }
    want = {}
    for t, vs in vals.items():
        cs = sorted(round(v * 100) for v in vs)
        n = len(cs)
        want[t] = (n, cs[(n + n % 2) // 2 - 1])
    assert got == want
    assert got["view"] == (4, 200) and got["click"] == (3, -100)


def test_markov_entropy_rate_bruteforce(spark):
    """Conditional entropy vs python with an in-order float fold."""
    import math

    from graphlite_spark.operators.cooccurrence import markov_entropy_rate

    chains = {
        1: ["view", "click", "view", "click", "view"],
        2: ["view", "purchase"],
        3: ["click", "click", "view"],
    }
    rows = []
    eid = 0
    for u, ch in chains.items():
        for j, t in enumerate(ch):
            rows.append((eid, j, u, t, 1.0))
            eid += 1
    df = _events_w(spark, rows)
    got = {
        r["state"]: (
            r["n_from"], r["h_cond_micros"], r["p_state_micros"],
            r["contrib_micros"],
        )
        for r in markov_entropy_rate(df).collect()
    }

    cnt: dict[tuple, int] = {}
    for ch in chains.values():
        for a, b in zip(ch, ch[1:]):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    na: dict[str, int] = {}
    for (a, _), n in cnt.items():
        na[a] = na.get(a, 0) + n
    nn = sum(na.values())
    want = {}
    for a in na:
        hc = 0.0
        for b in sorted(b for (x, b) in cnt if x == a):
            p = cnt[(a, b)] / na[a]
            hc += -p * math.log2(p)
        want[a] = (
            na[a], round(1_000_000.0 * hc),
            (1_000_000 * na[a]) // nn,
            round(1_000_000.0 * (na[a] / nn) * hc),
        )
    assert got == want
    # 'view' goes to both click and purchase -> positive entropy
    assert got["view"][1] > 0


def test_daily_peak_concurrency_bruteforce(spark):
    """Sweep-line vs python, incl. a midnight-spanning session and a
    touching-endpoints pair (must count concurrent)."""
    from graphlite_spark.operators.sessions import daily_peak_concurrency

    # u1: 10:00-10:30; u2: 10:30-11:00 (touch u1's end); u3: 23:50
    # day0 - 00:10 day1 (spans midnight); u4: 10:15 day0
    mins = {
        1: [(0, 600), (0, 630)],
        2: [(0, 630), (0, 660)],
        3: [(0, 1430), (1, 10)],
        4: [(0, 615)],
    }
    rows = []
    eid = 0
    for u, stamps in mins.items():
        for d, m in stamps:
            rows.append(
                (eid, BASE + datetime.timedelta(days=d, minutes=m),
                 u, "view", 1.0)
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    )
    got = {
        r["day"]: r["peak_concurrent"]
        for r in daily_peak_concurrency(df, gap_minutes=60).collect()
    }
    d0 = (BASE - datetime.datetime(1970, 1, 1)).days
    # day0 at 10:30: u1 open [600,630], u2 open [630,660], u4 [615,615]
    # -> at t=630 u1 still open (end inclusive), u2 opens, u4 closed
    # at 615.  At 615: u1+u4 = 2.  At 630: u1+u2 = 2.  u3 opens 1430.
    assert got[d0] == 2
    assert got[d0 + 1] == 1  # u3's tail past midnight


def test_session_entry_exit_bruteforce(spark):
    """Handoff matrix vs hand-built sessions."""
    from graphlite_spark.operators.sessions import session_entry_exit

    rows = [
        (0, BASE, 1, "view", 1.0),
        (1, BASE + datetime.timedelta(minutes=5), 1, "purchase", 1.0),
        (2, BASE + datetime.timedelta(hours=3), 1, "click", 1.0),
        (3, BASE, 2, "signup", 1.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    )
    got = {
        (r["entry_type"], r["exit_type"]): r["n_sessions"]
        for r in session_entry_exit(df).collect()
    }
    assert got == {
        ("view", "purchase"): 1,
        ("click", "click"): 1,
        ("signup", "signup"): 1,
    }


def test_revenue_var_bruteforce(spark):
    """VaR/ES vs python on a 20-day series with zero-filled gaps."""
    from graphlite_spark.operators.analytics import revenue_var

    daily = {d: float(d * 3 + 1) for d in range(0, 20, 2)}  # gaps odd
    rows = []
    eid = 0
    for d, v in daily.items():
        rows.append((eid, 24 * d, 1, "purchase", v))
        eid += 1
    df = _events_w(spark, rows)
    r = revenue_var(df, pct=25).collect()[0]

    cents = sorted(
        round(daily.get(d, 0) * 100) if d in daily else 0
        for d in range(19)
    )
    n = len(cents)
    cut = max((n * 25) // 100, 1)
    tail = cents[:cut]
    s = sum(tail)
    assert (r["n_days"], r["var_cents"]) == (n, cents[cut - 1])
    assert r["es_cents"] == (s - (s % cut + cut) % cut) // cut


def test_vertex_cover_bruteforce(spark):
    """Cover certificate + 2-approx bound vs python on a star+path."""
    from graphlite_spark.algos.matching import vertex_cover_2approx

    pairs = [(0, 1), (0, 2), (0, 3), (4, 5), (5, 6)]
    v = spark.createDataFrame([(i,) for i in range(7)], "id long")
    e = spark.createDataFrame(pairs, "src long, dst long")
    r = vertex_cover_2approx(v, e).collect()[0]
    assert r["n_uncovered_edges"] == 0          # the certificate
    assert r["n_cover"] == 2 * r["n_matched_edges"]
    # any matching here has <= 2 edges (star center used once + one of
    # the path edges), so the cover is <= 4; OPT is 2 ({0, 5})
    assert r["n_matched_edges"] <= 2 and r["n_cover"] <= 4
    assert r["n_vertices"] == 7


def test_position_attribution_bruteforce(spark):
    """40/20/40 credits vs hand math incl. the truncation remainder."""
    from graphlite_spark.operators.temporal import position_attribution

    # u1: 4 touches then purchase of 10.00: credits
    # [400000, 66666, 66666+r, ... wait m=4: middles = 2, q = 100000,
    # r = 0 -> [400000, 100000, 100000, 400000]
    # u2: 3 touches then 3.00: q = 200000, r = 0 ->
    # [400000, 200000, 400000]
    # u3: 1 touch then 2.00 -> [1000000]
    seqs = {
        1: ["view", "click", "signup", "error", "purchase"],
        2: ["view", "click", "view", "purchase"],
        3: ["signup", "purchase"],
    }
    values = {1: 10.0, 2: 3.0, 3: 2.0}
    rows = []
    eid = 0
    for u, seq in seqs.items():
        for j, t in enumerate(seq):
            val = values[u] if t == "purchase" else 0.0
            rows.append((eid, j, u, t, val))
            eid += 1
    df = _events_w(spark, rows)
    got = {
        r["channel"]: (r["n_touches"], r["sum_credit_microcents"])
        for r in position_attribution(df).collect()
    }

    want: dict[str, list] = {}
    for u, seq in seqs.items():
        touches = seq[:-1]
        cents = round(values[u] * 100)
        m = len(touches)
        if m == 1:
            credits = [1_000_000]
        elif m == 2:
            credits = [500_000, 500_000]
        else:
            q = 200_000 // (m - 2)
            credits = (
                [400_000] + [q] * (m - 2) + [0]
            )
            credits[-1] = 400_000 + (200_000 - q * (m - 2))
        for ch, cr in zip(touches, credits):
            e = want.setdefault(ch, [0, 0])
            e[0] += 1
            e[1] += cents * cr
    assert got == {k: tuple(v) for k, v in want.items()}


def test_max_nonoverlap_bruteforce(spark):
    """Greedy interval scheduling vs python, touching endpoints
    counted overlapping."""
    from graphlite_spark.operators.sessions import max_nonoverlap_sessions

    # u1: 3 sessions: [0,10], [5,20], [25,30] mins -> greedy picks
    # [0,10] then [25,30] = 2; u2: one session = 1
    stamps = {
        1: [0, 10, 45, 60, 145, 150],
        2: [0],
    }
    rows = []
    eid = 0
    for u, ms in stamps.items():
        for m in ms:
            rows.append(
                (eid, BASE + datetime.timedelta(minutes=m), u, "view", 1.0)
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    )
    got = {
        r["k_selected"]: r["n_users"]
        for r in max_nonoverlap_sessions(df, gap_minutes=30).collect()
    }
    # u1 sessions (gap 30m): [0..10], [45..60], [145..150] -> all 3
    # disjoint -> k=3; u2 -> k=1
    assert got == {3: 1, 1: 1}


def test_knn_graph_diagnostics_bruteforce(spark):
    """Hubness histogram + mutuality vs python cosine, with a
    deliberate hub (near the centroid of one cluster)."""
    import math

    from graphlite_spark.operators.similarity import (
        knn_hubness,
        knn_mutuality,
    )

    vecs = [
        (0, [1.0, 0.0], 0), (1, [0.95, 0.05], 0), (2, [0.9, 0.1], 0),
        (3, [0.0, 1.0], 1), (4, [0.05, 0.95], 1),
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(
            d / (math.sqrt(sum(x * x for x in a))
                 * math.sqrt(sum(y * y for y in b))), 6
        )

    nn = {}
    for i, v, _ in vecs:
        nn[i] = max(
            ((cos(v, w), -j) for j, w, _ in vecs if j != i)
        )
    nn = {i: -t[1] for i, t in nn.items()}
    indeg = {i: 0 for i, _, _ in vecs}
    for t in nn.values():
        indeg[t] += 1
    want_hist: dict[int, int] = {}
    for d in indeg.values():
        want_hist[d] = want_hist.get(d, 0) + 1
    got_hist = {
        r["nn_indegree"]: r["n_vecs"] for r in knn_hubness(df).collect()
    }
    assert got_hist == want_hist

    n_mutual = sum(1 for i, t in nn.items() if nn[t] == i)
    r = knn_mutuality(df).collect()[0]
    assert (r["n_vecs"], r["n_mutual"]) == (len(vecs), n_mutual)
    assert r["mutual_micros"] == (1_000_000 * n_mutual) // len(vecs)


def test_aa_hash_test_bruteforce(spark):
    """A/A split assignment + z vs python md5 parity."""
    import hashlib
    import math

    from graphlite_spark.operators.analytics import aa_hash_test

    profiles = {u: (u % 3 == 0) for u in range(1, 25)}
    rows = []
    eid = 0
    for u, buys in profiles.items():
        rows.append((eid, 0, u, "view", 1.0)); eid += 1
        if buys:
            rows.append((eid, 1, u, "purchase", 1.0)); eid += 1
    df = _events_w(spark, rows)
    r = aa_hash_test(df).collect()[0]

    def side(u):
        return int(
            hashlib.md5(f"aa:{u}".encode()).hexdigest()[:12], 16
        ) % 2

    n = {0: 0, 1: 0}
    c = {0: 0, 1: 0}
    for u, buys in profiles.items():
        s = side(u)
        n[s] += 1
        c[s] += 1 if buys else 0
    assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (
        n[0], c[0], n[1], c[1]
    )
    pa, pb = c[0] / n[0], c[1] / n[1]
    pp = (c[0] + c[1]) / (n[0] + n[1])
    z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1 / n[0] + 1 / n[1]))
    assert abs(r["z"] - z) < 1e-6


def test_cuped_bruteforce(spark):
    """theta / variance reduction vs python moments on exact cents."""
    # time range 0..10h -> midpoint 5h; pre X = cents sum <= 5h,
    # post Y = cents sum > 5h.  Correlated users: heavy pre -> heavy post.
    rows = [
        (0, 0, 1, "view", 1.00), (1, 8, 1, "click", 3.00),
        (2, 1, 2, "view", 5.00), (3, 9, 2, "click", 11.00),
        (4, 2, 3, "view", 2.00), (5, 10, 3, "click", 5.00),
        (6, 4, 4, "view", 9.00), (7, 7, 4, "click", 18.50),
    ]
    from graphlite_spark.operators.analytics import cuped_adjustment

    df = _events_w(spark, rows)
    r = cuped_adjustment(df).collect()[0]
    # midpoint = (0h + 10h)/2 = 5h
    per = {
        1: (100, 300), 2: (500, 1100), 3: (200, 500), 4: (900, 1850),
    }
    n = len(per)
    xs = [x for x, _ in per.values()]
    ys = [y for _, y in per.values()]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in per.values())
    syy = sum(y * y for y in ys)
    covxy = (n * sxy - sx * sy) / (n * n)
    varx = (n * sxx - sx * sx) / (n * n)
    vary = (n * syy - sy * sy) / (n * n)
    assert r["n_units"] == n
    assert abs(r["theta"] - covxy / varx) < 1e-6
    assert abs(r["var_y"] - vary) < 1e-4
    adj = vary - covxy * covxy / varx
    assert abs(r["var_adj"] - adj) < 1e-4
    assert abs(r["reduction"] - (1 - adj / vary)) < 1e-6


def test_ks_2sample_bruteforce(spark):
    """D statistic vs python ECDFs, with cross-group ties."""
    from graphlite_spark.operators.analytics import ks_2sample

    a_vals = [1.00, 2.00, 2.00, 5.00]
    b_vals = [2.00, 3.00, 4.00]
    rows = []
    eid = 0
    for v in a_vals:
        rows.append((eid, 0, 1, "purchase", v)); eid += 1
    for v in b_vals:
        rows.append((eid, 0, 2, "click", v)); eid += 1
    r = ks_2sample(_events_w(spark, rows)).collect()[0]
    na, nb = len(a_vals), len(b_vals)
    alphabet = sorted(set(a_vals + b_vals))
    d_num = max(
        abs(
            sum(1 for x in a_vals if x <= v) * nb
            - sum(1 for x in b_vals if x <= v) * na
        )
        for v in alphabet
    )
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert r["d_num"] == d_num
    assert abs(r["d_stat"] - d_num / (na * nb)) < 1e-6


def test_chi_square_bruteforce(spark):
    """chi2 micro sum vs python over the full lattice incl. zero cells."""
    from graphlite_spark.operators.analytics import chi_square_type_dow

    # two epoch weekdays (day 0 -> dow 3, day 1 -> dow 4), two types;
    # the (click, dow4) cell is a structural zero and must contribute E
    rows = [
        (0, 0, 1, "view", 1.0), (1, 1, 1, "view", 1.0),
        (2, 0, 2, "click", 1.0), (3, 2, 2, "view", 1.0),
        (4, 26, 3, "view", 1.0), (5, 27, 3, "view", 1.0),
    ]
    r = chi_square_type_dow(_events_w(spark, rows)).collect()[0]
    obs = {("view", 3): 3, ("click", 3): 1, ("view", 4): 2}
    types = {"view", "click"}
    dows = {3, 4}
    nn = sum(obs.values())
    rt = {t: sum(v for (tt, _), v in obs.items() if tt == t) for t in types}
    cd = {d: sum(v for (_, dd), v in obs.items() if dd == d) for d in dows}
    total = 0
    for t in types:
        for d in dows:
            o = obs.get((t, d), 0)
            a = nn * o - rt[t] * cd[d]
            den = nn * rt[t] * cd[d]
            asq = a * a
            q, rem = divmod(asq, den)
            total += 1_000_000 * q + (1_000_000 * rem) // den
    assert (r["n_types"], r["n_dows"], r["dof"]) == (2, 2, 1)
    assert r["chi2_micros"] == total


def test_twonn_bruteforce(spark):
    """TwoNN micro sum + MLE vs python distances, with a duplicate
    pair (d1 = 0) that must be excluded."""
    import math

    from graphlite_spark.operators.similarity import twonn_intrinsic_dim

    vecs = [
        (0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [3.0, 0.0]),
        (3, [0.0, 2.0]),
        (4, [5.0, 5.0]), (5, [5.0, 5.0]),  # exact duplicates
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    r = twonn_intrinsic_dim(df).collect()[0]

    def dsq(a, b):
        return round(sum((x - y) ** 2 for x, y in zip(a, b)), 6)

    total = 0
    n_used = 0
    for i, v in vecs:
        ds = sorted(
            (dsq(v, w), j) for j, w in vecs if j != i
        )
        d1, d2 = ds[0][0], ds[1][0]
        if d1 <= 0:
            continue
        n_used += 1
        total += round(math.log(d2 / d1) * 500000.0)
    assert r["n_used"] == n_used
    assert r["sum_lnmu_micros"] == total
    assert abs(r["id_mle"] - n_used * 1e6 / total) < 1e-6


def test_uniformity_bruteforce(spark):
    """Log-mean Gaussian potential vs python cosine pairs."""
    import math

    from graphlite_spark.operators.similarity import uniformity_metric

    vecs = [
        (0, [1.0, 0.0]), (1, [0.8, 0.6]), (2, [0.0, 1.0]),
        (3, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    r = uniformity_metric(df).collect()[0]

    import numpy

    def f32(v):
        # the engine stores array<float>; quantize like parquet does
        return [float(numpy.float32(x)) for x in v]

    def cos(a, b):
        a, b = f32(a), f32(b)
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a))
            * math.sqrt(sum(y * y for y in b))
        )

    s = 0
    np = 0
    for i, v in vecs:
        for j, w in vecs:
            if i < j:
                np += 1
                s += round(math.exp(-2.0 * (2.0 - 2.0 * cos(v, w))) * 1e9)
    assert (r["n_pairs"], r["sum_g_nanos"]) == (np, s)
    assert abs(r["uniformity"] - math.log(s / (np * 1e9))) < 1e-6


def test_burt_constraint_bruteforce(spark):
    """Pico-exact constraint vs python on a barbell-with-bridge graph:
    the broker (bridge vertex) must score lowest."""
    from graphlite_spark.algos.stats import burt_constraint

    # triangle {0,1,2} - bridge 2-3 - triangle {3,4,5}
    und = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (3, 5), (4, 5)]
    df = spark.createDataFrame(
        [(a, b) for a, b in und], "src long, dst long"
    )
    got = {
        r["user_id"]: (r["degree"], r["constraint_pico"])
        for r in burt_constraint(df).collect()
    }

    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for i, ns in adj.items():
        di = len(ns)
        total = 0
        for j in ns:
            s = 1_000_000 // di
            for q in ns & adj[j]:
                s += 1_000_000 // (di * len(adj[q]))
            total += s * s
        want[i] = (di, total)
    assert got == want
    # brokers (2 and 3) are the least constrained
    lows = sorted(want, key=lambda i: want[i][1])[:2]
    assert set(lows) == {2, 3}


def test_nelson_aalen_bruteforce(spark):
    """Cumulative micro-hazard vs python risk sets, with censoring."""
    # horizon = day 3. lifetimes: u1 0d (censored? last=0 != 3 -> death),
    # u2 1d death, u3 3d (last=3 -> censored), u4 0d censored-at-horizon
    rows = [
        (0, 0, 1, "view", 1.0),
        (1, 0, 2, "view", 1.0), (2, 24, 2, "view", 1.0),
        (3, 0, 3, "view", 1.0), (4, 72, 3, "view", 1.0),
        (5, 72, 4, "view", 1.0),
    ]
    from graphlite_spark.operators.analytics import nelson_aalen

    got = {
        r["duration_days"]: (r["n_risk"], r["n_deaths"], r["cumhaz_micros"])
        for r in nelson_aalen(_events_w(spark, rows)).collect()
    }
    # lifetimes: u1 t=0 death, u2 t=1 death, u3 t=3 censored, u4 t=0 cens
    # risk(t) = lifetimes >= t: t=0 -> 4, t=1 -> 2, t=3 -> 1
    # deaths: t=0 -> 1, t=1 -> 1
    h0 = (1_000_000 * 1) // 4
    h1 = h0 + (1_000_000 * 1) // 2
    assert got == {0: (4, 1, h0), 1: (2, 1, h1)}


def test_gopher_rules_bruteforce(spark):
    """Per-source fail counts vs hand-checked rule outcomes."""
    from graphlite_spark.operators.profiling import gopher_rule_flags

    long_ok = " ".join(
        ["the be to of and that have with"] + ["word"] * 50
    )  # 58 words, all alpha, mean len ~3.6, 8 stop hits -> passes all
    short = "the of tiny doc"  # 4 words -> fail_words; stop8 ok (2 hits)
    symbols = " ".join(["123"] * 60)  # no alpha -> fail_alpha+fail_stop
    docs = spark.createDataFrame(
        [
            (0, long_ok, "en", "s1", len(long_ok)),
            (1, short, "en", "s1", len(short)),
            (2, symbols, "en", "s2", len(symbols)),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    got = {
        r["source"]: (
            r["n_docs"], r["fail_words"], r["fail_wordlen"],
            r["fail_alpha"], r["fail_stop"], r["n_pass"],
        )
        for r in gopher_rule_flags(docs, min_words=50).collect()
    }
    # s1: long_ok passes; short fails words only (mean len 11/4 < 3 ->
    # also fails wordlen!)  4 words: the(3)+of(2)+tiny(4)+doc(3)=12
    # 12 >= 3*4 -> wordlen ok.
    assert got["s1"] == (2, 1, 0, 0, 0, 1)
    # s2: 60 words ok; mean len 3 ok; alpha 0 -> fail; stop 0 -> fail
    assert got["s2"] == (1, 0, 0, 1, 1, 0)


def test_good_turing_bruteforce(spark):
    """N_r table + smoothed r* vs python counts."""
    from graphlite_spark.operators.profiling import good_turing_counts

    # counts: a:4, b:2, c:2, d:1, e:1, f:1
    text = "a a a a b b c c d e f"
    docs = spark.createDataFrame(
        [(0, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    got = {
        r["r"]: (r["n_r"], r["r_star_micros"])
        for r in good_turing_counts(docs).collect()
    }
    # N_1=3, N_2=2, N_4=1; r*=  r=1: 2*2/3; r=2: 3*1/2... wait N_3=0
    # r=1: (1+1)*N_2/N_1 = 2*2/3 -> floor micro 1333333
    # r=2: (2+1)*N_3/N_2 -> N_3 missing -> NULL
    # r=4: (4+1)*N_5/N_4 -> NULL
    assert got[1] == (3, (1_000_000 * 2 * 2) // 3)
    assert got[2] == (2, None)
    assert got[4] == (1, None)


def test_holt_linear_bruteforce(spark):
    """Coupled level/trend recursion vs python fold, incl. a gap day
    (zero-filled) and a negative trend."""
    from graphlite_spark.operators.analytics import holt_linear_daily

    # days 0..4, counts 4, 2, 0(gap), 1, 3
    rows = []
    eid = 0
    for d, cnt in [(0, 4), (1, 2), (3, 1), (4, 3)]:
        for _ in range(cnt):
            rows.append((eid, 24 * d, 1, "view", 1.0)); eid += 1
    got = {
        r["d"]: (
            r["y"], r["level_micros"], r["trend_micros"],
            r["resid_micros"],
        )
        for r in holt_linear_daily(_events_w(spark, rows)).collect()
    }

    ys = [4, 2, 0, 1, 3]
    M = 1_000_000

    def tdiv(x, d):
        return (x - math_fmod_int(x, d)) // d

    def math_fmod_int(x, d):
        # toward-zero remainder (Java/C semantics)
        r = abs(x) % d
        return r if x >= 0 else -r

    l, b = M * ys[1], M * (ys[1] - ys[0])
    want = {0: (ys[0], None, None, None), 1: (ys[1], l, b, None)}
    for t in range(2, len(ys)):
        resid = M * ys[t] - (l + b)
        rawl = M * ys[t] + 3 * (l + b)
        l_new = tdiv(rawl, 4)
        rawb = (l_new - l) + 3 * b
        b_new = tdiv(rawb, 4)
        l, b = l_new, b_new
        want[t] = (ys[t], l, b, resid)
    base = min(got)
    got0 = {d - base: v for d, v in got.items()}
    assert got0 == want


def test_sprt_bruteforce(spark):
    """Cumulative LLR + decisions vs python with the same constants."""
    from graphlite_spark.operators.analytics import (
        _sprt_constants,
        sprt_daily,
    )

    # strong positive evidence: 3 days, heavy conversion
    rows = []
    eid = 0
    for d, convs, others in [(0, 5, 5), (1, 8, 2), (2, 9, 1)]:
        for _ in range(convs):
            rows.append((eid, 24 * d, 1, "purchase", 1.0)); eid += 1
        for _ in range(others):
            rows.append((eid, 24 * d, 1, "view", 1.0)); eid += 1
    got = {
        r["d"]: (r["n"], r["c"], r["cum_llr_micros"], r["decision"])
        for r in sprt_daily(_events_w(spark, rows)).collect()
    }
    llr1, llr0, upper, lower = _sprt_constants(0.05, 0.08, 0.05, 0.05)
    cum = 0
    want = {}
    base = min(got)
    for d, convs, others in [(0, 5, 5), (1, 8, 2), (2, 9, 1)]:
        n = convs + others
        cum += convs * llr1 + others * llr0
        dec = (
            "accept_h1" if cum >= upper
            else "accept_h0" if cum <= lower else "continue"
        )
        want[d] = (n, convs, cum, dec)
    got0 = {d - base: v for d, v in got.items()}
    assert got0 == want
    assert want[2][3] == "accept_h1"  # the evidence actually crosses


def test_winsorized_bruteforce(spark):
    """Rank cuts + clamped micro mean vs python, 20 values."""
    from graphlite_spark.operators.analytics import winsorized_stats

    vals = [0.01 * (i + 1) for i in range(18)] + [99.0, 0.001]
    rows = [(i, 0, 1, "view", v) for i, v in enumerate(vals)]
    r = winsorized_stats(_events_w(spark, rows)).collect()
    assert len(r) == 1
    r = r[0]
    cents = sorted(round(v * 100) for v in vals)
    n = len(cents)
    lo_rank = max((5 * n + 99) // 100, 1)   # ceil(0.05*20) = 1
    hi_rank = (95 * n + 99) // 100          # ceil(0.95*20) = 19
    lo_c, hi_c = cents[lo_rank - 1], cents[hi_rank - 1]
    clamped = [min(max(c, lo_c), hi_c) for c in cents]
    want_mean = (10_000 * sum(clamped)) // n
    assert (r["n"], r["lo_cents"], r["hi_cents"]) == (n, lo_c, hi_c)
    assert r["wmean_micros"] == want_mean


def test_tie_strength_bruteforce(spark):
    """Correlation of multiplicity vs triangle support on a handmade
    graph: embedded tie repeated often, bridge tie repeated rarely."""
    from graphlite_spark.algos.stats import tie_strength_embeddedness

    # triangle {1,2,3} with (1,2) repeated 3x; bridge (3,4) once
    arcs = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (3, 4)]
    df = spark.createDataFrame(arcs, "src long, dst long")
    r = tie_strength_embeddedness(df).collect()[0]
    # pairs: (1,2) s=3 x=1; (2,3) s=1 x=1; (1,3) s=1 x=1; (3,4) s=1 x=0
    ss, sx = 3 + 1 + 1 + 1, 1 + 1 + 1 + 0
    m = 4
    sss = 9 + 1 + 1 + 1
    sxx = 1 + 1 + 1 + 0
    ssx = 3 + 1 + 1 + 0
    num = m * ssx - ss * sx
    vs = m * sss - ss * ss
    vx = m * sxx - sx * sx
    import math

    assert (r["n_edges"], r["sum_strength"], r["sum_support"]) == (
        m, ss, sx
    )
    assert abs(r["corr"] - num / math.sqrt(vs * vx)) < 1e-6


def test_char_entropy_bruteforce(spark):
    """Micro-exact entropy vs python counts, incl. the single-char
    degenerate (entropy 0)."""
    import math

    from graphlite_spark.operators.profiling import char_entropy

    texts = {0: "aaaa", 1: "abab", 2: "abcd"}
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in texts.items()],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    got = {
        r["doc_id"]: (r["n_chars_counted"], r["entropy_micros"])
        for r in char_entropy(docs).collect()
    }
    for i, t in texts.items():
        n = len(t)
        s = 0
        for u in sorted(set(t)):
            c = t.count(u)
            s += round(1_000_000.0 * c * math.log(c))
        want = round(1_000_000.0 * math.log(n) - s / n)
        assert got[i] == (n, want)
    assert got[0][1] == 0  # one repeated char -> zero entropy


def test_qte_bruteforce(spark):
    """Per-cohort rank quantiles of user totals vs python."""
    from graphlite_spark.operators.analytics import (
        quantile_treatment_effect,
    )

    # users 1,2: first event signup (cohort A); users 3,4,5: cohort B
    rows = [
        (0, 0, 1, "signup", 1.0), (1, 1, 1, "click", 5.0),
        (2, 0, 2, "signup", 2.0), (3, 1, 2, "view", 10.0),
        (4, 0, 3, "view", 1.0), (5, 1, 3, "signup", 100.0),
        (6, 0, 4, "click", 3.0),
        (7, 0, 5, "view", 7.0),
    ]
    got = {
        r["pct"]: (
            r["n_a"], r["n_b"], r["q_a_cents"], r["q_b_cents"],
            r["diff_cents"],
        )
        for r in quantile_treatment_effect(
            _events_w(spark, rows)
        ).collect()
    }
    tots_a = sorted([600, 1200])          # users 1, 2
    tots_b = sorted([10100, 300, 700])    # users 3, 4, 5
    for p in (25, 50, 75):
        ra = max((p * len(tots_a) + 99) // 100, 1)
        rb = max((p * len(tots_b) + 99) // 100, 1)
        qa, qb = tots_a[ra - 1], tots_b[rb - 1]
        assert got[p] == (2, 3, qa, qb, qa - qb)


def test_simpson_bruteforce(spark):
    """Exact lambda / inverse lambda vs python counts."""
    from graphlite_spark.operators.profiling import simpson_diversity

    docs = spark.createDataFrame(
        [
            (0, "a a a b", "en", "s1", 7),
            (1, "a b c d", "en", "s2", 7),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    got = {
        r["source"]: (
            r["n_tokens"], r["n_distinct"], r["simpson_micros"],
            r["inv_simpson_micros"],
        )
        for r in simpson_diversity(docs).collect()
    }
    # s1: counts a=3,b=1 -> num = 6, den = 12 -> lambda = .5
    assert got["s1"] == (4, 2, 500_000, 2_000_000)
    # s2: all distinct -> num 0 -> lambda 0, inverse NULL
    assert got["s2"] == (4, 4, 0, None)


def test_kmeans_silhouette_bruteforce(spark):
    """Centroid silhouette vs python on two tight, separated blobs
    (k=2, 0 iterations of drift needed)."""
    import math

    from graphlite_spark.operators.kmeans import (
        _fit,
        _quantized,
        kmeans_silhouette,
    )

    vecs = [
        (0, [0.0, 0.0]), (1, [0.1, 0.0]), (2, [0.0, 0.1]),
        (3, [5.0, 5.0]), (4, [5.1, 5.0]), (5, [5.0, 5.1]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {
        r["cluster"]: (r["n"], r["mean_sil_micros"])
        for r in kmeans_silhouette(df, k=2, iterations=2).collect()
    }
    # reproduce with the SAME deterministic fit
    cents = _fit(_quantized(df, "vec_id", "embedding"), 2, 2)

    import numpy

    def q(v):
        return [round(float(numpy.float32(x)) * 1_000_000) for x in v]

    sums: dict[int, list[int]] = {}
    for _, v in vecs:
        qv = q(v)
        d2s = [
            sum((a - b) ** 2 for a, b in zip(qv, c)) for c in cents
        ]
        a2 = min(d2s)
        own = d2s.index(a2)
        rest = d2s[:own] + d2s[own + 1:]
        b2 = min(rest)
        s = (
            round(1e6 * (1.0 - math.sqrt(a2) / math.sqrt(b2)))
            if b2 > 0 else 0
        )
        sums.setdefault(own, []).append(s)
    want = {
        cl: (len(ss), (sum(ss) - sum(ss) % len(ss)) // len(ss))
        for cl, ss in sums.items()
    }
    assert got == want
    # both blobs are tight and far apart -> high silhouette
    assert all(v[1] > 900_000 for v in got.values())


def test_transition_latency_bruteforce(spark):
    """Rank-rule quantiles of per-user gap seconds vs python."""
    from graphlite_spark.operators.temporal import transition_latency

    # user 1: view -(10s)-> click -(3600s)-> click; user 2: view -(20s)-> click
    rows_s = [
        (0, 0, 1, "view"), (1, 10, 1, "click"), (2, 3610, 1, "click"),
        (3, 0, 2, "view"), (4, 20, 2, "click"),
    ]
    import datetime

    data = [
        (i, BASE + datetime.timedelta(seconds=s), u, t, 1.0)
        for i, s, u, t in rows_s
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    )
    got = {
        r["transition"]: (r["n"], r["p50"], r["p90"])
        for r in transition_latency(df).collect()
    }
    gaps = {"view>click": [10, 20], "click>click": [3600]}
    want = {}
    for tr, gs in gaps.items():
        gs = sorted(gs)
        n = len(gs)
        want[tr] = (
            n,
            gs[(n * 50 + 99) // 100 - 1],
            gs[(n * 90 + 99) // 100 - 1],
        )
    assert got == want
