"""Property-based tests (hypothesis) for the pure-expression operators —
invariants that hold for EVERY input, not just the fixtures:

* chunking covers every token, steps exactly chunk−overlap, and
  reconstructs the document from the non-overlapped heads;
* reciprocity is 1.0 on any symmetrized edge set and bounded on any set;
* truncate_plan never changes the rows it checkpoints.

Each example batches into ONE DataFrame evaluation; max_examples stays
small because every example costs Spark jobs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_words = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=4),
    min_size=0,
    max_size=40,
)


@_SLOW
@given(words=_words, chunk=st.integers(2, 8), overlap=st.integers(0, 6))
def test_chunking_invariants(spark, words, chunk, overlap):
    from graphlite_spark.operators.chunking import chunk_documents

    if overlap >= chunk:
        overlap = chunk - 1
    step = chunk - overlap
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    rows = sorted(
        (r["chunk_idx"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(
            docs, chunk_tokens=chunk, overlap=overlap
        ).collect()
    )
    toks = [w for w in words if w]  # tokenizer drops empties; lowercase
    if not toks:
        assert rows == []
        return
    # chunk i starts at i*step while inside the doc
    n_chunks = (len(toks) - 1) // step + 1
    assert [r[0] for r in rows] == list(range(n_chunks))
    for i, n_toks, text in rows:
        expect = toks[i * step: i * step + chunk]
        assert n_toks == len(expect)
        assert text == " ".join(expect)
    # concatenating each chunk's non-overlapped head reconstructs the doc
    heads = []
    for i, _, text in rows:
        ctoks = text.split(" ")
        heads.extend(ctoks if i == n_chunks - 1 else ctoks[:step])
    # the final chunk may re-cover tokens earlier heads already emitted
    assert heads[: len(toks)] == toks[: len(heads)] or " ".join(
        heads
    ).startswith(" ".join(toks[: len(heads)]))


_edges = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)),
    min_size=0,
    max_size=30,
)


@_SLOW
@given(edges=_edges)
def test_reciprocity_bounds_and_symmetric_case(spark, edges):
    from graphlite_spark.algos.stats import reciprocity

    e = spark.createDataFrame(
        edges or [(0, 0)], "src long, dst long"
    )
    row = reciprocity(e).collect()[0]
    n, r = row["n_edges"], row["n_recip"]
    assert 0 <= r <= n
    distinct = {(a, b) for a, b in edges if a != b}
    assert n == len(distinct)
    assert r == sum(1 for (a, b) in distinct if (b, a) in distinct)
    if distinct:
        sym = spark.createDataFrame(
            list(distinct) + [(b, a) for a, b in distinct],
            "src long, dst long",
        )
        row2 = reciprocity(sym).collect()[0]
        assert row2["reciprocity"] == 1.0


@_SLOW
@given(rows=st.lists(st.integers(-50, 50), min_size=0, max_size=25))
def test_truncate_plan_preserves_rows(spark, rows):
    from graphlite_spark.checkpoint import truncate_plan

    df = spark.createDataFrame([(x,) for x in rows] or [(None,)], "v int")
    j = df.join(df.withColumnRenamed("v", "w"), F.col("v") == F.col("w"))
    assert sorted(
        (r["v"], r["w"]) for r in truncate_plan(j, eager=True).collect()
    ) == sorted((r["v"], r["w"]) for r in j.collect())


_docs = st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=8),
    min_size=0,
    max_size=8,
)


@_SLOW
@given(docs=_docs, t=st.sampled_from([400, 600, 800]))
def test_jaccard_join_matches_bruteforce(spark, docs, t):
    # the prefix filter must lose NO pair — checked against a plain
    # python all-pairs loop on random tiny corpora
    from graphlite_spark.operators.dedup import jaccard_join_prefix

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(
        rows or [(0, "")], "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): (r["inter"], r["union_sz"])
        for r in jaccard_join_prefix(df, threshold_permille=t).collect()
    }
    sets = {i: set(toks) for i, toks in enumerate(docs)}
    want = {}
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter * 1000 >= t * union:
                want[(a, b)] = (inter, union)
    assert got == want


def test_whole_graph_stats_on_empty_graph(spark):
    # every whole-graph readout must survive a graph with no edges
    from graphlite_spark.algos.stats import (
        powerlaw_alpha,
        reciprocity,
        rich_club,
        transitivity,
    )

    e = spark.createDataFrame([], "src long, dst long")
    r = reciprocity(e).collect()[0]
    assert (r["n_edges"], r["n_recip"], r["reciprocity"]) == (0, 0, None)
    t = transitivity(e).collect()[0]
    assert (t["n_triangles"], t["n_wedges"], t["transitivity"]) == (
        0, 0, None,
    )
    p = powerlaw_alpha(e).collect()[0]
    assert (p["n_tail"], p["alpha"]) == (0, None)
    rc = {r["k"]: r for r in rich_club(e, ks=(1, 2)).collect()}
    assert all(
        (rc[k]["n_nodes"], rc[k]["e_among"], rc[k]["phi"]) == (0, 0, None)
        for k in (1, 2)
    )


def test_duplicate_spans_merge_semantics(spark):
    # hand-built corpus: 'a b c d' repeats across docs -> every covering
    # 2-gram window is duplicated; adjacent windows merge to ONE span
    from graphlite_spark.operators.dedup import duplicate_ngram_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d x y z"),
            (2, "q a b c d r s"),
            (3, "unique tokens only here"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"]): r["span_tokens"]
        for r in duplicate_ngram_spans(docs, n=2).collect()
    }
    # doc1: grams (a b),(b c),(c d) duplicated -> tokens 0..3 one span
    # doc2: same grams at positions 1..3 -> tokens 1..4
    assert got == {(1, 0, 3): 4, (2, 1, 4): 4}


def test_containment_pairs_excerpt(spark):
    """A short doc fully quoted inside a long one: Jaccard misses it
    (low union ratio), containment flags it at 1.0."""
    from graphlite_spark.operators.dedup import (
        containment_pairs, ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    rows = [
        (0, quote),                       # the excerpt
        (1, filler + " " + quote),        # quotes doc 0 verbatim
        (2, "completely different text about other things entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cont = {
        (r["a"], r["b"]): (r["na"], r["nb"], r["c"], r["containment"])
        for r in containment_pairs(df, threshold=0.5, max_doc_freq=None).collect()
    }
    # every shingle of doc 0 appears in doc 1 -> containment exactly 1
    assert (0, 1) in cont
    na, nb, c, containment = cont[(0, 1)]
    assert c == na and containment == 1.0
    assert (0, 2) not in cont and (1, 2) not in cont
    # symmetric Jaccard on the same pair is far below its threshold
    jac = ngram_jaccard_pairs(df, threshold=0.3, max_doc_freq=None).collect()
    assert all((r["a"], r["b"]) != (0, 1) for r in jac)


def test_winnow_fingerprints_bruteforce(spark):
    import hashlib

    from graphlite_spark.operators.dedup import winnow_fingerprints

    SEP = "\x1f"

    def h48(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    def brute(text, k=3, w=4):
        ts = text.lower().split()
        if len(ts) < k:
            return 0, 0, None
        h = [h48(SEP.join(ts[i:i + k])) for i in range(len(ts) - k + 1)]
        g = len(h)
        we = min(w, g)
        sel = set()
        for j in range(g - we + 1):
            win = h[j:j + we]
            mv = min(win)
            pos = j + max(i for i, x in enumerate(win) if x == mv)
            sel.add(f"{pos + 1}:{mv}")
        ss = sorted(sel)
        return g, len(ss), hashlib.md5(SEP.join(ss).encode()).hexdigest()

    shared = "one two three four five six seven eight"
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "prefix words here " + shared + " suffix tail words",
        "other opening text " + shared + " different ending",
        "tiny doc",                 # < k tokens -> (0, 0, NULL)
        "aa aa aa aa aa aa",        # all-equal hashes: rightmost-min ties
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_fps"], r["winnow_md5"])
        for r in winnow_fingerprints(df).collect()
    }
    assert got == {i: brute(t) for i, t in enumerate(texts)}
    # detection guarantee: docs 1 and 2 share a run of 8 >= w+k-1 = 6
    # tokens, so their selected fingerprint HASHES must intersect
    def fps(text, k=3, w=4):
        ts = text.lower().split()
        h = [h48(SEP.join(ts[i:i + k])) for i in range(len(ts) - k + 1)]
        g = len(h); we = min(w, g)
        return {
            min(h[j:j + we]) for j in range(g - we + 1)
        }
    assert fps(texts[1]) & fps(texts[2])


def test_code_switch_score_bruteforce(spark):
    from graphlite_spark.functions.text import (
        LANG_EN_THRESHOLD, STOPWORDS,
    )
    from graphlite_spark.operators.tfidf import code_switch_score

    # exactly 16 tokens per window, every window holding stopwords
    en = "the cat is on the mat and the dog is in the house with all cats"
    und = "zork blat frum quux glorp wibble snark jolt vex murk plon drif quar telt yop hazz"
    texts = [
        en + " " + en,           # pure en, 2 whole windows -> 0 divergence
        und,                     # pure und -> 0 divergence
        en + " " + und,          # code-switched -> the und window diverges
        "",                      # empty -> 0 windows
        en + " them",            # 17 tokens: the 1-token tail window is
                                 # stopword-free -> divergence (inherent
                                 # chunk-tail noise, pinned here)
    ]
    W = 16

    def lang(ts):
        if not ts:
            return "und"
        r = sum(1 for t in ts if t in STOPWORDS) / max(len(ts), 1)
        return "en" if r >= LANG_EN_THRESHOLD else "und"

    def brute(text):
        ts = text.lower().split()
        wl = [lang(ts[i:i + W]) for i in range(0, len(ts), W)]
        dl = lang(ts)
        nd = sum(1 for l in wl if l != dl)
        return (dl, len(wl), nd,
                0 if not wl else (1_000_000 * nd) // len(wl))

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["doc_lang"], r["n_windows"], r["n_divergent"],
            r["divergence_micros"],
        )
        for r in code_switch_score(df, window=W).collect()
    }
    assert got == {i: brute(t) for i, t in enumerate(texts)}
    # the pure docs are self-consistent; the concatenation diverges;
    # the ragged tail window surfaces as (documented) chunk-tail noise
    assert got[0][3] == 0 and got[1][3] == 0
    assert got[2][3] > 0
    assert got[4][3] > 0


def test_minhash_lsh_recall_bruteforce(spark):
    import hashlib

    from graphlite_spark.operators.dedup import minhash_lsh_recall

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [
        base,                                   # 0: dup of 1 (j = 1)
        base,                                   # 1
        base + " lam mu nu",                    # 2: strong overlap with 0/1
        "alpha beta gamma xx yy zz qq rr ss",   # 3: weak overlap
        "totally different words here none shared at all ok",  # 4
    ]
    TAU, K, B, N = 0.05, 8, 4, 3

    def h48(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    def sh(t):
        ts = [w for w in t.lower().split() if w]
        return {" ".join(ts[i:i + N]) for i in range(len(ts) - N + 1)}

    S = [sh(t) for t in texts]
    truth = {
        (a, b)
        for a in range(len(texts))
        for b in range(a + 1, len(texts))
        if S[a] and S[b]
        and round(len(S[a] & S[b]) / len(S[a] | S[b]), 6) >= TAU
    }

    def bandkeys(s):
        sig = [min(h48(f"{k}\x1f{x}") for x in s) for k in range(K)]
        rows = K // B
        return {
            hashlib.md5(
                "\x1f".join(
                    [str(b)] + [str(sig[b * rows + r]) for r in range(rows)]
                ).encode()
            ).hexdigest()
            for b in range(B)
        }

    keys = [bandkeys(s) if s else set() for s in S]
    cand = {
        (a, b)
        for a in range(len(texts))
        for b in range(a + 1, len(texts))
        if keys[a] & keys[b]
    }
    found = {
        (a, b)
        for (a, b) in cand
        if round(len(S[a] & S[b]) / len(S[a] | S[b]), 6) >= TAU
    }
    hits = truth & found

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    row = minhash_lsh_recall(df, tau=TAU).collect()[0]
    assert (row["n_truth"], row["n_found"], row["n_hits"]) == (
        len(truth), len(found), len(hits),
    )
    assert row["recall"] == round(len(hits) / len(truth), 6)
    assert len(truth) >= 3  # fixture non-degenerate


def test_split_leakage_bruteforce(spark):
    import hashlib

    from graphlite_spark.operators.dedup import split_leakage

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    alt = "one two three four five six seven eight nine ten eleven"
    # several duplicate groups so hash-splits have a chance to differ
    texts = []
    for g in range(8):
        t = (base if g % 2 == 0 else alt) + f" group{g} tail words here"
        texts += [t, t]  # exact dup pair per group
    texts.append("totally unrelated filler document with other words")
    TAU, K, B, N = 0.3, 8, 4, 3

    def h48(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    def sh(t):
        ts = [w for w in t.lower().split() if w]
        return {" ".join(ts[i:i + N]) for i in range(len(ts) - N + 1)}

    def bandkeys(s):
        sig = [min(h48(f"{k}\x1f{x}") for x in s) for k in range(K)]
        rows = K // B
        return {
            hashlib.md5("\x1f".join(
                [str(b)] + [str(sig[b * rows + r]) for r in range(rows)]
            ).encode()).hexdigest()
            for b in range(B)
        }

    S = [sh(t) for t in texts]
    keys = [bandkeys(s) if s else set() for s in S]
    found = {
        (a, b)
        for a in range(len(texts))
        for b in range(a + 1, len(texts))
        if keys[a] & keys[b]
        and round(len(S[a] & S[b]) / len(S[a] | S[b]), 6) >= TAU
    }

    def split(i):
        h = h48(f"split:{i}")
        if h < int(0.9 * (1 << 48)):
            return "train"
        if h < int(0.95 * (1 << 48)):
            return "val"
        return "test"

    from collections import Counter
    want = Counter(
        f"within_{split(a)}" if split(a) == split(b) else "cross"
        for (a, b) in found
    )
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["pair_class"]: r["n_pairs"]
        for r in split_leakage(df, threshold=TAU).collect()
    }
    assert got == dict(want)
    assert sum(want.values()) >= 8  # every planted pair found


def test_k_anonymity_bruteforce(spark):
    import datetime as dt
    from collections import Counter

    from graphlite_spark.operators.profiling import k_anonymity

    rows = [
        # (event_type, ts): two same-hour 'click's, a lone 'view', three
        # same-hour 'error's, one 'click' in a different hour
        ("click", dt.datetime(2024, 1, 1, 10, 5)),
        ("click", dt.datetime(2024, 1, 1, 10, 55)),
        ("view", dt.datetime(2024, 1, 1, 10, 10)),
        ("error", dt.datetime(2024, 1, 2, 3, 1)),
        ("error", dt.datetime(2024, 1, 2, 3, 2)),
        ("error", dt.datetime(2024, 1, 2, 3, 59)),
        ("click", dt.datetime(2024, 1, 1, 11, 0)),
    ]
    cls = Counter((t, ts.date(), ts.hour) for t, ts in rows)
    hist = Counter(cls.values())
    want = {s: (n, s * n) for s, n in hist.items()}

    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {
        r["class_size"]: (r["n_classes"], r["n_rows"])
        for r in k_anonymity(df).collect()
    }
    assert got == want
    assert got[1] == (2, 2) and got[2] == (1, 2) and got[3] == (1, 3)


def test_markov_stationary_bruteforce(spark):
    import datetime as dt

    from graphlite_spark.operators.cooccurrence import markov_stationary

    # skewed chain: A mostly goes to B, B mostly stays B, C feeds A
    seqs = {
        1: ["A", "B", "B", "B", "A", "B", "B", "C"],
        2: ["C", "A", "B", "B", "B", "B"],
        3: ["B", "B", "A", "B", "C", "A"],
    }
    rows, eid = [], 0
    for u, states in seqs.items():
        for i, s in enumerate(states):
            rows.append((eid, u, s, dt.datetime(2024, 1, 1, 0, 0, i)))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    IT = 8

    c, states = {}, set()
    for u, sq in seqs.items():
        states.update(sq)
        for a, b in zip(sq, sq[1:]):
            c[(a, b)] = c.get((a, b), 0) + 1
    tot = {}
    for (a, _), n in c.items():
        tot[a] = tot.get(a, 0) + n
    k = len(states)
    p = {s: 1_000_000 // k for s in states}
    for _ in range(IT):
        nxt = {s: 0 for s in states}
        for (a, b), n in c.items():
            nxt[b] += (p[a] * n) // tot[a]
        p = nxt
    got = {
        r["state"]: r["stationary_micros"]
        for r in markov_stationary(df, iterations=IT).collect()
    }
    assert got == p
    assert got["B"] > got["A"] > 0  # the skew shows up


def test_hitting_time_bruteforce(spark):
    import datetime as dt

    from graphlite_spark.operators.cooccurrence import hitting_time

    # B is the target; C never reaches B directly, only through A
    seqs = {
        1: ["A", "B", "A", "A", "B", "C"],
        2: ["C", "A", "B", "C", "A"],
        3: ["B", "C", "C", "A", "B"],
    }
    rows, eid = [], 0
    for u, states in seqs.items():
        for i, s in enumerate(states):
            rows.append((eid, u, s, dt.datetime(2024, 1, 1, 0, 0, i)))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    IT = 8

    c, states = {}, set()
    for u, sq in seqs.items():
        states.update(sq)
        for a, b in zip(sq, sq[1:]):
            c[(a, b)] = c.get((a, b), 0) + 1
    tot = {}
    for (a, _), n in c.items():
        tot[a] = tot.get(a, 0) + n
    h = {s: 0 for s in states}
    for _ in range(IT):
        s2 = {s: 0 for s in states}
        for (a, b), n in c.items():
            s2[a] += (h[b] * n) // tot[a]
        h = {
            s: 0 if s == "B" else 1_000_000 + s2[s]
            for s in states
        }
    got = {
        r["state"]: r["hitting_micros"]
        for r in hitting_time(df, target="B", iterations=IT).collect()
    }
    assert got == h
    assert got["B"] == 0
    # C reaches B only via A, so it must sit strictly farther out
    assert got["C"] > got["A"] > 0


def test_heaps_law_bruteforce(spark):
    import math

    from graphlite_spark.operators.packing import heaps_law

    docs = [
        (0, "alpha beta alpha gamma"),
        (1, "beta beta delta alpha epsilon"),
        (2, "zeta alpha eta theta beta iota kappa"),
        (3, "alpha beta gamma delta"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # brute force: global token stream in doc_id order
    stream = []
    for _, t in sorted(docs):
        stream.extend(t.split())
    n = len(stream)
    first = {}
    for i, tok in enumerate(stream, start=1):
        first.setdefault(tok, i)
    want = {}
    for d in range(1, 11):
        nd = n * d // 10
        vd = sum(1 for f in first.values() if f <= nd)
        if vd:
            want[d] = (nd, vd)
    pts = [
        (round(math.log(nd) * 1e6), round(math.log(vd) * 1e6))
        for nd, vd in want.values()
    ]
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    beta = round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)

    rows = heaps_law(df).collect()
    got = {
        r["decile"]: (r["tokens_cum"], r["vocab_cum"]) for r in rows
    }
    assert got == want
    assert all(abs(r["heaps_beta"] - beta) < 2e-6 for r in rows)
    # the curve is a real growth curve: vocab non-decreasing in decile
    vs = [got[d][1] for d in sorted(got)]
    assert vs == sorted(vs)
