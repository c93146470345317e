"""BPE merge training vs a plain-Python reference (leftmost-greedy
non-overlapping merges, count-DESC / pair-ASC argmax), including
adversarial repeated-symbol words where greedy and all-pairs semantics
diverge, plus the DuckDB oracle's run-parity formulation on the same
corpus."""

from __future__ import annotations

import re
from collections import Counter

import duckdb
import pytest

from graphlite_spark.operators.bpe import (
    apply_merge_expr,
    bpe_merges,
    word_frequencies,
)


def _greedy(sym: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def _ref_bpe(texts: list[str], n_merges: int):
    wf = Counter(w for t in texts for w in re.split(r"\s+", t.lower()) if w)
    seg = {w: list(w) for w in wf}
    rules = []
    for step in range(1, n_merges + 1):
        pc = Counter()
        for w, f in wf.items():
            s = seg[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append((step, a, b, a + b, cnt))
        seg = {w: _greedy(s, a, b) for w, s in seg.items()}
    return rules, seg


GREEDY_CASES = [
    # (word, left, right) — repeated/overlapping pair patterns
    ("aaaa", "a", "a"),      # runs: greedy pairs (aa)(aa)
    ("aaa", "a", "a"),       # odd run: (aa)(a)
    ("ababab", "a", "b"),    # alternating: three merges
    ("aab", "a", "a"),       # merge then trailing symbol
    ("baaa", "a", "a"),      # run not at word start
    ("abba", "b", "b"),      # single interior merge
    ("xyx", "x", "y"),       # leftmost wins
]


def test_apply_merge_matches_greedy(spark):
    rows = [(w, list(w), a, b) for w, a, b in GREEDY_CASES]
    df = spark.createDataFrame(
        rows, "w STRING, seg ARRAY<STRING>, a STRING, b STRING"
    )
    for w, a, b in GREEDY_CASES:
        got = (
            df.where(f"w = '{w}' AND a = '{a}' AND b = '{b}'")
            .select(apply_merge_expr("seg", a, b, a + b).alias("m"))
            .collect()[0]["m"]
        )
        assert got == _greedy(list(w), a, b), (w, a, b, got)


def test_bpe_merges_matches_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest",
        "aaaa abab low newer",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING"
    )
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["merged"], r["cnt"])
        for r in bpe_merges(docs, n_merges=6).orderBy("step").collect()
    ]
    want, _ = _ref_bpe(texts, 6)
    assert got == want


def test_bpe_merges_exhausts_small_corpus(spark):
    # one two-char word: exactly one merge possible, then the loop stops
    docs = spark.createDataFrame([(0, "ab ab")], "doc_id BIGINT, text STRING")
    got = bpe_merges(docs, n_merges=5).collect()
    assert len(got) == 1
    assert (got[0]["left_sym"], got[0]["right_sym"], got[0]["cnt"]) == (
        "a", "b", 2,
    )


def test_word_frequencies(spark):
    docs = spark.createDataFrame(
        [(0, "a b a"), (1, "b  c")], "doc_id BIGINT, text STRING"
    )
    got = {r["w"]: r["f"] for r in word_frequencies(docs).collect()}
    assert got == {"a": 2, "b": 2, "c": 1}


def test_oracle_sql_matches_reference_on_testdata():
    """The DuckDB run-parity oracle alone vs the Python reference at
    sf0.001 (the Spark-vs-oracle comparison runs in test_entry_oracle)."""
    from graphlite_spark import oracle as O

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    got = con.execute(O.bpe_merges_sql(6)).fetchall()
    texts = [t for (t,) in con.execute("SELECT text FROM documents").fetchall()]
    want, _ = _ref_bpe(texts, 6)
    assert sorted(got) == sorted(want)


def test_chunk_documents_windows(spark):
    # overlap rule, trailing-chunk clamp, empty-doc drop, guard
    import pytest

    from graphlite_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),       # 7 toks, chunk 4 step 2 -> starts 0,2,4,6
            (2, "x y"),                  # 2 toks -> one chunk
            (3, "   "),                  # empty -> no rows
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(docs, chunk_tokens=4, overlap=2).collect()
    }
    assert got == {
        (1, 0): (4, "a b c d"),
        (1, 1): (4, "c d e f"),
        (1, 2): (3, "e f g"),
        (1, 3): (1, "g"),
        (2, 0): (2, "x y"),
    }
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_bpe_fertility_matches_reference(spark):
    from graphlite_spark.operators.bpe import bpe_fertility

    texts = [
        ("srcA", "aa ab aa abab"),
        ("srcA", "ab aa"),
        ("srcB", "zzzz zz xyz"),
        ("srcB", ""),            # empty doc contributes nothing
    ]
    docs = spark.createDataFrame(
        [(i, s, t) for i, (s, t) in enumerate(texts)],
        "doc_id long, source string, text string",
    )
    n_merges = 4
    _, seg = _ref_bpe([t for _, t in texts], n_merges)
    want = {}
    for s, t in texts:
        for w in re.split(r"\s+", t.lower()):
            if not w:
                continue
            nw, np_, nc = want.get(s, (0, 0, 0))
            want[s] = (nw + 1, np_ + len(seg[w]), nc + len(w))
    want = {
        s: (
            nw, np_, nc,
            (1_000_000 * np_) // nw,
            (1_000_000 * nc) // np_,
        )
        for s, (nw, np_, nc) in want.items()
    }
    got = {
        r["source"]: (
            r["n_words"], r["n_pieces"], r["n_chars"],
            r["fertility_micros"], r["chars_per_piece_micros"],
        )
        for r in bpe_fertility(docs, n_merges=n_merges).collect()
    }
    assert got == want
    # after 4 merges on this corpus every srcA word is a single piece
    assert got["srcA"][4] > got["srcB"][4] or got["srcA"][3] <= got["srcB"][3]
