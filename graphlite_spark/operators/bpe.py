"""Byte-pair-encoding merge training over the documents corpus.

The trained artifact a tokenizer pipeline needs is the ordered merge
table: ``k`` rules ``(left_sym, right_sym) -> merged``, each chosen as
the adjacent-symbol pair with the highest corpus frequency at that step
(ties break lexicographically on ``(left, right)`` so the table is
deterministic), then applied LEFTMOST-GREEDY non-overlapping to every
word before the next count — the classic Sennrich formulation.

Scale shape — the standard BPE-training reduction: the corpus collapses
to the DISTINCT-WORD table with frequencies first (two map-side-combined
aggregations over the token stream; a 100 TB corpus has millions of
distinct words, not trillions), and every subsequent step touches only
that table.  Per step: one explode + map-side-combined groupBy for the
weighted pair counts, a 1-row top-k for the argmax (the only driver
action), and an expression-only ``aggregate`` fold that applies the
merge in whole-stage codegen — no UDF, no per-row Python.  Lineage is
truncated with a lazy ``localCheckpoint`` every few steps, the same
discipline as every iterative loop in this repo.

Greedy-apply correctness: the fold appends each symbol unless the
accumulator's LAST element equals ``left`` and the current symbol equals
``right``, in which case it replaces that last element with ``merged``.
A consumed ``left`` is already rewritten to ``merged`` (!= ``left``,
since ``right`` is non-empty), so it can never double-match — this is
exactly the leftmost-greedy scan (run-parity) semantics; the DuckDB
oracle implements the same semantics as window-function run-parity
selection and both match a plain-Python reference implementation
(``tests/test_bpe.py``).

Reference parity note: GraphLite (the reference engine) has no text
surface at all — this operator is builder-brief surplus for the
training-data-pipeline tier, like tf_idf/build_vocab.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from graphlite_spark.functions.text import tokens_expr

_EMPTY_SEG = "CAST(array() AS ARRAY<STRING>)"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, f) — distinct words with total corpus occurrence counts."""
    return (
        docs.select(F.explode(tokens_expr(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )


def _char_seg(w) -> F.Column:
    """Initial segmentation: one single-character symbol per position."""
    c = F.col(w) if isinstance(w, str) else w
    return F.transform(
        F.sequence(F.lit(1), F.length(c)), lambda i: c.substr(i, F.lit(1))
    )


def _pair_counts(seg_words: DataFrame) -> DataFrame:
    """(a, b, cnt) — adjacent-pair counts weighted by word frequency.

    Counts ALL adjacent occurrences (the Sennrich statistic); the
    greedy non-overlap rule applies only when a merge is EXECUTED."""
    pairs = seg_words.select(
        "f",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("seg"), F.lit(1), F.size("seg") - 1).alias("a"),
                F.slice(F.col("seg"), F.lit(2), F.size("seg") - 1).alias("b"),
            )
        ).alias("p"),
    )
    return (
        pairs.select("f", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.sum("f").cast("long").alias("cnt"))
    )


def apply_merge_expr(seg, left: str, right: str, merged: str) -> F.Column:
    """Leftmost-greedy non-overlapping application of one merge rule to a
    symbol array, as a single codegen'd fold (no explode, no shuffle)."""
    c = F.col(seg) if isinstance(seg, str) else seg
    return F.aggregate(
        c,
        F.expr(_EMPTY_SEG),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(left)) & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _train(
    docs: DataFrame,
    n_merges: int,
    text_col: str,
    checkpoint_every: int = 4,
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """(rules, seg_words) — the ordered merge rules AND the final
    per-distinct-word segmentation frame they produce (w, f, seg)."""
    seg_words = word_frequencies(docs, text_col).select(
        "w", "f", _char_seg("w").alias("seg")
    )
    rules: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        top = (
            _pair_counts(seg_words)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:  # every word fully merged to one symbol
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        rules.append((step, a, b, a + b, cnt))
        seg_words = seg_words.select(
            "w", "f", apply_merge_expr("seg", a, b, a + b).alias("seg")
        )
        if step % checkpoint_every == 0:
            seg_words = seg_words.localCheckpoint(eager=False)
    return rules, seg_words


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Train ``n_merges`` BPE merge rules; returns the ordered merge
    table (step, left_sym, right_sym, merged, cnt) — step is 1-based.

    One 1-row collect per step (the argmax is a scalar, like every
    fixpoint loop's convergence check); all counting and rewriting stays
    distributed and expression-only."""
    spark = docs.sparkSession
    rules, _ = _train(docs, n_merges, text_col, checkpoint_every)
    return spark.createDataFrame(
        rules, "step BIGINT, left_sym STRING, right_sym STRING, "
               "merged STRING, cnt BIGINT",
    )


def bpe_tokenize(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, word_pos, piece_idx, piece) — the corpus tokenized with
    the merges trained on it: every document's word sequence joined to
    the vocabulary's FINAL segmentation (the train loop's end state),
    pieces exploded in order.  Completes the BPE story: bpe_merges
    learns the rules, this applies them corpus-wide.

    Scale shape: training touches only the DISTINCT-word table; apply is
    one equi-join of (doc, word_pos, word) against that vocabulary-sized
    table (broadcastable at any corpus size) + one ordered explode —
    the corpus text is scanned once and never shuffled by content."""
    _, seg_words = _train(docs, n_merges, text_col)
    words = docs.select(
        F.col(id_col),
        F.posexplode(tokens_expr(F.col(text_col))).alias("word_pos", "w"),
    )
    return (
        words.join(seg_words.select("w", "seg"), "w")
        .select(
            id_col,
            F.col("word_pos").cast("long").alias("word_pos"),
            F.posexplode("seg").alias("piece_idx", "piece"),
        )
        .select(
            id_col,
            "word_pos",
            F.col("piece_idx").cast("long").alias("piece_idx"),
            "piece",
        )
    )


def bpe_fertility(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """(source, n_words, n_pieces, n_chars, fertility_micros,
    chars_per_piece_micros) — the standard tokenizer-evaluation readout:
    fertility = subword pieces per word (1.0 means every word is one
    piece; rising fertility on a source flags vocabulary mismatch), and
    chars-per-piece is its compression dual.  Both are exact integer
    micro-divisions of exact counts.

    Scale shape: NO per-piece explode — each word row joins the
    vocabulary-sized final segmentation once and contributes
    (size(seg), length(w)) to one map-side-combined groupBy; the corpus
    is scanned once, the segmentation table is broadcastable at any
    corpus size (same discipline as bpe_tokenize)."""
    _, seg_words = _train(docs, n_merges, text_col)
    words = docs.select(
        F.col(group_col),
        F.explode(tokens_expr(F.col(text_col))).alias("w"),
    )
    per = words.join(seg_words.select("w", "seg"), "w").select(
        group_col,
        F.size("seg").cast("long").alias("np"),
        F.length("w").cast("long").alias("nc"),
    )

    def _exact_div(num, den):
        scaled = 1000000 * num
        return ((scaled - scaled % den) / den).cast("long")

    g = per.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("np").cast("long").alias("n_pieces"),
        F.sum("nc").cast("long").alias("n_chars"),
    )
    return g.select(
        group_col,
        "n_words",
        "n_pieces",
        "n_chars",
        _exact_div(F.col("n_pieces"), F.col("n_words")).alias(
            "fertility_micros"
        ),
        _exact_div(F.col("n_chars"), F.col("n_pieces")).alias(
            "chars_per_piece_micros"
        ),
    )
