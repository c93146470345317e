"""Sequence n-gram statistics — the language-model side of corpus prep.

:mod:`cooccurrence` counts unordered document-level pairs; training-data
work also needs ORDERED adjacency: bigram counts and the top next-tokens
per word (the classic count-based LM table, and the quick corpus-quality
probe — a corpus whose bigram table is dominated by boilerplate
continuations is template spam).

Scale shape: bigram extraction is a PURE EXPRESSION — ``transform`` over
the token array zips each token with its successor inside whole-stage
codegen, no posexplode+self-join, no per-document window.  The only
shuffles are the map-side-combined (w1, w2) count and the per-w1 top-k
window (``partitionBy(w1)`` — WindowGroupLimit, partial top-k before the
exchange)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphlite_spark.functions.text import tokens_expr


def bigram_counts(
    docs: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """(w1, w2, n_pairs) — ordered adjacent-token pair counts over the
    corpus, kept when ``n_pairs >= min_count``."""
    t = tokens_expr(text_col)
    idx = F.sequence(F.lit(1), F.size(t) - 1)
    pairs = F.when(
        F.size(t) >= 2,
        F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(t, i).alias("w1"),
                F.element_at(t, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = docs.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    out = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    if min_count > 1:
        out = out.where(F.col("n_pairs") >= min_count)
    return out


def doc_bigram_hit_rate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> DataFrame:
    """(doc_id, n_bigrams, n_known, hit_micros) — per-document count-based
    LM probe: the fraction of a document's ordered token bigrams whose
    corpus-wide count is >= ``min_count``, as integer micro-units
    (``10^6 * n_known div n_bigrams``; 0 for documents shorter than two
    tokens).  This is the cheap stand-in for perplexity-based quality
    filtering in a training-data pipeline: text whose transitions are
    mostly corpus-novel (low hit rate) is noise/garble, text whose
    transitions are all ultra-common is boilerplate — both ends of the
    distribution are the filter targets.  Kept BIGINT-exact (counts and
    one integer division) so the oracle comparison is hash-exact — the
    same discipline as tf_idf/katz, instead of a summation-order-
    dependent float log-prob.

    Scale shape: bigram extraction is the same pure expression as
    :func:`bigram_counts` (no window, no self-join); per-(doc, pair)
    multiplicities map-side combine before the corpus-table equi-join
    (pair-keyed, both sides pair-aggregated so frequent bigrams are one
    row each, not a skew axis), then one map-side-combined per-doc sum."""
    t = tokens_expr(text_col)
    idx = F.sequence(F.lit(1), F.size(t) - 1)
    pairs = F.when(
        F.size(t) >= 2,
        F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(t, i).alias("w1"),
                F.element_at(t, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = docs.select(F.col(id_col), F.explode(pairs).alias("p")).select(
        id_col, "p.w1", "p.w2"
    )
    # per-(doc, pair) multiplicity first: the join input is pair-distinct
    # per doc, and the count shuffle map-side combines
    per_pair = bg.groupBy(id_col, "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    corpus = bigram_counts(docs, text_col, min_count).select("w1", "w2")
    per_doc = (
        per_pair.join(corpus.withColumn("known", F.lit(1)), ["w1", "w2"], "left")
        .groupBy(id_col)
        .agg(
            F.sum("m").alias("n_bigrams"),
            F.sum(
                F.when(F.col("known").isNotNull(), F.col("m")).otherwise(
                    F.lit(0)
                )
            ).alias("n_known"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("n_known", F.lit(0)).cast("long").alias("n_known"),
            F.when(F.coalesce("n_bigrams", F.lit(0)) == 0, F.lit(0))
            .otherwise(
                F.expr("(1000000 * n_known) div n_bigrams")
            )
            .cast("long")
            .alias("hit_micros"),
        )
    )


def bigram_next_topk(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    min_count: int = 2,
) -> DataFrame:
    """(w1, w2, n_pairs, rn) — the k most frequent next-tokens per word,
    (count DESC, w2 ASC) tie-break; rare pairs (< min_count) dropped
    BEFORE ranking so the table stays vocabulary-sized."""
    counts = bigram_counts(docs, text_col, min_count)
    w = Window.partitionBy("w1").orderBy(F.col("n_pairs").desc(), F.col("w2").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("w1", "w2", "n_pairs", F.col("rn").cast("long").alias("rn"))
    )


def doc_lm_cost(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_bigrams, sum_cost_micros, avg_cost_micros) — per-
    document cost under the add-one-smoothed corpus bigram model: each
    ordered bigram costs ``-ln p(w2|w1)`` with
    ``p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V)`` (V = corpus vocabulary
    size), i.e. the CCNet-style perplexity filter with counts in place
    of a trained LM — perplexity is ``exp(avg_cost_micros / 1e6)``.

    Exactness discipline (same as tf_idf/adamic_adar): the cost is
    rounded ONCE per distinct corpus bigram to integer micro-nats
    (``round(1e6 * ln((c1 + V) / (c12 + 1)))`` — both operands exact
    BIGINTs, so the double quotient is engine-identical); per-document
    totals are then BIGINT sums and the average an exact integer
    division — no summation-order float drift anywhere.

    Scale shape: the model table is observed-bigram-sized (vocab-ish,
    not corpus-sized); V folds in as a literal (one count action, the
    tf_idf N pattern); per-(doc, pair) multiplicities map-side combine
    before the pair-keyed model join; one map-side-combined per-doc sum.
    Scoring a held-out corpus against a frozen model is the same join
    with ``docs`` swapped for the held-out frame (unseen bigrams would
    need the left-join backoff row — this corpus-self-scoring variant
    keeps the inner join because every document bigram is by
    construction in the model)."""
    vocab_size = (
        docs.select(F.explode(tokens_expr(text_col)).alias("tok"))
        .select("tok")
        .distinct()
        .count()
    )
    t = tokens_expr(text_col)
    idx = F.sequence(F.lit(1), F.size(t) - 1)
    pairs = F.when(
        F.size(t) >= 2,
        F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(t, i).alias("w1"),
                F.element_at(t, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = docs.select(F.col(id_col), F.explode(pairs).alias("p")).select(
        id_col, "p.w1", "p.w2"
    )
    per_pair = bg.groupBy(id_col, "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    c12 = bigram_counts(docs, text_col, min_count=1).withColumnRenamed(
        "n_pairs", "n12"
    )
    c1 = c12.groupBy("w1").agg(F.sum("n12").cast("long").alias("n1"))
    model = c12.join(c1, "w1").select(
        "w1",
        "w2",
        F.round(
            F.lit(1_000_000.0)
            * F.log(
                (F.col("n1") + F.lit(vocab_size)).cast("double")
                / (F.col("n12") + F.lit(1.0))
            )
        )
        .cast("long")
        .alias("cost"),
    )
    per_doc = (
        per_pair.join(model, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.sum("m").cast("long").alias("n_bigrams"),
            F.sum(F.col("m") * F.col("cost")).cast("long").alias("sum_cost"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("sum_cost", F.lit(0))
            .cast("long")
            .alias("sum_cost_micros"),
            F.when(F.coalesce("n_bigrams", F.lit(0)) == 0, F.lit(0))
            .otherwise(F.expr("sum_cost div n_bigrams"))
            .cast("long")
            .alias("avg_cost_micros"),
        )
    )


def kneser_ney_bigram(
    docs: DataFrame,
    top: int = 50,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """(w1, w2, n_pairs, n1_fwd, n1_rev, p_kn) — interpolated Kneser–Ney
    bigram probabilities (Kneser & Ney 1995; Chen & Goodman 1998, public
    literature) with absolute discount D = 0.75, for the ``top`` most
    frequent bigrams (ties (n_pairs DESC, w1, w2)):

        p_kn(w2|w1) = (c(w1,w2) - D) / c(w1·)
                    + (D · N1+(w1·) / c(w1·)) · (N1+(·w2) / N1+(··))

    — the smoothing every count-based LM ships with, and the corpus
    readout that separates genuinely-productive continuations from
    boilerplate (a high-count bigram whose w2 has tiny continuation
    probability N1+(·w2)/N1+(··) is template spam).  KN statistics come
    from ALL bigrams; ``min_count`` only gates the output rows.

    Float discipline: every count is an exact BIGINT; D = 0.75 is
    exactly representable in binary; the probability is ONE fixed
    expression tree over exact-integer inputs — identical association
    in both engines, so the final ``round(·, 6)`` cannot diverge (the
    repo's recall/ratio rule; no float summation order anywhere).

    Scale shape: bigram extraction is :func:`bigram_counts`' pure
    codegen expression; the statistics are three map-side-combined
    groupBys (pair counts, per-w1 totals + distinct continuations,
    per-w2 distinct left contexts) joined back on their keys; N1+(··)
    is ONE scalar action riding in as a literal (the tf_idf N pattern);
    the output is a global TakeOrderedAndProject over ``top`` rows."""
    bg = bigram_counts(docs, text_col=text_col, min_count=1)
    tot = bg.groupBy("w1").agg(
        F.sum("n_pairs").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("n1_fwd"),
    )
    n1r = bg.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1_rev")
    )
    nbt = bg.count()
    p = (
        (F.col("n_pairs").cast("double") - F.lit(0.75)) / F.col("tot")
        + ((F.lit(0.75) * F.col("n1_fwd")) / F.col("tot"))
        * (F.col("n1_rev").cast("double") / F.lit(float(nbt)))
    )
    return (
        bg.join(tot, "w1")
        .join(n1r, "w2")
        .where(F.col("n_pairs") >= min_count)
        .select(
            "w1", "w2", "n_pairs", "n1_fwd", "n1_rev",
            F.round(p, 6).alias("p_kn"),
        )
        .orderBy(F.col("n_pairs").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(top)
    )


def lm_heldout_nll(
    docs: DataFrame,
    test_mod: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row (n_train_docs, n_test_docs, n_bigrams, n_unseen,
    avg_nll_micros) — PROPER held-out evaluation of the add-one-
    smoothed corpus bigram model: train on the ~(1−1/test_mod) hash
    split, score the held-out docs' bigrams with the left-join
    backoff (unseen pair under a seen history costs ln(c(w1)+V);
    unseen history costs ln V) — the number :func:`doc_lm_cost`
    cannot give (its self-scoring corpus sees every bigram by
    construction), and the honest basis for a perplexity-filter
    threshold.  Perplexity = exp(avg_nll_micros/10⁶).

    Split: hash48('lmsplit:' || doc_id) % test_mod = 0 → test —
    deterministic, engine-identical.  Costs are rounded ONCE per
    distinct (w1, w2) pair of the TEST corpus (both ln operands exact
    BIGINTs — the doc_lm_cost discipline); totals are exact integer
    sums with one truncating mean.

    Scale shape: the doc_lm_cost shape plus one hash filter — the
    model is observed-bigram-sized, V a literal, the scoring join
    pair-keyed with per-(doc,pair) multiplicities combined first."""
    from graphlite_spark.functions.hashes import hash48

    tagged = docs.withColumn(
        "_is_test",
        hash48(
            F.concat(F.lit("lmsplit:"), F.col(id_col).cast("string"))
        )
        % test_mod
        == 0,
    )
    train = tagged.where(~F.col("_is_test"))
    test = tagged.where(F.col("_is_test"))
    vocab_size = (
        train.select(F.explode(tokens_expr(text_col)).alias("tok"))
        .select("tok")
        .distinct()
        .count()
    )

    def _pairs(frame: DataFrame) -> DataFrame:
        t = tokens_expr(text_col)
        idx = F.sequence(F.lit(1), F.size(t) - 1)
        p = F.when(
            F.size(t) >= 2,
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(t, i).alias("w1"),
                    F.element_at(t, i + 1).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        return frame.select(
            F.col(id_col), F.explode(p).alias("p")
        ).select(id_col, "p.w1", "p.w2")

    c12 = _pairs(train).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n12")
    )
    c1 = c12.groupBy("w1").agg(F.sum("n12").cast("long").alias("n1"))
    tp = _pairs(test).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    scored = (
        tp.join(c12, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .select(
            "m",
            (F.col("n12").isNull()).cast("long").alias("unseen"),
            F.round(
                F.lit(1_000_000.0)
                * F.log(
                    (
                        F.coalesce(F.col("n1"), F.lit(0))
                        + F.lit(vocab_size)
                    ).cast("double")
                    / (F.coalesce(F.col("n12"), F.lit(0)) + F.lit(1.0))
                )
            ).cast("long").alias("cost"),
        )
    )
    nd = tagged.agg(
        F.sum((~F.col("_is_test")).cast("long")).cast("long").alias(
            "n_train_docs"
        ),
        F.sum(F.col("_is_test").cast("long")).cast("long").alias(
            "n_test_docs"
        ),
    )
    agg = scored.agg(
        F.coalesce(F.sum("m"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce(F.sum(F.col("m") * F.col("unseen")), F.lit(0))
        .cast("long").alias("n_unseen"),
        F.coalesce(F.sum(F.col("m") * F.col("cost")), F.lit(0))
        .cast("long").alias("tot"),
    )
    return nd.crossJoin(F.broadcast(agg)).select(
        "n_train_docs", "n_test_docs", "n_bigrams", "n_unseen",
        F.when(
            F.col("n_bigrams") > 0, F.expr("tot div n_bigrams")
        ).otherwise(F.lit(0)).cast("long").alias("avg_nll_micros"),
    )


def source_cross_entropy(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(eval_source, model_source, n_bigrams, avg_nll_micros) — the
    full K×K domain cross-entropy matrix: every source's text scored
    under every source's add-one-smoothed bigram model (diagonal =
    self-entropy).  THE similarity table a pre-training mixture
    designer reads — low off-diagonal cross-entropy = the domains
    share a language model and can substitute for each other;
    asymmetry (A models B better than B models A) shows containment.
    The LM-space companion to :func:`~graphlite_spark.operators
    .tfidf.burrows_delta` (style z-scores) and source_jsd (unigram
    mix).

    Exactness: the lm_heldout_nll discipline per (model, pair) cell —
    one identically-shaped ln over exact BIGINTs (per-model vocab V
    rides as a JOINED column, no collect), rounded once, exact sums,
    truncating means.

    Scale shape: model tables are observed-bigram-sized per source;
    the scoring join is eval-pair × K-model fan-out with two
    pair-keyed left joins — K² cells out, nothing corpus-scale after
    the first groupBy."""
    t = tokens_expr(text_col)
    idx = F.sequence(F.lit(1), F.size(t) - 1)
    p = F.when(
        F.size(t) >= 2,
        F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(t, i).alias("w1"),
                F.element_at(t, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = docs.select(
        F.col(source_col).alias("s"), F.explode(p).alias("p")
    ).select("s", "p.w1", "p.w2")
    c12 = bg.groupBy("s", "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n12")
    )
    c1 = c12.groupBy("s", "w1").agg(
        F.sum("n12").cast("long").alias("n1")
    )
    vm = (
        docs.select(
            F.col(source_col).alias("s"),
            F.explode(tokens_expr(text_col)).alias("tok"),
        )
        .groupBy("s")
        .agg(F.countDistinct("tok").cast("long").alias("v"))
    )
    tp = c12.select(
        F.col("s").alias("se"), "w1", "w2", F.col("n12").alias("m")
    )
    models = vm.select(F.col("s").alias("sm"), "v")
    scored = (
        tp.crossJoin(F.broadcast(models))
        .join(
            c12.select(
                F.col("s").alias("sm"), "w1", "w2",
                F.col("n12").alias("mn12"),
            ),
            ["sm", "w1", "w2"],
            "left",
        )
        .join(
            c1.select(
                F.col("s").alias("sm"), "w1", F.col("n1").alias("mn1")
            ),
            ["sm", "w1"],
            "left",
        )
        .select(
            "se", "sm", "m",
            F.round(
                F.lit(1_000_000.0)
                * F.log(
                    (
                        F.coalesce(F.col("mn1"), F.lit(0)) + F.col("v")
                    ).cast("double")
                    / (F.coalesce(F.col("mn12"), F.lit(0)) + F.lit(1.0))
                )
            ).cast("long").alias("cost"),
        )
    )
    return (
        scored.groupBy(
            F.col("se").alias("eval_source"),
            F.col("sm").alias("model_source"),
        )
        .agg(
            F.sum("m").cast("long").alias("n_bigrams"),
            F.expr("sum(m * cost) div sum(m)").cast("long").alias(
                "avg_nll_micros"
            ),
        )
    )
