"""In-engine supervised classification — train AND apply as one plan.

Naive Bayes over binary stopword-presence features: the whole
train/score/evaluate loop expressed declaratively (no collect between
train and apply — the parameter table is a codebook-sized broadcast),
demonstrating that simple supervised models are first-class engine
queries, not an export-to-sklearn detour.  Bernoulli NB with Laplace
smoothing is public-textbook material (McCallum & Nigam 1998's event
models); everything rides the repo's exact-integer discipline so the
DuckDB oracle hashes bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphlite_spark.functions.text import STOPWORDS, tokens_expr


def naive_bayes_predictions(
    docs: DataFrame,
    label_values: tuple[str, ...] = ("de", "en", "es", "fr", "zh"),
    label_col: str = "lang",
    words: tuple[str, ...] = tuple(STOPWORDS),
) -> DataFrame:
    """(doc_id, true_label, pred_label) — Bernoulli naive-Bayes language
    ID trained on the even-``doc_id`` half, per-doc predictions on the
    odd half.  Features are presence bits of the
    ``words`` lexicon in the standard token set; parameters are
    Laplace-smoothed exact micros (``p1 = (present+1)·10^6 div
    (n_label+2)``, prior = ``(n_label+1)·10^6 div (n_train+L)``), and a
    document's per-label score is the word-order fold

        s ← (s · q_w) div 10^6,   q_w = present ? p1 : 10^6 − p1

    starting from ``prior · 10^6`` — every step an exact integral
    ``div`` (products ≤ 10^18, inside BIGINT), so the argmax (ties →
    lexicographically larger label, via struct max) is bit-stable
    across engines.  Docs whose label is outside ``label_values`` are
    excluded from both halves (stated).

    Scale shape: training is ONE map-side-combined groupBy producing an
    L-row parameter table that broadcasts into the scoring cross join
    (L small by construction); scoring is pure per-row codegen — 10
    chained projections keep the fold linear, never an exploding
    expression tree."""
    L = len(label_values)
    toks = docs.where(
        F.col(label_col).isin(*label_values)
    ).select(
        "doc_id",
        F.col(label_col).alias("y"),
        tokens_expr("text").alias("toks"),
    )
    feats = toks.select(
        "doc_id", "y",
        *[
            F.array_contains("toks", w).cast("int").alias(f"b{i}")
            for i, w in enumerate(words)
        ],
    )
    train = feats.where(F.col("doc_id") % 2 == 0)
    test = feats.where(F.col("doc_id") % 2 == 1)

    per = train.groupBy("y").agg(
        F.count(F.lit(1)).cast("long").alias("nl"),
        *[
            F.sum(f"b{i}").cast("long").alias(f"c{i}")
            for i in range(len(words))
        ],
    )
    ntr = train.agg(F.count(F.lit(1)).cast("long").alias("ntr"))
    params = per.crossJoin(F.broadcast(ntr)).select(
        "y",
        F.expr(f"((nl + 1) * 1000000) div (ntr + {L})")
        .cast("long").alias("prior"),
        *[
            F.expr(f"((c{i} + 1) * 1000000) div (nl + 2)")
            .cast("long").alias(f"p{i}")
            for i in range(len(words))
        ],
    )

    scored = test.crossJoin(
        F.broadcast(params.withColumnRenamed("y", "cand"))
    ).select(
        "doc_id",
        F.col("y").alias("true_label"),
        "cand",
        (F.col("prior") * F.lit(1_000_000).cast("long")).alias("s"),
        *[
            F.when(F.col(f"b{i}") == 1, F.col(f"p{i}"))
            .otherwise(F.lit(1_000_000) - F.col(f"p{i}"))
            .cast("long")
            .alias(f"q{i}")
            for i in range(len(words))
        ],
    )
    for i in range(len(words)):
        keep = ["doc_id", "true_label", "cand"] + [
            f"q{j}" for j in range(i + 1, len(words))
        ]
        scored = scored.select(
            *keep, F.expr(f"(s * q{i}) div 1000000").alias("s")
        )
    pred = scored.groupBy("doc_id", "true_label").agg(
        F.max(F.struct("s", "cand")).alias("m")
    )
    return pred.select(
        "doc_id", "true_label", F.col("m.cand").alias("pred_label")
    )


def naive_bayes_confusion(
    docs: DataFrame,
    label_values: tuple[str, ...] = ("de", "en", "es", "fr", "zh"),
    label_col: str = "lang",
    words: tuple[str, ...] = tuple(STOPWORDS),
) -> DataFrame:
    """(true_label, pred_label, n) — the confusion-matrix rollup of
    :func:`naive_bayes_predictions` (which carries the full method
    docstring); split so per-doc predictions are reusable (McNemar)."""
    return naive_bayes_predictions(
        docs, label_values=label_values, label_col=label_col, words=words
    ).groupBy("true_label", "pred_label").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def cohens_kappa_langid(
    docs: DataFrame,
    label_values: tuple[str, ...] = ("de", "en", "es", "fr", "zh"),
) -> DataFrame:
    """One row (n_eval, n_agree, po_micros, pe_micros, kappa_micros) —
    Cohen's kappa (Cohen 1960, public literature) of the
    :func:`naive_bayes_confusion` classifier against the true labels:
    chance-corrected agreement κ = (p_o − p_e)/(1 − p_e), where p_e is
    the marginal-product expected agreement.  Raw accuracy (the
    confusion diagonal) flatters a classifier on a skewed label mix;
    kappa is the standard correction, and closes the eval loop the
    confusion matrix opens.

    Exactness: with N docs, diag agreements and Σ r_l·c_l (row × column
    marginal products) all exact BIGINTs, κ = (N·diag − Σrc)/(N² − Σrc)
    lands in micros via the remainder-subtract truncating division
    (numerator may be negative — worse-than-chance classifiers exist);
    p_o = (10⁶·diag) div N and p_e = (10⁶·Σrc) div N² likewise.
    BIGINT bound: 10⁶·N² — exact through N ≈ 3M eval docs (stated).

    Scale shape: everything after the confusion matrix lives on an
    L×L table (L = |label_values|); the matrix itself is the
    broadcast-scoring shape documented on naive_bayes_confusion."""
    conf = naive_bayes_confusion(docs, label_values=label_values)
    r = conf.groupBy(F.col("true_label").alias("l")).agg(
        F.sum("n").cast("long").alias("r")
    )
    c = conf.groupBy(F.col("pred_label").alias("l")).agg(
        F.sum("n").cast("long").alias("c")
    )
    marg = r.join(c, "l", "full").select(
        F.coalesce("r", F.lit(0)).cast("long").alias("r"),
        F.coalesce("c", F.lit(0)).cast("long").alias("c"),
    )
    rc = marg.agg(
        F.sum(F.col("r") * F.col("c")).cast("long").alias("sum_rc"),
        F.sum("r").cast("long").alias("nn"),
    )
    diag = conf.agg(
        F.sum(
            F.when(
                F.col("true_label") == F.col("pred_label"), F.col("n")
            ).otherwise(F.lit(0))
        ).cast("long").alias("n_agree")
    )
    num = (
        F.lit(1_000_000)
        * (F.col("nn") * F.col("n_agree") - F.col("sum_rc"))
    )
    den = F.col("nn") * F.col("nn") - F.col("sum_rc")
    return diag.crossJoin(F.broadcast(rc)).select(
        F.col("nn").alias("n_eval"),
        "n_agree",
        F.expr("(1000000 * n_agree) div nn").cast("long").alias(
            "po_micros"
        ),
        F.expr("(1000000 * sum_rc) div (nn * nn)").cast("long").alias(
            "pe_micros"
        ),
        F.when(
            den > 0, ((num - num % den) / den).cast("long")
        ).alias("kappa_micros"),
    )


def mcnemar_langid(
    docs: DataFrame,
    label_values: tuple[str, ...] = ("de", "en", "es", "fr", "zh"),
    label_col: str = "lang",
) -> DataFrame:
    """One row (n_eval, n_b, n_c, mcnemar_micros) — McNemar's paired
    test (McNemar 1947, public literature) comparing the naive-Bayes
    language ID against the MAJORITY-CLASS baseline on the same eval
    docs: only the discordant pairs matter — n_b = docs NB gets right
    and the baseline wrong, n_c = the reverse — and
    χ² = (b − c)²/(b + c).  The paired companion to
    :func:`cohens_kappa_langid` (kappa scores ONE classifier against
    truth; McNemar decides whether one classifier BEATS another on the
    same items, which pooled accuracies cannot).

    The baseline predicts the most frequent TRAINING label for every
    doc (ties → lexicographically larger label, the shared struct-max
    convention).

    Exactness: (b − c)² ≥ 0, so the final statistic is one plain
    truncating micros division of exact BIGINT counts; NULL when the
    two classifiers never disagree (b + c = 0).

    Scale shape: per-doc predictions are the broadcast-scoring shape
    documented on naive_bayes_predictions; the baseline is a 1-row
    broadcast; the rollup one map-side-combined aggregate."""
    preds = naive_bayes_predictions(docs, label_values=label_values,
                                    label_col=label_col)
    maj = (
        docs.where(F.col(label_col).isin(*label_values))
        .where(F.col("doc_id") % 2 == 0)
        .groupBy(F.col(label_col).alias("l"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .agg(F.max(F.struct("n", "l")).alias("m"))
        .select(F.col("m.l").alias("baseline"))
    )
    flags = preds.crossJoin(F.broadcast(maj)).select(
        (F.col("pred_label") == F.col("true_label")).cast("int").alias(
            "a_ok"
        ),
        (F.col("baseline") == F.col("true_label")).cast("int").alias(
            "b_ok"
        ),
    )
    agg = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.sum(
            ((F.col("a_ok") == 1) & (F.col("b_ok") == 0)).cast("long")
        ).cast("long").alias("n_b"),
        F.sum(
            ((F.col("a_ok") == 0) & (F.col("b_ok") == 1)).cast("long")
        ).cast("long").alias("n_c"),
    )
    return agg.select(
        "n_eval", "n_b", "n_c",
        F.when(
            F.col("n_b") + F.col("n_c") > 0,
            F.expr(
                "(1000000 * (n_b - n_c) * (n_b - n_c))"
                " div (n_b + n_c)"
            ).cast("long"),
        ).alias("mcnemar_micros"),
    )


def naive_bayes_calibration(
    docs: DataFrame,
    label_values: tuple[str, ...] = ("de", "en", "es", "fr", "zh"),
    label_col: str = "lang",
    words: tuple[str, ...] = tuple(STOPWORDS),
    n_bins: int = 10,
) -> DataFrame:
    """(bin, n_docs, avg_conf_micros, acc_micros, gap_micros) — the
    reliability diagram / Expected-Calibration-Error decomposition of
    the Bernoulli naive-Bayes language-ID classifier: per-doc
    confidence = the winning label's normalized posterior share
    (exact micros — the scores are already integer products), binned
    into ``n_bins`` equal-width buckets; per bin the mean stated
    confidence vs the realized accuracy.  |gap| summed with n/N
    weights is ECE — is the classifier's 90% as good as its word?
    The companion :func:`naive_bayes_confusion` says WHAT it gets
    wrong; this says whether its confidence can be TRUSTED (the
    quality-weighted-sampling question).

    Exactness: identical train/score fold as
    :func:`naive_bayes_predictions` (same split, parameters,
    truncating fold, (s, cand) struct-max tie rule); confidence is
    (10⁶·s_max) div Σs, bin = min(conf div (10⁶/n_bins), n_bins−1),
    and every per-bin statistic is a truncating integer division.

    Scale shape: the prediction shape plus one per-doc window-free
    groupBy (max-struct + sum) and an n_bins-row rollup."""
    L = len(label_values)
    toks = docs.where(
        F.col(label_col).isin(*label_values)
    ).select(
        "doc_id",
        F.col(label_col).alias("y"),
        tokens_expr("text").alias("toks"),
    )
    feats = toks.select(
        "doc_id", "y",
        *[
            F.array_contains("toks", w).cast("int").alias(f"b{i}")
            for i, w in enumerate(words)
        ],
    )
    train = feats.where(F.col("doc_id") % 2 == 0)
    test = feats.where(F.col("doc_id") % 2 == 1)
    per = train.groupBy("y").agg(
        F.count(F.lit(1)).cast("long").alias("nl"),
        *[
            F.sum(f"b{i}").cast("long").alias(f"c{i}")
            for i in range(len(words))
        ],
    )
    ntr = train.agg(F.count(F.lit(1)).cast("long").alias("ntr"))
    params = per.crossJoin(F.broadcast(ntr)).select(
        "y",
        F.expr(f"((nl + 1) * 1000000) div (ntr + {L})")
        .cast("long").alias("prior"),
        *[
            F.expr(f"((c{i} + 1) * 1000000) div (nl + 2)")
            .cast("long").alias(f"p{i}")
            for i in range(len(words))
        ],
    )
    scored = test.crossJoin(
        F.broadcast(params.withColumnRenamed("y", "cand"))
    ).select(
        "doc_id",
        F.col("y").alias("true_label"),
        "cand",
        (F.col("prior") * F.lit(1_000_000).cast("long")).alias("s"),
        *[
            F.when(F.col(f"b{i}") == 1, F.col(f"p{i}"))
            .otherwise(F.lit(1_000_000) - F.col(f"p{i}"))
            .cast("long")
            .alias(f"q{i}")
            for i in range(len(words))
        ],
    )
    for i in range(len(words)):
        keep = ["doc_id", "true_label", "cand"] + [
            f"q{j}" for j in range(i + 1, len(words))
        ]
        scored = scored.select(
            *keep, F.expr(f"(s * q{i}) div 1000000").alias("s")
        )
    perdoc = scored.groupBy("doc_id", "true_label").agg(
        F.max(F.struct("s", "cand")).alias("m"),
        F.sum("s").cast("long").alias("ssum"),
    )
    width = 1_000_000 // n_bins
    conf = perdoc.select(
        (F.col("m.cand") == F.col("true_label")).cast("long").alias(
            "correct"
        ),
        F.when(
            F.col("ssum") > 0,
            F.expr("(1000000 * m.s) div ssum"),
        ).otherwise(F.lit(0)).cast("long").alias("conf"),
    )
    return (
        conf.select(
            "correct", "conf",
            F.least(
                F.expr(f"conf div {width}"), F.lit(n_bins - 1)
            ).cast("int").alias("bin"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr("sum(conf) div count(*)").cast("long").alias(
                "avg_conf_micros"
            ),
            F.expr("(1000000 * sum(correct)) div count(*)")
            .cast("long").alias("acc_micros"),
        )
        .select(
            "bin", "n_docs", "avg_conf_micros", "acc_micros",
            F.abs(
                F.col("acc_micros") - F.col("avg_conf_micros")
            ).cast("long").alias("gap_micros"),
        )
    )
