"""Dataset assembly: sampling, sequence packing, vocabulary construction.

``pack_documents`` produces the GPT-style packing manifest: documents are
concatenated per shard in doc_id order and sliced into fixed
``max_tokens`` context windows; the manifest records each document's
token span in the shard stream and which windows it touches (documents
straddle window boundaries — that IS concat-and-slice packing; pipelines
that forbid straddling read ``first_bin != last_bin`` from this same
manifest and re-cut).  Scale shape: the only window is
``partitionBy(shard)`` — shard count is a knob (≈ one shard per
executor-task's worth of docs at scale), so no global ordering, no
single-partition window; everything else is expression-only.

``build_vocab`` assigns dense integer ids to terms by global frequency
rank — the token→id table an embedding/tokenizer pipeline trains
against.  The ranking reuses :func:`assign_dense_ids` (range shuffle +
per-partition offsets), so a 10^8-term vocabulary never funnels through
a single-partition ``row_number`` window.

Both outputs are integer-exact, making the DuckDB oracles hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphlite_spark.functions.hashes import hash48
from graphlite_spark.functions.text import tokens_expr


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum sampling: a row survives iff
    ``hash48(salt ':' key) < rate(stratum) * 2^48``.

    The downsampling/upweighting step every corpus mix runs (keep 100%
    of code, 10% of crawl, ...), expressed as a pure FILTER: no shuffle,
    no RNG state, fully pushdown-friendly, and the kept set is a
    function of (salt, key) alone — stable across runs, engines, and
    partitionings, and composable (the same salt samples consistently
    across derived tables sharing the key).  Rates are exact to 2^-48."""
    expr = None
    for stratum, rate in rates.items():
        t = F.lit(int(rate * (1 << 48)))
        cond = F.col(strata_col) == stratum
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    thresh = (
        expr.otherwise(F.lit(int(default_rate * (1 << 48))))
        if expr is not None
        else F.lit(int(default_rate * (1 << 48)))
    )
    h = hash48(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string")))
    return df.where(h < thresh)


def pack_documents(
    docs: DataFrame,
    max_tokens: int = 512,
    num_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, shard, n_tokens, start_tok, end_tok, first_bin, last_bin)
    — the packing manifest.  ``shard = hash48(doc_id) mod num_shards``
    balances docs across shards deterministically; within a shard, docs
    concatenate in doc_id order; ``[start_tok, end_tok)`` is the doc's
    token span in the shard stream and ``first_bin``/``last_bin`` the
    ``max_tokens``-sized context windows its first/last token land in.
    Token-less docs carry nothing into the stream and are excluded."""
    if max_tokens < 1 or num_shards < 1:
        raise ValueError("max_tokens and num_shards must be >= 1")
    nt = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_expr(text_col)).cast("long").alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    sh = nt.withColumn(
        "shard", hash48(F.col("doc_id").cast("string")) % num_shards
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    c = sh.withColumn("end_tok", F.sum("n_tokens").over(w))
    return c.select(
        "doc_id",
        "shard",
        "n_tokens",
        (F.col("end_tok") - F.col("n_tokens")).alias("start_tok"),
        "end_tok",
        F.expr(f"(end_tok - n_tokens) div {max_tokens}").alias("first_bin"),
        F.expr(f"(end_tok - 1) div {max_tokens}").alias("last_bin"),
    )


def build_vocab(
    docs: DataFrame,
    text_col: str = "text",
    min_df: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """(term, tf_total, df, vocab_id) — dense term ids by global
    frequency rank (tf_total DESC, term ASC as the deterministic
    tie-break), computed with the distributed dense-id machinery.

    Two map-side-combined aggregations (per-doc term counts, then global
    term totals) and one range shuffle for the rank — no global window
    anywhere, so a web-scale vocabulary ranks without a single-task
    bottleneck."""
    from graphlite_spark.plans.derive import assign_dense_ids

    per_doc = (
        docs.select(
            F.col("doc_id"), F.explode(tokens_expr(text_col)).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    terms = (
        per_doc.groupBy("term")
        .agg(
            F.sum("c").cast("long").alias("tf_total"),
            F.count(F.lit(1)).cast("long").alias("df"),
        )
        .where(F.col("df") >= min_df)
    )
    ranked = assign_dense_ids(
        terms.withColumn("neg_tf", -F.col("tf_total")),
        ["neg_tf", "term"],
        id_col="vocab_id",
        num_partitions=num_partitions,
    )
    return ranked.select("term", "tf_total", "df", "vocab_id")


def mixture_targets(
    weights: dict[str, int], total: int
) -> dict[str, int]:
    """Largest-remainder apportionment of ``total`` rows across strata
    with integer weights: floor shares first, then one extra row per
    stratum in remainder-DESC (stratum-ASC tie) order until the targets
    sum to exactly ``total``.  Pure integer arithmetic — a function of
    the mixture config alone, independent of the data."""
    if total < 0:
        raise ValueError("total must be >= 0")
    wsum = sum(weights.values())
    if wsum <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative with a positive sum")
    base = {s: (w * total) // wsum for s, w in weights.items()}
    rem = {s: w * total - base[s] * wsum for s, w in weights.items()}
    extras = total - sum(base.values())
    for s in sorted(weights, key=lambda s: (-rem[s], s))[:extras]:
        base[s] += 1
    return base


def mix_corpus(
    docs: DataFrame,
    strata_col: str,
    weights: dict[str, int],
    total: int,
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """(key, stratum, mix_rank) — an EXACT-count corpus mixture: the
    ``mixture_targets`` share of each stratum, filled with that stratum's
    rows in deterministic hash48(salt:key) order (key ASC tie-break).
    An under-populated stratum yields fewer rows than its target — the
    caller sees the shortfall instead of silent substitution.

    Contrast with :func:`sample_stratified`: the threshold filter gives
    EXPECTED proportions with zero shuffle (the 100 TB first pass); this
    gives exact row counts via one per-stratum rank — use it for the
    final fixed-size mixture (strata there are the handful of named
    sources, so the per-stratum window partitions are as wide as the
    cluster; for a single colossal stratum, thin first with
    sample_stratified, then exact-cut here)."""
    targets = mixture_targets(weights, total)
    expr = None
    for stratum, t in targets.items():
        cond = F.col(strata_col) == stratum
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    if expr is None:
        raise ValueError("weights must name at least one stratum")
    h = hash48(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy("h", key_col)
    return (
        docs.select(
            F.col(key_col), F.col(strata_col), h.alias("h"),
            expr.otherwise(F.lit(0)).alias("target"),
        )
        .withColumn("mix_rank", F.row_number().over(w).cast("long"))
        .where(F.col("mix_rank") <= F.col("target"))
        .select(key_col, strata_col, "mix_rank")
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """(id_col, weight, priority_micros) — a DETERMINISTIC
    weight-proportional sample of ``n`` rows without replacement
    (Efraimidis & Spirakis 2006, public literature): each row draws the
    hash-derived uniform u = (hash48(salt:id)+1) / 2^48 and keeps
    priority ln(u) / w — the top-n priorities are exactly an
    E-S weighted sample, but the "randomness" is the repo-wide shared
    md5, so both engines select the identical rows.  The priority is
    micro-unit-rounded per row BEFORE ranking (the repo's float
    discipline — ln enters exactly as in tf_idf/powerlaw_alpha); ties
    break on id.  Rows with weight <= 0 never qualify.

    Scale shape: one expression pass + one TakeOrderedAndProject
    (partial top-n on every partition before the single reduce) — no
    window, no full sort.  The length-proportional corpus subsample a
    training-mix pipeline draws, made reproducible."""
    from graphlite_spark.functions.hashes import hash48

    u = (
        hash48(
            F.concat_ws(
                ":", F.lit(salt), F.col(id_col).cast("string")
            )
        )
        + 1
    ).cast("double") / F.lit(float(1 << 48))
    pri = F.round(
        F.log(u) / F.col(weight_col).cast("double") * 1_000_000
    ).cast("long")
    return (
        df.where(F.col(weight_col) > 0)
        .select(
            F.col(id_col),
            F.col(weight_col).cast("long").alias("weight"),
            pri.alias("priority_micros"),
        )
        .orderBy(F.desc("priority_micros"), F.asc(id_col))
        .limit(n)
    )


def assign_splits(
    df: DataFrame,
    key_col: str,
    splits: tuple = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    salt: str = "split",
) -> DataFrame:
    """All input columns plus ``split`` — the deterministic train/val/
    test assignment: the key's 48-bit hash against CUMULATIVE fraction
    thresholds (the last split absorbs the rounding tail).  Like
    sample_stratified, membership is a pure function of (salt, key):
    stable across runs, engines and partitionings, leakage-safe across
    derived tables sharing the key (a document and its chunks land in
    the same split), and re-splittable by salt.

    Scale shape: one codegen CASE over a hash — no shuffle, no RNG
    state, nothing to persist."""
    h = hash48(
        F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string"))
    )
    expr = None
    cum = 0.0
    for name, frac in splits[:-1]:
        cum += frac
        cond = h < F.lit(int(cum * (1 << 48)))
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = splits[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", split)


def curriculum_order(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, quality, order_idx) — a deterministic GLOBAL
    training order: highest-quality documents first (ties by id), the
    curriculum / data-ordering step between curation and packing.

    The rank rides the repo's distributed dense-id machinery (one
    range shuffle + a P-row collect — never a single-partition
    window); the sort key is the 6dp-rounded quality score, identical
    on both engines, so the order index is hash-exact."""
    from graphlite_spark.functions.text import quality_exprs, tokens_expr
    from graphlite_spark.plans.derive import assign_dense_ids

    q = quality_exprs(tokens_expr(text_col))
    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        q["n_tokens"].alias("n_tokens"),
        q["quality"].alias("quality"),
    ).withColumn("neg_q", -F.col("quality"))
    ranked = assign_dense_ids(scored, ["neg_q", "doc_id"], id_col="order_idx")
    return ranked.select("doc_id", "n_tokens", "quality", "order_idx")


def quality_calibrated(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """(doc_id, <group>, quality, pct_micros) — per-group percentile
    calibration of the quality score: ``pct_micros`` is the document's
    rank position within its group scaled to [0, 1e6] (ascending — the
    group's best document scores 1e6; singleton groups score 0).  The
    curation step that makes one quality threshold fair ACROSS groups
    (a 90th-percentile French doc survives the same cut as a
    90th-percentile English doc) instead of letting the absolute score
    distribution of the dominant language set the bar.

    Exactness: rank key is (group, 6dp quality, doc_id) — engine-
    identical — and the percentile is one integer division.

    Scale shape: ONE distributed dense-id rank with the group as the
    leading sort key; within-group position is then ``global_rank −
    min(global_rank of the group)``, recovered via a G-row broadcast
    (per-group min + count) — no per-group window, so a language with
    10^10 documents never lands on a single reducer."""
    from graphlite_spark.functions.text import quality_exprs, tokens_expr
    from graphlite_spark.plans.derive import assign_dense_ids

    q = quality_exprs(tokens_expr(text_col))
    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col),
        q["quality"].alias("quality"),
    )
    ranked = assign_dense_ids(
        scored, [group_col, "quality", "doc_id"], id_col="grank"
    )
    gc = ranked.groupBy(group_col).agg(
        F.min("grank").alias("goff"),
        F.count(F.lit(1)).cast("long").alias("gn"),
    )
    return ranked.join(F.broadcast(gc), group_col).select(
        "doc_id",
        group_col,
        "quality",
        F.expr("((grank - goff) * 1000000) div greatest(gn - 1, 1)")
        .cast("long")
        .alias("pct_micros"),
    )


def vocab_coverage(
    docs: DataFrame,
    cutoffs: tuple[int, ...] = (256, 1024, 4096, 16384),
    text_col: str = "text",
) -> DataFrame:
    """(vocab_size, n_types, covered_tokens, coverage_micros) — corpus
    token coverage of the top-V frequency-ranked vocabulary at each
    cutoff V (coverage = covered div total in micros; 1e6 − coverage is
    the OOV rate): the tokenizer/vocab-design readout that says how big
    a word-level vocabulary must be before the UNK rate is acceptable.

    Exactness: integer token counts and one division per cutoff row.
    Scale shape: rides :func:`build_vocab`'s distributed frequency rank
    (no global window); each vocabulary row then fans out ONLY to the
    cutoffs it falls under (≤ len(cutoffs) rows, a literal-array filter
    + explode inside codegen) and one map-side-combined groupBy(cutoff)
    reduces to len(cutoffs) result rows; the corpus total folds in as a
    literal (one extra action, the tf_idf N pattern)."""
    vocab = build_vocab(docs, text_col=text_col)
    total = int(
        vocab.agg(F.sum("tf_total").alias("t")).first()["t"] or 0
    )
    cut_arr = F.array(*[F.lit(int(c)) for c in sorted(cutoffs)])
    fanned = vocab.select(
        "tf_total",
        F.explode(
            F.filter(cut_arr, lambda c: F.col("vocab_id") < c)
        ).alias("vocab_size"),
    )
    return (
        fanned.groupBy("vocab_size")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum("tf_total").cast("long").alias("covered_tokens"),
        )
        .select(
            F.col("vocab_size").cast("long").alias("vocab_size"),
            "n_types",
            "covered_tokens",
            F.expr(f"(1000000 * covered_tokens) div {max(total, 1)}")
            .cast("long")
            .alias("coverage_micros"),
        )
    )


def heaps_law(
    docs: DataFrame,
    deciles: int = 10,
    bucket_size: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(decile, tokens_cum, vocab_cum, heaps_beta) — the Heaps'-law
    vocabulary-growth curve: distinct-type count V(n) after the first
    n tokens of the corpus (in ``id_col`` order) at each 1/``deciles``
    checkpoint, plus the fitted growth exponent beta from the log-log
    OLS slope of V(n) ~ K·n^beta (Heaps 1978, public literature) — the
    corpus scaling-law readout that says how fast new vocabulary keeps
    arriving as the corpus grows.

    Exactness: token positions and checkpoint counts are exact BIGINTs
    (global position = distributed exclusive prefix-sum of per-doc
    token counts, the pareto_concentration bucket pattern — never one
    global window); each log term is rounded to integer micros BEFORE
    the slope sums (the powerlaw_alpha discipline — no float
    summation-order dependence), and beta is the single final float
    division, 6dp.

    Scale shape: one per-doc tokenize, the bucket-grain prefix-sum
    (summary rows = n_docs/bucket_size), one posexplode +
    map-side-combined min per type, then each TYPE fans out only to
    the checkpoints at or past its first occurrence (a literal-array
    filter+explode inside codegen, the vocab_coverage pattern — the
    checkpoint thresholds ride in as literals from one scalar action,
    the tf_idf N pattern).  The slope runs on the ``deciles``-row
    curve."""
    from graphlite_spark.plans.derive import assign_dense_ids

    toks = docs.select(
        F.col(id_col).alias("doc"), tokens_expr(text_col).alias("toks")
    )
    sized = toks.select(
        "doc", F.size("toks").cast("long").alias("nt")
    )
    n_total = int(
        sized.agg(F.sum("nt").alias("t")).first()["t"] or 0
    )

    ranked = assign_dense_ids(sized, ["doc"], id_col="r")
    b = ranked.withColumn("bucket", F.expr(f"r div {bucket_size}"))
    bsum = b.groupBy("bucket").agg(F.sum("nt").cast("long").alias("bs"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    prefix = bsum.select(
        "bucket",
        F.coalesce(F.sum("bs").over(wb), F.lit(0)).cast("long").alias(
            "before"
        ),
    )
    win = (
        Window.partitionBy("bucket")
        .orderBy("r")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    starts = (
        b.join(F.broadcast(prefix), "bucket")
        .select(
            "doc",
            (
                F.col("before")
                + F.coalesce(F.sum("nt").over(win), F.lit(0))
            )
            .cast("long")
            .alias("start"),
        )
    )

    pos = toks.join(starts, "doc").select(
        F.posexplode("toks").alias("p", "tok"), "start"
    )
    fpos = (
        pos.select("tok", (F.col("start") + F.col("p") + 1).alias("g"))
        .groupBy("tok")
        .agg(F.min("g").cast("long").alias("fpos"))
    )

    cps = F.array(
        *[
            F.struct(
                F.lit(d).cast("long").alias("decile"),
                F.lit(n_total * d // deciles).cast("long").alias(
                    "tokens_cum"
                ),
            )
            for d in range(1, deciles + 1)
        ]
    )
    fanned = fpos.select(
        F.explode(
            F.filter(cps, lambda c: F.col("fpos") <= c["tokens_cum"])
        ).alias("cp")
    )
    curve = fanned.groupBy(
        F.col("cp.decile").alias("decile"),
        F.col("cp.tokens_cum").alias("tokens_cum"),
    ).agg(F.count(F.lit(1)).cast("long").alias("vocab_cum"))

    lg = curve.select(
        "decile",
        "tokens_cum",
        "vocab_cum",
        F.round(F.log(F.col("tokens_cum").cast("double")) * 1_000_000)
        .cast("long")
        .alias("xl"),
        F.round(F.log(F.col("vocab_cum").cast("double")) * 1_000_000)
        .cast("long")
        .alias("yl"),
    )
    beta = lg.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("xl").alias("sx"),
        F.sum("yl").alias("sy"),
        F.sum(F.col("xl") * F.col("yl")).alias("sxy"),
        F.sum(F.col("xl") * F.col("xl")).alias("sxx"),
    ).select(
        F.when(
            F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx") != 0,
            F.round(
                (
                    F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")
                ).cast("double")
                / (
                    F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
                ).cast("double"),
                6,
            ),
        ).alias("heaps_beta")
    )
    return lg.crossJoin(F.broadcast(beta)).select(
        "decile", "tokens_cum", "vocab_cum", "heaps_beta"
    )


def temperature_mixture(
    docs: DataFrame,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(stratum, n_docs, n_tokens, weight_micros, share_micros) — the
    temperature-scaled corpus mixture with tau = 1/2: each stratum's
    sampling weight is sqrt(token count), normalized.  The standard
    up-weighting of small sources / down-weighting of giant ones
    (the alpha-smoothed multilingual mix of public LM training recipes,
    e.g. the exponent-smoothing in the XLM-R / mT5 papers); tau = 1/2 is
    the one exponent whose float is engine-exact, because IEEE 754
    requires sqrt to be correctly rounded (pow(x, 0.5) carries no such
    guarantee — stated, not hidden).

    Exactness: token counts are exact BIGINTs; each weight is rounded
    ONCE to micros; the normalizer is a BIGINT sum of those micros (no
    float summation order); shares use the exact-ratio
    subtract-the-remainder division.

    Scale shape: one tokenize + map-side-combined per-stratum aggregate
    (stratum-count partial rows per task); the normalizer is one scalar
    action riding back as a literal (the tf_idf N pattern) — nothing
    here re-touches the corpus."""
    per = (
        docs.select(
            F.col(strata_col).alias("stratum"),
            F.size(tokens_expr(text_col)).cast("long").alias("nt"),
        )
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nt").cast("long").alias("n_tokens"),
        )
        .select(
            "stratum",
            "n_docs",
            "n_tokens",
            F.round(F.sqrt(F.col("n_tokens").cast("double")) * 1000000, 0)
            .cast("long")
            .alias("weight_micros"),
        )
    )
    denom = int(
        per.agg(F.sum("weight_micros").alias("d")).first()["d"] or 0
    )
    if denom == 0:
        return per.withColumn(
            "share_micros", F.lit(None).cast("long")
        )
    return per.withColumn(
        "share_micros",
        F.expr(
            f"(1000000 * weight_micros"
            f" - (1000000 * weight_micros) % {denom}) div {denom}"
        ).cast("long"),
    )


def ipf_raking(
    docs: DataFrame,
    row_col: str = "lang",
    col_col: str = "source",
    iterations: int = 4,
) -> DataFrame:
    """(lang, source, n_docs, weight_micros) — iterative proportional
    fitting / raking (Deming & Stephan 1940, public literature) of
    per-cell sampling weights over the (row, col) contingency table:
    after ``iterations`` alternating row/column scalings the weighted
    counts match a UNIFORM row-margin target (``total div |rows|``,
    truncated — the "rebalance the language mix") while holding the
    observed column margins (source sizes) — the two-axis mixture
    rebalance that per-axis reweighting (mix_corpus, temperature_
    mixture) cannot express, since scaling languages naively would
    distort source proportions.

    Exactness: weights live in micros; each scaling is
    ``w ← (w · target · 10^6) div margin_sum`` computed on DECIMAL(38,0)
    `div` (== DuckDB HUGEINT `//`, measured identical truncation), so
    no float appears and giant corpora can't overflow.

    Scale shape: ONE map-side-combined groupBy over the corpus; every
    subsequent join/aggregate runs on the |rows|·|cols| cell table
    (codebook-sized), and the uniform target rides a 1-row broadcast —
    the iteration costs the same at 10^3 or 10^12 documents."""
    from graphlite_spark.checkpoint import truncate_plan

    # ONE corpus pass, materialized: every later reference is to the
    # codebook-sized cell table, never back to the raw documents
    cells = docs.groupBy(
        F.col(row_col).alias("r"), F.col(col_col).alias("c")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    cells = truncate_plan(cells)
    tot = cells.agg(
        F.sum("n").cast("long").alias("total"),
        F.countDistinct("r").cast("long").alias("n_rows"),
    )
    # uniform row target (micros): (total div |rows|) · 10^6
    w = cells.crossJoin(F.broadcast(tot)).select(
        "r", "c", "n",
        F.lit(1_000_000).cast("long").alias("w"),
        F.expr("(total - total % n_rows) div n_rows").cast("long")
        .alias("t_row"),
    )
    col_target = cells.groupBy("c").agg(
        F.sum("n").cast("long").alias("t_col")
    )
    w = w.join(F.broadcast(col_target), "c")

    def rescale(frame: DataFrame, key: str, target: str) -> DataFrame:
        marg = frame.groupBy(key).agg(
            F.sum(F.col("n").cast("decimal(38,0)") * F.col("w"))
            .cast("decimal(38,0)").alias("ms")
        )
        scale_num = f"CAST(w AS DECIMAL(38,0)) * {target} * 1000000"
        return frame.join(F.broadcast(marg), key).select(
            "r", "c", "n", "t_row", "t_col",
            F.expr(
                f"CAST(CASE WHEN ms > 0 THEN ({scale_num})"
                " div CAST(ms AS DECIMAL(38,0)) ELSE w END AS BIGINT)"
            ).alias("w"),
        )

    for _ in range(iterations):
        # each rescale references w TWICE (margin agg + join back), so
        # the un-truncated plan subtree would DOUBLE per step (2^2k
        # copies of the corpus scan after k rounds) — the self-joining-
        # fixpoint rule (checkpoint.truncate_plan) applies even though
        # the frame is codebook-sized
        w = truncate_plan(rescale(w, "r", "t_row"))
        w = truncate_plan(rescale(w, "c", "t_col"))
    return w.select(
        F.col("r").alias(row_col),
        F.col("c").alias(col_col),
        F.col("n").alias("n_docs"),
        F.col("w").alias("weight_micros"),
    )


def isotonic_calibration(
    docs: DataFrame,
    num_buckets: int = 16,
    positive_lang: str = "en",
) -> DataFrame:
    """(bucket, n, pos, rate_micros, fitted_micros) — isotonic (PAV)
    calibration of the blended quality score against P(lang =
    ``positive_lang``): docs are rank-bucketed on (quality, doc_id)
    into ``num_buckets`` equal-frequency bins (the rfm_segments closed
    form over assign_dense_ids — no global window), and the monotone
    fit comes from the MINIMAX characterization of isotonic regression
    (Robertson, Wright & Dykstra 1988, public literature):

        fitted_i = max_{j≤i} min_{k≥i} rate(j..k),
        rate(j..k) = 10^6·(pos_k−pos_{j−1}) div (n_k−n_{j−1})

    — O(B³) integer lambdas over ONE collected B-row array instead of
    the sequential pool-adjacent-violators stack (which a declarative
    plan can't express); the max-of-min structure keeps monotonicity
    even under per-candidate micro truncation (each i+1 takes a max
    over a superset of mins over subsets).  The calibration-curve
    primitive next to quality_calibrated's percentile thresholds.

    Scale shape: one rank pass + one B-row groupBy; everything after
    lives on the collected B-element array (B is a knob, not data)."""
    from graphlite_spark.functions.text import quality_exprs, tokens_expr
    from graphlite_spark.plans.derive import assign_dense_ids

    B = int(num_buckets)
    toks = docs.select(
        "doc_id",
        (F.col("lang") == positive_lang).cast("long").alias("pos"),
        tokens_expr("text").alias("toks"),
    )
    q = toks.select(
        "doc_id", "pos",
        quality_exprs(F.col("toks"))["quality"].alias("q"),
    )
    n_total = q.count()
    if n_total == 0:
        return docs.sparkSession.createDataFrame(
            [], "bucket int, n long, pos long, rate_micros long,"
            " fitted_micros long"
        )
    ranked = assign_dense_ids(q, ["q", "doc_id"], id_col="rk")
    per = (
        ranked.select(
            (F.expr(f"(rk * {B}) div {n_total}") + 1)
            .cast("int").alias("b"),
            "pos",
        )
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("pos").cast("long").alias("p"),
        )
    )
    arr = per.groupBy().agg(
        F.sort_array(F.collect_list(F.struct("b", "n", "p"))).alias("arr")
    )
    # staged prefix arrays (1-based: element i+1 = sum of first i)
    staged = arr.select(
        "arr",
        F.transform(
            F.sequence(F.lit(0), F.size("arr")),
            lambda i: F.aggregate(
                F.slice(F.col("arr"), F.lit(1), i),
                F.lit(0).cast("long"),
                lambda a, x: a + x["n"],
            ),
        ).alias("cn"),
        F.transform(
            F.sequence(F.lit(0), F.size("arr")),
            lambda i: F.aggregate(
                F.slice(F.col("arr"), F.lit(1), i),
                F.lit(0).cast("long"),
                lambda a, x: a + x["p"],
            ),
        ).alias("cp"),
    )

    def rate(j, k):
        # 10^6·(cp[k]−cp[j−1]) div (cn[k]−cn[j−1]); prefix arrays are
        # 1-based with a leading 0, so prefix i lives at element i+1
        num = (
            F.element_at(F.col("cp"), k + 1)
            - F.element_at(F.col("cp"), j)
        ) * F.lit(1_000_000).cast("long")
        den = F.element_at(F.col("cn"), k + 1) - F.element_at(
            F.col("cn"), j
        )
        return ((num - num % den) / den).cast("long")

    fitted = staged.select(
        "arr", "cn", "cp",
        F.transform(
            F.sequence(F.lit(1), F.size("arr")),
            lambda i: F.array_max(
                F.transform(
                    F.sequence(F.lit(1), i),
                    lambda j: F.array_min(
                        F.transform(
                            F.sequence(i, F.size(F.col("arr"))),
                            lambda k: rate(j, k),
                        )
                    ),
                )
            ),
        ).alias("fit"),
    )
    out = fitted.select(
        F.explode(
            F.transform(
                F.col("arr"),
                lambda x, i: F.struct(
                    x["b"].alias("bucket"),
                    x["n"].alias("n"),
                    x["p"].alias("pos"),
                    (
                        (
                            x["p"] * F.lit(1_000_000).cast("long")
                            - (x["p"] * F.lit(1_000_000).cast("long"))
                            % x["n"]
                        )
                        / x["n"]
                    ).cast("long").alias("rate_micros"),
                    F.element_at(F.col("fit"), i + 1)
                    .alias("fitted_micros"),
                ),
            )
        ).alias("r")
    )
    return out.select(
        F.col("r.bucket").alias("bucket"),
        F.col("r.n").alias("n"),
        F.col("r.pos").alias("pos"),
        F.col("r.rate_micros").alias("rate_micros"),
        F.col("r.fitted_micros").alias("fitted_micros"),
    )


def yules_k(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row (n_tokens, vocab_size, sum_tf2, yule_k_micros) — Yule's
    characteristic K (Yule 1944, public literature), the length-
    invariant vocabulary-richness constant: K = 10⁴·(Σ_m m²·V_m − N)/N²
    where V_m counts types occurring m times.  Since Σ m²·V_m is just
    Σ_types tf², the frequency spectrum never needs materializing.
    Complements :func:`heaps_law` (growth curve) and the type-token
    ratio (length-SENSITIVE) — K is the repeat-collision rate, stable
    under corpus growth.

    Exactness: with a = 10⁴·(Σtf² − N) and den = N², the micros value
    rides the two-step quotient/remainder split (q = a div den;
    micros = 10⁶·q + (10⁶·rem) div den — never forming 10⁶·a, the
    chi-square discipline), all operands exact BIGINTs through
    Σtf² ≈ 9·10¹⁴ (stated).

    Scale shape: one explode + one map-side-combined term count + one
    scalar rollup — the inverted-index shape with no joins at all."""
    from graphlite_spark.functions.text import tokens_expr

    tf = (
        docs.select(
            F.explode(tokens_expr(text_col)).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    agg = tf.agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("sum_tf2"),
    )
    return agg.select(
        "n_tokens", "vocab_size", "sum_tf2",
        F.when(
            F.col("n_tokens") > 0,
            F.expr(
                "1000000 * ((10000 * (sum_tf2 - n_tokens))"
                " div (n_tokens * n_tokens))"
                " + (1000000 * ((10000 * (sum_tf2 - n_tokens))"
                " % (n_tokens * n_tokens)))"
                " div (n_tokens * n_tokens)"
            ).cast("long"),
        ).alias("yule_k_micros"),
    )


def hapax_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row (n_tokens, vocab_size, hapax, dis, hapax_share_micros,
    sichel_s_micros) — the head of the word-frequency spectrum: hapax
    legomena V₁ (types seen once), dis legomena V₂, the hapax share
    V₁/V, and Sichel's S = V₂/V (Sichel 1975, public literature).
    The spectrum endpoints :func:`yules_k` integrates over — a corpus
    whose hapax share collapses is template-saturated (dedup signal);
    V₁/N is also the Good–Turing unseen-mass estimate already used by
    the smoothing family.

    Exactness: exact type counts; two truncating micros divisions.

    Scale shape: identical to yules_k — one explode + one map-side-
    combined term count + one scalar rollup, no joins."""
    from graphlite_spark.functions.text import tokens_expr

    tf = (
        docs.select(F.explode(tokens_expr(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    agg = tf.agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.sum((F.col("tf") == 1).cast("long")).cast("long").alias(
            "hapax"
        ),
        F.sum((F.col("tf") == 2).cast("long")).cast("long").alias(
            "dis"
        ),
    )
    return agg.select(
        "n_tokens", "vocab_size", "hapax", "dis",
        F.when(
            F.col("vocab_size") > 0,
            F.expr("(1000000 * hapax) div vocab_size").cast("long"),
        ).alias("hapax_share_micros"),
        F.when(
            F.col("vocab_size") > 0,
            F.expr("(1000000 * dis) div vocab_size").cast("long"),
        ).alias("sichel_s_micros"),
    )
