"""Key-distribution profiling — the numbers read before sizing a shuffle.

Before joining or aggregating a 100 TB table on a key, two questions
decide the physical plan: how evenly does the key hash-partition
(salting decision), and which keys are heavy (broadcast/skew-join
decision).  Both are one map-side-combined aggregation:

* :func:`partition_histogram` — rows per hash bucket under the
  engine-portable ``hash48(key) % num_buckets``: a direct preview of
  what ``repartition(num_buckets, key)`` would do to this column.  The
  md5 hash differs from Spark's internal murmur, but uniformity behaves
  the same and the report is oracle-exact.
* :func:`heavy_hitters` — the exact top-k keys by count.  The grouped
  count is map-side-combined and the top-k compiles to
  ``TakeOrderedAndProject`` (per-partition partial top-k, then a k-row
  merge on the driver) — the scalable global-top-k shape, never a
  single-partition window.  Deterministic (count DESC, key ASC)
  tie-break so the k rows are engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graphlite_spark.functions.hashes import hash48


def partition_histogram(
    df: DataFrame, key_col: str, num_buckets: int = 32
) -> DataFrame:
    """(bucket, n_rows, n_keys) — per-hash-bucket row count and distinct
    key count; empty buckets are absent (at production key cardinality
    every bucket is hit)."""
    b = (hash48(F.col(key_col).cast("string")) % num_buckets).alias("bucket")
    return (
        df.select(b, F.col(key_col).alias("k"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("k").cast("long").alias("n_keys"),
        )
    )


def heavy_hitters(df: DataFrame, key_col: str, k: int = 20) -> DataFrame:
    """(key, n_rows) — the exact k most frequent keys, (count DESC, key
    ASC) tie-break.  orderBy().limit() compiles to TakeOrderedAndProject:
    each partition keeps k rows, the driver merges k·P — no global sort,
    no single-partition window."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    return counts.orderBy(F.col("n_rows").desc(), F.col("key").asc()).limit(k)


def vocab_zipf_alpha(
    docs: DataFrame, fmin: int = 2, text_col: str = "text"
) -> DataFrame:
    """One row (n_tail, alpha) — the continuous-approximation MLE for the
    token-frequency power-law exponent (Clauset, Shalizi & Newman 2009,
    public literature — the same estimator algos.stats.powerlaw_alpha
    applies to degrees, here over the corpus vocabulary): alpha =
    1 + n / Σ ln(f / (fmin − 1/2)) over term totals f >= fmin.  Zipf's
    law over the vocabulary is the standard sanity readout of a text
    corpus before training (a truncated or template-heavy crawl shows up
    as a broken tail).

    Determinism discipline (the powerlaw_alpha rules): one 6dp-stable
    micro-unit rounding per TERM before an exact BIGINT sum, then a
    single float division.  NULL alpha when no term reaches fmin.

    Shape: one tokenize+explode pass, one map-side-combined term count,
    one 1-row aggregate — no window, no join."""
    from graphlite_spark.functions.text import tokens_expr

    counts = (
        docs.select(F.explode(tokens_expr(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
        .where(F.col("f") >= fmin)
    )
    terms = counts.select(
        F.round(
            F.log(F.col("f").cast("double") / (fmin - 0.5)) * 1_000_000
        )
        .cast("long")
        .alias("lt")
    )
    s = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.sum("lt").alias("slt"),
    )
    return s.select(
        "n_tail",
        F.when(
            F.col("slt") > 0,
            F.round(
                F.lit(1.0)
                + F.col("n_tail").cast("double") * 1_000_000.0
                / F.col("slt").cast("double"),
                6,
            ),
        ).alias("alpha"),
    )


def profile_columns(
    df: DataFrame,
    numeric: tuple = (),
    string: tuple = (),
    timestamp: tuple = (),
) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_null,
    n_distinct, min_num, max_num, min_str, max_str) — the data-quality
    pass a pipeline runs before trusting a new table.  Numerics are
    normalized to BIGINT micro-units and timestamps to epoch micros
    (min/max land in min_num/max_num, exact on both engines); strings
    compare lexicographically in min_str/max_str.  n_distinct counts
    distinct NON-NULL values.

    Scale shape: the table is melted once to (column, value) — rows x
    n_cols, one projection, no Expand — then ONE groupBy("column")
    computes every statistic; the distinct count is the only two-phase
    aggregate, keyed by (column, value) so it partial-aggregates
    map-side.  At 100 TB swap the exact distinct for the HLL register
    path in sketches.hll_distinct_by — same melt, bounded state."""
    kinds: list[tuple[str, str]] = (
        [(c, "num") for c in numeric]
        + [(c, "str") for c in string]
        + [(c, "ts") for c in timestamp]
    )
    structs = []
    for c, kind in kinds:
        if kind == "num":
            v_num = F.round(F.col(c).cast("double") * 1_000_000).cast(
                "long"
            )
            v_str = F.lit(None).cast("string")
        elif kind == "ts":
            v_num = F.unix_micros(F.col(c).cast("timestamp"))
            v_str = F.lit(None).cast("string")
        else:
            v_num = F.lit(None).cast("long")
            v_str = F.col(c).cast("string")
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(c).isNull().cast("long").alias("is_null"),
                v_num.alias("v_num"),
                v_str.alias("v_str"),
                F.coalesce(
                    v_num.cast("string"), v_str
                ).alias("v_key"),
            )
        )
    melted = df.select(
        F.explode(F.array(*structs)).alias("m")
    ).select("m.*")
    return melted.groupBy("column").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("is_null").cast("long").alias("n_null"),
        F.countDistinct("v_key").cast("long").alias("n_distinct"),
        F.min("v_num").alias("min_num"),
        F.max("v_num").alias("max_num"),
        F.min("v_str").alias("min_str"),
        F.max("v_str").alias("max_str"),
    )


def k_anonymity(
    events: DataFrame,
    qi_cols: list | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """(class_size, n_classes, n_rows) — the k-anonymity risk histogram
    (Sweeney 2002): rows grouped by the quasi-identifier tuple
    (event_type, day, hour by default) form equivalence classes; a
    released table is k-anonymous iff every class has size >= k, so the
    histogram's low end IS the re-identification risk (size-1 classes
    are unique fingerprints).  n_rows = class_size * n_classes makes
    rows-at-risk one filter away.

    Scale shape: two map-side-combined groupBys (QI tuple -> class
    sizes -> histogram), nothing else — the canonical double-aggregation
    that never materializes per-individual state."""
    from pyspark.sql import functions as F

    if qi_cols is None:
        t = F.col(ts_col).cast("timestamp")
        qi = [
            F.col("event_type"),
            F.to_date(t).alias("day"),
            F.hour(t).alias("hour"),
        ]
    else:
        qi = [F.col(c) for c in qi_cols]
    classes = events.groupBy(*qi).agg(
        F.count(F.lit(1)).cast("long").alias("class_size")
    )
    return (
        classes.groupBy("class_size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_classes"))
        .select(
            "class_size",
            "n_classes",
            (F.col("class_size") * F.col("n_classes"))
            .cast("long")
            .alias("n_rows"),
        )
    )


def benford_deviation(
    df: DataFrame, value_col: str = "value"
) -> DataFrame:
    """(digit, n, share_micros, expected_micros, dev_micros) — the
    first-significant-digit distribution of a positive numeric column
    against Benford's law (Newcomb 1881 / Benford 1938, public
    literature): the classic fabricated-/synthetic-data screen a data-
    quality pass runs over monetary or count-like columns.  ``dev``
    is observed-minus-expected share in micros (signed).

    Exactness: the value quantizes to BIGINT micros, and the leading
    digit is the first character of that INTEGER's decimal rendering —
    no float log10 anywhere (log10 at a power-of-10 boundary is the
    classic cross-engine divergence); shares use the exact-ratio
    subtract-the-remainder division; expected shares are 9 Python-
    computed literals shared verbatim with the oracle.  Digits with
    zero observations are absent by construction (stated).

    Scale shape: one map-side-combined 9-group aggregate + one scalar
    count action riding back as a literal — the cheapest profile
    there is.  Rows with NULL or non-positive micro values are
    excluded (a leading digit is undefined for them)."""
    import math

    vm = F.round(F.col(value_col).cast("double") * 1000000, 0).cast("long")
    d = df.select(vm.alias("vm")).where(
        F.col("vm").isNotNull() & (F.col("vm") > 0)
    ).select(
        F.substring(F.col("vm").cast("string"), 1, 1).cast("long").alias(
            "digit"
        )
    )
    tot = d.count()
    exp = {
        k: int(round(math.log10(1.0 + 1.0 / k) * 1000000))
        for k in range(1, 10)
    }
    e = None
    for k in range(1, 10):
        e = (
            F.when(F.col("digit") == k, F.lit(exp[k]))
            if e is None
            else e.when(F.col("digit") == k, F.lit(exp[k]))
        )
    return (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "digit",
            "n",
            F.expr(
                f"(1000000 * n - (1000000 * n) % {tot}) div {tot}"
            ).cast("long").alias("share_micros"),
            e.cast("long").alias("expected_micros"),
        )
        .withColumn(
            "dev_micros",
            (F.col("share_micros") - F.col("expected_micros")).cast("long"),
        )
    )


def bootstrap_ci(
    df: DataFrame,
    value_col: str = "value",
    key_col: str = "event_id",
    replicates: int = 64,
    rate: float = 0.5,
    alpha: float = 0.025,
    salt: str = "boot",
) -> DataFrame:
    """(n_events, n_replicates, mean_micros, lo_micros, hi_micros) —
    a deterministic distributed bootstrap confidence interval for the
    mean of ``value_col``: each of ``replicates`` half-sample replicates
    keeps row r iff ``hash48(salt:b:key) < rate·2^48`` (the Bernoulli /
    Poissonized bootstrap of Kleiner et al.'s BLB lineage, public
    literature, made deterministic by the repo's hash-sampling rule),
    and the CI is the empirical [alpha, 1-alpha] percentile of the
    replicate means (rank ``floor(alpha·B)+1`` and ``B-floor(alpha·B)``
    under (mean, replicate) ordering — integer-exact, no interpolation).

    Exactness: values quantize to BIGINT micros; each replicate mean is
    ONE truncating integer division (sum/count, both exact); membership
    is a pure function of (salt, replicate, key) — stable across runs,
    engines, and partitionings.

    Scale shape: one pass — the replicate ids fan out INSIDE codegen
    (explode of a B-literal sequence + the hash filter), then a
    map-side-combined B-group aggregate, so the shuffle carries B
    partial rows per task regardless of input size; the percentile
    picks run on the B-row frame."""
    if not 0 < alpha < 0.5:
        raise ValueError("alpha must be in (0, 0.5)")
    lo_rank = int(alpha * replicates) + 1
    hi_rank = replicates - int(alpha * replicates)
    thresh = int(rate * (1 << 48))
    vm = F.round(F.col(value_col).cast("double") * 1000000, 0).cast("long")
    base = df.select(
        F.col(key_col).cast("string").alias("k"), vm.alias("vm")
    ).where(F.col("vm").isNotNull())
    full = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("vm").cast("long").alias("s"),
    ).select("n", F.expr("s div n").cast("long").alias("m")).first()
    if not full["n"]:
        return df.sparkSession.createDataFrame(
            [],
            "n_events long, n_replicates long, mean_micros long,"
            " lo_micros long, hi_micros long",
        )

    reps = base.select(
        F.explode(F.sequence(F.lit(0), F.lit(replicates - 1))).alias("b"),
        "k",
        "vm",
    )
    kept = reps.where(
        hash48(
            F.concat_ws(
                ":", F.lit(salt), F.col("b").cast("string"), F.col("k")
            )
        )
        < F.lit(thresh)
    )
    means = kept.groupBy("b").agg(
        F.sum("vm").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("nn"),
    ).select("b", F.expr("s div nn").cast("long").alias("m"))
    w = Window.orderBy(F.col("m").asc(), F.col("b").asc())
    ranked = means.withColumn("r", F.row_number().over(w))
    return ranked.agg(
        F.lit(int(full["n"])).cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_replicates"),
        F.lit(int(full["m"])).cast("long").alias("mean_micros"),
        F.max(F.when(F.col("r") == lo_rank, F.col("m"))).cast("long").alias(
            "lo_micros"
        ),
        F.max(F.when(F.col("r") == hi_rank, F.col("m"))).cast("long").alias(
            "hi_micros"
        ),
    )


def chao1_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(v_obs, f1, f2, n_tokens, chao1, p_unseen_micros) — the Chao1
    species-richness estimate of the TOTAL vocabulary (Chao 1984) plus
    the Good–Turing unseen-mass estimate (Good 1953), both public
    literature: from the observed type count V and the singleton /
    doubleton counts f1, f2,

        chao1    = V + f1² / (2·f2)        (bias-corrected
                   V + f1·(f1−1) / 2 when f2 = 0)
        P(unseen) = f1 / N

    — the "how much vocabulary is this corpus still missing" readout a
    scaling-law analysis reads next to :func:`heaps_law` (Heaps says
    how fast types arrive; Chao1 says where the curve is heading).

    Exactness: V/f1/f2/N are exact BIGINTs from one aggregate; chao1 is
    ONE fixed float expression over those integers rounded 6dp (f1² is
    exact in double for f1 < 2^26 per operand — the double-precision
    bound stated rather than hidden); the Good–Turing mass uses the
    exact-ratio subtract-the-remainder micro division.

    Scale shape: one explode + one map-side-combined term count + one
    1-row aggregate — the vocab_zipf_alpha shape."""
    from graphlite_spark.functions.text import tokens_expr

    tf = (
        docs.select(F.explode(tokens_expr(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    g = tf.agg(
        F.count(F.lit(1)).cast("long").alias("v_obs"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias(
            "f1"
        ),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("long").alias(
            "f2"
        ),
        F.sum("c").cast("long").alias("n_tokens"),
    )
    chao1 = F.when(
        F.col("f2") > 0,
        F.round(
            F.col("v_obs").cast("double")
            + (F.col("f1") * F.col("f1")) / (F.lit(2.0) * F.col("f2")),
            6,
        ),
    ).otherwise(
        F.round(
            F.col("v_obs").cast("double")
            + (F.col("f1") * (F.col("f1") - F.lit(1))) / F.lit(2.0),
            6,
        )
    )
    return g.select(
        "v_obs",
        "f1",
        "f2",
        "n_tokens",
        chao1.alias("chao1"),
        F.when(
            F.col("n_tokens") > 0,
            F.expr(
                "(1000000 * f1 - (1000000 * f1) % n_tokens) div n_tokens"
            ).cast("long"),
        ).alias("p_unseen_micros"),
    )


def l_diversity(
    events: DataFrame,
    sensitive_col: str = "user_id",
    qi_cols: list | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """(l_value, n_classes, n_rows) — the l-diversity histogram
    (Machanavajjhala et al. 2007, public literature) over the same
    quasi-identifier classes as :func:`k_anonymity`: per QI class the
    number of DISTINCT sensitive values l, histogrammed.  k-anonymity
    alone leaves the homogeneity attack open — a size-50 class whose
    50 rows all belong to one user re-identifies perfectly; this
    readout's l=1 bucket IS that exposure.

    Scale shape: one map-side-combined distinct on (QI tuple,
    sensitive), then the k_anonymity double-aggregation (class → l →
    histogram) — never per-individual state."""
    if qi_cols is None:
        t = F.col(ts_col).cast("timestamp")
        qi = [
            F.col("event_type"),
            F.expr(
                f"unix_micros(date_trunc('day', cast({ts_col} as"
                " timestamp)))"
            ).alias("qi_day"),
            F.hour(t).alias("qi_hour"),
        ]
    else:
        qi = [F.col(c) for c in qi_cols]
    classes = (
        events.select(*qi, F.col(sensitive_col).alias("sv"))
        .groupBy(*[c for c in ("event_type", "qi_day", "qi_hour")]
                 if qi_cols is None else qi_cols)
        .agg(
            F.countDistinct("sv").cast("long").alias("l_value"),
            F.count(F.lit(1)).cast("long").alias("rows_in_class"),
        )
    )
    return classes.groupBy("l_value").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("rows_in_class").cast("long").alias("n_rows"),
    )


def dispersion_index(
    events: DataFrame,
    group_col: str = "event_type",
    unit_col: str = "user_id",
) -> DataFrame:
    """(group, n_units, mean_micros, vmr) — the variance-to-mean ratio
    (index of dispersion, Fisher 1925 / Cox & Lewis 1966, public
    literature) of per-unit event counts, per group: VMR = 1 is the
    Poisson baseline, VMR >> 1 is overdispersion (bursty users, bot
    cohorts, heavy-tail engagement — the same signal NB-vs-Poisson
    model selection reads), VMR < 1 is suspicious regularity
    (rate-limited or synthetic traffic).  The population-level sibling
    of the per-user burstiness index.

    Exactness: the count moments n, Σx, Σx² are exact BIGINTs from two
    map-side-combined groupBys; the mean is the exact-ratio micro
    division; VMR = (n·Σx² − (Σx)²) / ((n−1)·Σx) is ONE fixed float
    expression with every product routed through DOUBLE before
    multiplication (no BIGINT overflow at any scale — IEEE-identical
    in both engines), rounded 6dp; NULL when n < 2 (variance
    undefined).

    Scale shape: groupBy((group, unit)) count → groupBy(group) moments
    — the canonical double aggregation, no joins, no windows."""
    per = events.groupBy(
        F.col(group_col).alias("g"), F.col(unit_col).alias("u")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    mom = per.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
    )
    vmr = F.round(
        (
            F.col("n_units").cast("double") * F.col("s2")
            - F.col("s1").cast("double") * F.col("s1")
        )
        / ((F.col("n_units") - F.lit(1)) * F.col("s1").cast("double")),
        6,
    )
    return mom.select(
        F.col("g").alias(group_col),
        "n_units",
        F.expr(
            "(1000000 * s1 - (1000000 * s1) % n_units) div n_units"
        ).cast("long").alias("mean_micros"),
        F.when(F.col("n_units") > 1, vmr).alias("vmr"),
    )


def lexicon_flag_rate(
    docs: DataFrame,
    lexicon: list[str],
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, n_docs, n_flagged, n_hits, flag_micros) — lexicon-based
    content screening by corpus slice: a document is FLAGGED when any
    token matches the (lower-cased) lexicon; ``n_hits`` counts total
    occurrences.  The blocklist/safety-filter primitive every curation
    pipeline runs before anything smarter — and per-slice rates are the
    actionable output (drop the slice vs scrub the docs).

    Exactness: pure integer token counts + one exact-ratio division.

    Scale shape: the lexicon rides the plan as an array literal (no
    join, no broadcast variable); per-doc hit counting is row-local
    expression work inside codegen; ONE map-side-combined groupBy on
    the slice key.  Zero extra shuffles over a plain count(*)."""
    from graphlite_spark.functions.text import tokens_expr

    if not lexicon:
        raise ValueError("lexicon_flag_rate needs a non-empty lexicon")
    lex = F.array(*[F.lit(w.lower()) for w in lexicon])
    d = docs.select(
        F.col(group_col), tokens_expr(text_col).alias("_toks")
    ).select(
        group_col,
        F.size(
            F.filter(F.col("_toks"), lambda t: F.array_contains(lex, t))
        ).cast("long").alias("hits"),
    )
    return (
        d.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("hits") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_flagged"),
            F.sum("hits").cast("long").alias("n_hits"),
        )
        .select(
            group_col,
            "n_docs",
            "n_flagged",
            "n_hits",
            F.expr(
                "(1000000 * n_flagged - (1000000 * n_flagged) % n_docs)"
                " div n_docs"
            ).cast("long").alias("flag_micros"),
        )
    )


def corpus_concentration(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """One row (n_sources, total_tokens, hhi_micros, top_share_micros) —
    the Herfindahl–Hirschman concentration of the corpus's token mass
    across sources: HHI = Σ_s share_s².  1/HHI is the effective number
    of sources actually feeding the mixture — a corpus that LOOKS
    20-source but has HHI 0.5 is really a 2-source corpus, and every
    diversity argument downstream (dedup risk, topic balance, mixture
    weights) inherits that.  ``top_share`` is the single-source
    dominance bound.

    Exactness: token counts and Σn² are exact BIGINTs; the two shares
    are exact subtract-the-remainder micro ratios.  At >>10^9 total
    tokens T² approaches 2^63 — lift the Σn²/T² ratio to DECIMAL(38,0)
    there (stated, same note as the TF-IDF norm sums).

    Scale shape: per-doc token counting is row-local codegen; ONE
    map-side-combined groupBy on the source key; the final aggregate is
    source-count-sized — join-free end to end."""
    from graphlite_spark.functions.text import tokens_expr

    per = (
        docs.select(
            F.col(group_col),
            F.size(tokens_expr(text_col)).cast("long").alias("nt"),
        )
        .groupBy(group_col)
        .agg(F.sum("nt").cast("long").alias("n"))
    )
    return (
        per.agg(
            F.count(F.lit(1)).cast("long").alias("n_sources"),
            F.sum("n").cast("long").alias("total_tokens"),
            F.sum(F.col("n") * F.col("n")).cast("long").alias("ssq"),
            F.max("n").cast("long").alias("top_n"),
        )
        .select(
            "n_sources",
            "total_tokens",
            F.expr(
                "(1000000 * ssq - (1000000 * ssq)"
                " % (total_tokens * total_tokens))"
                " div (total_tokens * total_tokens)"
            ).cast("long").alias("hhi_micros"),
            F.expr(
                "(1000000 * top_n - (1000000 * top_n) % total_tokens)"
                " div total_tokens"
            ).cast("long").alias("top_share_micros"),
        )
    )


def t_closeness(
    events: DataFrame,
    sensitive_col: str = "user_id",
    qi_cols: list | None = None,
    ts_col: str = "ts",
    bucket_micros: int = 100000,
) -> DataFrame:
    """(t_bucket, n_classes, n_rows) — the t-closeness histogram (Li,
    Li & Venkatasubramanian 2007, public literature) over the same
    quasi-identifier classes as :func:`k_anonymity` /
    :func:`l_diversity`: per QI class, the variational distance between
    the class's sensitive-value distribution and the GLOBAL one
    (the paper's equal-ground-distance EMD), histogrammed in
    ``bucket_micros``-wide buckets of [0, 1].  l-diversity misses the
    skewness attack — a class can hold l distinct values yet be wildly
    non-representative (l=2 at 99:1 in a 50:50 world leaks plenty);
    the high-t buckets ARE that exposure.  Completes the release-risk
    triad: k (size), l (variety), t (representativeness).

    Exactness: both distributions are quantized to exact per-value
    micro shares first (``(10^6·c) div n`` BIGINTs — products capped at
    10^6·rows, no overflow at 10^12 rows), so every |p−q| term, the
    absent-value complement (S_q − Σ_present q̂, with S_q the exact
    global micro-share total), and the final ``div 2`` are pure BIGINT
    arithmetic — no float anywhere, both engines bit-identical.

    Scale shape: groupBy((QI, sv)) + groupBy(sv) counts, one bounded
    equi-join per (class, present-value) pair against the global value
    shares (never the absent cross product — absentees ride the S_q
    complement), then the double aggregation down to the histogram.
    Two scalar actions (N, S_q) ride back as literals."""
    if qi_cols is None:
        t = F.col(ts_col).cast("timestamp")
        qi_exprs = [
            F.col("event_type"),
            F.expr(
                f"unix_micros(date_trunc('day', cast({ts_col} as"
                " timestamp)))"
            ).alias("qi_day"),
            F.hour(t).alias("qi_hour"),
        ]
        qi_names = ["event_type", "qi_day", "qi_hour"]
    else:
        qi_exprs = [F.col(c) for c in qi_cols]
        qi_names = list(qi_cols)

    rows = events.select(*qi_exprs, F.col(sensitive_col).alias("sv"))
    cu = rows.groupBy(*qi_names, "sv").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    gu = rows.groupBy("sv").agg(
        F.count(F.lit(1)).cast("long").alias("g")
    )
    totals = gu.agg(
        F.sum("g").cast("long").alias("n")
    ).first()
    n_total = int(totals["n"] or 0)
    spark = events.sparkSession
    if n_total == 0:
        return spark.createDataFrame(
            [], "t_bucket long, n_classes long, n_rows long"
        )
    qhat = gu.select(
        "sv",
        F.expr(f"(1000000 * g) div {n_total}").alias("qh"),
    )
    s_q = int(
        qhat.agg(F.sum("qh").cast("long").alias("s")).first()["s"]
    )
    nc = cu.groupBy(*qi_names).agg(
        F.sum("c").cast("long").alias("n_c")
    )
    per = (
        cu.join(qhat, "sv")
        .join(nc, qi_names)
        .groupBy(*qi_names)
        .agg(
            F.sum(
                F.abs(F.expr("(1000000 * c) div n_c") - F.col("qh"))
            )
            .cast("long")
            .alias("present_dev"),
            F.sum("qh").cast("long").alias("present_q"),
            F.max("n_c").cast("long").alias("rows_in_class"),
        )
        .select(
            F.expr(
                f"(present_dev + ({s_q} - present_q)) div 2"
            ).alias("t_micros"),
            "rows_in_class",
        )
    )
    return (
        per.groupBy(
            F.expr(f"t_micros div {bucket_micros}").alias("t_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum("rows_in_class").cast("long").alias("n_rows"),
        )
        .select(
            F.col("t_bucket").cast("long"), "n_classes", "n_rows"
        )
    )


def props_json_stats(
    events: DataFrame,
    props_col: str = "props",
    group_col: str = "event_type",
    field: str = "k",
) -> DataFrame:
    """(event_type, n, n_with_field, min_f, max_f, sum_f) — the
    semi-structured tier: parse the JSON ``props`` payload per row
    (``get_json_object`` — JVM-side SIMD JSON, no UDF) and profile the
    extracted integer field per group.  Missing/null/malformed rows
    count in ``n`` but not ``n_with_field`` — exactly the
    dirty-payload accounting a 100 TB ingest needs before trusting a
    field.

    Scale shape: pure per-row extraction folded into ONE map-side-
    combined groupBy — the JSON never shuffles, only the group keys
    and partial aggregates do."""
    f = F.get_json_object(F.col(props_col), f"$.{field}").cast("long")
    return (
        events.select(F.col(group_col).alias("g"), f.alias("f"))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count("f").cast("long").alias("n_with_field"),
            F.min("f").cast("long").alias("min_f"),
            F.max("f").cast("long").alias("max_f"),
            F.sum("f").cast("long").alias("sum_f"),
        )
        .withColumnRenamed("g", group_col)
    )


def dataset_fingerprint(docs: DataFrame) -> DataFrame:
    """(source, n_docs, xor48, min_h, max_h) — an order-independent
    content manifest per source plus the '(all)' rollup row: each
    document contributes ``hash48(text)`` (the engines' shared md5
    carve-out), combined with XOR / min / max — all commutative,
    bounded-state aggregates, so two pipelines can diff corpora
    without sorting or concatenating anything.  The
    reproducibility-check primitive: equal manifests ⇔ (w.h.p.) equal
    document multisets per source (XOR catches any single change;
    min/max and the count cheaply localize it).

    Scale shape: one rollup groupBy over per-row hashes — map-side
    combined, constant state per group, no shuffle of the texts."""
    from graphlite_spark.functions.hashes import hash48

    h = docs.select(
        "source", hash48(F.col("text")).alias("h")
    )
    return (
        h.rollup("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.bit_xor("h").cast("long").alias("xor48"),
            F.min("h").cast("long").alias("min_h"),
            F.max("h").cast("long").alias("max_h"),
        )
        .select(
            F.coalesce("source", F.lit("(all)")).alias("source"),
            "n_docs", "xor48", "min_h", "max_h",
        )
    )


GOPHER_STOP8 = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rule_flags(
    documents: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    group_col: str = "source",
) -> DataFrame:
    """(source, n_docs, fail_words, fail_wordlen, fail_alpha,
    fail_stop, n_pass) — the Gopher hard quality filters (Rae et al.
    2021, public literature) as per-source FAIL counts, the bundle a
    corpus curator reads before setting mixture weights: word count
    outside [min_words, max_words]; mean word length outside [3, 10];
    fewer than 80% of words containing an alphabetic character; fewer
    than 2 occurrences of the paper's 8 indicator stopwords (the, be,
    to, of, and, that, have, with).  ``n_pass`` counts documents
    failing NO rule.  text_quality scores documents continuously;
    this is the reject/keep tier — both exist because pipelines use
    both.

    Exactness: every rule is an exact integer comparison (mean word
    length and the alpha ratio ride cross-multiplied token counts —
    no division anywhere), so the counts are BIGINT-exact on both
    engines.

    Scale shape: pure per-row expressions then ONE map-side-combined
    groupBy on the source codebook — embarrassingly parallel."""
    from graphlite_spark.functions.text import tokens_expr

    toks = tokens_expr("text")
    docs = documents.select(F.col(group_col), toks.alias("t")).select(
        group_col,
        F.size("t").alias("n"),
        F.aggregate(
            "t", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("sum_len"),
        F.size(F.filter("t", lambda x: x.rlike("[a-z]"))).alias("n_alpha"),
        F.size(
            F.filter(
                "t",
                lambda x: F.array_contains(
                    F.array(*[F.lit(s) for s in GOPHER_STOP8]), x
                ),
            )
        ).alias("n_stop8"),
    )
    f_words = (
        (F.col("n") < min_words) | (F.col("n") > max_words)
    ).cast("int")
    f_wordlen = (
        (F.col("sum_len") < 3 * F.col("n"))
        | (F.col("sum_len") > 10 * F.col("n"))
    ).cast("int")
    f_alpha = (5 * F.col("n_alpha") < 4 * F.col("n")).cast("int")
    f_stop = (F.col("n_stop8") < 2).cast("int")
    flagged = docs.select(
        group_col,
        f_words.alias("fw"), f_wordlen.alias("fl"),
        f_alpha.alias("fa"), f_stop.alias("fs"),
    )
    return flagged.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("fw").cast("long").alias("fail_words"),
        F.sum("fl").cast("long").alias("fail_wordlen"),
        F.sum("fa").cast("long").alias("fail_alpha"),
        F.sum("fs").cast("long").alias("fail_stop"),
        F.sum(
            (
                (F.col("fw") + F.col("fl") + F.col("fa") + F.col("fs"))
                == 0
            ).cast("int")
        ).cast("long").alias("n_pass"),
    )


def good_turing_counts(
    documents: DataFrame, max_r: int = 50
) -> DataFrame:
    """(r, n_r, r_star_micros) — the Good–Turing frequency-of-
    frequencies table (Good 1953, public literature) over the corpus
    vocabulary: N_r = how many distinct tokens occur exactly r times,
    and the smoothed count r* = (r+1)·N_{r+1}/N_r in exact floor
    micros (NULL where N_{r+1} = 0 — smoothing undefined, stated
    rather than faked).  Row r = 1's N_1/N is the unseen-mass estimate
    every leave-one-out LM evaluation needs; :func:`chao1_vocab`
    consumes the same two leading rows.  Reported for r <= ``max_r``
    (the sparse high-count tail is where GT smoothing is not used
    anyway — Katz backoff switches to raw counts there).

    Scale shape: one token groupBy (vocabulary-sized), one count
    groupBy (bounded by max_r + distinct counts), one self-equi-join
    on r+1 of the tiny N_r table."""
    from graphlite_spark.functions.text import tokens_expr

    counts = (
        documents.select(
            F.explode(tokens_expr("text")).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("r"))
    )
    nr_all = counts.groupBy("r").agg(
        F.count(F.lit(1)).cast("long").alias("n_r")
    )
    nr = nr_all.where(F.col("r") <= max_r)
    # N_{r+1} sourced from the UNFILTERED table so row max_r still
    # smooths correctly
    nxt = nr_all.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_next")
    )
    return nr.join(nxt, "r", "left").select(
        "r", "n_r",
        F.expr(
            "(1000000 * (r + 1) * n_next"
            " - (1000000 * (r + 1) * n_next) % n_r) div n_r"
        ).cast("long").alias("r_star_micros"),
    )


def char_entropy(documents: DataFrame) -> DataFrame:
    """(doc_id, n_chars_counted, entropy_micros) — per-document
    character-unigram Shannon entropy in nats,
    H = ln n − (Σ_c n_c·ln n_c)/n, the encoding-junk / repetition
    screen (near-zero entropy = one character repeated; text in a
    natural language sits in a narrow band, so both tails are filter
    candidates a curation pass reads next to the Gopher rules).

    Exactness: each character's n_c·ln n_c term is rounded to integer
    MICROS per character (n_c is a per-document integer, so the term
    is a deterministic per-row float), making the per-document sum
    order-independent; the final entropy is one shared float
    expression over that exact sum, rounded to the micro.  NULL for
    empty documents.

    Scale shape: pure per-row expressions (O(distinct_chars × len)
    per document), no shuffle, no join — embarrassingly parallel."""
    # One sorted pass instead of a per-distinct-char filter scan: the
    # old form referenced the char array 2x PER DISTINCT CHAR (HOF
    # lambdas get no subexpression elimination — the repo's staging
    # rule), i.e. O(D*L) array re-materializations per document.  The
    # counts n_c are the run lengths of the SORTED char array; the
    # per-char term round(1e6 * n_c * ln n_c) is unchanged and the term
    # sum is a sum of exact longs, so it is order-independent — the
    # result is identical.
    chars = F.expr(
        "transform(sequence(1, length(text)), i -> substring(text, i, 1))"
    )
    n = F.length("text").cast("long")
    d0 = documents.select(
        "doc_id",
        n.alias("n"),
        F.array_sort(chars).alias("cs"),
    )
    d1 = d0.select(
        "doc_id",
        "n",
        "cs",
        # run starts: position 1, and every position whose char differs
        # from its predecessor
        F.expr(
            "filter(sequence(1, size(cs)), i -> i = 1 OR "
            "element_at(cs, i) != element_at(cs, i - 1))"
        ).alias("b"),
    )
    runs = F.expr(
        "zip_with(b, concat(slice(b, 2, size(b) - 1), array(size(cs) + 1)), "
        "(a, e) -> e - a)"
    )
    s = F.aggregate(
        F.transform(
            runs,
            lambda c: F.round(
                F.lit(1_000_000.0) * c * F.log(c.cast("double"))
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    ent = F.round(
        F.lit(1_000_000.0) * F.log(F.col("n").cast("double"))
        - s.cast("double") / F.col("n").cast("double")
    ).cast("long")
    return d1.select(
        "doc_id",
        F.col("n").alias("n_chars_counted"),
        F.when(F.col("n") > 0, ent).alias("entropy_micros"),
    )


def simpson_diversity(
    documents: DataFrame, group_col: str = "source"
) -> DataFrame:
    """(source, n_tokens, n_distinct, simpson_micros,
    inv_simpson_micros) — Simpson's diversity index per source over
    the token vocabulary: λ = Σ n_i(n_i−1) / (N(N−1)), the probability
    two tokens drawn without replacement are the same type (Simpson
    1949, public literature), and 1/λ, the "effective vocabulary
    size".  Entropy (TTR / Chao1 tier) weights rare types heavily;
    Simpson is dominated by the head — a template-heavy source shows
    near-identical entropy but a collapsed 1/λ, which is why curation
    dashboards carry both.

    Exactness: λ is a ratio of two exact BIGINTs, floored to micros by
    the remainder-subtract rule; 1/λ likewise (micros of the exact
    integer ratio N(N−1)·10⁶ div Σn_i(n_i−1)).  NULL when N < 2.

    Scale shape: one (source, token) map-side-combined groupBy, one
    source-sized rollup — no window, no join."""
    from graphlite_spark.functions.text import tokens_expr

    counts = (
        documents.select(
            F.col(group_col),
            F.explode(tokens_expr("text")).alias("tok"),
        )
        .groupBy(group_col, "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    agg = counts.groupBy(group_col).agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("num"),
    )
    den = F.col("n_tokens") * (F.col("n_tokens") - 1)
    return agg.select(
        group_col, "n_tokens", "n_distinct",
        F.when(
            F.col("n_tokens") >= 2,
            F.expr(
                "cast((1000000 * num - (1000000 * num)"
                " % (n_tokens * (n_tokens - 1)))"
                " div (n_tokens * (n_tokens - 1)) as bigint)"
            ),
        ).alias("simpson_micros"),
        F.when(
            (F.col("n_tokens") >= 2) & (F.col("num") > 0),
            F.expr(
                "cast((1000000 * n_tokens * (n_tokens - 1)"
                " - (1000000 * n_tokens * (n_tokens - 1)) % num)"
                " div num as bigint)"
            ),
        ).alias("inv_simpson_micros"),
    )


def anonymity_ladder(
    events: DataFrame,
    small_k: int = 5,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(level, quasi_identifiers, n_classes, min_class_size,
    pct_small_micros) — Samarati's generalization ladder (Samarati
    2001, public literature) for the events table: re-identification
    risk at three NESTED quasi-identifier granularities — (weekday),
    (weekday, type), (weekday, type, value decile).  Each added
    column splits the equivalence classes; the ladder shows exactly
    where k-anonymity collapses (min class → 1) and how much of the
    table sits in classes smaller than ``small_k`` — the
    release-decision table behind :func:`k_anonymity`'s single
    configuration.

    Deciles are equal-width over cents by the corpus max (stated —
    deterministic, no rank shuffle); all counts BIGINT; the small-
    class share is one truncating micros division per level.

    Scale shape: three map-side-combined groupBys over derived
    columns, each a codebook-sized rollup."""
    day = F.expr(
        f"cast((unix_micros(cast({ts_col} as timestamp))"
        " div 86400000000 + 3) % 7 as int)"
    )
    cents = F.round(F.col(value_col) * 100).cast("long")
    mx = events.agg(
        F.max(F.round(F.col(value_col) * 100).cast("long")).alias("mc")
    )
    src = events.crossJoin(F.broadcast(mx)).select(
        day.alias("dow"),
        F.col("event_type").alias("t"),
        F.expr(
            f"cast((cast(round({value_col} * 100) as bigint) * 10)"
            " div (mc + 1) as int)"
        ).alias("vdec"),
    )

    def level(cols: list, lvl: int, desc: str) -> DataFrame:
        cls = src.groupBy(*cols).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        return cls.agg(
            F.lit(lvl).cast("int").alias("level"),
            F.lit(desc).alias("quasi_identifiers"),
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.min("c").cast("long").alias("min_class_size"),
            F.expr(
                "(1000000 * coalesce(sum(CASE WHEN c <"
                f" {int(small_k)} THEN c ELSE 0 END), 0)) div sum(c)"
            ).cast("long").alias("pct_small_micros"),
        )
    return (
        level(["dow"], 1, "dow")
        .unionByName(level(["dow", "t"], 2, "dow+type"))
        .unionByName(level(["dow", "t", "vdec"], 3, "dow+type+vdec"))
    )
