"""TF-IDF term scoring over a document corpus.

The baseline relevance/feature weighting for text pipelines: score(t, d)
= tf(t, d) · ln(N / df(t)).  Two grouped counts and one join — fully
partial-aggregatable, no quadratic shape anywhere.

Exactness discipline (same trick as Adamic-Adar): the idf factor is
rounded ONCE per term to integer micro-units (``round(1e6·ln(N/df))``),
then multiplied by the integer term frequency — the resulting scores
are BIGINT-exact, so the cross-engine oracle comparison needs no float
tolerance.  N (corpus size) is a single scalar count folded in as a
literal — one extra action, not a per-row driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphlite_spark.functions.text import tokens_expr


def tf_idf(
    docs: DataFrame,
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """(doc_id, term, tf, df, tfidf_micros) — integer-exact TF-IDF.
    Terms appearing in fewer than ``min_df`` documents are dropped;
    terms appearing in every document score 0 (ln 1)."""
    n_docs = docs.count()
    toks = docs.select(
        "doc_id", F.explode(tokens_expr(text_col)).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    if min_df > 1:
        df_ = df_.where(F.col("df") >= min_df)
    idf = df_.select(
        "term",
        "df",
        F.round(F.lit(1_000_000.0) * F.log(F.lit(float(n_docs)) / F.col("df")), 0)
        .cast("long")
        .alias("idf_micros"),
    )
    return tf.join(idf, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        (F.col("tf") * F.col("idf_micros")).cast("long").alias("tfidf_micros"),
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    text_col: str = "text",
    min_cos: float = 0.3,
    max_df_permille: int | None = 100,
    min_df: int = 1,
) -> DataFrame:
    """(a, b, cos) — document pairs with TF-IDF cosine similarity >=
    ``min_cos``: the retrieval-style near-duplicate/related-doc path,
    complementary to shingle Jaccard (word-weight overlap instead of
    exact n-gram overlap).

    Scale shape: the classic sparse similarity join — an INVERTED-INDEX
    equi-join on the term, never an all-pairs product.  Each term with
    document frequency df contributes O(df²) candidate rows, so the
    ``max_df_permille`` cap (default 100‰ = 10% of the corpus) drops
    stop-like terms BEFORE the self-join — the same structural bound as
    the n-gram path's ``max_doc_freq`` (high-df terms carry ~zero idf
    weight anyway, so the cosine loss is second-order; pass ``None`` to
    opt out).  The cap is the pure-integer predicate
    ``df * 1000 <= N * permille`` so no float-truncation boundary can
    diverge across engines.  Dot products and squared norms are exact BIGINT sums of
    micro-unit scores; the single float expression (one division, two
    sqrts over exact ints) is identical on both engines, so the
    6dp-rounded cosine is oracle-exact.  At >> 1e9-doc scale the
    squared-micro sums approach 2^63 — move the two Σw² aggregates to
    DECIMAL(38,0) there; the join shape is already the right one."""
    w = tf_idf(docs, text_col, min_df)
    if max_df_permille is not None:
        n_docs = docs.count()
        w = w.where(F.col("df") * 1000 <= F.lit(n_docs * max_df_permille))
    w = w.select("doc_id", "term", F.col("tfidf_micros").alias("wt"))
    norms = w.groupBy("doc_id").agg(
        F.sum(F.col("wt") * F.col("wt")).alias("nsq")
    )
    wa = w.select(F.col("term"), F.col("doc_id").alias("a"), F.col("wt").alias("wa"))
    wb = w.select(F.col("term"), F.col("doc_id").alias("b"), F.col("wt").alias("wb"))
    dots = (
        wa.join(wb, "term")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("a"), F.col("nsq").alias("nsqa"))
    nb = norms.select(F.col("doc_id").alias("b"), F.col("nsq").alias("nsqb"))
    out = dots.join(na, "a").join(nb, "b").select(
        "a", "b",
        F.round(
            F.col("dot").cast("double")
            / (F.sqrt(F.col("nsqa").cast("double"))
               * F.sqrt(F.col("nsqb").cast("double"))),
            6,
        ).alias("cos"),
    )
    return out.where(F.col("cos") >= min_cos)


def code_switch_score(
    docs: DataFrame,
    window: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, doc_lang, n_windows, n_divergent, divergence_micros) —
    mixed-language / code-switching detection: the fraction (micros) of
    non-overlapping ``window``-token chunks whose lang-id disagrees
    with the whole document's lang-id.  A document that is globally
    'en' but has a run of windows scoring 'und' is code-switched,
    machine-garbled, or a concatenation artifact — a quality signal the
    doc-level lang-id alone cannot see (the chunks average out).

    Exactness: integer window counts, one integer division.  Scale
    shape: pure per-row expression work, zero shuffles; tokens and the
    window-lang array are staged projections (the Column-reuse
    inlining rule)."""
    from graphlite_spark.functions.text import (
        lang_id_expr, tokens_expr, window_langs_expr,
    )

    d1 = docs.select(F.col(id_col), tokens_expr(text_col).alias("_toks"))
    d2 = d1.select(
        F.col(id_col),
        lang_id_expr(F.col("_toks")).alias("doc_lang"),
        window_langs_expr(F.col("_toks"), window).alias("_wl"),
    )
    n_win = F.size("_wl")
    n_div = F.size(
        F.filter(F.col("_wl"), lambda l: l != F.col("doc_lang"))
    )
    return d2.select(
        F.col(id_col),
        "doc_lang",
        n_win.cast("long").alias("n_windows"),
        n_div.cast("long").alias("n_divergent"),
        F.when(n_win == 0, F.lit(0))
        .otherwise(F.expr(f"(1000000 * size(filter(_wl, l -> l != doc_lang))) div size(_wl)"))
        .cast("long")
        .alias("divergence_micros"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_terms, score_micros) — Okapi BM25 top-k retrieval for
    a bag of query terms (Robertson-Spärck Jones idf with the +1 floor,
    the Lucene form): score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b
    + b·dl/avgdl)).  The ranked-retrieval complement of the flat TF-IDF
    table — length-normalized, saturating in tf, and the standard
    first-stage ranker in front of the ANN/rerank stack.

    Exactness discipline: idf is rounded ONCE per term to integer
    micros; the per-(doc,term) score is one double expression over
    exact BIGINTs whose constants (k1+1, k1·(1−b), k1·b) are rendered
    from the SAME Python doubles on both engines, rounded to BIGINT
    micros; the per-doc score is then an exact BIGINT sum — no float
    accumulation order anywhere.

    Scale shape: term filter BEFORE the tf aggregate (the explode
    stream drops every non-query term immediately — a |q|-literal IN,
    no join); df and the N/avgdl scalars are one tiny agg + one 1-row
    action; the idf table (≤|q| rows) broadcasts; top-k is a global
    TakeOrderedAndProject (partial per-partition top-k, never a full
    sort).  Ties broken (score DESC, doc_id ASC) — deterministic."""
    from graphlite_spark.functions.text import tokens_expr

    if not query_terms:
        raise ValueError("bm25_topk needs at least one query term")
    dl = docs.select(
        "doc_id", F.size(tokens_expr(text_col)).cast("long").alias("dl")
    )
    n_docs, total = (
        dl.agg(F.count(F.lit(1)), F.sum("dl")).collect()[0]
    )
    n_docs, total = int(n_docs), int(total)
    tf = (
        docs.select(
            "doc_id",
            F.size(tokens_expr(text_col)).cast("long").alias("dl"),
            F.explode(tokens_expr(text_col)).alias("term"),
        )
        .where(F.col("term").isin(list(query_terms)))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = df_.select(
        "term",
        F.round(
            F.lit(1_000_000.0)
            * F.log(
                (F.lit(n_docs) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ),
            0,
        ).cast("long").alias("idf_micros"),
    )
    k1p1, c0, c1 = k1 + 1.0, k1 * (1.0 - b), k1 * b
    denom = (
        F.col("tf").cast("double")
        + F.lit(c0)
        + F.lit(c1) * ((F.col("dl") * F.lit(n_docs)) / F.lit(total))
    )
    scored = tf.join(F.broadcast(idf), "term").select(
        "doc_id",
        F.round(
            (F.col("idf_micros") * F.col("tf")).cast("double")
            * F.lit(k1p1)
            / denom,
            0,
        ).cast("long").alias("sm"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("sm").cast("long").alias("score_micros"),
        )
        .orderBy(F.col("score_micros").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def top_terms_per_doc(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """(doc_id, rank, term, tf, tfidf_micros) — the top-k TF-IDF
    keywords of every document: the cheap doc-labeling / topic-tagging
    step (faceting, routing, weak supervision) on top of the
    integer-exact TF-IDF table.  Ties broken (score DESC, term ASC) —
    fully deterministic.

    Scale shape: rides :func:`tf_idf` (two grouped counts + one join),
    then a PER-DOC window — Catalyst compiles the ``row_number ≤ k``
    predicate into WindowGroupLimit (partial per-partition top-k BEFORE
    the exchange), so no document's full term list is ever sorted in
    one reducer.  Never a global window."""
    w = tf_idf(docs, text_col, min_df)
    from pyspark.sql import Window

    win = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_micros").desc(), F.col("term").asc()
    )
    return (
        w.withColumn("rank", F.row_number().over(win).cast("long"))
        .where(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tf", "tfidf_micros")
    )


def feature_hash_collisions(
    docs: DataFrame, num_buckets: int = 1024, salt: str = "fh"
) -> DataFrame:
    """(tokens_in_bucket, n_buckets, n_tokens) — the hashing-trick
    collision profile: every distinct corpus token is hashed into
    ``num_buckets`` feature slots (hash48, the engines' shared md5
    carve-out) and the bucket-occupancy histogram is reported — the
    dimensionality-vs-collision tradeoff a feature-hashed model reads
    before picking 2^b (Weinberger et al. 2009's hashing trick, public
    literature).  ``tokens_in_bucket = 0`` slots are real rows (the
    unused-capacity share), via the bucket spine minus occupied.

    Scale shape: one distinct over (token) — the vocabulary, not the
    corpus — one hash-mod groupBy, one histogram; the spine is a
    literal sequence."""
    from graphlite_spark.functions.hashes import hash48
    from graphlite_spark.functions.text import tokens_expr

    vocab = (
        docs.select(F.explode(tokens_expr("text")).alias("tok"))
        .distinct()
    )
    occ = vocab.select(
        (
            hash48(F.concat(F.lit(f"{salt}:"), F.col("tok")))
            % num_buckets
        ).alias("b")
    ).groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    spine = docs.sparkSession.range(num_buckets).select(
        F.col("id").alias("b")
    )
    filled = spine.join(occ, "b", "left").select(
        F.coalesce("k", F.lit(0)).cast("long").alias("k")
    )
    return filled.groupBy(F.col("k").alias("tokens_in_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("k").cast("long").alias("n_tokens"),
    )


def distinctive_terms_logodds(
    docs: DataFrame, k: int = 5
) -> DataFrame:
    """(source, token, c_source, z) — each source's top-``k`` most
    DISTINCTIVE tokens by the log-odds ratio with an informative
    Dirichlet prior (Monroe, Colaresi & Quinn 2008's "Fightin' Words",
    public literature), source vs rest-of-corpus:

        δ_w = ln((c_s+1)/(n_s+V−c_s−1)) − ln((c_r+1)/(n_r+V−c_r−1)),
        z_w = δ_w / sqrt(1/(c_s+1) + 1/(c_r+1))

    with the add-one prior (A = vocabulary size V).  Unlike raw TF-IDF
    this is variance-regularized: rare tokens can't dominate on one
    lucky count — the standard "what words define this corpus slice"
    readout.

    Exactness: all counts exact BIGINTs; the ln/sqrt expression is the
    one float, structured identically on both engines over integer
    operands, rounded once to 6dp.  Deterministic top-k by (z DESC,
    token ASC) — a per-source WindowGroupLimit, never a global sort.

    Scale shape: one map-side-combined (source, token) count, one
    token-marginal aggregate joined back on the token key, two 1-row
    broadcast totals."""
    from graphlite_spark.functions.text import tokens_expr

    st = (
        docs.select(
            "source", F.explode(tokens_expr("text")).alias("tok")
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cs"))
    )
    tok_tot = st.groupBy("tok").agg(
        F.sum("cs").cast("long").alias("ct")
    )
    src_tot = st.groupBy("source").agg(
        F.sum("cs").cast("long").alias("ns")
    )
    glob = st.agg(
        F.sum("cs").cast("long").alias("nn"),
        F.countDistinct("tok").cast("long").alias("vv"),
    )
    j = (
        st.join(tok_tot, "tok")
        .join(F.broadcast(src_tot), "source")
        .crossJoin(F.broadcast(glob))
        .select(
            "source", "tok", "cs",
            (F.col("ct") - F.col("cs")).alias("cr"),
            "ns", (F.col("nn") - F.col("ns")).alias("nr"), "vv",
        )
    )
    num_s = (F.col("cs") + 1) / (
        F.col("ns") + F.col("vv") - F.col("cs") - 1
    )
    num_r = (F.col("cr") + 1) / (
        F.col("nr") + F.col("vv") - F.col("cr") - 1
    )
    z = (F.log(num_s) - F.log(num_r)) / F.sqrt(
        1 / (F.col("cs") + 1) + 1 / (F.col("cr") + 1)
    )
    scored = j.select(
        "source", F.col("tok").alias("token"),
        F.col("cs").alias("c_source"),
        F.round(z, 6).alias("z"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("z").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("source", "token", "c_source", "z")
    )


def textrank_top_sentence(
    docs: DataFrame, iterations: int = 4
) -> DataFrame:
    """(doc_id, n_sentences, sent_idx, score_micros) — extractive
    summarization as a query: each document's sentences ([.!?]+ runs,
    the flesch convention) form a within-document similarity graph
    (edge weight = shared distinct tokens), and TextRank (Mihalcea &
    Tarau 2004, public literature) runs ``iterations`` rounds of the
    damped weighted power iteration in exact integer micros:

        r_i ← 150000 + (85 · Σ_j (r_j·w_ji div W_j)) div 100

    (d = 0.85; W_j = Σ out-weight of j; per-term truncating div).  The
    emitted row is each doc's top sentence by (score DESC, idx ASC) —
    "summarize every document" as one declarative plan, no UDF.

    Scale shape: sentences/tokens are per-row expressions; the pair
    weights come from ONE within-doc token equi-join (fan-out bounded
    by per-document sentence counts, never cross-document); each
    iteration is one scatter join + map-side-combined groupBy on the
    within-doc edge table.  Sentence-less docs are excluded (stated)."""
    from graphlite_spark.functions.text import tokens_expr

    sent = docs.select(
        "doc_id",
        F.posexplode(
            F.split(F.col("text"), r"[.!?]+")
        ).alias("sent_idx", "s"),
    ).select(
        "doc_id", "sent_idx",
        F.array_distinct(tokens_expr(F.col("s"))).alias("toks"),
    ).where(F.size("toks") > 0)
    st = sent.select(
        "doc_id", "sent_idx", F.explode("toks").alias("tok")
    )
    w_edges = (
        st.alias("x")
        .join(
            st.alias("y"),
            (F.col("x.doc_id") == F.col("y.doc_id"))
            & (F.col("x.tok") == F.col("y.tok"))
            & (F.col("x.sent_idx") != F.col("y.sent_idx")),
        )
        .groupBy(
            F.col("x.doc_id").alias("doc_id"),
            F.col("x.sent_idx").alias("src"),
            F.col("y.sent_idx").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    wout = w_edges.groupBy("doc_id", "src").agg(
        F.sum("w").cast("long").alias("wt")
    )
    ew = w_edges.join(wout, ["doc_id", "src"])
    nodes = sent.select("doc_id", "sent_idx")
    r = nodes.select(
        "doc_id", "sent_idx",
        F.lit(1_000_000).cast("long").alias("r"),
    )
    for _ in range(iterations):
        contrib = (
            ew.join(
                r.select(
                    "doc_id",
                    F.col("sent_idx").alias("src"),
                    F.col("r").alias("rs"),
                ),
                ["doc_id", "src"],
            )
            .select(
                "doc_id",
                F.col("dst").alias("sent_idx"),
                F.expr("(rs * w) div wt").alias("t"),
            )
            .groupBy("doc_id", "sent_idx")
            .agg(F.sum("t").cast("long").alias("s"))
        )
        r = nodes.join(contrib, ["doc_id", "sent_idx"], "left").select(
            "doc_id", "sent_idx",
            (
                F.lit(150_000).cast("long")
                + F.expr("(85 * coalesce(s, 0)) div 100")
            ).cast("long").alias("r"),
        )
    nsent = nodes.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sentences")
    )
    w2 = Window.partitionBy("doc_id").orderBy(
        F.col("r").desc(), F.col("sent_idx").asc()
    )
    top = (
        r.withColumn("rk", F.row_number().over(w2))
        .where(F.col("rk") == 1)
        .select("doc_id", "sent_idx", F.col("r").alias("score_micros"))
    )
    return nsent.join(top, "doc_id").select(
        "doc_id", "n_sentences", "sent_idx", "score_micros"
    )


def burrows_delta(
    docs: DataFrame,
    top_n: int = 20,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source_a, source_b, n_words, delta_micros) — Burrows' Delta
    (Burrows 2002, public literature), the standard stylometric
    distance between text sources: z-score each source's relative
    frequency of the corpus's ``top_n`` most-common words against the
    across-source mean/std, then Delta = mean |z_a − z_b| over the
    word panel.  Low Delta = same "authorial hand" — the
    style-fingerprint companion to :func:`source_vocab_overlap`
    (which sees WHAT words, not their proportions) for
    provenance/contamination triage.

    Exactness: relative frequencies are truncating micros
    (10⁶·c div tot); the across-source population z clears its
    denominators — z = (k·f − S)/√(k·Σf² − S²) — so the ONE float per
    (source, word) term is an identically-structured sqrt expression
    rounded to micros; Delta is then an exact integer mean
    (truncating).  Words with zero across-source variance contribute
    z = 0 to every source.  Panel ties break (count DESC, word ASC).

    Scale shape: one token count groupBy, a top-n panel
    (TakeOrderedAndProject-sized), a k×n lattice with two broadcast
    joins — nothing beyond the token count touches corpus scale."""
    toks = docs.select(
        F.col(source_col).alias("s"),
        F.explode(tokens_expr(text_col)).alias("w"),
    )
    cnt = toks.groupBy("s", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = cnt.groupBy("s").agg(F.sum("c").cast("long").alias("tot"))
    panel = (
        cnt.groupBy("w").agg(F.sum("c").cast("long").alias("cw"))
        .orderBy(F.col("cw").desc(), F.col("w").asc())
        .limit(top_n)
        .select("w")
    )
    lattice = tot.crossJoin(F.broadcast(panel)).join(
        cnt, ["s", "w"], "left"
    ).select(
        "s", "w",
        F.expr("(1000000 * coalesce(c, 0)) div tot").cast("long")
        .alias("f"),
    )
    mom = lattice.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("f").cast("long").alias("sw"),
        F.sum(F.col("f") * F.col("f")).cast("long").alias("qw"),
    )
    z = lattice.join(F.broadcast(mom), "w").select(
        "s", "w",
        F.when(
            F.col("k") * F.col("qw") - F.col("sw") * F.col("sw") > 0,
            F.round(
                (F.col("k") * F.col("f") - F.col("sw")).cast("double")
                / F.sqrt(
                    (
                        F.col("k") * F.col("qw")
                        - F.col("sw") * F.col("sw")
                    ).cast("double")
                )
                * 1_000_000
            ),
        ).otherwise(F.lit(0)).cast("long").alias("z"),
    )
    za = z.select(
        F.col("s").alias("source_a"), "w", F.col("z").alias("za")
    )
    zb = z.select(
        F.col("s").alias("source_b"), "w", F.col("z").alias("zb")
    )
    return (
        za.join(zb, "w")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.abs(F.col("za") - F.col("zb"))).cast("long")
            .alias("zsum"),
        )
        .select(
            "source_a", "source_b", "n_words",
            F.expr("zsum div n_words").cast("long").alias(
                "delta_micros"
            ),
        )
    )


def umass_coherence(
    docs: DataFrame,
    top_n: int = 5,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(source, n_terms, n_pairs, coherence_micros) — UMass topic
    coherence (Mimno et al. 2011, public literature) treating each
    source's ``top_n`` most frequent terms as its "topic":
    C = Σ_{i<j, freq order} ln((D(wᵢ,wⱼ)+1)/D(wⱼ)) over the GLOBAL
    document-frequency table.  High (near 0) = the source's
    signature terms actually co-occur in documents — a coherent
    topical slice; very negative = a grab-bag.  The
    topic-quality readout next to :func:`burrows_delta` (style) and
    :func:`top_terms_per_doc` (which picks terms but never scores
    their mutual support).

    Exactness: each ordered pair's term rides the per-term
    micro-rounding discipline (one identical ln over exact BIGINT
    counts), summed exactly; per-source panels tie-break
    (count DESC, term ASC).

    Scale shape: one doc-term incidence groupBy; panels are
    per-source WindowGroupLimit rows; the pair table is
    sources·C(top_n,2) rows joined against incidence-count tables —
    codebook-sized throughout."""
    inc = docs.select(
        F.col(source_col).alias("s"), F.col(id_col).alias("d"),
        F.explode(tokens_expr(text_col)).alias("w"),
    ).distinct()
    dfreq = inc.groupBy("w").agg(
        F.countDistinct("d").cast("long").alias("dw")
    )
    scnt = (
        docs.select(
            F.col(source_col).alias("s"),
            F.explode(tokens_expr(text_col)).alias("w"),
        )
        .groupBy("s", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wr = Window.partitionBy("s").orderBy(
        F.col("c").desc(), F.col("w").asc()
    )
    panel = (
        scnt.withColumn("r", F.row_number().over(wr))
        .where(F.col("r") <= top_n)
        .select("s", "w", "r")
    )
    pa = panel.select("s", F.col("w").alias("wi"), F.col("r").alias("ri"))
    pb = panel.select("s", F.col("w").alias("wj"), F.col("r").alias("rj"))
    pairs = pa.join(pb, "s").where(F.col("ri") < F.col("rj"))
    pw = panel.select("w").distinct()
    inc_p = inc.select("d", "w").distinct().join(
        F.broadcast(pw), "w", "left_semi"
    )
    codoc = (
        inc_p.select("d", F.col("w").alias("wi"))
        .join(inc_p.select("d", F.col("w").alias("wj")), "d")
        .where(F.col("wi") != F.col("wj"))
        .groupBy("wi", "wj")
        .agg(F.countDistinct("d").cast("long").alias("dij"))
    )
    scored = (
        pairs.join(codoc, ["wi", "wj"], "left")
        .join(dfreq.select(F.col("w").alias("wj"), "dw"), "wj")
        .select(
            "s",
            F.round(
                F.lit(1_000_000.0)
                * F.log(
                    (
                        F.coalesce(F.col("dij"), F.lit(0)) + F.lit(1)
                    ).cast("double")
                    / F.col("dw").cast("double")
                )
            ).cast("long").alias("term"),
        )
    )
    return (
        scored.groupBy(F.col("s").alias("source"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("term").cast("long").alias("coherence_micros"),
        )
        .join(
            panel.groupBy(F.col("s").alias("source")).agg(
                F.count(F.lit(1)).cast("long").alias("n_terms")
            ),
            "source",
        )
        .select("source", "n_terms", "n_pairs", "coherence_micros")
    )
