"""Token co-occurrence graph construction (word-embedding prep).

word2vec/GloVe-style training starts from a co-occurrence matrix: for
every pair of vocabulary terms, in how many documents (or windows) do
both appear?  At corpus scale this is the canonical "almost quadratic"
trap — the safe shape is quadratic only PER DOCUMENT in its *distinct*
token count (bounded by document length, independent of corpus size),
then one map-side-combined count.

Scale discipline mirrors the dedup tier: stop tokens are dropped BEFORE
pair generation (a token in every document would otherwise contribute
|docs| rows per partner), pairs are ordered ``tok_a < tok_b`` so each
unordered pair appears once, and a ``min_count`` output filter keeps
the long tail of hapax pairs out of the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphlite_spark.functions.text import STOPWORDS, tokens_expr


def token_cooccurrence(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    drop_stopwords: bool = True,
) -> DataFrame:
    """(tok_a, tok_b, n_docs) — document-level co-occurrence counts for
    distinct token pairs, ``tok_a < tok_b``, kept when ``n_docs >=
    min_count``."""
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokens_expr(text_col))).alias("tok"),
    )
    if drop_stopwords:
        toks = toks.where(~F.col("tok").isin(*STOPWORDS))
    a = toks.select("doc_id", F.col("tok").alias("tok_a"))
    b = toks.select("doc_id", F.col("tok").alias("tok_b"))
    pairs = a.join(b, "doc_id").where(F.col("tok_a") < F.col("tok_b"))
    return (
        pairs.groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .where(F.col("n_docs") >= min_count)
    )


def skipgram_pairs(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 2,
    min_count: int = 1,
) -> DataFrame:
    """(center, context, n_pairs) — ordered skip-gram pair counts with a
    ``window``-token context (center at position i pairs with every
    token at i±1..i±window): the word2vec / GloVe training-pair
    extraction, the WINDOW-level sibling of the document-level
    :func:`token_cooccurrence`.  Directed counts — (a, b) and (b, a)
    are separate rows, the standard (center, context) convention.

    Scale shape: pair extraction is a PURE EXPRESSION (nested
    ``transform`` over the token positions inside whole-stage codegen —
    no posexplode self-join, no window function), fanning each token to
    at most 2·window rows; the only shuffle is the map-side-combined
    (center, context) count.  ``min_count`` prunes the long tail after
    the combine."""
    t = tokens_expr(text_col)
    n = F.size(t)
    inner = lambda i: F.transform(  # noqa: E731
        F.filter(
            F.sequence(
                F.greatest(F.lit(1), i - window),
                F.least(n, i + window),
            ),
            lambda j: j != i,
        ),
        lambda j: F.struct(
            F.element_at(t, i.cast("int")).alias("center"),
            F.element_at(t, j.cast("int")).alias("context"),
        ),
    )
    pairs = F.when(
        n >= 2,
        F.flatten(F.transform(F.sequence(F.lit(1), n), inner)),
    ).otherwise(
        F.array().cast("array<struct<center:string,context:string>>")
    )
    out = (
        docs.select(F.explode(pairs).alias("p"))
        .select("p.center", "p.context")
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
    if min_count > 1:
        out = out.where(F.col("n_pairs") >= min_count)
    return out


def source_vocab_overlap(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """(source_a, source_b, n_a, n_b, overlap, jaccard) — pairwise
    vocabulary Jaccard between ingestion sources (source_a < source_b):
    the corpus-composition diagnostic that flags sources drawing on the
    same generator/domain (near-identical vocabularies) or mislabeled
    splits, upstream of any per-document dedup.

    Exactness: three distinct counts and one 6dp-rounded division of
    exact BIGINTs.  Scale shape: one (group, token) distinct (map-side
    combined), then the pair stage SELF-JOINS ON THE TOKEN — per-token
    fan-out is C(sources-sharing-it, 2) ≤ C(S, 2), a constant bound in
    the source count S, so the join is linear in the vocabulary no
    matter how large the corpus; the S-row per-source totals broadcast
    back."""
    toks = docs.select(
        F.col(group_col).alias("g"),
        F.explode(F.array_distinct(tokens_expr(text_col))).alias("tok"),
    ).distinct()
    nv = toks.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = toks.select(F.col("tok"), F.col("g").alias("source_a"))
    b = toks.select(F.col("tok"), F.col("g").alias("source_b"))
    pairs = (
        a.join(b, "tok")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("overlap"))
    )
    na = nv.select(F.col("g").alias("source_a"), F.col("n").alias("n_a"))
    nb = nv.select(F.col("g").alias("source_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a", "source_b", "n_a", "n_b", "overlap",
            F.round(
                F.col("overlap").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("overlap")),
                6,
            ).alias("jaccard"),
        )
    )


def markov_stationary(
    events: DataFrame,
    iterations: int = 8,
    state_col: str = "event_type",
    actor_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """(state, stationary_micros) — the stationary distribution of the
    first-order behavior chain: transitions are consecutive
    ``state_col`` values within each actor's event sequence, and the
    distribution is ``iterations`` exact-integer power-iteration steps
    from uniform.  The steady-state answer to "where does user behavior
    spend its time" — the Markov readout that turns the transition
    matrix into one ranking.

    Exactness: micros with PER-TERM truncating division —
    p'_j = sum_i (p_i * c_ij) div r_i — the katz discipline, identical
    in both engines; truncation leaks <=k micros per step (stated, not
    hidden).  States with zero outgoing transitions leak their mass
    (absorbing-dangling, stated).

    Scale shape: the chain extraction is one per-actor window (never
    global) + one map-side-combined pair count; everything after runs
    on the k x k transition matrix — codebook-sized by definition, so
    the 8 iterations are k^2-row joins no matter how large the event
    log is."""
    w = Window.partitionBy(actor_col).orderBy(ts_col, tie_col)
    pr = events.select(
        F.lag(state_col).over(w).alias("a"),
        F.col(state_col).alias("b"),
    ).where(F.col("a").isNotNull())
    c = pr.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = c.groupBy("a").agg(F.sum("n").cast("long").alias("tot"))
    from graphlite_spark.checkpoint import truncate_plan

    # materialize the k x k transition codebook: the value iteration
    # references it every round — without this each round re-runs the
    # full per-actor lag pass over the fact table
    cm = truncate_plan(c.join(tot, "a"))

    states = events.select(F.col(state_col).alias("state")).distinct()
    kf = states.agg(F.count(F.lit(1)).cast("long").alias("k"))
    p = states.crossJoin(kf).select(
        "state",
        ((1000000 - 1000000 % F.col("k")) / F.col("k"))
        .cast("long")
        .alias("p"),
    )
    for _ in range(iterations):
        terms = p.join(cm, p["state"] == cm["a"]).select(
            F.col("b").alias("state2"),
            F.expr("(p * n) div tot").alias("term"),
        )
        nxt = terms.groupBy("state2").agg(
            F.sum("term").cast("long").alias("p2")
        )
        p = states.join(
            nxt, states["state"] == nxt["state2"], "left"
        ).select("state", F.coalesce("p2", F.lit(0)).cast("long").alias("p"))
    return p.select("state", F.col("p").alias("stationary_micros"))


def hitting_time(
    events: DataFrame,
    target: str,
    iterations: int = 8,
    state_col: str = "event_type",
    actor_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """(state, hitting_micros) — the ``iterations``-step truncated
    expected hitting time of ``target`` in the first-order behavior
    chain (same per-actor lag chain as :func:`markov_stationary`): how
    many events, on average, until a user whose last event was
    ``state`` next reaches ``target``.  Value iteration from h=0:

        h'(v) = 0                       if v == target
        h'(v) = 1 + sum_u P(v,u) h(u)   otherwise

    which converges to the true expectation from below; states that
    cannot reach ``target`` (or dangling states with no outgoing
    transition) grow toward the horizon rather than diverging — the
    truncation is the honest finite-compute answer and is stated, not
    hidden.

    Exactness: micros with PER-TERM truncating division —
    ``(h_u * c_vu) div tot_v`` summed — the :func:`markov_stationary` /
    katz discipline, identical in both engines (all quantities
    non-negative, so ``div`` vs floor never diverges).

    Scale shape: one per-actor window + one map-side-combined pair
    count; the value iteration then runs on the k x k transition
    matrix — codebook-sized, so the 8 rounds cost the same whether the
    event log has 1e3 or 1e12 rows."""
    w = Window.partitionBy(actor_col).orderBy(ts_col, tie_col)
    pr = events.select(
        F.lag(state_col).over(w).alias("a"),
        F.col(state_col).alias("b"),
    ).where(F.col("a").isNotNull())
    c = pr.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = c.groupBy("a").agg(F.sum("n").cast("long").alias("tot"))
    from graphlite_spark.checkpoint import truncate_plan

    # materialize the k x k transition codebook: the value iteration
    # references it every round — without this each round re-runs the
    # full per-actor lag pass over the fact table
    cm = truncate_plan(c.join(tot, "a"))

    states = events.select(F.col(state_col).alias("state")).distinct()
    h = states.select("state", F.lit(0).cast("long").alias("h"))
    for _ in range(iterations):
        terms = h.join(cm, h["state"] == cm["b"]).select(
            F.col("a").alias("state2"),
            F.expr("(h * n) div tot").alias("term"),
        )
        nxt = terms.groupBy("state2").agg(
            F.sum("term").cast("long").alias("s2")
        )
        h = states.join(
            nxt, states["state"] == nxt["state2"], "left"
        ).select(
            "state",
            F.when(F.col("state") == F.lit(target), F.lit(0))
            .otherwise(
                F.lit(1000000) + F.coalesce(F.col("s2"), F.lit(0))
            )
            .cast("long")
            .alias("h"),
        )
    return h.select("state", F.col("h").alias("hitting_micros"))


def conversion_prob(
    events: DataFrame,
    target: str,
    sink: str,
    iterations: int = 8,
    state_col: str = "event_type",
    actor_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """(state, p_micros) — the ``iterations``-step probability that the
    first-order behavior chain reaches ``target`` BEFORE ``sink``,
    starting from each state: the absorbing-Markov-chain conversion
    readout (will this user purchase before they error out?) a funnel
    team reads next to :func:`hitting_time`'s "how long".  Value
    iteration from p=0 with both absorbing states pinned:

        p'(v) = 1            if v == target
        p'(v) = 0            if v == sink
        p'(v) = sum_u P(v,u) p(u)   otherwise

    which converges to the true absorption probability from below;
    dangling states (no outgoing transition) honestly report 0 at the
    horizon rather than inventing mass.

    Exactness: micros with PER-TERM truncating division —
    ``(p_u * c_vu) div tot_v`` summed, the :func:`hitting_time`
    discipline (all quantities non-negative, so ``div`` == ``//``).

    Scale shape: identical to :func:`hitting_time` — one per-actor
    window + one map-side-combined pair count, then ``iterations``
    rounds on the k x k transition matrix (codebook-sized: the rounds
    cost the same at 1e3 or 1e12 events)."""
    w = Window.partitionBy(actor_col).orderBy(ts_col, tie_col)
    pr = events.select(
        F.lag(state_col).over(w).alias("a"),
        F.col(state_col).alias("b"),
    ).where(F.col("a").isNotNull())
    c = pr.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = c.groupBy("a").agg(F.sum("n").cast("long").alias("tot"))
    from graphlite_spark.checkpoint import truncate_plan

    # materialize the k x k transition codebook: the value iteration
    # references it every round — without this each round re-runs the
    # full per-actor lag pass over the fact table
    cm = truncate_plan(c.join(tot, "a"))

    states = events.select(F.col(state_col).alias("state")).distinct()
    p = states.select("state", F.lit(0).cast("long").alias("p"))
    for _ in range(iterations):
        terms = p.join(cm, p["state"] == cm["b"]).select(
            F.col("a").alias("state2"),
            F.expr("(p * n) div tot").alias("term"),
        )
        nxt = terms.groupBy("state2").agg(
            F.sum("term").cast("long").alias("s2")
        )
        p = states.join(
            nxt, states["state"] == nxt["state2"], "left"
        ).select(
            "state",
            F.when(F.col("state") == F.lit(target), F.lit(1000000))
            .when(F.col("state") == F.lit(sink), F.lit(0))
            .otherwise(F.coalesce(F.col("s2"), F.lit(0)))
            .cast("long")
            .alias("p"),
        )
    return p.select("state", F.col("p").alias("p_micros"))


def behavior_entropy(
    events: DataFrame,
    state_col: str = "event_type",
    actor_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """(state, n_next, tot, entropy_micros) — the conditional next-event
    entropy H(next | state) of the first-order behavior chain, in
    micro-nats: the predictability readout next to
    :func:`markov_stationary` (a state with near-zero entropy is a
    deterministic funnel step; a high-entropy state is where user paths
    actually branch).  ``n_next`` is the number of distinct observed
    successors, ``tot`` the outgoing transition count.

    Float discipline: each ``p·ln(p)`` term is computed from the exact
    integer ratio and rounded ONCE to integer micros (the tf_idf /
    powerlaw_alpha ln-then-round precedent), then summed as BIGINT —
    no float summation order; the final value is the negated BIGINT
    sum, exact cross-engine.

    Scale shape: one per-actor window + two map-side-combined
    aggregations on the k x k transition counts — codebook-sized."""
    w = Window.partitionBy(actor_col).orderBy(ts_col, tie_col)
    pr = events.select(
        F.lag(state_col).over(w).alias("a"),
        F.col(state_col).alias("b"),
    ).where(F.col("a").isNotNull())
    c = pr.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = c.groupBy("a").agg(F.sum("n").cast("long").alias("tot"))
    j = c.join(tot, "a").select(
        "a",
        "n",
        "tot",
        (F.col("n").cast("double") / F.col("tot")).alias("p"),
    ).select(
        "a",
        "n",
        "tot",
        F.round(F.col("p") * F.log(F.col("p")) * 1000000, 0)
        .cast("long")
        .alias("term"),
    )
    return j.groupBy("a").agg(
        F.count(F.lit(1)).cast("long").alias("n_next"),
        F.max("tot").cast("long").alias("tot"),
        (-F.sum("term")).cast("long").alias("entropy_micros"),
    ).select(
        F.col("a").alias("state"), "n_next", "tot", "entropy_micros"
    )


def source_jsd(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """(source_a, source_b, n_shared, jsd_micros) — pairwise
    Jensen–Shannon divergence between source UNIGRAM DISTRIBUTIONS (Lin
    1991, public literature), in micro-nats: the distributional
    complement of :func:`source_vocab_overlap` (two sources can share
    90% of their vocabulary yet use it with wildly different
    frequencies — JSD sees that, set Jaccard cannot).  The
    corpus-mixing diagnostic read before weighting sources.

    Decomposition that keeps the shared-token join linear: terms
    present in only one source contribute exactly p·ln 2, so
    JSD = ½[Σ_shared p·ln(2p/(p+q)) + (1−P_shared)·ln 2] + ½[mirror] —
    only SHARED tokens are ever joined (the source_vocab_overlap
    token-keyed self-join, per-token fan-out ≤ C(S,2)); the one-sided
    residual rides on the exact shared-count sums.  Pairs sharing NO
    token produce no row (their JSD is exactly ln 2 — absent by
    construction, stated).

    Exactness discipline: every per-term value is rounded ONCE to
    integer micros from a fixed float expression over exact BIGINT
    counts (products routed through double BEFORE multiplication so
    10¹²-token totals cannot overflow BIGINT — stated), then summed
    exactly; the two residual terms round once each; the final halving
    is a truncating integer division (both engines truncate toward
    zero).

    Scale shape: one (source, token) map-side-combined count, the
    token-keyed pair join, one pair-grouped aggregate, S-row totals
    broadcast."""
    tf = (
        docs.select(
            F.col(group_col).alias("g"),
            F.explode(tokens_expr(text_col)).alias("tok"),
        )
        .groupBy("g", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tot = tf.groupBy("g").agg(F.sum("c").cast("long").alias("t"))
    a = tf.select(
        "tok", F.col("g").alias("source_a"), F.col("c").alias("ca")
    )
    b = tf.select(
        "tok", F.col("g").alias("source_b"), F.col("c").alias("cb")
    )
    ta = tot.select(F.col("g").alias("source_a"), F.col("t").alias("ta"))
    tb = tot.select(F.col("g").alias("source_b"), F.col("t").alias("tb"))
    sh = (
        a.join(b, "tok")
        .where(F.col("source_a") < F.col("source_b"))
        .join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
    )
    denom = (
        F.col("ca").cast("double") * F.col("tb")
        + F.col("cb").cast("double") * F.col("ta")
    )
    term_a = F.round(
        (F.col("ca").cast("double") / F.col("ta"))
        * F.log((F.lit(2.0) * F.col("ca") * F.col("tb")) / denom)
        * 1000000,
        0,
    ).cast("long")
    term_b = F.round(
        (F.col("cb").cast("double") / F.col("tb"))
        * F.log((F.lit(2.0) * F.col("cb") * F.col("ta")) / denom)
        * 1000000,
        0,
    ).cast("long")
    g = sh.select(
        "source_a", "source_b", "ta", "tb",
        term_a.alias("xa"), term_b.alias("xb"),
        F.col("ca"), F.col("cb"),
    ).groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_shared"),
        F.sum("xa").cast("long").alias("sa"),
        F.sum("xb").cast("long").alias("sb"),
        F.sum("ca").cast("long").alias("csa"),
        F.sum("cb").cast("long").alias("csb"),
        F.max("ta").cast("long").alias("ta"),
        F.max("tb").cast("long").alias("tb"),
    )
    ra = F.round(
        (F.lit(1.0) - F.col("csa").cast("double") / F.col("ta"))
        * F.log(F.lit(2.0))
        * 1000000,
        0,
    ).cast("long")
    rb = F.round(
        (F.lit(1.0) - F.col("csb").cast("double") / F.col("tb"))
        * F.log(F.lit(2.0))
        * 1000000,
        0,
    ).cast("long")
    return (
        g.withColumn("xra", ra)
        .withColumn("xrb", rb)
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.expr("(sa + xra + sb + xrb) div 2").cast("long").alias(
                "jsd_micros"
            ),
        )
    )


def markov_attribution(
    events: DataFrame,
    target: str,
    sink: str,
    iterations: int = 8,
    state_col: str = "event_type",
    actor_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """(channel, p_full_micros, p_removed_micros,
    removal_effect_micros) — Markov removal-effect attribution
    (Anderl et al. 2016's data-driven attribution, public literature):
    how much of overall conversion each intermediate channel is
    RESPONSIBLE for, measured by deleting it.  For every non-absorbing
    state c, visits to c are redirected to the null sink (pinned
    p(c)=0) and the :func:`conversion_prob` value iteration reruns on
    the modified chain; the start-weighted conversion drop

        effect(c) = (P_full − P_without_c) / P_full

    is the channel's credit — the causal-flavored alternative to
    last-touch that a growth team reads next to the raw funnel.
    P is the absorption probability weighted by each actor's FIRST
    state (the journey entry distribution).

    Exactness: one value iteration over the (removed-channel × state)
    PRODUCT space — the '__full__' sentinel row carries the unmodified
    chain so full and counterfactuals share every code path; per-term
    truncating micro division throughout (:func:`hitting_time`
    discipline; removal is monotone under truncation, so the effect
    numerator is provably non-negative).  No float anywhere.

    Scale shape: the per-actor lag window and first-state row_number
    are the only passes over the event table; everything after is
    codebook-sized ((k+1)·k rows for k states) — the k×k matrix joins
    cost the same at 10^3 or 10^12 events.  One 1-row scalar action
    (actor count) rides back as a literal."""
    FULL = "__full__"
    w = Window.partitionBy(actor_col).orderBy(ts_col, tie_col)
    pr = events.select(
        F.lag(state_col).over(w).alias("a"),
        F.col(state_col).alias("b"),
    ).where(F.col("a").isNotNull())
    c = pr.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = c.groupBy("a").agg(F.sum("n").cast("long").alias("tot"))
    from graphlite_spark.checkpoint import truncate_plan

    # materialize the k x k transition codebook: the value iteration
    # references it every round — without this each round re-runs the
    # full per-actor lag pass over the fact table
    cm = truncate_plan(c.join(tot, "a"))

    states = events.select(F.col(state_col).alias("state")).distinct()
    chans = (
        states.where(~F.col("state").isin(target, sink))
        .select(F.col("state").alias("rm"))
        .unionAll(
            events.sparkSession.createDataFrame(
                [(FULL,)], "rm string"
            )
        )
    )
    grid = truncate_plan(chans.crossJoin(F.broadcast(states)))

    def pin(expr):
        return (
            F.when(F.col("state") == F.lit(target), F.lit(1000000))
            .when(F.col("state") == F.lit(sink), F.lit(0))
            .when(F.col("state") == F.col("rm"), F.lit(0))
            .otherwise(expr)
            .cast("long")
            .alias("p")
        )

    # plain-zero init (NOT pinned): 'iterations' then means the same
    # horizon as conversion_prob's — the two readouts stay comparable
    p = grid.select(
        "rm", "state", F.lit(0).cast("long").alias("p")
    )
    for _ in range(iterations):
        terms = p.join(cm, p["state"] == cm["b"]).select(
            F.col("rm").alias("rm2"),
            F.col("a").alias("state2"),
            F.expr("(p * n) div tot").alias("term"),
        )
        nxt = terms.groupBy("rm2", "state2").agg(
            F.sum("term").cast("long").alias("s2")
        )
        p = grid.join(
            nxt,
            (grid["rm"] == nxt["rm2"])
            & (grid["state"] == nxt["state2"]),
            "left",
        ).select(
            "rm", "state", pin(F.coalesce(F.col("s2"), F.lit(0)))
        )

    fw = Window.partitionBy(actor_col).orderBy(ts_col, tie_col)
    firsts = (
        events.select(
            F.col(actor_col).alias("u"),
            F.col(state_col).alias("state"),
            F.row_number().over(fw).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .groupBy("state")
        .agg(F.count(F.lit(1)).cast("long").alias("fcnt"))
    )
    n_actors = int(
        firsts.agg(F.sum("fcnt").alias("n")).first()["n"] or 0
    )
    if n_actors == 0:
        return events.sparkSession.createDataFrame(
            [],
            "channel string, p_full_micros long,"
            " p_removed_micros long, removal_effect_micros long",
        )
    pstart = (
        p.join(firsts, "state")
        .groupBy("rm")
        .agg(
            F.sum(F.expr(f"(fcnt * p) div {n_actors}"))
            .cast("long")
            .alias("p_start")
        )
    )
    full = pstart.where(F.col("rm") == FULL).select(
        F.col("p_start").alias("p_full_micros")
    )
    return (
        pstart.where(F.col("rm") != FULL)
        .crossJoin(F.broadcast(full))
        .select(
            F.col("rm").alias("channel"),
            "p_full_micros",
            F.col("p_start").alias("p_removed_micros"),
            F.when(
                F.col("p_full_micros") > 0,
                F.expr(
                    "((p_full_micros - p_start) * 1000000)"
                    " div p_full_micros"
                ),
            )
            .cast("long")
            .alias("removal_effect_micros"),
        )
    )


def markov_entropy_rate(
    events: DataFrame,
    state_col: str = "event_type",
    actor_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """(state, n_from, h_cond_micros, p_state_micros,
    contrib_micros) — the conditional (first-order Markov) entropy of
    the event stream: per current state, H(next | cur = s) =
    −Σ_t p(t|s)·log2 p(t|s) over the per-actor transition counts, plus
    the state's stationary-by-frequency weight and its contribution to
    the overall entropy RATE Σ_s p(s)·H(next|s) — how predictable is
    behavior one step out, and which states carry the surprise?
    (The unigram behavior-entropy readout can't see order; this is the
    bigram refinement — public information-theory textbook material.)

    Exactness: counts exact; each log2 term is a float over an exact
    integer ratio, structured identically on both engines, summed per
    state in deterministic (next-state) order via a sorted-array fold
    — no float-accumulation ambiguity — then rounded once to micros."""
    w = Window.partitionBy(actor_col).orderBy(ts_col, tie_col)
    pr = events.select(
        F.lag(state_col).over(w).alias("a"),
        F.col(state_col).alias("b"),
    ).where(F.col("a").isNotNull())
    c = pr.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = c.groupBy("a").agg(F.sum("n").cast("long").alias("na"))
    gt = tot.agg(F.sum("na").cast("long").alias("nn"))
    # deterministic-order per-state fold: sorted (b, n) array, sum of
    # -(n/na)*log2(n/na) in b order
    arr = (
        c.groupBy("a")
        .agg(F.sort_array(F.collect_list(F.struct("b", "n"))).alias("arr"))
        .join(tot, "a")
    )
    h = arr.select(
        "a", "na",
        F.aggregate(
            F.col("arr"),
            F.lit(0.0),
            lambda acc, x: acc
            - (x["n"].cast("double") / F.col("na"))
            * F.log2(x["n"].cast("double") / F.col("na")),
        ).alias("hc"),
    )
    return h.crossJoin(F.broadcast(gt)).select(
        F.col("a").alias("state"),
        F.col("na").alias("n_from"),
        F.round(F.lit(1_000_000.0) * F.col("hc"), 0)
        .cast("long").alias("h_cond_micros"),
        F.expr("(1000000 * na) div nn").cast("long")
        .alias("p_state_micros"),
        F.round(
            F.lit(1_000_000.0)
            * (F.col("na").cast("double") / F.col("nn"))
            * F.col("hc"),
            0,
        ).cast("long").alias("contrib_micros"),
    )
