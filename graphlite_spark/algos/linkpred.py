"""Link prediction over the undirected closure: Adamic-Adar scores.

The classic common-neighbor predictor for link graphs:
``AA(u, v) = Σ_{w ∈ N(u) ∩ N(v)} 1 / ln(deg(w))`` for non-adjacent pairs
(u, v).  Spark shape: wedge enumeration through the common neighbor
(``(w,u) ⋈ (w,v)`` on the symmetric edge table) followed by one grouped
sum — the same wedge-join shape as triangle counting.

Scale discipline (the lesson of the dedup tier): the wedge join is
quadratic in the center's degree, so super-hub centers are EXCLUDED by
default (``max_wedge_degree=100``).  That is also statistically standard
— a w shared by thousands of vertices contributes ~no signal
(1/ln(deg) → 0) at quadratic cost.  Pass ``None`` to opt out.

Scores are integer-exact: the per-center weight is
``round(1e6 / ln(deg(w)))`` micro-units summed as BIGINT, so the oracle
comparison is hash-exact with no float-summation-order discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphlite_spark.algos.components import symmetrize


def jaccard_similarity(
    edges: DataFrame,
    max_wedge_degree: int | None = 100,
    min_score_micros: int = 100_000,
) -> DataFrame:
    """(u, v, cn, jaccard_micros) — neighborhood Jaccard for non-adjacent
    pairs u < v with at least one (non-hub) common neighbor:
    ``|N(u) ∩ N(v)| / |N(u) ∪ N(v)|`` as ``(10^6 · cn) div
    (deg(u) + deg(v) − cn)`` — counts and one integer division, so the
    oracle comparison is hash-exact.

    Same wedge-enumeration shape and hub discipline as
    :func:`adamic_adar`: centers with degree > ``max_wedge_degree`` are
    excluded BEFORE the quadratic self-join, making ``cn`` a lower bound
    when the cap binds (the union-size denominator stays exact — degrees
    are computed on the full graph); pass ``None`` to opt out."""
    und = symmetrize(edges).select("src", "dst")
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ctr = deg.where(F.col("deg") >= 2)
    if max_wedge_degree is not None:
        ctr = ctr.where(F.col("deg") <= max_wedge_degree)
    ctr = ctr.select(F.col("src").alias("w"))
    e1 = und.select(F.col("src").alias("w"), F.col("dst").alias("u"))
    e2 = und.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    wedges = e1.join(ctr, "w").join(e2, "w").where(F.col("u") < F.col("v"))
    pairs = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cn")
    )
    existing = und.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    cand = pairs.join(existing, ["u", "v"], "left_anti")
    du = deg.select(F.col("src").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("src").alias("v"), F.col("deg").alias("dv"))
    return (
        cand.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "cn",
            F.expr("(1000000 * cn) div (du + dv - cn)")
            .cast("long")
            .alias("jaccard_micros"),
        )
        .where(F.col("jaccard_micros") >= min_score_micros)
    )


def adamic_adar(
    edges: DataFrame,
    max_wedge_degree: int | None = 100,
    min_score_micros: int = 1_000_000,
) -> DataFrame:
    """(u, v, aa_micros) — Adamic-Adar scores in exact micro-units for
    non-adjacent pairs u < v with at least one (non-hub) common neighbor
    and score >= ``min_score_micros``."""
    und = symmetrize(edges).select("src", "dst")
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ctr = deg.where(F.col("deg") >= 2)
    if max_wedge_degree is not None:
        ctr = ctr.where(F.col("deg") <= max_wedge_degree)
    ctr = ctr.select(
        F.col("src").alias("w"),
        F.round(F.lit(1_000_000.0) / F.log(F.col("deg")), 0)
        .cast("long")
        .alias("wt"),
    )
    e1 = und.select(F.col("src").alias("w"), F.col("dst").alias("u"))
    e2 = und.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    # join the capped center table BEFORE the wedge self-join: hub
    # centers must be excluded ahead of the quadratic fan-out, not
    # filtered out of its output
    wedges = (
        e1.join(ctr, "w")
        .join(e2, "w")
        .where(F.col("u") < F.col("v"))
    )
    pairs = wedges.groupBy("u", "v").agg(
        F.sum("wt").cast("long").alias("aa_micros")
    )
    existing = und.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    return pairs.join(existing, ["u", "v"], "left_anti").where(
        F.col("aa_micros") >= min_score_micros
    )


def resource_allocation(
    edges: DataFrame,
    max_wedge_degree: int | None = 100,
    min_score_micros: int = 100_000,
) -> DataFrame:
    """(u, v, ra_micros) — Resource Allocation index (Zhou, Lü &
    Zhang 2009) in exact micro-units for non-adjacent pairs u < v:
    ``RA(u, v) = Σ_{w ∈ N(u) ∩ N(v)} 1 / deg(w)``.  The harder-decaying
    sibling of :func:`adamic_adar` (1/deg vs 1/ln deg) — the empirically
    strongest of the classic common-neighbor predictors on dense local
    structure, and the remaining member of the CN family next to
    :func:`adamic_adar` / :func:`jaccard_similarity`.

    Same wedge-enumeration shape and hub discipline: centers with degree
    > ``max_wedge_degree`` are excluded BEFORE the quadratic self-join
    (statistically standard — a hub's 1/deg contribution is ~0 at
    quadratic cost).  Per-center weight is ``round(1e6 / deg(w))``
    summed as BIGINT, so the oracle comparison is hash-exact."""
    und = symmetrize(edges).select("src", "dst")
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ctr = deg.where(F.col("deg") >= 2)
    if max_wedge_degree is not None:
        ctr = ctr.where(F.col("deg") <= max_wedge_degree)
    ctr = ctr.select(
        F.col("src").alias("w"),
        F.round(F.lit(1_000_000.0) / F.col("deg"), 0)
        .cast("long")
        .alias("wt"),
    )
    e1 = und.select(F.col("src").alias("w"), F.col("dst").alias("u"))
    e2 = und.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    wedges = e1.join(ctr, "w").join(e2, "w").where(F.col("u") < F.col("v"))
    pairs = wedges.groupBy("u", "v").agg(
        F.sum("wt").cast("long").alias("ra_micros")
    )
    existing = und.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    return pairs.join(existing, ["u", "v"], "left_anti").where(
        F.col("ra_micros") >= min_score_micros
    )


def preferential_attachment(
    edges: DataFrame,
    max_wedge_degree: int | None = 100,
    min_score: int = 1,
) -> DataFrame:
    """(u, v, cn, pa_score) — Preferential Attachment score
    ``deg(u) · deg(v)`` (Barabási–Albert growth model) for the same
    candidate set as the other predictors: non-adjacent pairs u < v
    sharing at least one non-hub common neighbor.  Restricting PA to
    wedge candidates keeps the output linear in wedges (raw PA over ALL
    non-edges is V²-quadratic by definition); degrees are computed on
    the full graph, so the score itself is uncapped and exact BIGINT —
    no rounding discipline needed at all.

    ``cn`` (the common-neighbor count through non-hub centers) rides
    along so one frame serves both the PA and plain-CN baselines."""
    und = symmetrize(edges).select("src", "dst")
    deg = und.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    ctr = deg.where(F.col("deg") >= 2)
    if max_wedge_degree is not None:
        ctr = ctr.where(F.col("deg") <= max_wedge_degree)
    ctr = ctr.select(F.col("src").alias("w"))
    e1 = und.select(F.col("src").alias("w"), F.col("dst").alias("u"))
    e2 = und.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    wedges = e1.join(ctr, "w").join(e2, "w").where(F.col("u") < F.col("v"))
    pairs = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cn")
    )
    existing = und.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    cand = pairs.join(existing, ["u", "v"], "left_anti")
    du = deg.select(F.col("src").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("src").alias("v"), F.col("deg").alias("dv"))
    return (
        cand.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "cn",
            (F.col("du") * F.col("dv")).cast("long").alias("pa_score"),
        )
        .where(F.col("pa_score") >= min_score)
    )


def linkpred_auc(
    edges: DataFrame,
    max_wedge_degree: int | None = 100,
) -> DataFrame:
    """One row (n_pos, n_neg, auc_micros) — exact Mann-Whitney AUC of
    the neighborhood-Jaccard score over the wedge-candidate pairs: can
    the score separate actual edges (positives) from non-adjacent
    2-hop pairs (negatives)?  The standard candidate-restricted
    link-prediction evaluation — the training-eval readout next to the
    sampler (:func:`~graphlite_spark.algos.sampling.negative_edges`)
    and the scorers above.

    Exactness: scores are the integer ``jaccard_micros``; ties are
    handled by MIDRANKS computed from per-score counts, and the U
    statistic rides the identity ``2·Σ_pos midrank − P(P+1) = 2U ≥ 0``
    so the final division is over non-negative BIGINTs (Spark ``div``
    and DuckDB ``//`` agree) — the 6-figure AUC is oracle-exact.
    ``auc_micros`` is NULL when either class is empty.

    Scale shape: the same capped wedge enumeration as
    :func:`jaccard_similarity` (hub centers excluded before the
    quadratic join); the rank pass groups pairs BY SCORE first, so the
    cumulative window runs over at most 1e6+1 rows (micro-quantized
    scores are value-bounded) — never over the data-sized pair frame."""
    from pyspark.sql import Window

    und = symmetrize(edges).select("src", "dst")
    deg = und.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    ctr = deg.where(F.col("deg") >= 2)
    if max_wedge_degree is not None:
        ctr = ctr.where(F.col("deg") <= max_wedge_degree)
    ctr = ctr.select(F.col("src").alias("w"))
    e1 = und.select(F.col("src").alias("w"), F.col("dst").alias("u"))
    e2 = und.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    wedges = e1.join(ctr, "w").join(e2, "w").where(F.col("u") < F.col("v"))
    pairs = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cn")
    )
    existing = und.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.lit(1).alias("pos")
    )
    du = deg.select(F.col("src").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("src").alias("v"), F.col("deg").alias("dv"))
    scored = (
        pairs.join(existing, ["u", "v"], "left")
        .join(du, "u")
        .join(dv, "v")
        .select(
            F.expr("(1000000 * cn) div (du + dv - cn)").alias("score"),
            F.coalesce("pos", F.lit(0)).alias("pos"),
        )
    )
    sc = scored.groupBy("score").agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.count(F.lit(1)).cast("long").alias("n_all"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    ranked = sc.withColumn(
        "c_less", (F.sum("n_all").over(w) - F.col("n_all")).cast("long")
    )
    return ranked.agg(
        F.sum("n_pos").cast("long").alias("p"),
        F.sum(F.col("n_all") - F.col("n_pos")).cast("long").alias("n"),
        F.sum(
            F.col("n_pos") * (2 * F.col("c_less") + F.col("n_all") + 1)
        )
        .cast("long")
        .alias("s"),
    ).select(
        F.coalesce("p", F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_neg"),
        F.when(
            (F.col("p") > 0) & (F.col("n") > 0),
            F.expr("(1000000 * (s - p * (p + 1))) div (2 * p * n)"),
        )
        .cast("long")
        .alias("auc_micros"),
    )


def linkpred_average_precision(
    edges: DataFrame,
    max_wedge_degree: int | None = 100,
) -> DataFrame:
    """One row (n_pos, n_cand, ap_micros) — average precision (the
    area under the precision-recall curve in its interpolation-free
    discrete form) of the neighborhood-Jaccard score over the wedge-
    candidate pairs.  The rank-quality companion to
    :func:`linkpred_auc`: ROC-AUC is prevalence-blind, but with the
    heavy negative skew of link prediction (a few thousand true edges
    among millions of 2-hop pairs at web scale) AP is the number that
    moves when the TOP of the ranking improves — the metric a
    retrieval or hard-negative-mining loop should actually track.

    AP = (1/P) Σ_{k : candidate k is positive} Precision@k over the
    deterministic total order (score DESC, u ASC, v ASC).

    Exactness: scores are integer ``jaccard_micros``; each
    Precision@k is the truncating division (10⁶·cum_pos) div k and AP
    is the truncating mean of those BIGINT terms — per-term truncation
    is part of the spec, mirrored exactly by the oracle.  NULL when
    there are no positive candidates.

    Scale shape: the same capped wedge enumeration as
    :func:`linkpred_auc`; the ranking is ONE global-order row_number
    over the candidate frame (the exact-ranking trade the module's
    eval queries share — candidates are wedge-bounded, not V²)."""
    from pyspark.sql import Window

    und = symmetrize(edges).select("src", "dst")
    deg = und.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    ctr = deg.where(F.col("deg") >= 2)
    if max_wedge_degree is not None:
        ctr = ctr.where(F.col("deg") <= max_wedge_degree)
    ctr = ctr.select(F.col("src").alias("w"))
    e1 = und.select(F.col("src").alias("w"), F.col("dst").alias("u"))
    e2 = und.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    wedges = e1.join(ctr, "w").join(e2, "w").where(F.col("u") < F.col("v"))
    pairs = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cn")
    )
    existing = und.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.lit(1).alias("pos")
    )
    du = deg.select(F.col("src").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("src").alias("v"), F.col("deg").alias("dv"))
    scored = (
        pairs.join(existing, ["u", "v"], "left")
        .join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            F.expr("(1000000 * cn) div (du + dv - cn)").alias("score"),
            F.coalesce("pos", F.lit(0)).cast("long").alias("pos"),
        )
    )
    w = Window.orderBy(
        F.col("score").desc(), F.col("u").asc(), F.col("v").asc()
    )
    wk = Window.orderBy(
        F.col("score").desc(), F.col("u").asc(), F.col("v").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = scored.select(
        "pos",
        F.row_number().over(w).cast("long").alias("k"),
        F.sum("pos").over(wk).cast("long").alias("cum_pos"),
    )
    return ranked.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.count(F.lit(1)).cast("long").alias("n_cand"),
        F.sum(
            F.when(
                F.col("pos") == 1,
                F.expr("(1000000 * cum_pos) div k"),
            )
        ).cast("long").alias("ap_sum"),
    ).select(
        F.coalesce("n_pos", F.lit(0)).cast("long").alias("n_pos"),
        "n_cand",
        F.when(
            F.col("n_pos") > 0,
            F.expr("ap_sum div n_pos"),
        ).cast("long").alias("ap_micros"),
    )


def simrank_wedge(
    edges: DataFrame,
    c_micros: int = 800_000,
    max_wedge_degree: int | None = 100,
) -> DataFrame:
    """(u, v, s1_micros, s2_micros) — two unrolled SimRank iterations
    (Jeh & Widom 2002, public literature) on the undirected graph,
    evaluated on the wedge-candidate support: "two users are similar
    if their neighbors are similar", the recursive generalization of
    the common-neighbor count that :func:`jaccard_similarity` and
    :func:`adamic_adar` flatten to one hop.

    s0 = identity, so s1(a,b) = (C·cn) div (d_a·d_b) exactly;
    s2(a,b) sums s1 over all neighbor pairs (i,j) ∈ N(a)×N(b):
    the i = j diagonal contributes 10⁶·cn and the off-diagonal part
    joins through the s1 support table in both orientations —
    SUPPORT-PRUNED SimRank (pairs outside the wedge support carry
    s1 = 0 by construction and are dropped from the propagation),
    the standard sparsification for the O(V²) exact state.

    Exactness: every division is the truncating micros form
    (s2 = (C·Σ) div (d_a·d_b·10⁶)); ordering-free sums; the oracle
    unrolls the identical two iterations.

    Scale shape: wedge centers are degree-capped before the
    quadratic join (the module-wide hub rule); the propagation join
    is bounded by Σ_{(i,j)∈s1} d_i·d_j with capped enumeration —
    never V² and never hub-quadratic."""
    und = symmetrize(edges).select("src", "dst")
    deg = und.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    ctr = deg.where(F.col("deg") >= 2)
    if max_wedge_degree is not None:
        ctr = ctr.where(F.col("deg") <= max_wedge_degree)
    ctr = ctr.select(F.col("src").alias("w"))
    e1 = und.select(F.col("src").alias("w"), F.col("dst").alias("u"))
    e2 = und.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    wedges = e1.join(ctr, "w").join(e2, "w").where(F.col("u") < F.col("v"))
    pairs = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cn")
    )
    du = deg.select(F.col("src").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("src").alias("v"), F.col("deg").alias("dv"))
    C = int(c_micros)
    s1 = (
        pairs.join(du, "u").join(dv, "v")
        .select(
            "u", "v", "cn", "du", "dv",
            F.expr(f"({C} * cn) div (du * dv)").cast("long").alias(
                "s1_micros"
            ),
        )
    )
    # symmetric closure of the s1 support for the propagation join
    s1b = s1.select(
        F.col("u").alias("i"), F.col("v").alias("j"),
        F.col("s1_micros").alias("s"),
    ).unionByName(
        s1.select(
            F.col("v").alias("i"), F.col("u").alias("j"),
            F.col("s1_micros").alias("s"),
        )
    )
    ea = und.select(F.col("src").alias("a"), F.col("dst").alias("i"))
    eb = und.select(F.col("src").alias("b"), F.col("dst").alias("j"))
    off = (
        ea.join(s1b, "i")
        .join(eb, "j")
        .where(F.col("a") < F.col("b"))
        .groupBy(F.col("a").alias("u"), F.col("b").alias("v"))
        .agg(F.sum("s").cast("long").alias("off_sum"))
    )
    return (
        s1.join(off, ["u", "v"], "left")
        .select(
            "u", "v", "s1_micros",
            F.expr(
                f"({C} * (1000000 * cn + coalesce(off_sum, 0)))"
                " div (du * dv * 1000000)"
            ).cast("long").alias("s2_micros"),
        )
    )
