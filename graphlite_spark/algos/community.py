"""Louvain-style community refinement — one exact best-gain move round.

Louvain (Blondel et al. 2008, public literature) greedily moves each
vertex to the neighboring community with the largest modularity gain.
The sequential algorithm is order-dependent; the parallel variant here
is the synchronized round big-graph systems actually run: every vertex
evaluates its move against the SAME input partition and all moves apply
at once.  Determinism comes from exact integer arithmetic — with
m2 = |directed representations| = 2m, the gain of moving v from its
community a to a neighboring community c, scaled by 2m² (a positive
constant), is

    score(v, c) = m2·(e_vc − e_va) − d_v·(S_c − S_a + d_v)

with e_vx = edges from v into x, S_x = degree sum of x, all BIGINT-exact
(no float gain ever exists, so ties and signs cannot flip across
engines; at 10^12 edges the m2·e product needs DECIMAL — documented
bound: |score| < m2·d_v).  v moves iff the best score is positive;
tie-break = smallest community id.

Scale shape: one degree count, one per-community strength aggregate
(map-side combined), one (v, neighbor-community) edge-count groupBy, one
`partitionBy(v)` window for the argmax (WindowGroupLimit — partial top-1
before the exchange).  No global window, no cartesian; the single
driver-side scalar is m2 (one count action).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphlite_spark.algos.components import symmetrize


def louvain_move(
    edges: DataFrame, labels: DataFrame, label_col: str = "label"
) -> DataFrame:
    """(id, label) — the partition after one synchronized best-gain move
    round from ``labels (id, label)``; vertices with no positive-gain
    move (or no neighbors) keep their label."""
    und = symmetrize(edges).select("src", "dst").persist()
    try:
        m2 = und.count()
        lab = labels.select("id", F.col(label_col).alias("label"))
        deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        strength = (
            lab.join(deg, lab["id"] == deg["src"])
            .groupBy("label")
            .agg(F.sum("d").alias("s"))
        )
        evc = (
            und.join(
                lab.select(F.col("id").alias("dst"), F.col("label").alias("c")),
                "dst",
            )
            .groupBy("src", "c")
            .agg(F.count(F.lit(1)).alias("e"))
        )
        own = lab.select(F.col("id").alias("src"), F.col("label").alias("a"))
        ev = evc.join(own, "src")
        eva = ev.where(F.col("c") == F.col("a")).select(
            "src", F.col("e").alias("ea")
        )
        sc = strength.select(F.col("label").alias("c"), F.col("s").alias("s_c"))
        sa = strength.select(F.col("label").alias("a"), F.col("s").alias("s_a"))
        cand = (
            ev.where(F.col("c") != F.col("a"))
            .join(eva, "src", "left")
            .join(sc, "c")
            .join(sa, "a")
            .join(deg, "src")
            .select(
                "src",
                "c",
                (
                    F.lit(m2) * (F.col("e") - F.coalesce("ea", F.lit(0)))
                    - F.col("d") * (F.col("s_c") - F.col("s_a") + F.col("d"))
                ).alias("score"),
            )
        )
        w = Window.partitionBy("src").orderBy(
            F.col("score").desc(), F.col("c").asc()
        )
        best = (
            cand.where(F.col("score") > 0)
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("src").alias("id"), F.col("c").alias("new_label"))
        )
        out = lab.join(best, "id", "left").select(
            "id", F.coalesce("new_label", F.col("label")).alias("label")
        )
        # materialize before releasing the undirected closure
        return out.localCheckpoint(eager=True)
    finally:
        und.unpersist()


def conductance(
    edges: DataFrame,
    labels: DataFrame,
    top_k: int = 5,
    label_col: str = "label",
) -> DataFrame:
    """(label, n_vertices, volume, cut_edges, conductance) for the
    ``top_k`` largest communities of ``labels (id, label)`` — the classic
    community-quality measure φ(C) = cut(C) / min(vol(C), vol(V)−vol(C))
    over the undirected closure (Kannan, Vempala & Vetta 2004, public
    literature): how leaky each community's boundary is.

    Exact integers everywhere (volumes count directed representations,
    cuts count reps leaving the community — each undirected cut edge
    contributes exactly one rep from the inside); one 6dp division per
    row, NULL when the community is the whole volume.  Scale shape: two
    vertex-sized label joins + three map-side-combined grouped counts;
    the top-k label list is a TakeOrdered collect (codebook-sized, like
    the kmeans centroids), never a global window."""
    und = symmetrize(edges).select("src", "dst")
    lab = labels.select("id", F.col(label_col).alias("label"))
    top = [
        r["label"]
        for r in labels.groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("label"))
        .limit(top_k)
        .collect()
    ]
    sizes = (
        lab.where(F.col("label").isin(top))
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
    )
    ls = lab.select(F.col("id").alias("src"), F.col("label").alias("sl"))
    ld = lab.select(F.col("id").alias("dst"), F.col("label").alias("dl"))
    ee = und.join(ls, "src").join(ld, "dst")
    m2 = und.count()
    per = (
        ee.where(F.col("sl").isin(top))
        .groupBy(F.col("sl").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("volume"),
            F.sum((F.col("sl") != F.col("dl")).cast("long"))
            .cast("long")
            .alias("cut_edges"),
        )
    )
    den = F.least(F.col("volume"), F.lit(m2) - F.col("volume"))
    return (
        sizes.join(per, "label", "left")
        .select(
            "label",
            "n_vertices",
            F.coalesce("volume", F.lit(0)).cast("long").alias("volume"),
            F.coalesce("cut_edges", F.lit(0)).cast("long").alias("cut_edges"),
        )
        .select(
            "label",
            "n_vertices",
            "volume",
            "cut_edges",
            F.when(
                den > 0,
                F.round(
                    F.col("cut_edges").cast("double") / den.cast("double"), 6
                ),
            ).alias("conductance"),
        )
    )


def contract_graph(
    edges: DataFrame,
    labels: DataFrame,
    id_col: str = "id",
    label_col: str = "label",
) -> DataFrame:
    """(c_src, c_dst, n_edges) — the quotient (contracted) graph over a
    vertex labeling: every directed edge is re-keyed to its endpoints'
    community labels and multiplicities summed.  Self-rows
    (``c_src == c_dst``) are the intra-community edge counts — kept,
    because they are the modularity/coarsening numerator; the
    Louvain-style next level runs on exactly this frame.

    Scale shape: two vertex-keyed equi-joins (src then dst) and one
    map-side-combined count on the label pair — label frames are
    vertex-sized, so at web scale both joins co-locate with the
    engine's src-hash partitioning and the pair count collapses the
    billion-edge frame to the community-pair table."""
    ls = labels.select(
        F.col(id_col).alias("src"), F.col(label_col).alias("c_src")
    )
    ld = labels.select(
        F.col(id_col).alias("dst"), F.col(label_col).alias("c_dst")
    )
    return (
        edges.join(ls, "src")
        .join(ld, "dst")
        .groupBy("c_src", "c_dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    )


def label_spreading(
    vertices: DataFrame,
    edges: DataFrame,
    labels: DataFrame,
    label_values: tuple[str, ...],
    seed_mod: int = 3,
    iterations: int = 6,
) -> DataFrame:
    """(id, seed, p_<label>_micros...) — semi-supervised label
    propagation (Zhu & Ghahramani 2002's harmonic function, public
    literature): seed vertices (``id % seed_mod == 0``, a deterministic
    holdout) keep their one-hot label distribution pinned; every other
    vertex repeatedly adopts the AVERAGE of its neighbors'
    distributions over the undirected closure — after ``iterations``
    rounds the unlabeled mass has diffused from the seeds, the
    classic "label the 1% you have, spread to the 99%" GNN-adjacent
    baseline (LPA's probabilistic sibling: lpa hard-assigns by
    majority, this keeps the full distribution).

    Exactness: distributions ride integer micros; the per-round
    neighbor average is a truncating div by the undirected degree, so
    non-seed rows may sum slightly under 10^6 (stated truncation
    residue, identical on both engines).  Isolated non-seeds stay
    all-zero.

    Scale shape: one symmetrize + degree pass, then per round ONE
    scatter equi-join (arcs x current frame) and one map-side-combined
    groupBy — the linear-loop Pregel shape (no self-join, so no
    plan-stat squaring; lineage stays ``iterations`` deep, fine at 6)."""
    from graphlite_spark.checkpoint import truncate_plan

    # the scatter join references arcs every round and the pin/degree
    # frame every round — materialize both once (linear loop: the
    # evolving p itself needs no truncation, CLAUDE.md rule)
    arcs = truncate_plan(symmetrize(edges).select("src", "dst"))
    deg = arcs.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("dg")
    )
    pcols = [f"p_{v}_micros" for v in label_values]
    base = (
        vertices.select("id")
        .join(labels, "id")
        .select(
            "id",
            (F.col("id") % seed_mod == 0).cast("int").alias("seed"),
            *[
                F.when(
                    (F.col("id") % seed_mod == 0)
                    & (F.col("label") == F.lit(v)),
                    F.lit(1_000_000),
                )
                .otherwise(F.lit(0))
                .cast("long")
                .alias(c)
                for v, c in zip(label_values, pcols)
            ],
        )
        .join(deg, "id", "left")
        .select(
            "id", "seed",
            F.coalesce("dg", F.lit(0)).cast("long").alias("dg"),
            *pcols,
        )
    )
    base = truncate_plan(base)
    p = base.select("id", *pcols)
    for _ in range(iterations):
        sums = (
            arcs.join(p.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(
                *[F.sum(c).cast("long").alias("s_" + c) for c in pcols]
            )
        )

        def _avg(c: str):
            s = F.coalesce(F.col("s_" + c), F.lit(0).cast("long"))
            return ((s - s % F.col("dg")) / F.col("dg")).cast("long")

        p = base.join(sums, "id", "left").select(
            "id",
            *[
                F.when(F.col("seed") == 1, F.col(c))
                .when(F.col("dg") > 0, _avg(c))
                .otherwise(F.lit(0))
                .cast("long")
                .alias(c)
                for c in pcols
            ],
        )
    return base.select("id", "seed").join(p, "id").select(
        "id", "seed", *pcols
    )


def guimera_amaral_roles(
    edges: DataFrame,
    labels: DataFrame,
    top_k: int = 20,
) -> DataFrame:
    """(id, degree, k_within, participation_micros, z_micros) — the
    Guimerà–Amaral functional cartography (Nature 2005, public
    literature) of a partition: per vertex the participation
    coefficient P = 1 − Σ_c (k_c/k)² (0 = all edges inside one
    module, →1 = edges spread across modules) and the within-module
    degree z-score (hub-ness RELATIVE to the vertex's own module).
    Together they classify provincial hubs vs connector hubs — the
    role map community detection is usually run FOR.  Top ``top_k``
    by (z DESC, id ASC).

    Exactness: P rides the exact truncating form
    10⁶ − (10⁶·Σk_c²) div k²; z clears both module moments —
    z = (n·k_w − S)/√(n·Q − S²) — so its ONE float is an
    identically-shaped sqrt expression rounded to micros per vertex
    (0 where the module variance is 0).

    Scale shape: one edge→label join (broadcastable label table or
    shuffle on id), one (vertex, neighbor-community) groupBy, one
    module-sized moment aggregate joined back — no quadratic path."""
    from graphlite_spark.algos.components import symmetrize

    und = symmetrize(edges).select("src", "dst")
    lab = labels.select("id", "label")
    tagged = (
        und.join(lab.select(F.col("id").alias("src"),
                            F.col("label").alias("ls")), "src")
        .join(lab.select(F.col("id").alias("dst"),
                         F.col("label").alias("ld")), "dst")
    )
    percom = tagged.groupBy(
        F.col("src").alias("id"), F.col("ls").alias("own"),
        F.col("ld").alias("c"),
    ).agg(F.count(F.lit(1)).cast("long").alias("kc"))
    per = percom.groupBy("id", "own").agg(
        F.sum("kc").cast("long").alias("k"),
        F.sum(F.col("kc") * F.col("kc")).cast("long").alias("ksq"),
        F.sum(
            F.when(F.col("c") == F.col("own"), F.col("kc"))
            .otherwise(F.lit(0))
        ).cast("long").alias("kw"),
    )
    mod = per.groupBy("own").agg(
        F.count(F.lit(1)).cast("long").alias("nm"),
        F.sum("kw").cast("long").alias("sm"),
        F.sum(F.col("kw") * F.col("kw")).cast("long").alias("qm"),
    )
    return (
        per.join(mod, "own")
        .select(
            "id",
            F.col("k").alias("degree"),
            F.col("kw").alias("k_within"),
            (
                F.lit(1_000_000)
                - F.expr("(1000000 * ksq) div (k * k)")
            ).cast("long").alias("participation_micros"),
            F.when(
                F.col("nm") * F.col("qm") - F.col("sm") * F.col("sm")
                > 0,
                F.round(
                    (F.col("nm") * F.col("kw") - F.col("sm"))
                    .cast("double")
                    / F.sqrt(
                        (
                            F.col("nm") * F.col("qm")
                            - F.col("sm") * F.col("sm")
                        ).cast("double")
                    )
                    * 1_000_000
                ),
            ).otherwise(F.lit(0)).cast("long").alias("z_micros"),
        )
        .orderBy(F.col("z_micros").desc(), F.col("id").asc())
        .limit(top_k)
    )
