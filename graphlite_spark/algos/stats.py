"""Whole-graph summary statistics.

Degree assortativity (Newman 2002, public literature): the Pearson
correlation of the degrees at either end of an edge, over the undirected
closure.  Positive = hubs attach to hubs (social networks), negative =
hubs attach to leaves (star-shaped link graphs — the transcript graph is
strongly negative because conversation chains hang off tool hubs).

Cross-engine exactness discipline: every Σ (count, Σx, Σxy, Σx², …) is an
exact INTEGER aggregate in both engines; floats enter only in the final
correlation expression, written with the identical structure on both
sides (each long subexpression cast to double before the one multiply
that could overflow 64 bits), so the 6dp-rounded result cannot diverge.

Scale shape: two equi-joins of the edge table against the degree table
(broadcast-able — the degree table is vertex-sized), then ONE map-side-
combined global aggregate: six partial sums per partition, a single
1-row reduce.  No window, no collect-loop.  At 10^12-edge scale the
raw long sums Σ(dx·dy) can exceed 2^63 — pre-aggregate by (dx, dy)
degree pair and sum counts in DECIMAL(38,0) there; at any scale this
module's shape (join + one global agg) is the right plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphlite_spark.algos.components import symmetrize
from graphlite_spark.checkpoint import truncate_plan


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """One row: (m, assortativity) — m = directed representations of the
    undirected edge set; assortativity = Pearson r of (deg(u), deg(v))
    over those edge endpoints, rounded to 6dp.  NULL when the graph is
    degree-regular (zero variance)."""
    und = symmetrize(edges).select("src", "dst")
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    dx = deg.select(F.col("src").alias("u"), F.col("d").alias("dx"))
    dy = deg.select(F.col("src").alias("v"), F.col("d").alias("dy"))
    ee = (
        und.join(dx, und["src"] == dx["u"])
        .join(dy, und["dst"] == dy["v"])
        .select("dx", "dy")
    )
    s = ee.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    m, sx, sy = F.col("m"), F.col("sx"), F.col("sy")
    num = (m * F.col("sxy") - sx * sy).cast("double")
    varx = (m * F.col("sxx") - sx * sx).cast("double")
    vary = (m * F.col("syy") - sy * sy).cast("double")
    return s.select(
        "m",
        F.round(num / F.sqrt(varx * vary), 6).alias("assortativity"),
    )


def modularity(
    edges: DataFrame, labels: DataFrame, label_col: str = "label"
) -> DataFrame:
    """One row (m2, modularity) — Newman modularity Q of the vertex
    partition given by ``labels (id, label)`` over the undirected
    closure (Newman 2004, public literature).

    Computed as the exact RATIONAL ``(m2·Σe_c − Σd_c²) / m2²`` where m2
    counts directed representations of undirected edges, Σe_c the
    within-community representations, and d_c each community's degree
    sum — all exact integer aggregates; the single float division is the
    only rounding point, so the 6dp result cannot diverge across
    engines (the per-community float-sum formulation would be
    summation-order-dependent).  Same scale shape as assortativity: two
    vertex-sized label joins + map-side-combined global aggregates."""
    und = symmetrize(edges).select("src", "dst")
    ls = labels.select(F.col("id").alias("u"), F.col(label_col).alias("la"))
    ld = labels.select(F.col("id").alias("v"), F.col(label_col).alias("lb"))
    ee = (
        und.join(ls, und["src"] == ls["u"])
        .join(ld, und["dst"] == ld["v"])
        .select("la", "lb")
    )
    # one aggregation chain (no 1-row cross join): per-community partials
    # first (map-side combined), then a single global reduce over them
    per_c = ee.groupBy("la").agg(
        F.count(F.lit(1)).cast("long").alias("dc"),
        F.sum((F.col("la") == F.col("lb")).cast("long")).alias("same_c"),
    )
    s = per_c.agg(
        F.sum("dc").alias("m2"),
        F.sum("same_c").alias("same"),
        F.sum(F.col("dc") * F.col("dc")).alias("sdd"),
    )
    m2 = F.col("m2")
    num = (m2 * F.col("same") - F.col("sdd")).cast("double")
    return s.select(
        "m2",
        F.round(num / (m2.cast("double") * m2.cast("double")), 6).alias(
            "modularity"
        ),
    )


def attribute_assortativity(
    edges: DataFrame, labels: DataFrame, label_col: str = "label"
) -> DataFrame:
    """One row (n_edges, assortativity) — Newman's categorical
    assortativity coefficient over DIRECTED edges whose endpoints carry
    ``labels (id, label)``:

        r = (m·Σ_i e_ii − Σ_i a_i·b_i) / (m² − Σ_i a_i·b_i)

    with e_ii the same-label edge count, a_i/b_i the per-label src/dst
    edge counts and m the labeled edge total — all exact integer
    aggregates, one float division at the end (6dp), so the result
    cannot diverge across engines.  NULL when every edge shares one
    label (denominator 0).  Shape: two vertex-sized label joins + two
    map-side-combined grouped counts + a 1-row reduce."""
    ls = labels.select(F.col("id").alias("src"), F.col(label_col).alias("la"))
    ld = labels.select(F.col("id").alias("dst"), F.col(label_col).alias("lb"))
    ee = edges.select("src", "dst").join(ls, "src").join(ld, "dst")
    per = ee.groupBy("la", "lb").agg(F.count(F.lit(1)).alias("c"))
    # per-label partials, then ONE global reduce — the modularity shape
    # (a 1-row cross join of separate aggregates is plan-guard-banned)
    a = per.groupBy("la").agg(
        F.sum("c").alias("ai"),
        F.sum(
            F.when(F.col("la") == F.col("lb"), F.col("c")).otherwise(0)
        ).alias("same_i"),
    )
    b = per.groupBy(F.col("lb").alias("la")).agg(F.sum("c").alias("bi"))
    per_label = a.join(b, "la", "full").select(
        F.coalesce("ai", F.lit(0)).alias("ai"),
        F.coalesce("bi", F.lit(0)).alias("bi"),
        F.coalesce("same_i", F.lit(0)).alias("same_i"),
    )
    sums = per_label.agg(
        F.sum("ai").alias("m"),
        F.sum("same_i").alias("same"),
        F.sum(F.col("ai") * F.col("bi")).alias("sab"),
    )
    num = (F.col("m") * F.col("same") - F.col("sab")).cast("double")
    den = (F.col("m") * F.col("m") - F.col("sab")).cast("double")
    return sums.select(
        F.col("m").cast("long").alias("n_edges"),
        F.when(den != 0, F.round(num / den, 6)).alias("assortativity"),
    )


def reciprocity(edges: DataFrame) -> DataFrame:
    """One row (n_edges, n_recip, reciprocity) — the fraction of distinct
    directed edges (self-loops dropped) whose reverse edge also exists
    (Garlaschelli & Loffredo 2004, public literature).  Exact integer
    counts; the single float division is the only rounding point (6dp).

    Shape: one distinct + one self-equi-join on the swapped key + a 1-row
    map-side-combined aggregate.  The join keys on (src, dst) both sides,
    so at scale it co-partitions after one hash exchange each — never a
    cartesian."""
    de = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = de.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"),
        F.lit(1).alias("r"),
    )
    return (
        de.join(rev, ["src", "dst"], "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            # coalesce OUTSIDE the sum too: an empty edge set must report
            # 0 reciprocated edges, not NULL (found by hypothesis)
            F.coalesce(F.sum(F.coalesce("r", F.lit(0))), F.lit(0))
            .cast("long")
            .alias("n_recip"),
        )
        .select(
            "n_edges",
            "n_recip",
            F.when(
                F.col("n_edges") > 0,
                F.round(
                    F.col("n_recip").cast("double") / F.col("n_edges"), 6
                ),
            ).alias("reciprocity"),  # NULL (not 0/0) on an empty set
        )
    )


def rich_club(edges: DataFrame, ks: tuple[int, ...] = (1, 2, 4, 8)) -> DataFrame:
    """(k, n_nodes, e_among, phi) per k — the rich-club coefficient
    φ(k) = E_{>k} / (N_{>k}·(N_{>k}−1)/2) over the undirected closure
    (Zhou & Mondragón 2004, public literature): how densely the vertices
    of degree > k connect among themselves.

    Exactness: node and edge counts are exact integers (`reps` counts
    directed representations, always even, halved with integer div);
    φ is the one float division (6dp).  Every k gets a row (zeros when
    no vertex qualifies).

    Shape: degree table (vertex-sized, broadcast-able) joined onto the
    edge list once; the tiny k-list is crossJoin-broadcast AFTER a
    pre-filter to degree > min(k), so the multiplied row count is
    |edges among the sparsest club| × |ks|, not |E| × |ks|."""
    spark = edges.sparkSession
    kmin = min(ks)
    und = symmetrize(edges).select("src", "dst")
    # vertex-sized and referenced three times (club sizes + both edge
    # endpoints) — materialize once instead of re-aggregating und per use
    deg = truncate_plan(
        und.groupBy("src").agg(F.count(F.lit(1)).alias("d")), eager=True
    )
    kdf = spark.createDataFrame([(int(k),) for k in sorted(ks)], "k long")
    nodes_k = (
        deg.where(F.col("d") > kmin)
        .crossJoin(F.broadcast(kdf))
        .where(F.col("d") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )
    ds = deg.select(F.col("src"), F.col("d").alias("ds"))
    dd = deg.select(F.col("src").alias("dst"), F.col("d").alias("dd"))
    reps_k = (
        und.join(ds, "src")
        .join(dd, "dst")
        .where((F.col("ds") > kmin) & (F.col("dd") > kmin))
        .crossJoin(F.broadcast(kdf))
        .where((F.col("ds") > F.col("k")) & (F.col("dd") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("reps"))
    )
    n = F.coalesce("n_nodes", F.lit(0)).cast("long")
    reps = F.coalesce("reps", F.lit(0)).cast("long")
    return (
        kdf.join(nodes_k, "k", "left")
        .join(reps_k, "k", "left")
        .select(
            "k",
            n.alias("n_nodes"),
            F.expr("coalesce(reps, 0) div 2").cast("long").alias("e_among"),
            F.when(
                n >= 2,
                F.round(
                    reps.cast("double")
                    / (n.cast("double") * (n.cast("double") - 1.0)),
                    6,
                ),
            ).alias("phi"),
        )
    )


def transitivity(edges: DataFrame) -> DataFrame:
    """One row (n_triangles, n_wedges, transitivity) — the GLOBAL
    clustering coefficient 3·T / W over the undirected closure, where W
    = Σ_v deg(v)·(deg(v)−1)/2 counts wedges (paths of length 2 centered
    anywhere).  Exact integer counts (the triangle count reuses the
    degree-oriented enumeration, wedges are one aggregate over the
    degree table); the single float division is the one rounding point
    (6dp).  NULL when the graph has no wedges."""
    from graphlite_spark.algos.triangles import triangle_count

    und = symmetrize(edges).select("src", "dst")
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    wedges = deg.agg(
        F.sum(
            (F.col("d") * (F.col("d") - 1)).cast("long")
        ).alias("w2")  # 2·wedges (each wedge counted at its center once
        # per ordered pair); divide by 2 exactly below
    )
    tri = triangle_count(edges)
    n3 = F.col("triangles").cast("long")
    w = F.expr("coalesce(w2, 0) div 2").cast("long")
    return (
        tri.join(F.broadcast(wedges))
        .select(
            n3.alias("n_triangles"),
            w.alias("n_wedges"),
            F.when(
                w > 0,
                F.round(F.lit(3.0) * n3.cast("double") / w.cast("double"), 6),
            ).alias("transitivity"),
        )
    )


def powerlaw_alpha(edges: DataFrame, dmin: int = 2) -> DataFrame:
    """One row (n_tail, alpha) — the continuous-approximation MLE for a
    power-law degree-distribution exponent (Clauset, Shalizi & Newman
    2009, public literature): alpha = 1 + n / Σ ln(d / (dmin − 1/2))
    over the undirected-closure degrees d >= dmin.

    Cross-engine determinism: each log term is rounded to integer
    MICRO-units BEFORE the sum (one round per VERTEX, then an exact
    BIGINT sum — no float summation-order dependence); the final alpha
    is the single float division, 6dp.  NULL when no vertex reaches
    dmin."""
    und = symmetrize(edges).select("src", "dst")
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    tail = deg.where(F.col("d") >= dmin)
    terms = tail.select(
        F.round(
            F.log(F.col("d").cast("double") / (dmin - 0.5)) * 1_000_000
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


def dyad_census(vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """One row (n_mutual, n_asym, n_null) — the dyad census (Holland &
    Leinhardt 1976, public literature): every unordered vertex pair is
    mutual (arcs both ways), asymmetric (exactly one arc) or null (no
    arc).  The M/A/N triple is the dyad-level complement of the triad
    census and the standard first readout of a directed graph's
    reciprocity structure.

    Exact integers throughout: per-pair direction bitmask (bit 1 =
    lo→hi, bit 2 = hi→lo, map-side-combined ``bit_or``), one 1-row
    aggregate, and n_null = C(V,2) − mutual − asym from the vertex
    count — no pair-level materialization of non-edges (the null set is
    ~V²/2 at scale and must never be enumerated).

    Shape: one hash aggregate over E pairs + two 1-row frames broadcast
    into a literal-sized join — the reciprocity() cost envelope."""
    de = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    pm = (
        de.select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
            F.when(F.col("src") < F.col("dst"), F.lit(1))
            .otherwise(F.lit(2))
            .alias("m"),
        )
        .groupBy("lo", "hi")
        .agg(F.bit_or("m").alias("mask"))
    )
    counts = pm.agg(
        F.coalesce(
            F.sum((F.col("mask") == 3).cast("long")), F.lit(0)
        ).alias("n_mutual"),
        F.coalesce(
            F.sum((F.col("mask") != 3).cast("long")), F.lit(0)
        ).alias("n_asym"),
    )
    nv = vertices.agg(F.count(F.lit(1)).cast("long").alias("v"))
    return counts.join(F.broadcast(nv)).select(
        F.col("n_mutual").cast("long").alias("n_mutual"),
        F.col("n_asym").cast("long").alias("n_asym"),
        (
            F.expr("v * (v - 1) div 2") - F.col("n_mutual") - F.col("n_asym")
        ).cast("long").alias("n_null"),
    )


def rank_agreement(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "id",
    score_col: str = "score",
) -> DataFrame:
    """(n, sum_d2, rho) — Spearman rank correlation between two integer
    score tables over the same id set (Spearman 1904, public
    literature): rho = 1 − 6·Σd² / (n·(n²−1)) where d is the per-id
    rank difference under the deterministic (score DESC, id ASC) total
    order.  The centrality-agreement readout: does the cheap ranking
    (degree) order vertices the way the expensive one (PageRank) does —
    the number a pipeline checks before substituting the proxy.

    Exactness: scores must already be exact integers (micros by repo
    convention); ranks come from the distributed dense-id machinery
    (:func:`~graphlite_spark.plans.derive.assign_dense_ids` on
    (−score, id) — a range shuffle, never a single-partition window);
    Σd² is an exact BIGINT; n·(n²−1) and 6·Σd² both stay under 2⁵³ for
    n up to ~10⁶ ranks so the single final division is engine-exact,
    and the tie-broken total order makes rho itself deterministic.
    Inner-joins on id: ids present in only one table are excluded
    (stated).

    Scale shape: two dense-id range shuffles + one id equi-join + one
    map-side-combined 1-row aggregate."""
    from graphlite_spark.plans.derive import assign_dense_ids

    def ranked(df: DataFrame, rank_name: str) -> DataFrame:
        keyed = df.select(
            F.col(id_col).alias("vid"),
            (-F.col(score_col)).cast("long").alias("neg"),
        )
        return assign_dense_ids(keyed, ["neg", "vid"], id_col=rank_name).select(
            "vid", rank_name
        )

    ra = ranked(a, "r1")
    rb = ranked(b, "r2")
    j = ra.join(rb, "vid").select(
        ((F.col("r1") - F.col("r2")) * (F.col("r1") - F.col("r2"))).alias("d2")
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d2").cast("long").alias("sum_d2"),
    ).select(
        "n",
        "sum_d2",
        F.when(
            F.col("n") > 1,
            F.round(
                F.lit(1.0)
                - (F.lit(6.0) * F.col("sum_d2"))
                / (
                    F.col("n").cast("double")
                    * (F.col("n") * F.col("n") - F.lit(1))
                ),
                6,
            ),
        ).alias("rho"),
    )


def graph_hygiene(vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """One row (n_vertices, n_arcs, n_self_loops, n_parallel_arcs,
    n_isolated, n_dangling) — the ingest-time integrity audit every
    link-graph load should run FIRST: self-loops (walk/PageRank
    degeneracy), parallel duplicate arcs (silent weight inflation),
    isolated vertices (no arc touches them), and dangling endpoint
    references (arcs naming vertices absent from the vertex table —
    the referential break that turns every downstream left join into
    silent row loss).  Every other query in this engine assumes these
    are zero or handled; this is the readout that SAYS so.

    Exact integers throughout.  Shape: one map-side-combined aggregate
    over the arc table (count + conditional count + distinct-pair
    count), one distinct-endpoint projection with two anti-join counts
    against the vertex table, assembled via 1-row literal-sized joins —
    no pair-level or vertex-pair materialization anywhere."""
    ea = edges.agg(
        F.count(F.lit(1)).cast("long").alias("n_arcs"),
        F.sum(F.when(F.col("src") == F.col("dst"), 1).otherwise(0))
        .cast("long")
        .alias("n_self_loops"),
        F.count_distinct(F.col("src"), F.col("dst"))
        .cast("long")
        .alias("n_distinct_arcs"),
    )
    ends = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    vids = vertices.select("id")
    nv = vids.agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
    iso = vids.join(ends, "id", "left_anti").agg(
        F.count(F.lit(1)).cast("long").alias("n_isolated")
    )
    dang = ends.join(vids, "id", "left_anti").agg(
        F.count(F.lit(1)).cast("long").alias("n_dangling")
    )
    return (
        nv.crossJoin(ea)
        .crossJoin(iso)
        .crossJoin(dang)
        .select(
            "n_vertices",
            "n_arcs",
            "n_self_loops",
            (F.col("n_arcs") - F.col("n_distinct_arcs"))
            .cast("long")
            .alias("n_parallel_arcs"),
            "n_isolated",
            "n_dangling",
        )
    )


def degree_mixing_matrix(edges: DataFrame) -> DataFrame:
    """(bucket_a, bucket_b, n_edges) — the degree mixing matrix e(k,k'):
    every undirected edge counted once into the unordered pair of its
    endpoints' degree-magnitude buckets (floor(log2 k)+1 via
    ``length(bin(k))`` — the engine-portable rendering).  The
    DISTRIBUTION behind the assortativity scalar: hub–hub rows
    (rich-club wiring), hub–leaf rows (star/broadcast wiring), and
    leaf–leaf rows (chain wiring) are separately visible, where the
    single correlation number can cancel them against each other.

    Exact integers throughout; log buckets keep the output
    O(log²(max_degree)) no matter how heavy the degree tail is.

    Shape: one distinct-pair projection, one map-side-combined degree
    count, two equi-joins of the edge table against the (tiny after
    bucketing, but joined pre-bucket — vertex-count-sized) degree
    table, one log²-sized aggregate.  No wedge or pair-pair join
    anywhere — this is strictly edge-linear."""
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("lo").alias("v"))
        .unionByName(und.select(F.col("hi").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    d1 = deg.select(F.col("v").alias("lo"), F.col("d").alias("dlo"))
    d2 = deg.select(F.col("v").alias("hi"), F.col("d").alias("dhi"))
    j = und.join(d1, "lo").join(d2, "hi").select(
        F.expr("length(bin(dlo))").cast("long").alias("blo"),
        F.expr("length(bin(dhi))").cast("long").alias("bhi"),
    )
    return (
        j.select(
            F.least("blo", "bhi").alias("bucket_a"),
            F.greatest("blo", "bhi").alias("bucket_b"),
        )
        .groupBy("bucket_a", "bucket_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    )


def deanon_uniqueness(edges: DataFrame) -> DataFrame:
    """(class_size, n_classes, n_vertices) — structural
    de-anonymization risk (Narayanan & Shmatikov 2009's threat model,
    public literature): partition vertices by the local-structure
    signature ``(degree, sorted multiset of neighbor degrees)`` over
    the undirected closure and histogram the class sizes.  A vertex in
    a size-1 class is re-identifiable from graph shape alone even with
    ids stripped — the graph-release leg of the k-anonymity /
    l-diversity / t-closeness tabular triad.

    The neighbor-degree multiset rides as md5 over the comma-joined
    NUMERICALLY sorted degree list (ints sorted before stringification
    — lexicographic "10"<"2" traps avoided; md5 is the engines' shared
    hash).  Scale shape: one symmetrize, one degree aggregate, one
    arc–degree equi-join, and one per-vertex sorted collect whose size
    is the vertex's degree (bounded by the same hub reality any
    adjacency-list representation carries); then codebook-sized
    histogram groupBys."""
    from graphlite_spark.algos.components import symmetrize

    arcs = symmetrize(edges).select("src", "dst")
    deg = arcs.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("dg")
    )
    nbr = arcs.join(
        deg.select(F.col("id").alias("dst"), F.col("dg").alias("nd")),
        "dst",
    )
    sig = (
        nbr.groupBy(F.col("src").alias("id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("dg"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list("nd")),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                )
            ).alias("h"),
        )
    )
    classes = sig.groupBy("dg", "h").agg(
        F.count(F.lit(1)).cast("long").alias("class_size")
    )
    return classes.groupBy("class_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("class_size").cast("long").alias("n_vertices"),
    )


def burt_constraint(edges: DataFrame) -> DataFrame:
    """(user_id, degree, constraint_pico) — Burt's structural-holes
    constraint (Burt, AJS 1992, public literature) over the undirected
    simple graph, uniform tie weights: with p_ij = 1/deg(i),

        constraint(i) = sum_j (p_ij + sum_q p_iq * p_qj)^2

    where q ranges over common neighbors of i and j.  Low constraint =
    the vertex bridges otherwise-disconnected contacts (a broker);
    high constraint = its neighborhood is closed around it.  The
    clustering coefficient says how closed a neighborhood is; Burt's
    constraint says how closed it is AROUND EACH TIE, which is what
    brokerage actually measures.

    Exactness: every p-product is floored to integer MICROS
    (1/deg terms are 10^6 div d, indirect terms 10^6 div (d_i*d_q)),
    so the per-tie sum s_ij is an exact BIGINT and constraint rides
    pico units (micros squared) — order-independent, engine-exact.
    Degrees beyond 10^6 floor the indirect term to 0 (stated — at that
    degree the true term is below the reported precision anyway).

    Scale shape: the common-neighbor sets are enumerated through the
    repo's degree-oriented triangle machinery (each triangle {i,j,q}
    emitted once, then expanded to its 6 ordered contributions), so
    wedge fan-out is bounded by O(sqrt(E)) per edge — the hub-safe
    path the wedge-family plan guard pins — followed by two
    vertex-sized degree joins and two map-side-combined groupBys."""
    from graphlite_spark.algos.triangles import _triangle_rows, _undirected

    und = _undirected(edges)
    adj = und.select(
        F.col("lo").alias("i"), F.col("hi").alias("j")
    ).unionByName(
        und.select(F.col("hi").alias("i"), F.col("lo").alias("j"))
    )
    deg = adj.groupBy(F.col("i").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    tri = _triangle_rows(edges, "degree")
    perms = tri.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("v1").alias("i"), F.col("v2").alias("j"),
                    F.col("v3").alias("q"),
                ),
                F.struct(
                    F.col("v2").alias("i"), F.col("v1").alias("j"),
                    F.col("v3").alias("q"),
                ),
                F.struct(
                    F.col("v1").alias("i"), F.col("v3").alias("j"),
                    F.col("v2").alias("q"),
                ),
                F.struct(
                    F.col("v3").alias("i"), F.col("v1").alias("j"),
                    F.col("v2").alias("q"),
                ),
                F.struct(
                    F.col("v2").alias("i"), F.col("v3").alias("j"),
                    F.col("v1").alias("q"),
                ),
                F.struct(
                    F.col("v3").alias("i"), F.col("v2").alias("j"),
                    F.col("v1").alias("q"),
                ),
            )
        ).alias("p")
    ).select("p.i", "p.j", "p.q")
    di = deg.select(F.col("v").alias("i"), F.col("d").alias("di"))
    dq = deg.select(F.col("v").alias("q"), F.col("d").alias("dq"))
    ind = (
        perms.join(di, "i").join(dq, "q")
        .select(
            "i", "j",
            F.expr("1000000 div (di * dq)").cast("long").alias("t"),
        )
        .groupBy("i", "j")
        .agg(F.sum("t").cast("long").alias("w"))
    )
    s = (
        adj.join(di, "i")
        .join(ind, ["i", "j"], "left")
        .select(
            "i",
            (
                F.expr("1000000 div di")
                + F.coalesce(F.col("w"), F.lit(0))
            ).cast("long").alias("s"),
        )
    )
    per = s.groupBy("i").agg(
        F.sum(F.col("s") * F.col("s")).cast("long").alias("constraint_pico")
    )
    return per.join(
        deg.select(F.col("v").alias("i"), "d"), "i"
    ).select(
        F.col("i").alias("user_id"),
        F.col("d").cast("long").alias("degree"),
        "constraint_pico",
    )


def tie_strength_embeddedness(arcs: DataFrame) -> DataFrame:
    """(n_edges, sum_strength, sum_support, corr) — the
    Granovetter/Onnela tie-strength vs embeddedness readout (Onnela et
    al., PNAS 2007, public literature): over every undirected tie,
    correlate HOW OFTEN the pair interacts (``strength`` = arc rows
    between the pair, multiplicity kept) with HOW EMBEDDED the tie is
    (triangle support, via the degree-oriented enumeration
    :func:`~graphlite_spark.algos.triangles.edge_support` uses).  A
    positive correlation is the weak-ties signature — strong ties sit
    inside communities, weak ties bridge them; a flat or negative one
    says the interaction graph does not have that social structure and
    community-based samplers will mislead.

    Exactness: both variables are exact BIGINT counts; the Pearson
    correlation follows the assortativity discipline — integer moment
    sums, each cast to double once, one shared final expression
    rounded to 6dp (NULL when either variance is 0).

    Scale shape: one distinct-pair groupBy for strengths, the hub-safe
    triangle pass for supports, one pair-keyed equi-join, one
    map-side-combined 6-number rollup."""
    from graphlite_spark.algos.triangles import edge_support

    strength = (
        arcs.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
        )
        .groupBy("lo", "hi")
        .agg(F.count(F.lit(1)).cast("long").alias("s"))
    )
    sup = edge_support(arcs.select("src", "dst"), orient="degree")
    both = strength.join(sup, ["lo", "hi"]).select(
        "s", F.col("support").alias("x")
    )
    agg = both.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("s").cast("long").alias("ss"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("s") * F.col("s")).cast("long").alias("sss"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("s") * F.col("x")).cast("long").alias("ssx"),
    )
    m = F.col("m")
    num = (m * F.col("ssx") - F.col("ss") * F.col("sx")).cast("double")
    vars_ = (m * F.col("sss") - F.col("ss") * F.col("ss")).cast("double")
    varx = (m * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return agg.select(
        F.col("m").alias("n_edges"),
        F.col("ss").alias("sum_strength"),
        F.col("sx").alias("sum_support"),
        F.when(
            (vars_ > 0) & (varx > 0),
            F.round(num / F.sqrt(vars_ * varx), 6),
        ).alias("corr"),
    )


def degree_centralization(edges: DataFrame) -> DataFrame:
    """One row (n_vertices, max_degree, sum_diff, centralization_micros)
    — Freeman's degree centralization (Freeman 1979, public
    literature): C = Σ_v (d_max − d_v) / ((n−1)(n−2)), the extent to
    which the undirected degree distribution is dominated by a single
    hub, normalized so a star graph scores exactly 1 (10⁶ micros) and
    a regular graph 0.  The one-number summary sitting above
    :func:`degree_mixing_matrix` (the distribution) and
    :func:`degree_assortativity` (the correlation).

    Vertex universe: vertices incident to >= 1 undirected edge
    (isolates have no degree row and are excluded — stated; their
    inclusion would only rescale the denominator).  NULL when n < 3
    (denominator degenerates).

    Exactness: Σ(d_max − d_v) = n·d_max − Σd_v in exact BIGINTs; one
    truncating micros division at the end.

    Scale shape: one symmetric-closure dedup, one map-side-combined
    degree count, one scalar rollup — edge-linear, no joins beyond the
    closure itself."""
    from graphlite_spark.algos.components import symmetrize

    und = symmetrize(edges).select("src", "dst")
    deg = und.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    agg = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices"),
        F.max("d").cast("long").alias("max_degree"),
        F.sum("d").cast("long").alias("sum_d"),
    )
    return agg.select(
        "n_vertices",
        "max_degree",
        (
            F.col("n_vertices") * F.col("max_degree") - F.col("sum_d")
        ).cast("long").alias("sum_diff"),
        F.when(
            F.col("n_vertices") >= 3,
            F.expr(
                "(1000000 * (n_vertices * max_degree - sum_d))"
                " div ((n_vertices - 1) * (n_vertices - 2))"
            ).cast("long"),
        ).alias("centralization_micros"),
    )


def cyclomatic_number(
    vertices: DataFrame, edges: DataFrame
) -> DataFrame:
    """One row (n_vertices, m_edges, n_components, cyclomatic) — the
    cycle-space dimension (first Betti number) of the undirected
    closure: μ = m − n + c.  Zero exactly when the graph is a forest —
    the one-number answer to "how far from tree-shaped is this
    conversation graph?", complementing the component census (c) and
    the triangle count (which sees only 3-cycles; μ counts independent
    cycles of ANY length).

    n counts ALL vertices (isolates included — each is its own
    component and contributes nothing to μ: the −n and +c cancel);
    m counts undirected edges (closure pairs div 2, exact — the
    closure is self-loop-free and deduped).

    Scale shape: the closure dedup, one count, and the O(log d)
    pointer-doubling CC — all machinery this module already runs;
    the rollup is three scalar aggregates."""
    from graphlite_spark.algos.components import (
        connected_components_fast,
        symmetrize,
    )

    und = symmetrize(edges)
    m = und.agg(
        F.expr("count(1) div 2").cast("long").alias("m_edges")
    )
    n = vertices.agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
    cc = connected_components_fast(vertices, edges)
    c = cc.agg(
        F.count_distinct("component").cast("long").alias("n_components")
    )
    return (
        n.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(c))
        .select(
            "n_vertices", "m_edges", "n_components",
            (
                F.col("m_edges") - F.col("n_vertices")
                + F.col("n_components")
            ).cast("long").alias("cyclomatic"),
        )
    )
