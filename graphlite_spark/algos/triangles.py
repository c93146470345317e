"""Triangle counting — join-composed, not message-passing.

Built-in named by the north rule (absent from the reference).  Triangles
are counted on the undirected, de-duplicated, self-loop-free closure of the
edge set; each triangle counts once.

Two orientations are provided:

* ``orient="id"`` — orient every undirected edge low-id -> high-id, then
  count paths a->b, a->c (b<c) closed by b->c.  Simple, and exactly what
  the DuckDB oracle SQL does.
* ``orient="degree"`` — orient by (degree, id) order (each edge points from
  the lower-degree endpoint to the higher).  This bounds per-vertex join
  fan-out by O(sqrt(E)) arboricity-style, which is what survives hub skew
  at 100 TB (SURVEY.md §7.3.5).  Results are identical; tests assert so.

The two self-joins shuffle on the path vertex then on the closing edge;
AQE's skew-join splitting handles residual hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirected(edges: DataFrame) -> DataFrame:
    """Distinct undirected pairs as (lo, hi), self-loops removed."""
    return (
        edges.select(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
    )


def _oriented(edges: DataFrame, orient: str) -> DataFrame:
    und = _undirected(edges)
    if orient == "id":
        return und.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    if orient != "degree":
        raise ValueError(f"unknown orientation {orient!r}")
    # degree over the undirected graph
    deg = (
        und.select(F.col("lo").alias("v"))
        .unionByName(und.select(F.col("hi").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    d1 = deg.select(F.col("v").alias("lo"), F.col("deg").alias("dlo"))
    d2 = deg.select(F.col("v").alias("hi"), F.col("deg").alias("dhi"))
    j = und.join(d1, "lo").join(d2, "hi")
    lo_first = (F.col("dlo") < F.col("dhi")) | (
        (F.col("dlo") == F.col("dhi")) & (F.col("lo") < F.col("hi"))
    )
    return j.select(
        F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("a"),
        F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("b"),
        F.when(lo_first, F.col("dlo")).otherwise(F.col("dhi")).alias("da"),
        F.when(lo_first, F.col("dhi")).otherwise(F.col("dlo")).alias("db"),
    )


def _triangle_rows(edges: DataFrame, orient: str) -> DataFrame:
    """One row (x, y, z) per triangle."""
    o = _oriented(edges, orient)
    if orient == "id":
        e1 = o.select(F.col("a"), F.col("b").alias("x"))
        e2 = o.select(F.col("a"), F.col("b").alias("y"))
        wedges = e1.join(e2, "a").where(F.col("x") < F.col("y"))
        closing = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
        return wedges.join(closing, ["x", "y"]).select(
            F.col("a").alias("v1"), F.col("x").alias("v2"), F.col("y").alias("v3")
        )
    # degree orientation: wedge at the (deg,id)-smallest vertex; the closing
    # edge's direction follows the same total order, carried via (db, b).
    e1 = o.select("a", F.col("b").alias("x"), F.col("db").alias("dx"))
    e2 = o.select("a", F.col("b").alias("y"), F.col("db").alias("dy"))
    wedges = e1.join(e2, "a").where(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    return wedges.join(closing, ["x", "y"]).select(
        F.col("a").alias("v1"), F.col("x").alias("v2"), F.col("y").alias("v3")
    )


def triangle_count(edges: DataFrame, orient: str = "degree") -> DataFrame:
    """Global triangle count: one row, column ``triangles``."""
    return _triangle_rows(edges, orient).agg(
        F.count(F.lit(1)).cast("long").alias("triangles")
    )


def local_clustering_coefficient(
    vertices: DataFrame, edges: DataFrame, orient: str = "degree"
) -> DataFrame:
    """(id, degree, triangles, lcc) — local clustering coefficient
    ``2·T(v) / (deg(v)·(deg(v)−1))`` over the undirected closure (0.0 for
    degree < 2).  One extra grouped count on top of the per-vertex
    triangle machinery; the division is a single double op on exact
    integers, so 6dp rounding is engine-stable."""
    tpv = triangle_count_per_vertex(vertices, edges, orient).withColumnRenamed(
        "count", "triangles"
    )
    und = _undirected(edges)
    deg = (
        und.select(F.col("lo").alias("id"))
        .unionByName(und.select(F.col("hi").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    j = tpv.join(deg, "id", "left").withColumn(
        "degree", F.coalesce("degree", F.lit(0)).cast("long")
    )
    lcc = F.when(
        F.col("degree") >= 2,
        F.round(
            F.lit(2.0) * F.col("triangles")
            / (F.col("degree") * (F.col("degree") - 1)),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return j.select("id", "degree", "triangles", lcc.alias("lcc"))


def triangle_count_per_vertex(
    vertices: DataFrame, edges: DataFrame, orient: str = "degree"
) -> DataFrame:
    """(id, count) — triangles through each vertex; 0 for none."""
    tri = _triangle_rows(edges, orient)
    exploded = (
        tri.select(F.explode(F.array("v1", "v2", "v3")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
    )
    return (
        vertices.select("id")
        .join(exploded, "id", "left")
        .select("id", F.coalesce("count", F.lit(0)).cast("long").alias("count"))
    )


def _edge_support(und_edges: DataFrame, orient: str) -> DataFrame:
    """(lo, hi, support) — triangles through each surviving undirected
    edge.  Reuses the oriented triangle enumeration (degree orientation
    bounds wedge fan-out by O(sqrt(E)) under hub skew), then explodes each
    triangle into its three undirected edges and counts — one
    map-side-combined groupBy, no per-edge neighbor-set intersection."""
    tri = _triangle_rows(und_edges, orient)
    pairs = tri.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("v1", "v2").alias("lo"),
                    F.greatest("v1", "v2").alias("hi"),
                ),
                F.struct(
                    F.least("v1", "v3").alias("lo"),
                    F.greatest("v1", "v3").alias("hi"),
                ),
                F.struct(
                    F.least("v2", "v3").alias("lo"),
                    F.greatest("v2", "v3").alias("hi"),
                ),
            )
        ).alias("e")
    ).select("e.lo", "e.hi")
    return pairs.groupBy("lo", "hi").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )


def k_truss(
    edges: DataFrame,
    k: int = 3,
    max_rounds: int = 8,
    orient: str = "degree",
) -> DataFrame:
    """(lo, hi, in_truss) — k-truss membership for every undirected edge.

    The k-truss is the maximal subgraph in which every edge participates
    in >= k-2 triangles *within the subgraph* (Cohen 2008; the edge
    analogue of the k-core).  Iterative peel: each round recounts edge
    support over the surviving edge set and drops under-supported edges;
    stable set = the truss.  Both the Spark loop and the unrolled SQL
    oracle run the identical round rule with the same ``max_rounds`` cap,
    so equality holds even if the cap binds (both are then the same
    R-round partial peel) — the peel is monotone, so rounds past the
    fixpoint are no-ops on both sides.

    Scale shape per round: one oriented triangle enumeration (the same
    two equi-joins as :func:`triangle_count`, hub fan-out bounded by the
    degree orientation) + one map-side-combined support count + one
    semi-join; the surviving set only shrinks, so round cost is
    monotonically decreasing.  Loop discipline matches k_core: AQE off,
    lazy localCheckpoint per round, one count action per round.
    """
    if k < 3:
        raise ValueError("k-truss requires k >= 3 (k=2 is the whole graph)")
    spark = edges.sparkSession
    base = _undirected(edges).localCheckpoint(eager=False)
    alive = base
    prev_n = alive.count()
    saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for _ in range(max_rounds):
            sup = _edge_support(
                alive.select(F.col("lo").alias("src"), F.col("hi").alias("dst")),
                orient,
            )
            alive = (
                alive.join(
                    sup.where(F.col("support") >= k - 2).select("lo", "hi"),
                    ["lo", "hi"],
                    "left_semi",
                )
                .localCheckpoint(eager=False)
            )
            n = alive.count()
            if n == prev_n:
                break
            prev_n = n
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", saved)
    kept = alive.select(
        F.col("lo").alias("klo"), F.col("hi").alias("khi")
    )
    return base.join(
        kept, (base["lo"] == kept["klo"]) & (base["hi"] == kept["khi"]), "left"
    ).select("lo", "hi", F.col("klo").isNotNull().alias("in_truss"))


def rectangle_count(edges: DataFrame) -> DataFrame:
    """One row ``(rectangles)`` — the number of 4-cycles in the
    undirected closure (chorded cycles included, the standard C4 count).

    Every 4-cycle a–x–b–y contributes one common-neighbor pair {x, y} to
    the endpoint pair {a, b} and vice versa, so R = Σ_{a<b} C(cn(a,b), 2)
    / 2 — the rectangle-counting identity large-graph mining uses.  Shape:
    one wedge self-join through the center (quadratic per center degree —
    on hub-heavy graphs sparsify or cap first; a cap is NOT applied here
    because it would break the count-each-cycle-twice symmetry the /2
    relies on) + one map-side-combined count + one global reduce, all
    integer-exact."""
    und = _undirected(edges)
    sym = und.select(F.col("lo").alias("src"), F.col("hi").alias("dst")).unionByName(
        und.select(F.col("hi").alias("src"), F.col("lo").alias("dst"))
    )
    e1 = sym.select(F.col("src").alias("w"), F.col("dst").alias("u"))
    e2 = sym.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    cn = (
        e1.join(e2, "w")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # integer div throughout: the pair sum is always even (each cycle
    # counted via both opposite pairs), and float division would lose
    # exactness past 2^53
    return cn.agg(F.sum(F.expr("(c * (c - 1)) div 2")).alias("s")).select(
        F.coalesce(F.expr("s div 2"), F.lit(0)).cast("long").alias("rectangles")
    )


def directed_triangle_census(edges: DataFrame) -> DataFrame:
    """One row (n_cyclic, n_transitive) — the directed-triangle motif
    census (Milo et al. 2002 network motifs, public literature): how
    many closed directed triangles cycle (i→j→k→i) vs how many are
    transitive (i→j, j→k AND i→k, the feed-forward loop).  Self-loops
    and duplicate arcs dropped; a triangle with arcs both ways on some
    side contributes to every pattern its arcs realize (the standard
    census-by-pattern-instance convention).

    Exactness: cyclic instances are anchored at their minimum vertex
    (each 3-cycle counted exactly once); transitive instances carry
    unique source/middle/sink roles, so the pattern join counts each
    exactly once.  Shape: two self-equi-joins on the arc table (the
    wedge join of triangle counting, here without orientation — the
    in×out wedge at a hub is the cost driver; at web scale one
    degree-orients first, stated rather than hidden)."""
    de = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    e1 = de.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = de.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = de.select(F.col("src").alias("c"), F.col("dst").alias("a2"))
    cyc = (
        e1.join(e2, "b")
        .join(e3, "c")
        .where(
            (F.col("a2") == F.col("a"))
            & (F.col("a") < F.col("b"))
            & (F.col("a") < F.col("c"))
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_cyclic"))
    )
    e3t = de.select(F.col("src").alias("a"), F.col("dst").alias("c2"))
    trans = (
        e1.join(e2, "b")
        .join(e3t, "a")
        .where(F.col("c2") == F.col("c"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitive"))
    )
    return cyc.join(F.broadcast(trans)).select("n_cyclic", "n_transitive")
