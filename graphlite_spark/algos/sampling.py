"""Deterministic k-hop neighbor sampling (GraphSAGE-style, public
literature: Hamilton et al. 2017).

GNN training reads minibatches of sampled ego-nets: for each seed
vertex, up to ``fanouts[0]`` neighbors, then up to ``fanouts[1]``
neighbors of each of those, and so on.  At 100 TB the sampling — not
the training — is the data-engine job, and it must be bounded: a seed
landing on a 10^7-degree hub must sample f neighbors, not expand them
all.

Determinism instead of RNG (the repo's corpus discipline): neighbor v
of frontier vertex u survives for seed s at hop h iff its rank by
``hash48(s ':' h ':' u ':' v)`` is < fanout — a pure function of the
graph, reproducible across runs/engines/partitionings, which makes the
whole sampled edge set hash-exact against the unrolled SQL oracle.

Scale shape per hop: one equi-join of the (seed, frontier-vertex) set
against the cached adjacency, then a ``partitionBy(seed, src)`` window
that Catalyst compiles to WindowGroupLimit (partial per-partition top-k
BEFORE the exchange — verified for the identical rank<=k shape by the
KMV audit, PLANS.md r3).  The window partition is one vertex's sampled
candidates for one seed — never global.  Output size is bounded by
|seeds| * Π fanouts regardless of degree distribution; the only
unbounded intermediate is one frontier-vertex adjacency per row, which
the WindowGroupLimit truncates before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphlite_spark.algos.components import symmetrize
from graphlite_spark.functions.hashes import hash48


def sample_neighbors(
    edges: DataFrame,
    seeds: DataFrame,
    fanouts: tuple[int, ...] = (3, 2),
    undirected: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """(seed, hop, src, dst) — the sampled ego-net edge set: hop h rows
    are up to ``fanouts[h-1]`` sampled out-edges of each hop-(h-1)
    frontier vertex, per seed.  ``seeds`` needs an ``id`` column.
    Frontier vertices are distinct per (seed, vertex), so a vertex
    reached twice for the same seed is expanded once."""
    if not fanouts or any(f < 1 for f in fanouts):
        raise ValueError("fanouts must be non-empty, all >= 1")
    spark = edges.sparkSession
    P = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    adj = (
        symmetrize(edges).select("src", "dst")
        if undirected
        else edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    ).repartition(P, "src").persist()
    frontier = seeds.select(F.col("id").alias("seed"), F.col("id").alias("v"))
    out: DataFrame | None = None
    for h, f in enumerate(fanouts, start=1):
        cand = frontier.join(adj, frontier["v"] == adj["src"]).select(
            "seed", "src", "dst",
            hash48(
                F.concat_ws(
                    ":", F.col("seed").cast("string"), F.lit(str(h)),
                    F.col("src").cast("string"), F.col("dst").cast("string"),
                )
            ).alias("_r"),
        )
        w = Window.partitionBy("seed", "src").orderBy("_r", "dst")
        picked = (
            cand.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= f)
            .select("seed", F.lit(h).cast("long").alias("hop"), "src", "dst")
        )
        picked = picked.localCheckpoint(eager=False)
        out = picked if out is None else out.unionByName(picked)
        frontier = picked.select("seed", F.col("dst").alias("v")).distinct()
    out = out.localCheckpoint(eager=True)
    adj.unpersist()
    return out


def negative_edges(
    edges: DataFrame,
    vertices: DataFrame,
    k: int = 3,
    undirected: bool = True,
    salt: str = "neg",
) -> DataFrame:
    """(src, dst, slot, neg_dst) — up to ``k`` deterministic NEGATIVE
    samples per positive edge, the contrastive pairs link-prediction /
    GNN training consumes next to the sampled ego-nets.  Candidate
    ``slot`` for edge (src, dst) is ``hash48(salt:src:dst:slot) mod V``
    over the dense vertex-id space; candidates that collide with a
    real neighbor of src (or src itself) are DROPPED rather than
    re-drawn — the standard bounded-loss convention (expected loss is
    degree/V per slot, negligible on sparse graphs), which keeps the
    sample a pure function of the graph: reproducible across runs,
    engines and partitionings, hash-exact against the SQL oracle.

    Scale shape: one codegen projection fans each edge to k candidate
    rows (the vertex count rides as a 1-row broadcast); the collision
    filter is ONE LEFT ANTI hash join against the (symmetrized) edge
    set on (src, candidate) — no per-row retries, no RNG state."""
    und = symmetrize(edges) if undirected else edges
    vcnt = vertices.agg(F.count(F.lit(1)).cast("long").alias("n_v"))
    cands = (
        edges.select("src", "dst")
        .crossJoin(F.broadcast(vcnt))
        .select(
            "src",
            "dst",
            F.explode(F.array(*[F.lit(i) for i in range(k)])).alias(
                "slot"
            ),
            "n_v",
        )
        .select(
            "src",
            "dst",
            "slot",
            (
                hash48(
                    F.concat_ws(
                        ":",
                        F.lit(salt),
                        F.col("src").cast("string"),
                        F.col("dst").cast("string"),
                        F.col("slot").cast("string"),
                    )
                )
                % F.col("n_v")
            ).alias("neg_dst"),
        )
        .where(F.col("neg_dst") != F.col("src"))
    )
    real = und.select(
        F.col("src").alias("r_src"), F.col("dst").alias("r_dst")
    ).distinct()
    return cands.join(
        real,
        (F.col("src") == F.col("r_src"))
        & (F.col("neg_dst") == F.col("r_dst")),
        "left_anti",
    )
