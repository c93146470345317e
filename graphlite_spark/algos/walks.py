"""Deterministic random-walk corpus generation (DeepWalk-style).

Embedding pipelines (DeepWalk, node2vec) train on a corpus of short
random walks.  At 100 TB the walk generation — not the training — is
the data-engine job: W walks of length L from every vertex, with the
per-step neighbor choice made INSIDE the engine, no driver loop.

Determinism instead of RNG: step t of walk w picks neighbor index
``hash48(walk_id ':' t) mod deg(cur)`` over the neighbor list ranked by
destination id.  md5 is uniform enough for corpus sampling, and the
whole walk set becomes a pure function of the graph — reproducible
across runs, engines, and partitionings, which is what makes the DuckDB
oracle hash-exact (the oracle unrolls the same L steps in SQL).

Scale shape per step: one join against the per-vertex degree table to
compute the pick, then one COMPOUND-KEY equi-join ``(cur, pick) =
(adj.src, adj.idx)`` — a walk never fans out to all neighbors of its
current vertex, so step cost is O(active walks), independent of degree.
The ranked adjacency is built once (per-src window; WindowGroupLimit
does not apply but the sort is per-partition after a hash shuffle on
src) and cached hash-partitioned by src so every step reuses the
layout.  Walks that reach a sink (deg 0 on the directed graph) simply
end; with ``undirected=True`` (the default corpus convention) every
non-isolated vertex has deg >= 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphlite_spark.algos.components import symmetrize
from graphlite_spark.functions.hashes import hash48


def random_walks(
    vertices: DataFrame,
    edges: DataFrame,
    walks_per_vertex: int = 2,
    walk_length: int = 8,
    undirected: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """(walk_id, step, vertex) — ``walks_per_vertex`` deterministic walks
    of up to ``walk_length`` steps from every vertex; ``walk_id =
    id * walks_per_vertex + w``.  Step 0 is the start vertex; walks end
    early at sinks."""
    spark = edges.sparkSession
    und = (
        symmetrize(edges).select("src", "dst")
        if undirected
        else edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    )
    P = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    w = Window.partitionBy("src").orderBy("dst")
    adj = (
        und.withColumn("idx", F.row_number().over(w) - F.lit(1))
        .repartition(P, "src")
        .persist()
    )
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    W_ = walks_per_vertex
    cur = vertices.select(
        F.explode(F.sequence(F.lit(0), F.lit(W_ - 1))).alias("w"),
        F.col("id"),
    ).select(
        (F.col("id") * W_ + F.col("w")).cast("long").alias("walk_id"),
        F.col("id").alias("vertex"),
    )
    out = cur.select("walk_id", F.lit(0).cast("long").alias("step"), "vertex")
    # adj/deg stay cached for the caller's action (the union references
    # them L times; within one action the InMemoryRelation materializes
    # once) — corpus generation is one-shot, the cache dies with the df
    for t in range(1, walk_length + 1):
        pick = cur.join(deg, cur["vertex"] == deg["src"]).select(
            "walk_id",
            F.col("vertex"),
            (
                hash48(
                    F.concat_ws(
                        ":", F.col("walk_id").cast("string"), F.lit(str(t))
                    )
                )
                % F.col("deg")
            ).alias("pick"),
        )
        cur = pick.join(
            adj,
            (pick["vertex"] == adj["src"]) & (pick["pick"] == adj["idx"]),
        ).select("walk_id", F.col("dst").alias("vertex"))
        out = out.unionByName(
            cur.select(
                "walk_id", F.lit(t).cast("long").alias("step"), "vertex"
            )
        )
    return out
