"""Derive the link graph (vertices, edges) from a transcript table.

The graph the engine computes over (FIXTURES.md §2):

* one vertex per turn, with **dense ids 0..V-1** — matching the reference's
  assumption that vertex ids count contiguously from 0
  (GraphLite-0.20/engine/Worker.cc:30-31);
* ``reply`` edges: turn (conv, i) -> (conv, i+1) via ``lead(turn_idx)`` over
  ``Window.partitionBy(conv_id).orderBy(turn_idx)`` (the stable turn
  ordering demanded by the input_hint);
* ``tool`` edges: each *assistant* turn -> the next turn in the same
  conversation whose ``tool`` is non-null (the tool call it triggers).

Dense-id assignment uses ``row_number() - 1`` over a global
``(conv_id, turn_idx)`` sort.  This is a one-time global sort; at 10^12
turns it is the single most expensive derivation step, but it runs once,
is embarrassingly range-partitionable (Spark range-shuffles the sort), and
the result is checkpointed — every superstep afterwards touches only dense
longs.  Both edge kinds are windowed *within* a conversation, so the only
shuffle the edge derivation needs is a hash partition on ``conv_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def derive_vertices(transcripts: DataFrame) -> DataFrame:
    """(id, conv_id, turn_idx, text) — dense ids over (conv_id, turn_idx).

    Keeps ``text`` so the per-row invariant (per-turn text equality under
    stable turn ordering) is checkable after derivation.
    """
    w = Window.orderBy("conv_id", "turn_idx")
    return transcripts.select(
        (F.row_number().over(w) - 1).cast("long").alias("id"),
        "conv_id",
        "turn_idx",
        "text",
    )


def derive_edges(transcripts: DataFrame, vertices: DataFrame | None = None) -> DataFrame:
    """(src, dst, etype, weight) over dense vertex ids.

    weight defaults to 1.0 — the reference's PageRank stores an edge value
    but never consults it (example/PageRankVertex.cc:71,78-82).
    """
    if vertices is None:
        vertices = derive_vertices(transcripts)
    ids = vertices.select("id", "conv_id", "turn_idx")
    # One equi-join attaches dense ids; because ids are assigned in
    # (conv_id, turn_idx) order, lead(id)/windowed-min(id) within the
    # conversation window yield destination ids directly — no second join.
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = transcripts.join(ids, ["conv_id", "turn_idx"])

    reply = (
        t.withColumn("dst", F.lead("id").over(w))
        .where(F.col("dst").isNotNull())
        .select(F.col("id").alias("src"), "dst", F.lit("reply").alias("etype"))
    )

    w_follow = w.rowsBetween(1, Window.unboundedFollowing)
    tool = (
        t.withColumn(
            "dst", F.min(F.when(F.col("tool").isNotNull(), F.col("id"))).over(w_follow)
        )
        .where((F.col("role") == "assistant") & F.col("dst").isNotNull())
        .select(F.col("id").alias("src"), "dst", F.lit("tool").alias("etype"))
    )

    return reply.unionByName(tool).withColumn("weight", F.lit(1.0))
