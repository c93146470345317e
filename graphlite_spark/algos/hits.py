"""HITS (hubs & authorities), fixed-iteration, unnormalized.

Kleinberg's mutual-reinforcement recurrence over the directed edge set::

    auth_k(v) = Σ_{(u,v) ∈ E} hub_{k-1}(u)
    hub_k(v)  = Σ_{(v,w) ∈ E} auth_k(w)

Run WITHOUT per-round normalization for a fixed iteration count: every
score stays an exact integer (sums of sums of 1s), so the DuckDB oracle
matches bit-exactly with no float-rounding discipline needed — ranking
order equals the normalized variant's.  Two shuffles per iteration
(gather by dst, gather by src), edge table read from cache both times;
the same shape the Pregel scatter uses, expressed directly as joins
because the recurrence alternates edge directions each half-step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hits(vertices: DataFrame, edges: DataFrame, iterations: int = 3) -> DataFrame:
    """(id, auth, hub) after ``iterations`` rounds (exact longs)."""
    if iterations < 1:
        raise ValueError(f"hits: iterations must be >= 1, got {iterations}")
    e = edges.select("src", "dst").persist()
    v = vertices.select("id")
    hub = v.select("id", F.lit(1).cast("long").alias("hub"))
    auth = None
    for _ in range(iterations):
        ag = (
            e.join(hub, e["src"] == hub["id"])
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum("hub").alias("s"))
        )
        auth = v.join(ag, v["id"] == ag["vid"], "left").select(
            "id", F.coalesce("s", F.lit(0)).cast("long").alias("auth")
        )
        hg = (
            e.join(auth, e["dst"] == auth["id"])
            .groupBy(F.col("src").alias("vid"))
            .agg(F.sum("auth").alias("s"))
        )
        hub = v.join(hg, v["id"] == hg["vid"], "left").select(
            "id", F.coalesce("s", F.lit(0)).cast("long").alias("hub")
        )
        hub = hub.localCheckpoint(eager=False)
        auth = auth.localCheckpoint(eager=False)
    out = auth.join(hub, "id").select("id", "auth", "hub")
    # materialize before releasing the cached edges the lazy checkpoints
    # still reference
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    return out
