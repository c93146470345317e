"""Per-superstep checkpoint / resume.

The reference has NO fault tolerance — a worker crash kills the run (no
checkpoint code anywhere in GraphLite-0.20/engine/).  The north rule makes
resume-mid-iteration a requirement, so this module provides it:

* every superstep the vertex-state lineage is truncated (otherwise Catalyst
  re-analyzes a growing plan each iteration — SURVEY.md §7.3.1);
* every ``every`` supersteps the full state is written durably (parquet in
  the sandbox; the same code path takes an Iceberg table name on a real
  cluster — format is a constructor knob) together with a JSON **manifest**
  carrying (run_id, superstep, aggregator globals, per-partition lineage,
  complete flag).  The manifest is written via tmp-file + atomic rename
  *after* the data, so a crash mid-write never yields a manifest that
  points at torn data.
* resume = read the latest complete manifest; messages are NOT checkpointed
  — the scatter is a deterministic function of the saved state (which keeps
  its ``send`` flags), so the engine regenerates them
  (:meth:`graphlite_spark.operators.pregel.PregelEngine.run` ``resume_from``).

Per-partition lineage = (partition_id, rows, min_id, max_id) — the Spark
analogue of the reference's per-worker partition files
(bin/hash-partitioner.pl:29-42 headers).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATE_COLS = ["id", "out_degree", "value", "active", "send"]


def _aggr_json(aggr: dict) -> dict:
    """Aggregator globals → JSON-safe manifest values.  Numeric stays
    float; typed values (struct Rows from argmax-style aggregators) become
    dicts — resumed programs see the dict form, documented on
    ``PregelAlgorithm.aggregators``."""
    out = {}
    for k, v in aggr.items():
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            out[k] = float(v)
        elif hasattr(v, "asDict"):
            out[k] = v.asDict(recursive=True)
        else:
            out[k] = v
    return out


def truncate_plan(df: DataFrame, eager: bool = False) -> DataFrame:
    """``localCheckpoint`` that ALSO drops inherited plan statistics.

    ``DataFrame.localCheckpoint`` truncates lineage but the resulting
    ``LogicalRDD`` keeps the optimized plan's ``originStats`` (Spark
    preserves them through checkpoints).  ``sizeInBytes`` is the PRODUCT
    of the children's sizes for every join, so a loop whose evolving
    frame joins *itself* (pointer doubling: ``lab(v) <- lab(lab(v))``)
    squares the statistic every round — after r rounds the BigInteger is
    ~2^r bits, and Catalyst's stats visitor ends up Toom-Cook-multiplying
    megabyte-sized integers: planning ONE round of the bow-tie
    reachability chain was measured at 30+ s on a 4-row input (the
    squaring compounds ACROSS chained fixpoints because checkpoint
    outputs feed the next fixpoint's leaves).  Rebuilding the DataFrame
    from the checkpointed RDD via ``internalCreateDataFrame`` yields a
    ``LogicalRDD`` with DEFAULT leaf stats — growth resets to a constant
    per round (measured flat at 63 bits over 15 rounds).

    Linear-growth loops (the Pregel gather: ~13 bits/superstep, 1109
    bits after 80 supersteps) don't need this; every self-joining
    fixpoint (components_fast, scc, bowtie) does."""
    try:
        jdf = df._jdf.localCheckpoint(eager)
        spark = df.sparkSession
        jds = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(jds, spark)
    except AttributeError:
        # classic-JVM internals unavailable (e.g. Spark Connect): fall
        # back to the plain checkpoint — correct, but inherited stats
        # make self-joining loops slow past ~20 rounds
        return df.localCheckpoint(eager=eager)


def release_local_checkpoint(df: DataFrame) -> None:
    """Free the blocks of an eagerly ``localCheckpoint``-ed DataFrame.

    ``unpersist()`` is a no-op for checkpointed frames (they are not in
    the CacheManager); the storage is reachable through the analyzed
    ``LogicalRDD``'s RDD handle.  After release the frame is NOT usable
    (checkpoint blocks cannot be recomputed) — call only when every
    consumer has been materialized.  Falls back to leaving the blocks to
    the ContextCleaner on non-classic backends (Spark Connect)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


class LocalCheckpointer:
    """Lineage truncation only (no durability) — the default."""

    def save(self, df: DataFrame, superstep: int, aggr: dict, run_id: str) -> DataFrame:
        return df.localCheckpoint(eager=True)

    def commit(self, superstep: int, aggr: dict, run_id: str) -> None:
        pass


class ParquetCheckpointer:
    """Durable checkpoints every ``every`` supersteps, local truncation
    in between."""

    def __init__(self, base_dir: str, every: int = 5):
        self.base_dir = str(base_dir)
        self.every = max(1, every)

    def _run_dir(self, run_id: str) -> Path:
        return Path(self.base_dir) / run_id

    def save(self, df: DataFrame, superstep: int, aggr: dict, run_id: str) -> DataFrame:
        """Phase 1: write the state durably (no manifest yet).

        The manifest needs the aggregator values *produced by* this
        superstep, which the engine only knows after its stats action —
        so publication happens in :meth:`commit` (phase 2).  A crash in
        between leaves data without a manifest, which resume ignores.
        """
        if superstep % self.every != 0:
            return df.localCheckpoint(eager=True)
        spark = df.sparkSession
        step_dir = self._run_dir(run_id) / f"superstep={superstep:06d}"
        data_path = str(step_dir / "state")
        # a restarted run may overwrite a superstep that already published a
        # manifest; retract it BEFORE touching the data so a crash mid-write
        # can never leave a complete manifest pointing at torn files
        old_manifest = step_dir / "manifest.json"
        if old_manifest.exists():
            old_manifest.unlink()
        # keep every column the engine reads after _truncate (stats agg uses
        # old_value/participate/has_msg) so the round-trip is transparent
        df.write.mode("overwrite").parquet(data_path)
        reread = spark.read.parquet(data_path)
        lineage = [
            {
                "partition_id": int(r["pid"]),
                "rows": int(r["rows"]),
                "min_id": int(r["min_id"]),
                "max_id": int(r["max_id"]),
            }
            for r in reread.groupBy(F.spark_partition_id().alias("pid"))
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.min("id").alias("min_id"),
                F.max("id").alias("max_id"),
            )
            .collect()
        ]
        self._pending = {
            "run_id": run_id,
            "superstep": superstep,
            "state_path": data_path,
            "partition_lineage": lineage,
            # the global visible DURING this superstep (needed to re-derive
            # its outgoing messages exactly on resume)
            "aggregates_in": _aggr_json(aggr),
        }
        return reread

    def commit(self, superstep: int, aggr: dict, run_id: str) -> None:
        """Phase 2: atomically publish the manifest with the aggregator
        globals this superstep produced (the value the next superstep
        reads — Worker.cc:729-731 timeline)."""
        pending = getattr(self, "_pending", None)
        if not pending or pending["superstep"] != superstep or pending["run_id"] != run_id:
            return
        step_dir = Path(pending["state_path"]).parent
        manifest = {
            **pending,
            "aggregates": _aggr_json(aggr),
            "wall_time": time.time(),
            "complete": True,
        }
        os.makedirs(step_dir, exist_ok=True)
        tmp = step_dir / "manifest.json.tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, step_dir / "manifest.json")  # atomic publish
        self._pending = None

    # -- resume ----------------------------------------------------------
    def manifests(self, run_id: str) -> list[dict]:
        out = []
        run_dir = self._run_dir(run_id)
        if not run_dir.exists():
            return out
        for step_dir in sorted(run_dir.glob("superstep=*")):
            m = step_dir / "manifest.json"
            if m.exists():
                with open(m) as f:
                    doc = json.load(f)
                if doc.get("complete"):
                    out.append(doc)
        return out

    def latest(
        self, spark: SparkSession, run_id: str
    ):
        """(state_df, superstep, aggregates, aggregates_in) of the newest complete
        checkpoint, or None.  Feed directly to ``PregelEngine.run``'s
        ``resume_from``; the aggregates dict is the aggregator state
        *produced by* that superstep (what the next superstep sees as
        global — the Worker.cc:729-731 timeline)."""
        ms = self.manifests(run_id)
        if not ms:
            return None
        m = ms[-1]
        df = spark.read.parquet(m["state_path"])
        return (df, int(m["superstep"]), dict(m["aggregates"]),
                dict(m.get("aggregates_in", m["aggregates"])))
