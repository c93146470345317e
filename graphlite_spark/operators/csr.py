"""Per-partition CSR scatter kernels (the north-star physical layout).

GraphLite keeps each worker's subgraph as a packed CSR: a contiguous
source-sorted edge array plus per-vertex (edge_index, out_degree)
(include/Node.h:47-68, engine/Worker.cc:303-322, include/Vertex.h:212-218).
This module re-creates exactly that layout *per Spark partition* as packed
numpy arrays shipped through Arrow:

* vertices are assigned to partition ``pid = pmod(id, P)`` — the
  reference's static modulo placement (engine/Node.cc:104) — and edges are
  co-located with their **source** vertex (``pid = pmod(src, P)``, the same
  1-D edge-cut);
* :func:`build_csr_blocks` packs each partition's edges once into one row
  ``(pid, srcs[], indptr[], dsts[])`` — ``indptr`` plays the role of
  ``m_edge_index``/``m_out_degree``; the blocks are persisted and reused by
  every superstep;
* the cogrouped scatter kernel gathers each sender's adjacency slice
  (``dsts[indptr[p]:indptr[p+1]]``), generates its messages vectorized
  (numpy, no per-row Python), and **pre-combines by destination inside the
  kernel** (``np.add.at`` / ``np.minimum.at``) before anything hits the
  shuffle — the Pregel combiner the reference lacks, demanded by the north
  rule.

Use :class:`CSRPregelEngine` for algorithms that broadcast one value to all
out-neighbors with a sum/min reduction (PageRank, connected components).
Algorithms with non-expressible combines (LPA's mode) stay on the base
join engine.

Sizing at 100 TB: one block row holds one partition's packed edge arrays,
so pick P ≈ E / ~5M (≈ 40 MB of int64 per block) — the same rule as
``PregelEngine.num_partitions``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphlite_spark.operators.pregel import PregelAlgorithm, PregelEngine

CSR_SCHEMA = "pid int, srcs array<long>, indptr array<long>, dsts array<long>"


def _ranges(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenate [s, s+len) ranges without a Python loop.

    Zero-length ranges contribute nothing (mirroring ``np.repeat``), so the
    output stays aligned with messages repeated by the same ``lens``.
    """
    mask = lens > 0
    starts, lens = starts[mask], lens[mask]
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    out = np.ones(total, dtype=np.int64)
    ends = np.cumsum(lens)
    out[0] = starts[0]
    out[ends[:-1]] = starts[1:] - (starts[:-1] + lens[:-1]) + 1
    return np.cumsum(out)


def build_csr_blocks(edges: DataFrame, num_partitions: int) -> DataFrame:
    """One packed CSR row per pid; persisted by the caller."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["src", "dst"], kind="mergesort")
        src = pdf["src"].to_numpy(np.int64)
        dst = pdf["dst"].to_numpy(np.int64)
        srcs, counts = np.unique(src, return_counts=True)
        indptr = np.zeros(len(srcs) + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
        return pd.DataFrame(
            {
                "pid": [int(pdf["pid"].iloc[0])],
                "srcs": [srcs],
                "indptr": [indptr],
                "dsts": [dst],
            }
        )

    with_pid = edges.select(
        F.pmod(F.col("src"), F.lit(num_partitions)).cast("int").alias("pid"),
        "src",
        "dst",
    )
    return with_pid.groupBy("pid").applyInPandas(pack, schema=CSR_SCHEMA)


class CSRPregelAlgorithm(PregelAlgorithm):
    """Adds the vectorized kernel hooks the CSR scatter needs."""

    #: 'sum' or 'min' — in-kernel pre-combine op (must equal combine_expr)
    reduce_kind: str = "sum"
    #: numpy dtype of the message values
    msg_dtype: str = "float64"

    def message_numpy(
        self,
        values: np.ndarray,
        out_degree: np.ndarray,
        superstep: int,
        aggr: dict[str, float],
    ) -> np.ndarray:
        """Per-sender message value (broadcast to all its out-neighbors) —
        the vectorized form of :meth:`PregelAlgorithm.message`."""
        raise NotImplementedError


class CSRPregelEngine(PregelEngine):
    """PregelEngine whose scatter runs through packed per-partition CSR
    kernels with in-kernel combining (GraphLite's physical layout, Spark's
    execution)."""

    def prepare(self, vertices, edges, algo):
        if self.hub_threshold is not None:
            # the base engine's hub split would remove hub edges from `e`,
            # and this scatter ignores the split frames — hub messages would
            # silently vanish.  Hub fan-out inside a CSR block is already
            # vectorized; use the join engine if broadcast splitting is
            # needed.
            raise ValueError("CSRPregelEngine does not support hub_threshold")
        state, e = super().prepare(vertices, edges, algo)
        P = self.num_partitions
        self._csr = build_csr_blocks(e, P).persist()
        self._owned.append(self._csr)
        self._csr.count()  # build once, reuse every superstep
        return state, e

    def _scatter(self, state, e, algo, superstep, aggr):
        P = self.num_partitions
        reduce_kind = algo.reduce_kind
        msg_dtype = algo.msg_dtype
        value_np = "int64" if algo.value_type == "long" else "float64"
        out_schema = f"dst long, msg {algo.value_type}"

        def kernel(state_pdf: pd.DataFrame, csr_rows: pd.DataFrame) -> pd.DataFrame:
            if csr_rows.empty:
                return pd.DataFrame({"dst": [], "msg": []}).astype(
                    {"dst": "int64", "msg": msg_dtype}
                )
            srcs = np.asarray(csr_rows["srcs"].iloc[0], dtype=np.int64)
            indptr = np.asarray(csr_rows["indptr"].iloc[0], dtype=np.int64)
            dsts = np.asarray(csr_rows["dsts"].iloc[0], dtype=np.int64)

            snd = state_pdf[state_pdf["send"]]
            if snd.empty:
                return pd.DataFrame({"dst": [], "msg": []}).astype(
                    {"dst": "int64", "msg": msg_dtype}
                )
            ids = snd["id"].to_numpy(np.int64)
            pos = np.searchsorted(srcs, ids)
            present = (pos < len(srcs)) & (srcs[np.minimum(pos, len(srcs) - 1)] == ids)
            pos = pos[present]
            values = snd["value"].to_numpy(value_np)[present]
            starts = indptr[pos]
            lens = indptr[pos + 1] - starts

            msg_per_sender = algo.message_numpy(
                values, lens.astype(np.int64), superstep, aggr
            )
            d = dsts[_ranges(starts, lens)]
            m = np.repeat(msg_per_sender, lens)

            # in-kernel combiner: pre-reduce by destination BEFORE the shuffle
            ud, inv = np.unique(d, return_inverse=True)
            if reduce_kind == "sum":
                acc = np.zeros(len(ud), dtype=msg_dtype)
                np.add.at(acc, inv, m)
            elif reduce_kind == "min":
                acc = np.full(len(ud), np.iinfo(np.int64).max
                              if msg_dtype == "int64" else np.inf, dtype=msg_dtype)
                np.minimum.at(acc, inv, m)
            else:  # pragma: no cover
                raise ValueError(f"unsupported reduce {reduce_kind!r}")
            return pd.DataFrame({"dst": ud, "msg": acc})

        keyed = state.select(
            F.pmod(F.col("id"), F.lit(P)).cast("int").alias("pid"),
            "id", "value", "send",
        )
        return (
            keyed.groupBy("pid")
            .cogroup(self._csr.groupBy("pid"))
            .applyInPandas(kernel, schema=out_schema)
        )
