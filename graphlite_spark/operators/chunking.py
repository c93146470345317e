"""Fixed-size token-window document chunking with overlap.

The preprocessing sibling of operators/packing.py: packing CONCATENATES
short documents into context windows, chunking SPLITS long documents
into overlapping context-length windows — the step an LLM training
pipeline runs on books/transcripts before packing or embedding.

Pure per-row expression work: tokenize (the repo-wide
functions/text.tokens_expr discipline — lowercase, whitespace runs,
drop empties), one ``sequence`` of chunk starts, one ``explode`` —
embarrassingly parallel, no shuffle at any corpus size.  Chunk starts
step by ``chunk_tokens - overlap``; every token lands in at least one
chunk, chunk i starts at i·step, and the trailing chunk may be shorter
(kept whenever it starts before the end of the document — the
engine-deterministic rule mirrored in the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphlite_spark.functions.text import tokens_expr


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, chunk_idx, n_tokens, chunk_text) — one row per
    chunk-sized token window; ``overlap`` tokens are shared between
    consecutive chunks.  Documents with zero tokens emit no rows."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"chunk_documents: need 0 <= overlap < chunk_tokens, got "
            f"overlap={overlap}, chunk_tokens={chunk_tokens}"
        )
    step = chunk_tokens - overlap
    toks = docs.select(
        F.col(id_col), tokens_expr(F.col(text_col)).alias("toks")
    ).withColumn("n", F.size("toks"))
    chunks = (
        toks.where(F.col("n") >= 1)
        .select(
            id_col,
            "toks",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor((F.col("n") - 1) / step).cast("long"),
                )
            ).alias("chunk_idx"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.slice(
                "toks", F.col("chunk_idx") * step + 1, chunk_tokens
            ).alias("ctoks"),
        )
    )
    return chunks.select(
        id_col,
        "chunk_idx",
        F.size("ctoks").cast("long").alias("n_tokens"),
        F.array_join("ctoks", " ").alias("chunk_text"),
    )
