"""Token co-occurrence graph construction (word-embedding prep).

word2vec/GloVe-style training starts from a co-occurrence matrix: for
every pair of vocabulary terms, in how many documents (or windows) do
both appear?  At corpus scale this is the canonical "almost quadratic"
trap — the safe shape is quadratic only PER DOCUMENT in its *distinct*
token count (bounded by document length, independent of corpus size),
then one map-side-combined count.

Scale discipline mirrors the dedup tier: stop tokens are dropped BEFORE
pair generation (a token in every document would otherwise contribute
|docs| rows per partner), pairs are ordered ``tok_a < tok_b`` so each
unordered pair appears once, and a ``min_count`` output filter keeps
the long tail of hapax pairs out of the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphlite_spark.functions.text import STOPWORDS, tokens_expr


def token_cooccurrence(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    drop_stopwords: bool = True,
) -> DataFrame:
    """(tok_a, tok_b, n_docs) — document-level co-occurrence counts for
    distinct token pairs, ``tok_a < tok_b``, kept when ``n_docs >=
    min_count``."""
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokens_expr(text_col))).alias("tok"),
    )
    if drop_stopwords:
        toks = toks.where(~F.col("tok").isin(*STOPWORDS))
    a = toks.select("doc_id", F.col("tok").alias("tok_a"))
    b = toks.select("doc_id", F.col("tok").alias("tok_b"))
    pairs = a.join(b, "doc_id").where(F.col("tok_a") < F.col("tok_b"))
    return (
        pairs.groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .where(F.col("n_docs") >= min_count)
    )
