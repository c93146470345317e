"""TF-IDF term scoring over a document corpus.

The baseline relevance/feature weighting for text pipelines: score(t, d)
= tf(t, d) · ln(N / df(t)).  Two grouped counts and one join — fully
partial-aggregatable, no quadratic shape anywhere.

Exactness discipline (same trick as Adamic-Adar): the idf factor is
rounded ONCE per term to integer micro-units (``round(1e6·ln(N/df))``),
then multiplied by the integer term frequency — the resulting scores
are BIGINT-exact, so the cross-engine oracle comparison needs no float
tolerance.  N (corpus size) is a single scalar count folded in as a
literal — one extra action, not a per-row driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphlite_spark.functions.text import tokens_expr


def tf_idf(
    docs: DataFrame,
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """(doc_id, term, tf, df, tfidf_micros) — integer-exact TF-IDF.
    Terms appearing in fewer than ``min_df`` documents are dropped;
    terms appearing in every document score 0 (ln 1)."""
    n_docs = docs.count()
    toks = docs.select(
        "doc_id", F.explode(tokens_expr(text_col)).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    if min_df > 1:
        df_ = df_.where(F.col("df") >= min_df)
    idf = df_.select(
        "term",
        "df",
        F.round(F.lit(1_000_000.0) * F.log(F.lit(float(n_docs)) / F.col("df")), 0)
        .cast("long")
        .alias("idf_micros"),
    )
    return tf.join(idf, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        (F.col("tf") * F.col("idf_micros")).cast("long").alias("tfidf_micros"),
    )
