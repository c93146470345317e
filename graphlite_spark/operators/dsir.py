"""DSIR — hashed n-gram importance weighting for data selection.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023):
score every document in a raw pool by how target-like its hashed bigram
feature distribution is, ``log w(x) = Σ_features log(p_target / q_raw)``,
then select/resample by weight.  This is the standard published recipe
for steering a pretraining mixture toward a target domain without a
trained classifier — the selection sibling of the perplexity filter
(:func:`~graphlite_spark.operators.ngram_lm.doc_lm_cost`).

Feature space: ordered token bigrams hashed into ``n_buckets`` buckets
(the paper's hashed n-gram model) via the engine-portable 48-bit md5;
both bucket distributions are add-one smoothed over the bucket count.

Exactness discipline (tf_idf / doc_lm_cost pattern): the per-bucket
log-ratio is rounded ONCE to integer micro-nats —
``round(1e6 · ln((ct+1)(Nr+B) / ((cr+1)(Nt+B))))`` where every operand
of the single double division is an exact BIGINT — so per-document
weights are BIGINT sums with no float-order dependence, and the DuckDB
oracle matches hash-exact.

Scale shape: one explode → one map-side-combined (doc, bucket) count;
the bucket model is at most ``n_buckets`` rows (bounded, data-free
size) and BROADCASTS to the scoring join — the corpus is never
shuffled on anything wider than (doc_id, bucket).  The two totals fold
in as literals (one extra action, the tf_idf N pattern).  At >>1e9-doc
scale the BIGINT smoothing products approach 2^63 — move the two
products to DECIMAL(38,0) there; the join shape is already the right
one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphlite_spark.functions.hashes import SEP, hash48
from graphlite_spark.functions.text import tokens_expr


def dsir_weights(
    docs: DataFrame,
    target_lang: str = "en",
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """(doc_id, n_bigrams, logweight_micros) — per-document DSIR
    importance log-weight toward the ``lang_col == target_lang`` target
    set, in integer micro-nats (positive = more target-like than the
    raw pool; resampling probability ∝ ``exp(logweight_micros/1e6)``).
    Documents with fewer than two tokens carry weight 0."""
    t = tokens_expr(text_col)
    idx = F.sequence(F.lit(1), F.size(t) - 1)
    buckets = F.when(
        F.size(t) >= 2,
        F.transform(
            idx,
            lambda i: hash48(
                F.concat_ws(SEP, F.element_at(t, i), F.element_at(t, i + 1))
            )
            % n_buckets,
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    bg = docs.select(
        F.col(id_col),
        F.col(lang_col),
        F.explode(buckets).alias("bucket"),
    )
    # per-(doc, bucket) multiplicity first: map-side combine, and the
    # scoring join input is bucket-distinct per doc
    pm = bg.groupBy(id_col, lang_col, "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    bk = pm.groupBy("bucket").agg(
        F.sum(
            F.when(F.col(lang_col) == target_lang, F.col("m")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("ct"),
        F.sum("m").cast("long").alias("cr"),
    )
    tot = bk.agg(
        F.sum("ct").cast("long").alias("nt"), F.sum("cr").cast("long").alias("nr")
    ).first()
    nt, nr = int(tot["nt"] or 0), int(tot["nr"] or 0)
    model = bk.select(
        "bucket",
        F.round(
            F.lit(1_000_000.0)
            * F.log(
                ((F.col("ct") + 1) * F.lit(nr + n_buckets)).cast("double")
                / ((F.col("cr") + 1) * F.lit(nt + n_buckets)).cast("double")
            )
        )
        .cast("long")
        .alias("lw"),
    )
    per_doc = (
        pm.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("m").cast("long").alias("n_bigrams"),
            F.sum(F.col("m") * F.col("lw")).cast("long").alias("w"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("w", F.lit(0)).cast("long").alias("logweight_micros"),
        )
    )
