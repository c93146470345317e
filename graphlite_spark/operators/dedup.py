"""Deduplication operators for large-scale training-data pipelines.

All four families the pipeline tier needs, expressed Spark-first:

* **exact**        — hash-groupBy on md5(text); one shuffle on the digest.
* **n-gram Jaccard** — explode distinct word-3-gram shingles, self-join on
  the shingle, count co-occurrences, Jaccard = c / (|A|+|B|-c).  The
  shingle join shuffles on the shingle value, so hot shingles (boilerplate)
  are the skew risk at scale; AQE skew-join handles the join, and a
  ``max_doc_freq`` filter drops shingles shared by more than a fraction of
  docs (stop-shingles carry no dedup signal but quadratic join cost).
* **MinHash + LSH** — K min-hashes over the shingle set (one groupBy with K
  ``min()`` aggregates — map-side partial agg keeps the shuffle tiny),
  banded into B bands; docs sharing a band bucket are candidates; exact
  Jaccard verifies.  This is the 100 TB path: cost is O(docs·shingles) +
  O(candidate pairs), never all-pairs.
* **SimHash**      — W-bit signature; per-token 48-bit md5 supplies the
  bits, tokens exploded once, a single groupBy sums per-bit ±1 votes
  (W sum columns, all JVM-side), sign → bit.

Everything is computable identically in DuckDB (md5-based hashes — see
:mod:`graphlite_spark.functions.hashes`), which the correctness oracle
exploits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphlite_spark.functions.hashes import SEP, hash48
from graphlite_spark.functions.text import shingles_expr, tokens_expr


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, canonical_id, is_dup) — canonical = min id per md5(text)."""
    digests = docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
    canon = digests.groupBy("digest").agg(F.min(id_col).alias("canonical_id"))
    return (
        digests.join(canon, "digest")
        .select(
            id_col,
            "canonical_id",
            (F.col(id_col) != F.col("canonical_id")).alias("is_dup"),
        )
    )


def _doc_shingles(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams per doc.

    The token array is STAGED as its own projection before the shingle
    transform: a Column reference inlines its whole expression tree at
    every use site, and ``shingles_expr``'s lambda reads the token array
    ``n`` times per shingle — inlined, the split/filter tokenization
    re-executed ~3× per shingle per row (higher-order-function lambdas
    get no subexpression elimination).  Staged, it runs once per row;
    CollapseProject keeps non-cheap multi-referenced aliases staged.
    Measured at sf0.1 (5k docs): the shingle pass drops 8.5 s → ~1 s."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens_expr(text_col).alias("_toks")
    )
    return toks.select(
        "doc_id",
        F.explode(F.array_distinct(shingles_expr(F.col("_toks"), n))).alias(
            "shingle"
        ),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.3,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_doc_freq: float | None = 0.01,
) -> DataFrame:
    """(a, b, jaccard) for pairs with Jaccard >= threshold over n-gram sets.

    ``max_doc_freq``: drop shingles appearing in more than that fraction of
    docs *from the self-join only*; set sizes (the Jaccard denominator)
    keep every shingle.  The reported Jaccard is therefore EXACT for pairs
    sharing no dropped shingle and a LOWER BOUND for pairs that do share
    one (their intersection count is understated, so such a pair can fall
    below ``threshold``) — an approximation, mirrored exactly by the
    oracle SQL.  Stop-shingles (boilerplate) carry ~no dedup signal but
    quadratic join cost — a shingle shared by k docs contributes k^2 join
    rows, the one all-pairs blowup in the module — so the filter is ON by
    default (1% of docs); pass ``max_doc_freq=None`` for the
    exactness-at-all-costs opt-out.
    """
    sh = _doc_shingles(docs, id_col, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    joinable = sh
    if max_doc_freq is not None:
        n_docs = docs.count()
        cap = int(max_doc_freq * n_docs)
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > cap)
            .select("shingle")
        )
        joinable = sh.join(F.broadcast(hot), "shingle", "left_anti")
    left = joinable.select(F.col("doc_id").alias("a"), "shingle")
    right = joinable.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        left.join(right, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return _jaccard_from_intersections(inter, sizes).where(
        F.col("jaccard") >= threshold
    )


def _jaccard_from_intersections(inter: DataFrame, sizes: DataFrame) -> DataFrame:
    """(a, b, c) + per-doc set sizes -> (a, b, jaccard)."""
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb"))
    return inter.join(sa, "a").join(sb, "b").select(
        "a",
        "b",
        F.round(F.col("c") / (F.col("na") + F.col("nb") - F.col("c")), 6).alias(
            "jaccard"
        ),
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, h0..h{K-1}) — K independent min-hashes of the shingle set.

    Hash family k: 48-bit md5 of ``k <SEP> shingle`` (engine-agnostic).
    One explode + one groupBy with K min() aggregates.
    """
    sh = _doc_shingles(docs, id_col, text_col, n)
    hashed = sh.select(
        "doc_id",
        *[
            hash48(F.concat_ws(SEP, F.lit(str(k)), F.col("shingle"))).alias(f"hk{k}")
            for k in range(num_hashes)
        ],
    )
    return hashed.groupBy("doc_id").agg(
        *[F.min(f"hk{k}").alias(f"h{k}") for k in range(num_hashes)]
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(a, b, jaccard) — pairs sharing >=1 LSH band, with exact Jaccard.

    rows-per-band = num_hashes / bands; a band key is the md5 of its
    concatenated signature rows.  Join cost scales with bucket sizes, not
    docs^2 — the scale path.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, n, id_col, text_col)
    band_cols = [
        F.md5(
            F.concat_ws(
                SEP,
                F.lit(str(b)),
                *[F.col(f"h{b * rows + r}").cast("string") for r in range(rows)],
            )
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select("doc_id", *band_cols)
    stacked = banded.select(
        "doc_id",
        F.explode(F.array(*[F.col(f"band{b}") for b in range(bands)])).alias("bucket"),
    )
    cand = (
        stacked.alias("x")
        .join(stacked.alias("y"), "bucket")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )
    # candidate-only verify: exact Jaccard computed ONLY for LSH candidate
    # pairs — never the all-pairs shingle self-join.  cand ⋈ shingles(a)
    # ⋈ shingles(b) on (b, shingle) counts each pair's intersection; cost
    # is Σ_cand |shingles(a)|, proportional to candidates, not docs².
    sh = _doc_shingles(docs, id_col, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sha = sh.select(F.col("doc_id").alias("a"), "shingle")
    shb = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        cand.join(sha, "a")
        .join(shb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    verified = _jaccard_from_intersections(inter, sizes)
    return cand.join(verified, ["a", "b"], "left").select(
        "a", "b", F.coalesce("jaccard", F.lit(0.0)).alias("jaccard")
    )


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefilter_bits: int | None = None,
) -> DataFrame:
    """(a, b, sim) — embedding-cosine near-duplicate pairs.

    Brute force over a<b pairs by default (exact); with ``prefilter_bits``
    the pair space is restricted to sign-bit LSH bucket collisions first —
    the 100 TB path (bucket equi-join instead of a cross join).
    """
    from graphlite_spark.operators.similarity import cosine_expr, lsh_bucket

    x = embeddings.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    y = embeddings.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    if prefilter_bits:
        x = x.withColumn("bucket", lsh_bucket(F.col("va"), prefilter_bits))
        y = y.withColumn("bucket", lsh_bucket(F.col("vb"), prefilter_bits))
        pairs = x.join(y, "bucket").where(F.col("a") < F.col("b"))
    else:
        pairs = x.join(y, F.col("a") < F.col("b"))
    return (
        pairs.select(
            "a", "b", F.round(cosine_expr(F.col("va"), F.col("vb")), 6).alias("sim")
        )
        .where(F.col("sim") >= threshold)
    )


def simhash_signatures(
    docs: DataFrame,
    bits: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, simhash) — W-bit simhash over the distinct token set.

    bit j of the signature = sign of Σ_tokens (2·bit_j(h48(token)) − 1).
    Ties (sum == 0) resolve to 0.  One explode + one groupBy with W sums.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens_expr(text_col))).alias("tok"),
    ).withColumn("h", hash48(F.col("tok")))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1)
            ).alias(f"s{j}")
            for j in range(bits)
        ]
    )
    sig = None
    for j in range(bits):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return votes.select("doc_id", sig.cast("long").alias("simhash"))


def near_dup_clusters(
    docs: DataFrame,
    threshold: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, cluster) — near-duplicate clusters: connected components
    (the O(log d) label-doubling variant) over the LSH candidate pairs
    that verify at >= ``threshold`` Jaccard.

    The graph engine powering the pipeline: cluster ids are the min
    doc_id of each transitive near-dup group, so singletons keep their
    own id.  Scale shape: pair generation is the banded-LSH path (never
    all-pairs), and the clustering rides O(log d) rounds over a pair
    graph that is tiny relative to the corpus."""
    from graphlite_spark.algos.components import connected_components_fast

    pairs = minhash_lsh_candidates(docs, id_col=id_col, text_col=text_col).where(
        F.col("jaccard") >= threshold
    )
    verts = docs.select(F.col(id_col).alias("id"))
    dedges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), F.lit(1.0).alias("weight")
    )
    cc = connected_components_fast(verts, dedges)
    return cc.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster")
    )


def dedup_representatives(
    docs: DataFrame,
    threshold: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(cluster, rep_doc_id, n_docs, rep_quality) — the doc a pipeline
    KEEPS per near-dup cluster: highest quality score, doc_id as the
    deterministic tie-break (quality is 6dp-rounded on both engines, so
    sub-1e-6 float noise cannot flip the winner).

    This is the step that actually deduplicates: clustering alone only
    labels; selection turns labels into a kept set.  Scale shape: one
    window partitioned BY CLUSTER (clusters are near-dup groups — small
    by construction; never a global window) computing rank and group
    size in one pass over the cluster-joined quality table."""
    from pyspark.sql import Window

    from graphlite_spark.functions.text import quality_exprs

    clusters = near_dup_clusters(docs, threshold, id_col=id_col, text_col=text_col)
    q = quality_exprs(tokens_expr(text_col))
    scored = docs.select(F.col(id_col).alias("doc_id"), q["quality"].alias("quality"))
    j = clusters.join(scored, "doc_id")
    w = Window.partitionBy("cluster").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        j.select(
            "cluster",
            "doc_id",
            "quality",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("cluster")).alias("n_docs"),
        )
        .where(F.col("rn") == 1)
        .select(
            "cluster",
            F.col("doc_id").alias("rep_doc_id"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("quality").alias("rep_quality"),
        )
    )


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.2,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, bench_id, shared, n_shingles, containment) — benchmark
    DECONTAMINATION: for each training doc, its best-overlapping
    benchmark doc by n-gram CONTAINMENT (shared shingles / the doc's own
    shingle count — the directional measure decontamination uses, not
    Jaccard: a short benchmark prompt embedded in a long doc must still
    flag).  Rows only for containment >= threshold; best match picked by
    (shared DESC, bench_id ASC) per doc.

    Scale shape: the benchmark side is small by definition (an eval
    suite), so its shingle table broadcast-joins against the corpus
    shingles — the corpus is touched once, no self-join, no shuffle of
    the corpus by shingle.  Exact integers + one 6dp division."""
    sh_docs = _doc_shingles(docs, id_col, text_col, n)
    sh_bench = _doc_shingles(benchmark, id_col, text_col, n).select(
        F.col("doc_id").alias("bench_id"), "shingle"
    )
    sizes = sh_docs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    shared = (
        sh_docs.join(F.broadcast(sh_bench), "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("shared").desc(), F.col("bench_id").asc()
    )
    best = (
        shared.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        best.join(sizes, "doc_id")
        .select(
            "doc_id",
            "bench_id",
            F.col("shared").cast("long").alias("shared"),
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.round(F.col("shared") / F.col("n_shingles"), 6).alias(
                "containment"
            ),
        )
        .where(F.col("containment") >= threshold)
    )


def jaccard_join_prefix(
    docs: DataFrame,
    threshold_permille: int = 600,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, doc_b, inter, union_sz, jaccard) — ALL pairs of documents
    whose token-SET Jaccard ≥ threshold, found with the PREFIX FILTER
    (Chaudhuri et al. 2006 / Bayardo et al. AllPairs 2007, public
    literature), verified EXACTLY.

    The filter: order each document's distinct tokens rarest-first
    (global document frequency asc, token asc); two sets with Jaccard ≥ t
    MUST share a token inside each one's first n − ⌈t·n⌉ + 1 tokens, so
    only prefix tokens are indexed — candidates shrink from every
    shared-token pair to shared-RARE-token pairs, the standard exact
    similarity-join at scale.  Verification counts the true intersection
    on candidates only; the threshold test is INTEGER
    (inter·1000 ≥ t‰·union — no float ever gates a pair), and the
    reported jaccard is the one 6dp division.

    The oracle deliberately runs WITHOUT the filter (all shared-token
    pairs, brute force) — matching it proves the prefix filter loses no
    pair.  Scale shape: per-doc windows only (never global), one
    equi-join on the prefix token, candidate-only verification — the
    same cost envelope as the MinHash path but exact."""
    t = threshold_permille
    toks = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(F.array_distinct(tokens_expr(F.col(text_col)))).alias(
                "tok"
            ),
        )
    )
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc").orderBy("df", "tok")
    ranked = (
        toks.join(dfreq, "tok")
        .select("doc", "tok", "df", F.row_number().over(w).alias("pos"))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("doc")))
    )
    # prefix length = n - ceil(t*n/1000) + 1, all integer arithmetic
    prefix = ranked.where(
        F.col("pos")
        <= F.col("n") - F.expr(f"(({t} * n) + 999) div 1000") + 1
    ).select("doc", "tok", "n")
    pa = prefix.select(
        F.col("doc").alias("doc_a"), "tok", F.col("n").alias("na")
    )
    pb = prefix.select(
        F.col("doc").alias("doc_b"), "tok", F.col("n").alias("nb")
    )
    cands = (
        pa.join(pb, "tok")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "na", "nb")
        .distinct()
    )
    ta = toks.select(F.col("doc").alias("doc_a"), "tok")
    tb = toks.select(F.col("doc").alias("doc_b"), "tok")
    inter = (
        cands.join(ta, "doc_a")
        .join(tb, ["doc_b", "tok"])
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    u = (F.col("na") + F.col("nb") - F.col("inter")).cast("long")
    return (
        inter.where(F.col("inter") * 1000 >= t * u)
        .select(
            "doc_a",
            "doc_b",
            "inter",
            u.alias("union_sz"),
            F.round(
                F.col("inter").cast("double") / u.cast("double"), 6
            ).alias("jaccard"),
        )
    )


def duplicate_ngram_spans(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, span_start, span_end, span_tokens) — the token spans of
    each document covered by an n-gram that occurs MORE THAN ONCE in the
    corpus (anywhere — another doc or elsewhere in the same doc): the
    marking pass of ExactSubstr-style training-data dedup (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better",
    public literature).  Overlapping covered windows merge into maximal
    spans (gaps-and-islands with a per-document window — never global).
    Span bounds are 0-based inclusive token positions.

    Shape: one explode to positioned n-grams, one map-side-combined
    global gram count, one semi-join back (gram-keyed — the dedup-exact
    shape), then per-doc windows for the merge.  At 100 TB the gram
    count table is the big intermediate — the same footprint ExactSubstr
    pays for its suffix array, here as a hash aggregate."""
    toks = docs.select(
        F.col(id_col).alias("doc"), tokens_expr(F.col(text_col)).alias("ts")
    )
    grams = toks.select(
        "doc",
        F.posexplode(shingles_expr(F.col("ts"), n)).alias("pos", "gram"),
    )
    dupg = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .select("gram")
    )
    covered = grams.join(dupg, "gram", "left_semi").select(
        "doc",
        F.col("pos").cast("long").alias("start"),
        (F.col("pos") + n - 1).cast("long").alias("end"),
    )
    w_ord = Window.partitionBy("doc").orderBy("start", "end")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    flagged = covered.select(
        "doc",
        "start",
        "end",
        # a new span starts only at a genuine GAP in coverage: adjacent
        # windows ([0,7],[8,15]) cover contiguous tokens and must merge
        F.when(
            F.col("start") > F.coalesce(
                F.max("end").over(w_prev), F.lit(-2)
            )
            + 1,
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    islands = flagged.withColumn(
        "island", F.sum("new_island").over(w_ord)
    )
    return (
        islands.groupBy("doc", "island")
        .agg(
            F.min("start").alias("span_start"),
            F.max("end").alias("span_end"),
        )
        .select(
            F.col("doc").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("span_tokens"),
        )
    )


def sorted_neighborhood_pairs(
    docs: DataFrame,
    window: int = 4,
    key_len: int = 16,
    threshold: float = 0.3,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(a, b, rank_gap, jaccard) — the sorted-neighborhood method
    (Hernández & Stolfo 1995, public literature), the classic
    entity-resolution blocking tier the LSH family doesn't cover: docs
    are ranked by a normalized sort key (lowercased text stripped to
    [a-z0-9], first ``key_len`` chars; doc_id tie-break), each doc is
    paired with the ``window`` docs that FOLLOW it in rank order, and
    candidates are verified with the module's exact n-gram Jaccard
    (``threshold`` gate, same 6dp convention as every other tier).
    SNM catches prefix-similar near-dups that shingle-bucket methods
    miss when edits concentrate late in the document, at linear
    candidate cost V·window.

    Scale shape: the global rank uses the distributed dense-id machinery
    (one range shuffle; NEVER a single-partition window), the
    window-of-w pairing is one explode(sequence(1, w)) + one equi-join
    on the shifted rank, and the Jaccard verify touches only candidate
    pairs (the LSH-verify discipline).  rank_gap (1..window) reports the
    neighborhood distance that produced each pair."""
    from graphlite_spark.plans.derive import assign_dense_ids

    if window < 1:
        raise ValueError("window must be >= 1")
    key = F.substring(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", ""), 1, key_len
    )
    ranked = assign_dense_ids(
        docs.select(F.col(id_col).alias("doc_id"), key.alias("sk")),
        ["sk", "doc_id"],
        id_col="rank",
    ).select("doc_id", "rank")
    left = ranked.select(
        F.col("doc_id").alias("a"), F.col("rank").alias("ra")
    ).withColumn("off", F.explode(F.sequence(F.lit(1), F.lit(window))))
    right = ranked.select(
        F.col("doc_id").alias("b"), F.col("rank").alias("rank2")
    )
    cand = left.withColumn("rank2", F.col("ra") + F.col("off")).join(
        right, "rank2"
    ).select("a", "b", F.col("off").cast("long").alias("rank_gap"))
    # candidate-only exact verify (shared shingle machinery)
    sh = _doc_shingles(docs, id_col, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sha = sh.select(F.col("doc_id").alias("a"), "shingle")
    shb = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        cand.join(sha, "a")
        .join(shb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    jac = _jaccard_from_intersections(inter, sizes)
    return (
        cand.join(jac, ["a", "b"])
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "rank_gap", "jaccard")
    )


def edit_distance_join(
    docs: DataFrame,
    k: int = 8,
    q: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(a, b, dist) — every unordered pair within Levenshtein distance
    ``k``, ED-Join style (Xiao, Wang & Lin, VLDB 2008 — public
    literature): the fuzzy tier of the dedup ladder, between exact
    hashing and token-set Jaccard (catches character-level noise —
    OCR errors, encoding damage, small edits — that token shingles
    miss).

    Soundness of the candidate filter: one edit touches at most ``q``
    q-gram TYPES, so two strings within distance k share a gram among
    the first ``k·q + 1`` of each one's grams sorted rarest-first
    (global document frequency, gram as tie-break); the length band
    ``|len(a) − len(b)| ≤ k`` is the other necessary condition.  The
    oracle brute-forces every length-banded pair, so its green row is a
    COMPLETENESS proof of the filter, exactly the jaccard_join_exact
    discipline.  Strings shorter than ``q`` have no grams and would be
    silently unpaired — guarded with a loud error (this corpus's
    minimum is far above q).

    Scale shape: gram extraction is a codegen transform/explode
    (output-linear); the df table is one map-side-combined groupBy; the
    per-doc rarest-prefix is a WindowGroupLimit (rows ≤ k·q+1 per doc);
    candidates come from an equi-join ON THE PREFIX GRAMS ONLY —
    rarest-first ordering keeps per-gram posting lists short, the
    hub-avoidance argument of every prefix filter in this module; the
    exact Levenshtein verify runs on candidates only, JVM-side
    (``F.levenshtein`` — no Python in the loop)."""
    prefix_len = k * q + 1
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.length(text_col).cast("long").alias("len"),
    )
    # loud guard: a sub-q string has no q-grams and no candidate path
    n_short = d.where(F.col("len") < q).limit(1).count()
    if n_short:
        raise ValueError(
            f"edit_distance_join: strings shorter than q={q} present — "
            "no q-gram prefix exists for them; raise their length or "
            "lower q"
        )
    grams = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"array_distinct(transform(sequence(1, length(text) - {q - 1}),"
                f" i -> substring(text, i, {q})))"
            )
        ).alias("gram"),
    )
    # df as a count-over-gram window: the old groupBy+join formulation
    # shuffled the gram table by gram for the join ANYWAY, but ran the
    # expensive gram-extraction pipeline twice (once per branch); the
    # window keeps the identical exchange and extracts once.
    wg = Window.partitionBy("gram")
    w = Window.partitionBy("doc_id").orderBy("df", "gram")
    prefix = (
        grams.withColumn("df", F.count(F.lit(1)).over(wg))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= prefix_len)
        .select("doc_id", "gram")
    )
    # Stage the rarest-prefix table once: it is the (≤ prefix_len)·N-row
    # product of the expensive gram-extraction pipeline (transform +
    # array_distinct over every text), and both self-join sides plus the
    # candidate join would otherwise re-run that pipeline per reference.
    prefix = prefix.join(d.select("doc_id", "len"), "doc_id").localCheckpoint(
        eager=True
    )
    pa = prefix.select(
        F.col("doc_id").alias("a"), "gram", F.col("len").alias("la")
    )
    pb = prefix.select(
        F.col("doc_id").alias("b"), "gram", F.col("len").alias("lb")
    )
    cand = (
        pa.join(pb, "gram")
        .where(
            (F.col("a") < F.col("b"))
            & (F.abs(F.col("la") - F.col("lb")) <= k)
        )
        .select("a", "b")
        .distinct()
        .localCheckpoint(eager=True)  # pair-count-sized; frees the prefix leaf
    )
    from graphlite_spark.checkpoint import release_local_checkpoint

    release_local_checkpoint(prefix)
    ta = d.select(F.col("doc_id").alias("a"), F.col("text").alias("text_a"))
    tb = d.select(F.col("doc_id").alias("b"), F.col("text").alias("text_b"))
    # Banded verify: the 3-arg levenshtein (Spark 4) computes only the
    # ±k diagonal band — O(k·L) per pair instead of O(L²) — returning -1
    # past the threshold and the EXACT distance inside it, so the output
    # rows are identical (measured: the unbanded verify was over half
    # this query's wall on 1-2 KB texts).
    return (
        cand.join(ta, "a")
        .join(tb, "b")
        .select(
            "a",
            "b",
            F.levenshtein("text_a", "text_b", k).cast("long").alias("dist"),
        )
        .where((F.col("dist") >= 0) & (F.col("dist") <= k))
    )


def simhash_hamming_pairs(
    docs: DataFrame,
    bits: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(a, b, hamming) — document pairs whose simhash signatures differ
    in AT MOST ONE bit, found by Hamming-1 MULTIPROBE: each doc emits
    its signature plus the ``bits`` single-bit flips (bits+1 probe rows
    per doc), and a probe hitting another doc's EXACT signature is a
    candidate.  Probing raises recall over the exact-bucket simhash
    query (hamming-1 near-dups are invisible to equality buckets) while
    keeping the equi-join — never a Hamming nested loop.  ``hamming``
    (bit_count of the xor) rides along as the verification witness,
    and the equality dedupes the double discovery (a's flip hits b AND
    b's flip hits a).

    Scale shape: probes = (bits+1)·N rows with one codegen explode;
    one hash equi-join on the probe value; candidate-only xor verify —
    the multiprobe-LSH pattern (Lv et al., VLDB 2007) on the simhash
    family."""
    sig = simhash_signatures(docs, bits=bits, id_col=id_col, text_col=text_col)
    probes = sig.select(
        F.col("doc_id").alias("a"),
        F.col("simhash").alias("sig_a"),
        F.explode(
            F.array(
                F.col("simhash"),
                *[
                    F.col("simhash").bitwiseXOR(F.lit(1 << j))
                    for j in range(bits)
                ],
            )
        ).alias("probe"),
    )
    other = sig.select(
        F.col("doc_id").alias("b"), F.col("simhash").alias("probe")
    )
    return (
        probes.join(other, "probe")
        .where(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.expr("bit_count(sig_a ^ probe)").cast("long").alias("hamming"),
        )
        .distinct()
    )


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_doc_freq: float | None = 0.01,
) -> DataFrame:
    """(a, b, na, nb, c, containment) — ASYMMETRIC near-dup pairs by
    shingle containment ``|A∩B| / min(|A|, |B|)`` (Broder's containment
    on the smaller side): catches a short document quoted/excerpted
    inside a long one, which symmetric Jaccard structurally misses (a
    500-shingle doc fully contained in a 50,000-shingle doc has Jaccard
    ≈ 0.01 but containment 1.0).  The excerpt-detection axis of the
    dedup tier, next to the symmetric Jaccard/MinHash family.

    Same candidate machinery and stop-shingle discipline as
    :func:`ngram_jaccard_pairs` (df-capped shingles leave the self-join;
    set sizes keep every shingle, so the reported containment is exact
    for pairs sharing no dropped shingle and a lower bound otherwise —
    mirrored exactly by the oracle).  Per-shingle join fan-out stays
    df-capped; nothing here is all-pairs."""
    sh = _doc_shingles(docs, id_col, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    joinable = sh
    if max_doc_freq is not None:
        n_docs = docs.count()
        cap = int(max_doc_freq * n_docs)
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > cap)
            .select("shingle")
        )
        joinable = sh.join(F.broadcast(hot), "shingle", "left_anti")
    left = joinable.select(F.col("doc_id").alias("a"), "shingle")
    right = joinable.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        left.join(right, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .select(
            "a", "b",
            F.col("na").cast("long").alias("na"),
            F.col("nb").cast("long").alias("nb"),
            "c",
            F.round(
                F.col("c").cast("double") / F.least("na", "nb"), 6
            ).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_grams, n_fps, winnow_md5) — winnowing fingerprints
    (Schleimer-Wilkerson-Aiken, SIGMOD 2003 — the MOSS scheme): hash
    every token k-gram, slide a w-gram window, select each window's
    RIGHTMOST minimum hash; the distinct (position, hash) selections
    are the document's fingerprints, digested here as the md5 of the
    sorted ``pos:hash`` strings.  Guarantee: any shared token run of
    length >= w + k - 1 between two documents yields at least one
    shared fingerprint, with only ~2/(w+1) of grams retained — the
    principled density/detection tradeoff the ad-hoc rolling hash
    (`text_rolling_fp`) lacks; the local-exactness sibling of
    `containment_pairs`.

    Documents shorter than k tokens report (0, 0, NULL).  Scale shape:
    the selection is pure per-row expression work (nested transform
    over the gram array — no explode, no window function, no join),
    O(tokens · w) per document, zero shuffles.  Each stage (tokens →
    gram hashes → selection) is materialized as its OWN projection:
    referencing a Column object inlines its whole expression tree at
    every use site, so a single nested expression here would duplicate
    the gram computation ~5× inside the window lambda (measured 250 s
    for 500 docs; the staged form takes seconds)."""
    d1 = docs.select(F.col(id_col), tokens_expr(text_col).alias("_toks"))
    t = F.col("_toks")
    n = F.size(t)
    grams = F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: hash48(F.concat_ws(SEP, F.slice(t, i, F.lit(k)))),
    )
    d2 = d1.select(
        F.col(id_col),
        n.alias("_n"),
        F.when(n >= k, grams).alias("_hs"),
    )
    h = F.col("_hs")
    g = F.size(h)
    we = F.least(F.lit(w), g)

    def one(j):
        win = F.slice(h, j, we)
        mv = F.array_min(win)
        pos = j + we - F.array_position(F.reverse(win), mv)
        return F.concat(pos.cast("string"), F.lit(":"), mv.cast("string"))

    sel = F.array_sort(
        F.array_distinct(F.transform(F.sequence(F.lit(1), g - we + 1), one))
    )
    d3 = d2.select(
        F.col(id_col),
        F.col("_n"),
        F.when(F.col("_n") >= k, sel).alias("_sel"),
    )
    return d3.select(
        F.col(id_col),
        F.when(F.col("_n") >= k, (F.col("_n") - k + 1).cast("long"))
        .otherwise(F.lit(0))
        .alias("n_grams"),
        F.coalesce(F.size("_sel"), F.lit(0)).cast("long").alias("n_fps"),
        F.md5(F.array_join("_sel", SEP)).alias("winnow_md5"),
    )


def semdedup(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 3,
    tau: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster, dist_sq, keep) — SemDeDup (Abbas et al. 2023,
    arXiv:2303.09540): semantic deduplication by embedding.  Cluster
    with the deterministic integer k-means, then within each cluster
    drop any vector whose cosine to a LOWER-RANKED clustermate reaches
    ``tau`` (rank = (dist_sq to centroid ASC, id ASC) — the
    closest-to-centroid representative survives; the paper's keep rule
    is a free parameter, this one is deterministic and oracle-exact).
    ``keep`` is 1/0.

    Scale shape: the pairwise cosine never leaves a cluster — the
    candidate join is an equi-join on the cluster id (AQE splits a
    skewed cluster), and k is chosen ∝ N in the paper precisely so
    cluster populations stay bounded; the k-means stage itself never
    shuffles the N·d embedding data (centroid literals).  Cosines are
    doubles rounded to 6dp (house float rule); ranks and distances are
    exact BIGINTs."""
    from graphlite_spark.operators.kmeans import kmeans_embeddings
    from graphlite_spark.operators.similarity import cosine_expr

    assign = kmeans_embeddings(
        embeddings, k=k, iterations=iterations, id_col=id_col, vec_col=vec_col
    )
    a = assign.join(
        embeddings.select(F.col(id_col), F.col(vec_col)), id_col
    ).select(
        F.col(id_col).alias("id"),
        "cluster",
        "dist_sq",
        F.col(vec_col).alias("v"),
    )
    x, y = a.alias("x"), a.alias("y")
    dominated = (
        x.join(
            y,
            (F.col("y.cluster") == F.col("x.cluster"))
            & (
                (F.col("y.dist_sq") < F.col("x.dist_sq"))
                | (
                    (F.col("y.dist_sq") == F.col("x.dist_sq"))
                    & (F.col("y.id") < F.col("x.id"))
                )
            ),
        )
        .where(
            F.round(cosine_expr(F.col("x.v"), F.col("y.v")), 6) >= tau
        )
        .select(F.col("x.id").alias("did"))
        .distinct()
    )
    return (
        a.join(dominated, a["id"] == dominated["did"], "left")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            "dist_sq",
            F.when(F.col("did").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("keep"),
        )
    )


def minhash_lsh_recall(
    docs: DataFrame,
    tau: float = 0.05,
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """1 row (n_truth, n_found, n_hits, recall) — measured recall of the
    MinHash-LSH dedup path against the EXACT shingle-Jaccard ground truth
    at ``tau`` (the dedup sibling of similarity.lsh_recall: the banding
    curve becomes a checked number instead of a formula).  ``tau`` sits
    deliberately in the curve's weak tail — with r=num_hashes/bands rows
    per band, P(candidate | j) = 1-(1-j^r)^bands is ~1% at j=0.05 for
    the 8/4 default, so sub-threshold pairs are EXPECTED misses; a
    recall well under 1 here is the banding knob's tuning signal, while
    near-exact duplicates (j~1) collide in every band and never miss.

    Exactness: ground truth enumerates every pair sharing >=1 shingle
    (``max_doc_freq=None`` — any pair with jaccard >= tau > 0 shares a
    shingle, so the truth set is complete); both sides compute the
    identical round(c/(na+nb-c), 6).  Scale note: the unfiltered truth
    join is the quadratic-on-hot-shingles shape the df-capped variant
    exists to avoid — this is a VALIDATION query one runs on a sample,
    stated here rather than hidden."""
    truth = ngram_jaccard_pairs(
        docs, threshold=tau, n=n, id_col=id_col, text_col=text_col,
        max_doc_freq=None,
    ).select("a", "b")
    found = minhash_lsh_candidates(
        docs, num_hashes=num_hashes, bands=bands, n=n,
        id_col=id_col, text_col=text_col,
    ).where(F.col("jaccard") >= tau).select("a", "b")
    nt = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    nf = found.agg(F.count(F.lit(1)).cast("long").alias("n_found"))
    nh = found.join(truth, ["a", "b"], "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits")
    )
    return (
        nt.crossJoin(nf)
        .crossJoin(nh)
        .select(
            "n_truth",
            "n_found",
            "n_hits",
            F.when(F.col("n_truth") == 0, F.lit(0.0))
            .otherwise(F.round(F.col("n_hits") / F.col("n_truth"), 6))
            .alias("recall"),
        )
    )


def split_leakage(
    docs: DataFrame,
    threshold: float = 0.3,
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "split",
) -> DataFrame:
    """(pair_class, n_pairs) — train/test contamination check: the
    LSH-verified near-duplicate pairs (jaccard >= threshold) classified
    by where their endpoints landed in the deterministic train/val/test
    split — ``within_<split>`` or ``cross``.  A nonzero ``cross`` count
    is leakage: an eval document with a near-duplicate in train.  The
    composition every curation pipeline needs and almost none checks —
    the split is hash-deterministic and the pairs are the same verified
    candidates the dedup path already computes, so the readout costs
    one tiny join more than dedup itself.

    Scale shape: the pair set is LSH-candidate-bounded (never
    all-pairs); the split tags ride two broadcast-sized hash CASEs; one
    map-side-combined groupBy ends it."""
    from graphlite_spark.operators.packing import assign_splits

    pairs = minhash_lsh_candidates(
        docs, num_hashes=num_hashes, bands=bands, n=n,
        id_col=id_col, text_col=text_col,
    ).where(F.col("jaccard") >= threshold).select("a", "b")
    sp = assign_splits(docs.select(id_col), id_col, salt=salt).select(
        F.col(id_col), F.col("split")
    )
    sa = sp.select(F.col(id_col).alias("a"), F.col("split").alias("sa"))
    sb = sp.select(F.col(id_col).alias("b"), F.col("split").alias("sb"))
    tagged = pairs.join(sa, "a").join(sb, "b")
    cls = F.when(
        F.col("sa") == F.col("sb"), F.concat(F.lit("within_"), F.col("sa"))
    ).otherwise(F.lit("cross"))
    return (
        tagged.select(cls.alias("pair_class"))
        .groupBy("pair_class")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


def doc_novelty(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_grams, n_novel, novelty_micros) — per-document n-gram
    novelty: the fraction of a document's DISTINCT word n-grams whose
    global first occurrence (smallest doc_id) is this document.  The
    incremental-curation readout between exact dedup and MinHash: a
    near-zero score means "everything here was already in the corpus"
    (boilerplate, quote-heavy or templated docs) without needing any
    pairwise comparison, and ordering by ingestion id makes it the
    streaming-style novelty curve data-selection papers filter on
    (e.g. the "new-ngram rate" feature in quality classifiers).

    Exactness: integer counts + the exact-ratio subtract-the-remainder
    micro division.  Documents with fewer than ``n`` tokens have no
    grams and are absent by construction (stated).

    Scale shape: one shingle explode, one map-side-combined
    ``min(doc_id)`` per gram (the global first-occurrence table — the
    duplicate_ngram_spans aggregate), one equi-join back on the gram,
    one per-doc count — no self-join, no window, no all-pairs path."""
    sh = _doc_shingles(docs, id_col, text_col, n)
    first = sh.groupBy("shingle").agg(
        F.min("doc_id").cast("long").alias("fd")
    )
    per = (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(
                F.when(F.col("fd") == F.col("doc_id"), 1).otherwise(0)
            ).cast("long").alias("n_novel"),
        )
    )
    return per.select(
        "doc_id",
        "n_grams",
        "n_novel",
        F.expr(
            "(1000000 * n_novel - (1000000 * n_novel) % n_grams)"
            " div n_grams"
        ).cast("long").alias("novelty_micros"),
    )


def boilerplate_coverage(
    docs: DataFrame,
    permille: int = 200,
    n: int = 3,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(source, n_docs, n_boiler_shingles, mean_coverage_micros) —
    per-source boilerplate detection (the CCNet/RefinedWeb template
    screen): a word n-gram shingle is BOILERPLATE within a source when
    it appears in ≥ ``permille``‰ of that source's documents (nav bars,
    license footers, prompt templates); each document's coverage is the
    fraction of its distinct shingles that are boilerplate, and the
    per-source mean coverage is the curation signal (high mean = the
    source is template-dominated; dedup won't catch it because the
    SURROUNDING text differs).

    Exactness: the threshold is the pure-integer predicate
    ``df · 1000 ≥ n_docs · permille`` (no float cut boundary); coverage
    and its mean are exact subtract-the-remainder micro ratios.
    Documents with no shingles (< n tokens) count as coverage 0.

    Scale shape: distinct shingles per doc (row-local), ONE (source,
    shingle) map-side-combined df aggregate, the source-level doc count
    broadcast into the threshold filter, one left-semi join to flag
    each doc's boilerplate shingles — no self-join, no pair
    materialization; strictly shingle-stream-linear."""
    sh = docs.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("d"),
        F.explode(
            F.array_distinct(shingles_expr(tokens_expr(text_col), n))
        ).alias("shingle"),
    )
    nd = docs.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    df_ = sh.groupBy("g", "shingle").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    boiler = df_.join(F.broadcast(nd), "g").where(
        F.col("df") * 1000 >= F.col("n_docs") * permille
    ).select("g", "shingle")
    per_tot = sh.groupBy("g", "d").agg(
        F.count(F.lit(1)).cast("long").alias("n_sh")
    )
    per_boil = (
        sh.join(boiler, ["g", "shingle"], "left_semi")
        .groupBy("g", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    )
    per_doc = (
        docs.select(F.col(group_col).alias("g"), F.col(id_col).alias("d"))
        .join(per_tot, ["g", "d"], "left")
        .join(per_boil, ["g", "d"], "left")
        .select(
            "g",
            F.coalesce("n_sh", F.lit(0)).alias("n_sh"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
        .select(
            "g",
            F.when(
                F.col("n_sh") > 0,
                F.expr("(1000000 * n_b - (1000000 * n_b) % n_sh) div n_sh"),
            ).otherwise(F.lit(0)).cast("long").alias("cov"),
        )
    )
    nb = boiler.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_boiler_shingles")
    )
    out = (
        per_doc.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("cov").cast("long").alias("s"),
        )
        .join(nb, "g", "left")
    )
    return out.select(
        F.col("g").alias(group_col),
        "n_docs",
        F.coalesce("n_boiler_shingles", F.lit(0))
        .cast("long")
        .alias("n_boiler_shingles"),
        F.expr("(s - s % n_docs) div n_docs")
        .cast("long")
        .alias("mean_coverage_micros"),
    )


def cross_source_duplication(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_tokens: int | None = None,
) -> DataFrame:
    """(source_a, source_b, n_shared_digests) — the cross-source
    duplication matrix: for every unordered source pair, how many
    DISTINCT exact-duplicate text digests appear in both.  The
    who-mirrors-whom readout: a corpus-wide dedup rate says duplication
    exists; this says WHERE it flows (syndication, scraping the same
    upstream, a pipeline double-ingest) — which decides whether you
    drop a source or just dedup it.

    Exactness: md5 digests and distinct counts — pure set algebra.

    Scale shape: one distinct (digest, source) projection, then an
    equi-join on the digest with ``source_a < source_b`` — per-digest
    fan-out is C(s,2) where s is the number of DISTINCT SOURCES
    carrying that digest (bounded by the source roster, never by the
    duplicate count: a digest duplicated 10⁶ times within one source
    is ONE row here).  With a web-scale domain-level roster, cap s
    first (the df-cap discipline); at a curated source count this is
    exact as-is.

    ``prefix_tokens``: digest only the first k tokens instead of the
    whole text — the shared-LEAD variant (syndicated openings, prompt
    templates) for corpora whose bodies diverge after the first
    paragraph."""
    if prefix_tokens is None:
        key = F.md5(F.col(text_col))
    else:
        key = F.md5(
            F.concat_ws(
                " ", F.slice(tokens_expr(text_col), 1, prefix_tokens)
            )
        )
    d = docs.select(
        key.alias("digest"),
        F.col(group_col).alias("s"),
    ).distinct()
    a = d.select("digest", F.col("s").alias("source_a"))
    b = d.select("digest", F.col("s").alias("source_b"))
    return (
        a.join(b, "digest")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count_distinct("digest").cast("long").alias("n_shared_digests"))
    )


def minhash_estimate_error(
    docs: DataFrame,
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(n_pairs, mean_abs_err_micros, max_abs_err_micros,
    mean_est_micros, mean_exact_micros) — the ESTIMATOR-quality
    readout for MinHash: over the LSH candidate pairs, compare the
    signature estimate (matching components / K) against the exact
    shingle Jaccard, both in exact integer micros.  minhash_lsh_recall
    measures whether banding FINDS the right pairs; this measures
    whether the K-hash sketch VALUES can be trusted as similarities —
    the number that picks K before anyone thresholds on an estimate.

    Scale shape: the signature and banding machinery verbatim
    (:func:`minhash_signatures` + bucket equi-join), candidate-only
    exact verification (never the all-pairs shingle join), and ONE
    summary aggregate; per-pair arithmetic is closed-form micros."""
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, n, id_col, text_col)
    band_cols = [
        F.md5(
            F.concat_ws(
                SEP,
                F.lit(str(b)),
                *[
                    F.col(f"h{b * rows + r}").cast("string")
                    for r in range(rows)
                ],
            )
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select("doc_id", *band_cols)
    stacked = banded.select(
        "doc_id",
        F.explode(
            F.array(*[F.col(f"band{b}") for b in range(bands)])
        ).alias("bucket"),
    )
    cand = (
        stacked.alias("x")
        .join(stacked.alias("y"), "bucket")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
        )
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("a"),
        *[F.col(f"h{k}").alias(f"a{k}") for k in range(num_hashes)],
    )
    sb = sig.select(
        F.col("doc_id").alias("b"),
        *[F.col(f"h{k}").alias(f"b{k}") for k in range(num_hashes)],
    )
    matches = sum(
        (F.col(f"a{k}") == F.col(f"b{k}")).cast("long")
        for k in range(num_hashes)
    )
    raw = matches * F.lit(1_000_000).cast("long")
    est = cand.join(sa, "a").join(sb, "b").select(
        "a", "b",
        ((raw - raw % F.lit(num_hashes)) / F.lit(num_hashes))
        .cast("long").alias("est_micros"),
    )
    sh = _doc_shingles(docs, id_col, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sha = sh.select(F.col("doc_id").alias("a"), "shingle")
    shb = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        cand.join(sha, "a")
        .join(shb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ex = (
        cand.join(inter, ["a", "b"], "left")
        .join(sizes.select(F.col("doc_id").alias("a"),
                           F.col("n_sh").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"),
                           F.col("n_sh").alias("nb")), "b")
        .select(
            "a", "b",
            F.expr(
                "(1000000 * coalesce(c, 0))"
                " div (na + nb - coalesce(c, 0))"
            ).cast("long").alias("ex_micros"),
        )
    )
    per = est.join(ex, ["a", "b"]).select(
        F.abs(F.col("est_micros") - F.col("ex_micros")).alias("ae"),
        "est_micros", "ex_micros",
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("ae").cast("long").alias("sae"),
        F.max("ae").cast("long").alias("max_abs_err_micros"),
        F.sum("est_micros").cast("long").alias("se"),
        F.sum("ex_micros").cast("long").alias("sx"),
    )
    return agg.select(
        "n_pairs",
        F.expr("sae div n_pairs").cast("long")
        .alias("mean_abs_err_micros"),
        "max_abs_err_micros",
        F.expr("se div n_pairs").cast("long").alias("mean_est_micros"),
        F.expr("sx div n_pairs").cast("long")
        .alias("mean_exact_micros"),
    )


def dedup_threshold_curve(
    docs: DataFrame,
    thresholds_permille: tuple = (500, 600, 700, 800, 900),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(threshold_permille, n_pairs) — the near-duplicate THRESHOLD
    sensitivity curve: how many exact token-set Jaccard pairs survive
    at each candidate cutoff, from ONE prefix-filtered similarity
    join run at the loosest threshold.  The tuning table behind every
    dedup pipeline's single magic number — pick the knee, not 0.8 by
    folklore; completes the curve family (conversion window, session
    gap) for the dedup tier.

    Exactness: the pair set is :func:`jaccard_join_prefix` at
    ``min(thresholds)`` (filter completeness already oracle-proven);
    each cutoff is the same INTEGER test inter·1000 ≥ t·union — no
    float gates anything.

    Scale shape: one AllPairs join (the operator under test), then a
    thresholds-sized conditional aggregate."""
    t0 = min(int(t) for t in thresholds_permille)
    pairs = jaccard_join_prefix(
        docs, threshold_permille=t0, id_col=id_col, text_col=text_col
    )
    aggs = pairs.agg(
        *[
            F.coalesce(
                F.sum(
                    (
                        F.col("inter") * 1000
                        >= int(t) * F.col("union_sz")
                    ).cast("long")
                ),
                F.lit(0),
            ).cast("long").alias(f"c{int(t)}")
            for t in thresholds_permille
        ]
    )
    stack = ", ".join(
        f"struct({int(t)} as threshold_permille, c{int(t)} as n_pairs)"
        for t in thresholds_permille
    )
    return aggs.select(
        F.explode(F.expr(f"array({stack})")).alias("s")
    ).select(
        F.col("s.threshold_permille").cast("int").alias(
            "threshold_permille"
        ),
        F.col("s.n_pairs").cast("long").alias("n_pairs"),
    )
