"""Integer-exact k-means over an embedding column (Lloyd's algorithm).

The clustering step a training-data pipeline runs over document
embeddings — semantic bucketing for diversity-aware sampling, curriculum
binning, or IVF-style ANN partitioning (the coarse quantizer of an IVF
index IS a k-means codebook).  Everything is exact integer arithmetic so
the result is reproducible across engines and the DuckDB oracle unrolls
the identical iterations hash-exactly:

* embeddings are quantized once to BIGINT micro-units
  (``round(x * 10^6)`` — the repo-wide discipline; both engines round
  ties away from zero);
* distances are BIGINT sums of squared differences (≤ 2.6e14 at 64 dims
  of ±1-scale inputs — no overflow, no float summation-order
  dependence);
* argmin ties break to the smallest cluster index on both engines;
* centroid updates are truncating integer division (Spark ``div`` and
  DuckDB ``//`` both truncate toward zero), empty clusters keep their
  previous centroid;
* init is deterministic: the k vectors with the smallest
  ``(hash48('kmeans:' || id), id)`` — no RNG, no data order dependence.

Scale shape per iteration: the ASSIGNMENT is a pure whole-stage-codegen
expression — the k centroids are embedded as array literals (k·d longs,
the quantile-cuts broadcast pattern), so no join and no shuffle touches
the N·d data; the UPDATE is one posexplode + one map-side-combined
groupBy((cluster, pos)) producing ≤ k·d rows, collected to the driver
(bounded by the codebook size, never by N) and folded into the next
iteration's literals.  k·d driver rows per iteration is the same
legitimate small-side materialization as quantile_buckets' cut table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphlite_spark.functions.hashes import hash48

MICROS = 1_000_000


def _tdiv(s: int, n: int) -> int:
    """Truncating integer division (toward zero) — matches Spark ``div``
    and DuckDB ``//`` on negative sums."""
    q = abs(s) // n
    return q if s >= 0 else -q


def _cents_lit(centroids: list[list[int]]) -> F.Column:
    """The k×d codebook as ONE nested array literal — k lives in the
    DATA of a single expression, not in k unrolled expression trees, so
    whole-stage codegen stays small and compiles once regardless of k
    (8 separate 64-dim aggregate(zip_with) columns cost ~100 s of Janino
    compilation across the fit/assign/probe plans at k=8).

    Built as ONE SQL text expression: the F.array(F.lit(...)) form made
    2*k*d Python↔JVM round-trips PER REFERENCE, and the codebook is
    referenced many times across fit/corpus/probe plans — measured
    ~15 s of pure driver latency in one ivfpq_topk build at k=8, d=64,
    m=4.  ``L`` suffixes pin BIGINT element type (the micro-unit
    discipline)."""
    body = ",".join(
        "array(" + ",".join(f"{int(v)}L" for v in c) + ")"
        for c in centroids
    )
    return F.expr(f"array({body})")


def _dists_expr(centroids: list[list[int]], col: str = "qv") -> F.Column:
    """array<long> of squared micro-unit distances to every centroid."""
    return F.transform(
        _cents_lit(centroids),
        lambda c: F.aggregate(
            F.zip_with(F.col(col), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )


def quantize_expr(vec: F.Column) -> F.Column:
    """Micro-unit BIGINT quantization of a float vector (the repo-wide
    ``round(x * 10^6)`` discipline)."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * MICROS).cast("long"))


def _quantized(
    embeddings: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    return embeddings.select(
        F.col(id_col).alias("id"), quantize_expr(F.col(vec_col)).alias("qv")
    ).localCheckpoint(eager=False)  # quantize once; every iteration reuses it


def _assign(frame: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """(id, qv, cluster, dist_sq) — argmin over the centroid LITERALS;
    ``array_position`` of the minimum returns the FIRST match, so ties
    break to the smallest cluster index."""
    withd = frame.select("id", "qv", _dists_expr(centroids).alias("ds"))
    return withd.select(
        "id", "qv",
        (F.array_position("ds", F.array_min("ds")) - 1)
        .cast("long").alias("cluster"),
        F.array_min("ds").alias("dist_sq"),
    )


def _fit(q: DataFrame, k: int, iterations: int) -> list[list[int]]:
    """Lloyd iterations over a pre-quantized (id, qv) frame; returns the
    final codebook as k lists of micro-unit longs (cluster index = seed
    rank).  If fewer than k vectors exist, k shrinks to match.

    The input is staged as a localCheckpoint leaf for the fit's
    1+iterations driver actions (seed TakeOrdered + per-iteration
    codebook aggregates) — callers hand in lazy scan+quantize plans
    that would otherwise re-execute per action — and released before
    returning."""
    from graphlite_spark.checkpoint import release_local_checkpoint

    q = q.localCheckpoint(eager=True)
    try:
        return _fit_on_leaf(q, k, iterations)
    finally:
        release_local_checkpoint(q)


def _fit_on_leaf(q: DataFrame, k: int, iterations: int) -> list[list[int]]:
    seeds = (
        q.select(
            "id",
            "qv",
            hash48(F.concat(F.lit("kmeans:"), F.col("id").cast("string"))).alias("h"),
        )
        .orderBy("h", "id")  # with limit(k): TakeOrderedAndProject, k rows
        .limit(k)
        .collect()
    )
    centroids = [list(r["qv"]) for r in seeds]

    for _ in range(iterations):
        parts = (
            _assign(q, centroids)
            .select("cluster", F.posexplode("qv").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # <= k*d rows — codebook-sized, independent of N
        )
        upd: dict[tuple[int, int], int] = {
            (r["cluster"], r["pos"]): _tdiv(r["s"], r["n"]) for r in parts
        }
        centroids = [
            [upd.get((ci, p), old) for p, old in enumerate(c)]
            for ci, c in enumerate(centroids)
        ]
    return centroids


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[int]]:
    """Fit and return the codebook (k centroids in micro-unit longs) —
    the coarse quantizer an IVF index probes."""
    return _fit(_quantized(embeddings, id_col, vec_col), k, iterations)


def kmeans_embeddings(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, cluster, dist_sq) — hard assignment after ``iterations``
    Lloyd updates from the deterministic hash-min seeds; ``dist_sq`` is
    the BIGINT squared distance (micro-unit space) to the final
    centroid.  If fewer than k vectors exist, k shrinks to match."""
    q = _quantized(embeddings, id_col, vec_col)
    centroids = _fit(q, k, iterations)
    return _assign(q, centroids).select(
        F.col("id").alias(id_col), "cluster", "dist_sq"
    )


def pq_encode(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, sub, code, dist_sq) — product quantization (Jégou,
    Douze & Schmid 2011, public literature): the vector is split into
    ``m`` contiguous subspaces, each with its own ``k``-codeword
    codebook fit by the SAME deterministic integer Lloyd machinery as
    :func:`kmeans_embeddings`; every vector emits m rows, one per
    subspace, with its argmin codeword and the BIGINT squared
    micro-unit distance (the per-subspace reconstruction error —
    Σ over sub = total PQ error).  Long/relational output by design:
    exact-integer rows the oracle can hash, and the codes-per-vector
    array is one groupBy away.

    This is the missing piece between the IVF coarse quantizer
    (operators/similarity.ivf_topk) and a real 100 TB ANN index: IVF
    routes to cells, PQ compresses residents to m·log2(k) bits.  Seeds
    reuse the k smallest (hash48('kmeans:'||id), id) vectors in every
    subspace — same seed IDs, different subvectors, fully deterministic.

    Scale shape: m independent fits, each the kmeans shape (assignment
    is a codebook-literal expression — no join touches the N·d data;
    update collects ≤ k·(d/m) codebook-sized rows per iteration);
    the final encode is ONE pass emitting m expression-only columns,
    exploded to long form."""
    dim_row = embeddings.select(
        F.size(F.col(vec_col)).alias("d")
    ).limit(1).collect()
    if not dim_row:
        return embeddings.sparkSession.createDataFrame(
            [], f"{id_col} long, sub long, code long, dist_sq long"
        )
    d = dim_row[0]["d"]
    if d % m != 0:
        raise ValueError(f"pq_encode: d={d} not divisible by m={m}")
    sub = d // m
    q = _quantized(embeddings, id_col, vec_col)
    books = []
    for s in range(m):
        qs = q.select("id", F.slice("qv", s * sub + 1, sub).alias("qv"))
        books.append(_fit(qs, k, iterations))
    sl = q.select(
        "id",
        *[F.slice("qv", s * sub + 1, sub).alias(f"qv{s}") for s in range(m)],
    )
    withd = sl.select(
        "id",
        *[_dists_expr(books[s], f"qv{s}").alias(f"ds{s}") for s in range(m)],
    )
    per_sub = withd.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.struct(
                        (
                            F.array_position(
                                F.col(f"ds{s}"), F.array_min(f"ds{s}")
                            )
                            - 1
                        )
                        .cast("long")
                        .alias("code"),
                        F.array_min(f"ds{s}").cast("long").alias("dist_sq"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("sub", "st"),
    )
    return per_sub.select(
        F.col("id").alias(id_col),
        F.col("sub").cast("long").alias("sub"),
        F.col("st.code").alias("code"),
        F.col("st.dist_sq").alias("dist_sq"),
    )


def pq_distortion(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(sub, n_vectors, total_err, mean_err) — per-subspace PQ
    reconstruction error: the quantization-quality readout an ANN
    pipeline checks BEFORE committing a codebook (Jégou et al. 2011
    report exactly this curve vs m and k).  A subspace whose mean error
    dwarfs the others tells you its coordinates need more codewords —
    the tuning signal for non-uniform bit allocation.

    Everything is exact BIGINT micro² (``dist_sq`` comes straight from
    :func:`pq_encode`); the mean is a truncating integer division
    (nonnegative, so Spark ``div`` == DuckDB ``//``) — no float, hash-
    exact cross-engine.

    Scale shape: :func:`pq_encode`'s one codebook-literal pass + a
    map-side-combined groupBy on ``m`` keys — m partial rows per task,
    the cheapest aggregate there is."""
    enc = pq_encode(
        embeddings, m=m, k=k, iterations=iterations,
        id_col=id_col, vec_col=vec_col,
    )
    return enc.groupBy("sub").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum("dist_sq").cast("long").alias("total_err"),
    ).select(
        "sub",
        "n_vectors",
        "total_err",
        F.expr("total_err div n_vectors").cast("long").alias("mean_err"),
    )


def kcenter_select(
    embeddings: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(center_rank, vec_id, radius_sq) — greedy k-center selection
    (farthest-first traversal, Gonzalez 1985): start from the hash-min
    seed, then repeatedly add the vector FARTHEST from the selected
    set.  The coreset/diversity-sampling primitive of a training-data
    pipeline (pick k maximally-spread exemplars; radius_sq is the
    2-approximation certificate — every vector is within sqrt of it of
    some center at selection time).

    Deterministic and engine-exact: micro-unit BIGINT distances, the
    argmax breaks ties to the smallest id, seed is the smallest
    ``(hash48('kcenter:' || id), id)``.

    Scale shape: k rounds, each ONE codegen scan (min-distance over
    the selected centers as a nested array LITERAL — no join, no
    shuffle over N·d) + a TakeOrdered(1) action; driver state is k·d
    longs, the kmeans-codebook bound."""
    spark = embeddings.sparkSession
    q = _quantized(embeddings, id_col, vec_col)
    first = (
        q.select(
            "id",
            "qv",
            hash48(
                F.concat(F.lit("kcenter:"), F.col("id").cast("string"))
            ).alias("h"),
        )
        .orderBy("h", "id")
        .limit(1)
        .collect()
    )
    rows = [(0, int(first[0]["id"]), 0)]
    cvecs = [list(first[0]["qv"])]
    for r in range(1, k):
        far = (
            q.select(
                "id", "qv", F.array_min(_dists_expr(cvecs)).alias("md")
            )
            .orderBy(F.desc("md"), F.asc("id"))
            .limit(1)
            .collect()
        )
        if not far:
            break
        rows.append((r, int(far[0]["id"]), int(far[0]["md"])))
        cvecs.append(list(far[0]["qv"]))
    return spark.createDataFrame(
        rows, "center_rank long, vec_id long, radius_sq long"
    )


def label_separability(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(label, n, within_ss, centroid_dist_sq, between_term) — the
    per-class scatter decomposition of a labeled embedding table: for
    each label its population, the within-class sum of squared
    distances to the CLASS centroid, the squared distance from the
    class centroid to the GLOBAL centroid, and n·that (the class's
    term in the between-class scatter) — Fisher's separability
    bookkeeping (Fisher 1936, public literature): Σ between_term /
    Σ within_ss is the one-number answer to "are these embeddings
    linearly separable by label, or is the labeling noise?" — the
    check a team runs before training a probe/classifier on them.

    Exactness: micro-quantized BIGINTs end-to-end; class and global
    centroids use the truncating integer division
    (:func:`~graphlite_spark.operators.similarity._centroid_micros`
    discipline); every distance is an exact integer sum.

    Scale shape: class centroids come from ONE map-side-combined
    (label → d sums) aggregate collecting L·(d+2) driver-side longs
    (codebook-sized); they ride back as a label→array CASE LITERAL, so
    the within-scatter pass is zero-join whole-stage codegen over the
    corpus + one L-group aggregate; the L-row between table is
    assembled driver-side and unioned in — the N·d data is scanned
    exactly twice (centroid pass, scatter pass), never joined."""
    qz = embeddings.select(
        F.col(label_col).alias("label"),
        quantize_expr(F.col(vec_col)).alias("qv"),
    )
    dim_row = qz.select(F.size("qv").alias("d")).limit(1).collect()
    if not dim_row:
        return embeddings.sparkSession.createDataFrame(
            [],
            "label long, n long, within_ss long,"
            " centroid_dist_sq long, between_term long",
        )
    d = dim_row[0]["d"]
    per = qz.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            F.sum(F.element_at("qv", j + 1)).cast("long").alias(f"s{j}")
            for j in range(d)
        ],
    ).collect()
    if not per:
        return embeddings.sparkSession.createDataFrame(
            [],
            "label long, n long, within_ss long,"
            " centroid_dist_sq long, between_term long",
        )
    cents = {
        r["label"]: [
            _tdiv(int(r[f"s{j}"]), int(r["n"])) for j in range(d)
        ]
        for r in per
    }
    ns = {r["label"]: int(r["n"]) for r in per}
    n_tot = sum(ns.values())
    gsums = [sum(int(r[f"s{j}"]) for r in per) for j in range(d)]
    gcent = [_tdiv(s, n_tot) for s in gsums]

    cl_expr = None
    for lab, cv in sorted(cents.items()):
        arr = F.array(*[F.lit(c).cast("long") for c in cv])
        cond = F.col("label") == lab
        cl_expr = (
            F.when(cond, arr) if cl_expr is None else cl_expr.when(cond, arr)
        )
    dist = F.aggregate(
        F.zip_with(F.col("qv"), cl_expr, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    within = qz.select("label", dist.alias("dsq")).groupBy("label").agg(
        F.sum("dsq").cast("long").alias("within_ss")
    )
    between_rows = [
        (
            int(lab),
            ns[lab],
            sum((cv[j] - gcent[j]) ** 2 for j in range(d)),
        )
        for lab, cv in sorted(cents.items())
    ]
    bt = embeddings.sparkSession.createDataFrame(
        between_rows, "label long, n long, centroid_dist_sq long"
    )
    return within.join(F.broadcast(bt), "label").select(
        "label",
        "n",
        "within_ss",
        "centroid_dist_sq",
        (F.col("n") * F.col("centroid_dist_sq")).cast("long").alias(
            "between_term"
        ),
    )


def kmeans_elbow(
    embeddings: DataFrame,
    ks: tuple = (2, 4, 8),
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(k, n_vectors, inertia) — the k-means elbow curve: total BIGINT
    squared micro-distance to the assigned centroid after
    ``iterations`` Lloyd rounds, for each candidate ``k``.  THE number
    the k knob of every downstream consumer (IVF cell count, SemDeDup
    cluster count, curriculum bins) is chosen from; the marginal-
    inertia flattening point is the elbow (Thorndike 1953, public
    literature).

    Exactness: each fit is the deterministic integer Lloyd machinery
    (:func:`_fit` — hash-min seeds, BIGINT distances, truncating
    centroid division), so every inertia is an exact BIGINT.

    Scale shape: per k, the kmeans shape (assignment = codebook-literal
    codegen, update collects ≤ k·d driver rows) plus ONE
    map-side-combined 1-row aggregate; the quantized frame is
    localCheckpoint'ed once and shared across all fits, so the corpus
    is scanned iterations+1 times per k and never joined."""
    q = _quantized(embeddings, id_col, vec_col)
    out = None
    for k in ks:
        cents = _fit(q, int(k), iterations)
        row = _assign(q, cents).agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.sum("dist_sq").cast("long").alias("inertia"),
        ).select(
            F.lit(int(k)).cast("long").alias("k"), "n_vectors", "inertia"
        )
        out = row if out is None else out.unionByName(row)
    return out


def kmeans_silhouette(
    embeddings: DataFrame,
    k: int = 4,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cluster, n, mean_sil_micros) — the centroid-silhouette quality
    readout of the k-means clustering (simplified silhouette, Rousseeuw
    1987's shape with centroid distances standing in for mean pairwise
    distances — the standard large-N variant, since true silhouette is
    O(N²) by definition): per point s = 1 − d_own/d_next over EUCLIDEAN
    centroid distances, averaged per cluster.  Near 1 = compact,
    well-separated cluster; near 0 = the point sits on a boundary —
    the per-cluster diagnostic behind :func:`kmeans_elbow`'s single
    WCSS curve.

    Exactness: distances are BIGINT squared micro-units from the same
    codebook-literal machinery as the fit; each point's s is one
    deterministic float (two sqrts of exact integers) rounded to
    MICROS, so per-cluster sums are exact and the mean is a
    remainder-subtract division.  Ties: d_next removes exactly one
    instance of the minimum (the first-position argmin), matching the
    oracle's (d², cl) second-row rule.

    Scale shape: the fit is the kmeans shape (no join touches N·d);
    the silhouette pass is pure expressions over the centroid literal
    plus ONE map-side-combined k-row groupBy."""
    q = _quantized(embeddings, id_col, vec_col)
    centroids = _fit(q, k, iterations)
    withd = q.select("id", _dists_expr(centroids, "qv").alias("ds"))
    a2 = F.array_min("ds")
    own = F.array_position("ds", F.array_min("ds"))
    rest = F.concat(
        F.slice("ds", F.lit(1), own - 1),
        F.slice("ds", own + 1, F.size("ds") - own),
    )
    b2 = F.array_min(rest)
    s_micros = F.when(
        b2.isNotNull() & (b2 > 0),
        F.round(
            F.lit(1_000_000.0)
            * (
                F.lit(1.0)
                - F.sqrt(a2.cast("double")) / F.sqrt(b2.cast("double"))
            )
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    pts = withd.select(
        (own - 1).cast("long").alias("cluster"), s_micros.alias("s")
    )
    per = pts.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("s").cast("long").alias("ssum"),
    )
    return per.select(
        "cluster", "n",
        F.expr("cast((ssum - ssum % n) div n as bigint)")
        .alias("mean_sil_micros"),
    )


def calinski_harabasz(
    embeddings: DataFrame,
    k: int = 4,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One row (k_clusters, n_vectors, ssb, ssw, ch_micros) — the
    Calinski–Harabasz variance-ratio index (Caliński & Harabasz 1974,
    public literature) of the k-means clustering:
    CH = [SSB/(k−1)] / [SSW/(n−k)], the between/within dispersion
    ratio.  Higher = tighter, better-separated clusters — the
    global-scalar companion to :func:`kmeans_silhouette`'s
    per-cluster view and :func:`kmeans_elbow`'s raw WCSS curve (CH
    peaks where the elbow flattens, giving an argmax instead of an
    eyeballed knee).

    Centroid-based form on the fitted codebook (the same
    simplification as the centroid silhouette, stated): SSW = total
    assigned squared distance; SSB = Σ_c n_c·‖c_c − grand‖² with
    the grand centroid the truncating per-dimension mean of the
    quantized corpus; k counts NON-EMPTY clusters so the statistic
    is well-defined when Lloyd abandons a seed.

    Exactness: all distances are BIGINT squared micro-units; the
    final ratio is computed in arbitrary-precision driver ints
    (anova discipline — 10⁶·ssb·(n−k) passes 2⁶³) with truncating
    division.  NULL when k < 2, n ≤ k, or SSW = 0.

    Scale shape: the kmeans shape (assignment = codebook literal,
    no join over N·d); per-cluster moments are one k-row collect,
    the grand centroid one d-row collect."""
    from graphlite_spark.operators.similarity import _trunc_div

    spark = embeddings.sparkSession
    schema = (
        "k_clusters long, n_vectors long, ssb long, ssw long,"
        " ch_micros long"
    )
    q = _quantized(embeddings, id_col, vec_col)
    centroids = _fit(q, k, iterations)
    per = (
        _assign(q, centroids)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("dist_sq").cast("long").alias("w"),
        )
        .collect()
    )
    gr = (
        q.select(F.posexplode("qv").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if not per or not gr:
        return spark.createDataFrame([], schema)
    grand = {r["pos"]: _tdiv(int(r["s"]), int(r["n"])) for r in gr}
    n_tot = sum(int(r["n"]) for r in per)
    ssw = sum(int(r["w"]) for r in per)
    ssb = 0
    for r in per:
        c = centroids[int(r["cluster"])]
        d2 = sum((c[p] - grand[p]) ** 2 for p in range(len(c)))
        ssb += int(r["n"]) * d2
    keff = len(per)
    ch = None
    if keff >= 2 and n_tot > keff and ssw > 0:
        ch = _trunc_div(
            1_000_000 * ssb * (n_tot - keff), ssw * (keff - 1)
        )
    return spark.createDataFrame(
        [(keff, n_tot, ssb, ssw, ch)], schema
    )


def kmeans_label_ari(
    embeddings: DataFrame,
    k: int = 4,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """One row (n_vectors, k_clusters, n_labels, index_pairs,
    ari_micros) — the Adjusted Rand Index (Hubert & Arabie 1985,
    public literature) between the k-means clustering and the
    embeddings' ground-truth ``label`` column: pair-counting agreement
    corrected for chance.  The EXTERNAL-validation companion to
    :func:`kmeans_silhouette` / :func:`calinski_harabasz` (both
    internal): did the unsupervised clusters recover the labels?

    Exactness: ARI is a ratio of pair counts — with index =
    Σᵢⱼ C(nᵢⱼ,2), a = Σᵢ C(aᵢ,2), b = Σⱼ C(bⱼ,2), T = C(n,2),
    ARI = (T·index − a·b) / (T·(a+b)/2 − a·b); doubling clears the
    half so every term is a BIGINT, the final micros division rides
    DECIMAL(38,0) (a·b passes 2⁶³ at corpus scale) and truncates
    toward zero on both engines (negative ARI legal).  NULL when the
    denominator is 0 (degenerate: one cluster and one label).

    Scale shape: the kmeans shape (assignment = codebook literals,
    zero joins over N·d) plus one (cluster × label) contingency
    groupBy — k·L cells, broadcast-combined scalars after."""
    q = _quantized(embeddings, id_col, vec_col)
    centroids = _fit(q, k, iterations)
    lab = embeddings.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("lab")
    )
    ct = (
        _assign(q, centroids)
        .select("id", "cluster")
        .join(lab, "id")
        .groupBy("cluster", "lab")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    cells = ct.agg(
        F.sum("c").cast("long").alias("n"),
        F.expr("sum((c * (c - 1)) div 2)").cast("long").alias("idx"),
        F.countDistinct("cluster").cast("long").alias("kc"),
        F.countDistinct("lab").cast("long").alias("nl"),
    )
    pa = (
        ct.groupBy("cluster").agg(F.sum("c").alias("a"))
        .agg(F.expr("sum((a * (a - 1)) div 2)").cast("long").alias("pa"))
    )
    pb = (
        ct.groupBy("lab").agg(F.sum("c").alias("b"))
        .agg(F.expr("sum((b * (b - 1)) div 2)").cast("long").alias("pb"))
    )
    return (
        cells.crossJoin(F.broadcast(pa))
        .crossJoin(F.broadcast(pb))
        .select(
            F.col("n").alias("n_vectors"),
            F.col("kc").alias("k_clusters"),
            F.col("nl").alias("n_labels"),
            F.col("idx").alias("index_pairs"),
            F.when(
                F.expr(
                    "((n * (n - 1)) div 2) * (pa + pb) - 2 * pa * pb"
                )
                != 0,
                F.expr(
                    "CAST((CAST(1000000 AS DECIMAL(38,0)) * 2 *"
                    " (((n * (n - 1)) div 2) * idx - pa * pb))"
                    " div CAST(((n * (n - 1)) div 2) * (pa + pb)"
                    " - 2 * pa * pb AS DECIMAL(38,0)) AS BIGINT)"
                ),
            ).alias("ari_micros"),
        )
    )


def kmeans_label_nmi(
    embeddings: DataFrame,
    k: int = 4,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """One row (n_vectors, mi_micros, hc_micros, hl_micros,
    nmi_micros) — Normalized Mutual Information (Strehl & Ghosh 2002,
    public literature; the symmetric 2I/(H_C+H_L) form) between the
    k-means clustering and the ground-truth labels: the information-
    theoretic external validation next to :func:`kmeans_label_ari`'s
    pair-counting view (NMI rewards pure-but-split clusters that ARI
    penalizes — reading both tells you WHICH disagreement you have).

    Float discipline: each contingency cell's MI term
    (c/n)·ln(c·n/(a·b)) and each marginal's entropy term are ONE
    identical expression on both engines, rounded to integer micros
    PER TERM, then summed exactly (the repo-wide entropy rule); the
    final NMI is an integer micros division of the summed micro
    terms.  NULL when H_C + H_L = 0 (one cluster AND one label).

    Scale shape: the kmeans shape plus one k·L contingency groupBy —
    identical to the ARI query, two codebook-sized aggregates."""
    q = _quantized(embeddings, id_col, vec_col)
    centroids = _fit(q, k, iterations)
    lab = embeddings.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("lab")
    )
    ct = (
        _assign(q, centroids)
        .select("id", "cluster")
        .join(lab, "id")
        .groupBy("cluster", "lab")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    n = ct.agg(F.sum("c").cast("long").alias("n"))
    ca = ct.groupBy("cluster").agg(F.sum("c").cast("long").alias("a"))
    cb = ct.groupBy("lab").agg(F.sum("c").cast("long").alias("b"))
    mi = (
        ct.join(F.broadcast(ca), "cluster")
        .join(F.broadcast(cb), "lab")
        .crossJoin(F.broadcast(n))
        .agg(
            F.sum(
                F.round(
                    (F.col("c").cast("double") / F.col("n").cast("double"))
                    * F.log(
                        (F.col("c").cast("double") * F.col("n").cast("double"))
                        / (
                            F.col("a").cast("double")
                            * F.col("b").cast("double")
                        )
                    )
                    * 1_000_000
                ).cast("long")
            ).alias("mi_micros")
        )
    )
    hc = ca.crossJoin(F.broadcast(n)).agg(
        F.sum(
            F.round(
                -(F.col("a").cast("double") / F.col("n").cast("double"))
                * F.log(
                    F.col("a").cast("double") / F.col("n").cast("double")
                )
                * 1_000_000
            ).cast("long")
        ).alias("hc_micros")
    )
    hl = cb.crossJoin(F.broadcast(n)).agg(
        F.sum(
            F.round(
                -(F.col("b").cast("double") / F.col("n").cast("double"))
                * F.log(
                    F.col("b").cast("double") / F.col("n").cast("double")
                )
                * 1_000_000
            ).cast("long")
        ).alias("hl_micros")
    )
    return (
        n.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hc))
        .crossJoin(F.broadcast(hl))
        .select(
            F.col("n").alias("n_vectors"),
            "mi_micros", "hc_micros", "hl_micros",
            F.when(
                F.col("hc_micros") + F.col("hl_micros") > 0,
                F.expr(
                    "(1000000 * 2 * mi_micros)"
                    " div (hc_micros + hl_micros)"
                ),
            ).cast("long").alias("nmi_micros"),
        )
    )


def kmeans_stability_ari(
    embeddings: DataFrame,
    k: int = 4,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One row (n_vectors, k_a, k_b, ari_micros) — clustering
    STABILITY via split-half agreement (Lange et al. 2004, public
    literature): fit the k-means codebook independently on the
    even-id and odd-id halves, assign the FULL corpus to both, and
    report the Adjusted Rand Index between the two assignments.
    High = the cluster structure is real (any half recovers it);
    near 0 = the "clusters" are sampling noise — the
    reproducibility check that should gate any downstream use of
    :func:`kmeans_embeddings`, orthogonal to the internal
    (:func:`calinski_harabasz`) and external
    (:func:`kmeans_label_ari`) validations.

    Exactness: both fits are the shared hash-seeded truncating-Lloyd
    machinery on their halves; assignments are codebook-literal
    argmins; the ARI is the exact pair-count algebra of
    :func:`kmeans_label_ari` on the A×B contingency (DECIMAL /
    HUGEINT truncating micros, negative legal).

    Scale shape: two kmeans fits (codebook-sized driver state), two
    zero-join assignments, one k×k contingency groupBy."""
    q = _quantized(embeddings, id_col, vec_col)
    qa = q.where(F.col("id") % 2 == 0)
    qb = q.where(F.col("id") % 2 == 1)
    ca = _fit(qa, k, iterations)
    cb = _fit(qb, k, iterations)
    aa = _assign(q, ca).select("id", F.col("cluster").alias("cl_a"))
    bb = _assign(q, cb).select("id", F.col("cluster").alias("cl_b"))
    ct = (
        aa.join(bb, "id")
        .groupBy("cl_a", "cl_b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    cells = ct.agg(
        F.sum("c").cast("long").alias("n"),
        F.expr("sum((c * (c - 1)) div 2)").cast("long").alias("idx"),
        F.countDistinct("cl_a").cast("long").alias("ka"),
        F.countDistinct("cl_b").cast("long").alias("kb"),
    )
    pa = (
        ct.groupBy("cl_a").agg(F.sum("c").alias("a"))
        .agg(F.expr("sum((a * (a - 1)) div 2)").cast("long").alias("pa"))
    )
    pb = (
        ct.groupBy("cl_b").agg(F.sum("c").alias("b"))
        .agg(F.expr("sum((b * (b - 1)) div 2)").cast("long").alias("pb"))
    )
    return (
        cells.crossJoin(F.broadcast(pa))
        .crossJoin(F.broadcast(pb))
        .select(
            F.col("n").alias("n_vectors"),
            F.col("ka").alias("k_a"),
            F.col("kb").alias("k_b"),
            F.when(
                F.expr(
                    "((n * (n - 1)) div 2) * (pa + pb) - 2 * pa * pb"
                )
                != 0,
                F.expr(
                    "CAST((CAST(1000000 AS DECIMAL(38,0)) * 2 *"
                    " (((n * (n - 1)) div 2) * idx - pa * pb))"
                    " div CAST(((n * (n - 1)) div 2) * (pa + pb)"
                    " - 2 * pa * pb AS DECIMAL(38,0)) AS BIGINT)"
                ),
            ).alias("ari_micros"),
        )
    )
