"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Both named by the builder brief as operators to re-express Spark-first.
Neither needs a UDF or a cross product:

* **as-of join** — for each left row, the latest right row (same key)
  with ``right.ts <= left.ts``.  Expressed as a tagged UNION + one
  per-key window with ``last(..., ignorenulls=True)``: one hash shuffle
  on the key, a per-key sort, zero joins.  This is the classic
  union-scan formulation (kdb/Flink lineage); Spark's Catalyst has no
  ASOF node, but the window plan it compiles to is exactly the
  merge-scan an ASOF engine runs.  DuckDB HAS a native ``ASOF JOIN`` —
  the oracle uses it, so the two formulations check each other.
* **range join** — all pairs (same key) with ``|l.ts - r.ts| <= gap``.
  The scale-sound plan is a TIME-BUCKET equi-join: bucket both sides by
  ``ts div gap``, explode one side to its 3 adjacent buckets, equi-join
  on (key, bucket), then filter the exact predicate.  Every true pair
  lands in exactly one bucket pairing (no dedup needed), and the join
  stays an equi-join the optimizer can hash — never the
  inequality-only nested loop a naive ``ON |Δt| <= gap`` degrades to.

Determinism discipline: ties among right rows at the same (key, ts) are
broken by largest ``event_id`` on both engines (the window orders by it;
the oracle pre-reduces right to one row per (key, ts) with max id — the
formulations are equivalent because ``last`` in (ts, id) order IS the
max-id row of the max ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts_us",
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    right_prefix: str = "r_",
    tie_col: str | None = None,
) -> DataFrame:
    """For each left row: key col, ``left_cols``, and the ``right_cols``
    of the latest right row with ``right.ts <= left.ts`` (NULLs when no
    right row precedes).  One shuffle on ``on``; per-key window.
    ``tie_col``: right column whose LARGEST value wins among right rows
    tied on (key, ts) — pass one whenever such ties can exist, or the
    winner is partition-order-dependent."""
    left_cols = left_cols or [c for c in left.columns if c not in (on, ts_col)]
    right_cols = right_cols or [c for c in right.columns if c not in (on, ts_col)]
    if not left_cols or not right_cols:
        # zero payload columns would build F.struct() / a malformed
        # trailing-comma DDL cast; an existence-style probe should carry
        # the id or ts column explicitly
        raise ValueError(
            "asof_join needs at least one payload column per side beyond "
            "(on, ts_col) — pass left_cols/right_cols explicitly (e.g. the "
            "id column) for existence-style probes"
        )
    lp = F.struct(*[F.col(c) for c in left_cols]).alias("_lp")
    rp = F.struct(
        F.col(ts_col).alias("_rts"), *[F.col(c) for c in right_cols]
    ).alias("_rp")
    tie = (F.col(tie_col).cast("long") if tie_col else F.lit(0)).alias("_rid")
    l = left.select(
        F.col(on), F.col(ts_col).alias("_ts"), F.lit(1).alias("_tag"),
        F.lit(None).cast("long").alias("_rid"), lp,
        F.lit(None).cast(
            f"struct<_rts:{dict(right.dtypes)[ts_col]},"
            + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in right_cols)
            + ">"
        ).alias("_rp"),
    )
    r = right.select(
        F.col(on), F.col(ts_col).alias("_ts"), F.lit(0).alias("_tag"),
        tie,
        F.lit(None).cast(l.schema["_lp"].dataType.simpleString()).alias("_lp"),
        rp,
    )
    u = l.unionByName(r)
    # right rows sort BEFORE left at equal ts (tag 0 < 1) so <= holds;
    # among same-ts right rows the largest _rid is last → wins
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_tag", "_rid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
    out = matched.where(F.col("_tag") == 1).select(
        on,
        F.col("_ts").alias(ts_col),
        *[F.col("_lp").getField(c).alias(c) for c in left_cols],
        F.col("_m").getField("_rts").alias(f"{right_prefix}{ts_col}"),
        *[F.col("_m").getField(c).alias(f"{right_prefix}{c}")
          for c in right_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts_us",
    max_gap: int = 300_000_000,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """All (left, right) pairs sharing ``on`` with ``|l.ts - r.ts| <=
    max_gap``, via the 3-adjacent-bucket equi-join (never an
    inequality-only join).  ``max_gap`` in the ``ts_col`` unit."""
    if max_gap < 1:
        raise ValueError("max_gap must be >= 1")
    left_cols = left_cols or [c for c in left.columns if c not in (on, ts_col)]
    right_cols = right_cols or [c for c in right.columns if c not in (on, ts_col)]
    l = left.select(
        F.col(on), F.col(ts_col).alias("_lts"),
        *[F.col(c) for c in left_cols],
        F.expr(f"{ts_col} div {max_gap}").alias("_bin"),
    )
    r = right.select(
        F.col(on).alias("_rk"), F.col(ts_col).alias("_rts"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right_cols],
        F.explode(
            F.array(
                F.expr(f"{ts_col} div {max_gap} - 1"),
                F.expr(f"{ts_col} div {max_gap}"),
                F.expr(f"{ts_col} div {max_gap} + 1"),
            )
        ).alias("_rbin"),
    )
    joined = l.join(
        r, (l[on] == r["_rk"]) & (l["_bin"] == r["_rbin"])
    ).where(F.abs(F.col("_lts") - F.col("_rts")) <= max_gap)
    return joined.select(
        on,
        F.col("_lts").alias(ts_col),
        *left_cols,
        F.col("_rts").alias(f"{right_prefix}{ts_col}"),
        *[f"{right_prefix}{c}" for c in right_cols],
        (F.col("_rts") - F.col("_lts")).alias("gap"),
    )


def contact_edges(
    events: DataFrame,
    key_col: str = "event_type",
    actor_col: str = "user_id",
    ts_col: str = "ts_us",
    tie_col: str = "event_id",
) -> DataFrame:
    """(src, dst, t) — the temporal contact sequence: within each key
    stream, each event links the PREVIOUS actor to the current one at the
    current timestamp (self-contacts dropped).  One edge per event, so
    the contact graph is |events|-sparse no matter how bursty a stream
    gets — the degenerate-window blowup a same-key range join risks
    cannot happen by construction.  One hash shuffle on the key; the lag
    window is per-key, never global."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    return (
        events.select(
            F.lag(actor_col).over(w).alias("src"),
            F.col(actor_col).alias("dst"),
            F.col(ts_col).alias("t"),
        )
        .where(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
    )


def temporal_reachability(
    edges: DataFrame,
    actors: DataFrame,
    source: int,
    source_ts: int,
    rounds: int = 8,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(user_id, arr_us) — earliest-arrival times over the time-respecting
    contact edges after ``rounds`` synchronous relaxations: an edge
    (u, v, t) forwards only when ``t >= arr(u)`` (information cannot ride
    a contact that happened before it arrived) and delivers arrival ``t``.
    This ordering constraint is what distinguishes temporal reachability
    from plain BFS — a path that exists structurally but runs backwards
    in time is NOT a path here (Holme & Saramäki, Phys. Rep. 519, 2012).

    ``edges`` is (src, dst, t); ``actors`` one row per user_id.  Per
    round: one equi-join on src + one map-side-combined min-groupBy on
    dst — the same shuffle shape as a Pregel superstep; arrival state is
    one long per actor.  Lineage is truncated every ``checkpoint_every``
    rounds, the repo-wide loop discipline."""
    arr = actors.select(
        F.col("user_id"),
        F.when(F.col("user_id") == source, F.lit(source_ts))
        .cast("long")
        .alias("arr"),
    )
    for r in range(1, rounds + 1):
        msgs = (
            edges.alias("e")
            .join(
                arr.where(F.col("arr").isNotNull()).alias("a"),
                (F.col("e.src") == F.col("a.user_id"))
                & (F.col("e.t") >= F.col("a.arr")),
            )
            .groupBy(F.col("e.dst").alias("user_id"))
            .agg(F.min("e.t").alias("m"))
        )
        arr = (
            arr.join(msgs, "user_id", "left")
            .select("user_id", F.least("arr", "m").alias("arr"))
        )
        if r % checkpoint_every == 0:
            arr = arr.localCheckpoint(eager=False)
    return arr.where(F.col("arr").isNotNull()).select(
        "user_id", F.col("arr").alias("arr_us")
    )


def snapshot_delta(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    ts_col: str = "t",
) -> DataFrame:
    """(id, n_kept, n_added, n_removed, deg_old, deg_new) — per-source
    edge churn between the two halves of the observation window: the
    distinct out-neighbor set seen before the temporal midpoint
    (``(min t + max t) div 2`` — BIGINT-exact) vs the set seen at or
    after it.  ``kept`` appears in both snapshots, ``removed`` only
    before, ``added`` only after — the crawl-to-crawl link-churn
    profile (dead links, new links, stable core) per page.

    Scale shape: the midpoint is a 1-row aggregate broadcast into the
    scan (no driver action, no second pass); then ONE map-side-combined
    (src, dst) aggregate collapses multiplicity before the per-src
    count — timestamps never survive past the first shuffle, so a
    bursty pair is one row, not a skew axis."""
    mid = edges.agg(
        F.expr(f"(min({ts_col}) + max({ts_col})) div 2").alias("mid")
    )
    st = (
        edges.crossJoin(F.broadcast(mid))
        .groupBy(src_col, dst_col)
        .agg(
            F.max(
                F.when(F.col(ts_col) < F.col("mid"), 1).otherwise(0)
            ).alias("has_old"),
            F.max(
                F.when(F.col(ts_col) >= F.col("mid"), 1).otherwise(0)
            ).alias("has_new"),
        )
    )
    out = st.groupBy(F.col(src_col).alias("id")).agg(
        F.sum(F.col("has_old") * F.col("has_new"))
        .cast("long")
        .alias("n_kept"),
        F.sum((1 - F.col("has_old")) * F.col("has_new"))
        .cast("long")
        .alias("n_added"),
        F.sum(F.col("has_old") * (1 - F.col("has_new")))
        .cast("long")
        .alias("n_removed"),
    )
    return out.select(
        "id",
        "n_kept",
        "n_added",
        "n_removed",
        (F.col("n_kept") + F.col("n_removed")).cast("long").alias("deg_old"),
        (F.col("n_kept") + F.col("n_added")).cast("long").alias("deg_new"),
    )


def temporal_motifs(
    edges: DataFrame,
    delta: int = 3_600_000_000,
    ts_col: str = "t",
) -> DataFrame:
    """(motif, n) — delta-temporal motif counts (Paranjape, Benson &
    Leskovec, WSDM 2017) over the contact sequence: ``path2`` = ordered
    2-paths u->v->w with t1 < t2 <= t1+delta and w != u; ``cycle3`` =
    cyclic triangles whose third arc w->u lands in (t2, t1+delta].
    Strict time order throughout — arcs with tied timestamps never form
    a motif (stated; both engines identical), and multi-edges count as
    distinct instances (PBL instance semantics).

    Scale shape: both joins are EQUI-joins — the wedge keys on the
    middle vertex + a delta-width time bucket (right side exploded to
    its 2 adjacent buckets, exact window re-checked as a residual
    predicate — the range_join discipline, never an inequality-only
    join), the closure keys on the (w, u) vertex pair + the same
    buckets.  Wedge fan-out is bounded per (vertex, delta-window), not
    per vertex: a hub that is merely long-lived never goes quadratic,
    only a hub bursty WITHIN delta does (AQE skew-split handles that);
    the PBL counting algorithm replaces enumeration when only totals
    are needed at extreme scale — this is the exact instance-join form."""
    e = edges.select(
        F.col("src"), F.col("dst"), F.col(ts_col).alias("t"),
        F.expr(f"{ts_col} div {delta}").alias("b"),
    )
    e2 = e.select(
        F.col("src").alias("v2"),
        F.col("dst").alias("w"),
        F.col("t").alias("t2"),
        F.explode(F.array(F.col("b") - 1, F.col("b"))).alias("b2"),
    )
    w2 = (
        e.join(
            e2,
            (F.col("v2") == F.col("dst")) & (F.col("b2") == F.col("b")),
        )
        .where(
            (F.col("t2") > F.col("t"))
            & (F.col("t2") <= F.col("t") + delta)
            & (F.col("w") != F.col("src"))
        )
        .select(
            F.col("src").alias("u"),
            F.col("dst").alias("v"),
            "w",
            F.col("t").alias("t1"),
            "t2",
            F.col("b").alias("b1"),
        )
    )
    e3 = e.select(
        F.col("src").alias("s3"),
        F.col("dst").alias("d3"),
        F.col("t").alias("t3"),
        F.explode(F.array(F.col("b") - 1, F.col("b"))).alias("b3"),
    )
    c3 = (
        w2.join(
            e3,
            (F.col("s3") == F.col("w"))
            & (F.col("d3") == F.col("u"))
            & (F.col("b3") == F.col("b1")),
        )
        .where(
            (F.col("t3") > F.col("t2"))
            & (F.col("t3") <= F.col("t1") + delta)
        )
    )
    np2 = w2.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
        F.lit("path2").alias("motif"), "n"
    )
    nc3 = c3.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
        F.lit("cycle3").alias("motif"), "n"
    )
    return np2.unionByName(nc3)


def triadic_closure_rate(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    ts_col: str = "t",
) -> DataFrame:
    """(n_added, n_closing, closure_micros) — temporal triadic closure:
    of the undirected contact pairs that appear only AT/AFTER the
    window's temporal midpoint (the "new" edges), what fraction closes
    a wedge that already existed in the BEFORE-midpoint graph (the two
    endpoints shared a common neighbor)?  The link-formation mechanism
    readout (Rapoport/Granovetter): a high rate says the graph grows by
    friend-of-friend closure, a low rate says links arrive exogenously
    — and it is the base-rate sanity check for any common-neighbor link
    predictor shipped next to it (jaccard_linkpred, adamic_adar).

    Exactness: distinct-pair set algebra + one exact subtract-the-
    remainder micro ratio — no floats.

    Scale shape: the midpoint is a 1-row broadcast (no driver action);
    pair multiplicity collapses in ONE map-side-combined groupBy before
    any join (bursty pairs are one row); the wedge-existence probe
    expands each added edge from its LOWER-degree endpoint only (the
    same √E fan-out bound as the degree-oriented triangle family) and
    closes with a left-semi equi-join — no unoriented wedge self-join
    anywhere."""
    mid = edges.agg(
        F.expr(f"(min({ts_col}) + max({ts_col})) div 2").alias("mid")
    )
    tp = (
        edges.crossJoin(F.broadcast(mid))
        .select(
            F.least(src_col, dst_col).alias("lo"),
            F.greatest(src_col, dst_col).alias("hi"),
            F.when(F.col(ts_col) < F.col("mid"), 1).otherwise(0).alias("o"),
            F.when(F.col(ts_col) >= F.col("mid"), 1).otherwise(0).alias("n"),
        )
        .groupBy("lo", "hi")
        .agg(F.max("o").alias("has_old"), F.max("n").alias("has_new"))
    )
    old_p = tp.where(F.col("has_old") == 1).select("lo", "hi")
    added = tp.where(
        (F.col("has_old") == 0) & (F.col("has_new") == 1)
    ).select("lo", "hi")
    adj = old_p.select(F.col("lo").alias("a"), F.col("hi").alias("b")).unionByName(
        old_p.select(F.col("hi").alias("a"), F.col("lo").alias("b"))
    )
    deg = adj.groupBy("a").agg(F.count(F.lit(1)).alias("dg"))
    a_deg = (
        added.join(deg.select(F.col("a").alias("lo"), F.col("dg").alias("dlo")),
                   "lo", "left")
        .join(deg.select(F.col("a").alias("hi"), F.col("dg").alias("dhi")),
              "hi", "left")
        .select(
            "lo", "hi",
            F.coalesce("dlo", F.lit(0)).alias("dlo"),
            F.coalesce("dhi", F.lit(0)).alias("dhi"),
        )
    )
    lo_first = (F.col("dlo") < F.col("dhi")) | (
        (F.col("dlo") == F.col("dhi")) & (F.col("lo") < F.col("hi"))
    )
    picked = a_deg.select(
        "lo", "hi",
        F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("e"),
        F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("oth"),
    )
    w1 = adj.select(F.col("a").alias("e"), F.col("b").alias("w"))
    cand = picked.join(w1, "e").where(F.col("w") != F.col("oth"))
    w2 = adj.select(F.col("a").alias("oth"), F.col("b").alias("w"))
    closing = (
        cand.join(w2, ["oth", "w"], "left_semi")
        .select("lo", "hi")
        .distinct()
    )
    na = added.agg(F.count(F.lit(1)).cast("long").alias("n_added"))
    nc = closing.agg(F.count(F.lit(1)).cast("long").alias("n_closing"))
    return na.crossJoin(nc).select(
        "n_added",
        "n_closing",
        F.when(F.col("n_added") == 0, F.lit(0))
        .otherwise(
            F.expr(
                "(1000000 * n_closing - (1000000 * n_closing) % n_added)"
                " div n_added"
            )
        )
        .cast("long")
        .alias("closure_micros"),
    )


def intercontact_histogram(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    ts_col: str = "t",
) -> DataFrame:
    """(bucket, n_gaps, n_pairs) — the inter-contact time distribution
    (Holme & Saramäki 2012): for every undirected pair that meets more
    than once, the gaps between consecutive contacts, pooled into
    floor(log2(gap))+1 magnitude buckets (``length(bin(gap))`` over the
    microsecond gap; same-timestamp repeats land in bucket 1 via
    bin(0)).  Heavy-tailed inter-contact times are WHY temporal
    reachability differs from static reachability — bursts deliver,
    long silences don't — and this histogram is the one-table evidence
    (exponential ≈ one tight bucket band; power-law ≈ a flat decade
    spread).

    Exactness: pure integer gaps and counts.  Determinism: within a
    pair the gap MULTISET is invariant to tie order among equal
    timestamps, so no tie-break column is needed.

    Scale shape: one per-pair window (partitioned by the pair — never
    global) over the contact stream, then one log-sized aggregate with
    a distinct-pair count riding the same pass.  A pair that meets k
    times costs k rows — edge-linear."""
    w = Window.partitionBy("lo", "hi").orderBy(ts_col)
    g = (
        edges.where(F.col(src_col) != F.col(dst_col))
        .select(
            F.least(src_col, dst_col).alias("lo"),
            F.greatest(src_col, dst_col).alias("hi"),
            F.col(ts_col),
        )
        .withColumn("prev", F.lag(ts_col).over(w))
        .where(F.col("prev").isNotNull())
        .select(
            "lo", "hi",
            (F.col(ts_col) - F.col("prev")).cast("long").alias("gap"),
        )
    )
    return (
        g.withColumn("bucket", F.expr("length(bin(gap))").cast("long"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.count_distinct(F.col("lo"), F.col("hi"))
            .cast("long")
            .alias("n_pairs"),
        )
    )


def event_trigrams(
    events: DataFrame,
    k: int = 20,
    actor_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """(a, b, c, n) — the ``k`` most frequent length-3 event-type paths
    over per-actor timelines (ties broken by (a, b, c) so top-k is
    deterministic): the sequence-mining readout one step past
    tool_transitions' bigrams — which three-step journeys dominate?

    Scale shape: one per-actor lag window over the facts (same shuffle
    conversion_prob rides), a map-side-combined trigram groupBy, and a
    global top-k that plans as TakeOrderedAndProject (k rows per
    partition, never a global sort)."""
    w = Window.partitionBy(actor_col).orderBy(ts_col, tie_col)
    tri = (
        events.select(
            F.lag(state_col, 2).over(w).alias("a"),
            F.lag(state_col, 1).over(w).alias("b"),
            F.col(state_col).alias("c"),
        )
        .where(F.col("a").isNotNull())
        .groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return tri.orderBy(
        F.col("n").desc(), "a", "b", "c"
    ).limit(k)


def conversion_lag_quantiles(
    events: DataFrame,
    start_type: str = "view",
    end_type: str = "purchase",
    actor_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(n, p25, p50, p75) — discrete quantiles of the per-actor
    conversion lag in whole seconds: first ``end_type`` timestamp minus
    first ``start_type`` timestamp, counted only for actors whose first
    end strictly follows their first start (the time-to-convert
    readout next to funnel counts — not just HOW MANY convert, but how
    long the journey takes).

    Rides :func:`~graphlite_spark.operators.quantiles.grouped_quantiles`
    — the repo's exact engine-portable rank rule (rank =
    ``(n·pct + 99) div 100``) — over a single group, so the three cut
    points are BIGINT-exact on both engines.

    Scale shape: one map-side-combined per-actor min-pair aggregate,
    then the quantile machinery runs on the converting-actor table
    (≤ one row per actor)."""
    from graphlite_spark.operators.quantiles import grouped_quantiles

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    per = events.groupBy(F.col(actor_col).alias("u")).agg(
        F.min(
            F.when(F.col("event_type") == start_type, us)
        ).alias("t0"),
        F.min(
            F.when(F.col("event_type") == end_type, us)
        ).alias("t1"),
    )
    lags = per.where(
        F.col("t0").isNotNull() & (F.col("t1") > F.col("t0"))
    ).select(
        F.lit("all").alias("g"),
        F.expr("(t1 - t0) div 1000000").cast("long").alias("lag_s"),
    )
    return grouped_quantiles(lags, "g", "lag_s", (25, 50, 75)).select(
        "n",
        F.col("p25").cast("long").alias("p25"),
        F.col("p50").cast("long").alias("p50"),
        F.col("p75").cast("long").alias("p75"),
    )


def touch_attribution(
    events: DataFrame,
    convert_type: str = "purchase",
    actor_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """(model, channel, n_conversions, sum_cents) — first-touch AND
    last-touch revenue attribution over per-actor timelines, the two
    classic heuristics bracketing :func:`markov removal-effect
    <...markov_attribution>`: each conversion credits its actor's
    FIRST preceding non-conversion event type (first-touch) and its
    LAST preceding one (last-touch); conversions with no preceding
    touch credit '(direct)'.  Revenue in the house integer cents.

    Scale shape: ONE per-actor ordered window computes both carried
    channels (``first``/``last`` with ignorenulls over the strictly-
    preceding frame — no self-join, no as-of join), then one
    codebook-sized groupBy per model, unioned."""
    w = (
        Window.partitionBy(actor_col)
        .orderBy(ts_col, tie_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type") != convert_type, F.col("event_type")
    )
    marked = events.select(
        F.col("event_type"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
        F.first(touch, ignorenulls=True).over(w).alias("ft"),
        F.last(touch, ignorenulls=True).over(w).alias("lt"),
    ).where(F.col("event_type") == convert_type)

    def model(col: str, name: str) -> DataFrame:
        return (
            marked.select(
                F.lit(name).alias("model"),
                F.coalesce(F.col(col), F.lit("(direct)")).alias(
                    "channel"
                ),
                "cents",
            )
            .groupBy("model", "channel")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_conversions"),
                F.sum("cents").cast("long").alias("sum_cents"),
            )
        )

    return model("ft", "first_touch").unionByName(
        model("lt", "last_touch")
    )


def position_attribution(
    events: DataFrame,
    convert_type: str = "purchase",
    actor_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """(channel, n_touches, sum_credit_microcents) — U-shaped
    (position-based 40/20/40) attribution, completing the family next
    to first/last-touch and the Markov removal effect: each conversion
    splits 10^6 credit micros over its ordered preceding touches —
    single touch takes all; two touches split 500000/500000; three or
    more give first and last 400000 each and the middles
    ``200000 div (m−2)`` apiece with the truncation remainder assigned
    to the LAST touch (stated, so credits sum to exactly 10^6).
    Contributions ride as exact BIGINT micro-cents
    (``cents·credit_micros``) — no division after the credit rule.

    Scale shape: ONE ordered per-actor window collects each
    conversion's preceding touch list (bounded by the actor's own
    history); credits are per-row array expressions over that list."""
    w = (
        Window.partitionBy(actor_col)
        .orderBy(ts_col, tie_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type") != convert_type, F.col("event_type")
    )
    conv = events.select(
        "event_type",
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
        F.filter(
            F.collect_list(touch).over(w), lambda x: x.isNotNull()
        ).alias("touches"),
    ).where(
        (F.col("event_type") == convert_type)
        & (F.size("touches") > 0)
    )
    m = F.size("touches")
    q = F.expr("200000 div (size(touches) - 2)")
    credits = F.when(m == 1, F.array(F.lit(1_000_000))).when(
        m == 2, F.array(F.lit(500_000), F.lit(500_000))
    ).otherwise(
        F.transform(
            F.col("touches"),
            lambda x, i: F.when(i == 0, F.lit(400_000))
            .when(
                i == m - 1,
                F.lit(400_000)
                + (F.lit(200_000) - q * (m - 2)).cast("int"),
            )
            .otherwise(q.cast("int"))
            .cast("long"),
        )
    )
    staged = conv.select("cents", "touches", credits.alias("credits"))
    pairs = staged.select(
        "cents",
        F.explode(
            F.arrays_zip(
                F.col("touches").alias("ch"),
                F.col("credits").alias("cr"),
            )
        ).alias("z"),
    )
    return pairs.groupBy(F.col("z.ch").alias("channel")).agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.sum(F.col("cents") * F.col("z.cr"))
        .cast("long").alias("sum_credit_microcents"),
    )


def transition_latency(
    events: DataFrame,
    percents: tuple = (50, 90),
    actor_col: str = "user_id",
) -> DataFrame:
    """(transition, n, p50, p90) — exact discrete quantiles of the
    inter-event gap in SECONDS per event-type transition within each
    unit's stream (``click>purchase``, ``view>error``, …):
    :func:`tool_transitions` counts WHICH transitions happen; this says
    HOW LONG they take — the dwell-time matrix a funnel-latency SLA
    reads (the events-table sibling of the transcript tier's
    response_latency_quantiles).

    One lag window over (unit, ts, event_id) builds the adjacent-pair
    frame — no self-join — then the engine-portable rank-rule
    quantiles.  Gaps ride BIGINT seconds (micros div 10⁶), so every
    selected element is bit-identical.

    Scale shape: one shuffle on the unit key for the lag, one
    per-transition sort window (group count bounded by the type
    alphabet squared)."""
    from graphlite_spark.operators.quantiles import grouped_quantiles

    us = events.select(
        F.col(actor_col).alias("u"),
        F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us"),
        "event_id", "event_type",
    )
    w = Window.partitionBy("u").orderBy("ts_us", "event_id")
    pairs = us.select(
        F.concat_ws(
            ">", F.lag("event_type").over(w), F.col("event_type")
        ).alias("transition"),
        (
            (F.col("ts_us") - F.lag("ts_us").over(w))
            / F.lit(1_000_000)
        ).cast("long").alias("gap_s"),
        F.lag("ts_us").over(w).alias("prev"),
    ).where(F.col("prev").isNotNull()).drop("prev")
    return grouped_quantiles(pairs, "transition", "gap_s", percents)


def shapley_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    max_channels: int = 12,
) -> DataFrame:
    """(channel, n_channels, phi_num, phi_micros) — exact SHAPLEY-value
    conversion attribution over the touch channels (every event type
    except ``conversion_type``), completing the attribution family:
    :func:`touch_attribution` is first/last-heuristic,
    :func:`position_attribution` positional, markov_attribution
    removal-effect — Shapley is the unique allocation satisfying
    efficiency/symmetry/dummy (Shapley 1953, public literature), with
    the coalition worth v(S) = number of CONVERTED users whose touch
    set is contained in S (the Zhao et al. 2018 simplification).

    ``phi_num`` is n!·φ(channel) — an exact integer, because every
    marginal weight |S|!·(n−1−|S|)! is integral — and ``phi_micros``
    its truncating-division micros.  Efficiency holds exactly:
    Σ phi_num = n!·(v(all) − v(∅)), with v(∅) the purchase-only users
    no channel can claim.

    Exactness: the distributed pass is one bit-or groupBy to a user
    bitmask + converted flag and one groupBy to the ≤2ⁿ (mask, count)
    table, which collects (codebook discipline); the 2ⁿ·2ⁿ subset scan
    and the factorial weights run in arbitrary-precision Python ints,
    mirrored by HUGEINT factorial()/bit_count() in the oracle.  Raises
    on more than ``max_channels`` channels (2ⁿ blow-up is the caller's
    explicit opt-in, the loud-guard convention).

    Scale shape: two map-side-combined groupBys over the facts; the
    driver sees ≤2ⁿ rows of two longs regardless of N."""
    from math import factorial

    from graphlite_spark.operators.similarity import _trunc_div

    spark = events.sparkSession
    schema = (
        "channel string, n_channels long, phi_num long, phi_micros long"
    )
    chans = sorted(
        r["t"]
        for r in events.select(F.col(type_col).alias("t"))
        .distinct()
        .collect()
        if r["t"] != conversion_type and r["t"] is not None
    )
    n = len(chans)
    if n == 0:
        return spark.createDataFrame([], schema)
    if n > max_channels:
        raise ValueError(
            f"shapley_attribution: {n} channels would enumerate 2^{n} "
            f"coalitions; raise max_channels past {max_channels} to "
            "opt in explicitly"
        )
    quoted = ", ".join("'" + c.replace("'", "''") + "'" for c in chans)
    enc = events.select(
        F.col(user_col).alias("u"),
        (F.col(type_col) == conversion_type).cast("int").alias("conv"),
        F.when(
            F.col(type_col) != conversion_type,
            F.expr(
                f"shiftleft(cast(1 as bigint), cast("
                f"array_position(array({quoted}), {type_col}) - 1"
                " as int))"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("bit"),
    )
    per = enc.groupBy("u").agg(
        F.bit_or("bit").cast("long").alias("mask"),
        F.max("conv").alias("conv"),
    )
    bymask = (
        per.where(F.col("conv") == 1)
        .groupBy("mask")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .collect()
    )
    conv_by_mask = {int(r["mask"]): int(r["cnt"]) for r in bymask}

    vcache = {}

    def v(s: int) -> int:
        if s not in vcache:
            vcache[s] = sum(
                c for m, c in conv_by_mask.items() if m & ~s == 0
            )
        return vcache[s]

    nf = factorial(n)
    out = []
    for ci, ch in enumerate(chans):
        bit = 1 << ci
        phi = 0
        for s in range(1 << n):
            if s & bit:
                continue
            w = factorial(bin(s).count("1")) * factorial(
                n - 1 - bin(s).count("1")
            )
            phi += w * (v(s | bit) - v(s))
        out.append((ch, n, phi, _trunc_div(1_000_000 * phi, nf)))
    return spark.createDataFrame(out, schema)


def layer_multiplexity(
    events: DataFrame,
    key_col: str = "event_type",
    actor_col: str = "user_id",
    ts_col: str = "ts_us",
    tie_col: str = "event_id",
) -> DataFrame:
    """(type_a, type_b, n_a, n_b, n_common, jaccard_micros) — edge
    overlap between the LAYERS of the multiplex contact graph: each
    event type induces its own contact layer (:func:`contact_edges`
    already streams per type); for every type pair, the Jaccard of
    the two undirected edge sets says whether the layers trace the
    SAME social fabric or disjoint ones (multiplexity, Verbrugge 1979
    / multilayer-network literature, public).  The layer-level
    companion to :func:`tie_strength_embeddedness`'s per-edge overlap.

    Exactness: layers are DISTINCT canonical (least, greatest) vertex
    pairs; counts are exact; jaccard is one truncating micro division.
    Pairs with an empty union are omitted (no 0/0 row).

    Scale shape: one lag window per type stream (the contact_edges
    shape), one distinct, one self-equi-join ON THE EDGE KEY (type
    pairs meet only where an identical edge exists in both layers —
    never a type×type×edges blow-up), and a type-pair grid join over
    the vocabulary-sized layer list."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    arcs = (
        events.select(
            F.col(key_col).alias("t"),
            F.lag(actor_col).over(w).alias("p"),
            F.col(actor_col).alias("q"),
        )
        .where(F.col("p").isNotNull() & (F.col("p") != F.col("q")))
        .select(
            "t",
            F.least("p", "q").alias("u"),
            F.greatest("p", "q").alias("v"),
        )
        .distinct()
    )
    sizes = arcs.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    common = (
        arcs.alias("a")
        .join(
            arcs.alias("b"),
            (F.col("a.u") == F.col("b.u"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.t") < F.col("b.t")),
        )
        .groupBy(
            F.col("a.t").alias("type_a"), F.col("b.t").alias("type_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    grid = (
        sizes.alias("x")
        .join(sizes.alias("y"), F.col("x.t") < F.col("y.t"))
        .select(
            F.col("x.t").alias("type_a"),
            F.col("y.t").alias("type_b"),
            F.col("x.n").alias("n_a"),
            F.col("y.n").alias("n_b"),
        )
    )
    return (
        grid.join(common, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            F.coalesce("n_common", F.lit(0)).cast("long").alias(
                "n_common"
            ),
            F.expr(
                "(1000000 * coalesce(n_common, 0))"
                " div (n_a + n_b - coalesce(n_common, 0))"
            ).cast("long").alias("jaccard_micros"),
        )
        .where(F.col("n_a") + F.col("n_b") > 0)
    )


def time_decay_attribution(
    events: DataFrame,
    convert_type: str = "purchase",
    half_life_days: int = 1,
    max_days: int = 20,
    actor_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """(channel, n_touches, sum_credit_microcents) — time-decay
    revenue attribution, completing the heuristic family next to
    first/last-touch, U-shaped and the Markov removal effect: each
    conversion splits 10⁶ credit micros over its ordered preceding
    touches with weight halving per ``half_life_days`` of age
    (w = 10⁶ div 2^Δ, Δ = age in half-lives capped at ``max_days``),
    so yesterday's click outweighs last month's.

    Exactness: weights are exact powers-of-two divisions; per-touch
    credit is the truncating share (10⁶·w) div Σw with the truncation
    remainder assigned to the MOST RECENT touch (the
    position_attribution discipline — credits sum to exactly 10⁶);
    contributions ride as BIGINT micro-cents.

    Scale shape: ONE ordered per-actor window collects each
    conversion's preceding touch structs (bounded by the actor's own
    history); weights/credits are array expressions over that list —
    staged as separate projections so no subexpression re-inlines."""
    w = (
        Window.partitionBy(actor_col)
        .orderBy(ts_col, tie_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type") != convert_type,
        F.struct(
            F.col("event_type").alias("t"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("u"),
        ),
    )
    conv = events.select(
        "event_type",
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("cu"),
        F.filter(
            F.collect_list(touch).over(w), lambda x: x.isNotNull()
        ).alias("touches"),
    ).where(
        (F.col("event_type") == convert_type)
        & (F.size("touches") > 0)
    )
    hl_us = half_life_days * 86_400_000_000
    wts = conv.select(
        "cents", "touches",
        F.expr(
            "transform(touches, x -> 1000000 div shiftleft("
            "cast(1 as bigint), cast(least((cu - x.u)"
            f" div {hl_us}, {max_days}) as int)))"
        ).alias("wts"),
    ).select(
        "cents", "touches", "wts",
        F.expr(
            "aggregate(wts, cast(0 as bigint), (a, x) -> a + x)"
        ).alias("sw"),
    )
    base = wts.select(
        "cents", "touches",
        F.expr(
            "transform(wts, x -> (1000000 * x) div sw)"
        ).alias("cr0"),
    ).select(
        "cents", "touches", "cr0",
        F.expr(
            "aggregate(cr0, cast(0 as bigint), (a, x) -> a + x)"
        ).alias("sc"),
    )
    credited = base.select(
        "cents",
        F.expr(
            "transform(cr0, (c, i) -> CASE WHEN i = size(cr0) - 1"
            " THEN c + (1000000 - sc) ELSE c END)"
        ).alias("credits"),
        "touches",
    )
    return (
        credited.select(
            "cents",
            F.explode(
                F.arrays_zip(
                    F.expr("transform(touches, x -> x.t)").alias("ch"),
                    F.col("credits").alias("cr"),
                )
            ).alias("z"),
        )
        .select(
            F.col("z.ch").alias("channel"),
            (F.col("cents") * F.col("z.cr")).cast("long").alias("mc"),
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.sum("mc").cast("long").alias("sum_credit_microcents"),
        )
    )


def funnel_multistep(
    events: DataFrame,
    steps: tuple = ("signup", "click", "purchase"),
    actor_col: str = "user_id",
    ts_col: str = "ts_us",
) -> DataFrame:
    """One row (n_step1, n_step2, n_step3, conv12_micros, conv23_micros,
    conv13_micros) — the classic strict-order 3-step funnel: users with
    a first ``steps[0]``, of those the ones with a ``steps[1]``
    STRICTLY AFTER it, of those the ones with a ``steps[2]`` strictly
    after that.  The multi-stage extension of
    :func:`funnel_conversion` (which sees one hop) — where users leak
    between acquisition, engagement and monetization.

    Each stage anchors at the EARLIEST qualifying timestamp (min-
    aggregate per user per stage — equal-timestamp ties do not
    qualify, stated); conversions are truncating micros ratios.

    Scale shape: three per-user min-aggregates chained by two
    equi-joins on the user key — no windows, no ordering shuffle
    beyond the per-user combine."""
    a, b, c = steps
    e = events.select(
        F.col(actor_col).alias("u"), "event_type",
        F.col(ts_col).alias("t"),
    )
    s1 = e.where(F.col("event_type") == a).groupBy("u").agg(
        F.min("t").alias("t1")
    )
    s2 = (
        e.where(F.col("event_type") == b)
        .join(s1, "u")
        .where(F.col("t") > F.col("t1"))
        .groupBy("u")
        .agg(F.min("t").alias("t2"))
    )
    s3 = (
        e.where(F.col("event_type") == c)
        .join(s2, "u")
        .where(F.col("t") > F.col("t2"))
        .groupBy("u")
        .agg(F.min("t").alias("t3"))
    )
    n1 = s1.agg(F.count(F.lit(1)).cast("long").alias("n_step1"))
    n2 = s2.agg(F.count(F.lit(1)).cast("long").alias("n_step2"))
    n3 = s3.agg(F.count(F.lit(1)).cast("long").alias("n_step3"))
    return (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(n3))
        .select(
            "n_step1", "n_step2", "n_step3",
            F.when(
                F.col("n_step1") > 0,
                F.expr("(1000000 * n_step2) div n_step1"),
            ).cast("long").alias("conv12_micros"),
            F.when(
                F.col("n_step2") > 0,
                F.expr("(1000000 * n_step3) div n_step2"),
            ).cast("long").alias("conv23_micros"),
            F.when(
                F.col("n_step1") > 0,
                F.expr("(1000000 * n_step3) div n_step1"),
            ).cast("long").alias("conv13_micros"),
        )
    )


def conversion_window_curve(
    events: DataFrame,
    from_type: str = "click",
    to_type: str = "purchase",
    windows_days: tuple = (1, 3, 7, 14),
    actor_col: str = "user_id",
    ts_col: str = "ts_us",
    tie_col: str = "event_id",
) -> DataFrame:
    """(window_days, n_from, n_converted, conv_micros) — the
    attribution-window sensitivity curve: for each candidate window W,
    the share of ``from_type`` events followed by a ``to_type`` by the
    SAME actor within W days.  The tuning table behind every "did the
    click convert?" metric — pick W where the curve flattens instead
    of inheriting a default.

    Exactness: each from-event's FIRST strictly-later conversion delay
    is an exact BIGINT (min-aggregate, (ts, tie) strict order);
    windows threshold that one delay table; ratios truncate.

    Scale shape: one per-actor equi-join bounded by per-actor event
    counts, one min-aggregate per from-event, then a windows-sized
    literal explode over a 1-row count table — the delay table is
    computed ONCE for all windows."""
    fr = events.where(F.col("event_type") == from_type).select(
        F.col(actor_col).alias("u"), F.col(tie_col).alias("fid"),
        F.col(ts_col).alias("ft"),
    )
    to = events.where(F.col("event_type") == to_type).select(
        F.col(actor_col).alias("u"), F.col(ts_col).alias("tt")
    )
    delay = (
        fr.join(to, "u")
        .where(F.col("tt") > F.col("ft"))
        .groupBy("fid")
        .agg(F.min(F.col("tt") - F.col("ft")).alias("d"))
    )
    nfrom = fr.agg(F.count(F.lit(1)).cast("long").alias("n_from"))
    counts = delay.agg(
        *[
            F.coalesce(
                F.sum(
                    (F.col("d") <= int(w) * 86_400_000_000).cast("long")
                ),
                F.lit(0),
            ).cast("long").alias(f"c{int(w)}")
            for w in windows_days
        ]
    )
    stack = ", ".join(
        f"struct({int(w)} as window_days, c{int(w)} as n_converted)"
        for w in windows_days
    )
    return (
        nfrom.crossJoin(F.broadcast(counts))
        .select(
            "n_from",
            F.explode(F.expr(f"array({stack})")).alias("s"),
        )
        .select(
            F.col("s.window_days").cast("int").alias("window_days"),
            "n_from",
            F.col("s.n_converted").cast("long").alias("n_converted"),
            F.when(
                F.col("n_from") > 0,
                F.expr("(1000000 * s.n_converted) div n_from"),
            ).cast("long").alias("conv_micros"),
        )
    )
