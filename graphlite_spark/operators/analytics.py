"""Cohort / OLAP-cube analytics over the event stream.

Four classic warehouse shapes the engine had not yet exposed:

* **Retention cohorts** — users grouped by first-seen week, activity
  counted per week offset.  The week index is an absolute integer
  (``epoch_us div WEEK_US``), so cohort arithmetic is BIGINT-exact and
  the DuckDB oracle hashes bit-identically.
* **Rollup** — ``GROUP BY ROLLUP(event_type, day)`` with an explicit
  grouping-id column.  Spark's ``rollup`` and DuckDB's ``ROLLUP`` emit
  the same lattice; the subtotal rows' NULL keys are coalesced to
  sentinels on BOTH engines so the hash compare never sees NULL-vs-NULL
  ambiguity.
* **Pivot** — per-user event-type counts as columns.  The pivot value
  list is EXPLICIT (no discovery pass over the data — at 100 TB a
  ``pivot`` without a value list is a full extra scan).
* **MAD outliers** — robust per-type outlier counts via the median /
  median-absolute-deviation rule, using the repo's engine-portable
  discrete-quantile rank (``quantiles.py``): median = the element at
  1-indexed rank ``ceil(n/2)`` of the sorted integer cents, MAD = the
  same rank over ``|x - median|``.  Pure BIGINT throughout.

Scale shapes: cohorts are two map-side-combined aggregates plus one
equi-join on ``user_id``; rollup is one shuffle producing the whole
lattice (Spark expands grouping sets map-side); pivot is one groupBy
with conditional counts (no per-value scans); MAD is two per-group sort
windows (spillable, never global) — the exact tier, with
``percentile_approx`` as the documented 100 TB drop-in.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WEEK_US = 7 * 24 * 3600 * 1_000_000
DAY_US = 24 * 3600 * 1_000_000

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _ts_us(col: str = "ts") -> F.Column:
    # parquet timestamps arrive TIMESTAMP_NTZ in Spark 4 — cast first
    return F.unix_micros(F.col(col).cast("timestamp"))


def retention_cohorts(events: DataFrame) -> DataFrame:
    """(cohort_week, week_offset, n_users) — classic retention triangle:
    each user joins the cohort of their first active week (absolute
    ``epoch_us div WEEK_US`` index); every (user, active week) pair then
    counts toward (cohort, week - cohort) exactly once.

    ``week_offset = 0`` rows give cohort sizes; the n_users at larger
    offsets over that base is the retention curve.  All-integer: no
    dates, no sessions, no floats."""
    wk = events.select(
        "user_id",
        F.expr(f"unix_micros(cast(ts as timestamp)) div {WEEK_US}").alias(
            "week"
        ),
    )
    active = wk.distinct()
    cohort = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        active.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def events_rollup(events: DataFrame) -> DataFrame:
    """(event_type, day_us, gid, n, sum_value_micros) — the ROLLUP
    lattice over (event_type, day): per-type-per-day rows, per-type
    subtotals, and the grand total, tagged by an explicit grouping id
    (``grouping(event_type)*2 + grouping(day)``).  Subtotal NULL keys
    are coalesced to sentinels ('(all)' / -1) so the cross-engine hash
    is well-defined.  Money is per-row micro-units summed as BIGINT."""
    src = events.select(
        "event_type",
        F.expr(
            f"unix_micros(date_trunc('day', cast(ts as timestamp))) "
        ).alias("day_us"),
        F.round(F.col("value") * 1_000_000).cast("long").alias("v_micros"),
    )
    return (
        src.rollup("event_type", "day_us")
        .agg(
            (
                F.grouping("event_type").cast("long") * 2
                + F.grouping("day_us").cast("long")
            ).alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v_micros").cast("long").alias("sum_value_micros"),
        )
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce("day_us", F.lit(-1)).cast("long").alias("day_us"),
            "gid",
            "n",
            "sum_value_micros",
        )
    )


def events_pivot(
    events: DataFrame, event_types: tuple[str, ...] = EVENT_TYPES
) -> DataFrame:
    """(user_id, n_<type>..., n_total) — per-user activity profile with
    one count column per event type.  The value list is explicit:
    Spark's ``pivot`` without one runs a distinct-discovery job over the
    full input first — a whole extra 100 TB scan for schema inference."""
    piv = (
        events.groupBy("user_id")
        .pivot("event_type", list(event_types))
        .agg(F.count(F.lit(1)))
    )
    out = [F.col("user_id")]
    total = F.lit(0).cast("long")
    for t in event_types:
        c = F.coalesce(F.col(t), F.lit(0)).cast("long")
        out.append(c.alias(f"n_{t}"))
        total = total + c
    return piv.select(*out, total.alias("n_total"))


def _disc_median(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(group, n, median) — the engine-portable lower median: the element
    at 1-indexed rank ``ceil(n/2)`` of the sorted values (quantiles.py's
    percentile_disc(50) rank rule — the picked VALUE is identical
    whichever duplicate wins the row_number ordering).  One shuffle on
    the group key; the rank and count windows share its sort."""
    w = Window.partitionBy(group_col).orderBy(value_col)
    cw = Window.partitionBy(group_col)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(cw))
        .where(F.col("rn") * 2 == F.col("n") + F.col("n") % 2)
        .select(
            group_col,
            F.col("n").cast("long").alias("n"),
            F.col(value_col).alias("median"),
        )
    )


def value_outliers_mad(events: DataFrame, k: int = 3) -> DataFrame:
    """(event_type, n, median_cents, mad_cents, n_outliers) — robust
    outlier profile per event type: an event is an outlier when its
    integer-cents value deviates from the type median by more than
    ``k``·MAD (median absolute deviation).  Median and MAD both use the
    discrete rank-``ceil(n/2)`` rule, so every number here is BIGINT
    and hash-exact against the oracle.

    MAD = 0 (over half the values identical) makes only exact-median
    values inliers — the standard degenerate case, same on both sides."""
    cents = events.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    med = _disc_median(cents, "event_type", "cents").withColumnRenamed(
        "median", "median_cents"
    )
    dev = cents.join(med, "event_type").select(
        "event_type",
        "n",
        "median_cents",
        F.abs(F.col("cents") - F.col("median_cents")).alias("dev"),
    )
    mad = (
        _disc_median(dev.select("event_type", "dev"), "event_type", "dev")
        .select("event_type", F.col("median").alias("mad_cents"))
    )
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type", "n", "median_cents", "mad_cents")
        .agg(
            F.sum(
                F.when(F.col("dev") > k * F.col("mad_cents"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers")
        )
    )


def response_latency_quantiles(
    transcripts: DataFrame,
    percents: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """(transition, n, p50, p90, p99) — exact discrete quantiles of the
    inter-turn latency (microseconds) per ROLE TRANSITION (``user >
    assistant``, ``assistant > tool``, …): the conversation-dynamics
    profile (how fast assistants answer, how long tool calls stall a
    thread) a transcript corpus is usually interrogated for first.

    One ``lead`` window over (conv_id, turn_idx) builds the adjacent-
    pair frame — no self-join — then the exact rank-rule quantiles of
    :func:`graphlite_spark.operators.quantiles.grouped_quantiles`
    (ceil(p·n), integer arithmetic, engine-portable).  Latencies ride
    BIGINT micros from ``unix_micros`` (parquet timestamps are NTZ in
    Spark 4 — cast first), so every selected element is bit-identical.

    Scale shape: the window partitions by conv_id (conversations are
    small and numerous — no skew axis), the quantile pass partitions by
    the ~9-key transition space after a map-side-combined count; at
    100 TB the transition groups are large but the rank rule stays one
    sort per group member, the same shape Spark uses for any
    percentile_exact."""
    from graphlite_spark.operators.quantiles import grouped_quantiles

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    pairs = (
        transcripts.select(
            "conv_id",
            "turn_idx",
            "role",
            ts_us.alias("ts_us"),
        )
        .withColumn("next_role", F.lead("role").over(w))
        .withColumn("next_ts_us", F.lead("ts_us").over(w))
        .where(F.col("next_role").isNotNull())
        .select(
            F.concat_ws(" > ", "role", "next_role").alias("transition"),
            (F.col("next_ts_us") - F.col("ts_us")).alias("gap_us"),
        )
    )
    return grouped_quantiles(pairs, "transition", "gap_us", percents)


def behavior_correlations(
    events: DataFrame,
    group_col: str = "event_type",
    unit_col: str = "user_id",
) -> DataFrame:
    """(type_a, type_b, n_units, sum_xy, corr) — the Pearson
    correlation of per-unit activity counts for every group pair (do
    users who click also purchase?).  Units absent from a group count
    as 0, so the moments are over the FULL unit universe: with
    n = |units|, Sx = Σ x_u, Sxx = Σ x_u², Sxy = Σ x_u·y_u (all exact
    BIGINT — only present units contribute, zeros vanish from every
    sum),

        corr = (n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²) · √(n·Syy − Sy²))

    The numerator and both radicands are exact integers (≤ ~1e13 at
    sf0.1 — well inside the 2^53 double-exact range); the two sqrt,
    one multiply, one divide are identical IEEE single operations on
    both engines, rounded to 6dp per the house float discipline.
    Constant columns (zero variance) yield NULL.

    Scale shape: ONE map-side-combined groupBy builds the counts
    table; per-group moments are a second tiny groupBy; Sxy joins the
    counts table to itself ON THE UNIT (co-present units only — never
    a unit×group dense matrix); the pair frame is group-count-sized
    and broadcast."""
    cnts = (
        events.groupBy(
            F.col(unit_col).alias("u"), F.col(group_col).alias("g")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    stats = cnts.groupBy("g").agg(
        F.sum("c").cast("long").alias("sx"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sxx"),
    )
    n = events.select(F.col(unit_col)).distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_units")
    )
    sxy = (
        cnts.select(F.col("u"), F.col("g").alias("ga"), F.col("c").alias("ca"))
        .join(
            cnts.select(
                F.col("u"), F.col("g").alias("gb"), F.col("c").alias("cb")
            ),
            "u",
        )
        .where(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("sum_xy"))
    )
    pairs = (
        stats.select(
            F.col("g").alias("ga"),
            F.col("sx").alias("sxa"),
            F.col("sxx").alias("sxxa"),
        )
        .join(
            stats.select(
                F.col("g").alias("gb"),
                F.col("sx").alias("sxb"),
                F.col("sxx").alias("sxxb"),
            ),
            F.col("ga") < F.col("gb"),
        )
        .join(sxy, ["ga", "gb"], "left")
        .crossJoin(F.broadcast(n))
        .select(
            "ga", "gb", "n_units",
            F.coalesce("sum_xy", F.lit(0)).cast("long").alias("sum_xy"),
            "sxa", "sxb", "sxxa", "sxxb",
        )
    )
    vara = F.col("n_units") * F.col("sxxa") - F.col("sxa") * F.col("sxa")
    varb = F.col("n_units") * F.col("sxxb") - F.col("sxb") * F.col("sxb")
    num = (
        F.col("n_units") * F.col("sum_xy") - F.col("sxa") * F.col("sxb")
    ).cast("double")
    corr = F.when(
        (vara > 0) & (varb > 0),
        F.round(
            num
            / (
                F.sqrt(vara.cast("double")) * F.sqrt(varb.cast("double"))
            ),
            6,
        ),
    )
    return pairs.select(
        F.col("ga").alias("type_a"),
        F.col("gb").alias("type_b"),
        "n_units",
        "sum_xy",
        corr.alias("corr"),
    )


def activity_trend(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(group, n_days, sum_y, slope_micros) — the OLS slope of DAILY
    event counts over the day index, per group, in exact integer
    arithmetic (micro-units per day): is this event type growing or
    fading?

    Days with no events are REAL zeros, not gaps: the x-moments over
    the full [first_day, last_day] range are closed forms
    (Sx = n(n−1)/2, Sxx = n(n−1)(2n−1)/6 with x normalized to 0..n−1),
    so absent days never need materializing — they contribute nothing
    to Sy/Sxy and the closed forms carry the rest.  slope =
    (n·Sxy − Sx·Sy) / (n·Sxx − Sx²), emitted as the exact integer
    ``10^6 · num div den``.

    Scale shape: one map-side-combined groupBy((group, day)) over the
    fact table, one tiny per-group rollup, and the 1-row global day
    range broadcast back — no calendar join, no window."""
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div {24 * 3600 * 1_000_000}"
    )
    daily = (
        events.groupBy(F.col(group_col).alias("g"), day.alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    rng = daily.agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    )
    per = (
        daily.crossJoin(F.broadcast(rng))
        .select(
            "g", "y", (F.col("d") - F.col("lo")).alias("x"),
            (F.col("hi") - F.col("lo") + 1).alias("n"),
        )
        .groupBy("g", "n")
        .agg(
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        )
    )
    sx = F.expr("(n * (n - 1)) div 2")
    sxx = F.expr("(n * (n - 1) * (2 * n - 1)) div 6")
    tmp = per.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n_days"),
        F.col("sy").alias("sum_y"),
        (F.col("n") * F.col("sxy") - sx * F.col("sy"))
        .cast("long").alias("num"),
        (F.col("n") * sxx - sx * sx).cast("long").alias("den"),
    )
    return tmp.select(
        group_col, "n_days", "sum_y",
        F.when(F.col("den") > 0, F.expr("(1000000 * num) div den"))
        .cast("long").alias("slope_micros"),
    )


def dau_wau(
    events: DataFrame,
    unit_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """(day, dau, wau, stickiness_micros) — daily active units, rolling
    ``window_days`` active units, and the DAU/WAU stickiness ratio in
    exact integer micro-units, for every day in the data's range.

    The rolling distinct is NOT a window over raw events: the (day,
    unit) presence table is deduplicated first (one combined groupBy),
    then each presence row fans out to the ``window_days`` days it
    supports (one explode of a literal-sized sequence) and a second
    combined distinct-count per day absorbs overlaps.  State is
    presence-rows × window_days — never events × window_days — and no
    per-day self-join or global window appears.  Days inside the range
    with zero activity still surface (dau 0) via the day spine joined
    from the 1-row range broadcast."""
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp))"
        f" div {24 * 3600 * 1_000_000}"
    )
    pres = (
        events.select(day.alias("d"), F.col(unit_col).alias("u"))
        .distinct()
    )
    dau = pres.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    support = pres.select(
        F.explode(
            F.sequence(F.col("d"), F.col("d") + (window_days - 1))
        ).alias("d"),
        "u",
    )
    wau = support.groupBy("d").agg(
        F.countDistinct("u").cast("long").alias("wau")
    )
    rng = pres.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d")
    )
    return (
        spine.join(dau, "d", "left")
        .join(wau, "d", "left")
        .select(
            F.col("d").alias("day"),
            F.coalesce("dau", F.lit(0)).cast("long").alias("dau"),
            F.coalesce("wau", F.lit(0)).cast("long").alias("wau"),
            F.when(
                F.coalesce("wau", F.lit(0)) > 0,
                F.expr("(1000000 * coalesce(dau, 0)) div wau"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("stickiness_micros"),
        )
    )


def activity_gini(
    events: DataFrame,
    unit_col: str = "user_id",
) -> DataFrame:
    """One row (n_units, total_events, gini_micros) — the Gini
    coefficient of per-unit activity, the inequality readout of a
    traffic/contribution distribution (0 = uniform, →1 = one unit does
    everything), via the exact rank-sum identity over counts sorted
    ascending with 1-based rank i:

        G = (2·Σ i·x_i) / (n·Σ x) − (n + 1) / n

    emitted as ``gini_micros = (10^6·(2·Σi·x_i − Σx)) div (n·Σx)
    − 10^6``  — a single exact integer expression (the two terms share
    the common denominator n·Σx: G = (2Σix − (n+1)Σx) / (nΣx), and
    10^6·that is computed with one BIGINT div; ties are rank-order
    independent within equal x, so the tie-break by unit id changes
    nothing).

    Scale shape: one combined count per unit, then the repo's
    distributed dense-id rank (one range shuffle + a P-row collect —
    never a single-partition window), one grouped sum."""
    from graphlite_spark.plans.derive import assign_dense_ids

    cnts = events.groupBy(F.col(unit_col).alias("u")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    ranked = assign_dense_ids(cnts, ["x", "u"], id_col="r")
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("x").cast("long").alias("total_events"),
        F.sum((F.col("r") + 1) * F.col("x")).cast("long").alias("six"),
    ).select(
        "n_units",
        "total_events",
        F.expr(
            "(1000000 * (2 * six - (n_units + 1) * total_events))"
            " div (n_units * total_events)"
        )
        .cast("long")
        .alias("gini_micros"),
    )


def user_type_entropy(
    events: DataFrame,
    unit_col: str = "user_id",
    group_col: str = "event_type",
) -> DataFrame:
    """(user_id, n_events, n_types, entropy_micros) — the Shannon
    entropy of each unit's activity mix in nats (0 = single-type,
    ln(k) = uniform over k types): the behavioral-diversity signal a
    segmentation or bot-detection pass reads.

    Float discipline: the per-(unit, type) term ``-p·ln p`` is ONE
    identical expression on both engines, rounded to integer micros
    PER TERM, then summed exactly — no float-summation-order
    dependence ever reaches the aggregate (the repo-wide rule).

    Scale shape: two map-side-combined groupBys (unit×type counts,
    then per-unit totals joined back on the unit key)."""
    cnts = events.groupBy(
        F.col(unit_col).alias("u"), F.col(group_col).alias("g")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    totals = cnts.groupBy("u").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    p = F.col("c").cast("double") / F.col("n").cast("double")
    term = F.round(-(p * F.log(p)) * 1_000_000).cast("long")
    return (
        cnts.join(totals, "u")
        .groupBy(
            F.col("u").alias(unit_col),
            F.col("n").alias("n_events"),
            "n_types",
        )
        .agg(F.sum(term).cast("long").alias("entropy_micros"))
    )


def text_type_token_ratio(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, n_types, ttr_micros) — type-token ratio per
    document (lexical diversity: 10^6 = every token distinct, low =
    repetitive), the standard corpus-quality signal next to the
    repetition and LM-cost filters.  Uses the repo tokenizer
    (lowercase, whitespace runs, empties dropped); the ratio is one
    exact BIGINT div.

    Scale shape: one explode + one combined groupBy per doc — token
    state never leaves the doc's rows."""
    from graphlite_spark.functions.text import tokens_expr

    toks = docs.select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("t")
    )
    return (
        toks.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.countDistinct("t").cast("long").alias("n_types"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_types",
            F.expr("(1000000 * n_types) div n_tokens")
            .cast("long")
            .alias("ttr_micros"),
        )
    )


def user_burstiness(
    events: DataFrame,
    unit_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, n_gaps, sum_gap_s, burstiness) — the Goh–Barabási
    burstiness of each unit's inter-event times, B = (σ−μ)/(σ+μ)
    (−1 = perfectly regular, 0 = Poisson, →1 = bursty), computed from
    exact integer moments: with gaps in whole SECONDS (headroom: the
    BIGINT r = n·Σg² − (Σg)² needs n·range_s² < 2^63 — 10^6 gaps over
    a 30-year range still fit), n cancels out of the ratio:

        B = (√r − Σg) / (√r + Σg)

    one sqrt + one divide, identical IEEE ops on both engines, rounded
    6dp; NULL when every gap is zero (σ = μ = 0).

    Shape: one per-unit lag window (partitioned by the unit, never
    global) + one combined groupBy."""
    gaps = (
        events.select(
            unit_col,
            "event_id",
            F.expr(
                f"(unix_micros(cast({ts_col} as timestamp))"
                f" - lag(unix_micros(cast({ts_col} as timestamp)))"
                f" over (partition by {unit_col}"
                f" order by unix_micros(cast({ts_col} as timestamp)),"
                " event_id)) div 1000000"
            ).alias("g"),
        )
        .where(F.col("g").isNotNull())
    )
    agg = gaps.groupBy(unit_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("g").cast("long").alias("s1"),
        F.sum(F.col("g") * F.col("g")).cast("long").alias("s2"),
    )
    r = (F.col("n_gaps") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
        "double"
    )
    b = F.round(
        (F.sqrt(r) - F.col("s1").cast("double"))
        / (F.sqrt(r) + F.col("s1").cast("double")),
        6,
    )
    return agg.select(
        unit_col,
        "n_gaps",
        F.col("s1").alias("sum_gap_s"),
        F.when(
            (F.col("s1") > 0)
            | (F.col("n_gaps") * F.col("s2") - F.col("s1") * F.col("s1") > 0),
            b,
        ).alias("burstiness"),
    )


def daily_anomaly(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    window: int = 7,
) -> DataFrame:
    """(group, day, y, z) — each day's event count scored against the
    TRAILING ``window`` days' mean/std (sample variance), per group:
    the ops-dashboard anomaly readout.  Absent days are real zeros (a
    day spine per group guarantees consecutive rows, so the trailing
    ROWS frame is a trailing DAYS frame); z is NULL until a full
    window exists or when the window is flat (zero variance).

    Exactness: the window sums are exact BIGINTs; z is the identical
    (div, sqrt, div) chain on both engines over those integers,
    rounded 6dp.

    Scale shape: one map-side-combined (group, day) count, a
    spine×groups frame that is day-grain tiny at ANY event volume,
    and one per-group ordered window over that tiny frame."""
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp))"
        f" div {24 * 3600 * 1_000_000}"
    )
    daily = events.groupBy(
        F.col(group_col).alias("g"), day.alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    rng = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = (
        rng.select(
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
        )
        .crossJoin(F.broadcast(daily.select("g").distinct()))
    )
    full = spine.join(daily, ["g", "day"], "left").select(
        "g", "day", F.coalesce("y", F.lit(0)).cast("long").alias("y")
    )
    w = (
        Window.partitionBy("g")
        .orderBy("day")
        .rowsBetween(-window, -1)
    )
    stats = full.select(
        "g",
        "day",
        "y",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("y").over(w).cast("long").alias("s1"),
        F.sum(F.col("y") * F.col("y")).over(w).cast("long").alias("s2"),
    )
    r = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
        "double"
    )
    z = F.round(
        ((F.col("n") * F.col("y") - F.col("s1")).cast("double") / F.col("n"))
        / F.sqrt(r / (F.col("n") * (F.col("n") - 1))),
        6,
    )
    return stats.select(
        F.col("g").alias(group_col),
        "day",
        "y",
        F.when(
            (F.col("n") == window)
            & (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1") > 0),
            z,
        ).alias("z"),
    )


def pareto_concentration(
    events: DataFrame,
    unit_col: str = "user_id",
    num_den: tuple = (4, 5),
    bucket_size: int = 4096,
) -> DataFrame:
    """One row (n_units, total_events, k_units, unit_share_micros) —
    the Pareto/80-20 readout: the MINIMUM number of heaviest units
    covering ``num/den`` (default 4/5) of all events, found by an
    exact DISTRIBUTED ordered prefix-sum (the pattern a naive
    implementation writes as one global cumsum window — a
    single-partition sort at scale):

    1. per-unit counts, ranked descending by the distributed dense-id
       machinery (range shuffle, no global window);
    2. rank buckets of ``bucket_size``; per-bucket sums; the running
       bucket prefix is a window over n/bucket_size SUMMARY rows
       (bucket-grain — 1e9 units at B=4096 is a 244k-row summary,
       partition-safe and documented);
    3. each unit's cumulative = its bucket's exclusive prefix + an
       IN-BUCKET window (partitioned by bucket — never global);
    4. the crossing is the exact integer test ``cum · den ≥ num ·
       total`` — no floats anywhere until the final share ratio."""
    from graphlite_spark.plans.derive import assign_dense_ids

    num, den = num_den
    cnts = events.groupBy(F.col(unit_col).alias("u")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    ranked = assign_dense_ids(
        cnts.withColumn("neg_x", -F.col("x")), ["neg_x", "u"], id_col="r"
    )
    b = ranked.withColumn("bucket", F.expr(f"r div {bucket_size}"))
    bsum = b.groupBy("bucket").agg(F.sum("x").cast("long").alias("bs"))
    wb = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = bsum.select(
        "bucket",
        F.coalesce(F.sum("bs").over(wb), F.lit(0))
        .cast("long")
        .alias("before"),
    )
    win = Window.partitionBy("bucket").orderBy("r")
    cum = (
        b.join(F.broadcast(prefix), "bucket")
        .withColumn(
            "cum",
            (F.col("before") + F.sum("x").over(win)).cast("long"),
        )
    )
    total = cnts.agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("x").cast("long").alias("total_events"),
    )
    k = (
        cum.crossJoin(F.broadcast(total))
        .where(F.col("cum") * den >= F.col("total_events") * num)
        .agg(F.min("r").alias("rmin"))
    )
    return (
        k.crossJoin(F.broadcast(total))
        .select(
            "n_units",
            "total_events",
            (F.col("rmin") + 1).cast("long").alias("k_units"),
            F.expr("(1000000 * (rmin + 1)) div n_units")
            .cast("long")
            .alias("unit_share_micros"),
        )
    )


def hotset_churn(
    events: DataFrame,
    key_col: str = "user_id",
    k: int = 20,
    ts_col: str = "ts",
) -> DataFrame:
    """(day, n_top, n_prev, n_common, jaccard) — day-over-day churn of
    the top-``k`` hot keys: each day's top-k (by event count, ties
    (count DESC, key ASC)) Jaccard-compared to the PREVIOUS day's.  The
    cache-/shard-stability readout: a hot set that churns daily means
    yesterday's placement (cache warm set, skew salting list, broadcast
    hot-key list) is stale tomorrow — the operational number behind
    every "precompute the heavy hitters" design.

    Exactness: integer counts everywhere; jaccard is ONE rounded
    division of exact BIGINTs (NULL when no previous-day set exists —
    stated, the first day and gap days report honestly).

    Scale shape: one map-side-combined (day, key) count, one per-day
    WindowGroupLimit top-k (never a global window), then all comparison
    joins run on the k·days-row TOP table — day-grain tiny at any
    event volume."""
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp))"
        f" div {24 * 3600 * 1_000_000}"
    )
    counts = events.groupBy(
        day.alias("day"), F.col(key_col).alias("key")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("day").orderBy(
        F.col("n").desc(), F.col("key").asc()
    )
    top = (
        counts.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= k)
        .select("day", "key")
    )
    sizes = top.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_top")
    )
    prev = top.select((F.col("day") + 1).alias("day"), "key")
    com = top.join(prev, ["day", "key"]).groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_common")
    )
    psz = sizes.select(
        (F.col("day") + 1).alias("day"), F.col("n_top").alias("n_prev")
    )
    return (
        sizes.join(psz, "day", "left")
        .join(com, "day", "left")
        .select(
            "day",
            "n_top",
            F.coalesce("n_prev", F.lit(0)).cast("long").alias("n_prev"),
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            F.when(
                F.col("n_prev").isNotNull(),
                F.round(
                    F.coalesce("n_common", F.lit(0)).cast("double")
                    / (
                        F.col("n_top")
                        + F.col("n_prev")
                        - F.coalesce("n_common", F.lit(0))
                    ),
                    6,
                ),
            ).alias("jaccard"),
        )
    )


def cusum_changepoint(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(group, n_days, total, cp_day, cusum_abs_micros) — CUSUM
    change-point detection per group (Page 1954, public literature):
    over the zero-filled day spine, S_d = Σ_{d'≤d} (y_d' − ȳ), and the
    estimated change-point is the day maximizing |S_d| (earliest day on
    ties).  The complement of :func:`daily_anomaly`: the z-score flags
    single-day spikes, CUSUM finds the SUSTAINED level shift (a source
    turning off, a bot cohort arriving) that never trips a per-day
    threshold.

    Exactness: ȳ rides as the exact-ratio micro mean, so every prefix
    statistic is the exact BIGINT ``10⁶·prefix_sum − d·mean_micros`` —
    no float anywhere; the argmax is a deterministic
    (|S| DESC, day ASC) pick.

    Scale shape: one map-side-combined (group, day) count, the
    daily_anomaly day-grain spine, one per-group ordered prefix window
    over that tiny frame, one per-group argmax."""
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp))"
        f" div {24 * 3600 * 1_000_000}"
    )
    daily = events.groupBy(
        F.col(group_col).alias("g"), day.alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    rng = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = (
        rng.select(
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
        )
        .crossJoin(F.broadcast(daily.select("g").distinct()))
    )
    full = spine.join(daily, ["g", "day"], "left").select(
        "g", "day", F.coalesce("y", F.lit(0)).cast("long").alias("y")
    )
    totals = full.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("y").cast("long").alias("total"),
    ).select(
        "g",
        "n_days",
        "total",
        F.expr(
            "(1000000 * total - (1000000 * total) % n_days) div n_days"
        ).cast("long").alias("mean_micros"),
    )
    w = (
        Window.partitionBy("g")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pref = full.select(
        "g",
        "day",
        F.sum("y").over(w).cast("long").alias("ps"),
        F.row_number().over(
            Window.partitionBy("g").orderBy("day")
        ).cast("long").alias("d_idx"),
    )
    s = pref.join(totals, "g").select(
        "g",
        "n_days",
        "total",
        "day",
        F.abs(
            F.lit(1000000) * F.col("ps")
            - F.col("d_idx") * F.col("mean_micros")
        ).cast("long").alias("sabs"),
    )
    wmax = Window.partitionBy("g").orderBy(
        F.col("sabs").desc(), F.col("day").asc()
    )
    return (
        s.withColumn("r", F.row_number().over(wmax))
        .where(F.col("r") == 1)
        .select(
            F.col("g").alias(group_col),
            "n_days",
            "total",
            F.col("day").alias("cp_day"),
            F.col("sabs").alias("cusum_abs_micros"),
        )
    )


def error_rate_by_activity(
    events: DataFrame,
    error_type: str = "error",
    unit_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(bucket, n_units, n_events, n_errors, error_micros) — error rate
    by user-activity magnitude: units bucketed by floor(log2(events))+1
    (the binary length of their event count — ``length(bin(n))``, which
    renders identically in both engines, the HLL register trick), then
    the exact-ratio error share per bucket.  The reliability-equity
    readout: do heavy users hit disproportionate failures (rate limits,
    state bloat) or do casual users (cold caches, onboarding bugs)?
    Magnitude buckets keep the output log-sized no matter how skewed
    activity is — the same reason degree histograms bucket by powers.

    Exactness: pure integer counts + one exact-ratio subtract-the-
    remainder division per bucket.

    Scale shape: one map-side-combined per-unit aggregate (count +
    conditional error count in the SAME pass), one log-sized bucket
    aggregate — the dispersion_index double-aggregation shape."""
    per = events.groupBy(F.col(unit_col).alias("u")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(F.col(type_col) == error_type, 1).otherwise(0)
        ).cast("long").alias("errs"),
    )
    return (
        per.withColumn("bucket", F.expr("length(bin(n))").cast("long"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_units"),
            F.sum("n").cast("long").alias("n_events"),
            F.sum("errs").cast("long").alias("n_errors"),
        )
        .select(
            "bucket",
            "n_units",
            "n_events",
            "n_errors",
            F.expr(
                "(1000000 * n_errors - (1000000 * n_errors) % n_events)"
                " div n_events"
            ).cast("long").alias("error_micros"),
        )
    )


def mutual_information(
    df: DataFrame,
    col_x: str,
    col_y: str,
) -> DataFrame:
    """(x, y, n, pmi_micros, mi_contrib_micros) — the pointwise mutual
    information of every observed (x, y) cell and its contribution
    p(x,y)·ln(p(x,y)/(p(x)p(y))) to the total mutual information
    I(X;Y) = Σ contributions.  The categorical-dependence screen: is
    `lang` independent of `source` (MI ≈ 0 — mixtures are balanced) or
    does one source carry one language (MI → H(lang) — stratify before
    sampling)?  Complements the pairwise source_jsd (distribution
    distance) with a single dependence decomposition.

    Exactness: all counts are exact BIGINTs; the two float expressions
    (one ln over an exact integer ratio, one scaled contribution) are
    structured identically on both engines and rounded once to micros.
    PMI can be negative (co-avoidance); HALF_UP rounding is
    away-from-zero on both engines for negatives too.

    Scale shape: one joint groupBy (map-side combined), two
    cell-count-sized marginal aggregates broadcast back onto the joint
    table, N folded in as a literal from a 1-row action.  Output is
    |X|·|Y| cells — screen-sized by construction.  At >>1e9 rows the
    n·N BIGINT product approaches 2^63 — lift the ln argument to DOUBLE
    there (ln is insensitive to the last ulp; the micros round absorbs
    it)."""
    joint = df.groupBy(
        F.col(col_x).alias("x"), F.col(col_y).alias("y")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    n_total = int(joint.agg(F.sum("n")).collect()[0][0] or 0)
    mx = joint.groupBy("x").agg(F.sum("n").cast("long").alias("nx"))
    my = joint.groupBy("y").agg(F.sum("n").cast("long").alias("ny"))
    j = joint.join(F.broadcast(mx), "x").join(F.broadcast(my), "y")
    arg = (F.col("n") * F.lit(n_total)) / (F.col("nx") * F.col("ny"))
    return j.select(
        "x",
        "y",
        "n",
        F.round(F.lit(1_000_000.0) * F.log(arg), 0)
        .cast("long")
        .alias("pmi_micros"),
        F.round(
            F.lit(1_000_000.0) * F.col("n") * F.log(arg) / F.lit(n_total), 0
        )
        .cast("long")
        .alias("mi_contrib_micros"),
    )


def kaplan_meier(
    events: DataFrame,
    unit_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(duration_days, n_risk, n_deaths, survival_micros) — the
    Kaplan–Meier product-limit survival estimate (Kaplan & Meier 1958,
    public literature) of unit lifetime, with right-censoring at the
    observation horizon: a unit's lifetime is last-active-day minus
    first-active-day, and units whose last activity falls on the
    corpus's final day are CENSORED (still alive as far as the data can
    tell), not dead.  S(t) = Π_{t_i <= t} (1 − d_i/n_i) over the
    distinct death times, in exact integer micro-units with per-step
    truncating division — the standard churn readout next to
    :func:`retention_cohorts` (which counts raw activity, not
    lifetimes).

    Exactness: the fold ``s ← (s·(n_i−d_i)) div n_i`` starts at 10^6
    and shrinks monotonically, so every product is < 10^6·N — exact in
    a double's 53-bit mantissa up to N ≈ 9·10^9 units (stated bound;
    the remainder-subtract division is therefore exact, same discipline
    as :func:`~graphlite_spark.functions.text.repetition_exprs`).

    Scale shape: one map-side-combined per-unit aggregate over the fact
    table and a 1-row horizon broadcast; everything after lives on the
    duration-level table, whose size is bounded by the CALENDAR (one
    row per distinct lifetime-in-days), so the ordered at-risk window
    and the single collected step array are day-granularity small at
    any event scale.  No per-unit window, no self-join."""
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
    )
    per = events.groupBy(F.col(unit_col).alias("u")).agg(
        F.min(day).alias("first_d"), F.max(day).alias("last_d")
    )
    hi = events.agg(F.max(day).alias("hi"))
    lives = per.crossJoin(F.broadcast(hi)).select(
        (F.col("last_d") - F.col("first_d")).alias("t"),
        (F.col("last_d") == F.col("hi")).cast("int").alias("censored"),
    )
    durs = lives.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum(F.lit(1) - F.col("censored")).cast("long").alias("d"),
    )
    # at-risk = units with lifetime >= t: running sum over the
    # duration-level table, descending — calendar-bounded rows, so the
    # unpartitioned window is a non-issue at any scale (stated above)
    wd = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = durs.select(
        "t", "d", F.sum("c").over(wd).cast("long").alias("n")
    ).where(F.col("d") > 0)
    arr = risk.groupBy().agg(
        F.sort_array(
            F.collect_list(F.struct("t", "d", "n"))
        ).alias("arr")
    )
    # prefix products: stage `arr` as its own projection (Column reuse
    # inlines trees — CLAUDE.md), then fold each prefix; O(k^2) lambda
    # work over k = distinct death days (calendar-bounded)
    steps = arr.select(
        F.explode(
            F.transform(
                F.col("arr"),
                lambda x, i: F.struct(
                    x["t"].alias("t"),
                    x["n"].alias("n"),
                    x["d"].alias("d"),
                    F.aggregate(
                        F.slice(F.col("arr"), F.lit(1), i + 1),
                        F.lit(1_000_000).cast("long"),
                        lambda acc, y: (
                            (
                                acc * (y["n"] - y["d"])
                                - (acc * (y["n"] - y["d"])) % y["n"]
                            )
                            / y["n"]
                        ).cast("long"),
                    ).alias("s"),
                ),
            )
        ).alias("st")
    )
    return steps.select(
        F.col("st.t").alias("duration_days"),
        F.col("st.n").alias("n_risk"),
        F.col("st.d").alias("n_deaths"),
        F.col("st.s").alias("survival_micros"),
    )


def rfm_segments(
    events: DataFrame,
    unit_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    buckets: int = 4,
) -> DataFrame:
    """(r_quartile, f_quartile, m_quartile, n_users, sum_events,
    sum_monetary_cents) — classic RFM segmentation: each unit's Recency
    (days since last activity), Frequency (event count), and Monetary
    (integer-cents value sum, same rounding convention as
    :func:`value_outliers_mad`) are each bucketed into ``buckets``
    rank quantiles, and the segment lattice is counted.

    The bucket rule is the closed form ``((rank−1)·B) div N + 1`` over
    the unique rank of (metric, unit) — NOT SQL ``ntile`` (whose
    remainder distribution differs); the same form computes on both
    engines, and ranks come from the distributed
    :func:`~graphlite_spark.plans.derive.assign_dense_ids` machinery
    (range shuffle + offsets), never a single-partition global window —
    three rank passes over the N-row per-unit table, then one
    segment-lattice groupBy (≤ B^3 rows)."""
    from graphlite_spark.plans.derive import assign_dense_ids

    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
    )
    per = events.groupBy(F.col(unit_col).alias("u")).agg(
        F.max(day).alias("last_d"),
        F.count(F.lit(1)).cast("long").alias("f"),
        F.sum(
            F.round(F.col(value_col) * 100).cast("long")
        ).cast("long").alias("m"),
    )
    hi = events.agg(F.max(day).alias("hi"))
    per = per.crossJoin(F.broadcast(hi)).select(
        "u", (F.col("hi") - F.col("last_d")).cast("long").alias("r"),
        "f", "m",
    )
    n = per.count()
    if n == 0:
        return events.sparkSession.createDataFrame(
            [],
            "r_quartile int, f_quartile int, m_quartile int,"
            " n_users long, sum_events long, sum_monetary_cents long",
        )

    def bucket(metric: str, out: str) -> DataFrame:
        ranked = assign_dense_ids(
            per.select(F.col(metric).alias("x"), "u"), ["x", "u"],
            id_col="rk",
        )
        return ranked.select(
            "u",
            (
                F.expr(f"(rk * {buckets}) div {n}") + 1
            ).cast("int").alias(out),
        )

    seg = (
        per.join(bucket("r", "r_quartile"), "u")
        .join(bucket("f", "f_quartile"), "u")
        .join(bucket("m", "m_quartile"), "u")
    )
    return seg.groupBy("r_quartile", "f_quartile", "m_quartile").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("f").cast("long").alias("sum_events"),
        F.sum("m").cast("long").alias("sum_monetary_cents"),
    )


def acf_daily(
    events: DataFrame,
    max_lag: int = 7,
    ts_col: str = "ts",
) -> DataFrame:
    """(lag, n_days, acf_micros) — the sample autocorrelation of the
    DAILY event-count series at lags 1..``max_lag``, exact to the
    truncated micro: is traffic periodic (weekly seasonality shows as a
    lag-7 peak) or memoryless?  Days with no events are REAL zeros via
    the day spine (same device as :func:`dau_wau`), and the classic
    estimator r_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)² is computed on
    the n²-scaled integer deviations ``dev_t = n·x_t − S`` (both sums
    pick up the same n² factor, which cancels) so no float or rational
    mean ever appears.

    Exactness: dev products stay within BIGINT for any single-digit-
    billions daily volume; the one place the 10^6 scaling could
    overflow (num·10^6 with num ≈ 10^13 at very large n·x) rides
    DECIMAL(38,0) `div` on Spark and HUGEINT `//` on DuckDB — measured
    identical truncation toward zero, including negatives.

    Scale shape: one map-side-combined daily groupBy over the facts;
    the spine, deviations, lag join (equi-join on shifted day), and
    moment sums all live on the calendar-bounded daily table."""
    daily = events.groupBy(
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    rng = daily.agg(
        F.min("d").alias("lo"), F.max("d").alias("hi"),
        F.sum("y").cast("long").alias("s"),
    )
    spine = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d"),
        (F.col("hi") - F.col("lo") + 1).cast("long").alias("n"),
        "s",
    )
    dev = (
        spine.join(daily, "d", "left")
        .select(
            "d",
            (
                F.col("n") * F.coalesce(F.col("y"), F.lit(0))
                - F.col("s")
            ).cast("long").alias("dev"),
            "n",
        )
    )
    den = dev.agg(
        F.sum(F.col("dev") * F.col("dev")).cast("long").alias("den"),
        F.max("n").alias("n"),
    )
    pairs = dev.select(
        F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag"),
        "d",
        F.col("dev").alias("dev_a"),
    ).select(
        "lag", (F.col("d") + F.col("lag")).alias("d2"), "dev_a"
    )
    num = (
        pairs.join(
            dev.select(F.col("d").alias("d2"), F.col("dev").alias("dev_b")),
            "d2",
        )
        .groupBy("lag")
        .agg(
            F.sum(F.col("dev_a") * F.col("dev_b"))
            .cast("long").alias("num")
        )
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            F.col("lag").cast("int").alias("lag"),
            F.col("n").alias("n_days"),
            F.when(
                F.col("den") > 0,
                F.expr(
                    "CAST((CAST(num AS DECIMAL(38,0)) * 1000000)"
                    " div CAST(den AS DECIMAL(38,0)) AS BIGINT)"
                ),
            ).alias("acf_micros"),
        )
    )


def ewma_daily(
    events: DataFrame,
    alpha_num: int = 1,
    alpha_den: int = 4,
    ts_col: str = "ts",
) -> DataFrame:
    """(d, y, ewma_micros, resid_micros) — exponentially weighted
    moving average of the zero-filled DAILY count series with rational
    α = ``alpha_num/alpha_den`` (default 1/4), exact to the truncated
    micro: s_0 = 10^6·y_0 and
    ``s_t = (num·10^6·y_t + (den−num)·s_{t−1}) div den`` — the
    one-step-ahead forecast baseline whose residual
    ``10^6·y_t − s_{t−1}`` (NULL at t=0) is the surprise signal next
    to :func:`daily anomaly z-scores <...>` and CUSUM, but with
    recency weighting neither of those has.

    Scale shape: one map-side-combined daily groupBy over the facts;
    the fold runs over the single collected calendar-bounded day array
    (same device as :func:`kaplan_meier` — O(k²) prefix lambdas over
    k = calendar days).  Exactness: 10^6·y ≤ 2^53 for up to ~9·10^9
    events/day, and each fold step is remainder-subtract division."""
    if not (0 < alpha_num < alpha_den):
        raise ValueError("alpha must be a proper positive fraction")
    daily = events.groupBy(
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    rng = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d")
    )
    filled = spine.join(daily, "d", "left").select(
        "d", F.coalesce(F.col("y"), F.lit(0)).cast("long").alias("y")
    )
    arr = filled.groupBy().agg(
        F.sort_array(F.collect_list(F.struct("d", "y"))).alias("arr")
    )
    a, b = alpha_num, alpha_den - alpha_num

    def step(acc, x):
        raw = (
            F.lit(a).cast("long") * F.lit(1_000_000) * x["y"]
            + F.lit(b).cast("long") * acc
        )
        return (
            (raw - raw % F.lit(alpha_den)) / F.lit(alpha_den)
        ).cast("long")

    steps = arr.select(
        F.explode(
            F.transform(
                F.col("arr"),
                lambda x, i: F.struct(
                    x["d"].alias("d"),
                    x["y"].alias("y"),
                    F.aggregate(
                        F.slice(F.col("arr"), F.lit(2), i),
                        F.element_at(F.col("arr"), 1)["y"]
                        * F.lit(1_000_000).cast("long"),
                        step,
                    ).alias("s"),
                    F.when(
                        i > 0,
                        x["y"] * F.lit(1_000_000).cast("long")
                        - F.aggregate(
                            F.slice(F.col("arr"), F.lit(2), i - 1),
                            F.element_at(F.col("arr"), 1)["y"]
                            * F.lit(1_000_000).cast("long"),
                            step,
                        ),
                    ).alias("r"),
                ),
            )
        ).alias("st")
    )
    return steps.select(
        F.col("st.d").alias("d"),
        F.col("st.y").alias("y"),
        F.col("st.s").alias("ewma_micros"),
        F.col("st.r").alias("resid_micros"),
    )


def dow_seasonality(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """(dow, n_days, sum_events, mean_daily_micros, dev_micros) — the
    day-of-week seasonality profile of the zero-filled daily count
    series: mean events per calendar day for each weekday (0 = Monday;
    epoch day 0 was a Thursday, hence ``(d + 3) % 7``), and its exact
    micro deviation from the all-days mean — the direct readout of the
    weekly cycle :func:`acf_daily`'s lag-7 peak only hints at.

    Exactness: both means are truncating micro divisions of exact
    BIGINT sums; the deviation is their plain difference (may be
    negative — Spark ``div`` and DuckDB ``//`` both truncate toward
    zero, measured).  Scale shape: one map-side-combined daily groupBy,
    then everything lives on the calendar-bounded spine."""
    daily = events.groupBy(
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    rng = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    filled = (
        rng.select(
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d")
        )
        .join(daily, "d", "left")
        .select(
            ((F.col("d") + 3) % 7).cast("int").alias("dow"),
            F.coalesce(F.col("y"), F.lit(0)).cast("long").alias("y"),
        )
    )
    tot = filled.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("y").cast("long").alias("sy"),
    )
    per = filled.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("y").cast("long").alias("sum_events"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "dow", "n_days", "sum_events",
        F.expr("(1000000 * sum_events) div n_days")
        .cast("long").alias("mean_daily_micros"),
        (
            F.expr("(1000000 * sum_events) div n_days")
            - F.expr("(1000000 * sy) div nd")
        ).cast("long").alias("dev_micros"),
    )


def cohort_ltv(events: DataFrame) -> DataFrame:
    """(cohort_week, week_offset, n_users, sum_cents, cum_cents) — the
    lifetime-value triangle: :func:`retention_cohorts`'s money sibling.
    Users join the cohort of their first active week; each event's
    integer cents (same rounding as :func:`value_outliers_mad`) land in
    (cohort, event week − cohort week), and ``cum_cents`` accumulates
    along each cohort's offset axis — the curve whose plateau is the
    cohort's LTV.

    Scale shape: one per-user first-week aggregate, one equi-join back
    to the facts, one map-side-combined (cohort, offset) groupBy; the
    running sum's window is per-cohort over offsets — calendar-bounded
    partitions, never a global sort."""
    wk = events.select(
        "user_id",
        F.expr(f"unix_micros(cast(ts as timestamp)) div {WEEK_US}")
        .alias("week"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cohort = wk.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    per = (
        wk.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per.select(
        "cohort_week", "week_offset", "n_users", "sum_cents",
        F.sum("sum_cents").over(w).cast("long").alias("cum_cents"),
    )


def audience_overlap_exact(
    events: DataFrame,
    group_col: str = "event_type",
    unit_col: str = "user_id",
) -> DataFrame:
    """(g_a, g_b, n_a, n_b, n_inter, n_union, jaccard_micros) — EXACT
    audience overlap for every group pair (a < b): the ground truth the
    KMV / HLL audience-overlap sketches estimate, kept exact here so
    sketch error is a measurable number, not a hope.

    Scale shape: the (unit, group) presence table is deduplicated once
    (map-side combined); the pair intersection is a presence self-join
    on the unit key — fan-out per unit is C(|groups touched|, 2),
    bounded by the square of the GROUP-alphabet (codebook-sized), never
    by activity volume.  Union and Jaccard are closed forms on the
    counts."""
    pres = (
        events.select(
            F.col(unit_col).alias("u"), F.col(group_col).alias("g")
        )
        .distinct()
    )
    sizes = pres.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    inter = (
        pres.join(pres.withColumnRenamed("g", "g2"), "u")
        .where(F.col("g") < F.col("g2"))
        .groupBy(
            F.col("g").alias("g_a"), F.col("g2").alias("g_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    j = (
        inter.join(
            sizes.select(F.col("g").alias("g_a"), F.col("sz").alias("n_a")),
            "g_a",
        )
        .join(
            sizes.select(F.col("g").alias("g_b"), F.col("sz").alias("n_b")),
            "g_b",
        )
        .select(
            "g_a", "g_b", "n_a", "n_b", "n_inter",
            (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            .cast("long").alias("n_union"),
        )
    )
    return j.select(
        "g_a", "g_b", "n_a", "n_b", "n_inter", "n_union",
        F.expr("(1000000 * n_inter) div n_union")
        .cast("long").alias("jaccard_micros"),
    )


def ab_conversion_ztest(
    events: DataFrame,
    cohort_type: str = "signup",
    convert_type: str = "purchase",
    unit_col: str = "user_id",
) -> DataFrame:
    """(n_a, conv_a, n_b, conv_b, rate_a, rate_b, z) — the two-
    proportion z-test between the cohort of units that ever emitted
    ``cohort_type`` (group A) and the rest (group B), on conversion =
    ever emitted ``convert_type``.  The pooled-variance z statistic

        z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b))

    is the one float expression, structured identically on both
    engines over exact BIGINT counts and rounded once to 6dp (the
    repo's float discipline); rates likewise.  NULL z when a group is
    empty or p̂ degenerate.

    Scale shape: ONE map-side-combined per-unit aggregate (two bool_or
    flags), then a single 4-count rollup — nothing after the first
    groupBy exceeds one row."""
    per = events.groupBy(F.col(unit_col).alias("u")).agg(
        F.max(
            (F.col("event_type") == cohort_type).cast("int")
        ).alias("a"),
        F.max(
            (F.col("event_type") == convert_type).cast("int")
        ).alias("c"),
    )
    agg = per.agg(
        F.sum("a").cast("long").alias("n_a"),
        F.sum(F.col("a") * F.col("c")).cast("long").alias("conv_a"),
        F.sum(1 - F.col("a")).cast("long").alias("n_b"),
        F.sum((1 - F.col("a")) * F.col("c")).cast("long").alias("conv_b"),
    )
    pa = F.col("conv_a") / F.col("n_a")
    pb = F.col("conv_b") / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    )
    z = (pa - pb) / F.sqrt(
        pp * (1 - pp) * (1 / F.col("n_a") + 1 / F.col("n_b"))
    )
    return agg.select(
        "n_a", "conv_a", "n_b", "conv_b",
        F.when(F.col("n_a") > 0, F.round(pa, 6)).alias("rate_a"),
        F.when(F.col("n_b") > 0, F.round(pb, 6)).alias("rate_b"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0)
            & (F.col("conv_a") + F.col("conv_b") > 0)
            & (F.col("conv_a") + F.col("conv_b")
               < F.col("n_a") + F.col("n_b")),
            F.round(z, 6),
        ).alias("z"),
    )


def mann_whitney_u(
    events: DataFrame,
    type_a: str = "purchase",
    type_b: str = "click",
    value_col: str = "value",
) -> DataFrame:
    """(n_a, n_b, u_a_x2, u_b_x2) — the Mann–Whitney U statistic
    comparing the ``value`` distributions of two event types, EXACT
    including ties: everything rides doubled rank sums (2·avg-rank of
    a tie group = 2·cum_before + cnt + 1, an integer), so
    ``u_a_x2 = 2·U_a`` and the identity ``u_a_x2 + u_b_x2 =
    2·n_a·n_b`` is checkable in BIGINTs — the nonparametric
    alternative to the t-test, no normality assumption, no float.

    Scale shape: one map-side-combined groupBy onto distinct integer
    cents (the VALUE alphabet, not the row count), one ordered
    cumulative window over that alphabet (bounded by distinct values —
    the same spillable-alphabet argument the quantile tier makes), and
    closed forms after."""
    cents = events.where(
        F.col("event_type").isin(type_a, type_b)
    ).select(
        (F.col("event_type") == type_a).cast("int").alias("is_a"),
        F.round(F.col(value_col) * 100).cast("long").alias("v"),
    )
    per = cents.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("is_a").cast("long").alias("cnt_a"),
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = per.select(
        "v", "cnt", "cnt_a",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("before"),
    )
    agg = ranked.agg(
        F.sum("cnt_a").cast("long").alias("n_a"),
        F.sum(F.col("cnt") - F.col("cnt_a")).cast("long").alias("n_b"),
        F.sum(
            F.col("cnt_a")
            * (2 * F.col("before") + F.col("cnt") + 1)
        ).cast("long").alias("r2a"),
    )
    return agg.select(
        "n_a", "n_b",
        (F.col("r2a") - F.col("n_a") * (F.col("n_a") + 1))
        .cast("long").alias("u_a_x2"),
        (
            2 * F.col("n_a") * F.col("n_b")
            - (F.col("r2a") - F.col("n_a") * (F.col("n_a") + 1))
        ).cast("long").alias("u_b_x2"),
    )


def burst_rate_max(
    events: DataFrame,
    window_seconds: int = 60,
    actor_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(max_burst, n_users) — rate-limit / abuse screening: for each
    unit, the maximum number of its events inside ANY trailing
    ``window_seconds`` window (a RANGE window over event-time seconds —
    the sliding-window count that a fixed bucketing understates when a
    burst straddles a boundary), histogrammed over units.  The
    burstiness CV readout says HOW uneven a unit is; this says the
    worst per-minute rate a limiter would have seen.

    Scale shape: one per-unit RANGE window (shuffle on the unit key,
    per-partition sort — the sessionize shape) and one codebook-sized
    histogram groupBy.  All counts exact BIGINTs."""
    sec = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div 1000000"
    )
    w = (
        Window.partitionBy("u")
        .orderBy("s")
        .rangeBetween(-(window_seconds - 1), 0)
    )
    per = (
        events.select(F.col(actor_col).alias("u"), sec.alias("s"))
        .withColumn("burst", F.count(F.lit(1)).over(w))
        .groupBy("u")
        .agg(F.max("burst").cast("long").alias("max_burst"))
    )
    return per.groupBy("max_burst").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


def hour_dow_heatmap(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """(dow, hour, n, share_micros) — the weekly activity heatmap:
    event counts per (epoch weekday (0 = Monday, same ``(d+3) % 7``
    convention as :func:`dow_seasonality`), UTC hour-of-day), with each
    cell's exact micro share of the total.  One map-side-combined
    groupBy over the facts; the share's denominator rides a 168-cell
    broadcast total."""
    cells = events.select(
        F.expr(
            f"cast((unix_micros(cast({ts_col} as timestamp))"
            f" div {DAY_US} + 3) % 7 as int)"
        ).alias("dow"),
        F.expr(
            f"cast((unix_micros(cast({ts_col} as timestamp))"
            f" div {3600 * 1_000_000}) % 24 as int)"
        ).alias("hour"),
    ).groupBy("dow", "hour").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = cells.agg(F.sum("n").cast("long").alias("t"))
    return cells.crossJoin(F.broadcast(tot)).select(
        "dow", "hour", "n",
        F.expr("(1000000 * n) div t").cast("long").alias("share_micros"),
    )


def events_cube(events: DataFrame) -> DataFrame:
    """(event_type, dow, gid, n, sum_value_micros) — the full CUBE
    lattice over (event_type, epoch weekday): per-cell rows, both
    one-axis marginals, and the grand total, tagged by the explicit
    grouping id (``grouping(event_type)·2 + grouping(dow)``) —
    :func:`events_rollup`'s complete-lattice sibling (ROLLUP emits the
    type-axis prefix only; CUBE adds the per-weekday marginal a
    dashboard actually asks for).  NULL keys coalesced to sentinels
    ('(all)' / -1) on both engines; money in per-row micro units.
    One shuffle — Spark expands grouping sets map-side."""
    src = events.select(
        "event_type",
        F.expr(
            f"cast((unix_micros(cast(ts as timestamp))"
            f" div {DAY_US} + 3) % 7 as int)"
        ).alias("dow"),
        F.round(F.col("value") * 1_000_000).cast("long").alias("vm"),
    )
    return (
        src.cube("event_type", "dow")
        .agg(
            (
                F.grouping("event_type").cast("long") * 2
                + F.grouping("dow").cast("long")
            ).alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("vm").cast("long").alias("sum_value_micros"),
        )
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce(F.col("dow").cast("long"), F.lit(-1))
            .cast("long").alias("dow"),
            "gid", "n", "sum_value_micros",
        )
    )


def pareto_frontier(
    events: DataFrame,
    unit_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """(f, m, n_users) — the Pareto frontier (skyline) of the per-unit
    (frequency, monetary-cents) plane: the points no other unit
    dominates (≥ on both axes, > on at least one) — the "best
    customers" set a 2-D threshold can't express (pareto_80_20 ranks
    one axis; the skyline trades the two off).

    The sweep is closed-form, never a pair join: per distinct f, only
    the max-m point can survive; a point survives iff its m strictly
    exceeds the running max of best-m over all STRICTLY larger f
    (window over the distinct-f table, one row per distinct frequency —
    activity-bounded, not unit-bounded).  Units tied on an exact
    surviving (f, m) point all belong to the frontier (no strict
    dominance among equals).

    Scale shape: one per-unit combined aggregate, one distinct-f
    groupBy, one lag-style running max over the distinct-f table, one
    semi-join back for the per-point unit counts."""
    per = events.groupBy(F.col(unit_col).alias("u")).agg(
        F.count(F.lit(1)).cast("long").alias("f"),
        F.sum(
            F.round(F.col(value_col) * 100).cast("long")
        ).cast("long").alias("m"),
    )
    best = per.groupBy("f").agg(F.max("m").alias("bm"))
    w = Window.orderBy(F.col("f").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    front = best.select(
        "f", "bm", F.max("bm").over(w).alias("prev")
    ).where(F.col("prev").isNull() | (F.col("bm") > F.col("prev")))
    return (
        per.join(
            front.select("f", F.col("bm").alias("m")), ["f", "m"]
        )
        .groupBy("f", "m")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def dose_response(
    events: DataFrame,
    exposure_type: str = "view",
    outcome_type: str = "purchase",
    max_bucket: int = 3,
    unit_col: str = "user_id",
) -> DataFrame:
    """(exposure_bucket, n_units, n_converted, rate_micros) — the
    dose-response curve: conversion rate by exposure count (bucketed
    0, 1, …, ``max_bucket``+, the last one capped) — does seeing more
    ``exposure_type`` events go with more ``outcome_type``?
    Descriptive, not causal (stated), but the first chart every growth
    review asks for next to the A/B z-test.

    Scale shape: ONE per-unit combined aggregate (exposure count +
    outcome flag in the same pass), then a codebook-sized bucket
    groupBy."""
    per = events.groupBy(F.col(unit_col).alias("u")).agg(
        F.sum(
            (F.col("event_type") == exposure_type).cast("long")
        ).alias("x"),
        F.max(
            (F.col("event_type") == outcome_type).cast("int")
        ).alias("y"),
    )
    b = F.least(F.col("x"), F.lit(max_bucket)).cast("int")
    agg = per.groupBy(b.alias("exposure_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("y").cast("long").alias("n_converted"),
    )
    return agg.select(
        "exposure_bucket", "n_units", "n_converted",
        F.expr("(1000000 * n_converted) div n_units")
        .cast("long").alias("rate_micros"),
    )


def popularity_hitrate(
    events: DataFrame,
    k: int = 2,
    unit_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """(n_users, n_hits, hitrate_micros) — leave-one-out evaluation of
    the popularity baseline, the floor every recommender must beat:
    hold out each unit's LAST event, rank items by train-set frequency
    (train = everything except the held-out rows; ties broken by item
    asc), and score a hit when the held-out item sits in the top
    ``k``.  Units with only the held-out event still count (their
    history is empty but the global ranking predicts anyway).

    Scale shape: one per-unit row_number window picks the holdout; the
    train ranking is a codebook-sized groupBy collapsed to a k-item
    literal-free broadcast; the scoring join is unit-table ×
    k-row broadcast."""
    w = Window.partitionBy(unit_col).orderBy(
        F.col(ts_col).desc(), F.col(tie_col).desc()
    )
    marked = events.select(
        F.col(unit_col).alias("u"),
        F.col(state_col).alias("it"),
        (F.row_number().over(w) == 1).cast("int").alias("held"),
    )
    topk = (
        marked.where(F.col("held") == 0)
        .groupBy("it")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "it")
        .limit(k)
        .select("it")
    )
    held = marked.where(F.col("held") == 1).select("u", "it")
    hits = held.join(F.broadcast(topk), "it", "left_semi")
    agg = held.agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    ).crossJoin(
        F.broadcast(
            hits.agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        )
    )
    return agg.select(
        "n_users", "n_hits",
        F.expr("(1000000 * n_hits) div n_users")
        .cast("long").alias("hitrate_micros"),
    )


def psi_time_drift(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(group, n_early, n_late, share_early_micros, share_late_micros,
    psi_contrib_micros) — Population Stability Index between the first
    and second time half of the stream (split at the midpoint of the
    observed time RANGE — a pure literal predicate, no rank pass): the
    standard production drift monitor, Σ (p_late − p_early)·ln(p_late
    / p_early).  Groups absent from one half take the conventional
    1-count floor on that side (stated; keeps ln finite) — floors
    adjust counts, not the denominators, exactly like the smoothed PSI
    every monitoring stack ships.

    Exactness: counts exact; shares exact truncating micros; the one
    float expression ((p_l − p_e)·ln ratio over exact integer
    operands) is structured identically on both engines, rounded once
    to 6dp-scaled micros."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    rng = events.agg(
        F.min(us).alias("lo"), F.max(us).alias("hi")
    )
    halves = events.crossJoin(F.broadcast(rng)).select(
        F.col(group_col).alias("g"),
        (
            us
            >= (
                F.col("lo")
                + F.expr("(hi - lo) div 2")
                + 1
            )
        ).cast("int").alias("late"),
    )
    per = halves.groupBy("g").agg(
        F.sum(1 - F.col("late")).cast("long").alias("n_early"),
        F.sum("late").cast("long").alias("n_late"),
    )
    tot = per.agg(
        F.sum("n_early").cast("long").alias("te"),
        F.sum("n_late").cast("long").alias("tl"),
    )
    j = per.crossJoin(F.broadcast(tot)).select(
        "g", "n_early", "n_late", "te", "tl",
        F.greatest("n_early", F.lit(1)).alias("fe"),
        F.greatest("n_late", F.lit(1)).alias("fl"),
    )
    pe = F.col("fe") / F.col("te")
    pl = F.col("fl") / F.col("tl")
    return j.select(
        F.col("g").alias(group_col),
        "n_early", "n_late",
        F.expr("(1000000 * n_early) div te")
        .cast("long").alias("share_early_micros"),
        F.expr("(1000000 * n_late) div tl")
        .cast("long").alias("share_late_micros"),
        F.round(F.lit(1_000_000.0) * (pl - pe) * F.log(pl / pe), 0)
        .cast("long").alias("psi_contrib_micros"),
    )


def ols_user_value(
    events: DataFrame,
    unit_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """(n, slope_micros, intercept_micros, r2) — cross-sectional OLS of
    per-unit monetary cents on per-unit event count ("does more
    activity mean more value, and how much per event?"): the exact
    integer moments feed the closed forms

        slope = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²),
        intercept = (Sy − slope·Sx) / n

    — both emitted as DECIMAL(38,0)-divided micros (BIGINT-safe at any
    volume, same device as acf_daily) — plus the one float R² (squared
    Pearson over the same exact moments, 6dp once).

    Scale shape: one per-unit combined aggregate, one 1-row moment
    aggregate; everything after is closed-form."""
    per = events.groupBy(F.col(unit_col).alias("u")).agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.sum(
            F.round(F.col(value_col) * 100).cast("long")
        ).cast("long").alias("y"),
    )
    m = per.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"
    den = "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"
    deny = "CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy"
    slope = f"(({num}) * 1000000) div ({den})"
    return m.select(
        "n",
        F.expr(f"CAST({slope} AS BIGINT)").alias("slope_micros"),
        F.expr(
            f"CAST((CAST(sy AS DECIMAL(38,0)) * 1000000"
            f" - ({slope}) * sx) div CAST(n AS DECIMAL(38,0))"
            " AS BIGINT)"
        ).alias("intercept_micros"),
        F.when(
            (F.expr(den) > 0) & (F.expr(deny) > 0),
            F.round(
                F.expr(
                    f"CAST(({num}) AS DOUBLE) * CAST(({num}) AS DOUBLE)"
                    f" / (CAST(({den}) AS DOUBLE)"
                    f" * CAST(({deny}) AS DOUBLE))"
                ),
                6,
            ),
        ).alias("r2"),
    )


def max_streak_hist(
    events: DataFrame,
    unit_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(streak_days, n_users) — histogram of each unit's LONGEST run of
    consecutive active days (the gaps-and-islands classic): distinct
    (unit, day) presence, island id = day − row_number within unit,
    max island length per unit — the habit-strength retention metric
    next to DAU/WAU stickiness.

    Scale shape: one presence distinct, one per-unit ordered window,
    two map-side-combined groupBys; the histogram is calendar-bounded."""
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
    )
    pres = events.select(
        F.col(unit_col).alias("u"), day.alias("d")
    ).distinct()
    w = Window.partitionBy("u").orderBy("d")
    isl = pres.select(
        "u", (F.col("d") - F.row_number().over(w)).alias("isl")
    )
    runs = isl.groupBy("u", "isl").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    per = runs.groupBy("u").agg(
        F.max("len").cast("long").alias("streak_days")
    )
    return per.groupBy("streak_days").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


def revenue_var(
    events: DataFrame,
    pct: int = 5,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(n_days, var_cents, es_cents) — Value-at-Risk and Expected
    Shortfall of DAILY revenue (zero-filled day spine): VaR = the
    ``pct``-th-percentile worst day (shared discrete rank rule —
    rank ceil(p·n/100), min 1, over days sorted ascending), ES = the
    truncating mean of the days at or below that rank — "how bad is a
    bad day, and how bad are the worst ones on average?".

    Scale shape: one map-side daily groupBy + the calendar-bounded
    spine; the rank window runs over days, never events."""
    daily = events.groupBy(
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
        ).alias("d")
    ).agg(
        F.sum(
            F.round(F.col(value_col) * 100).cast("long")
        ).cast("long").alias("cents")
    )
    rng = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    filled = (
        rng.select(
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d")
        )
        .join(daily, "d", "left")
        .select(F.coalesce("cents", F.lit(0)).cast("long").alias("c"))
    )
    # days sorted ascending; duplicate cents values make the rank pick
    # value-stable whichever duplicate wins the row_number
    ranked = filled.select(
        "c", F.row_number().over(Window.orderBy("c")).alias("rn")
    ).crossJoin(
        F.broadcast(
            filled.agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
    )
    cut = F.greatest(F.expr(f"(n * {int(pct)}) div 100"), F.lit(1))
    tail = ranked.where(F.col("rn") <= cut)
    return tail.agg(
        F.max("n").alias("_n"),
        F.max(F.when(F.col("rn") == cut, F.col("c"))).alias("_var"),
        F.sum("c").alias("_s"),
        F.count(F.lit(1)).alias("_k"),
    ).select(
        F.col("_n").cast("long").alias("n_days"),
        F.col("_var").cast("long").alias("var_cents"),
        F.expr("CAST((_s - (_s % _k + _k) % _k) div _k AS BIGINT)")
        .alias("es_cents"),
    )


def aa_hash_test(
    events: DataFrame,
    convert_type: str = "purchase",
    unit_col: str = "user_id",
    salt: str = "aa",
) -> DataFrame:
    """(n_a, conv_a, n_b, conv_b, rate_a, rate_b, z) — the A/A sanity
    test every experimentation stack runs before trusting its splitter:
    units are split by the hash48 parity of their id (the same
    deterministic assignment machinery dataset_split ships) and the
    two-proportion z is computed between the two halves on conversion.
    The EXPECTED answer is |z| small — a large |z| here means the
    splitter correlates with behavior (hash collision with the id
    assignment scheme) and every A/B readout downstream is suspect.
    Same float discipline as :func:`ab_conversion_ztest`."""
    from graphlite_spark.functions.hashes import hash48

    per = events.groupBy(F.col(unit_col).alias("u")).agg(
        F.max(
            (F.col("event_type") == convert_type).cast("int")
        ).alias("c")
    ).select(
        (
            hash48(
                F.concat(F.lit(f"{salt}:"), F.col("u").cast("string"))
            )
            % 2
        ).cast("int").alias("a"),
        "c",
    )
    agg = per.agg(
        F.sum(1 - F.col("a")).cast("long").alias("n_a"),
        F.sum((1 - F.col("a")) * F.col("c")).cast("long").alias("conv_a"),
        F.sum("a").cast("long").alias("n_b"),
        F.sum(F.col("a") * F.col("c")).cast("long").alias("conv_b"),
    )
    pa = F.col("conv_a") / F.col("n_a")
    pb = F.col("conv_b") / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    )
    z = (pa - pb) / F.sqrt(
        pp * (1 - pp) * (1 / F.col("n_a") + 1 / F.col("n_b"))
    )
    return agg.select(
        "n_a", "conv_a", "n_b", "conv_b",
        F.when(F.col("n_a") > 0, F.round(pa, 6)).alias("rate_a"),
        F.when(F.col("n_b") > 0, F.round(pb, 6)).alias("rate_b"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0)
            & (F.col("conv_a") + F.col("conv_b") > 0)
            & (F.col("conv_a") + F.col("conv_b")
               < F.col("n_a") + F.col("n_b")),
            F.round(z, 6),
        ).alias("z"),
    )


def cuped_adjustment(
    events: DataFrame,
    value_col: str = "value",
    unit_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(n_units, theta, var_y, var_adj, reduction) — CUPED variance
    reduction (Deng et al., WSDM'13), the standard pre-experiment
    covariate adjustment every experimentation stack applies before an
    A/B readout: split the global time range at its midpoint, take each
    unit's pre-period value sum X as the covariate for its post-period
    metric Y, and report theta = cov(X,Y)/var(X) plus the population
    variance of Y before and after the adjustment
    Y' = Y - theta * (X - mean X).  ``reduction`` is the fraction of
    metric variance the covariate removes — equivalently rho^2, the
    sample-size multiplier CUPED buys the experiment.

    Exactness: per-unit sums ride integer cents; the five raw moments
    (Sx, Sy, Sxx, Sxy, Syy) are exact BIGINTs, cast to DOUBLE once and
    combined in one structurally-shared float expression rounded to 6dp
    (the ab_conversion_ztest discipline).  NULL theta/var_adj/reduction
    when var(X) or var(Y) is 0.

    Scale shape: one 1-row min/max broadcast for the midpoint, ONE
    map-side-combined per-unit aggregate, one 6-number rollup — nothing
    after the first groupBy exceeds one row."""
    us = F.expr(f"unix_micros(cast({ts_col} as timestamp))")
    src = events.select(
        F.col(unit_col).alias("u"),
        us.alias("us"),
        F.round(F.col(value_col) * 100).cast("long").alias("c"),
    )
    mid = src.agg(
        F.expr("cast((min(us) + max(us)) div 2 as bigint)").alias("mid")
    )
    per = src.crossJoin(F.broadcast(mid)).groupBy("u").agg(
        F.coalesce(
            F.sum(F.when(F.col("us") <= F.col("mid"), F.col("c"))),
            F.lit(0),
        ).cast("long").alias("x"),
        F.coalesce(
            F.sum(F.when(F.col("us") > F.col("mid"), F.col("c"))),
            F.lit(0),
        ).cast("long").alias("y"),
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    # shared float expression — cast the exact BIGINT moments to DOUBLE
    # once, then identical IEEE arithmetic on both engines
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    covxy = (nd * sxy - sx * sy) / (nd * nd)
    varx = (nd * sxx - sx * sx) / (nd * nd)
    vary = (nd * syy - sy * sy) / (nd * nd)
    theta = covxy / varx
    var_adj = vary - covxy * covxy / varx
    return agg.select(
        F.col("n").alias("n_units"),
        F.when(varx > 0, F.round(theta, 6)).alias("theta"),
        F.when(nd > 0, F.round(vary, 6)).alias("var_y"),
        F.when(varx > 0, F.round(var_adj, 6)).alias("var_adj"),
        F.when(
            (varx > 0) & (vary > 0),
            F.round(F.lit(1.0) - var_adj / vary, 6),
        ).alias("reduction"),
    )


def ks_2sample(
    events: DataFrame,
    type_a: str = "purchase",
    type_b: str = "click",
    value_col: str = "value",
) -> DataFrame:
    """(n_a, n_b, d_num, d_stat) — the two-sample Kolmogorov–Smirnov
    statistic between the ``value`` distributions of two event types:
    D = max over the merged value alphabet of |ECDF_a − ECDF_b|.
    ``d_num = max |cum_a·n_b − cum_b·n_a|`` is the EXACT integer
    cross-multiplied numerator (D = d_num / (n_a·n_b)), so the test
    statistic itself is a BIGINT and the one float (``d_stat``) is a
    single exact-integer division rounded to 6dp — the distribution-
    shape sibling of :func:`mann_whitney_u` (which only sees location).

    Scale shape: identical to Mann–Whitney — one map-side-combined
    groupBy onto the distinct-cents alphabet, one cumulative window
    bounded by alphabet size, closed forms after."""
    cents = events.where(
        F.col("event_type").isin(type_a, type_b)
    ).select(
        (F.col("event_type") == type_a).cast("int").alias("is_a"),
        F.round(F.col(value_col) * 100).cast("long").alias("v"),
    )
    per = cents.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("is_a").cast("long").alias("cnt_a"),
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        F.sum("cnt_a").over(w).alias("ca"),
        (F.sum("cnt").over(w) - F.sum("cnt_a").over(w)).alias("cb"),
    )
    tot = per.agg(
        F.sum("cnt_a").cast("long").alias("n_a"),
        F.sum(F.col("cnt") - F.col("cnt_a")).cast("long").alias("n_b"),
    )
    agg = cum.crossJoin(F.broadcast(tot)).agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.max(
            F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a"))
        ).cast("long").alias("d_num"),
    )
    return agg.select(
        "n_a", "n_b", "d_num",
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.round(
                F.col("d_num").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                6,
            ),
        ).alias("d_stat"),
    )


def chi_square_type_dow(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """(n_types, n_dows, dof, chi2_micros) — Pearson's chi-square test
    of independence between event_type and epoch weekday (the
    ``(d+3) % 7`` convention shared with :func:`dow_seasonality`):
    is the traffic mix the same every day of the week?  The statistic
    rides EXACT integer arithmetic end-to-end: with a = N·O − r·c and
    den = N·r·c, each cell's term (O−E)²/E = a²/den is floored to
    micro units via the two-step quotient/remainder split (q = a² div
    den; micros = 10⁶·q + (10⁶·rem) div den — never forming 10⁶·a²,
    which would overflow), and the cells — INCLUDING structural zeros
    of the observed-type × observed-dow lattice, which contribute E —
    sum to an order-independent BIGINT.

    Scale shape: one map-side-combined groupBy for the cells, two
    codebook-sized marginal aggregates cross-joined back (the lattice
    is |types|·7 rows), one scalar rollup.  BIGINT bound: a ≤ N²,
    a² ≤ N⁴ — exact through N ≈ 50k events per tested slice; beyond
    that the term falls back to the same expression in DOUBLE (parity
    tier documented, as the MAD/quantile tier does)."""
    src = events.select(
        "event_type",
        F.expr(
            f"cast((unix_micros(cast({ts_col} as timestamp))"
            f" div {DAY_US} + 3) % 7 as int)"
        ).alias("dow"),
    )
    cells = src.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    rows_t = src.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("r")
    )
    cols_d = src.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = src.agg(F.count(F.lit(1)).cast("long").alias("nn"))
    lattice = (
        F.broadcast(rows_t)
        .crossJoin(F.broadcast(cols_d))
        .join(cells, ["event_type", "dow"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type", "dow", "r", "c", "nn",
            F.coalesce(F.col("o"), F.lit(0)).cast("long").alias("o"),
        )
    )
    a = F.col("nn") * F.col("o") - F.col("r") * F.col("c")
    den = F.col("nn") * F.col("r") * F.col("c")
    terms = lattice.select(
        "event_type", "dow",
        (a * a).alias("asq"), den.alias("den"),
    ).select(
        "event_type", "dow", "asq", "den",
        F.expr("(asq - asq % den) div den").cast("long").alias("q"),
        (F.col("asq") % F.col("den")).alias("rem"),
    ).select(
        "event_type", "dow",
        (
            F.lit(1_000_000) * F.col("q")
            + F.expr(
                "(1000000 * rem - (1000000 * rem) % den) div den"
            ).cast("long")
        ).alias("t_micros"),
    )
    return terms.agg(
        F.count_distinct("event_type").cast("long").alias("n_types"),
        F.count_distinct("dow").cast("long").alias("n_dows"),
        (
            (F.count_distinct("event_type") - 1)
            * (F.count_distinct("dow") - 1)
        ).cast("long").alias("dof"),
        F.sum("t_micros").cast("long").alias("chi2_micros"),
    )


def nelson_aalen(
    events: DataFrame,
    unit_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(duration_days, n_risk, n_deaths, cumhaz_micros) — the
    Nelson–Aalen cumulative-hazard estimate (Nelson 1972 / Aalen 1978,
    public literature): H(t) = sum_{t_i <= t} d_i / n_i over the same
    lifetime/censoring construction as :func:`kaplan_meier` (lifetime =
    last-active − first-active day; units last seen on the corpus's
    final day are censored).  Where KM multiplies survival down, NA
    adds hazard up — additive, so each step term rides an exact
    remainder-subtract micro division and the cumulative sum is a
    BIGINT running total, no fold needed.  −ln(KM) ≈ NA is the
    standard cross-check between the two estimators.

    Scale shape: identical to kaplan_meier — one map-side-combined
    per-unit aggregate, a 1-row horizon broadcast, then everything on
    the calendar-bounded duration table (ordered windows there are a
    non-issue at any event scale)."""
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
    )
    per = events.groupBy(F.col(unit_col).alias("u")).agg(
        F.min(day).alias("first_d"), F.max(day).alias("last_d")
    )
    hi = events.agg(F.max(day).alias("hi"))
    lives = per.crossJoin(F.broadcast(hi)).select(
        (F.col("last_d") - F.col("first_d")).alias("t"),
        (F.col("last_d") == F.col("hi")).cast("int").alias("censored"),
    )
    durs = lives.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum(F.lit(1) - F.col("censored")).cast("long").alias("d"),
    )
    wd = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = durs.select(
        "t", "d", F.sum("c").over(wd).cast("long").alias("n")
    ).where(F.col("d") > 0)
    wt = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stepped = risk.select(
        "t", "d", "n",
        F.expr(
            "(1000000 * d - (1000000 * d) % n) div n"
        ).cast("long").alias("h"),
    )
    return stepped.select(
        F.col("t").alias("duration_days"),
        F.col("n").alias("n_risk"),
        F.col("d").alias("n_deaths"),
        F.sum("h").over(wt).cast("long").alias("cumhaz_micros"),
    )


def holt_linear_daily(
    events: DataFrame,
    alpha_num: int = 1,
    alpha_den: int = 4,
    beta_num: int = 1,
    beta_den: int = 4,
    ts_col: str = "ts",
) -> DataFrame:
    """(d, y, level_micros, trend_micros, resid_micros) — Holt's linear
    (double exponential) smoothing of the zero-filled daily count
    series with rational alpha/beta (default 1/4, 1/4):

        l_t = a·y_t + (1−a)(l_{t−1} + b_{t−1})
        b_t = B(l_t − l_{t−1}) + (1−B)·b_{t−1}

    — :func:`ewma_daily` with a TREND state, so a steadily growing
    series stops reading as a permanent positive surprise.  Init
    l_1 = 10⁶·y_1, b_1 = 10⁶·(y_1 − y_0) (standard two-point init;
    the day-0 row carries NULL state).  ``resid_micros`` is the
    one-step-ahead forecast residual 10⁶·y_t − (l_{t−1} + b_{t−1}),
    NULL before t=2 — the surprise signal.

    Exactness: both recursions ride remainder-subtract truncating
    division on BIGINT micros (sign-safe: Spark's % and DuckDB's %
    both follow the dividend, so (x − x%d)/d truncates toward zero on
    both engines even for negative trend states).  Scale shape: one
    map-side-combined daily groupBy; the coupled fold runs over the
    single collected calendar-bounded day array (the kaplan_meier /
    ewma device — O(k²) prefix lambdas over k = calendar days)."""
    if not (0 < alpha_num < alpha_den and 0 < beta_num < beta_den):
        raise ValueError("alpha and beta must be proper positive fractions")
    daily = events.groupBy(
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    rng = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d")
    )
    filled = spine.join(daily, "d", "left").select(
        "d", F.coalesce(F.col("y"), F.lit(0)).cast("long").alias("y")
    )
    arr = filled.groupBy().agg(
        F.sort_array(F.collect_list(F.struct("d", "y"))).alias("arr")
    )
    M = F.lit(1_000_000).cast("long")
    an, ad = alpha_num, alpha_den
    bn, bd = beta_num, beta_den

    def step(acc, x):
        rawl = (
            F.lit(an).cast("long") * M * x["y"]
            + F.lit(ad - an).cast("long") * (acc["l"] + acc["b"])
        )
        l_new = ((rawl - rawl % F.lit(ad)) / F.lit(ad)).cast("long")
        rawb = (
            F.lit(bn).cast("long") * (l_new - acc["l"])
            + F.lit(bd - bn).cast("long") * acc["b"]
        )
        b_new = ((rawb - rawb % F.lit(bd)) / F.lit(bd)).cast("long")
        return F.struct(l_new.alias("l"), b_new.alias("b"))

    def init():
        y0 = F.element_at(F.col("arr"), 1)["y"]
        y1 = F.element_at(F.col("arr"), 2)["y"]
        return F.struct(
            (M * y1).alias("l"), (M * (y1 - y0)).alias("b")
        )

    def state_at(i):
        # state after 1-based day index i (i >= 2): fold days 3..i
        return F.aggregate(
            F.slice(F.col("arr"), F.lit(3), i - 1), init(), step
        )

    steps = arr.select(
        F.explode(
            F.transform(
                F.col("arr"),
                lambda x, i: F.struct(
                    x["d"].alias("d"),
                    x["y"].alias("y"),
                    F.when(i >= 1, state_at(i)["l"]).alias("l"),
                    F.when(i >= 1, state_at(i)["b"]).alias("b"),
                    F.when(
                        i >= 2,
                        M * x["y"]
                        - (state_at(i - 1)["l"] + state_at(i - 1)["b"]),
                    ).alias("resid"),
                ),
            )
        ).alias("s")
    )
    return steps.select(
        F.col("s.d").alias("d"),
        F.col("s.y").alias("y"),
        F.col("s.l").cast("long").alias("level_micros"),
        F.col("s.b").cast("long").alias("trend_micros"),
        F.col("s.resid").cast("long").alias("resid_micros"),
    )


def _sprt_constants(
    p0: float, p1: float, alpha: float, beta: float
) -> tuple[int, int, int, int]:
    """Micro-rounded SPRT log-likelihood-ratio increments and Wald
    boundaries, computed ONCE in python so both engines consume the
    same integer literals (zero cross-engine float risk)."""
    import math

    llr1 = round(1_000_000 * math.log(p1 / p0))
    llr0 = round(1_000_000 * math.log((1 - p1) / (1 - p0)))
    upper = round(1_000_000 * math.log((1 - beta) / alpha))
    lower = round(1_000_000 * math.log(beta / (1 - alpha)))
    return llr1, llr0, upper, lower


def sprt_daily(
    events: DataFrame,
    convert_type: str = "purchase",
    p0: float = 0.05,
    p1: float = 0.08,
    alpha: float = 0.05,
    beta: float = 0.05,
    ts_col: str = "ts",
) -> DataFrame:
    """(d, n, c, cum_llr_micros, decision) — Wald's sequential
    probability ratio test (Wald 1945, public literature) run over the
    daily stream: each day contributes c·ln(p1/p0) +
    (n−c)·ln((1−p1)/(1−p0)) to the cumulative log-likelihood ratio,
    and the trajectory is compared to the Wald boundaries
    ln((1−β)/α) / ln(β/(1−α)).  The fixed-horizon z-test
    (:func:`ab_conversion_ztest`) answers after the experiment; SPRT
    is the always-valid monitor that says WHEN enough evidence has
    accumulated to stop — the sequential-testing tier.

    Exactness: the four log constants are micro-rounded ONCE in python
    and enter both engines as integer literals, so every daily
    increment and the running sum are exact BIGINTs — no float crosses
    the engine boundary at all.  Scale shape: one map-side-combined
    daily groupBy, one calendar-bounded cumulative window."""
    llr1, llr0, upper, lower = _sprt_constants(p0, p1, alpha, beta)
    daily = events.groupBy(
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
        ).alias("d")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            (F.col("event_type") == convert_type).cast("int")
        ).cast("long").alias("c"),
    )
    wt = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.select(
        "d", "n", "c",
        F.sum(
            F.col("c") * F.lit(llr1)
            + (F.col("n") - F.col("c")) * F.lit(llr0)
        ).over(wt).cast("long").alias("cum_llr_micros"),
    )
    return cum.select(
        "d", "n", "c", "cum_llr_micros",
        F.when(F.col("cum_llr_micros") >= upper, F.lit("accept_h1"))
        .when(F.col("cum_llr_micros") <= lower, F.lit("accept_h0"))
        .otherwise(F.lit("continue")).alias("decision"),
    )


def winsorized_stats(
    events: DataFrame,
    lo_pct: int = 5,
    hi_pct: int = 95,
    value_col: str = "value",
) -> DataFrame:
    """(event_type, n, lo_cents, hi_cents, wmean_micros) — the
    winsorized mean per event type: values below the rank-ceil(p_lo·n)
    element are raised to it and values above the rank-ceil(p_hi·n)
    element lowered to it before averaging — the robust-location
    estimate a revenue metric uses so one whale cannot move the mean
    (the trimmed/capped sibling of :func:`value_outliers_mad`, which
    counts outliers instead of absorbing them).

    Exactness: cut elements use the same discrete rank rule as the
    quantile tier (ceil(p·n) = (p·n + 99) div 100 over integer cents,
    so the picked VALUES are bit-identical whichever duplicate wins
    the row_number); the winsorized mean rides an exact
    remainder-subtract micro division of the clamped-cents sum.

    Scale shape: one per-type sort window (spillable, the quantile
    tier's argument), one codebook-sized cut aggregate broadcast back,
    one map-side-combined rollup."""
    cents = events.select(
        "event_type",
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy("cents")
    cw = Window.partitionBy("event_type")
    ranked = cents.withColumn(
        "rn", F.row_number().over(w)
    ).withColumn("n", F.count(F.lit(1)).over(cw))
    lo_rank = F.greatest(
        F.expr(f"({int(lo_pct)} * n + 99) div 100"), F.lit(1)
    )
    hi_rank = F.expr(f"({int(hi_pct)} * n + 99) div 100")
    cuts = ranked.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.min(
            F.when(F.col("rn") == lo_rank, F.col("cents"))
        ).alias("lo_cents"),
        F.min(
            F.when(F.col("rn") == hi_rank, F.col("cents"))
        ).alias("hi_cents"),
    )
    clamped = cents.join(F.broadcast(cuts), "event_type").select(
        "event_type", "n", "lo_cents", "hi_cents",
        F.greatest(
            F.col("lo_cents"), F.least(F.col("hi_cents"), F.col("cents"))
        ).alias("wc"),
    )
    return clamped.groupBy(
        "event_type", "n", "lo_cents", "hi_cents"
    ).agg(
        F.expr(
            "cast((10000 * sum(wc) - (10000 * sum(wc)) % max(n))"
            " div max(n) as bigint)"
        ).alias("wmean_micros")
    )


def quantile_treatment_effect(
    events: DataFrame,
    cohort_type: str = "signup",
    percents: tuple = (25, 50, 75),
    unit_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """(pct, n_a, n_b, q_a_cents, q_b_cents, diff_cents) — quantile
    treatment effects: the difference between cohort A (units whose
    FIRST event is ``cohort_type`` — the activation cohort; an
    ever-emitted flag is degenerate when every active unit eventually
    touches every type) and cohort B (the rest) at each requested
    quantile of per-unit total value — the distributional A/B readout
    (Doksum 1974, public literature).  A mean effect
    (:func:`ab_conversion_ztest` tier) can be driven entirely by a few
    whales; the QTE curve says WHERE in the distribution the effect
    lives (median movers vs tail movers), which changes the launch
    decision.

    Exactness: per-unit totals ride integer cents; the first event is
    picked by the deterministic (ts, event_id) order; quantiles use
    the discrete rank-ceil(p·n/100) rule per cohort (the quantile
    tier's engine-portable convention), so every output is BIGINT.

    Scale shape: one per-unit first-event window + one map-side-
    combined per-unit aggregate (both shuffle on the unit key), one
    per-cohort sort window (spillable), a percents-sized conditional
    rollup."""
    us = events.select(
        F.col(unit_col).alias("u"),
        F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us"),
        "event_id", "event_type",
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
    )
    wf = Window.partitionBy("u").orderBy("ts_us", "event_id")
    first = (
        us.withColumn("rn", F.row_number().over(wf))
        .where(F.col("rn") == 1)
        .select(
            "u",
            (F.col("event_type") == cohort_type).cast("int").alias("a"),
        )
    )
    tot = us.groupBy("u").agg(
        F.sum("cents").cast("long").alias("tot")
    )
    per = tot.join(first, "u")
    w = Window.partitionBy("a").orderBy("tot")
    cw = Window.partitionBy("a")
    ranked = per.select(
        "a", "tot",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cw).cast("long").alias("n"),
    )
    rows = []
    for p in percents:
        p = int(p)
        rank = F.expr(f"greatest(({p} * n + 99) div 100, 1)")
        q = ranked.groupBy().agg(
            F.lit(p).cast("long").alias("pct"),
            F.max(F.when(F.col("a") == 1, F.col("n")))
            .cast("long").alias("n_a"),
            F.max(F.when(F.col("a") == 0, F.col("n")))
            .cast("long").alias("n_b"),
            F.min(
                F.when(
                    (F.col("a") == 1) & (F.col("rn") == rank),
                    F.col("tot"),
                )
            ).cast("long").alias("q_a_cents"),
            F.min(
                F.when(
                    (F.col("a") == 0) & (F.col("rn") == rank),
                    F.col("tot"),
                )
            ).cast("long").alias("q_b_cents"),
        )
        rows.append(q)
    out = rows[0]
    for q in rows[1:]:
        out = out.unionByName(q)
    return out.select(
        "pct", "n_a", "n_b", "q_a_cents", "q_b_cents",
        (F.col("q_a_cents") - F.col("q_b_cents"))
        .cast("long").alias("diff_cents"),
    )


def theil_sen_trend(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """One row (n_days, n_pairs, slope_micros, intercept_micros) — the
    Theil–Sen robust trend of the DAILY event-count series: slope = the
    median over all day pairs i < j of (y_j − y_i)/(x_j − x_i),
    intercept = the median of y_i − slope·x_i.  Resists up to ~29%
    outlier days, where :func:`activity_trend`'s OLS slope is dragged by
    a single launch-day spike — the robust sibling the anomaly tier
    (CUSUM/SPRT/EWMA) reads for "is traffic really growing?".

    Exactness: days with no events are REAL zeros via the day spine;
    per-pair slopes ride ``(10^6·Δy) div Δx`` (BIGINT, truncation toward
    zero — measured identical on Spark ``div`` and DuckDB ``//``
    including negatives), the two medians are rank-rule picks of
    existing integers (upper median at rank ``(n+2) div 2`` so n=1
    degenerates cleanly), and the intercept reuses the PICKED integer
    slope — every output is a deterministic BIGINT.

    Scale shape: one map-side-combined daily groupBy over the facts;
    the O(days²) pair join, rank windows, and residual pass all live on
    the calendar-bounded daily table (a decade is ~3.7k days → 6.7M
    pairs), never on the event frame."""
    daily = events.groupBy(
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    rng = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    pts = (
        rng.select(
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d"),
            "lo",
        )
        .join(daily, "d", "left")
        .select(
            (F.col("d") - F.col("lo")).cast("long").alias("x"),
            F.coalesce("y", F.lit(0)).cast("long").alias("y"),
        )
    )
    a = pts.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = pts.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    slopes = (
        a.join(b, F.col("xb") > F.col("xa"))
        .select(
            F.expr("(1000000 * (yb - ya)) div (xb - xa)")
            .cast("long")
            .alias("s")
        )
    )
    ranked = slopes.select(
        "s", F.row_number().over(Window.orderBy("s")).alias("rn")
    ).crossJoin(
        F.broadcast(slopes.agg(F.count(F.lit(1)).cast("long").alias("np")))
    )
    sl = ranked.where(
        F.col("rn") == F.expr("(np + 2) div 2")
    ).select(F.col("s").alias("slope_micros"), F.col("np"))
    resid = pts.crossJoin(F.broadcast(sl)).select(
        (F.lit(1_000_000) * F.col("y") - F.col("slope_micros") * F.col("x"))
        .cast("long")
        .alias("r"),
        "slope_micros",
        "np",
    )
    rr = resid.select(
        "r",
        "slope_micros",
        "np",
        F.row_number().over(Window.orderBy("r")).alias("rn"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("nd"),
    )
    return rr.where(F.col("rn") == F.expr("(nd + 2) div 2")).select(
        F.col("nd").cast("long").alias("n_days"),
        F.col("np").cast("long").alias("n_pairs"),
        F.col("slope_micros").cast("long").alias("slope_micros"),
        F.col("r").cast("long").alias("intercept_micros"),
    )


def max_drawdown(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """One row (n_days, peak_cents, max_drawdown_cents, dd_day) — the
    maximum peak-to-trough decline of CUMULATIVE daily revenue: for each
    day t, drawdown_t = max(cum_1..cum_t) − cum_t; report the largest,
    the running peak it fell from, and the (earliest) day index where it
    bottomed.  The canonical downside-risk readout next to
    :func:`revenue_var` — VaR prices one bad day, drawdown prices a bad
    STREAK.

    Exactness: per-event cents (round(value·100) as BIGINT) summed per
    day over the zero-filled spine; cumulative sum, running max, and the
    argmin pick are all integer window functions — bit-exact, no floats
    anywhere.

    Scale shape: one map-side daily groupBy over the facts; the
    single-partition ordered windows run over calendar days only (a
    decade is ~3.7k rows), stated rather than hidden."""
    daily = events.groupBy(
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
        ).alias("d")
    ).agg(
        F.sum(F.round(F.col(value_col) * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    rng = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    filled = (
        rng.select(
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d"),
            "lo",
        )
        .join(daily, "d", "left")
        .select(
            (F.col("d") - F.col("lo")).cast("long").alias("x"),
            F.coalesce("cents", F.lit(0)).cast("long").alias("c"),
        )
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    dd = filled.select(
        "x",
        F.sum("c").over(w).alias("cum"),
    ).select(
        "x",
        F.max("cum").over(w).alias("peak"),
        (F.max("cum").over(w) - F.col("cum")).alias("dd"),
    )
    pick = dd.select(
        "x",
        "peak",
        "dd",
        F.row_number().over(
            Window.orderBy(F.col("dd").desc(), F.col("x").asc())
        ).alias("rn"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("nd"),
    )
    return pick.where(F.col("rn") == 1).select(
        F.col("nd").cast("long").alias("n_days"),
        F.col("peak").cast("long").alias("peak_cents"),
        F.col("dd").cast("long").alias("max_drawdown_cents"),
        F.col("x").cast("long").alias("dd_day"),
    )


def welch_ttest(
    events: DataFrame,
    type_a: str = "purchase",
    type_b: str = "click",
    value_col: str = "value",
) -> DataFrame:
    """One row (n_a, n_b, mean_a_cents, mean_b_cents, t_stat, df) —
    Welch's unequal-variance t-test on per-event ``value`` between two
    event types, with the Welch–Satterthwaite degrees of freedom.  The
    MEANS companion to :func:`ab_conversion_ztest`'s proportions and
    :func:`mann_whitney_u`'s ranks: does a purchase carry more value
    than a click, without assuming equal variances?

    Exactness: the distributed pass produces six BIGINTs only (n, Σc,
    Σc² per group, cents = round(100·value)); t and df are then single
    closed-form double expressions over those integers, rounded to 6dp
    — both engines compute the identical IEEE result from identical
    integers (the repo-standard final-float discipline).  NULL t/df
    when either side has n < 2 or both variances are zero.

    Scale shape: one map-side-combined groupBy over the facts; the
    pivot to one row is a 2-row aggregate."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    per = (
        events.where(F.col("event_type").isin([type_a, type_b]))
        .select(
            (F.col("event_type") == type_a).cast("int").alias("a"),
            cents.alias("c"),
        )
        .agg(
            F.sum("a").cast("long").alias("n_a"),
            F.sum(F.col("a") * F.col("c")).cast("long").alias("s_a"),
            F.sum(F.col("a") * F.col("c") * F.col("c"))
            .cast("long").alias("q_a"),
            F.sum(1 - F.col("a")).cast("long").alias("n_b"),
            F.sum((1 - F.col("a")) * F.col("c")).cast("long").alias("s_b"),
            F.sum((1 - F.col("a")) * F.col("c") * F.col("c"))
            .cast("long").alias("q_b"),
        )
    )
    # square AFTER the double cast: BIGINT s^2 would overflow near 3e9
    # cents-sums, and both engines make the identical int->double
    # conversion before the (deterministic) IEEE square
    va = F.expr(
        "(q_a - cast(s_a as double) * cast(s_a as double) / n_a)"
        " / (n_a - 1)"
    )
    vb = F.expr(
        "(q_b - cast(s_b as double) * cast(s_b as double) / n_b)"
        " / (n_b - 1)"
    )
    return per.select(
        "n_a",
        "n_b",
        F.round(F.col("s_a") / F.col("n_a"), 6).alias("mean_a_cents"),
        F.round(F.col("s_b") / F.col("n_b"), 6).alias("mean_b_cents"),
        F.when(
            (F.col("n_a") >= 2) & (F.col("n_b") >= 2)
            & (va / F.col("n_a") + vb / F.col("n_b") > 0),
            F.round(
                (F.col("s_a") / F.col("n_a") - F.col("s_b") / F.col("n_b"))
                / F.sqrt(va / F.col("n_a") + vb / F.col("n_b")),
                6,
            ),
        ).alias("t_stat"),
        F.when(
            (F.col("n_a") >= 2) & (F.col("n_b") >= 2)
            & (va / F.col("n_a") + vb / F.col("n_b") > 0),
            F.round(
                F.pow(va / F.col("n_a") + vb / F.col("n_b"), 2)
                / (
                    F.pow(va / F.col("n_a"), 2) / (F.col("n_a") - 1)
                    + F.pow(vb / F.col("n_b"), 2) / (F.col("n_b") - 1)
                ),
                6,
            ),
        ).alias("df"),
    )


def hurst_rs(
    events: DataFrame,
    window_sizes: tuple = (4, 8, 16),
    ts_col: str = "ts",
) -> DataFrame:
    """(w, n_windows, mean_rs_micros, hurst) — rescaled-range (R/S)
    analysis of the DAILY event-count series: split the zero-filled day
    spine into disjoint windows of each size ``w`` (remainder days
    dropped), compute R/S per window (R = range of the cumulative
    mean-deviation series Z_1..Z_w, S = population std), average per
    size, and estimate the Hurst exponent as the OLS slope of
    log(mean R/S) on log(w).  H ≈ 0.5 → memoryless traffic, H > 0.5 →
    long-range persistence (the self-similarity signal behind
    :func:`user_burstiness` and :func:`dispersion_index`) — the classic
    Mandelbrot–Wallis readout.

    Exactness: deviations ride w-scaled integers (dev = w·y − S_w, the
    acf device, so no rational mean appears); R and Σdev² are exact
    BIGINTs per window; R/S → one closed-form double rounded to micros;
    the per-size mean is a truncating integer division; and the final
    slope is computed from integer-rounded logs (lx = round(10⁶·ln w),
    ly = round(10⁶·ln(mean_rs/10⁶))) so every cross-engine sum is over
    exact integers — no float-summation-order discipline anywhere.
    Windows with zero variance are skipped (R > 0 ⟺ S > 0: the
    deviations of a window sum to zero, so Z_w = 0 always); ``hurst``
    is NULL when fewer than two sizes have windows.

    Scale shape: one map-side daily groupBy over the facts; everything
    after runs on the calendar-bounded daily table × len(window_sizes)
    (window-partitioned, never single-partition over data)."""
    sizes = sorted(int(w) for w in window_sizes)
    daily = events.groupBy(
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    rng = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    pts = (
        rng.select(
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d"),
            "lo",
        )
        .join(daily, "d", "left")
        .select(
            (F.col("d") - F.col("lo")).cast("long").alias("x"),
            F.coalesce("y", F.lit(0)).cast("long").alias("y"),
        )
    )
    sized = pts.select(
        F.explode(
            F.array(*[F.lit(w).cast("long") for w in sizes])
        ).alias("w"),
        "x",
        "y",
    ).select(
        "w", "x", "y", F.expr("x div w").alias("g")
    )
    # complete windows only: exactly w days present
    grp = sized.groupBy("w", "g").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").cast("long").alias("sw")
    ).where(F.col("cnt") == F.col("w"))
    dev = sized.join(grp, ["w", "g"]).select(
        "w",
        "g",
        "x",
        (F.col("w") * F.col("y") - F.col("sw")).cast("long").alias("dev"),
    )
    wspec = (
        Window.partitionBy("w", "g")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    z = dev.select(
        "w", "g", "dev", F.sum("dev").over(wspec).alias("z")
    )
    per = z.groupBy("w", "g").agg(
        (F.max("z") - F.min("z")).cast("long").alias("r"),
        F.sum(F.col("dev") * F.col("dev")).cast("long").alias("ssd"),
    ).where(F.col("ssd") > 0)
    rs = per.select(
        "w",
        F.round(
            F.lit(1_000_000.0)
            * F.col("r")
            * F.sqrt(F.col("w").cast("double"))
            / F.sqrt(F.col("ssd").cast("double")),
            0,
        ).cast("long").alias("rs"),
    )
    means = rs.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.expr("CAST(sum(rs) div count(1) AS BIGINT)").alias(
            "mean_rs_micros"
        ),
    )
    pts2 = means.select(
        "w",
        "n_windows",
        "mean_rs_micros",
        F.round(F.log(F.col("w").cast("double")) * 1_000_000, 0)
        .cast("long").alias("lx"),
        F.round(
            F.log(F.col("mean_rs_micros").cast("double") / 1_000_000.0)
            * 1_000_000,
            0,
        ).cast("long").alias("ly"),
    )
    sl = pts2.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("lx").cast("long").alias("sx"),
        F.sum("ly").cast("long").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).cast("long").alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).cast("long").alias("sxx"),
    ).select(
        F.when(
            (F.col("k") >= 2)
            & (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx") > 0),
            F.round(
                (
                    F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")
                ).cast("double")
                / (
                    F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
                ).cast("double"),
                6,
            ),
        ).alias("hurst")
    )
    return means.crossJoin(F.broadcast(sl)).select(
        "w", "n_windows", "mean_rs_micros", "hurst"
    )


def anova_oneway(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """One row (n_groups, n_total, ssb_cents2, ssw_cents2,
    f_stat_micros, eta_sq_micros) — one-way ANOVA of per-event
    ``value`` across the levels of ``group_col``: does ANY event type
    carry a different mean value, before :func:`welch_ttest` asks about
    a specific pair?  eta² = SSB/(SSB+SSW) is the effect size (share of
    value variance explained by the grouping) — the screening statistic
    a metrics pipeline runs across every categorical dimension before
    drilling into pairwise tests.

    Exactness: the distributed pass produces three BIGINTs per group
    (n, Σc, Σc², cents = round(100·value), the :func:`welch_ttest`
    moments); the group table is vocabulary-sized, so it collects
    (codebook discipline) and the sums of squares run in EXACT
    arbitrary-precision Python ints — per-group S²/n terms by
    truncating division (DuckDB ``//`` mirror), F and eta² returned as
    truncating-division micros, no float anywhere.  NULL F when g < 2,
    N ≤ g, or SSW = 0.

    Scale shape: ONE map-side-combined groupBy over the facts; the
    driver sees g rows of three longs — nothing else leaves the
    executors regardless of N."""
    from graphlite_spark.operators.similarity import _trunc_div

    spark = events.sparkSession
    schema = (
        "n_groups long, n_total long, ssb_cents2 long, ssw_cents2 long,"
        " f_stat_micros long, eta_sq_micros long"
    )
    cents = F.round(F.col(value_col) * 100).cast("long")
    per = (
        events.select(F.col(group_col).alias("g"), cents.alias("c"))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("c").cast("long").alias("s"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("q"),
        )
        .collect()
    )
    g = len(per)
    if g == 0:
        return spark.createDataFrame([], schema)
    n_tot = sum(int(r["n"]) for r in per)
    s_tot = sum(int(r["s"]) for r in per)
    q_tot = sum(int(r["q"]) for r in per)
    sb_terms = sum(
        _trunc_div(int(r["s"]) * int(r["s"]), int(r["n"])) for r in per
    )
    ssb = sb_terms - _trunc_div(s_tot * s_tot, n_tot)
    ssw = q_tot - sb_terms
    f_m = None
    if g >= 2 and n_tot > g and ssw * (g - 1) > 0:
        f_m = _trunc_div(1_000_000 * ssb * (n_tot - g), ssw * (g - 1))
    eta = None
    if ssb + ssw > 0:
        eta = _trunc_div(1_000_000 * ssb, ssb + ssw)
    return spark.createDataFrame(
        [(g, n_tot, ssb, ssw, f_m, eta)], schema
    )


def spearman_activity_value(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """One row (n_users, num_xy, den_x, den_y, rho_spearman) —
    Spearman rank correlation between each user's event COUNT and
    total VALUE: does being more active go with spending more, robust
    to the heavy tails both distributions carry (Pearson on the raw
    pair would be dominated by the top spenders)?  The monotone-
    association companion to :func:`ols_user_value`'s linear fit and
    :func:`behavior_correlations`' per-pair Pearson.

    Exactness: proper tie handling via AVERAGE ranks carried as
    DOUBLED integers (a tie group starting after ``cb`` smaller users
    with ``ct`` members has 2·avg_rank = 2·cb + ct + 1 — always an
    exact BIGINT); the five Pearson moments over the doubled ranks are
    exact BIGINT sums, and ρ is ONE closed-form double
    (num / sqrt(den_x·den_y), each factor cast int→double before the
    product so nothing passes 9.2e18), rounded 6dp.  NULL ρ when
    either margin is constant.

    Scale shape: one map-side-combined groupBy to the per-user table;
    each rank table is a groupBy to DISTINCT values + one ordered
    prefix window over that value table (vocabulary-sized for counts;
    at most user-sized for value totals — the global-order step any
    exact ranking needs, stated); two equi-joins back; one single-row
    aggregate."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    per = events.groupBy(F.col(user_col).alias("u")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(cents).cast("long").alias("val"),
    )

    def rank2(frame: DataFrame, col: str, out: str) -> DataFrame:
        voc = frame.groupBy(col).agg(
            F.count(F.lit(1)).cast("long").alias("ct")
        )
        w = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, -1
        )
        r = voc.select(
            col,
            (
                2 * F.coalesce(F.sum("ct").over(w), F.lit(0))
                + F.col("ct")
                + 1
            ).cast("long").alias(out),
        )
        return frame.join(r, col)

    ranked = rank2(rank2(per, "cnt", "rx"), "val", "ry")
    ag = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).cast("long").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("long").alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).cast("long").alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "long"
    )
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "long"
    )
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "long"
    )
    return ag.select(
        F.col("n").alias("n_users"),
        num.alias("num_xy"),
        dx.alias("den_x"),
        dy.alias("den_y"),
        F.when(
            (dx > 0) & (dy > 0),
            F.round(
                num
                / F.sqrt(dx.cast("double") * dy.cast("double")),
                6,
            ),
        ).alias("rho_spearman"),
    )


def binseg_changepoint(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """One row (split_x, n_days, sse_total_micros, sse_split_micros,
    gain_micros, mean_left_micros, mean_right_micros) — the single
    best binary-segmentation changepoint of the zero-filled DAILY
    event-count series: the split day x (left = days 0..x, right =
    x+1..D−1, both non-empty) minimizing SSE_left + SSE_right, ties to
    the earliest day.  The level-shift locator behind
    :func:`cusum_changepoint`'s sequential alarm and
    :func:`daily_anomaly_z`'s pointwise flags: WHERE did the traffic
    regime change, and how much variance does one split explain?

    Exactness: daily counts are exact BIGINTs on the calendar spine
    (the :func:`hurst_rs` device); prefix sums give each segment's
    (n, S, Q); every SSE is ``10⁶·Q − (10⁶·S²) div n`` — truncating
    integer division mirrored by DuckDB ``//`` — so the argmin and all
    outputs are hash-exact integers, no float anywhere.

    Scale shape: one map-side daily groupBy over the facts; the split
    scan is one prefix window + one TakeOrderedAndProject over the
    calendar-bounded day table (D rows — never data-sized)."""
    daily = events.groupBy(
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    rng = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    pts = (
        rng.select(
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d"),
            "lo",
        )
        .join(daily, "d", "left")
        .select(
            (F.col("d") - F.col("lo")).cast("long").alias("x"),
            F.coalesce("y", F.lit(0)).cast("long").alias("y"),
        )
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    pre = pts.select(
        "x",
        F.sum("y").over(w).cast("long").alias("cs"),
        F.sum(F.col("y") * F.col("y")).over(w).cast("long").alias("cq"),
    )
    tot = pre.agg(
        F.max(F.col("x") + 1).cast("long").alias("dd"),
        F.max("cs").cast("long").alias("s"),
        F.max("cq").cast("long").alias("q"),
    )
    j = pre.crossJoin(F.broadcast(tot)).where(
        F.col("x") + 1 < F.col("dd")
    )
    scored = j.select(
        "x",
        "dd",
        F.expr("x + 1").cast("long").alias("nl"),
        F.expr("dd - x - 1").cast("long").alias("nr"),
        F.col("cs").alias("sl"),
        F.expr("s - cs").cast("long").alias("sr"),
        F.expr(
            "1000000 * q"
            " - (1000000 * cs * cs) div (x + 1)"
            " - (1000000 * (s - cs) * (s - cs)) div (dd - x - 1)"
        ).cast("long").alias("sse_split_micros"),
        F.expr("1000000 * q - (1000000 * s * s) div dd")
        .cast("long").alias("sse_total_micros"),
    )
    best = (
        scored.orderBy(F.col("sse_split_micros").asc(), F.col("x").asc())
        .limit(1)
        .select(
            F.col("x").alias("split_x"),
            F.col("dd").alias("n_days"),
            "sse_total_micros",
            "sse_split_micros",
            (
                F.col("sse_total_micros") - F.col("sse_split_micros")
            ).cast("long").alias("gain_micros"),
            F.expr("(1000000 * sl) div nl").cast("long").alias(
                "mean_left_micros"
            ),
            F.expr("(1000000 * sr) div nr").cast("long").alias(
                "mean_right_micros"
            ),
        )
    )
    return best


def forecast_backtest_mase(
    events: DataFrame,
    alpha_num: int = 1,
    alpha_den: int = 4,
    ts_col: str = "ts",
) -> DataFrame:
    """One row (n_days, mae_naive_micros, mae_ewma_micros,
    mase_micros) — one-step-ahead forecast BACKTEST of the
    :func:`ewma_daily` smoother against the naive forecast
    (ŷ_t = y_{t−1}) on the zero-filled daily count series: MASE < 10⁶
    (i.e. < 1) means the smoother genuinely beats persistence
    (Hyndman & Koehler 2006, public literature) — the accept/reject
    gate before trusting :func:`holt_linear`-style extrapolations.

    Both error series cover exactly days 1..D−1 (the t = 0 forecast
    is undefined for both models, NULL-skipped identically), so the
    MAE denominators agree and ``mase_micros =
    (10⁶·Σ|ewma resid|) div Σ|naive err|`` needs no day alignment.

    Exactness: ewma residuals are already exact truncated micros; the
    naive error is ``10⁶·|y_t − y_{t−1}|`` exactly; both sums are
    BIGINT; the three outputs are truncating divisions.  NULL MASE
    when the naive error sum is zero (constant series).

    Scale shape: inherits :func:`ewma_daily`'s one daily groupBy +
    calendar-bounded fold; the backtest adds one lag window and one
    single-row aggregate over the day table."""
    ew = ewma_daily(events, alpha_num, alpha_den, ts_col)
    w = Window.orderBy("d")
    errs = ew.select(
        "resid_micros",
        (
            1_000_000 * F.abs(F.col("y") - F.lag("y").over(w))
        ).cast("long").alias("naive_err"),
    )
    ag = errs.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.abs(F.col("resid_micros"))).cast("long").alias("se"),
        F.sum("naive_err").cast("long").alias("sn"),
    )
    return ag.select(
        "n_days",
        F.when(
            F.col("n_days") > 1, F.expr("sn div (n_days - 1)")
        ).cast("long").alias("mae_naive_micros"),
        F.when(
            F.col("n_days") > 1, F.expr("se div (n_days - 1)")
        ).cast("long").alias("mae_ewma_micros"),
        F.when(
            F.col("sn") > 0, F.expr("(1000000 * se) div sn")
        ).cast("long").alias("mase_micros"),
    )


def rbo_activity_value(
    events: DataFrame,
    depth: int = 20,
    p_num: int = 9,
    p_den: int = 10,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """(d, overlap, term_micros, rbo_cum_micros) — Rank-Biased Overlap
    (Webber, Moffat & Zobel 2010, public literature) between the
    activity-count ranking and the total-value ranking of users,
    truncated at ``depth``: at each prefix d the overlap of the two
    top-d sets contributes ``(1−p)·p^{d−1}·|A_d ∩ B_d|/d``.  The
    SET-AT-EVERY-DEPTH companion to :func:`spearman_activity_value`'s
    whole-population coefficient: Spearman says whether the margins
    agree overall, RBO says whether the LEADERBOARDS agree where it
    matters (top-weighted, prefix by prefix).

    Exactness: ranks are deterministic row_numbers with (metric DESC,
    user ASC) ties; overlaps are exact counts; the geometric weights
    ride as PYTHON-PRECOMPUTED integer powers (p_num^{d−1}, p_den^d —
    the same literals embedded in the oracle's HUGEINT lists, since
    p_den^depth passes 9.2e18), each term one truncating division,
    the cumulative sum exact.

    Scale shape: one map-side-combined groupBy to the per-user table;
    two global rank windows (the exact-leaderboard sort any top-d
    comparison needs, stated); the depth×rank overlap join runs on
    rows already filtered to rank ≤ depth — ≤2·depth rows — and the
    term arithmetic on the collected ≤depth-row table."""
    from graphlite_spark.operators.similarity import _trunc_div

    spark = events.sparkSession
    schema = (
        "d long, overlap long, term_micros long, rbo_cum_micros long"
    )
    cents = F.round(F.col(value_col) * 100).cast("long")
    per = events.groupBy(F.col(user_col).alias("u")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(cents).cast("long").alias("val"),
    )
    wa = Window.orderBy(F.col("cnt").desc(), F.col("u").asc())
    wb = Window.orderBy(F.col("val").desc(), F.col("u").asc())
    ranked = per.select(
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wb).alias("rb"),
    ).where((F.col("ra") <= depth) & (F.col("rb") <= depth))
    ds = spark.range(1, depth + 1).select(F.col("id").alias("d"))
    ov = (
        ds.join(
            F.broadcast(ranked),
            (F.col("ra") <= F.col("d")) & (F.col("rb") <= F.col("d")),
            "left",
        )
        .groupBy("d")
        .agg(
            F.count(F.col("ra")).cast("long").alias("overlap")
        )
        .orderBy("d")
        .collect()
    )
    out = []
    cum = 0
    for r in ov:
        d = int(r["d"])
        o = int(r["overlap"])
        term = _trunc_div(
            1_000_000 * (p_den - p_num) * p_num ** (d - 1) * o,
            p_den ** d * d,
        )
        cum += term
        out.append((d, o, term, cum))
    return spark.createDataFrame(out, schema)


def seg_vopt_daily(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Three rows (seg, start_x, end_x, n_days, mean_micros,
    sse_micros) — the OPTIMAL 3-piece segmentation of the zero-filled
    daily count series (v-optimal histogram, Jagadish et al. 1998,
    public literature): the two split points that jointly minimize
    total within-segment SSE, by exact dynamic programming — the
    multi-split completion of :func:`binseg_changepoint`'s single
    greedy cut (greedy binseg is NOT optimal for k > 1; this is).

    Exactness: segment costs are the binseg device — prefix sums give
    ``cost(i,j) = 10⁶·ΔQ − (10⁶·ΔS²) div n`` — and the DP layers take
    (score, split) STRUCT minima, so ties break to the earliest split
    identically in both engines; every number is a BIGINT.

    Scale shape: one map-side daily groupBy over the facts; the cost
    table and two DP layers are windows/joins over the
    calendar-bounded day table (D² pairs of exact ints, never
    data-sized — a year is 133k pairs)."""
    daily = events.groupBy(
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    rng = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    pts = (
        rng.select(
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d"),
            "lo",
        )
        .join(daily, "d", "left")
        .select(
            (F.col("d") - F.col("lo")).cast("long").alias("x"),
            F.coalesce("y", F.lit(0)).cast("long").alias("y"),
        )
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    pre = pts.select(
        "x",
        F.sum("y").over(w).cast("long").alias("cs"),
        F.sum(F.col("y") * F.col("y")).over(w).cast("long").alias("cq"),
    ).persist()
    # cost(i, j) for 0 <= i <= j <= D-1, via prefix rows i-1 and j
    pi = pre.select(
        (F.col("x") + 1).alias("i"),
        F.col("cs").alias("ps"),
        F.col("cq").alias("pq"),
    ).unionByName(
        pre.sparkSession.createDataFrame(
            [(0, 0, 0)], "i long, ps long, pq long"
        )
    )
    cost = (
        pi.join(pre, pi["i"] <= pre["x"])
        .select(
            F.col("i"),
            F.col("x").alias("j"),
            F.expr(
                "1000000 * (cq - pq)"
                " - (1000000 * (cs - ps) * (cs - ps)) div (x - i + 1)"
            ).cast("long").alias("c"),
        )
        .persist()
    )
    dd = pre.count()
    if dd < 3:
        pre.unpersist()
        cost.unpersist()
        return events.sparkSession.createDataFrame(
            [],
            "seg long, start_x long, end_x long, n_days long,"
            " mean_micros long, sse_micros long",
        )
    dp1 = cost.where(F.col("i") == 0).select(
        F.col("j"), F.col("c").alias("v1")
    )
    # dp2(j) = min_{i <= j-1} dp1(i) + cost(i+1, j), tie -> smallest i
    dp2 = (
        dp1.alias("a")
        .join(
            cost.alias("b"),
            F.expr("b.i = a.j + 1"),
        )
        .groupBy(F.col("b.j").alias("j"))
        .agg(
            F.min(
                F.struct(
                    (F.col("a.v1") + F.col("b.c")).alias("v"),
                    F.col("a.j").alias("split1"),
                )
            ).alias("m")
        )
        .select("j", F.col("m.v").alias("v2"), F.col("m.split1").alias("s1"))
    )
    # final layer at j = D-1: min over i of dp2(i) + cost(i+1, D-1)
    last = (
        dp2.alias("a")
        .join(
            cost.alias("b"),
            F.expr(f"b.i = a.j + 1 and b.j = {dd - 1}"),
        )
        .select(
            F.struct(
                (F.col("a.v2") + F.col("b.c")).alias("v"),
                F.col("a.j").alias("split2"),
                F.col("a.s1").alias("split1"),
            ).alias("t")
        )
        .agg(F.min("t").alias("m"))
        .select(
            F.col("m.split1").alias("s1"), F.col("m.split2").alias("s2")
        )
        .first()
    )
    s1, s2 = int(last["s1"]), int(last["s2"])
    bounds = [(1, 0, s1), (2, s1 + 1, s2), (3, s2 + 1, dd - 1)]
    pr = {int(r["x"]): (int(r["cs"]), int(r["cq"])) for r in pre.collect()}
    pre.unpersist()
    cost.unpersist()

    def seg_stats(a: int, b: int):
        ps, pq = pr[a - 1] if a > 0 else (0, 0)
        cs, cq = pr[b]
        n = b - a + 1
        s, q = cs - ps, cq - pq
        mean = ((1_000_000 * abs(s)) // n) * (1 if s >= 0 else -1)
        sse = 1_000_000 * q - (1_000_000 * s * s) // n
        return n, mean, sse

    out = []
    for seg, a, b in bounds:
        n, mean, sse = seg_stats(a, b)
        out.append((seg, a, b, n, mean, sse))
    return events.sparkSession.createDataFrame(
        out,
        "seg long, start_x long, end_x long, n_days long,"
        " mean_micros long, sse_micros long",
    )


def diff_in_diff(
    events: DataFrame,
    type_treat: str = "purchase",
    type_control: str = "click",
    ts_col: str = "ts",
) -> DataFrame:
    """One row (n_days, split_x, pre_treat_micros, post_treat_micros,
    pre_ctrl_micros, post_ctrl_micros, did_micros) — difference-in-
    differences of MEAN DAILY VOLUME between a treated and a control
    event type around the calendar midpoint: did = (post_T − pre_T) −
    (post_C − pre_C).  The parallel-trends workhorse that completes
    the experimentation family (:func:`cuped_adjustment` reduces
    variance, :func:`quantile_treatment_effect` looks beyond the mean,
    DiD nets out the common time shock).

    Exactness: a period's mean daily count is ``(10⁶·total events in
    period) div period_days`` — the zero-filled day spine is implicit
    in the denominator, so no per-day table is even needed; the four
    means and the DiD are exact truncating-division micros.  The
    split is ``mid = D div 2`` (pre = days 0..mid−1, post = the
    rest); rows outside [lo, hi] cannot exist by construction.

    Scale shape: one map-side-combined 4-cell conditional aggregate
    over the facts + one 1-row bounds aggregate — nothing else."""
    day = F.expr(f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}")
    typed = events.select(
        day.alias("d"), F.col("event_type").alias("t")
    )
    rng = typed.agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    )
    j = typed.crossJoin(F.broadcast(rng)).select(
        "t",
        (F.col("d") - F.col("lo")).alias("x"),
        (F.col("hi") - F.col("lo") + 1).cast("long").alias("dd"),
    )
    cells = j.agg(
        F.max("dd").cast("long").alias("dd"),
        *[
            F.sum(
                (
                    (F.col("t") == ty)
                    & (
                        (F.col("x") < F.expr("dd div 2"))
                        if pre
                        else (F.col("x") >= F.expr("dd div 2"))
                    )
                ).cast("long")
            ).cast("long").alias(name)
            for ty, pre, name in [
                (type_treat, True, "ta"),
                (type_treat, False, "tb"),
                (type_control, True, "ca"),
                (type_control, False, "cb"),
            ]
        ],
    )
    return cells.select(
        F.col("dd").alias("n_days"),
        F.expr("dd div 2").cast("long").alias("split_x"),
        F.expr("(1000000 * ta) div (dd div 2)").cast("long").alias(
            "pre_treat_micros"
        ),
        F.expr("(1000000 * tb) div (dd - dd div 2)").cast("long").alias(
            "post_treat_micros"
        ),
        F.expr("(1000000 * ca) div (dd div 2)").cast("long").alias(
            "pre_ctrl_micros"
        ),
        F.expr("(1000000 * cb) div (dd - dd div 2)").cast("long").alias(
            "post_ctrl_micros"
        ),
        F.expr(
            "((1000000 * tb) div (dd - dd div 2)"
            " - (1000000 * ta) div (dd div 2))"
            " - ((1000000 * cb) div (dd - dd div 2)"
            " - (1000000 * ca) div (dd div 2))"
        ).cast("long").alias("did_micros"),
    ).where(F.col("n_days") >= 2)


def logrank_purchasers(
    events: DataFrame,
    treat_type: str = "purchase",
    unit_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """One row (n_times, deaths_a, deaths_b, expected_a_micros,
    var_micros, z2_micros) — the log-rank (Mantel–Cox) two-sample test
    comparing the :func:`kaplan_meier` lifetime distributions of
    group A (units whose ``treat_type`` SHARE exceeds the corpus-wide
    share — the exact cross-multiplied test ``p_u·N > P·n_u``, no
    division; a mere has-one flag degenerates to one group once every
    unit has every type) against everyone else: at each pooled death
    time the observed group-A deaths are
    compared with the hypergeometric expectation d·n_a/n, and
    Z² = (Σ(d_a − E_a))² / Σ V with
    V = d·n_a·n_b·(n−d) / (n²·(n−1)).  Completes the survival family
    (KM estimates the curve, Nelson–Aalen the hazard, log-rank TESTS
    the difference) — the churn question "do purchasers live longer?"
    asked properly, with censoring handled.

    Lifetime/censoring definitions are exactly
    :func:`kaplan_meier`'s: lifetime = last-active-day − first-active-
    day; units last active on the corpus horizon are censored.

    Exactness: every expectation/variance term is a chained
    remainder-subtract truncating division in micro units —
    ``e = (10⁶·d·n_a) div n``; ``v = ((e·n_b) div n · (n−d)) div
    (n−1)`` — each step an exact BIGINT (bound: 10⁶·d·n_a ≤ 10⁶·N²,
    inside BIGINT through N ≈ 50k units per slice, the chi-square
    tier's stated bound); the final Z² is ``OmE² div ΣV`` with OmE in
    micros (exact through |OmE| ≈ 3·10⁹ micros).  Times with n < 2
    at risk contribute no variance and are excluded (standard).

    Scale shape: one map-side-combined per-unit aggregate, a 1-row
    horizon broadcast, then day-granularity tables only — the at-risk
    cumsum windows are per-group over calendar-bounded rows, and the
    final statistic is one scalar rollup."""
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
    )
    per = events.groupBy(F.col(unit_col).alias("u")).agg(
        F.min(day).alias("first_d"),
        F.max(day).alias("last_d"),
        F.count(F.lit(1)).cast("long").alias("n_u"),
        F.sum(
            (F.col("event_type") == treat_type).cast("long")
        ).cast("long").alias("p_u"),
    )
    hi = events.agg(
        F.max(day).alias("hi"),
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum(
            (F.col("event_type") == treat_type).cast("long")
        ).cast("long").alias("pp"),
    )
    lives = per.crossJoin(F.broadcast(hi)).select(
        (
            F.col("p_u") * F.col("nn") > F.col("pp") * F.col("n_u")
        ).cast("int").alias("g"),
        (F.col("last_d") - F.col("first_d")).alias("t"),
        (F.col("last_d") == F.col("hi")).cast("int").alias("censored"),
    )
    durs = lives.groupBy("g", "t").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum(F.lit(1) - F.col("censored")).cast("long").alias("d"),
    )
    # dense (t × group) grid so the descending at-risk cumsum is
    # defined at every POOLED time for BOTH groups (zero-filled rows)
    spine = durs.select("t").distinct()
    grid = (
        spine.crossJoin(
            durs.sparkSession.range(2).select(
                F.col("id").cast("int").alias("g")
            )
        )
        .join(durs, ["g", "t"], "left")
        .select(
            "g", "t",
            F.coalesce("c", F.lit(0)).cast("long").alias("c"),
            F.coalesce("d", F.lit(0)).cast("long").alias("d"),
        )
    )
    wd = (
        Window.partitionBy("g")
        .orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = grid.select(
        "g", "t", "d", F.sum("c").over(wd).cast("long").alias("n")
    )
    a = risk.where(F.col("g") == 1).select(
        "t", F.col("d").alias("da"), F.col("n").alias("na")
    )
    b = risk.where(F.col("g") == 0).select(
        "t", F.col("d").alias("db"), F.col("n").alias("nb")
    )
    times = (
        a.join(b, "t")
        .where((F.col("da") + F.col("db")) > 0)
        .where((F.col("na") + F.col("nb")) >= 2)
        .select(
            "t", "da", "db", "na", "nb",
            (F.col("da") + F.col("db")).alias("dt"),
            (F.col("na") + F.col("nb")).alias("nt"),
        )
        .select(
            "t", "da", "db",
            F.expr("(1000000 * dt * na) div nt").cast("long").alias("e"),
            "na", "nb", "dt", "nt",
        )
        .select(
            "t", "da", "db", "e",
            F.expr(
                "(((e * nb) div nt) * (nt - dt)) div (nt - 1)"
            ).cast("long").alias("v"),
        )
    )
    agg = times.agg(
        F.count(F.lit(1)).cast("long").alias("n_times"),
        F.sum("da").cast("long").alias("deaths_a"),
        F.sum("db").cast("long").alias("deaths_b"),
        F.sum("e").cast("long").alias("expected_a_micros"),
        F.sum("v").cast("long").alias("var_micros"),
    )
    ome = F.lit(1_000_000) * F.col("deaths_a") - F.col(
        "expected_a_micros"
    )
    return agg.select(
        "n_times", "deaths_a", "deaths_b",
        "expected_a_micros", "var_micros",
        F.when(
            F.col("var_micros") > 0,
            ((ome * ome - (ome * ome) % F.col("var_micros"))
             / F.col("var_micros")).cast("long"),
        ).alias("z2_micros"),
    )


def kendall_tau_daily(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """One row (n_days, n_pairs, concordant, discordant, ties_x,
    ties_y, ties_both, tau_a_micros) — Kendall's rank correlation
    between DAILY EVENT VOLUME and DAILY DISTINCT USERS, counted over
    every unordered day pair: do busier days also reach more people,
    monotonically?  The pair-counting companion to
    :func:`spearman_activity_value` (Spearman ranks once and
    correlates; Kendall scores every pair's agreement, so a single
    wild day moves it by at most its pair count).

    τ_a = (C − D) / (n(n−1)/2) in exact micros via the remainder-
    subtract truncating division (numerator may be negative — the
    subtract-remainder form divides an exact multiple, so Spark's
    toward-zero and DuckDB's floor semantics agree).  Tie pairs are
    reported in all three flavours (x-only, y-only, both) so τ_b's
    denominator is derivable; τ_b itself needs a square root and is
    left to the caller (documented).

    Scale shape: facts reduce to ONE calendar-bounded daily aggregate
    (map-side combined count + distinct-user count); the pair join is
    day² — at 10 years that is ~6.7M pairs, a broadcast-sized
    self-join of a tiny table, independent of event count."""
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
    )
    daily = events.groupBy(day.alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.count_distinct("user_id").cast("long").alias("y"),
    )
    p1 = daily.select(
        F.col("d").alias("d1"), F.col("x").alias("x1"),
        F.col("y").alias("y1"),
    )
    p2 = daily.select(
        F.col("d").alias("d2"), F.col("x").alias("x2"),
        F.col("y").alias("y2"),
    )
    pairs = p1.join(F.broadcast(p2), F.col("d1") < F.col("d2")).select(
        ((F.col("x2") - F.col("x1")) * (F.col("y2") - F.col("y1")))
        .alias("prod"),
        (F.col("x1") == F.col("x2")).cast("int").alias("tx"),
        (F.col("y1") == F.col("y2")).cast("int").alias("ty"),
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum((F.col("prod") > 0).cast("long")).cast("long").alias(
            "concordant"
        ),
        F.sum((F.col("prod") < 0).cast("long")).cast("long").alias(
            "discordant"
        ),
        F.sum(
            ((F.col("tx") == 1) & (F.col("ty") == 0)).cast("long")
        ).cast("long").alias("ties_x"),
        F.sum(
            ((F.col("tx") == 0) & (F.col("ty") == 1)).cast("long")
        ).cast("long").alias("ties_y"),
        F.sum(
            ((F.col("tx") == 1) & (F.col("ty") == 1)).cast("long")
        ).cast("long").alias("ties_both"),
    )
    nd = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    cd = F.lit(1_000_000) * (F.col("concordant") - F.col("discordant"))
    return agg.crossJoin(F.broadcast(nd)).select(
        "n_days", "n_pairs", "concordant", "discordant",
        "ties_x", "ties_y", "ties_both",
        F.when(
            F.col("n_pairs") > 0,
            ((cd - cd % F.col("n_pairs")) / F.col("n_pairs"))
            .cast("long"),
        ).alias("tau_a_micros"),
    )


def cramers_v2_type_dow(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """One row (n_events, dof, k_min, v2_micros) — squared Cramér's V
    association between event_type and epoch weekday: V² = χ² / (N ·
    min(r−1, c−1)), the [0, 1]-normalized effect size that
    :func:`chi_square_type_dow`'s raw statistic lacks (χ² grows with N
    even for a fixed association strength; V² does not).  V itself is
    the square root and is left to the caller (documented — the
    micros discipline keeps everything rational).

    Exactness: χ²_micros is chi_square_type_dow's exact sum; one more
    truncating division by the exact BIGINT N·min(r−1, c−1).

    Scale shape: chi_square_type_dow's (one lattice groupBy + scalar
    rollup) plus one 1-row broadcast cross join."""
    chi = chi_square_type_dow(events, ts_col=ts_col)
    n = events.agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    return chi.crossJoin(F.broadcast(n)).select(
        "n_events",
        "dof",
        F.least(
            F.col("n_types") - 1, F.col("n_dows") - 1
        ).cast("long").alias("k_min"),
        F.when(
            F.col("n_events")
            * F.least(F.col("n_types") - 1, F.col("n_dows") - 1)
            > 0,
            F.expr(
                "chi2_micros div (n_events"
                " * least(n_types - 1, n_dows - 1))"
            ).cast("long"),
        ).alias("v2_micros"),
    )


def morans_i_activity(
    events: DataFrame,
    ts_col: str = "ts_us",
) -> DataFrame:
    """One row (n_vertices, w_edges, num_scaled, den_scaled,
    morans_i_micros) — Moran's I spatial autocorrelation (Moran 1950,
    public literature) of PER-USER ACTIVITY over the temporal contact
    graph: do users who contact each other have similar event volumes?
    I = (n/W) · Σ_{(i,j)∈E} (x_i−x̄)(x_j−x̄) / Σ_i (x_i−x̄)² with
    binary symmetric weights over the undirected contact closure —
    positive = hubs talk to hubs (the value-level cousin of
    :func:`~graphlite_spark.algos.stats.degree_assortativity`, which
    correlates DEGREES; this correlates an arbitrary vertex signal).

    Vertex universe: edge-incident users (isolates have no neighbors
    and standard Moran's I drops them — stated); x̄ is over that set.

    Exactness: scale deviations by n (dev_i = n·x_i − S, exact
    BIGINT), then I = n·Σ_E dev_i·dev_j / (W·Σ dev²) is an exact
    rational; one remainder-subtract micros division at the end
    (numerator may be NEGATIVE — dissortative mixing).  BIGINT bound:
    n²·x_max²·W — exact through ~10⁵ edge-incident users at
    contact-graph densities (stated; the assortativity family's
    documented tier).

    Scale shape: contact edges are |events|-sparse by construction
    (one lag window); the closure is one distinct; the signal join is
    two vertex-sized equi-joins; everything else is map-side-combined
    scalar rollups.  NULL when the activity signal is constant
    (den = 0)."""
    from graphlite_spark.operators.temporal import contact_edges

    ce = contact_edges(events, ts_col=ts_col).select("src", "dst")
    und = (
        ce.unionByName(
            ce.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
    )
    verts = und.select(F.col("src").alias("u")).distinct()
    x = events.groupBy(F.col("user_id").alias("u")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    ).join(verts, "u")
    tot = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    dev = x.crossJoin(F.broadcast(tot)).select(
        "u",
        (F.col("n") * F.col("x") - F.col("s")).cast("long").alias("dv"),
        "n",
    )
    den1 = dev.agg(
        F.sum(F.col("dv") * F.col("dv")).cast("long").alias("den1"),
        F.max("n").cast("long").alias("n"),
    )
    ds = dev.select(F.col("u").alias("src"), F.col("dv").alias("dvs"))
    dd = dev.select(F.col("u").alias("dst"), F.col("dv").alias("dvd"))
    ej = und.join(ds, "src").join(dd, "dst").agg(
        F.sum(F.col("dvs") * F.col("dvd")).cast("long").alias("nume"),
        F.count(F.lit(1)).cast("long").alias("w"),
    )
    out = ej.crossJoin(F.broadcast(den1)).select(
        F.col("n").alias("n_vertices"),
        F.col("w").alias("w_edges"),
        (F.col("n") * F.col("nume")).cast("long").alias("num_scaled"),
        (F.col("w") * F.col("den1")).cast("long").alias("den_scaled"),
    )
    num = F.lit(1_000_000) * F.col("num_scaled")
    return out.select(
        "n_vertices", "w_edges", "num_scaled", "den_scaled",
        F.when(
            F.col("den_scaled") > 0,
            ((num - num % F.col("den_scaled")) / F.col("den_scaled"))
            .cast("long"),
        ).alias("morans_i_micros"),
    )


def assoc_rules_types(events: DataFrame) -> DataFrame:
    """(type_a, type_b, n_ab, support_micros, confidence_micros,
    lift_micros) — directional association rules a → b over per-user
    event-type baskets: support = P(a ∧ b), confidence = P(b | a),
    lift = P(a ∧ b)/(P(a)·P(b)) — the market-basket readout.  The
    DIRECTIONAL companion to the symmetric PMI co-occurrence: lift is
    PMI's ratio un-logged, and confidence is the actionable "users who
    do a also do b" number PMI cannot give.

    Exactness: all three are truncating micros divisions of exact
    BIGINT user counts — ``lift = (10⁶·N·n_ab) div (n_a·n_b)`` (bound
    10⁶·N², exact through N ≈ 3M users — stated).

    Scale shape: baskets are one distinct projection; the pair join is
    an equi-join ON USER whose per-key fan-out is bounded by the
    event-type codebook (|types|² per user, never data-sized); the
    marginal and total joins broadcast codebook-sized tables."""
    ut = events.select(
        F.col("user_id").alias("u"), F.col("event_type").alias("t")
    ).distinct()
    nt = ut.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("n"))
    nn = ut.select("u").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("nn")
    )
    a = ut.select("u", F.col("t").alias("type_a"))
    b = ut.select("u", F.col("t").alias("type_b"))
    ab = (
        a.join(b, "u")
        .where(F.col("type_a") != F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    na = nt.select(F.col("t").alias("type_a"), F.col("n").alias("n_a"))
    nb = nt.select(F.col("t").alias("type_b"), F.col("n").alias("n_b"))
    return (
        ab.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .crossJoin(F.broadcast(nn))
        .select(
            "type_a", "type_b", "n_ab",
            F.expr("(1000000 * n_ab) div nn").cast("long").alias(
                "support_micros"
            ),
            F.expr("(1000000 * n_ab) div n_a").cast("long").alias(
                "confidence_micros"
            ),
            F.expr("(1000000 * nn * n_ab) div (n_a * n_b)")
            .cast("long").alias("lift_micros"),
        )
    )


def emd_type_daily(
    events: DataFrame,
    type_a: str = "purchase",
    type_b: str = "click",
    ts_col: str = "ts",
) -> DataFrame:
    """One row (n_a, n_b, n_spine_days, emd_scaled, emd_micros) — the
    1-D earth-mover (Wasserstein-1) distance, in units of DAYS,
    between the daily arrival distributions of two event types:
    W₁ = ∫|F_a − F_b| — how many user-days of probability mass must
    move to turn one type's timing profile into the other's.  The
    integral companion to the KS test (KS takes the max CDF gap, EMD
    its area — a sustained small lead that KS under-reports
    accumulates here).

    Exactness: on the shared day grid, |F_a − F_b| at day d is
    |cum_a·N_b − cum_b·N_a| / (N_a·N_b) — held constant until the next
    OCCUPIED day, so each spine row contributes its gap length
    (next_d − d) as an exact integer weight (the zero-filled day spine
    never materializes); one truncating micros division by N_a·N_b at
    the end.  BIGINT bound: 10⁶·N_a·N_b·span — exact through
    N ≈ 10⁵ per type at 10-year spans (stated).

    Scale shape: one map-side-combined (day, type) aggregate —
    calendar-bounded from there on (two cumsum windows over the day
    spine, one scalar rollup)."""
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
    )
    cells = (
        events.where(F.col("event_type").isin([type_a, type_b]))
        .groupBy(
            day.alias("d"),
            (F.col("event_type") == type_a).cast("int").alias("g"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    spine = cells.groupBy("d").agg(
        F.sum(F.when(F.col("g") == 1, F.col("c")).otherwise(0))
        .cast("long").alias("ca"),
        F.sum(F.when(F.col("g") == 0, F.col("c")).otherwise(0))
        .cast("long").alias("cb"),
    )
    wd = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wl = Window.orderBy("d")
    cum = spine.select(
        "d",
        F.sum("ca").over(wd).cast("long").alias("cua"),
        F.sum("cb").over(wd).cast("long").alias("cub"),
        F.coalesce(F.lead("d").over(wl) - F.col("d"), F.lit(1))
        .cast("long").alias("gap"),
    )
    tot = spine.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.count(F.lit(1)).cast("long").alias("n_spine_days"),
    )
    scored = cum.crossJoin(F.broadcast(tot)).select(
        "na", "nb", "n_spine_days",
        (
            F.abs(F.col("cua") * F.col("nb") - F.col("cub") * F.col("na"))
            * F.col("gap")
        ).cast("long").alias("t"),
    )
    return scored.groupBy("na", "nb", "n_spine_days").agg(
        F.sum("t").cast("long").alias("emd_scaled")
    ).select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        "n_spine_days",
        "emd_scaled",
        F.when(
            F.col("na") * F.col("nb") > 0,
            F.expr("(1000000 * emd_scaled) div (na * nb)").cast("long"),
        ).alias("emd_micros"),
    )


def cmh_purchase_value(
    events: DataFrame,
    type_a: str = "purchase",
    type_b: str = "click",
    ts_col: str = "ts",
) -> DataFrame:
    """One row (n_strata, sum_a, sum_e_micros, sum_v_micros,
    cmh_micros) — the Cochran–Mantel–Haenszel test of the
    event_type ↔ high-value association STRATIFIED BY WEEKDAY:
    within each day-of-week stratum, the 2×2 table of
    (type ∈ {a, b}) × (value above the global mean), and
    CMH = (Σaᵢ − ΣEᵢ)² / ΣVᵢ with the hypergeometric
    Eᵢ = n1ᵢm1ᵢ/Tᵢ, Vᵢ = n1ᵢn0ᵢm1ᵢm0ᵢ/(Tᵢ²(Tᵢ−1)).  The stratified
    completion of the association family: :func:`chi_square_type_dow`
    tests marginal independence, :func:`diff_in_diff` nets out time,
    CMH nets out the STRATUM (a weekday that shifts both margins
    cannot fake an association here — Simpson's-paradox-proof).

    "High value" is the exact cross-multiplied test
    ``cents·N > S_cents`` against the global mean over the two types'
    events (no division).  Strata with T < 2 contribute nothing
    (standard).

    Exactness: Eᵢ and Vᵢ ride the chained remainder-free truncating
    micros divisions ``e = (10⁶·n1·m1) div T``;
    ``v = (((e·n0) div T)·m0) div (T−1)`` — the log-rank discipline,
    mirrored step-for-step in the oracle; the final statistic is
    ``OmE² div ΣV`` with OmE in micros (may be negative, squared
    non-negative).

    Scale shape: one map-side-combined 7-stratum cell aggregate over
    the filtered facts + a 1-row global-mean broadcast — everything
    after lives on ≤ 7 rows."""
    cents = F.expr("cast(round(value * 100) as bigint)")
    src = events.where(
        F.col("event_type").isin([type_a, type_b])
    ).select(
        F.expr(
            f"cast((unix_micros(cast({ts_col} as timestamp))"
            f" div {DAY_US} + 3) % 7 as int)"
        ).alias("dow"),
        (F.col("event_type") == type_a).cast("int").alias("exp"),
        cents.alias("cents"),
    )
    tot = src.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("cents").cast("long").alias("sc"),
    )
    flagged = src.crossJoin(F.broadcast(tot)).select(
        "dow", "exp",
        (F.col("cents") * F.col("nn") > F.col("sc")).cast("int").alias(
            "hi"
        ),
    )
    cells = flagged.groupBy("dow").agg(
        F.sum((F.col("exp") * F.col("hi")).cast("long")).cast("long")
        .alias("a"),
        F.sum("exp").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("exp")).cast("long").alias("n0"),
        F.sum("hi").cast("long").alias("m1"),
        F.sum(F.lit(1) - F.col("hi")).cast("long").alias("m0"),
        F.count(F.lit(1)).cast("long").alias("t"),
    ).where(F.col("t") >= 2)
    terms = cells.select(
        "a",
        F.expr("(1000000 * n1 * m1) div t").cast("long").alias("e"),
        "n0", "m0", "t",
    ).select(
        "a", "e",
        F.expr("(((e * n0) div t) * m0) div (t - 1)")
        .cast("long").alias("v"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("a").cast("long").alias("sum_a"),
        F.sum("e").cast("long").alias("sum_e_micros"),
        F.sum("v").cast("long").alias("sum_v_micros"),
    )
    ome = F.lit(1_000_000) * F.col("sum_a") - F.col("sum_e_micros")
    return agg.select(
        "n_strata", "sum_a", "sum_e_micros", "sum_v_micros",
        F.when(
            F.col("sum_v_micros") > 0,
            ((ome * ome - (ome * ome) % F.col("sum_v_micros"))
             / F.col("sum_v_micros")).cast("long"),
        ).alias("cmh_micros"),
    )


def ccf_type_daily(
    events: DataFrame,
    type_a: str = "purchase",
    type_b: str = "click",
    max_lag: int = 7,
    ts_col: str = "ts",
) -> DataFrame:
    """(lag, n_days, num_scaled, ccf2_signed_micros) — the lead–lag
    CROSS-correlation between two event types' daily-count series at
    lags −max_lag..+max_lag: does click volume lead purchase volume,
    and by how many days?  Positive lag = type_a trails type_b by
    ``lag`` days (dev_a(t)·dev_b(t+lag)).  The two-series companion to
    :func:`acf_daily` — same zero-filled day spine, same n²-scaled
    integer deviations (dev = n·x − S per series; the n² factors
    cancel in the ratio).

    Normalization needs √(Σdev_a²·Σdev_b²), so the exact output is
    the SIGNED SQUARE ``sign(num)·10⁶·num² div (den_a·den_b)`` —
    monotone in |r| with the sign preserved, so the argmax lag reads
    straight off the rows; the float r is derivable.  num² and the
    10⁶ scaling ride DECIMAL(38,0) div / HUGEINT // (the acf_daily
    overflow discipline, measured identical truncation).

    Scale shape: one map-side-combined (day, type) aggregate; spine,
    deviations, the 2L+1-way lag equi-join, and the moment sums all
    live on the calendar-bounded daily table."""
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
    )
    cells = (
        events.where(F.col("event_type").isin([type_a, type_b]))
        .groupBy(
            day.alias("d"),
            (F.col("event_type") == type_a).cast("int").alias("g"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    rng = cells.agg(
        F.min("d").alias("lo"), F.max("d").alias("hi"),
        F.sum(F.when(F.col("g") == 1, F.col("c")).otherwise(0))
        .cast("long").alias("sa"),
        F.sum(F.when(F.col("g") == 0, F.col("c")).otherwise(0))
        .cast("long").alias("sb"),
    )
    spine = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d"),
        (F.col("hi") - F.col("lo") + 1).cast("long").alias("n"),
        "sa", "sb",
    )
    ga = cells.where(F.col("g") == 1).select("d", F.col("c").alias("ya"))
    gb = cells.where(F.col("g") == 0).select("d", F.col("c").alias("yb"))
    dev = (
        spine.join(ga, "d", "left")
        .join(gb, "d", "left")
        .select(
            "d",
            (
                F.col("n") * F.coalesce(F.col("ya"), F.lit(0))
                - F.col("sa")
            ).cast("long").alias("dev_a"),
            (
                F.col("n") * F.coalesce(F.col("yb"), F.lit(0))
                - F.col("sb")
            ).cast("long").alias("dev_b"),
            "n",
        )
    )
    den = dev.agg(
        F.sum(F.col("dev_a") * F.col("dev_a")).cast("long").alias(
            "den_a"
        ),
        F.sum(F.col("dev_b") * F.col("dev_b")).cast("long").alias(
            "den_b"
        ),
        F.max("n").alias("n"),
    )
    lags = dev.select(
        F.explode(
            F.sequence(F.lit(-max_lag), F.lit(max_lag))
        ).alias("lag"),
        "d",
        "dev_a",
    ).select("lag", (F.col("d") + F.col("lag")).alias("d2"), "dev_a")
    num = (
        lags.join(
            dev.select(F.col("d").alias("d2"), F.col("dev_b")), "d2"
        )
        .groupBy("lag")
        .agg(
            F.sum(F.col("dev_a") * F.col("dev_b"))
            .cast("long").alias("num")
        )
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            F.col("lag").cast("int").alias("lag"),
            F.col("n").alias("n_days"),
            F.col("num").alias("num_scaled"),
            F.when(
                (F.col("den_a") > 0) & (F.col("den_b") > 0),
                F.expr(
                    "CAST(CASE WHEN num >= 0 THEN"
                    " (CAST(num AS DECIMAL(38,0)) * num * 1000000)"
                    " div (CAST(den_a AS DECIMAL(38,0)) * den_b)"
                    " ELSE -((CAST(num AS DECIMAL(38,0)) * num"
                    " * 1000000)"
                    " div (CAST(den_a AS DECIMAL(38,0)) * den_b))"
                    " END AS BIGINT)"
                ),
            ).alias("ccf2_signed_micros"),
        )
    )


def brier_purchase_forecast(
    events: DataFrame,
    target: str = "purchase",
    ts_col: str = "ts",
) -> DataFrame:
    """One row (n_users, n_positive, brier_micros, base_rate_micros) —
    the Brier score (Brier 1950, public literature) of the simplest
    temporal forecaster: predict each user's second-half
    "will purchase" probability as their FIRST-half purchase share,
    score against the realized second-half binary outcome.  The
    proper-scoring companion to the calibration tables — one number,
    decomposable, minimized only by the true probability.  The
    base-rate row makes the skill visible (a forecaster worse than
    "always predict the prevalence" has negative skill).

    Split: calendar midpoint, exactly :func:`diff_in_diff`'s
    ``mid = D div 2`` (pre = days 0..mid−1).  Universe: users with
    ≥ 1 first-half event (no prediction exists otherwise — stated).

    Exactness: p̂ = (10⁶·k_u) div n_u per user; the per-user term
    (p̂ − 10⁶·y)² is an exact BIGINT ≤ 10¹²; brier = Σterm div
    (10⁶·N) lands back in micros with one truncating division.

    Scale shape: two map-side-combined per-user aggregates (first
    half / second half) + one vertex-sized join + a scalar rollup."""
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
    )
    typed = events.select(
        F.col("user_id").alias("u"),
        day.alias("d"),
        (F.col("event_type") == target).cast("long").alias("t"),
    )
    rng = typed.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    j = typed.crossJoin(F.broadcast(rng)).select(
        "u", "t",
        (
            F.col("d") - F.col("lo")
            < F.expr("(hi - lo + 1) div 2")
        ).cast("int").alias("pre"),
    )
    first = j.where(F.col("pre") == 1).groupBy("u").agg(
        F.count(F.lit(1)).cast("long").alias("n_u"),
        F.sum("t").cast("long").alias("k_u"),
    )
    second = j.where(F.col("pre") == 0).groupBy("u").agg(
        F.max("t").cast("long").alias("y")
    )
    scored = first.join(second, "u", "left").select(
        F.expr("(1000000 * k_u) div n_u").cast("long").alias("p"),
        F.coalesce("y", F.lit(0)).cast("long").alias("y"),
    )
    agg = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("y").cast("long").alias("n_positive"),
        F.sum(
            (F.col("p") - F.lit(1_000_000) * F.col("y"))
            * (F.col("p") - F.lit(1_000_000) * F.col("y"))
        ).cast("long").alias("sq"),
    )
    return agg.select(
        "n_users", "n_positive",
        F.when(
            F.col("n_users") > 0,
            F.expr("sq div (1000000 * n_users)").cast("long"),
        ).alias("brier_micros"),
        F.when(
            F.col("n_users") > 0,
            F.expr("(1000000 * n_positive) div n_users").cast("long"),
        ).alias("base_rate_micros"),
    )


def seq_patterns_subseq(
    events: DataFrame,
    actor_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """(a, b, c, n_users, support_micros) — frequent sequential
    patterns of length 2 and 3 over per-user event-type sequences,
    SUBSEQUENCE semantics (gaps allowed — the PrefixSpan/GSP problem,
    Srikant & Agrawal 1996, public literature): a user supports
    (a, b) when some a-event precedes some b-event, and (a, b, c)
    when a < b < c positions exist.  Length-2 rows carry c = NULL.
    The gap-tolerant companion to the CONSECUTIVE event-trigram
    counts — funnels with interleaved noise events are invisible
    there and first-class here.

    Containment tests collapse to order statistics — (a, b) ⊆ seq iff
    first(a) < last(b) (works for a = b: needs two occurrences);
    (a, b, c) ⊆ seq iff some b-position lies strictly between
    first(a) and last(c) — so no subsequence DP ever runs.

    Exactness: supports are exact user counts; one truncating micros
    division by the user universe.

    Scale shape: one per-user position window; per-(user, type)
    first/last aggregates (alphabet-bounded rows per user); the
    triple test joins each EVENT to the (a, c) grid — a |types|²
    fan-out per event, alphabet-bounded by construction — then one
    map-side-combined any() per (user, a, b, c).  Output ≤ |types|²
    + |types|³ rows regardless of data size."""
    w = Window.partitionBy(actor_col).orderBy(ts_col, tie_col)
    seq = events.select(
        F.col(actor_col).alias("u"),
        F.col(state_col).alias("t"),
        F.row_number().over(w).cast("long").alias("pos"),
    )
    fl = seq.groupBy("u", "t").agg(
        F.min("pos").alias("first_p"), F.max("pos").alias("last_p")
    )
    nu = seq.select("u").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("nn")
    )
    fa = fl.select(
        "u", F.col("t").alias("a"), F.col("first_p").alias("pa")
    )
    lb = fl.select(
        "u", F.col("t").alias("b"), F.col("last_p").alias("lb")
    )
    pairs = (
        fa.join(lb, "u")
        .where(F.col("pa") < F.col("lb"))
        .groupBy("a", "b")
        .agg(F.count_distinct("u").cast("long").alias("n_users"))
        .select("a", "b", F.lit(None).cast("string").alias("c"), "n_users")
    )
    lc = fl.select(
        "u", F.col("t").alias("c"), F.col("last_p").alias("lc")
    )
    grid = fa.join(lc, "u").where(F.col("pa") + 1 < F.col("lc"))
    mids = seq.select("u", F.col("t").alias("b"), "pos")
    triples = (
        grid.join(mids, "u")
        .where((F.col("pos") > F.col("pa")) & (F.col("pos") < F.col("lc")))
        .groupBy("a", "b", "c")
        .agg(F.count_distinct("u").cast("long").alias("n_users"))
        .select("a", "b", "c", "n_users")
    )
    out = pairs.unionByName(triples)
    return out.crossJoin(F.broadcast(nu)).select(
        "a", "b", "c", "n_users",
        F.expr("(1000000 * n_users) div nn").cast("long").alias(
            "support_micros"
        ),
    )


def dow_adjusted_anomaly(
    events: DataFrame,
    top_k: int = 10,
    ts_col: str = "ts",
) -> DataFrame:
    """(d, dow, y, dow_days, ratio_micros, rank) — the ``top_k`` most
    anomalous days measured against THEIR OWN WEEKDAY's mean (ratio =
    y / mean(same-dow days), in micros): a quiet Sunday only counts as
    an anomaly if it is quiet FOR A SUNDAY.  The seasonality-corrected
    companion to :func:`daily_anomaly` (trailing window, which a
    weekly cycle walks straight through).

    Day spine: zero days are REAL rows (the :func:`acf_daily` spine),
    so a silent Tuesday scores ratio 0 instead of vanishing.

    Exactness: ratio = (10⁶·n_w·y) div S_w with n_w = same-dow day
    count and S_w that weekday's total (exact integers; NULL when the
    weekday never saw an event).  Ranking is by max |10⁶ − ratio|
    with (d ASC) ties — deterministic.

    Scale shape: one map-side-combined daily count; spine, weekday
    marginals, and the top-k window (ordered over calendar-bounded
    rows) never touch the fact table again."""
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
    )
    daily = events.groupBy(day.alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    rng = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d")
    )
    filled = spine.join(daily, "d", "left").select(
        "d",
        F.coalesce("y", F.lit(0)).cast("long").alias("y"),
        F.expr("cast((d + 3) % 7 as int)").alias("dow"),
    )
    marg = filled.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("dow_days"),
        F.sum("y").cast("long").alias("s_w"),
    )
    scored = filled.join(F.broadcast(marg), "dow").select(
        "d", "dow", "y", "dow_days",
        F.when(
            F.col("s_w") > 0,
            F.expr("(1000000 * dow_days * y) div s_w").cast("long"),
        ).alias("ratio_micros"),
    )
    w = Window.orderBy(
        F.abs(F.lit(1_000_000) - F.coalesce("ratio_micros", F.lit(0)))
        .desc(),
        F.col("d").asc(),
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("d", "dow", "y", "dow_days", "ratio_micros", "rank")
    )


def mann_kendall_daily(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """One row (n_days, s_stat, var18_raw, z2_micros) — the
    Mann–Kendall nonparametric trend test (Mann 1945 / Kendall 1975,
    public literature) on the zero-filled daily event-count series:
    S = Σ_{i<j} sign(y_j − y_i), with the tie-corrected variance
    Var(S) = (n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)) / 18 and
    Z² = S²/Var = 18·S²/var18_raw.  The SIGNIFICANCE companion to the
    Theil–Sen slope (which estimates trend magnitude but carries no
    test): monotone drift in traffic, robust to outliers and making
    no normality assumption.

    Zero days are REAL rows (the :func:`acf_daily` spine) — a series
    that goes silent is a downward trend, not missing data.

    Exactness: S and var18_raw are exact BIGINTs; Z² rides
    DECIMAL(38,0) div / HUGEINT // (18·10⁶·S² passes 2⁶³ past
    ~2000 days — the acf overflow discipline, S² ≥ 0 so no sign
    subtlety).  NULL when the series is constant (var18_raw = 0).

    Scale shape: one map-side-combined daily count; the sign pair
    join and tie groups live on the calendar-bounded spine (10 years
    → ~6.7M pairs, a broadcast self-join of a tiny table)."""
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
    )
    daily = events.groupBy(day.alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    rng = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d")
    )
    filled = spine.join(daily, "d", "left").select(
        "d", F.coalesce("y", F.lit(0)).cast("long").alias("y")
    )
    p1 = filled.select(F.col("d").alias("d1"), F.col("y").alias("y1"))
    p2 = filled.select(F.col("d").alias("d2"), F.col("y").alias("y2"))
    s = (
        p1.join(F.broadcast(p2), F.col("d1") < F.col("d2"))
        .agg(
            F.sum(F.signum(F.col("y2") - F.col("y1")).cast("long"))
            .cast("long").alias("s_stat")
        )
    )
    ties = filled.groupBy("y").agg(
        F.count(F.lit(1)).cast("long").alias("t")
    ).agg(
        F.sum(
            F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
        ).cast("long").alias("tie_term"),
        F.sum("t").cast("long").alias("n"),
    )
    out = s.crossJoin(F.broadcast(ties)).select(
        F.col("n").alias("n_days"),
        "s_stat",
        (
            F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
            - F.col("tie_term")
        ).cast("long").alias("var18_raw"),
    )
    return out.select(
        "n_days", "s_stat", "var18_raw",
        F.when(
            F.col("var18_raw") > 0,
            F.expr(
                "CAST((CAST(s_stat AS DECIMAL(38,0)) * s_stat"
                " * 18000000)"
                " div CAST(var18_raw AS DECIMAL(38,0)) AS BIGINT)"
            ),
        ).alias("z2_micros"),
    )


def gains_purchase_deciles(
    events: DataFrame,
    target: str = "purchase",
    buckets: int = 10,
    ts_col: str = "ts",
) -> DataFrame:
    """(decile, n_users, n_pos, cum_pos, gain_micros, lift_micros) —
    the cumulative-gains table of the :func:`brier_purchase_forecast`
    forecaster: rank users by predicted second-half purchase
    probability (first-half share, ties → user_id ASC), cut into
    ``buckets`` closed-form deciles, and report what share of ALL
    realized purchasers the top-k deciles capture (gain) and the
    per-decile capture rate vs prevalence (lift).  The targeting
    readout Brier's single number cannot give: "contacting the top
    30% of users reaches X% of the purchasers".

    Exactness: decile = ((rank−1)·B) div N + 1 (the RFM closed-form
    bucket rule over a deterministic total order); gain =
    (10⁶·cum_pos) div total_pos; lift = (10⁶·N·dec_pos) div
    (total_pos·dec_users) — all exact truncating BIGINT divisions.

    Scale shape: the brier per-user shape, one global-order
    row_number (vertex-sized, the assign_dense_ids trade — stated),
    then everything lives on B rows."""
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
    )
    typed = events.select(
        F.col("user_id").alias("u"),
        day.alias("d"),
        (F.col("event_type") == target).cast("long").alias("t"),
    )
    rng = typed.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    j = typed.crossJoin(F.broadcast(rng)).select(
        "u", "t",
        (
            F.col("d") - F.col("lo")
            < F.expr("(hi - lo + 1) div 2")
        ).cast("int").alias("pre"),
    )
    first = j.where(F.col("pre") == 1).groupBy("u").agg(
        F.count(F.lit(1)).cast("long").alias("n_u"),
        F.sum("t").cast("long").alias("k_u"),
    )
    second = j.where(F.col("pre") == 0).groupBy("u").agg(
        F.max("t").cast("long").alias("y")
    )
    scored = first.join(second, "u", "left").select(
        "u",
        F.expr("(1000000 * k_u) div n_u").cast("long").alias("p"),
        F.coalesce("y", F.lit(0)).cast("long").alias("y"),
    )
    w = Window.orderBy(F.col("p").desc(), F.col("u").asc())
    ranked = scored.select(
        "y", F.row_number().over(w).cast("long").alias("rk")
    )
    nn = scored.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("y").cast("long").alias("tot_pos"),
    )
    B = int(buckets)
    dec = ranked.crossJoin(F.broadcast(nn)).select(
        F.expr(f"((rk - 1) * {B}) div nn + 1").cast("int").alias(
            "decile"
        ),
        "y", "nn", "tot_pos",
    ).groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("y").cast("long").alias("n_pos"),
        F.max("nn").alias("nn"),
        F.max("tot_pos").alias("tot_pos"),
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return dec.select(
        "decile", "n_users", "n_pos",
        F.sum("n_pos").over(wc).cast("long").alias("cum_pos"),
        "nn", "tot_pos",
    ).select(
        "decile", "n_users", "n_pos", "cum_pos",
        F.when(
            F.col("tot_pos") > 0,
            F.expr("(1000000 * cum_pos) div tot_pos").cast("long"),
        ).alias("gain_micros"),
        F.when(
            F.col("tot_pos") * F.col("n_users") > 0,
            F.expr(
                "(1000000 * nn * n_pos) div (tot_pos * n_users)"
            ).cast("long"),
        ).alias("lift_micros"),
    )


def lorenz_value_deciles(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    buckets: int = 10,
) -> DataFrame:
    """(decile, n_users, decile_value_cents, cum_users_micros,
    cum_value_micros) — the Lorenz curve behind the Gini number: rank
    users by total spend ascending, cut into ``buckets`` closed-form
    deciles, and report the cumulative population share vs the
    cumulative value share at each cut.  Where the single Gini
    coefficient says "how unequal", the curve says WHERE the
    inequality lives ("the bottom 50% of users carry 9% of revenue,
    the top decile 41%") — the shape a monetization or data-mixture
    review actually reads.

    Exactness: cents = round(100·value) summed per user (exact
    BIGINT); the total order is (tot, user_id); decile =
    ((rank−1)·B) div N + 1 (the RFM closed-form rule); both shares
    are truncating micros divisions over exact BIGINT cumulative
    sums.  NULL value share when the grand total is ≤ 0 (an
    all-refund corpus has no meaningful Lorenz curve).

    Scale shape: one map-side-combined groupBy to the per-user
    table, one global-order row_number over it (the exact-ranking
    trade every quantile/decile query in this module states), then
    everything lives on B rows."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    per = events.groupBy(F.col(user_col).alias("u")).agg(
        F.sum(cents).cast("long").alias("tot")
    )
    w = Window.orderBy(F.col("tot").asc(), F.col("u").asc())
    ranked = per.select(
        "tot", F.row_number().over(w).cast("long").alias("rk")
    )
    nn = per.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("tot").cast("long").alias("grand"),
    )
    B = int(buckets)
    dec = (
        ranked.crossJoin(F.broadcast(nn))
        .select(
            F.expr(f"((rk - 1) * {B}) div nn + 1").cast("int").alias(
                "decile"
            ),
            "tot", "nn", "grand",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("tot").cast("long").alias("decile_value_cents"),
            F.max("nn").alias("nn"),
            F.max("grand").alias("grand"),
        )
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return dec.select(
        "decile", "n_users", "decile_value_cents",
        F.sum("n_users").over(wc).cast("long").alias("cu"),
        F.sum("decile_value_cents").over(wc).cast("long").alias("cv"),
        "nn", "grand",
    ).select(
        "decile", "n_users", "decile_value_cents",
        F.expr("(1000000 * cu) div nn").cast("long").alias(
            "cum_users_micros"
        ),
        F.when(
            F.col("grand") > 0,
            F.expr("(1000000 * cv) div grand").cast("long"),
        ).alias("cum_value_micros"),
    )


def runs_test_daily(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """One row (n_above, n_below, runs, z2_micros) — the
    Wald–Wolfowitz runs test for randomness on the zero-filled daily
    event-count series: split days into above-median / below-median,
    count maximal same-sign runs in date order, and compare against
    the exact run-count moments under exchangeability.  Too FEW runs
    = trending / regime-sticky traffic (the usual case); too MANY =
    oscillation.  The model-free companion to :func:`acf_daily`
    (which measures linear lag correlation) and
    :func:`mann_kendall_daily` (monotone drift only).

    Days EQUAL to the median are dropped (the standard treatment —
    they belong to neither sign class); the median is the lower
    median of the day-count multiset (shared rank rule
    ``(n + n%2) div 2``).

    Exactness: with a = above, b = below, m = a+b, R = runs, the
    z² statistic is the all-integer identity
    ``z² = (R·m − m − 2ab)² · (m−1) / (2ab · (2ab − m))`` returned
    as a truncating micros division riding DECIMAL(38,0) / HUGEINT
    (the numerator passes 2⁶³ past ~1500 days).  NULL when either
    class is empty or 2ab ≤ m (degenerate variance).

    Scale shape: one map-side-combined daily count; everything after
    lives on the calendar-bounded spine (one ordered window for the
    median rank, one lag pass for the run boundaries)."""
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
    )
    daily = events.groupBy(day.alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    rng = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d")
    )
    filled = spine.join(daily, "d", "left").select(
        "d", F.coalesce("y", F.lit(0)).cast("long").alias("y")
    )
    wm = Window.orderBy(F.col("y").asc(), F.col("d").asc())
    wn = Window.partitionBy()
    med = (
        filled.select(
            "y",
            F.row_number().over(wm).cast("long").alias("rn"),
            F.count(F.lit(1)).over(wn).cast("long").alias("n"),
        )
        .where(F.col("rn") == F.expr("(n + n % 2) div 2"))
        .select(F.col("y").alias("med"))
    )
    signed = (
        filled.crossJoin(F.broadcast(med))
        .where(F.col("y") != F.col("med"))
        .select(
            "d", (F.col("y") > F.col("med")).cast("long").alias("s")
        )
    )
    wd = Window.orderBy("d")
    runs = signed.select(
        "s",
        F.when(
            F.lag("s").over(wd).isNull()
            | (F.lag("s").over(wd) != F.col("s")),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("brk"),
    ).agg(
        F.sum("s").cast("long").alias("a"),
        F.sum(F.lit(1) - F.col("s")).cast("long").alias("b"),
        F.sum("brk").cast("long").alias("runs"),
    )
    return runs.select(
        F.col("a").alias("n_above"),
        F.col("b").alias("n_below"),
        "runs",
        F.when(
            (F.col("a") > 0)
            & (F.col("b") > 0)
            & (2 * F.col("a") * F.col("b") > F.col("a") + F.col("b")),
            F.expr(
                "CAST((CAST(runs * (a + b) - (a + b) - 2 * a * b"
                " AS DECIMAL(38,0))"
                " * (runs * (a + b) - (a + b) - 2 * a * b)"
                " * (a + b - 1) * 1000000)"
                " div CAST(2 * a * b * (2 * a * b - (a + b))"
                " AS DECIMAL(38,0)) AS BIGINT)"
            ),
        ).alias("z2_micros"),
    )


def brown_forsythe(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """One row (n_groups, n_total, ssb_dev, ssw_dev, f_bf_micros) —
    the Brown–Forsythe heteroscedasticity test: one-way ANOVA run on
    absolute deviations from each group's MEDIAN, asking "do the
    event types differ in value SPREAD?" — the robust variance-
    equality screen that decides whether :func:`anova_oneway`'s
    pooled-variance F or :func:`welch_ttest`'s unpooled path is the
    right follow-up (Brown & Forsythe 1974, public literature; the
    median centre is what makes it robust vs Levene's mean centre).

    Exactness: cents = round(100·value); per-group lower median via
    the shared rank rule; deviations |c − med_g| are exact BIGINTs;
    then exactly :func:`anova_oneway`'s collect-based arbitrary-
    precision F on the deviation moments (truncating S²/n terms,
    micros F).  NULL F when g < 2, N ≤ g, or SSW = 0.

    Scale shape: per-group median is one ordered window partitioned
    by group (groups are vocabulary-sized; the two-pass histogram
    median in quantiles.py is the stated escape hatch if a single
    group outgrows a sort spill budget); one equi-join back; one
    map-side-combined moment groupBy; g rows collect."""
    from graphlite_spark.operators.similarity import _trunc_div

    spark = events.sparkSession
    schema = (
        "n_groups long, n_total long, ssb_dev long, ssw_dev long,"
        " f_bf_micros long"
    )
    cents = F.round(F.col(value_col) * 100).cast("long")
    vals = events.select(
        F.col(group_col).alias("g"), cents.alias("c")
    )
    wm = Window.partitionBy("g").orderBy(F.col("c").asc())
    wn = Window.partitionBy("g")
    med = (
        vals.select(
            "g", "c",
            F.row_number().over(wm).cast("long").alias("rn"),
            F.count(F.lit(1)).over(wn).cast("long").alias("n"),
        )
        .where(F.col("rn") == F.expr("(n + n % 2) div 2"))
        .select("g", F.col("c").alias("med"))
    )
    dev = vals.join(med, "g").select(
        "g", F.abs(F.col("c") - F.col("med")).cast("long").alias("z")
    )
    per = (
        dev.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("z").cast("long").alias("s"),
            F.sum(F.col("z") * F.col("z")).cast("long").alias("q"),
        )
        .collect()
    )
    g = len(per)
    if g == 0:
        return spark.createDataFrame([], schema)
    n_tot = sum(int(r["n"]) for r in per)
    s_tot = sum(int(r["s"]) for r in per)
    q_tot = sum(int(r["q"]) for r in per)
    sb_terms = sum(
        _trunc_div(int(r["s"]) * int(r["s"]), int(r["n"])) for r in per
    )
    ssb = sb_terms - _trunc_div(s_tot * s_tot, n_tot)
    ssw = q_tot - sb_terms
    f_m = None
    if g >= 2 and n_tot > g and ssw * (g - 1) > 0:
        f_m = _trunc_div(1_000_000 * ssb * (n_tot - g), ssw * (g - 1))
    return spark.createDataFrame([(g, n_tot, ssb, ssw, f_m)], schema)


def page_hinkley_daily(
    events: DataFrame,
    delta_micros: int = 0,
    lambda_micros: int = 50_000_000,
    ts_col: str = "ts",
) -> DataFrame:
    """(d, y, ph_micros, alarm) — the Page–Hinkley sequential drift
    detector (Page 1954 / Hinkley 1971, public literature) over the
    zero-filled daily event-count series: m_t = Σ_{i≤t}
    (x_i − x̄_i − δ) with x̄_i the RUNNING mean at day i, and
    PH_t = m_t − min_{s≤t} m_s.  A sustained upward shift in daily
    volume makes m climb away from its historical minimum; ``alarm``
    fires while PH exceeds λ — the STREAMING-shaped change detector
    next to :func:`binseg_changepoint`'s retrospective split (this
    one is causal: day t uses only days ≤ t).

    Exactness: the running mean is the truncating division
    (10⁶·S_t) div t; every term, cumulative sum, and running min is
    an exact BIGINT in micros, mirrored by the oracle's identical
    window chain.

    Scale shape: one map-side-combined daily count; three ordered
    windows over the calendar-bounded spine — nothing row-scale
    leaves the first groupBy."""
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
    )
    daily = events.groupBy(day.alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    rng = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d")
    )
    filled = spine.join(daily, "d", "left").select(
        "d", F.coalesce("y", F.lit(0)).cast("long").alias("y")
    )
    wc = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    terms = filled.select(
        "d", "y",
        (
            F.lit(1_000_000) * F.col("y")
            - F.expr(
                "(1000000 * sum(y) over (order by d rows between"
                " unbounded preceding and current row))"
                " div (count(*) over (order by d rows between"
                " unbounded preceding and current row))"
            )
            - F.lit(int(delta_micros))
        ).cast("long").alias("term"),
    )
    cum = terms.select(
        "d", "y", F.sum("term").over(wc).cast("long").alias("m")
    )
    return cum.select(
        "d", "y",
        (F.col("m") - F.min("m").over(wc)).cast("long").alias(
            "ph_micros"
        ),
    ).select(
        "d", "y", "ph_micros",
        (F.col("ph_micros") > F.lit(int(lambda_micros)))
        .cast("int").alias("alarm"),
    )


def friedman_event_ranks(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """One row (n_days, k_types, rank_sq_sum, denom_raw, chi2_micros)
    — the Friedman rank test (Friedman 1937, public literature; the
    tie-corrected Conover form): within each DAY, rank the event
    types by their daily count (average ranks for ties), and test
    whether the types are consistently ordered across days.  The
    nonparametric repeated-measures screen: "is 'view' ALWAYS the
    busiest type, or does the composition genuinely reshuffle
    day to day?" — robust to the raw volume swings that would
    dominate a parametric two-way fit.

    Blocks are the calendar-spine days, treatments the globally
    observed types, count 0 for a type silent that day (a balanced
    complete block design by construction).

    Exactness: average ranks ride as DOUBLED integers (2·avgrank =
    2·cb + ct + 1, the :func:`spearman_activity_value` discipline);
    with S_j the doubled rank sums the tie-corrected statistic is
    the all-integer identity χ² = (k−1)·(Σ S_j² − n²k(k+1)²) /
    (Σ r² − nk(k+1)²), returned as a truncating micros division.
    NULL when the denominator is 0 (every day all-tied) or k < 2.

    Scale shape: one map-side-combined (day, type) count; the
    zero-fill cross join lives on spine × vocabulary; rank windows
    partition by day (k rows each)."""
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
    )
    cnt = events.groupBy(
        day.alias("d"), F.col(type_col).alias("t")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    rng = cnt.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d")
    )
    types = cnt.select("t").distinct()
    filled = (
        spine.crossJoin(types)
        .join(cnt, ["d", "t"], "left")
        .select(
            "d", "t", F.coalesce("y", F.lit(0)).cast("long").alias("y")
        )
    )
    grp = filled.groupBy("d", "y").agg(
        F.count(F.lit(1)).cast("long").alias("ct")
    )
    wb = Window.partitionBy("d").orderBy("y").rowsBetween(
        Window.unboundedPreceding, -1
    )
    r2v = grp.select(
        "d", "y", "ct",
        (
            2 * F.coalesce(F.sum("ct").over(wb), F.lit(0))
            + F.col("ct") + 1
        ).cast("long").alias("r2"),
    )
    ranked = filled.join(r2v.select("d", "y", "r2"), ["d", "y"])
    per_type = ranked.groupBy("t").agg(
        F.sum("r2").cast("long").alias("s_j")
    )
    tot = ranked.agg(
        F.sum(F.col("r2") * F.col("r2")).cast("long").alias("rsq"),
        (F.countDistinct("d")).cast("long").alias("n"),
        (F.countDistinct("t")).cast("long").alias("k"),
    )
    sj = per_type.agg(
        F.sum(F.col("s_j") * F.col("s_j")).cast("long").alias("ssq")
    )
    return tot.crossJoin(F.broadcast(sj)).select(
        F.col("n").alias("n_days"),
        F.col("k").alias("k_types"),
        F.col("ssq").alias("rank_sq_sum"),
        (
            F.col("rsq")
            - F.col("n") * F.col("k") * (F.col("k") + 1)
            * (F.col("k") + 1)
        ).cast("long").alias("denom_raw"),
        F.when(
            (F.col("k") >= 2)
            & (
                F.col("rsq")
                - F.col("n") * F.col("k") * (F.col("k") + 1)
                * (F.col("k") + 1)
                > 0
            ),
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * (k - 1)"
                " * (ssq - n * n * k * (k + 1) * (k + 1)))"
                " div CAST(rsq - n * k * (k + 1) * (k + 1)"
                " AS DECIMAL(38,0)) AS BIGINT)"
            ),
        ).alias("chi2_micros"),
    )


def cvm_2sample(
    events: DataFrame,
    type_a: str = "purchase",
    type_b: str = "click",
    value_col: str = "value",
) -> DataFrame:
    """One row (n_a, n_b, t_micros) — the two-sample Cramér–von Mises
    statistic (Anderson 1962, public literature) between the ``value``
    distributions of two event types: T = n·m/N² · Σ over all N pooled
    observations of (ECDF_a − ECDF_b)².  Where :func:`ks_2sample` takes
    the MAXIMUM ECDF gap (sensitive to one sharp deviation), CvM
    integrates the SQUARED gap over the whole support — the
    whole-distribution companion that sees many small shifts KS misses.

    Exactness: at pooled distinct value v with tie count c_v and
    cumulative per-group counts (ca, cb), the gap is D_v/(n·m) with
    D_v = ca·m − cb·n an exact BIGINT, so
    T = Σ c_v·D_v² / (n·m·N²); the sum rides DECIMAL(38,0) (worst case
    passes 2⁶³) and the single reported number is the truncating
    micros division 10⁶·Σ div (n·m·N²) — numerator nonnegative, so
    Spark ``div`` == DuckDB ``//``.

    Scale shape: identical to KS — one map-side-combined groupBy onto
    the distinct-cents alphabet, one alphabet-bounded cumulative
    window, one scalar rollup."""
    cents = events.where(
        F.col("event_type").isin(type_a, type_b)
    ).select(
        (F.col("event_type") == type_a).cast("int").alias("is_a"),
        F.round(F.col(value_col) * 100).cast("long").alias("v"),
    )
    per = cents.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("is_a").cast("long").alias("cnt_a"),
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        "cnt",
        F.sum("cnt_a").over(w).alias("ca"),
        (F.sum("cnt").over(w) - F.sum("cnt_a").over(w)).alias("cb"),
    )
    tot = per.agg(
        F.sum("cnt_a").cast("long").alias("n_a"),
        F.sum(F.col("cnt") - F.col("cnt_a")).cast("long").alias("n_b"),
    )
    agg = cum.crossJoin(F.broadcast(tot)).agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.sum(
            F.col("cnt").cast("decimal(38,0)")
            * (F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a"))
            * (F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a"))
        ).alias("tsum"),
    )
    return agg.select(
        "n_a", "n_b",
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * tsum)"
                " div CAST(n_a * n_b * (n_a + n_b) * (n_a + n_b)"
                " AS DECIMAL(38,0)) AS BIGINT)"
            ),
        ).alias("t_micros"),
    )


def cronbach_alpha(
    events: DataFrame,
    type_col: str = "event_type",
    user_col: str = "user_id",
) -> DataFrame:
    """One row (n_users, k_types, item_var_num, total_var_num,
    alpha_micros) — Cronbach's alpha (Cronbach 1951, public
    literature) treating the k globally-observed event types as test
    items and each user's per-type event count (zero-filled) as the
    item score: α = k/(k−1)·(1 − Σᵢ Varᵢ / Var_total).  The internal-
    consistency screen: do the activity channels move together across
    users (one latent "engagement" trait) or independently?

    Exactness: population variances ride the n²-cancelling integer
    form — item_var_num = Σᵢ (n·Σx² − Sᵢ²) and total_var_num =
    n·Σt² − T² with t_u the per-user total, so
    α = k·(den − num) / ((k−1)·den) exactly; the micros division is
    truncating toward zero on both engines (α < 0 is legal and
    preserved).  Zero-filled scores change no sum, so the lattice is
    never materialized.  NULL when k < 2 or den ≤ 0.

    Scale shape: one map-side-combined (user, type) count read twice
    — a k-row per-type moment aggregate and an n-row per-user total
    aggregate — then scalars; nothing row-scale crosses a second
    shuffle."""
    ut = events.groupBy(
        F.col(user_col).alias("u"), F.col(type_col).alias("t")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    item = ut.groupBy("t").agg(
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
    )
    peru = ut.groupBy("u").agg(F.sum("x").cast("long").alias("tu"))
    n_users = peru.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("tu").cast("long").alias("st"),
        F.sum(F.col("tu") * F.col("tu")).cast("long").alias("qt"),
    )
    itot = item.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("q")).cast("long").alias("qsum"),
        F.sum(F.col("s") * F.col("s")).cast("long").alias("ssq"),
    )
    return n_users.crossJoin(F.broadcast(itot)).select(
        F.col("n").alias("n_users"),
        F.col("k").alias("k_types"),
        (F.col("n") * F.col("qsum") - F.col("ssq")).cast("long").alias(
            "item_var_num"
        ),
        (F.col("n") * F.col("qt") - F.col("st") * F.col("st"))
        .cast("long").alias("total_var_num"),
        F.when(
            (F.col("k") >= 2)
            & (F.col("n") * F.col("qt") - F.col("st") * F.col("st") > 0),
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * k *"
                " ((n * qt - st * st) - (n * qsum - ssq)))"
                " div CAST((k - 1) * (n * qt - st * st)"
                " AS DECIMAL(38,0)) AS BIGINT)"
            ),
        ).alias("alpha_micros"),
    )


def seasonal_decompose_daily(
    events: DataFrame,
    period: int = 7,
    ts_col: str = "ts",
) -> DataFrame:
    """(d, y, trend_micros, seasonal_micros, resid_micros) — classical
    additive seasonal decomposition (the moving-average method of
    Macaulay 1931 / the `decompose` textbook form, public literature)
    of the zero-filled daily event-count series: trend = centered
    ``period``-day moving average (NULL where the window is
    incomplete), seasonal = per-weekday truncating mean of the
    detrended values (the ``(d+3) % 7`` epoch-weekday convention
    shared with :func:`dow_seasonality`; uncentered, stated), residual
    = detrended − seasonal where the trend exists.  One query, three
    readable layers: growth, weekly rhythm, and what's left for the
    anomaly detectors.

    Exactness: trend_micros = (10⁶·Σwindow) div period on nonnegative
    BIGINTs; detrended/seasonal/residual are exact micro differences
    with truncating-toward-zero means (negative-safe on both
    engines).

    Scale shape: one map-side-combined daily groupBy; one ±3-row
    window and one period-sized groupBy-join over the calendar-bounded
    spine."""
    half = period // 2
    daily = events.groupBy(
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    rng = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d")
    )
    filled = spine.join(daily, "d", "left").select(
        "d", F.coalesce("y", F.lit(0)).cast("long").alias("y")
    )
    ww = Window.orderBy("d").rowsBetween(-half, half)
    tr = filled.select(
        "d", "y",
        F.when(
            F.count(F.lit(1)).over(ww) == period,
            F.expr(
                f"(1000000 * sum(y) over (order by d rows between"
                f" {half} preceding and {half} following))"
                f" div {period}"
            ),
        ).cast("long").alias("trend_micros"),
    ).select(
        "d", "y", "trend_micros",
        (F.lit(1_000_000) * F.col("y") - F.col("trend_micros"))
        .cast("long").alias("det"),
        F.expr(f"cast((d + 3) % {period} as int)").alias("dow"),
    )
    seas = tr.where(F.col("det").isNotNull()).groupBy("dow").agg(
        F.expr("sum(det) div count(*)").cast("long").alias(
            "seasonal_micros"
        )
    )
    return (
        tr.join(F.broadcast(seas), "dow", "left")
        .select(
            "d", "y", "trend_micros", "seasonal_micros",
            (F.col("det") - F.col("seasonal_micros")).cast("long")
            .alias("resid_micros"),
        )
    )


def pacf_daily(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """One row (n_days, c0, c1, c2, pacf1_micros, pacf2_micros) — the
    partial autocorrelation of the zero-filled daily count series at
    lags 1 and 2 via the Durbin–Levinson closed form (public
    literature): φ₁₁ = r₁ and φ₂₂ = (r₂ − r₁²)/(1 − r₁²) — how much
    lag-2 memory remains after the lag-1 carryover is regressed out,
    the AR-order-selection companion to :func:`acf_daily` (an AR(1)
    process has φ₂₂ = 0 even though r₂ = r₁² ≠ 0).

    Exactness: with the n-scaled integer deviations of acf_daily,
    r_k = c_k/c₀ and both ratios clear denominators exactly:
    φ₁₁ = c₁/c₀ and φ₂₂ = (c₂·c₀ − c₁²)/(c₀² − c₁²); the c_k are
    BIGINTs and the two micros divisions ride DECIMAL(38,0) / HUGEINT
    (c₀² passes 2⁶³), truncating toward zero including negatives.
    NULL when the denominator is ≤ 0.

    Scale shape: the acf shape — one daily groupBy, two self-joins on
    the shifted spine, scalar moments."""
    daily = events.groupBy(
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    rng = daily.agg(
        F.min("d").alias("lo"), F.max("d").alias("hi"),
        F.sum("y").cast("long").alias("s"),
    )
    spine = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d"),
        (F.col("hi") - F.col("lo") + 1).cast("long").alias("n"),
        "s",
    )
    dev = spine.join(daily, "d", "left").select(
        "d",
        (
            F.col("n") * F.coalesce(F.col("y"), F.lit(0)) - F.col("s")
        ).cast("long").alias("dev"),
        "n",
    )
    lag1 = dev.select((F.col("d") + 1).alias("d"), F.col("dev").alias("b1"))
    lag2 = dev.select((F.col("d") + 2).alias("d"), F.col("dev").alias("b2"))
    mom = (
        dev.join(lag1, "d", "left")
        .join(lag2, "d", "left")
        .agg(
            F.max("n").alias("n_days"),
            F.sum(F.col("dev") * F.col("dev")).cast("long").alias("c0"),
            F.sum(F.col("dev") * F.col("b1")).cast("long").alias("c1"),
            F.sum(F.col("dev") * F.col("b2")).cast("long").alias("c2"),
        )
    )
    return mom.select(
        "n_days", "c0", "c1", "c2",
        F.when(
            F.col("c0") > 0,
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * c1)"
                " div CAST(c0 AS DECIMAL(38,0)) AS BIGINT)"
            ),
        ).alias("pacf1_micros"),
        F.when(
            F.expr(
                "CAST(c0 AS DECIMAL(38,0)) * c0"
                " - CAST(c1 AS DECIMAL(38,0)) * c1"
            )
            > 0,
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0))"
                " * (CAST(c2 AS DECIMAL(38,0)) * c0"
                "    - CAST(c1 AS DECIMAL(38,0)) * c1))"
                " div (CAST(c0 AS DECIMAL(38,0)) * c0"
                "      - CAST(c1 AS DECIMAL(38,0)) * c1) AS BIGINT)"
            ),
        ).alias("pacf2_micros"),
    )


def granger_daily(
    events: DataFrame,
    type_a: str = "purchase",
    type_b: str = "click",
    ts_col: str = "ts",
) -> DataFrame:
    """One row (n_pairs, suu, suy, svy, f_micros) — the one-lag Granger
    causality F-test (Granger 1969, public literature): does yesterday's
    ``type_b`` volume improve the prediction of today's ``type_a``
    volume beyond what yesterday's ``type_a`` already explains?
    Restricted model y_t ~ 1 + y_{t−1}; unrestricted adds x_{t−1};
    F = (SSE_r − SSE_u) / (SSE_u/(m−3)).  The causal-direction
    companion to :func:`ccf_type_daily` (which sees correlation at
    every lag but cannot partial out the series' own memory).

    Exactness: with m-scaled centered moments S·· = m·Σab − ΣaΣb (all
    BIGINT — daily counts), the F numerator collapses to the square of
    the partial covariance A = Suu·Svy − Suy·Suv and the denominator
    to B·Suu with B = Syy·D − (Suy²·Svv − 2·Suy·Suv·Svy + Svy²·Suu),
    D = Suu·Svv − Suv² (identity verified against direct least
    squares); the micros division rides DECIMAL(38,0) / HUGEINT,
    truncating.  NULL when m ≤ 3 or B·Suu ≤ 0 (perfect fit or
    constant regressor).

    Scale shape: one map-side-combined (day, type) aggregate; the lag
    pairing is a 1-day shifted self-join on the calendar-bounded
    spine; everything after is scalar."""
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
    )
    cells = (
        events.where(F.col("event_type").isin([type_a, type_b]))
        .groupBy(
            day.alias("d"),
            (F.col("event_type") == type_a).cast("int").alias("g"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    rng = cells.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d")
    )
    ga = cells.where(F.col("g") == 1).select("d", F.col("c").alias("ya"))
    gb = cells.where(F.col("g") == 0).select("d", F.col("c").alias("yb"))
    filled = (
        spine.join(ga, "d", "left")
        .join(gb, "d", "left")
        .select(
            "d",
            F.coalesce("ya", F.lit(0)).cast("long").alias("ya"),
            F.coalesce("yb", F.lit(0)).cast("long").alias("yb"),
        )
    )
    prev = filled.select(
        (F.col("d") + 1).alias("d"),
        F.col("ya").alias("u"),
        F.col("yb").alias("v"),
    )
    pairs = filled.join(prev, "d").select(
        F.col("ya").alias("y"), "u", "v"
    )
    mom = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("u").cast("long").alias("su"),
        F.sum("v").cast("long").alias("sv"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("u") * F.col("u")).cast("long").alias("puu"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("pvv"),
        F.sum(F.col("u") * F.col("v")).cast("long").alias("puv"),
        F.sum(F.col("u") * F.col("y")).cast("long").alias("puy"),
        F.sum(F.col("v") * F.col("y")).cast("long").alias("pvy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("pyy"),
    )
    cen = mom.select(
        "m",
        (F.col("m") * F.col("puu") - F.col("su") * F.col("su"))
        .cast("long").alias("suu"),
        (F.col("m") * F.col("pvv") - F.col("sv") * F.col("sv"))
        .cast("long").alias("svv"),
        (F.col("m") * F.col("puv") - F.col("su") * F.col("sv"))
        .cast("long").alias("suv"),
        (F.col("m") * F.col("puy") - F.col("su") * F.col("sy"))
        .cast("long").alias("suy"),
        (F.col("m") * F.col("pvy") - F.col("sv") * F.col("sy"))
        .cast("long").alias("svy"),
        (F.col("m") * F.col("pyy") - F.col("sy") * F.col("sy"))
        .cast("long").alias("syy"),
    )
    big = cen.select(
        "m", "suu", "suy", "svy", "syy",
        F.expr(
            "CAST(suu AS DECIMAL(38,0)) * svv"
            " - CAST(suv AS DECIMAL(38,0)) * suv"
        ).alias("dd"),
        F.expr(
            "CAST(suu AS DECIMAL(38,0)) * svy"
            " - CAST(suy AS DECIMAL(38,0)) * suv"
        ).alias("aa"),
        F.expr(
            "CAST(suy AS DECIMAL(38,0)) * suy * svv"
            " - 2 * (CAST(suy AS DECIMAL(38,0)) * suv * svy)"
            " + CAST(svy AS DECIMAL(38,0)) * svy * suu"
        ).alias("qq"),
    )
    return big.select(
        F.col("m").alias("n_pairs"),
        "suu", "suy", "svy",
        F.when(
            (F.col("m") > 3)
            & (
                F.expr(
                    "(CAST(syy AS DECIMAL(38,0)) * dd - qq)"
                    " * suu"
                )
                > 0
            ),
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * (m - 3)"
                " * aa * aa)"
                " div ((CAST(syy AS DECIMAL(38,0)) * dd - qq) * suu)"
                " AS BIGINT)"
            ),
        ).alias("f_micros"),
    )


def cochran_q(
    events: DataFrame,
    type_col: str = "event_type",
    user_col: str = "user_id",
) -> DataFrame:
    """One row (n_users, k_types, col_sq_sum, row_sq_sum, q_micros) —
    Cochran's Q test (Cochran 1950, public literature) on the binary
    user × event-type incidence matrix (did the user EVER do the
    type?): are the k activity channels equally prevalent, accounting
    for per-user activity breadth?  The binary sibling of
    :func:`friedman_event_ranks` (which ranks counts); the classic
    repeated-measures extension of McNemar to k > 2 treatments.

    Q = (k−1)·(k·ΣSⱼ² − T²) / (k·T − ΣRᵢ²) with Sⱼ the per-type user
    counts, Rᵢ the per-user type counts, T = ΣSⱼ = ΣRᵢ — every term an
    exact BIGINT over one (user, type) distinct count; the micros
    division truncates (numerator nonnegative by Cauchy–Schwarz).
    All-present rows (Rᵢ = k) contribute 0 to the denominator exactly
    as the textbook formula has it; NULL when the denominator is ≤ 0
    (every user hit every type).  Users absent from the table have
    all-zero rows and drop out of every sum — stated.

    Scale shape: one map-side-combined distinct (user, type) pair
    table read twice (k-row and n-row aggregates), then scalars."""
    ut = events.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("t")
    ).distinct()
    col = ut.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("s"))
    row = ut.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("r"))
    ca = col.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("s").cast("long").alias("tt"),
        F.sum(F.col("s") * F.col("s")).cast("long").alias("ssq"),
    )
    ra = row.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("r") * F.col("r")).cast("long").alias("rsq"),
    )
    return ra.crossJoin(F.broadcast(ca)).select(
        F.col("n").alias("n_users"),
        F.col("k").alias("k_types"),
        F.col("ssq").alias("col_sq_sum"),
        F.col("rsq").alias("row_sq_sum"),
        F.when(
            (F.col("k") >= 2)
            & (F.col("k") * F.col("tt") - F.col("rsq") > 0),
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * (k - 1)"
                " * (k * ssq - tt * tt))"
                " div CAST(k * tt - rsq AS DECIMAL(38,0)) AS BIGINT)"
            ),
        ).alias("q_micros"),
    )


def durbin_watson_daily(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """One row (n_days, dw_micros) — the Durbin–Watson statistic
    (Durbin & Watson 1950, public literature) of the residuals from
    the OLS linear trend fit to the zero-filled daily count series:
    DW = Σ(e_t − e_{t−1})² / Σe_t², near 2 for independent residuals,
    → 0 under positive autocorrelation.  The regression-residual
    companion to :func:`acf_daily` (raw series) and
    :func:`pacf_daily`: is the day-to-day memory real, or just the
    shared trend?

    Exactness: residuals are cleared of both OLS denominators —
    ẽ_t = D₁·(n·y_t − Sy) − N₁·(n·t − Sx) with N₁ = n·Sxy − Sx·Sy,
    D₁ = n·Sxx − Sx² — so every residual is an exact BIGINT and the
    scale factor cancels in the ratio; the squared sums ride
    DECIMAL(38,0) / HUGEINT (ẽ² passes 2⁶³), one truncating micros
    division.  NULL when Σẽ² = 0 (perfectly linear series).

    Scale shape: one daily groupBy, one 1-row moment aggregate
    broadcast back over the spine, one ordered lag window on the
    calendar-bounded table."""
    daily = events.groupBy(
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    rng = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d"),
        F.col("lo"),
    )
    filled = spine.join(daily, "d", "left").select(
        "d",
        (F.col("d") - F.col("lo")).cast("long").alias("x"),
        F.coalesce("y", F.lit(0)).cast("long").alias("y"),
    )
    mom = filled.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    res = filled.crossJoin(F.broadcast(mom)).select(
        "d", "n",
        (
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            * (F.col("n") * F.col("y") - F.col("sy"))
            - (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            * (F.col("n") * F.col("x") - F.col("sx"))
        ).cast("long").alias("et"),
    )
    wl = Window.orderBy("d")
    lagd = res.select(
        "n", "et", F.lag("et").over(wl).alias("ep")
    )
    agg = lagd.agg(
        F.max("n").alias("n_days"),
        F.sum(F.expr("CAST(et AS DECIMAL(38,0)) * et")).alias("se"),
        F.sum(
            F.expr(
                "CAST(et - ep AS DECIMAL(38,0)) * (et - ep)"
            )
        ).alias("sd"),
    )
    return agg.select(
        "n_days",
        F.when(
            F.col("se") > 0,
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * sd) div se"
                " AS BIGINT)"
            ),
        ).alias("dw_micros"),
    )


def theils_u(
    df: DataFrame,
    col_x: str,
    col_y: str,
) -> DataFrame:
    """One row (n, mi_micros, hy_micros, u_micros) — Theil's
    uncertainty coefficient U(Y|X) = I(X;Y)/H(Y) (Theil 1970, public
    literature): the fraction of Y's entropy explained by knowing X.
    The DIRECTIONAL companion to :func:`mutual_information` (raw I is
    unnormalized) and Cramér's V (symmetric): U(type|dow) answers "how
    much of the traffic mix does the weekday determine?" on a 0..1
    scale.

    Float discipline: each joint cell's MI contribution and each
    Y-marginal's entropy term are ONE identical expression on both
    engines, rounded to micros PER TERM and summed exactly; the final
    U is an integer micros division of the two micro sums (truncating;
    NULL when H(Y) = 0).

    Scale shape: one map-side-combined joint groupBy, two
    marginal aggregates broadcast back; output is one row."""
    joint = df.groupBy(
        F.col(col_x).alias("x"), F.col(col_y).alias("y")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    nt = joint.agg(F.sum("n").cast("long").alias("nn"))
    mx = joint.groupBy("x").agg(F.sum("n").cast("long").alias("nx"))
    my = joint.groupBy("y").agg(F.sum("n").cast("long").alias("ny"))
    arg = (F.col("n") * F.col("nn")) / (F.col("nx") * F.col("ny"))
    mi = (
        joint.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(nt))
        .agg(
            F.sum(
                F.round(
                    F.lit(1_000_000.0) * F.col("n") * F.log(arg)
                    / F.col("nn"),
                    0,
                ).cast("long")
            ).alias("mi_micros")
        )
    )
    hy = my.crossJoin(F.broadcast(nt)).agg(
        F.sum(
            F.round(
                -(F.col("ny").cast("double") / F.col("nn").cast("double"))
                * F.log(
                    F.col("ny").cast("double") / F.col("nn").cast("double")
                )
                * 1_000_000
            ).cast("long")
        ).alias("hy_micros")
    )
    return (
        nt.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hy))
        .select(
            F.col("nn").alias("n"),
            "mi_micros", "hy_micros",
            F.when(
                F.col("hy_micros") > 0,
                F.expr("(1000000 * mi_micros) div hy_micros"),
            ).cast("long").alias("u_micros"),
        )
    )


def user_surprisal(
    events: DataFrame,
    type_col: str = "event_type",
    user_col: str = "user_id",
) -> DataFrame:
    """(user_id, n_events, surprisal_micros) — each user's mean
    self-information −ln p(event_type) in micro-nats under the global
    type distribution: high = the user's behavior concentrates on
    globally RARE event types (the rarity/bot-screen signal a triage
    pass ranks on — the user-level analogue of :func:`lm_doc_cost`'s
    per-document token surprisal).

    Float discipline: each TYPE's −ln p term is one identical
    expression rounded to micros (computed once per type, k values
    total); per-user sums are then exact integer dot products with
    the user's type counts, and the mean is a truncating division
    (nonnegative).

    Scale shape: one (user, type) map-side-combined count, one k-row
    type table broadcast back, one per-user aggregate."""
    ut = events.groupBy(
        F.col(user_col).alias("u"), F.col(type_col).alias("t")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    types = ut.groupBy("t").agg(F.sum("c").cast("long").alias("ct"))
    nt = types.agg(F.sum("ct").cast("long").alias("nn"))
    terms = types.crossJoin(F.broadcast(nt)).select(
        "t",
        F.round(
            -F.log(
                F.col("ct").cast("double") / F.col("nn").cast("double")
            )
            * 1_000_000
        ).cast("long").alias("term"),
    )
    return (
        ut.join(F.broadcast(terms), "t")
        .groupBy(F.col("u").alias(user_col))
        .agg(
            F.sum("c").cast("long").alias("n_events"),
            F.sum(F.col("c") * F.col("term")).cast("long").alias("tot"),
        )
        .select(
            user_col, "n_events",
            F.expr("tot div n_events").cast("long").alias(
                "surprisal_micros"
            ),
        )
    )


def jonckheere_trend(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """One row (n_total, k_groups, jt2, e2_null) — the
    Jonckheere–Terpstra ordered-alternative test (Jonckheere 1954 /
    Terpstra 1952, public literature) of event ``value`` across the
    week: do values trend MONOTONICALLY across ordered weekday groups
    (Mon < Tue < … as the ``(d+3) % 7`` ordering)?  Where
    :func:`anova_value_by_type` asks "any difference between groups"
    and :func:`mann_kendall_daily` tests the time series itself, JT
    is the rank test with power specifically against an ordered
    shift.

    JT = Σ_{i<j} U_ij (pairwise Mann–Whitney counts, ½ per tie);
    DOUBLED everything is integer — for each ordered group pair (i,j)
    and value v, 2·U picks up 2·cnt_j(v)·below_i(v) +
    cnt_j(v)·cnt_i(v).  Under H₀, E[2·JT] = (N² − Σn_g²)/2 exactly
    (e2_null); jt2 > e2_null = increasing trend.  All BIGINT.

    Scale shape: one (group, cents) map-side-combined count; the
    cumulative-below table lives on the k·|alphabet| lattice (one
    per-group window); the pair join is |alphabet|·k²/2 rows — group
    count is a constant 7 and the alphabet is the distinct-cents set,
    both bounded regardless of row count."""
    src = events.select(
        F.expr(
            f"cast((unix_micros(cast({ts_col} as timestamp))"
            f" div {DAY_US} + 3) % 7 as int)"
        ).alias("g"),
        F.round(F.col(value_col) * 100).cast("long").alias("v"),
    )
    cnt = src.groupBy("g", "v").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    alpha = cnt.select("v").distinct()
    groups = cnt.select("g").distinct()
    lattice = (
        alpha.crossJoin(F.broadcast(groups))
        .join(cnt, ["g", "v"], "left")
        .select(
            "g", "v", F.coalesce("c", F.lit(0)).cast("long").alias("ci")
        )
    )
    wb = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    iside = lattice.select(
        F.col("g").alias("gi"), "v", "ci",
        F.coalesce(F.sum("ci").over(wb), F.lit(0)).cast("long").alias(
            "below"
        ),
    )
    contrib = (
        cnt.select(F.col("g").alias("gj"), "v", F.col("c").alias("cj"))
        .join(iside, "v")
        .where(F.col("gi") < F.col("gj"))
        .agg(
            F.sum(
                2 * F.col("cj") * F.col("below")
                + F.col("cj") * F.col("ci")
            ).cast("long").alias("jt2")
        )
    )
    tot = cnt.groupBy("g").agg(F.sum("c").cast("long").alias("n")).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("nsq"),
    )
    return tot.crossJoin(F.broadcast(contrib)).select(
        F.col("nn").alias("n_total"),
        F.col("k").alias("k_groups"),
        F.coalesce("jt2", F.lit(0)).cast("long").alias("jt2"),
        F.expr("(nn * nn - nsq) div 2").cast("long").alias("e2_null"),
    )


def kruskal_wallis(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """One row (n_total, k_groups, rank_dev_den, h_micros) — the
    Kruskal–Wallis rank test (Kruskal & Wallis 1952, public
    literature), tie-corrected: do the k event types draw their
    ``value`` from the same distribution?  The k-group extension of
    :func:`mann_whitney_u` and the rank (outlier-robust) sibling of
    :func:`anova_value_by_type` — the standard first screen when the
    cents distributions are heavy-tailed.

    Tie-corrected identity on DOUBLED midranks (r2 = 2·cb + ct + 1,
    mean exactly N+1): H = (N−1)·Σⱼ tⱼ/nⱼ / D with
    tⱼ = (R2ⱼ − nⱼ·(N+1))² and D = Σ ct·(r2 − (N+1))² — the paired
    4s cancel, every term BIGINT.  The per-group division is emitted
    as a truncating micros term, (10⁶·(N−1)·tⱼ) div (nⱼ·D) on
    DECIMAL(38,0) / HUGEINT, and H is their exact sum — per-term
    truncation stated (the entropy-discipline analogue for integer
    ratios).  NULL when D = 0 (all values tied).

    Scale shape: one global cents-alphabet groupBy (map-side
    combined), one alphabet-bounded rank window, one (group, value)
    count joined to the alphabet, k-row and scalar rollups."""
    cents = events.select(
        F.col(group_col).alias("g"),
        F.round(F.col(value_col) * 100).cast("long").alias("v"),
    )
    byv = cents.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("ct")
    )
    wb = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    r2v = byv.select(
        "v", "ct",
        (
            2 * F.coalesce(F.sum("ct").over(wb), F.lit(0))
            + F.col("ct") + 1
        ).cast("long").alias("r2"),
    )
    nn = byv.agg(F.sum("ct").cast("long").alias("n"))
    dd = r2v.crossJoin(F.broadcast(nn)).agg(
        F.sum(
            F.col("ct")
            * (F.col("r2") - (F.col("n") + 1))
            * (F.col("r2") - (F.col("n") + 1))
        ).cast("long").alias("d")
    )
    gv = cents.groupBy("g", "v").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    perg = (
        gv.join(F.broadcast(r2v.select("v", "r2")), "v")
        .groupBy("g")
        .agg(
            F.sum("c").cast("long").alias("nj"),
            F.sum(F.col("c") * F.col("r2")).cast("long").alias("r2j"),
        )
    )
    terms = (
        perg.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(dd))
        .select(
            "nj",
            F.when(
                F.col("d") > 0,
                F.expr(
                    "CAST((CAST(1000000 AS DECIMAL(38,0)) * (n - 1)"
                    " * (r2j - nj * (n + 1)) * (r2j - nj * (n + 1)))"
                    " div CAST(nj AS DECIMAL(38,0)) div"
                    " CAST(d AS DECIMAL(38,0)) AS BIGINT)"
                ),
            ).alias("term"),
        )
    )
    return (
        terms.agg(
            F.sum("nj").cast("long").alias("n_total"),
            F.count(F.lit(1)).cast("long").alias("k_groups"),
            F.sum("term").cast("long").alias("h_micros"),
        )
        .crossJoin(F.broadcast(dd))
        .select(
            "n_total", "k_groups",
            F.col("d").alias("rank_dev_den"),
            "h_micros",
        )
    )


def energy_distance_2sample(
    events: DataFrame,
    type_a: str = "purchase",
    type_b: str = "click",
    value_col: str = "value",
) -> DataFrame:
    """One row (n_a, n_b, e_micros) — the squared energy distance
    (Székely & Rizzo 2004, public literature) between two event
    types' value distributions: D² = 2·E|X−Y| − E|X−X'| − E|Y−Y'|.
    The METRIC-space two-sample test completing the family —
    :func:`ks_2sample` sees the max ECDF gap, :func:`cvm_2sample` the
    integrated gap, energy distance the actual cents geometry (it
    weights HOW FAR apart the masses sit, not just that they
    differ).

    Exactness: all three pair-sums ride the sorted-gap identity —
    Σ|x−y| = Σ over consecutive alphabet gaps g of g·(pairs the gap
    separates), cumulative counts in one alphabet-bounded window —
    so each is an exact BIGINT with NO O(n²) pair join; the single
    output is one truncating micros division over the cleared common
    denominator (2·S_ab·n_a·n_b − S_aa·n_b² − S_bb·n_a²)/(n_a²·n_b²)
    on DECIMAL(38,0) / HUGEINT.

    Scale shape: identical to KS/CvM — one map-side-combined groupBy
    onto the distinct-cents alphabet, one ordered window, scalars."""
    cents = events.where(
        F.col("event_type").isin(type_a, type_b)
    ).select(
        (F.col("event_type") == type_a).cast("int").alias("is_a"),
        F.round(F.col(value_col) * 100).cast("long").alias("v"),
    )
    per = cents.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("is_a").cast("long").alias("ca"),
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wl = Window.orderBy("v")
    cum = per.select(
        "v",
        F.sum("ca").over(w).cast("long").alias("cuma"),
        (F.sum("cnt").over(w) - F.sum("ca").over(w)).cast("long")
        .alias("cumb"),
        (F.lead("v").over(wl) - F.col("v")).cast("long").alias("g"),
    )
    tot = per.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum(F.col("cnt") - F.col("ca")).cast("long").alias("nb"),
    )
    sums = cum.crossJoin(F.broadcast(tot)).agg(
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.coalesce(
            F.sum(
                F.col("g")
                * (
                    F.col("cuma") * (F.col("nb") - F.col("cumb"))
                    + F.col("cumb") * (F.col("na") - F.col("cuma"))
                )
            ),
            F.lit(0),
        ).cast("long").alias("sab"),
        F.coalesce(
            F.sum(
                F.col("g") * 2 * F.col("cuma")
                * (F.col("na") - F.col("cuma"))
            ),
            F.lit(0),
        ).cast("long").alias("saa"),
        F.coalesce(
            F.sum(
                F.col("g") * 2 * F.col("cumb")
                * (F.col("nb") - F.col("cumb"))
            ),
            F.lit(0),
        ).cast("long").alias("sbb"),
    )
    return sums.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.when(
            (F.col("na") > 0) & (F.col("nb") > 0),
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0))"
                " * (2 * (CAST(sab AS DECIMAL(38,0)) * na * nb)"
                "    - CAST(saa AS DECIMAL(38,0)) * nb * nb"
                "    - CAST(sbb AS DECIMAL(38,0)) * na * na))"
                " div (CAST(na AS DECIMAL(38,0)) * na * nb * nb)"
                " AS BIGINT)"
            ),
        ).alias("e_micros"),
    )


def mean_excess_curve(
    events: DataFrame,
    deciles: tuple = (5, 6, 7, 8, 9),
    value_col: str = "value",
) -> DataFrame:
    """(decile, threshold_cents, n_exceed, mean_excess_cents) — the
    mean-excess (mean-residual-life) function ME(u) = E[X−u | X>u] at
    decile thresholds of the event-value distribution: the standard
    extreme-value-theory diagnostic (Davison & Smith 1990, public
    literature) — a LINEARLY RISING curve means a genuine heavy
    (GPD) tail and tells you where to set the POT threshold; flat ≈
    exponential; falling = short tail.  Completes the tail toolkit
    next to :func:`powerlaw_alpha` (which assumes the form) and the
    winsorized/MAD robust moments (which remove the tail).

    Exactness: thresholds ride the house rank rule (value at
    row (n·d) div 10 of the sorted multiset); per threshold the
    exceedance count and excess sum come off ONE top-down cumulative
    over the cents alphabet (sum_exc = tail_sum − u·tail_cnt), and
    the mean is a truncating division — integer end-to-end.

    Scale shape: one map-side-combined alphabet groupBy, one ordered
    window read twice (rank rule + tail cumulative), a deciles-sized
    join."""
    cents = events.select(
        F.round(F.col(value_col) * 100).cast("long").alias("v")
    )
    per = cents.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    nn = per.agg(F.sum("cnt").cast("long").alias("n"))
    cum = per.crossJoin(F.broadcast(nn)).select(
        "v", "cnt", "n",
        F.sum("cnt").over(w).cast("long").alias("cum"),
        (F.sum("cnt").over(w) - F.col("cnt")).cast("long").alias(
            "cum_prev"
        ),
        (F.col("n") - F.sum("cnt").over(w)).cast("long").alias(
            "tail_cnt"
        ),
        (
            F.sum(F.col("cnt") * F.col("v")).over(
                Window.orderBy("v").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            - F.sum(F.col("cnt") * F.col("v")).over(w)
        ).cast("long").alias("tail_sum"),
    )
    dlit = ", ".join(str(int(d)) for d in deciles)
    th = (
        cum.select(
            "v", "cum", "cum_prev", "tail_cnt", "tail_sum", "n",
            F.explode(F.expr(f"array({dlit})")).alias("decile"),
        )
        .where(
            (F.col("cum_prev") < F.expr("(n * decile) div 10"))
            & (F.expr("(n * decile) div 10") <= F.col("cum"))
        )
    )
    return th.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("v").alias("threshold_cents"),
        F.col("tail_cnt").alias("n_exceed"),
        F.when(
            F.col("tail_cnt") > 0,
            F.expr("(tail_sum - v * tail_cnt) div tail_cnt"),
        ).cast("long").alias("mean_excess_cents"),
    )


def circadian_concentration(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """One row (n_events, x_sum, y_sum, r_micros, rayleigh_z2_micros)
    — circular statistics of the hour-of-day distribution: the
    resultant length R = |Σ e^{iθ}|/n of the 24 hourly directions
    (θ = 2πh/24) and the Rayleigh uniformity statistic z = n·R²
    (Rayleigh 1880 / Mardia, public literature).  R → 0 = activity
    spread evenly around the clock, R → 1 = concentrated at one hour
    — the CIRCULAR answer the linear :func:`hour_dow_heatmap` can't
    give (23:00 and 01:00 are near on the circle, far in a
    histogram).

    Exactness: the 24 unit-vector components are rounded ONCE each to
    integer micros (fixed literal angles — cross-engine cos/sin ulp
    noise is far below the rounding granule, same argument as every
    per-term float in the repo); x/y sums are then exact integer
    blends of the hourly counts, and the two outputs are single
    identically-shaped float expressions over those integers.

    Scale shape: one 24-row map-side-combined groupBy; scalars."""
    per = events.groupBy(
        F.expr(
            f"cast((unix_micros(cast({ts_col} as timestamp))"
            " div 3600000000) % 24 as int)"
        ).alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    terms = per.select(
        "c",
        F.round(
            F.cos(
                F.lit(2.0) * F.lit(math.pi) * F.col("h").cast("double")
                / F.lit(24.0)
            )
            * 1_000_000
        ).cast("long").alias("xt"),
        F.round(
            F.sin(
                F.lit(2.0) * F.lit(math.pi) * F.col("h").cast("double")
                / F.lit(24.0)
            )
            * 1_000_000
        ).cast("long").alias("yt"),
    )
    agg = terms.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("xt")).cast("long").alias("xs"),
        F.sum(F.col("c") * F.col("yt")).cast("long").alias("ys"),
    )
    return agg.select(
        F.col("n").alias("n_events"),
        F.col("xs").alias("x_sum"),
        F.col("ys").alias("y_sum"),
        F.when(
            F.col("n") > 0,
            F.round(
                F.sqrt(
                    F.col("xs").cast("double") * F.col("xs")
                    + F.col("ys").cast("double") * F.col("ys")
                )
                / F.col("n")
            ),
        ).cast("long").alias("r_micros"),
        F.when(
            F.col("n") > 0,
            F.round(
                (
                    F.col("xs").cast("double") * F.col("xs")
                    + F.col("ys").cast("double") * F.col("ys")
                )
                / (F.col("n").cast("double") * 1_000_000.0)
            ),
        ).cast("long").alias("rayleigh_z2_micros"),
    )


def neyman_allocation(
    events: DataFrame,
    budget: int = 1000,
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(stratum, n_h, sd_cents_micros, share_micros, n_alloc) — Neyman
    optimal allocation (Neyman 1934, public literature) of a sampling
    ``budget`` across strata: n_h ∝ N_h·σ_h, the design that
    minimizes the variance of the stratified mean — big AND volatile
    strata get the samples.  The survey-sampling companion to
    :func:`sample_stratified` (which implements proportional
    allocation): this computes the allocation a cost-aware
    labeling/eval pass should use instead.

    Exactness: per-stratum population variance rides the exact
    n²-cancelling integer form; σ_h is the ONE per-stratum float
    (identically-shaped sqrt over exact BIGINTs, rounded to micro-
    cents); shares and allocations are truncating integer divisions
    of the N_h·σ_h products.  Remainder seats are NOT redistributed
    (Σ n_alloc ≤ budget, stated — largest-remainder seating is a
    policy choice left to the caller).

    Scale shape: one map-side-combined stratum moment aggregate, one
    scalar total broadcast back; k rows end to end."""
    per = events.groupBy(F.col(group_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        F.sum(
            F.round(F.col(value_col) * 100).cast("long")
        ).cast("long").alias("s"),
        F.sum(
            F.round(F.col(value_col) * 100).cast("long")
            * F.round(F.col(value_col) * 100).cast("long")
        ).cast("long").alias("q"),
    )
    sd = per.select(
        "stratum", "n_h",
        F.round(
            F.sqrt(
                (
                    F.col("n_h") * F.col("q") - F.col("s") * F.col("s")
                ).cast("double")
            )
            / F.col("n_h")
            * 1_000_000
        ).cast("long").alias("sd_cents_micros"),
    ).select(
        "stratum", "n_h", "sd_cents_micros",
        (F.col("n_h") * F.col("sd_cents_micros")).cast("long").alias(
            "w"
        ),
    )
    tot = sd.agg(F.sum("w").cast("long").alias("wt"))
    return (
        sd.crossJoin(F.broadcast(tot))
        .select(
            "stratum", "n_h", "sd_cents_micros",
            F.when(
                F.col("wt") > 0,
                F.expr(
                    "CAST((CAST(1000000 AS DECIMAL(38,0)) * w)"
                    " div CAST(wt AS DECIMAL(38,0)) AS BIGINT)"
                ),
            ).cast("long").alias("share_micros"),
            F.when(
                F.col("wt") > 0,
                F.expr(
                    f"CAST((CAST({int(budget)} AS DECIMAL(38,0)) * w)"
                    " div CAST(wt AS DECIMAL(38,0)) AS BIGINT)"
                ),
            ).cast("long").alias("n_alloc"),
        )
    )


def power_sample_size(
    events: DataFrame,
    cohort_type: str = "signup",
    convert_type: str = "purchase",
    relative_mde_micros: int = 100_000,
    z_alpha: float = 1.959964,
    z_beta: float = 0.841621,
) -> DataFrame:
    """One row (n_users, p1_micros, p2_micros, n_per_arm) — the
    standard two-proportion sample-size calculation (Fleiss et al.,
    public literature) seeded from the OBSERVED baseline: p₁ = the
    measured signup→purchase conversion, p₂ = p₁·(1 + relative MDE),
    n/arm = (z_α·√(2p̄q̄) + z_β·√(p₁q₁+p₂q₂))² / (p₂−p₁)² at 95%
    confidence / 80% power.  The pre-registration number every A/B
    test needs, computed where the baseline actually lives — the
    planning-side companion to :func:`ab_conversion_ztest` (which
    judges after the fact).

    Exactness: the baseline is an exact truncating micros ratio; the
    sample size is ONE identically-structured float expression over
    it (z constants are shared literals), ceil'd to an integer.

    Scale shape: one per-user flag aggregate, scalars after."""
    per = events.groupBy("user_id").agg(
        F.max(
            (F.col("event_type") == cohort_type).cast("int")
        ).alias("a"),
        F.max(
            (F.col("event_type") == convert_type).cast("int")
        ).alias("c"),
    )
    base = per.where(F.col("a") == 1).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("c").cast("long").alias("conv"),
    )
    return base.select(
        "n_users",
        F.expr("(1000000 * conv) div n_users").cast("long").alias(
            "p1_micros"
        ),
    ).select(
        "n_users", "p1_micros",
        F.expr(
            "CAST((p1_micros * (1000000 +"
            f" {int(relative_mde_micros)})) div 1000000 AS BIGINT)"
        ).alias("p2_micros"),
    ).select(
        "n_users", "p1_micros", "p2_micros",
        F.when(
            (F.col("p2_micros") > F.col("p1_micros"))
            & (F.col("p2_micros") < 1_000_000),
            F.ceil(
                F.pow(
                    F.lit(float(z_alpha))
                    * F.sqrt(
                        F.lit(2.0)
                        * ((F.col("p1_micros") + F.col("p2_micros"))
                           / F.lit(2e6))
                        * (
                            F.lit(1.0)
                            - (F.col("p1_micros") + F.col("p2_micros"))
                            / F.lit(2e6)
                        )
                    )
                    + F.lit(float(z_beta))
                    * F.sqrt(
                        (F.col("p1_micros") / F.lit(1e6))
                        * (F.lit(1.0) - F.col("p1_micros") / F.lit(1e6))
                        + (F.col("p2_micros") / F.lit(1e6))
                        * (F.lit(1.0) - F.col("p2_micros") / F.lit(1e6))
                    ),
                    F.lit(2.0),
                )
                / F.pow(
                    (F.col("p2_micros") - F.col("p1_micros"))
                    / F.lit(1e6),
                    F.lit(2.0),
                )
            ),
        ).cast("long").alias("n_per_arm"),
    )


def ols2_user_value(
    events: DataFrame,
    unit_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """One row (n, b1_micros, b2_micros, intercept_micros, r2) —
    TWO-feature multiple regression of per-user monetary cents on
    (event count, distinct event types): does value come from MORE
    activity or BROADER activity, holding the other fixed?  The
    multivariable extension of :func:`ols_user_value` — with
    correlated regressors the single-feature slope conflates both
    channels; the partial coefficients separate them.

    Exactness: m-scaled centered moments (all BIGINT), Cramér's rule
    on the 2×2 normal equations — b₁ = (S₁y·S₂₂ − S₂y·S₁₂)/D,
    b₂ = (S₂y·S₁₁ − S₁y·S₁₂)/D, D = S₁₁S₂₂ − S₁₂² — emitted as
    DECIMAL(38,0) truncating micros; the intercept clears n·D; R²
    uses the same closed form as the Granger SSE identity
    (explained = (S₁y·b₁ + S₂y·b₂)-form, computed as the exact
    rational Q/D over Syy), one 6dp float.  NULL when D ≤ 0
    (collinear regressors).

    Scale shape: one per-user combined aggregate, one 1-row moment
    aggregate, closed forms after — the ols_user_value shape with
    one more column."""
    per = events.groupBy(F.col(unit_col).alias("u")).agg(
        F.count(F.lit(1)).cast("long").alias("x1"),
        F.countDistinct(type_col).cast("long").alias("x2"),
        F.sum(
            F.round(F.col(value_col) * 100).cast("long")
        ).cast("long").alias("y"),
    )
    m = per.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x1").cast("long").alias("s1"),
        F.sum("x2").cast("long").alias("s2"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("p11"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("p22"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("p12"),
        F.sum(F.col("x1") * F.col("y")).cast("long").alias("p1y"),
        F.sum(F.col("x2") * F.col("y")).cast("long").alias("p2y"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("pyy"),
    )
    cen = m.select(
        "n", "s1", "s2", "sy",
        (F.col("n") * F.col("p11") - F.col("s1") * F.col("s1"))
        .cast("long").alias("s11"),
        (F.col("n") * F.col("p22") - F.col("s2") * F.col("s2"))
        .cast("long").alias("s22"),
        (F.col("n") * F.col("p12") - F.col("s1") * F.col("s2"))
        .cast("long").alias("s12"),
        (F.col("n") * F.col("p1y") - F.col("s1") * F.col("sy"))
        .cast("long").alias("s1y"),
        (F.col("n") * F.col("p2y") - F.col("s2") * F.col("sy"))
        .cast("long").alias("s2y"),
        (F.col("n") * F.col("pyy") - F.col("sy") * F.col("sy"))
        .cast("long").alias("syy"),
    )
    big = cen.select(
        "n", "s1", "s2", "sy", "syy", "s1y", "s2y",
        F.expr(
            "CAST(s11 AS DECIMAL(38,0)) * s22"
            " - CAST(s12 AS DECIMAL(38,0)) * s12"
        ).alias("dd"),
        F.expr(
            "CAST(s1y AS DECIMAL(38,0)) * s22"
            " - CAST(s2y AS DECIMAL(38,0)) * s12"
        ).alias("n1"),
        F.expr(
            "CAST(s2y AS DECIMAL(38,0)) * s11"
            " - CAST(s1y AS DECIMAL(38,0)) * s12"
        ).alias("n2"),
    )
    return big.select(
        "n",
        F.when(
            F.col("dd") > 0,
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * n1) div dd"
                " AS BIGINT)"
            ),
        ).alias("b1_micros"),
        F.when(
            F.col("dd") > 0,
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * n2) div dd"
                " AS BIGINT)"
            ),
        ).alias("b2_micros"),
        F.when(
            F.col("dd") > 0,
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * sy * dd"
                " - CAST(1000000 AS DECIMAL(38,0))"
                " * (n1 * s1 + n2 * s2))"
                " div (CAST(n AS DECIMAL(38,0)) * dd) AS BIGINT)"
            ),
        ).alias("intercept_micros"),
        F.when(
            (F.col("dd") > 0) & (F.col("syy") > 0),
            F.round(
                (
                    F.col("n1").cast("double")
                    * F.col("s1y").cast("double")
                    + F.col("n2").cast("double")
                    * F.col("s2y").cast("double")
                )
                / (
                    F.col("dd").cast("double")
                    * F.col("syy").cast("double")
                ),
                6,
            ),
        ).alias("r2"),
    )


def gk_lambda(
    df: DataFrame,
    col_x: str,
    col_y: str,
) -> DataFrame:
    """One row (n, err_marginal, err_conditional, lambda_micros) —
    Goodman–Kruskal's λ (Goodman & Kruskal 1954, public literature):
    the proportional reduction in PREDICTION ERROR for guessing Y
    once X is known — err falls from n − max_y(marginal) to
    n − Σ_x max_y(cell).  The decision-rule companion to
    :func:`theils_u` (entropy-based): λ = 0 means knowing X never
    changes the best guess even when dependence exists — a
    difference U cannot surface.

    Exactness: everything is a BIGINT count; λ is one truncating
    micros division.  NULL when the marginal error is 0 (Y
    constant).

    Scale shape: one joint map-side-combined groupBy, one per-X max,
    one per-Y marginal — codebook-sized throughout."""
    joint = df.groupBy(
        F.col(col_x).alias("x"), F.col(col_y).alias("y")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    nn = joint.agg(F.sum("c").cast("long").alias("n"))
    bym = (
        joint.groupBy("y").agg(F.sum("c").cast("long").alias("cy"))
        .agg(F.max("cy").cast("long").alias("maxy"))
    )
    byx = (
        joint.groupBy("x").agg(F.max("c").cast("long").alias("mx"))
        .agg(F.sum("mx").cast("long").alias("sum_mx"))
    )
    return (
        nn.crossJoin(F.broadcast(bym))
        .crossJoin(F.broadcast(byx))
        .select(
            "n",
            (F.col("n") - F.col("maxy")).cast("long").alias(
                "err_marginal"
            ),
            (F.col("n") - F.col("sum_mx")).cast("long").alias(
                "err_conditional"
            ),
            F.when(
                F.col("n") - F.col("maxy") > 0,
                F.expr(
                    "(1000000 * (sum_mx - maxy)) div (n - maxy)"
                ),
            ).cast("long").alias("lambda_micros"),
        )
    )


def james_stein_type_means(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """(group, n_h, raw_mean_cents_micros, shrunk_mean_cents_micros)
    — James–Stein / empirical-Bayes shrinkage (James & Stein 1961,
    public literature) of the per-group mean values toward the grand
    mean: each group's estimate moves by the factor
    1 − (k−3)·σ̂²_w / S, S = Σ n̄·(ȳ_h − ȳ)² (the positive-part
    estimator on the equal-variance approximation with n̄ the mean
    group size, stated).  Dominates the raw per-group means in total
    squared error whenever k ≥ 4 — the estimator a per-segment
    revenue dashboard should show when segments are small.

    Float discipline: raw means are truncating micros; the single
    shrink factor is ONE identically-shaped float over exact integer
    moments, rounded to micros once, then applied as an exact
    integer blend (grand + (factor·(raw − grand)) div 10⁶).

    Scale shape: one per-group moment aggregate (k rows), scalars
    broadcast back."""
    per = events.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        F.sum(
            F.round(F.col(value_col) * 100).cast("long")
        ).cast("long").alias("s"),
        F.sum(
            F.round(F.col(value_col) * 100).cast("long")
            * F.round(F.col(value_col) * 100).cast("long")
        ).cast("long").alias("q"),
    )
    raw = per.select(
        "group", "n_h", "s", "q",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * s)"
            " div CAST(n_h AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("raw_m"),
    )
    tot = raw.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_h").cast("long").alias("nt"),
        F.sum("s").cast("long").alias("st"),
        F.sum("q").cast("long").alias("qt"),
        F.sum("raw_m").cast("long").alias("rm_sum"),
    ).select(
        "k", "nt", "st", "qt",
        F.expr("rm_sum div k").cast("long").alias("grand_m"),
    )
    joined = raw.crossJoin(F.broadcast(tot))
    spread = joined.agg(
        F.sum(
            F.expr(
                "CAST(raw_m - grand_m AS DECIMAL(38,0))"
                " * (raw_m - grand_m)"
            )
        ).alias("ss")
    )
    return (
        joined.crossJoin(F.broadcast(spread))
        .select(
            "group", "n_h", F.col("raw_m").alias(
                "raw_mean_cents_micros"
            ),
            F.when(
                (F.col("k") >= 4) & (F.col("ss") > 0),
                F.expr(
                    "CAST(grand_m + (CAST(round(greatest(0.0,"
                    " 1.0 - (k - 3)"
                    " * ((CAST(qt AS DOUBLE) / nt"
                    "     - pow(CAST(st AS DOUBLE) / nt, 2.0))"
                    "    * 1e12 * k / nt)"
                    " / CAST(ss AS DOUBLE)) * 1000000) AS BIGINT)"
                    " * (raw_m - grand_m)) div 1000000 AS BIGINT)"
                ),
            ).otherwise(F.col("raw_m")).cast("long").alias(
                "shrunk_mean_cents_micros"
            ),
        )
    )


def adjusted_residuals_type_dow(
    events: DataFrame,
    top_k: int = 10,
    ts_col: str = "ts",
) -> DataFrame:
    """(dow, event_type, observed, resid_micros) — Haberman adjusted
    standardized residuals (Haberman 1973, public literature) of the
    event-type × weekday contingency table, top ``top_k`` by |resid|:
    WHICH cells drive the dependence :func:`chi_square_type_dow`
    detects — |r| > 2 flags the (day, type) combinations that are
    genuinely over/under-represented, the drill-down every omnibus
    chi-square needs.

    Exactness: the cell numerator N·O − r·c is an exact BIGINT; the
    residual is ONE identically-shaped float —
    (N·O − r·c)·√N / √(r·c·(N−r)·(N−c)) — rounded to micros per
    cell (algebraically equal to (O−E)/√(E(1−r/N)(1−c/N)) with
    denominators cleared).  Structural zeros of the observed
    type × dow lattice are included with O = 0 (they can be the
    most significant cells).  Tie-break (|resid| DESC, dow, type).

    Scale shape: one map-side-combined cell groupBy, two codebook
    marginals cross-joined back over the |types|·7 lattice, top-k."""
    src = events.select(
        "event_type",
        F.expr(
            f"cast((unix_micros(cast({ts_col} as timestamp))"
            f" div {DAY_US} + 3) % 7 as int)"
        ).alias("dow"),
    )
    cells = src.groupBy("dow", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    rows = cells.groupBy("dow").agg(F.sum("o").cast("long").alias("r"))
    cols = cells.groupBy("event_type").agg(
        F.sum("o").cast("long").alias("c")
    )
    nn = cells.agg(F.sum("o").cast("long").alias("n"))
    lattice = (
        rows.crossJoin(F.broadcast(cols))
        .join(cells, ["dow", "event_type"], "left")
        .crossJoin(F.broadcast(nn))
        .select(
            "dow", "event_type",
            F.coalesce("o", F.lit(0)).cast("long").alias("observed"),
            "r", "c", "n",
        )
    )
    resid = lattice.select(
        "dow", "event_type", "observed",
        F.when(
            (F.col("r") < F.col("n")) & (F.col("c") < F.col("n")),
            F.round(
                F.lit(1_000_000.0)
                * (
                    F.col("n") * F.col("observed")
                    - F.col("r") * F.col("c")
                ).cast("double")
                * F.sqrt(F.col("n").cast("double"))
                / F.sqrt(
                    F.col("r").cast("double") * F.col("c")
                    * (F.col("n") - F.col("r"))
                    * (F.col("n") - F.col("c"))
                ),
            ),
        ).otherwise(F.lit(0)).cast("long").alias("resid_micros"),
    )
    return resid.orderBy(
        F.abs(F.col("resid_micros")).desc(),
        F.col("dow").asc(),
        F.col("event_type").asc(),
    ).limit(top_k)


def daily_motif_pair(
    events: DataFrame,
    window: int = 7,
    ts_col: str = "ts",
) -> DataFrame:
    """One row (day_a, day_b, dist_sq, n_windows) — the matrix-profile
    motif (Yeh et al. 2016's problem, computed exactly at daily
    scale): the pair of NON-OVERLAPPING ``window``-day stretches of
    the zero-filled daily count series with the smallest squared
    distance — "which week repeated itself most exactly?"  The
    motif-discovery complement to :func:`binseg_changepoint` (which
    finds where the series BREAKS, not where it rhymes).

    Exactness: windows are the spine's consecutive runs; distances
    are exact BIGINT sums of squared differences; the argmin
    tie-breaks (dist, day_a, day_b).

    Scale shape: the window table is calendar-bounded (one row per
    start day); the pair join is |windows|² rows with a 7-element
    aligned-offset aggregation — at daily granularity this is
    thousands of rows, never data-scale; subsampling or MASS-style
    FFT pruning is the documented path if the series were
    minute-grained."""
    daily = events.groupBy(
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    rng = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d"),
        F.col("lo"), F.col("hi"),
    )
    filled = spine.join(daily, "d", "left").select(
        "d", "lo", "hi",
        F.coalesce("y", F.lit(0)).cast("long").alias("y"),
    )
    offs = filled.select(
        "d", "y",
        F.explode(
            F.sequence(F.lit(0), F.lit(int(window) - 1))
        ).alias("t"),
        "lo", "hi",
    ).select(
        (F.col("d") - F.col("t")).alias("s"), F.col("t"), "y",
        "lo", "hi",
    ).where(
        (F.col("s") >= F.col("lo"))
        & (F.col("s") + window - 1 <= F.col("hi"))
    )
    a = offs.select(F.col("s").alias("sa"), "t", F.col("y").alias("ya"))
    b = offs.select(F.col("s").alias("sb"), "t", F.col("y").alias("yb"))
    pairs = (
        a.join(b, "t")
        .where(F.col("sb") >= F.col("sa") + window)
        .groupBy("sa", "sb")
        .agg(
            F.sum(
                (F.col("ya") - F.col("yb"))
                * (F.col("ya") - F.col("yb"))
            ).cast("long").alias("dist_sq")
        )
    )
    nw = offs.select("s").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_windows")
    )
    best = pairs.orderBy(
        F.col("dist_sq").asc(), F.col("sa").asc(), F.col("sb").asc()
    ).limit(1)
    return best.crossJoin(F.broadcast(nw)).select(
        F.col("sa").alias("day_a"),
        F.col("sb").alias("day_b"),
        "dist_sq",
        "n_windows",
    )


def user_weekly_rhythm(
    events: DataFrame,
    lag: int = 7,
    top_k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, n_days, c0, c7, r7_micros) — the ``top_k`` most
    WEEKLY-PERIODIC users by lag-``lag`` autocorrelation of their
    zero-filled daily activity: r₇ = c₇/c₀ on the per-user n-scaled
    integer deviations.  The per-entity periodicity screen —
    :func:`acf_daily` sees the corpus rhythm; this finds WHICH users
    run on a weekly clock (habitual cohort) vs arrive memorylessly,
    the behavioral segmentation a scheduling or anomaly model keys
    on.  Tie-break (r7 DESC, user ASC); users with zero deviation
    variance are excluded (stated).

    Exactness: the acf_daily deviation discipline per user — dev =
    n·y − S_u over the GLOBAL day spine, c₀/c₇ exact BIGINT sums,
    one truncating micros division (negative r legal, truncation
    toward zero on both engines).

    Scale shape: one (user, day) map-side-combined count; the
    users × spine lattice is |users|·days rows; the lag join is a
    shifted equi-join on (user, day); top-k is
    TakeOrderedAndProject."""
    daily = events.groupBy(
        F.col(user_col).alias("u"),
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
        ).alias("d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    rng = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d"),
        (F.col("hi") - F.col("lo") + 1).cast("long").alias("n"),
    )
    users = daily.select("u").distinct()
    su = daily.groupBy("u").agg(F.sum("y").cast("long").alias("s"))
    lattice = (
        spine.crossJoin(users)
        .join(daily, ["u", "d"], "left")
        .join(su, "u")
        .select(
            "u", "d", "n",
            (
                F.col("n") * F.coalesce(F.col("y"), F.lit(0))
                - F.col("s")
            ).cast("long").alias("dev"),
        )
    )
    lagged = lattice.select(
        "u", (F.col("d") + lag).alias("d"), F.col("dev").alias("devp")
    )
    mom = (
        lattice.join(lagged, ["u", "d"], "left")
        .groupBy("u")
        .agg(
            F.max("n").alias("n_days"),
            F.sum(F.col("dev") * F.col("dev")).cast("long").alias("c0"),
            F.coalesce(
                F.sum(F.col("dev") * F.col("devp")), F.lit(0)
            ).cast("long").alias("c7"),
        )
    )
    return (
        mom.where(F.col("c0") > 0)
        .select(
            F.col("u").alias(user_col), "n_days", "c0", "c7",
            F.expr("(1000000 * c7) div c0").cast("long").alias(
                "r7_micros"
            ),
        )
        .orderBy(F.col("r7_micros").desc(), F.col(user_col).asc())
        .limit(top_k)
    )


def value_shape_moments(
    events: DataFrame,
    value_col: str = "value",
) -> DataFrame:
    """One row (n, skew_micros, kurtosis_micros, bimodality_micros) —
    the classical shape moments of the event-value distribution:
    skewness g₁ = μ₃/σ³, kurtosis b₂ = μ₄/σ⁴, and Sarle's bimodality
    coefficient BC = (g₁²+1)/(b₂ + 3(n−1)²/((n−2)(n−3))) (public
    literature; BC > 5/9 suggests two value regimes — the one-number
    "should I segment revenue?" screen that the quantile and tail
    diagnostics don't directly answer).

    Exactness: n-scaled integer deviations dev = n·x − S make every
    power sum exact — Σdev² in BIGINT, Σdev³/Σdev⁴ in DECIMAL(38,0)
    / HUGEINT per-term — and the scale factors collapse to
    g₁ = Σdev³·√n / (Σdev²)^{3/2}, b₂ = Σdev⁴·n / (Σdev²)²; each
    output is ONE identically-shaped float over those exact
    integers, rounded to micros.  NULL when σ = 0 or n ≤ 3.

    Scale shape: one 1-row moment aggregate over cents (map-side
    combined), scalars after."""
    cents = events.select(
        F.round(F.col(value_col) * 100).cast("long").alias("x")
    )
    base = cents.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    dev = cents.crossJoin(F.broadcast(base)).select(
        "n",
        (F.col("n") * F.col("x") - F.col("s")).cast("long").alias("d"),
    )
    mom = dev.groupBy("n").agg(
        F.sum(F.expr("CAST(d AS DECIMAL(38,0)) * d")).alias("m2"),
        F.sum(
            F.expr("CAST(d AS DECIMAL(38,0)) * d * d")
        ).alias("m3"),
        F.sum(
            F.expr(
                "CAST(d AS DECIMAL(38,0)) * d"
                " * (CAST(d AS DECIMAL(38,0)) * d)"
            )
        ).alias("m4"),
    )
    g1 = (
        F.col("m3").cast("double")
        * F.sqrt(F.col("n").cast("double"))
        / F.pow(F.col("m2").cast("double"), F.lit(1.5))
    )
    b2 = (
        F.col("m4").cast("double")
        * F.col("n").cast("double")
        / (F.col("m2").cast("double") * F.col("m2").cast("double"))
    )
    corr = (
        F.lit(3.0)
        * (F.col("n") - 1).cast("double")
        * (F.col("n") - 1).cast("double")
        / (
            (F.col("n") - 2).cast("double")
            * (F.col("n") - 3).cast("double")
        )
    )
    return mom.select(
        "n",
        F.when(
            (F.col("m2") > 0) & (F.col("n") > 3),
            F.round(g1 * 1_000_000),
        ).cast("long").alias("skew_micros"),
        F.when(
            (F.col("m2") > 0) & (F.col("n") > 3),
            F.round(b2 * 1_000_000),
        ).cast("long").alias("kurtosis_micros"),
        F.when(
            (F.col("m2") > 0) & (F.col("n") > 3),
            F.round((g1 * g1 + F.lit(1.0)) / (b2 + corr) * 1_000_000),
        ).cast("long").alias("bimodality_micros"),
    )


def ljung_box_daily(
    events: DataFrame,
    max_lag: int = 7,
    ts_col: str = "ts",
) -> DataFrame:
    """One row (n_days, max_lag, q_micros) — the Ljung–Box
    portmanteau test (Ljung & Box 1978, public literature) on the
    zero-filled daily count series: Q = n(n+2)·Σ_{k≤h} r_k²/(n−k),
    the JOINT "is this white noise?" screen that completes the
    :func:`acf_daily` / :func:`pacf_daily` / :func:`durbin_watson
    _daily` family — individual r_k can each sit inside their bands
    while Q rejects (and Q is what an ARIMA residual check runs).

    Exactness: r_k = c_k/c₀ on the acf n-scaled integer deviations;
    each lag's term is the truncating micros division
    (10⁶·n·(n+2)·c_k²) div ((n−k)·c₀²) on DECIMAL(38,0) / HUGEINT
    (per-term truncation stated, the kruskal_wallis discipline), and
    Q is their exact sum.  NULL when c₀ = 0.

    Scale shape: the acf shape — one daily groupBy, one lag
    equi-join fan-out, an h-row rollup."""
    daily = events.groupBy(
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    rng = daily.agg(
        F.min("d").alias("lo"), F.max("d").alias("hi"),
        F.sum("y").cast("long").alias("s"),
    )
    spine = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d"),
        (F.col("hi") - F.col("lo") + 1).cast("long").alias("n"),
        "s",
    )
    dev = spine.join(daily, "d", "left").select(
        "d", "n",
        (
            F.col("n") * F.coalesce(F.col("y"), F.lit(0)) - F.col("s")
        ).cast("long").alias("dev"),
    )
    den = dev.agg(
        F.max("n").alias("n"),
        F.sum(F.col("dev") * F.col("dev")).cast("long").alias("c0"),
    )
    pairs = dev.select(
        F.explode(F.sequence(F.lit(1), F.lit(int(max_lag)))).alias(
            "lag"
        ),
        (F.col("d") + F.col("lag")).alias("d2"),
        F.col("dev").alias("dev_a"),
    )
    ck = (
        pairs.join(
            dev.select(F.col("d").alias("d2"), F.col("dev").alias(
                "dev_b"
            )),
            "d2",
        )
        .groupBy("lag")
        .agg(
            F.sum(F.col("dev_a") * F.col("dev_b")).cast("long").alias(
                "ck"
            )
        )
    )
    terms = ck.crossJoin(F.broadcast(den)).select(
        "n",
        F.when(
            F.col("c0") > 0,
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * n * (n + 2)"
                " * (CAST(ck AS DECIMAL(38,0)) * ck))"
                " div (CAST(n - lag AS DECIMAL(38,0))"
                " * (CAST(c0 AS DECIMAL(38,0)) * c0)) AS BIGINT)"
            ),
        ).alias("term"),
    )
    return terms.groupBy("n").agg(
        F.lit(int(max_lag)).cast("int").alias("max_lag"),
        F.sum("term").cast("long").alias("q_micros"),
    ).select(F.col("n").alias("n_days"), "max_lag", "q_micros")


def markov_order_test(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """One row (n_triples, n_contexts, g2_micros) — the
    Anderson–Goodman likelihood-ratio test (Anderson & Goodman 1957,
    public literature) of Markov ORDER for the per-user event-type
    sequences: does the next event depend only on the current one
    (order 1), or does the PREVIOUS event still matter (order 2)?
    G² = 2·Σ_{abc} n_abc·ln(n_abc·n_b / (n_ab·n_bc)), all marginals
    taken over the consecutive-triple table.  The model-selection
    companion to :func:`markov_entropy_rate` and the transition
    queries — it decides whether first-order machinery
    (:func:`markov_stationary`, attribution chains) is even
    adequate.

    Exactness: triple/marginal counts are exact BIGINTs from ONE
    ordered per-user window; each cell's term is the identically-
    shaped micro-rounded ln expression (repo per-term float rule),
    summed exactly.

    Scale shape: one per-user ordered window (two lags), one
    map-side-combined triple groupBy, three codebook-sized marginal
    joins."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tie_col)
    tri = (
        events.select(
            F.lag(type_col, 2).over(w).alias("a"),
            F.lag(type_col, 1).over(w).alias("b"),
            F.col(type_col).alias("c"),
        )
        .where(F.col("a").isNotNull())
        .groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("nabc"))
    )
    nab = tri.groupBy("a", "b").agg(
        F.sum("nabc").cast("long").alias("nab")
    )
    nbc = tri.groupBy("b", "c").agg(
        F.sum("nabc").cast("long").alias("nbc")
    )
    nb = tri.groupBy("b").agg(F.sum("nabc").cast("long").alias("nb"))
    scored = (
        tri.join(nab, ["a", "b"])
        .join(nbc, ["b", "c"])
        .join(F.broadcast(nb), "b")
        .select(
            "nabc",
            F.round(
                F.lit(2_000_000.0)
                * F.col("nabc")
                * F.log(
                    (F.col("nabc") * F.col("nb")).cast("double")
                    / (F.col("nab") * F.col("nbc")).cast("double")
                )
            ).cast("long").alias("term"),
        )
    )
    ctx = nab.agg(F.count(F.lit(1)).cast("long").alias("n_contexts"))
    return (
        scored.agg(
            F.sum("nabc").cast("long").alias("n_triples"),
            F.sum("term").cast("long").alias("g2_micros"),
        )
        .crossJoin(F.broadcast(ctx))
        .select("n_triples", "n_contexts", "g2_micros")
    )


def icc_user_value(
    events: DataFrame,
    unit_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """One row (n_events, n_users, icc_micros, deff_micros) — the
    one-way random-effects intraclass correlation ICC(1) (Fisher /
    Shrout & Fleiss 1979, public literature) of event values within
    users, and the design effect DEFF = 1 + (m̄−1)·ICC: how much of
    the value variance is BETWEEN users, and how much a user-
    clustered A/B test inflates its variance relative to independent
    sampling.  The number that decides cluster- vs user-level
    randomization — the missing link between
    :func:`anova_value_by_type` (fixed effects) and
    :func:`cuped_adjustment` (variance reduction).

    ANOVA estimator with unbalanced correction:
    ICC = (MSB − MSW)/(MSB + (m₀−1)·MSW),
    m₀ = (N − Σnᵢ²/N)/(G−1), m̄ = N/G.  Sums of squares ride the
    exact HUGEINT moment algebra (the anova discipline); the two
    outputs are identically-shaped floats over those integers,
    rounded to micros.  NULL when G < 2 or N ≤ G.

    Scale shape: one per-user moment aggregate, scalars."""
    per = events.groupBy(F.col(unit_col).alias("u")).agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(
            F.round(F.col(value_col) * 100).cast("long")
        ).cast("long").alias("s"),
        F.sum(
            F.round(F.col(value_col) * 100).cast("long")
            * F.round(F.col(value_col) * 100).cast("long")
        ).cast("long").alias("q"),
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("long").alias("g"),
        F.sum("m").cast("long").alias("nn"),
        F.sum("s").cast("long").alias("st"),
        F.sum("q").cast("long").alias("qt"),
        F.sum(F.expr("CAST(m AS DECIMAL(38,0)) * m")).alias("msq"),
        F.sum(F.expr("(CAST(s AS DECIMAL(38,0)) * s) div m")).alias(
            "sb"
        ),
    )
    ssb = (
        "CAST(sb AS DOUBLE)"
        " - CAST(st AS DOUBLE) * st / CAST(nn AS DOUBLE)"
    )
    ssw = "CAST(qt AS DOUBLE) - CAST(sb AS DOUBLE)"
    msb = f"(({ssb}) / (g - 1))"
    msw = f"(({ssw}) / (nn - g))"
    m0 = (
        "((CAST(nn AS DOUBLE) - CAST(msq AS DOUBLE) / nn)"
        " / (g - 1))"
    )
    icc = f"(({msb}) - ({msw})) / (({msb}) + ({m0} - 1.0) * ({msw}))"
    return tot.select(
        F.col("nn").alias("n_events"),
        F.col("g").alias("n_users"),
        F.when(
            (F.col("g") >= 2) & (F.col("nn") > F.col("g")),
            F.expr(f"CAST(round(({icc}) * 1000000) AS BIGINT)"),
        ).alias("icc_micros"),
        F.when(
            (F.col("g") >= 2) & (F.col("nn") > F.col("g")),
            F.expr(
                "CAST(round((1.0 + (CAST(nn AS DOUBLE) / g - 1.0)"
                f" * ({icc})) * 1000000) AS BIGINT)"
            ),
        ).alias("deff_micros"),
    )


def ucb1_channel_scores(
    events: DataFrame,
    convert_type: str = "purchase",
    window_days: int = 1,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(arm, n_trials, n_conversions, mean_micros, ucb_micros) — the
    UCB1 index (Auer, Cesa-Bianchi & Fischer 2002, public
    literature) for each event type treated as a bandit arm, with
    reward = "the same user converts within ``window_days``":
    UCB = mean + √(2·ln N / n_a).  The allocation snapshot a
    deterministic bandit would act on — the EXPLORATION-aware view
    that a raw conversion-rate table (:func:`conversion_prob`)
    cannot give: an under-sampled arm with middling mean can
    legitimately outrank the current best.

    Exactness: trial/conversion counts are BIGINTs (first-conversion
    delay via one per-user min-aggregate, the conversion_window_curve
    machinery); the mean is a truncating micros ratio; the bonus is
    the ONE identically-shaped float over (N, n_a), rounded to
    micros.

    Scale shape: one per-actor equi-join bounded by per-actor
    history, one arm-sized rollup."""
    fr = events.where(F.col("event_type") != convert_type).select(
        F.col("event_type").alias("arm"),
        F.col(user_col).alias("u"),
        F.col("event_id").alias("fid"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ft"),
    )
    to = events.where(F.col("event_type") == convert_type).select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("tt"),
    )
    delay = (
        fr.join(to, "u")
        .where(F.col("tt") > F.col("ft"))
        .groupBy("fid")
        .agg(F.min(F.col("tt") - F.col("ft")).alias("d"))
    )
    conv = fr.join(delay, "fid", "left").select(
        "arm",
        (
            F.col("d").isNotNull()
            & (F.col("d") <= int(window_days) * 86_400_000_000)
        ).cast("long").alias("r"),
    )
    per = conv.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_trials"),
        F.sum("r").cast("long").alias("n_conversions"),
    )
    nn = per.agg(F.sum("n_trials").cast("long").alias("nt"))
    return per.crossJoin(F.broadcast(nn)).select(
        "arm", "n_trials", "n_conversions",
        F.expr("(1000000 * n_conversions) div n_trials").cast("long")
        .alias("mean_micros"),
        (
            F.expr("(1000000 * n_conversions) div n_trials")
            + F.round(
                F.sqrt(
                    F.lit(2.0)
                    * F.log(F.col("nt").cast("double"))
                    / F.col("n_trials").cast("double")
                )
                * 1_000_000
            )
        ).cast("long").alias("ucb_micros"),
    )


def pages_trend_weekly(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """One row (n_weeks, k_days, l2, e2_null) — Page's trend test
    (Page 1963, public literature) with complete calendar weeks as
    blocks and the ORDERED weekdays as treatments: does activity rise
    (or fall) MONOTONICALLY through the week?  Where
    :func:`friedman_event_ranks` asks "are the groups consistently
    ordered at all" and :func:`dow_seasonality` shows the raw
    per-day means, Page's L is the rank test with power specifically
    against an ordered within-week trend — L = Σ_j j·R_j over the
    within-week ranks.

    Exactness: the Friedman doubled-midrank discipline per week
    (r2 = 2·cb + ct + 1, ties averaged); L2 = Σ (dow+1)·R2_dow and
    its exact null expectation E[L2] = n·k·(k+1)² are BIGINTs.
    Incomplete boundary weeks are EXCLUDED (stated) so every block
    has exactly k = 7 cells, zero-filled.

    Scale shape: one daily groupBy, a weeks × 7 zero-filled lattice,
    per-week rank windows (7 rows each), two codebook rollups."""
    daily = events.groupBy(
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    rng = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d"),
        F.col("lo"), F.col("hi"),
    )
    filled = spine.join(daily, "d", "left").select(
        "d", "lo", "hi",
        F.coalesce("y", F.lit(0)).cast("long").alias("y"),
        F.expr("cast((d + 3) div 7 as long)").alias("wk"),
        F.expr("cast((d + 3) % 7 as int)").alias("dow"),
    )
    complete = (
        filled.groupBy("wk")
        .agg(F.count(F.lit(1)).cast("long").alias("nd"))
        .where(F.col("nd") == 7)
        .select("wk")
    )
    cells = filled.join(complete, "wk", "left_semi").select(
        "wk", "dow", "y"
    )
    grp = cells.groupBy("wk", "y").agg(
        F.count(F.lit(1)).cast("long").alias("ct")
    )
    wb = Window.partitionBy("wk").orderBy("y").rowsBetween(
        Window.unboundedPreceding, -1
    )
    r2v = grp.select(
        "wk", "y",
        (
            2 * F.coalesce(F.sum("ct").over(wb), F.lit(0))
            + F.col("ct") + 1
        ).cast("long").alias("r2"),
    )
    ranked = cells.join(r2v, ["wk", "y"])
    perdow = ranked.groupBy("dow").agg(
        F.sum("r2").cast("long").alias("r2d")
    )
    nW = complete.agg(F.count(F.lit(1)).cast("long").alias("n"))
    l2 = perdow.agg(
        F.sum((F.col("dow") + 1) * F.col("r2d")).cast("long").alias(
            "l2"
        )
    )
    return (
        nW.crossJoin(F.broadcast(l2))
        .select(
            F.col("n").alias("n_weeks"),
            F.lit(7).cast("int").alias("k_days"),
            F.coalesce("l2", F.lit(0)).cast("long").alias("l2"),
            # E[L2] = n·k·(k+1)²/2 with k = 7 → 224·n (doubled ranks)
            (F.col("n") * 224).cast("long").alias("e2_null"),
        )
    )


def seasonal_mann_kendall(
    events: DataFrame,
    period: int = 7,
    ts_col: str = "ts",
) -> DataFrame:
    """One row (n_days, n_pairs, s_total) — the seasonal
    Mann–Kendall test (Hirsch & Slack 1984, public literature):
    the MK sign statistic computed WITHIN each weekday's sub-series
    and summed, so the weekly cycle cannot masquerade as (or mask) a
    trend — compare Mondays to Mondays, never Monday to Saturday.
    The seasonal-robust upgrade of :func:`mann_kendall_daily`, read
    next to :func:`seasonal_decompose_daily`'s explicit split.

    Exactness: S = Σ_season Σ_{i<j} sign(y_j − y_i) over the
    zero-filled spine is a pure BIGINT count; n_pairs = Σ C(n_s, 2)
    exactly.

    Scale shape: one daily groupBy; the within-season pair join is
    |season|·(days/period)² — calendar-bounded, never data-scale."""
    daily = events.groupBy(
        F.expr(
            f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    rng = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d")
    )
    filled = spine.join(daily, "d", "left").select(
        "d",
        F.coalesce("y", F.lit(0)).cast("long").alias("y"),
        F.expr(f"cast((d + 3) % {int(period)} as int)").alias("s"),
    )
    a = filled.select("s", F.col("d").alias("da"), F.col("y").alias("ya"))
    b = filled.select("s", F.col("d").alias("db"), F.col("y").alias("yb"))
    pairs = a.join(b, "s").where(F.col("db") > F.col("da"))
    agg = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.coalesce(
            F.sum(F.signum(F.col("yb") - F.col("ya")).cast("long")),
            F.lit(0),
        ).cast("long").alias("s_total"),
    )
    nd = filled.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return nd.crossJoin(F.broadcast(agg)).select(
        "n_days", "n_pairs", "s_total"
    )


def rmst_user_lifetime(
    events: DataFrame,
    tau_days: int = 28,
    unit_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """One row (tau_days, n_deaths_by_tau, rmst_micro_days) — the
    Restricted Mean Survival Time (Royston & Parmar 2013's
    recommended summary, public literature): the area under the
    :func:`kaplan_meier` curve up to ``tau_days`` — "expected active
    days within the first τ", the single interpretable lifetime
    number the KM CURVE doesn't directly give (and, unlike median
    survival, defined even when most units outlive the window).

    RMST = Σ over curve segments of S(tᵢ)·(min(tᵢ₊₁, τ) − tᵢ) with
    S(0⁻) = 10⁶, using the KM step values — the per-step integer
    survival micros ride straight into an exact BIGINT
    micro-day sum.

    Scale shape: the kaplan_meier shape plus one ordered window over
    the death-time curve (distinct-duration-sized)."""
    km = kaplan_meier(events, unit_col=unit_col, ts_col=ts_col)
    w = Window.orderBy("duration_days")
    seg = km.where(F.col("duration_days") <= tau_days).select(
        "duration_days",
        "n_deaths",
        "survival_micros",
        F.coalesce(
            F.lag("survival_micros").over(w), F.lit(1_000_000)
        ).cast("long").alias("s_prev"),
        F.coalesce(
            F.lag("duration_days").over(w), F.lit(0)
        ).cast("long").alias("d_prev"),
    )
    area = seg.agg(
        F.coalesce(F.sum("n_deaths"), F.lit(0)).cast("long").alias(
            "n_deaths_by_tau"
        ),
        F.coalesce(
            F.sum(
                F.col("s_prev")
                * (F.col("duration_days") - F.col("d_prev"))
            ),
            F.lit(0),
        ).cast("long").alias("a_before"),
    )
    last = (
        seg.orderBy(F.col("duration_days").desc())
        .limit(1)
        .select(
            F.col("survival_micros").alias("s_last"),
            F.col("duration_days").alias("d_last"),
        )
    )
    return (
        area.join(last, F.lit(True), "left")
        .select(
            F.lit(int(tau_days)).cast("int").alias("tau_days"),
            "n_deaths_by_tau",
            (
                F.col("a_before")
                + F.coalesce("s_last", F.lit(1_000_000))
                * (
                    F.lit(int(tau_days))
                    - F.coalesce("d_last", F.lit(0))
                )
            ).cast("long").alias("rmst_micro_days"),
        )
    )


def mood_median_test(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """One row (n_total, k_groups, chi2_micros) — Mood's median test
    (Mood 1950, public literature): classify every value as
    above/not-above the GLOBAL lower median and chi-square the
    resulting 2×k table.  The coarsest, most outlier-proof of the
    k-group location screens — where :func:`kruskal_wallis` uses full
    ranks and :func:`anova_value_by_type` raw moments, Mood's test
    only asks which side of the median each observation falls on
    (low power, but immune to anything the tails do).

    Exactness: the global median is the runs_test lower-median rank
    rule; cells/marginals are BIGINTs and each cell's (O−E)²/E term
    rides the chi_square quotient/remainder micros split on
    DECIMAL(38,0)/HUGEINT, summed exactly.  NULL when a marginal is
    degenerate.

    Scale shape: one alphabet groupBy for the median, one
    map-side-combined (group, side) count, a 2k-cell rollup."""
    cents = events.select(
        F.col(group_col).alias("g"),
        F.round(F.col(value_col) * 100).cast("long").alias("v"),
    )
    byv = cents.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("ct")
    )
    wm = Window.orderBy(F.col("v").asc())
    med = (
        byv.select(
            "v", "ct",
            F.sum("ct").over(
                wm.rowsBetween(Window.unboundedPreceding, 0)
            ).alias("cum"),
            F.sum("ct").over(
                wm.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("n"),
        )
        .where(
            (F.col("cum") >= F.expr("(n + n % 2) div 2"))
            & (
                F.col("cum") - F.col("ct")
                < F.expr("(n + n % 2) div 2")
            )
        )
        .select(F.col("v").alias("med"))
    )
    cells = cents.crossJoin(F.broadcast(med)).groupBy(
        "g", (F.col("v") > F.col("med")).cast("int").alias("hi")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    rows = cells.groupBy("g").agg(F.sum("o").cast("long").alias("r"))
    cols = cells.groupBy("hi").agg(F.sum("o").cast("long").alias("c"))
    nn = cells.agg(F.sum("o").cast("long").alias("n"))
    lattice = (
        rows.crossJoin(F.broadcast(cols))
        .join(cells, ["g", "hi"], "left")
        .crossJoin(F.broadcast(nn))
        .select(
            F.coalesce("o", F.lit(0)).cast("long").alias("o"),
            "r", "c", "n",
        )
    )
    term = lattice.select(
        "n",
        F.expr(
            "CAST(1000000 AS DECIMAL(38,0))"
            " * ((CAST(n AS DECIMAL(38,0)) * o - CAST(r AS DECIMAL(38,0)) * c)"
            "    * (CAST(n AS DECIMAL(38,0)) * o - CAST(r AS DECIMAL(38,0)) * c))"
        ).alias("a2"),
        F.expr(
            "CAST(n AS DECIMAL(38,0)) * r * c"
        ).alias("den"),
    ).select(
        "n",
        F.when(
            F.col("den") > 0,
            F.expr("CAST(a2 div den AS BIGINT)"),
        ).alias("t"),
    )
    kg = cells.agg(F.countDistinct("g").cast("long").alias("k"))
    return (
        term.groupBy("n")
        .agg(F.sum("t").cast("long").alias("chi2_micros"))
        .crossJoin(F.broadcast(kg))
        .select(
            F.col("n").alias("n_total"),
            F.col("k").alias("k_groups"),
            "chi2_micros",
        )
    )


def lincoln_petersen_reach(
    events: DataFrame,
    unit_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """One row (n_first, n_second, n_both, chapman_estimate,
    coverage_micros) — Lincoln–Petersen capture–recapture (public
    literature; Chapman's bias-corrected form) treating the
    observation window's two halves as the two capture occasions:
    estimate the TRUE active population N̂ = (n₁+1)(n₂+1)/(m+1) − 1
    from how many users are seen in both halves, and report observed
    coverage = seen/N̂.  The ecology estimator applied to reach —
    the number of users the corpus NEVER saw, which no direct count
    (:func:`~graphlite_spark.operators.sketches.kmv_distinct` et al.)
    can give; the two-occasion sibling of the Chao1 vocabulary
    estimate.

    Exactness: the half boundary is the exact midpoint of the
    [min, max] microsecond range (stated); all counts BIGINT; the
    Chapman estimate and coverage are truncating integer divisions.

    Scale shape: one per-user min/max aggregate against two literal
    boundaries, scalars."""
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    src = events.select(F.col(unit_col).alias("u"), ts_us.alias("t"))
    rng = src.agg(F.min("t").alias("lo"), F.max("t").alias("hi"))
    per = src.crossJoin(F.broadcast(rng)).groupBy("u").agg(
        F.max(
            (F.col("t") <= F.expr("lo + (hi - lo) div 2")).cast("int")
        ).alias("a"),
        F.max(
            (F.col("t") > F.expr("lo + (hi - lo) div 2")).cast("int")
        ).alias("b"),
    )
    agg = per.agg(
        F.sum("a").cast("long").alias("n_first"),
        F.sum("b").cast("long").alias("n_second"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("n_both"),
        F.count(F.lit(1)).cast("long").alias("n_seen"),
    )
    return agg.select(
        "n_first", "n_second", "n_both",
        F.expr(
            "((n_first + 1) * (n_second + 1)) div (n_both + 1) - 1"
        ).cast("long").alias("chapman_estimate"),
        F.when(
            F.expr(
                "((n_first + 1) * (n_second + 1)) div (n_both + 1) - 1"
            )
            > 0,
            F.expr(
                "(1000000 * n_seen) div"
                " (((n_first + 1) * (n_second + 1)) div (n_both + 1)"
                " - 1)"
            ),
        ).cast("long").alias("coverage_micros"),
    )


def cochran_armitage_trend(
    events: DataFrame,
    positive_type: str = "purchase",
    ts_col: str = "ts",
) -> DataFrame:
    """One row (n_total, n_positive, t_num, z2_micros) — the
    Cochran–Armitage trend test (Cochran 1954 / Armitage 1955, public
    literature) for a BINARY outcome across ordered groups: does the
    purchase SHARE of traffic trend monotonically across the ordered
    weekdays (scores s = 0..6)?  The binary-outcome member of the
    ordered-alternative family — :func:`jonckheere_trend` handles a
    continuous outcome, :func:`pages_trend_weekly` within-block
    ranks; CA is what an epidemiologist runs on a dose–response 2×k
    table.

    Exactness: with A = Σnᵢsᵢ², B = Σnᵢsᵢ, the statistic clears all
    denominators — T' = Σsᵢ(N·rᵢ − nᵢ·R) and
    z² = T'²·N / (R·(N−R)·(N·A − B²)) — BIGINT moments, one
    truncating micros division on DECIMAL(38,0)/HUGEINT.  NULL when
    the denominator is 0 (no positives, all positives, or one
    group).

    Scale shape: one map-side-combined (dow) rollup, scalars."""
    src = events.select(
        F.expr(
            f"cast((unix_micros(cast({ts_col} as timestamp))"
            f" div {DAY_US} + 3) % 7 as int)"
        ).alias("s"),
        (F.col("event_type") == positive_type).cast("long").alias("y"),
    )
    per = src.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("r"),
    )
    mom = per.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("r").cast("long").alias("rr"),
        F.sum(F.col("n") * F.col("s")).cast("long").alias("b"),
        F.sum(F.col("n") * F.col("s") * F.col("s")).cast("long").alias(
            "a"
        ),
        F.sum(
            F.col("s")
            * (F.lit(0) + F.col("r"))
        ).cast("long").alias("sr"),
    )
    return mom.select(
        F.col("nn").alias("n_total"),
        F.col("rr").alias("n_positive"),
        (F.col("nn") * F.col("sr") - F.col("b") * F.col("rr"))
        .cast("long").alias("t_num"),
        F.when(
            F.expr(
                "CAST(rr AS DECIMAL(38,0)) * (nn - rr)"
                " * (CAST(nn AS DECIMAL(38,0)) * a - CAST(b AS"
                " DECIMAL(38,0)) * b)"
            )
            > 0,
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0))"
                " * (CAST(nn AS DECIMAL(38,0)) * sr"
                "    - CAST(b AS DECIMAL(38,0)) * rr)"
                " * (CAST(nn AS DECIMAL(38,0)) * sr"
                "    - CAST(b AS DECIMAL(38,0)) * rr)"
                " * nn)"
                " div (CAST(rr AS DECIMAL(38,0)) * (nn - rr)"
                " * (CAST(nn AS DECIMAL(38,0)) * a"
                "    - CAST(b AS DECIMAL(38,0)) * b)) AS BIGINT)"
            ),
        ).alias("z2_micros"),
    )
