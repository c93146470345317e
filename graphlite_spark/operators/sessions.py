"""Gap-based sessionization of event streams.

The standard web-scale session operator: events of a user belong to the
same session while consecutive gaps stay under ``gap``; a larger gap
starts a new session.  Expressed as two window passes partitioned by
``user_id`` (bounded per-user state — parallel across users, the only
shuffle is one hash partition on user_id), then one aggregation per
session.  All JVM expressions; DuckDB mirrors the same two windows for
the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """(user_id, session_seq, n_events, start_us, end_us) per session."""
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    # parquet timestamps are TIMESTAMP_NTZ in Spark 4; session TZ is pinned
    # UTC so the cast is value-preserving and matches DuckDB's epoch_us
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap_us = gap_minutes * 60 * 1_000_000
    marked = events.select(
        F.col(user_col),
        ts_us.alias("ts_us"),
        F.when(
            F.lag(ts_us).over(w).isNull()
            | ((ts_us - F.lag(ts_us).over(w)) > gap_us),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_new"),
        *[F.col(c) for c in order_cols if c not in (ts_col, user_col)],
    )
    w2 = Window.partitionBy(user_col).orderBy(
        *[c if c != ts_col else "ts_us" for c in order_cols]
    )
    seq = marked.withColumn("session_seq", F.sum("is_new").over(w2))
    return seq.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
    )


def funnel_conversion(
    events: DataFrame,
    first_type: str = "click",
    then_type: str = "purchase",
    horizon_us: int = 86_400_000_000,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
) -> DataFrame:
    """One row (n_entered, n_converted, conversion) — the classic funnel:
    of the users whose FIRST ``first_type`` event exists, how many
    performed a ``then_type`` event strictly after it and within
    ``horizon_us``.  Exact integer counts (per-user min timestamps, one
    exists-join), a single 6dp division; NULL conversion when nobody
    entered.

    Shape: two map-side-combined per-user min-aggregates + one equi-join
    on the user + a 1-row reduce — no window, no ordering pass; at
    10^12 events both aggregates combine map-side and only user-sized
    frames shuffle."""
    first = (
        events.where(F.col(type_col) == first_type)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t0"))
    )
    hits = (
        events.where(F.col(type_col) == then_type)
        .select(user_col, F.col(ts_col).alias("t1"))
        .join(first, user_col)
        .where(
            (F.col("t1") > F.col("t0"))
            & (F.col("t1") <= F.col("t0") + horizon_us)
        )
        .select(user_col)
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        first.join(hits, user_col, "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_entered"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias(
                "n_converted"
            ),
        )
        .select(
            "n_entered",
            "n_converted",
            F.when(
                F.col("n_entered") > 0,
                F.round(
                    F.col("n_converted").cast("double")
                    / F.col("n_entered"),
                    6,
                ),
            ).alias("conversion"),
        )
    )


def bounce_rate(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
) -> DataFrame:
    """(n_sessions, n_bounces, bounce_micros, n_users,
    max_session_events) — the bounce readout over the standard
    gap-sessionization: the share of sessions containing exactly one
    event (10^6-scaled truncating ratio), next to the per-session
    stats :func:`sessionize` already emits.  One extra codebook-sized
    aggregate over the session table — the sessionize windows dominate
    and are unchanged."""
    s = sessionize(events, gap_minutes=gap_minutes, user_col=user_col)
    agg = s.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(
            (F.col("n_events") == 1).cast("long")
        ).cast("long").alias("n_bounces"),
        F.countDistinct(user_col).cast("long").alias("n_users"),
        F.max("n_events").cast("long").alias("max_session_events"),
    )
    return agg.select(
        "n_sessions", "n_bounces",
        F.expr("(1000000 * n_bounces) div n_sessions")
        .cast("long").alias("bounce_micros"),
        "n_users", "max_session_events",
    )


def daily_peak_concurrency(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
) -> DataFrame:
    """(day, peak_concurrent) — the sweep-line classic: the maximum
    number of simultaneously open sessions at any instant, per day
    (sessions clipped to day bounds, so a session spanning midnight
    counts in both days — stated).  +1 at each session start, −1 just
    after each session end, ordered cumulative sum, per-day max — the
    capacity-planning number next to DAU.

    Scale shape: the sessionize windows (unchanged) plus ONE per-day
    ordered window over ±1 deltas — partitions are day-bounded, so no
    global sort; ties at the same microsecond order (+1 before −1 via
    the delta sort key, so touching sessions count as concurrent)."""
    s = sessionize(events, gap_minutes=gap_minutes, user_col=user_col)
    clipped = s.select(
        "start_us", "end_us",
        F.explode(
            F.sequence(
                F.expr(f"start_us div {86400 * 1_000_000}"),
                F.expr(f"end_us div {86400 * 1_000_000}"),
            )
        ).alias("day"),
    )
    DAY = 86400 * 1_000_000
    deltas = clipped.select(
        "day",
        F.greatest(F.col("start_us"), F.col("day") * DAY).alias("t"),
        F.lit(1).alias("delta"),
    ).unionByName(
        clipped.select(
            "day",
            (
                F.least(
                    F.col("end_us"), (F.col("day") + 1) * DAY - 1
                )
                + 1
            ).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    w = Window.partitionBy("day").orderBy(
        "t", F.col("delta").desc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    running = deltas.select(
        "day", F.sum("delta").over(w).alias("open")
    )
    return running.groupBy("day").agg(
        F.max("open").cast("long").alias("peak_concurrent")
    )


def session_entry_exit(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
) -> DataFrame:
    """(entry_type, exit_type, n_sessions) — the session handoff
    matrix: which event type opens a session vs which closes it — the
    landing/exit-page analysis every product review runs.  One extra
    pair of first/last picks on the sessionize windows' own sort, then
    a codebook-sized groupBy."""
    w = Window.partitionBy(user_col).orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = gap_minutes * 60 * 1_000_000
    marked = events.select(
        F.col(user_col).alias("u"),
        ts_us.alias("ts_us"),
        "event_id", "event_type",
        F.when(
            F.lag(ts_us).over(w).isNull()
            | ((ts_us - F.lag(ts_us).over(w)) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("is_new"),
    )
    w2 = Window.partitionBy("u").orderBy("ts_us", "event_id")
    seq = marked.withColumn("session_seq", F.sum("is_new").over(w2))
    w3 = Window.partitionBy("u", "session_seq").orderBy(
        "ts_us", "event_id"
    )
    picks = seq.select(
        "u", "session_seq",
        F.first("event_type").over(
            w3.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("entry_type"),
        F.last("event_type").over(
            w3.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("exit_type"),
    ).distinct()
    return picks.groupBy("entry_type", "exit_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )


def max_nonoverlap_sessions(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
) -> DataFrame:
    """(k_selected, n_users) — classic greedy interval scheduling
    (earliest-end-first, the exchange-argument optimum) over each
    unit's sessions: the maximum set of pairwise non-overlapping
    sessions, histogrammed — "how many cleanly separated engagement
    episodes does a unit have?".  Touching endpoints (next start ==
    previous end) count as overlapping (strict > required, stated).

    Scale shape: the sessionize windows, then ONE per-unit sorted
    collect (bounded by the unit's own session count) folded with a
    struct accumulator — the oracle replays the identical greedy as a
    per-unit recursive CTE."""
    s = sessionize(events, gap_minutes=gap_minutes, user_col=user_col)
    arr = s.groupBy(F.col(user_col).alias("u")).agg(
        F.sort_array(
            F.collect_list(
                F.struct("end_us", "start_us", "session_seq")
            )
        ).alias("arr")
    )
    folded = arr.select(
        "u",
        F.aggregate(
            F.col("arr"),
            F.struct(
                F.lit(0).cast("long").alias("cnt"),
                F.lit(-1).cast("long").alias("last_end"),
            ),
            lambda acc, x: F.when(
                x["start_us"] > acc["last_end"],
                F.struct(
                    (acc["cnt"] + 1).alias("cnt"),
                    x["end_us"].cast("long").alias("last_end"),
                ),
            ).otherwise(acc),
        ).alias("g"),
    )
    return folded.groupBy(
        F.col("g.cnt").alias("k_selected")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_users"))


def session_gap_curve(
    events: DataFrame,
    gaps_minutes: tuple = (5, 15, 30, 60),
    user_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """(gap_minutes, n_users, n_sessions, avg_len_micros) — the
    sessionization SENSITIVITY curve: session count and mean session
    length at each candidate inactivity threshold, computed from ONE
    per-user gap table.  The tuning view behind
    :func:`sessionize`'s single fixed gap — pick the threshold where
    the curve's elbow sits instead of inheriting 30 minutes, exactly
    as :func:`~graphlite_spark.operators.temporal
    .conversion_window_curve` does for attribution windows.

    Exactness: n_sessions(g) = n_users + #{consecutive gaps > g}
    (every gap over the threshold starts one new session); counts
    are BIGINTs off one ordered lag window, the mean is a truncating
    micros division.

    Scale shape: one per-user ordered window computes all
    consecutive gaps once; each threshold is a conditional
    aggregate over that table — a thresholds-sized literal
    explode, no re-scan."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tie_col)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gapped = events.select(
        (ts_us - F.lag(ts_us).over(w)).alias("gap_us")
    )
    tot = events.agg(
        F.countDistinct(user_col).cast("long").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    aggs = gapped.agg(
        *[
            F.coalesce(
                F.sum(
                    (
                        F.col("gap_us") > int(g) * 60 * 1_000_000
                    ).cast("long")
                ),
                F.lit(0),
            ).cast("long").alias(f"b{int(g)}")
            for g in gaps_minutes
        ]
    )
    stack = ", ".join(
        f"struct({int(g)} as gap_minutes, b{int(g)} as n_breaks)"
        for g in gaps_minutes
    )
    return (
        tot.crossJoin(F.broadcast(aggs))
        .select(
            "n_users", "n_events",
            F.explode(F.expr(f"array({stack})")).alias("s"),
        )
        .select(
            F.col("s.gap_minutes").cast("int").alias("gap_minutes"),
            "n_users",
            (F.col("n_users") + F.col("s.n_breaks")).cast("long")
            .alias("n_sessions"),
            F.expr(
                "(1000000 * n_events) div (n_users + s.n_breaks)"
            ).cast("long").alias("avg_len_micros"),
        )
    )
