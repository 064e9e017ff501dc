"""Funnel analysis over event streams: ordered step completion per user.

The product-analytics staple Spark has no native operator for: "of the
users who did A, how many then did B, then C — each strictly after the
previous step and all within ``within_seconds`` of step one?"

Physical shape: one conditional aggregation per step, each a user-keyed
groupBy with map-side combine — NO self-joins of the event table against
itself per step (the naive k-way join shuffles the corpus k times AND
explodes on users with many events; event data is exactly where per-key
event counts are heavy-tailed). Steps chain through a small per-user frame
(one row per user that completed the prefix), so step k's aggregation
scans the events table once and joins a user-sized dimension. Strictly
increasing timestamps between steps (ties do NOT advance the funnel —
simultaneous events can't prove order); first-occurrence semantics per
step (the earliest event that extends the prefix).

At 100 TB: k corpus scans (one per step) of a time/type-prunable table,
each reduced by a user-keyed partial agg; the per-user prefix frames stay
|users|-sized. A single-scan variant (collect per-user sorted event lists)
trades the extra scans for a per-user sort and an unbounded per-key state —
worse on heavy-tailed keys; the chosen shape is skew-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str] | tuple[str, ...],
    within_seconds: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_anchor: str = "first",
) -> DataFrame:
    """Per-user funnel completion times: (user, t1, t2, ..., tk) with tk
    NULL where the user never completed step k. Step k's time is the
    EARLIEST event of type ``steps[k]`` strictly after step k-1's time
    (greedy first-occurrence — NOT a search over later prefix completions)
    and, when ``within_seconds`` is set, no later than the anchor + window.
    Users with no step-1 event are absent (they carry no funnel state).

    ``window_anchor`` names the deadline convention — product-analytics
    tools disagree here, so it is an explicit argument rather than a silent
    choice (both semantics property-pinned in tests/test_funnel.py):

    - ``"first"`` (default, Amplitude-style conversion window): every step
      must land within ``within_seconds`` of step ONE's time.
    - ``"previous"`` (rolling window, GA4 "within N of prior step"): step k
      must land within ``within_seconds`` of step k-1's time.
    """
    steps = list(steps)
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    if window_anchor not in ("first", "previous"):
        raise ValueError(
            f"window_anchor must be 'first' or 'previous' (got {window_anchor!r})"
        )
    ev = events.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("etype"),
    ).where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())

    cur = (
        ev.where(F.col("etype") == steps[0])
        .groupBy("user")
        .agg(F.min("ts").alias("t1"))
    )
    # timestamp columns advance the deadline by a calendar INTERVAL; numeric
    # (epoch) time columns by plain addition — same dual contract as
    # asof_join's salt bucketing
    ts_is_timestamp = dict(ev.dtypes)["ts"].startswith("timestamp")
    for k, step in enumerate(steps[1:], start=2):
        cond = F.col("ts") > F.col(f"t{k - 1}")
        if within_seconds is not None:
            anchor = "t1" if window_anchor == "first" else f"t{k - 1}"
            if ts_is_timestamp:
                deadline = F.col(anchor) + F.expr(
                    f"INTERVAL {int(within_seconds)} SECOND"
                )
            else:
                deadline = F.col(anchor) + F.lit(int(within_seconds))
            cond = cond & (F.col("ts") <= deadline)
        found = (
            ev.where(F.col("etype") == step)
            .join(cur, "user")  # prefix frame: |users| rows, k-1 timestamps
            .where(cond)
            .groupBy("user")
            .agg(F.min("ts").alias(f"t{k}"))
        )
        # users who completed the prefix but not step k keep their row with
        # a NULL t{k} (and can therefore never complete step k+1: the next
        # round's ts > NULL comparison is never true)
        cur = cur.join(found, "user", "left")
    return cur.withColumnRenamed("user", user_col)


def funnel_counts(
    events: DataFrame,
    steps: list[str] | tuple[str, ...],
    within_seconds: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_anchor: str = "first",
) -> DataFrame:
    """The funnel report: one row per step with the number of users who
    completed that step (in order, within the window) and the conversion
    rate vs step 1. Output: (step_idx, step, n_users, conversion)."""
    steps = list(steps)
    per_user = funnel_steps(
        events, steps, within_seconds, user_col, ts_col, type_col, window_anchor
    )
    agg = per_user.agg(
        *[F.count(f"t{k}").alias(f"n{k}") for k in range(1, len(steps) + 1)]
    )
    rows = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("step_idx"),
                        F.lit(steps[k - 1]).alias("step"),
                        F.col(f"n{k}").alias("n_users"),
                        F.round(
                            F.when(F.col("n1") > 0, F.col(f"n{k}") / F.col("n1"))
                            .otherwise(F.lit(0.0)),
                            6,
                        ).alias("conversion"),
                    )
                    for k in range(1, len(steps) + 1)
                ]
            )
        ).alias("s")
    )
    return rows.select("s.step_idx", "s.step", "s.n_users", "s.conversion")


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 604800,
) -> DataFrame:
    """Cohort retention — funnel's companion report: users grouped by the
    period of their FIRST activity (the cohort), counted distinct in every
    later period they return. Output: (cohort_period, period_offset,
    n_users) where offset 0 is the cohort's own size.

    Periods are tz-free epoch buckets (timestampdiff from a fixed NTZ
    origin — date_trunc would route an NTZ timestamp through the session
    timezone). Two user-keyed aggregations + one join on the user id; the
    final rollup is (periods x offsets)-sized, corpus-independent."""
    origin = "TIMESTAMP_NTZ '2000-01-01 00:00:00'"
    period = F.floor(
        F.expr(f"timestampdiff(SECOND, {origin}, {ts_col})") / int(period_seconds)
    )
    w = (
        events.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("user"), period.alias("pd"))
    )
    cohort = w.groupBy("user").agg(F.min("pd").alias("cohort_pd"))
    return (
        w.join(cohort, "user")
        .groupBy(
            F.col("cohort_pd").alias("cohort_period"),
            (F.col("pd") - F.col("cohort_pd")).alias("period_offset"),
        )
        .agg(F.countDistinct("user").alias("n_users"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Event-flow transition counts (the Markov matrix funnel design starts
    from): for each user's time-ordered event sequence, count every
    adjacent (prev_type -> next_type) pair. One user-keyed window (lag) +
    one small groupBy; the rollup is |types|^2-sized, corpus-independent.

    Ordering is (ts, type) within user — the type tiebreak makes
    simultaneous events deterministic (identical (ts, type) duplicates
    yield the same transition multiset under any order). NULL users/
    timestamps are excluded (they can't order)."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, "next_type")
    seq = (
        events.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(user_col, ts_col, F.col(type_col).alias("next_type"))
        .withColumn("prev_type", F.lag("next_type").over(w))
        .where(F.col("prev_type").isNotNull())
    )
    return seq.groupBy("prev_type", "next_type").agg(
        F.count("*").alias("n_transitions")
    )
