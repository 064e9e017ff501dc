"""Event-time joins Spark's DataFrame API lacks natively — as-of join and
bucketized range join — re-expressed as compositions of built-ins.

``asof_join(left, right)`` attaches, to every left row, the most recent
right row of the same key with ``right.on <= left.on`` (backward,
inclusive — the semantics of DuckDB's ``ASOF JOIN ... ON l.on >= r.on``,
which is the oracle).

Physical shape: tag both inputs, union, ONE window pass per key ordered by
(on, tag) with ``last(..., ignorenulls=True)`` over an unbounded-preceding
ROWS frame, then keep the left rows. That is a single shuffle keyed by the
join key and a per-key sort — no range-condition join (which Spark executes
as a broadcast nested loop unless the range-join hints apply) and no
candidate explosion on dense keys. At 100 TB the shuffle is the same one a
groupBy(key) would pay, and skewed keys can reuse the extraction harness's
salting because the window only needs per-key time order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | tuple[str, ...] = ("user_id",),
    value_cols: list[str] | tuple[str, ...] = ("event_id", "value"),
    suffix: str = "_asof",
    salt_seconds: int | None = None,
) -> DataFrame:
    """Backward inclusive as-of join.

    Returns every ``left`` row with ``{c}{suffix}`` for each of
    ``value_cols`` plus ``{on}{suffix}`` — the matched right row's values,
    or NULLs when the key has no right row at-or-before (left-join
    semantics). Right rows sharing an exact (by, on) are deduplicated
    deterministically to the lexicographic max of ``value_cols`` (mirrors
    ``arg_max`` in the SQL oracle); at equal timestamps the right row IS
    visible to the left row (inclusive boundary, pinned in
    tests/test_asof.py).

    NULL semantics match the SQL oracle's ``ON l.by = r.by AND l.on >=
    r.on``: right rows with a NULL key or NULL ``on`` can never match and
    are dropped up front, and a left row with NULL key/``on`` gets NULLs.
    The matched row is carried as ONE struct through ``last(ignorenulls)``
    — per-column fills would "tear" a match whose value column is
    genuinely NULL by back-filling it from an older row
    (tests/test_asof.py::test_asof_join_null_semantics).

    ``salt_seconds`` is the HOT-KEY skew guard: without it the window is
    one sort per key, so a pathological key (a bot user_id with 10^9
    events) serializes in a single task. With it, the window partitions on
    (key, time-bucket of width ``salt_seconds``) — each bucket sorts
    independently and a hot key's work spreads over time buckets — and a
    second, TINY pass computes each bucket's carry-in: the last right-row
    payload of the nearest earlier non-empty bucket, via a per-key window
    over (key, bucket) summary rows (cardinality = distinct buckets, not
    events). Left rows with no in-bucket match coalesce to the carry-in.
    Result is row-identical to the unsalted plan (pinned in
    tests/test_asof.py) because bucket boundaries respect time order:
    every right row in an earlier bucket is strictly earlier than every
    left row in a later one. Pick ``salt_seconds`` so a hot key's densest
    window fits one task (e.g. 3600 for a per-hour split).
    """
    by = list(by)
    value_cols = list(value_cols)
    not_null_key = F.col(on).isNotNull()
    for k in by:
        not_null_key = not_null_key & F.col(k).isNotNull()
    # deterministic dedupe of exact (by, on) collisions on the right
    r = (
        right.where(not_null_key)
        .groupBy(*by, on)
        .agg(F.max(F.struct(*value_cols)).alias("_m"))
        .select(
            *by,
            on,
            *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in value_cols],
        )
    )
    out_vals = [f"{c}{suffix}" for c in value_cols]
    payload_cols = out_vals + [f"{on}{suffix}"]
    rd = dict(r.dtypes)
    l_tagged = left.select(
        "*",
        F.lit(1).alias("_is_q"),
        *[F.lit(None).cast(rd[c]).alias(c) for c in out_vals],
        F.lit(None).cast(rd[on]).alias(f"{on}{suffix}"),
    )
    r_tagged = r.select(
        *[
            F.lit(None).cast(t).alias(c)
            for c, t in left.dtypes
            if c not in by and c != on
        ],
        *by,
        on,
        F.lit(0).alias("_is_q"),
        *out_vals,
        F.col(on).alias(f"{on}{suffix}"),
    )
    u = l_tagged.unionByName(r_tagged)
    # the whole matched row rides as ONE nullable struct (atomic fill)
    payload = F.when(
        F.col("_is_q") == 0, F.struct(*[F.col(c) for c in payload_cols])
    )
    # right rows (tag 0) sort before left rows (tag 1) at equal `on`,
    # making the boundary inclusive; NULL `on` left rows sort first and
    # therefore see no (non-null-on) right row — no match, as in SQL
    if salt_seconds is None:
        w = (
            Window.partitionBy(*by)
            .orderBy(on, "_is_q")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = u.withColumn("_match", F.last(payload, ignorenulls=True).over(w))
        return filled.where(F.col("_is_q") == 1).select(
            *left.columns,
            *[F.col(f"_match.{c}").alias(c) for c in payload_cols],
        )

    # --- salted plan: window per (key, time bucket) + carry-in pass ---
    s = int(salt_seconds)
    if dict(u.dtypes)[on].startswith("timestamp"):
        bkt = F.floor(_epoch_seconds(on) / s)
    else:
        bkt = F.floor(F.col(on) / s)
    u = u.withColumn("_sbkt", bkt)
    w = (
        Window.partitionBy(*by, "_sbkt")
        .orderBy(on, "_is_q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("_match", F.last(payload, ignorenulls=True).over(w))
    # per-(key, bucket) LAST right payload (max by time; (by, on) is unique
    # after the dedupe above), then carry-in = last non-empty bucket's
    # payload over STRICTLY EARLIER buckets — a window over bucket-summary
    # rows, whose cardinality is distinct (key, bucket) combos, not events
    bucket_last = (
        u.where(F.col("_is_q") == 0)
        .groupBy(*by, "_sbkt")
        .agg(
            F.max(
                F.struct(
                    F.col(on).alias("t"),
                    F.struct(*[F.col(c) for c in payload_cols]).alias("p"),
                )
            ).alias("_bl")
        )
    )
    all_buckets = u.select(*by, "_sbkt").distinct()
    wc = (
        Window.partitionBy(*by)
        .orderBy("_sbkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        all_buckets.join(bucket_last, by + ["_sbkt"], "left")
        .withColumn("_carry", F.last("_bl", ignorenulls=True).over(wc))
        .select(*by, "_sbkt", F.col("_carry.p").alias("_carry_p"))
    )
    return (
        filled.where(F.col("_is_q") == 1)
        .join(carry, by + ["_sbkt"], "left")
        # coalesce the whole STRUCTS, never per column — a per-column
        # coalesce would re-tear an in-bucket match whose value column is
        # genuinely NULL by back-filling that one column from the carry-in
        .withColumn("_m", F.coalesce(F.col("_match"), F.col("_carry_p")))
        .select(
            *left.columns,
            *[F.col(f"_m.{c}").alias(c) for c in payload_cols],
        )
    )


_EPOCH_ORIGIN = "TIMESTAMP_NTZ '2000-01-01 00:00:00'"


def _epoch_seconds(col_name: str):
    """Seconds since a fixed NTZ origin via ``timestampdiff`` — pure
    wall-clock arithmetic, no session-timezone conversion (an NTZ ->
    epoch cast would shift by the session zone and, across a DST fold,
    could distort two wall times' distance enough to break bucket
    adjacency)."""
    return F.expr(f"timestampdiff(SECOND, {_EPOCH_ORIGIN}, {col_name})")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | tuple[str, ...] = ("user_id",),
    window_seconds: int = 21600,
    value_cols: list[str] | tuple[str, ...] = ("event_id",),
    suffix: str = "_rng",
) -> DataFrame:
    """Range join — all right rows with ``left.on - window <= right.on <=
    left.on`` per key — via BUCKETIZATION: both sides bucket their time by
    the window width, the left side duplicates into its own and the
    previous bucket, and the match becomes an EQUI-join on (key, bucket)
    followed by the exact interval filter on the raw columns.

    Why: Spark executes a raw range-condition join as a broadcast
    nested loop (O(|L|x|R|) per key when neither side is broadcastable);
    the bucketed form is a plain shuffled equi-join whose candidate count
    is bounded by 2x the true temporal density. Each true pair is produced
    exactly once (a right row lives in exactly one bucket, which is either
    the left row's bucket or its predecessor), so no distinct is needed.
    The exact filter always re-checks the ORIGINAL timestamp columns."""
    by = list(by)
    value_cols = list(value_cols)
    w = int(window_seconds)
    r = right.select(
        *by,
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        F.floor(_epoch_seconds(on) / w).alias("_bkt"),
    )
    l_bkt = F.floor(_epoch_seconds(on) / w)
    l = left.select(
        "*", F.explode(F.array(l_bkt, l_bkt - 1)).alias("_bkt")
    )
    lo = F.col(on) - F.expr(f"INTERVAL {w} SECOND")
    return (
        l.join(r, by + ["_bkt"])
        .where((F.col(f"{on}{suffix}") >= lo) & (F.col(f"{on}{suffix}") <= F.col(on)))
        .drop("_bkt")
    )
