"""asof_join semantics pins: inclusive boundary, left-join NULLs, exact-
timestamp dedupe, and multi-key isolation."""

import datetime

from pyspark.sql import functions as F

from gazetteer_entity_parser_spark.operators.asof import asof_join, range_join_bucketed

BASE = datetime.datetime(2024, 1, 1)


def _ts(minutes):
    return BASE + datetime.timedelta(minutes=minutes)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(10), 100),  # after right @5 -> matches 5
            (1, _ts(5), 101),   # EXACTLY at right @5 -> inclusive match
            (1, _ts(1), 102),   # before any right -> NULLs
            (2, _ts(50), 200),  # user 2 sees only user 2's rights
        ],
        "user_id bigint, ts timestamp, event_id bigint",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(5), 10, 1.5),
            (1, _ts(9), 11, 2.5),
            (2, _ts(40), 20, 3.5),
            (1, _ts(30), 12, 9.9),  # later than every left row: never matches
        ],
        "user_id bigint, ts timestamp, event_id bigint, value double",
    )
    out = {
        r["event_id"]: r
        for r in asof_join(left, right, on="ts", by=["user_id"],
                           value_cols=["event_id", "value"]).collect()
    }
    assert out[100]["event_id_asof"] == 11 and out[100]["value_asof"] == 2.5
    assert out[100]["ts_asof"] == _ts(9)
    assert out[101]["event_id_asof"] == 10  # inclusive at equal ts
    assert out[102]["event_id_asof"] is None and out[102]["ts_asof"] is None
    assert out[200]["event_id_asof"] == 20  # keys never cross


def test_asof_join_exact_ts_dedupe(spark):
    """Two right rows at the identical (key, ts) resolve deterministically
    to the lexicographic max of value_cols (arg_max in the oracle)."""
    left = spark.createDataFrame(
        [(1, _ts(10), 100)], "user_id bigint, ts timestamp, event_id bigint"
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 7, 1.0), (1, _ts(5), 9, 2.0), (1, _ts(5), 8, 3.0)],
        "user_id bigint, ts timestamp, event_id bigint, value double",
    )
    row = asof_join(left, right).collect()[0]
    assert row["event_id_asof"] == 9 and row["value_asof"] == 2.0


def test_range_join_bucketed_semantics(spark):
    """Pairs exactly at the window edge are included (BETWEEN semantics);
    bucket-boundary pairs (adjacent buckets) are found; nothing outside the
    window or across keys leaks; no pair is emitted twice."""
    from gazetteer_entity_parser_spark.operators.asof import range_join_bucketed

    W = 600  # 10-minute window
    left = spark.createDataFrame(
        [
            (1, _ts(20), 100),
            (2, _ts(20), 200),
        ],
        "user_id bigint, ts timestamp, event_id bigint",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(10), 10),   # exactly at left.ts - W -> included
            (1, _ts(15), 11),   # inside, previous bucket of left @20
            (1, _ts(20), 12),   # exactly at left.ts -> included
            (1, _ts(9), 13),    # just outside -> excluded
            (1, _ts(21), 14),   # after -> excluded
            (2, _ts(19), 20),   # other key
        ],
        "user_id bigint, ts timestamp, event_id bigint",
    )
    out = range_join_bucketed(
        left, right, on="ts", by=["user_id"], window_seconds=W,
        value_cols=["event_id"],
    ).collect()
    pairs = sorted((r["event_id"], r["event_id_rng"]) for r in out)
    assert pairs == [(100, 10), (100, 11), (100, 12), (200, 20)]
    assert len(pairs) == len(set(pairs))  # each true pair exactly once


def test_range_join_plan_has_no_nested_loop(spark):
    """The whole point of bucketization: the physical plan must be a
    shuffled/broadcast EQUI-join, never BroadcastNestedLoopJoin or
    CartesianProduct (what Spark plans for a raw range condition)."""
    from gazetteer_entity_parser_spark.operators.asof import range_join_bucketed

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    b = ev.where(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    plan = (
        range_join_bucketed(a, b, window_seconds=21600, value_cols=["event_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_asof_join_null_semantics(spark):
    """NULL handling must match the SQL oracle (ON l.by = r.by AND l.on >=
    r.on): a match whose value column is genuinely NULL stays NULL (no
    back-fill from an older row), NULL-timestamp right rows never match,
    and NULL keys never match each other."""
    left = spark.createDataFrame(
        [(1, _ts(10), 100), (2, _ts(10), 200), (None, _ts(10), 300)],
        "user_id bigint, ts timestamp, event_id bigint",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(5), 10, 1.5),
            (1, _ts(9), 11, None),  # true match for user 1, value NULL
            (2, None, 20, 2.5),     # NULL ts: can never match
            (None, _ts(5), 30, 3.5),  # NULL key: can never match
        ],
        "user_id bigint, ts timestamp, event_id bigint, value double",
    )
    out = {
        r["event_id"]: r
        for r in asof_join(left, right, on="ts", by=["user_id"],
                           value_cols=["event_id", "value"]).collect()
    }
    assert len(out) == 3  # every left row survives (left semantics)
    # atomic match: event_id from the 00:09 row AND its NULL value —
    # not value 1.5 torn from the older 00:05 row
    assert out[100]["event_id_asof"] == 11 and out[100]["value_asof"] is None
    assert out[100]["ts_asof"] == _ts(9)
    # NULL-ts right row fabricates nothing
    assert out[200]["event_id_asof"] is None and out[200]["ts_asof"] is None
    # NULL keys don't match each other
    assert out[300]["event_id_asof"] is None


def test_asof_and_range_join_randomized_vs_reference(spark):
    """200 random events, several keys, duplicate and boundary-colliding
    timestamps: both operators must match a brute-force Python reference
    exactly (one Spark job per operator, seeded — not per-example jobs)."""
    import random

    rng = random.Random(20240817)
    W = 600
    lrows, rrows = [], []
    for i in range(100):
        # coarse second grid -> plenty of exact ties and window-edge hits
        lrows.append((rng.randint(1, 5), _ts(rng.randint(0, 300) / 10), 1000 + i))
    for i in range(100):
        rrows.append(
            (rng.randint(1, 5), _ts(rng.randint(0, 300) / 10), 2000 + i,
             float(rng.randint(0, 50)))
        )
    left = spark.createDataFrame(lrows, "user_id bigint, ts timestamp, event_id bigint")
    right = spark.createDataFrame(
        rrows, "user_id bigint, ts timestamp, event_id bigint, value double"
    )

    # ---- asof: reference = max-ts right row at-or-before; exact-ts ties
    # dedupe to lexicographic max of (event_id, value)
    got = {
        r["event_id"]: (r["event_id_asof"], r["value_asof"], r["ts_asof"])
        for r in asof_join(left, right, value_cols=["event_id", "value"]).collect()
    }
    assert len(got) == len(lrows)
    for u, lts, lid in lrows:
        cands = [(ts, eid, v) for (ru, ts, eid, v) in rrows if ru == u and ts <= lts]
        if not cands:
            assert got[lid] == (None, None, None), lid
        else:
            best_ts = max(c[0] for c in cands)
            eid, v = max((eid, v) for ts, eid, v in cands if ts == best_ts)
            assert got[lid] == (eid, v, best_ts), lid

    # ---- range: reference = every pair within [lts - W, lts]
    pairs = {
        (r["event_id"], r["event_id_rng"])
        for r in range_join_bucketed(
            left, right, window_seconds=W, value_cols=["event_id"]
        ).collect()
    }
    import datetime as _dt

    expected = {
        (lid, rid)
        for (u, lts, lid) in lrows
        for (ru, rts, rid, _v) in rrows
        if ru == u and lts - _dt.timedelta(seconds=W) <= rts <= lts
    }
    assert pairs == expected


def test_asof_join_salted_matches_unsalted_randomized(spark):
    """The skew-guarded plan (salt_seconds) must be ROW-IDENTICAL to the
    unsalted window plan on a randomized workload with carry-in cases:
    left rows landing in buckets whose right match lives several (possibly
    empty) buckets back, NULL-value matches (struct-coalesce tearing trap),
    and NULL keys/timestamps."""
    import random

    rng = random.Random(20260817)
    lrows, rrows = [], []
    for i in range(150):
        lrows.append((rng.randint(1, 4), _ts(rng.randint(0, 600)), 1000 + i))
    for i in range(60):
        rrows.append(
            (rng.randint(1, 4), _ts(rng.randint(0, 600)), 2000 + i,
             None if i % 5 == 0 else float(i))
        )
    lrows.append((None, _ts(10), 9000))
    rrows.append((2, None, 9100, 1.0))
    left = spark.createDataFrame(lrows, "user_id bigint, ts timestamp, event_id bigint")
    right = spark.createDataFrame(
        rrows, "user_id bigint, ts timestamp, event_id bigint, value double"
    )
    base = {tuple(r) for r in asof_join(left, right).collect()}
    for salt in (60, 600, 3600):  # 1-minute buckets force many carry-ins
        salted = {
            tuple(r) for r in asof_join(left, right, salt_seconds=salt).collect()
        }
        assert salted == base, f"salt_seconds={salt}"


def test_asof_join_salted_bounds_hot_key_partitions(spark):
    """One bot key holding ~50% of all rows: the salted window partitions on
    (key, time-bucket), so the hot key's largest sort group must shrink to
    ~(bucket span / total span) of its rows instead of all of them — the
    skew guard's actual contract. Results stay identical to unsalted."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(2000):  # hot bot key 99: half the corpus, spread over 10h
        rows.append((99, _ts(rng.randint(0, 600)), 10_000 + i))
    for i in range(2000):  # 200 normal keys
        rows.append((rng.randint(100, 300), _ts(rng.randint(0, 600)), 20_000 + i))
    left = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_id bigint")
    right = spark.createDataFrame(
        [(u, _ts(m), 30_000 + u * 1000 + m, float(m))
         for u in (99, 1, 2, 3) for m in (0, 100, 300)],
        "user_id bigint, ts timestamp, event_id bigint, value double",
    )
    salt = 3600  # 1-hour buckets over a 10-hour span
    base = {tuple(r) for r in asof_join(left, right).collect()}
    salted = {tuple(r) for r in asof_join(left, right, salt_seconds=salt).collect()}
    assert salted == base
    # bounded per-window-partition work, measured on the data itself
    from pyspark.sql import functions as F2

    sizes = (
        left.groupBy("user_id", F2.floor(
            F2.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '2000-01-01 00:00:00', ts)") / salt
        ).alias("b"))
        .count()
    )
    hot_max = sizes.where("user_id = 99").agg(F2.max("count")).collect()[0][0]
    hot_total = left.where("user_id = 99").count()
    assert hot_total == 2000
    assert hot_max <= hot_total * 0.25, hot_max  # >=4x spread at 10 buckets


def test_asof_join_salted_plan_partitions_window_on_bucket(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    b = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.lit(1.0).alias("value")
    )
    df = asof_join(a, b, salt_seconds=3600)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "_sbkt" in plan  # the big window really partitions on the salt
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_asof_join_salted_numeric_time_column(spark):
    """The salt bucketing's numeric branch (integer `on` column instead of a
    timestamp): same row-identity contract as the timestamp path."""
    left = spark.createDataFrame(
        [(1, t, 1000 + i) for i, t in enumerate([5, 100, 3600, 7300, 7400])],
        "user_id bigint, ts bigint, event_id bigint",
    )
    right = spark.createDataFrame(
        [(1, 0, 1, 1.0), (1, 3599, 2, 2.0), (1, 7301, 3, 3.0)],
        "user_id bigint, ts bigint, event_id bigint, value double",
    )
    base = {tuple(r) for r in asof_join(left, right).collect()}
    salted = {tuple(r) for r in asof_join(left, right, salt_seconds=3600).collect()}
    assert salted == base
    got = {r["event_id"]: r["event_id_asof"] for r in asof_join(left, right, salt_seconds=3600).collect()}
    # 3600 sits in bucket 1 whose only earlier right row is in bucket 0 -> carry-in
    assert got[1002] == 2 and got[1000] == 1 and got[1004] == 3
