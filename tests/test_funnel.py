"""Funnel analysis: ordered step completion, strict time order, window."""

import datetime

import pytest
from pyspark.sql import functions as F

from gazetteer_entity_parser_spark.operators.funnel import funnel_counts, funnel_steps

BASE = datetime.datetime(2024, 1, 1)


def _ts(minutes):
    return BASE + datetime.timedelta(minutes=minutes)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )


def test_funnel_ordering_and_window(spark):
    ev = _ev(spark, [
        (1, _ts(0), "A"), (1, _ts(5), "B"), (1, _ts(10), "C"),   # completes
        (2, _ts(0), "B"), (2, _ts(5), "A"), (2, _ts(3), "C"),    # B,C BEFORE A: stops at A
        (3, _ts(0), "A"), (3, _ts(0), "B"),                      # tie does NOT advance
        (4, _ts(0), "A"), (4, _ts(200), "B"),                    # B outside 100-min window
        (5, _ts(50), "B"), (5, _ts(60), "C"),                    # never did A: absent
    ])
    out = {r["user_id"]: r for r in funnel_steps(
        ev, ["A", "B", "C"], within_seconds=6000
    ).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["t1"] == _ts(0) and out[1]["t2"] == _ts(5) and out[1]["t3"] == _ts(10)
    assert out[2]["t2"] is None and out[2]["t3"] is None
    assert out[3]["t2"] is None  # simultaneous events can't prove order
    assert out[4]["t2"] is None  # outside the window anchored at t1

    counts = {r["step"]: (r["n_users"], r["conversion"]) for r in funnel_counts(
        ev, ["A", "B", "C"], within_seconds=6000
    ).collect()}
    assert counts["A"] == (4, 1.0)
    assert counts["B"] == (1, 0.25)
    assert counts["C"] == (1, 0.25)


def test_funnel_first_occurrence_semantics(spark):
    """Step k locks to the EARLIEST qualifying event even when a later one
    would leave more room for step k+1 (first-occurrence, not best-path:
    the standard product-analytics definition, matching the oracle)."""
    ev = _ev(spark, [
        (1, _ts(0), "A"),
        (1, _ts(1), "B"),   # earliest B locks t2=1
        (1, _ts(90), "B"),
        (1, _ts(0.5 * 1), "C"),  # only C is before t2 -> funnel stops
    ])
    out = funnel_steps(ev, ["A", "B", "C"]).collect()[0]
    assert out["t2"] == _ts(1)
    assert out["t3"] is None


def test_funnel_randomized_vs_python_reference(spark):
    import random

    rng = random.Random(20260817)
    rows = []
    for i in range(600):
        rows.append(
            (rng.randint(1, 40), _ts(rng.randint(0, 500)), rng.choice("ABCX"))
        )
    ev = _ev(spark, rows)
    W = 200 * 60  # seconds
    got = {r["user_id"]: (r["t1"], r["t2"], r["t3"]) for r in funnel_steps(
        ev, ["A", "B", "C"], within_seconds=W
    ).collect()}

    by_user = {}
    for u, t, e in rows:
        by_user.setdefault(u, []).append((t, e))
    expected = {}
    for u, evs in by_user.items():
        a = [t for t, e in evs if e == "A"]
        if not a:
            continue
        t1 = min(a)
        deadline = t1 + datetime.timedelta(seconds=W)
        b = [t for t, e in evs if e == "B" and t > t1 and t <= deadline]
        t2 = min(b) if b else None
        t3 = None
        if t2 is not None:
            c = [t for t, e in evs if e == "C" and t > t2 and t <= deadline]
            t3 = min(c) if c else None
        expected[u] = (t1, t2, t3)
    assert got == expected
    assert any(v[2] is not None for v in expected.values())  # non-trivial


def test_funnel_plan_no_event_self_join_explosion(spark):
    """Candidate joins are event-vs-prefix-frame (user-keyed), never a
    cartesian/BNLJ of the event stream against itself."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df = funnel_counts(ev, ["signup", "click", "purchase"], within_seconds=86400)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_retention_cohorts_semantics(spark):
    from gazetteer_entity_parser_spark.operators.funnel import retention_cohorts

    # periods of 60s; user 1 active periods {0,1,3}; user 2 {1}; user 3 {1,2}
    ev = _ev(spark, [
        (1, _ts(0), "A"), (1, _ts(1), "B"), (1, _ts(3), "A"),
        (2, _ts(1), "A"),
        (3, _ts(1), "A"), (3, _ts(2), "B"),
        (None, _ts(0), "A"),
    ])
    got = {(r["cohort_period"], r["period_offset"]): r["n_users"]
           for r in retention_cohorts(ev, period_seconds=60).collect()}
    # cohort at user-1's first minute-period P0: offsets 0,1,3 (one user)
    # cohort P1 (users 2,3): offset 0 has both, offset 1 has user 3
    # normalize: compute periods relative to the smallest cohort
    base = min(p for p, _ in got)
    rel = {(p - base, o): n for (p, o), n in got.items()}
    assert rel[(0, 0)] == 1 and rel[(0, 1)] == 1 and rel[(0, 3)] == 1
    assert rel[(1, 0)] == 2 and rel[(1, 1)] == 1
    assert (0, 2) not in rel  # user 1 skipped period 2
    assert sum(n for (p, o), n in rel.items() if o == 0) == 3  # null user dropped


def test_event_transitions_counts(spark):
    from gazetteer_entity_parser_spark.operators.funnel import event_transitions

    ev = _ev(spark, [
        (1, _ts(0), "A"), (1, _ts(1), "B"), (1, _ts(2), "A"),
        (2, _ts(0), "A"), (2, _ts(1), "B"),
        (3, _ts(5), "C"),                       # single event: no transition
        (4, _ts(0), "B"), (4, _ts(0), "A"),     # tie: type order A then B
    ])
    got = {(r["prev_type"], r["next_type"]): r["n_transitions"]
           for r in event_transitions(ev).collect()}
    assert got == {("A", "B"): 3, ("B", "A"): 1}


def test_funnel_numeric_time_column_with_window(spark):
    """Numeric (epoch) time columns work with within_seconds — same dual
    time contract as asof_join (r4 review finding)."""
    ev = spark.createDataFrame(
        [(1, 0, "A"), (1, 50, "B"), (1, 5000, "C"), (2, 0, "A"), (2, 90, "B"), (2, 95, "C")],
        "user_id bigint, ts bigint, event_type string",
    )
    out = {r["user_id"]: r for r in funnel_steps(
        ev, ["A", "B", "C"], within_seconds=100
    ).collect()}
    assert out[1]["t2"] == 50 and out[1]["t3"] is None  # C at 5000 misses window
    assert out[2]["t3"] == 95


def _funnel_ref(rows, steps, within, anchor):
    """Plain-Python greedy first-occurrence funnel over (user, ts, etype)
    rows with numeric time — the independent oracle for the property test."""
    by_user = {}
    for u, t, e in rows:
        by_user.setdefault(u, []).append((t, e))
    expected = {}
    for u, evs in by_user.items():
        firsts = [t for t, e in evs if e == steps[0]]
        if not firsts:
            continue
        times = [min(firsts)] + [None] * (len(steps) - 1)
        for k in range(1, len(steps)):
            prev = times[k - 1]
            if prev is None:
                break
            anchor_t = times[0] if anchor == "first" else prev
            cand = [
                t
                for t, e in evs
                if e == steps[k]
                and t > prev
                and (within is None or t <= anchor_t + within)
            ]
            times[k] = min(cand) if cand else None
        expected[u] = tuple(times)
    return expected


@pytest.mark.parametrize("n_steps", [4, 5])
@pytest.mark.parametrize("anchor", ["first", "previous"])
def test_funnel_property_many_steps_both_anchors(spark, n_steps, anchor):
    """r4 verdict item #7: randomized event soups at 4-5 steps, BOTH window
    anchors, vs an independent Python reference (numeric time)."""
    import random

    rng = random.Random(987_000 + n_steps * 10 + (anchor == "first"))
    steps = list("ABCDE"[:n_steps])
    rows = [
        (rng.randint(1, 30), float(rng.randint(0, 400)), rng.choice("ABCDEX"))
        for _ in range(900)
    ]
    ev = spark.createDataFrame(rows, "user_id bigint, ts double, event_type string")
    W = 120.0
    got = {
        r["user_id"]: tuple(r[f"t{k}"] for k in range(1, n_steps + 1))
        for r in funnel_steps(
            ev, steps, within_seconds=int(W), window_anchor=anchor
        ).collect()
    }
    expected = _funnel_ref(rows, steps, W, anchor)
    assert got == expected
    # non-trivial: some users complete the whole funnel, some stall midway
    assert any(v[-1] is not None for v in expected.values())
    assert any(v[-1] is None and v[0] is not None for v in expected.values())


def test_funnel_anchor_semantics_differ_and_validate(spark):
    """'previous' admits a slow-but-steady user that 'first' rejects; bogus
    anchor raises."""
    rows = [(1, 0.0, "A"), (1, 90.0, "B"), (1, 180.0, "C")]
    ev = spark.createDataFrame(rows, "user_id bigint, ts double, event_type string")
    first = funnel_steps(ev, ["A", "B", "C"], 100, window_anchor="first").collect()[0]
    prev = funnel_steps(ev, ["A", "B", "C"], 100, window_anchor="previous").collect()[0]
    assert first["t2"] == 90.0 and first["t3"] is None  # 180 > t1+100
    assert prev["t2"] == 90.0 and prev["t3"] == 180.0  # 180 <= t2+100
    with pytest.raises(ValueError, match="window_anchor"):
        funnel_steps(ev, ["A", "B"], 100, window_anchor="rolling")
