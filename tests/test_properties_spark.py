"""Property-based tests (hypothesis) for the round-4 Spark operators whose
correctness arguments are subtlest: the salted as-of join (must be
row-identical to the unsalted window plan on ANY workload), sequence
packing (budget bounds must hold for ANY length distribution), and hash
sampling (monotonicity must hold for ANY fraction pair).

Spark jobs are seconds-per-example, so example counts are deliberately
small — the fixed-seed randomized tests in test_asof/test_sampling carry
the bulk coverage; these add shrinkable adversarial search on top."""

import datetime

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from gazetteer_entity_parser_spark.operators.asof import asof_join
from gazetteer_entity_parser_spark.operators.sampling import (
    pack_sequences,
    sample_hash,
)

BASE = datetime.datetime(2024, 1, 1)


def _ts(minutes):
    return BASE + datetime.timedelta(minutes=float(minutes))


events_left = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 120)), min_size=1, max_size=20
)
events_right = st.lists(
    st.tuples(
        st.integers(1, 3),
        st.integers(0, 120),
        st.one_of(st.none(), st.floats(0, 10, allow_nan=False)),
    ),
    min_size=0,
    max_size=12,
)


@settings(max_examples=6, deadline=None)
@given(events_left, events_right, st.sampled_from([60, 600, 3600]))
def test_asof_salted_equals_unsalted_property(spark, lrows, rrows, salt):
    left = spark.createDataFrame(
        [(u, _ts(m), 1000 + i) for i, (u, m) in enumerate(lrows)],
        "user_id bigint, ts timestamp, event_id bigint",
    )
    right = spark.createDataFrame(
        [(u, _ts(m), 2000 + i, v) for i, (u, m, v) in enumerate(rrows)],
        "user_id bigint, ts timestamp, event_id bigint, value double",
    )
    base = {tuple(r) for r in asof_join(left, right).collect()}
    salted = {tuple(r) for r in asof_join(left, right, salt_seconds=salt).collect()}
    assert salted == base


doc_lengths = st.lists(st.integers(0, 30), min_size=1, max_size=40)


@settings(max_examples=6, deadline=None)
@given(doc_lengths, st.sampled_from([16, 64]))
def test_pack_sequences_bounds_property(spark, lengths, budget):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(lengths)],
        "doc_id bigint, text string",
    )
    rows = pack_sequences(docs, budget_tokens=budget, shard_chars=1, seed=3).collect()
    assert len(rows) == len(lengths)
    max_doc = max(lengths)
    packs = {}
    for r in rows:
        packs.setdefault(r["pack_id"], []).append(r["n_tokens"])
    by_shard = {}
    for pid in packs:
        sh, idx = pid.rsplit("-", 1)
        by_shard.setdefault(sh, []).append(int(idx))
    for pid, toks in packs.items():
        sh, idx = pid.rsplit("-", 1)
        total = sum(toks)
        assert total < budget + max(max_doc, 1), (pid, total)
        if int(idx) != max(by_shard[sh]):
            assert total > budget - max(max_doc, 1), (pid, total)


@settings(max_examples=6, deadline=None)
@given(
    st.tuples(
        st.floats(0.0, 1.0, allow_nan=False), st.floats(0.0, 1.0, allow_nan=False)
    ).map(sorted),
    st.integers(0, 5),
)
def test_sample_monotone_property(spark, fracs, seed):
    lo, hi = fracs
    big = spark.range(400).select(F.col("id").alias("doc_id"))
    small_set = {r["doc_id"] for r in sample_hash(big, lo, seed=seed).collect()}
    large_set = {r["doc_id"] for r in sample_hash(big, hi, seed=seed).collect()}
    assert small_set <= large_set
