"""Deterministic hash sampling / splitting: stability, accuracy, plan shape."""

import pytest
from pyspark.sql import functions as F

from gazetteer_entity_parser_spark.operators.sampling import (
    _hex_threshold,
    hash_split,
    sample_hash,
    sample_stratified,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_hex_threshold_edges():
    assert _hex_threshold(0.0) == "0000000000000000"
    assert _hex_threshold(1.0) == "g"  # above every hex string: keep all
    assert _hex_threshold(0.5) == "8000000000000000"
    assert _hex_threshold(1.0 / 16) == "1000000000000000"


def test_sample_fraction_accuracy_and_determinism(spark):
    n = 20_000
    big = spark.range(n).select(F.col("id").alias("doc_id"))
    got = sample_hash(big, 0.25, seed=3).count()
    # md5 uniformity: binomial(20000, 0.25) has sd ~61; allow 5 sd
    assert abs(got - n * 0.25) < 5 * 61, got
    # exact same SET on a different partitioning (partition-RNG samplers fail this)
    a = {r["doc_id"] for r in sample_hash(big, 0.25, seed=3).collect()}
    b = {
        r["doc_id"]
        for r in sample_hash(big.repartition(13), 0.25, seed=3).collect()
    }
    assert a == b
    # a different seed draws a genuinely different set
    c = {r["doc_id"] for r in sample_hash(big, 0.25, seed=4).collect()}
    assert a != c


def test_sample_is_monotone_in_fraction(spark):
    """The kept set at a smaller fraction is a SUBSET of the kept set at a
    larger one (same seed) — the property that makes downsampling an
    already-sampled corpus consistent."""
    big = spark.range(5000).select(F.col("id").alias("doc_id"))
    small = {r["doc_id"] for r in sample_hash(big, 0.1, seed=1).collect()}
    large = {r["doc_id"] for r in sample_hash(big, 0.4, seed=1).collect()}
    assert small <= large


def test_stratified_rates(spark, docs):
    out = sample_stratified(
        docs, rates={"src0": 1.0}, stratum_col="source", seed=5, default_rate=0.0
    )
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    src0 = {r["doc_id"] for r in docs.where("source = 'src0'").collect()}
    assert kept == src0  # rate 1.0 keeps every src0 row, default 0.0 drops rest


def test_hash_split_disjoint_exhaustive_stable(spark):
    n = 10_000
    big = spark.range(n).select(F.col("id").alias("doc_id"))
    out = hash_split(big, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=2)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n  # exhaustive
    assert abs(counts["train"] - 8000) < 5 * 40
    assert abs(counts["val"] - 1000) < 5 * 32
    assert abs(counts["test"] - 1000) < 5 * 32
    # stability: a smaller table (incremental-ingest prefix) assigns every
    # shared doc the SAME split
    prefix = hash_split(
        big.where("doc_id < 1000"), {"train": 0.8, "val": 0.1, "test": 0.1}, seed=2
    )
    full = {r["doc_id"]: r["split"] for r in out.where("doc_id < 1000").collect()}
    assert {r["doc_id"]: r["split"] for r in prefix.collect()} == full


def test_hash_split_rejects_bad_weights(spark):
    big = spark.range(10).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="sum to 1.0"):
        hash_split(big, {"train": 0.8, "val": 0.1})


def test_sampling_matches_duckdb_predicate(spark):
    """sample_sql's predicate must select the IDENTICAL set DuckDB-side —
    the cross-engine contract the driver oracles rely on."""
    import duckdb

    from gazetteer_entity_parser_spark.operators.sampling import sample_sql

    big = spark.range(3000).select(F.col("id").alias("doc_id"))
    spark_ids = {r["doc_id"] for r in sample_hash(big, 0.3, seed=11).collect()}
    duck_ids = {
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM range(3000) t(doc_id) WHERE {sample_sql(0.3, seed=11)}"
        ).fetchall()
    }
    assert spark_ids == duck_ids


def test_sampling_plan_is_pure_filter(spark, docs):
    plan = (
        sample_stratified(docs, rates={"src0": 0.5}, seed=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # no shuffle: scan -> filter, full stop
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert node not in plan


def test_pipeline_pretrain_corpus_invariants(spark):
    """The composed nightly pipeline: no benchmark doc (or its exact dup)
    survives, every surviving row carries a valid split, and the whole
    thing is deterministic across runs."""
    from gazetteer_entity_parser_spark.plans.queries import QUERIES

    out = QUERIES["pipeline_pretrain_corpus"](spark, SF)
    rows = out.collect()
    assert len(rows) > 0
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    ids = {r["doc_id"] for r in rows}
    assert not any(i % 20 == 0 for i in ids)  # eval slice fully dropped
    rows2 = QUERIES["pipeline_pretrain_corpus"](spark, SF).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_pack_sequences_budget_and_stability(spark):
    """Every pack except a shard's last lands within one document's tokens
    of the budget (a boundary-straddling doc overflows its own pack and
    drifts the next pack's start by < max-doc tokens), doc count is
    preserved, and the assignment is independent of input partitioning."""
    from gazetteer_entity_parser_spark.operators.sampling import pack_sequences

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = pack_sequences(docs, budget_tokens=512, shard_chars=1, seed=7).select(
        "doc_id", "shard", "pack_id", "n_tokens"
    )
    rows = out.collect()
    assert len(rows) == docs.count()

    packs = {}
    max_doc = 0
    for r in rows:
        packs.setdefault(r["pack_id"], []).append(r)
        max_doc = max(max_doc, r["n_tokens"])
    # group packs per shard to find each shard's LAST pack (highest index)
    by_shard = {}
    for pid in packs:
        sh, idx = pid.rsplit("-", 1)
        by_shard.setdefault(sh, []).append((int(idx), pid))
    for sh, lst in by_shard.items():
        lst.sort()
        # pack indices are contiguous from 0
        assert [i for i, _ in lst] == list(range(len(lst)))
        for idx, pid in lst:
            total = sum(r["n_tokens"] for r in packs[pid])
            if idx != lst[-1][0]:
                assert total > 512 - max_doc, (pid, total)  # near-budget floor
            assert total < 512 + max_doc, (pid, total)  # bounded overflow

    # partitioning independence
    rows2 = pack_sequences(
        docs.repartition(17), budget_tokens=512, shard_chars=1, seed=7
    ).select("doc_id", "shard", "pack_id", "n_tokens").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_streaming_sample_equals_batch(spark, tmp_path):
    """sample_hash / hash_split are pure stateless filters, so they run
    UNCHANGED inside Structured Streaming and must select the identical
    rows micro-batch by micro-batch (the property partition-RNG df.sample
    cannot offer a stream: its draw depends on batch composition)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    input_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "sampled")
    ckpt = str(tmp_path / "ckpt")
    docs.repartition(5).write.parquet(input_dir)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(input_dir)
    )
    q = (
        hash_split(sample_hash(stream, 0.5, seed=9), {"train": 0.9, "val": 0.1}, seed=9)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = {
        (r["doc_id"], r["split"]) for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        (r["doc_id"], r["split"])
        for r in hash_split(
            sample_hash(docs, 0.5, seed=9), {"train": 0.9, "val": 0.1}, seed=9
        ).collect()
    }
    assert streamed == batch
    assert 0 < len(batch) < docs.count()


def test_pack_sequences_null_text_counts_zero(spark):
    from gazetteer_entity_parser_spark.operators.sampling import pack_sequences

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, None), (3, ""), (4, "gamma")],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in pack_sequences(docs, budget_tokens=3).collect()}
    assert rows[2]["n_tokens"] == 0 and rows[3]["n_tokens"] == 0
    assert all(r["pack_id"] is not None for r in rows.values())


def test_full_probe_guard_refuses_large_plane_count(spark):
    import pytest as _pytest

    from gazetteer_entity_parser_spark.operators.similarity import lsh_bucketed_topk

    emb = spark.range(5).selectExpr("id AS vec_id", "array(1.0, 2.0) AS embedding")
    with _pytest.raises(ValueError, match="full_probe"):
        lsh_bucketed_topk(emb, n_planes=16, full_probe=True)


def test_sample_hash_multi_column_key(spark):
    """Composite keys hash on all components: changing a second key column
    changes the draw, and the same composite row draws identically."""
    a = spark.createDataFrame(
        [(i, "x") for i in range(2000)], "doc_id bigint, source string"
    )
    b = spark.createDataFrame(
        [(i, "y") for i in range(2000)], "doc_id bigint, source string"
    )
    ka = {r["doc_id"] for r in sample_hash(a, 0.5, key_cols=("doc_id", "source"), seed=1).collect()}
    kb = {r["doc_id"] for r in sample_hash(b, 0.5, key_cols=("doc_id", "source"), seed=1).collect()}
    assert ka != kb  # the second key column participates
    ka2 = {r["doc_id"] for r in sample_hash(a, 0.5, key_cols=("doc_id", "source"), seed=1).collect()}
    assert ka == ka2


def test_pack_sequences_rejects_nonpositive_budget(spark):
    from gazetteer_entity_parser_spark.operators.sampling import pack_sequences

    docs = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="budget_tokens"):
        pack_sequences(docs, budget_tokens=0)


# ---------------------------------------------------------------------------
# negative sampling for KG-embedding training
# ---------------------------------------------------------------------------


def _neg_df(spark):
    rows = [
        ("a", "p", "b", 3), ("b", "p", "c", 2), ("c", "p", "a", 4),
        ("a", "p", "d", 1),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string, weight bigint")


def test_negative_triples_deterministic_and_filtered(spark):
    import hashlib

    from gazetteer_entity_parser_spark.operators.sampling import negative_triples

    df = _neg_df(spark)
    got = {
        (r["subj"], r["pred"], r["obj"], r["neg_rank"]): r["neg_entity"]
        for r in negative_triples(df, n_neg=3).collect()
    }
    ents = sorted({"a", "b", "c", "d"})
    expect = {}
    for s, p, o, _ in _neg_df(spark).collect():
        for j in range(3):
            h = int(hashlib.md5(f"{s}|{p}|{o}|{j}".encode()).hexdigest()[:8], 16)
            cand = ents[h % len(ents)]
            if cand != o:
                expect[(s, p, o, j)] = cand
    assert got == expect
    # partitioning independence
    got2 = {
        (r["subj"], r["pred"], r["obj"], r["neg_rank"]): r["neg_entity"]
        for r in negative_triples(df.repartition(7), n_neg=3).collect()
    }
    assert got2 == got


def test_negative_triples_corrupt_subj_role(spark):
    from gazetteer_entity_parser_spark.operators.sampling import negative_triples

    out = negative_triples(_neg_df(spark), n_neg=2, corrupt="subj").collect()
    assert len(out) > 0
    for r in out:
        assert r["neg_entity"] != r["subj"]  # identity collisions dropped


def test_negative_triples_validates_args(spark):
    import pytest

    from gazetteer_entity_parser_spark.operators.sampling import negative_triples

    df = _neg_df(spark)
    with pytest.raises(ValueError, match="corrupt"):
        negative_triples(df, corrupt="pred")
    with pytest.raises(ValueError, match="n_neg"):
        negative_triples(df, n_neg=0)
