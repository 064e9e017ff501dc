"""Dedup operator tests: exact, minhash-LSH (recall vs exact jaccard),
relational n-gram jaccard, simhash."""

import pytest
from pyspark.sql import functions as F

from gazetteer_entity_parser_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_lsh_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_duplicates,
)


@pytest.fixture(scope="module")
def corpus(spark):
    base = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),  # near dup
        (4, "completely different content about spark dataframes and shuffle exchange plans"),
        (5, "another unrelated text mentioning catalyst optimizer and broadcast join"),
        (6, "the quick brown fox jumps over the lazy dog near the river bank today extra"),  # near dup
    ]
    return spark.createDataFrame(base, "doc_id bigint, text string")


def test_exact_duplicates(spark, corpus):
    groups = exact_duplicates(corpus).collect()
    assert [(r["keeper_id"], r["n_copies"]) for r in groups] == [(1, 2)]
    kept = dedup_exact(corpus)
    assert kept.count() == 5
    assert kept.where(F.col("doc_id") == 2).count() == 0


def test_ngram_jaccard_finds_near_dups(spark, corpus):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(corpus, n_shingle=2, threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 6) in pairs
    assert not any(4 in p or 5 in p for p in pairs)


def test_minhash_candidates_and_verify(spark, corpus):
    cands = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(corpus, n_shingle=2).collect()}
    # exact dup must always share every band
    assert (1, 2) in cands
    verified = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_dedup_pairs(corpus, n_shingle=2, threshold=0.5).collect()
    }
    assert verified[(1, 2)] == 1.0
    assert (1, 3) in verified  # 16 bands of 4 rows catch jaccard ~0.8 w.h.p.
    assert not any(4 in p or 5 in p for p in verified)


def test_minhash_recall_vs_exact(spark):
    """LSH verified pairs == exact-jaccard pairs on a dup-heavy corpus
    (b=16, r=4 -> catch probability at j=0.8 is ~1-4e-7 per pair)."""
    rows = []
    for i in range(40):
        text = " ".join(f"tok{i}_{j}" for j in range(30))
        rows.append((i, text))
        if i % 4 == 0:  # near dup: change one token
            rows.append((i + 1000, text.replace(f"tok{i}_7", "CHANGED")))
    spark_df = spark.createDataFrame(rows, "doc_id bigint, text string")
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(spark_df, n_shingle=2, threshold=0.5).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_dedup_pairs(spark_df, n_shingle=2, threshold=0.5).collect()
    }
    assert exact == lsh
    assert len(exact) == 10


def test_simhash_fingerprints_deterministic(spark, corpus):
    fp1 = {r["id"]: r["simhash"] for r in simhash_fingerprints(corpus).collect()}
    fp2 = {r["id"]: r["simhash"] for r in simhash_fingerprints(corpus).collect()}
    assert fp1 == fp2
    assert fp1[1] == fp1[2]  # identical text -> identical fingerprint


def test_simhash_near_duplicates(spark, corpus):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             simhash_near_duplicates(corpus, max_hamming=3).collect()}
    assert pairs.get((1, 2)) == 0
    # near dups differ in few tokens -> small hamming; unrelated docs absent
    assert not any((4 in p or 5 in p) for p in pairs)


def test_embedding_near_dup_keepers(spark):
    from gazetteer_entity_parser_spark.operators.dedup import embedding_near_dup_keepers

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),   # orthogonal: kept
        (2, [1.01, 0.0, 0.0, 0.0]),  # scaled copy of 0: dropped (higher id)
        (3, [0.0, 0.0, 1.0, 0.1]),   # kept
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    kept = {r["vec_id"] for r in embedding_near_dup_keepers(emb, threshold=0.95).collect()}
    assert kept == {0, 1, 3}


def test_embedding_dedup_lsh_default_equals_brute(spark):
    """The DEFAULT (hyperplane-LSH candidates) keeper set must equal the
    brute-force O(n^2) keeper set on the injected-near-dup corpus — the
    recall-1.0 evidence behind the dedup_embedding_cosine oracle."""
    from gazetteer_entity_parser_spark.operators.dedup import embedding_near_dup_keepers

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").repartition(8, "vec_id")
    copies = emb.where(F.pmod("vec_id", F.lit(10)) == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x.cast("double") * F.lit(1.01)).cast("float")
        ).alias("embedding"),
    )
    inj = emb.select("vec_id", "embedding").unionByName(copies)
    kept_lsh = {r["vec_id"] for r in embedding_near_dup_keepers(inj, threshold=0.95).collect()}
    kept_brute = {
        r["vec_id"]
        for r in embedding_near_dup_keepers(inj, threshold=0.95, method="brute").collect()
    }
    assert kept_lsh == kept_brute
    assert len(kept_lsh) == 500  # the 50 scaled copies are the dropped set


def test_embedding_dedup_default_plan_has_no_cross_join(spark):
    from gazetteer_entity_parser_spark.operators.dedup import embedding_near_dup_keepers

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = (
        embedding_near_dup_keepers(emb, threshold=0.95)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # the only BroadcastNestedLoopJoin-free join left is the bucket equi-join
    # + the broadcast anti-join on the (small) dominated set
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_dedup_rejects_unknown_method(spark):
    from gazetteer_entity_parser_spark.operators.dedup import embedding_near_dup_keepers

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="method"):
        embedding_near_dup_keepers(emb, method="faiss")


def test_keep_best_in_cluster_prefers_quality_over_min_id(spark):
    from pyspark.sql import functions as F

    from gazetteer_entity_parser_spark.operators.dedup import keep_best_in_cluster

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id bigint, cluster_id bigint",
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (10, 0.5), (11, 0.5)],
        "doc_id bigint, quality_score double",
    )
    out = {r["doc_id"]: r["keeper_id"] for r in
           keep_best_in_cluster(clusters, scores).collect()}
    # cluster 1: docs 2 and 3 tie at 0.9 -> lowest id among the BEST (2),
    # not the cluster min id (1)
    assert out == {1: 2, 2: 2, 3: 2, 10: 10, 11: 10}


def test_keep_best_in_cluster_tolerates_missing_scores(spark):
    """A clustered doc absent from the score table must keep its row (NULL
    score, sorted after every scored member) instead of silently vanishing
    from the keeper decision table."""
    from gazetteer_entity_parser_spark.operators.dedup import keep_best_in_cluster

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id bigint, cluster_id bigint",
    )
    scores = spark.createDataFrame(
        [(1, 0.3), (2, 0.9)],  # doc 3 and the whole cluster 10 unscored
        "doc_id bigint, quality_score double",
    )
    rows = {r["doc_id"]: r for r in keep_best_in_cluster(clusters, scores).collect()}
    assert set(rows) == {1, 2, 3, 10, 11}  # nobody vanished
    assert rows[3]["keeper_id"] == 2  # unscored member never beats a scored one
    assert rows[3]["quality_score"] is None
    # all-unscored cluster: min-id fallback
    assert rows[10]["keeper_id"] == 10 and rows[11]["keeper_id"] == 10
