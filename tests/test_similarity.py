"""Similarity-search tests: brute-force correctness vs numpy, ANN recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gazetteer_entity_parser_spark.operators.similarity import (
    ann_topk_matmul,
    cosine_similar_pairs,
    cosine_topk,
    lsh_bucketed_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").limit(120).cache()


@pytest.fixture(scope="module")
def np_oracle(emb):
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = matn @ matn.T
    return ids, sims


def test_cosine_pairs_match_numpy(spark, emb, np_oracle):
    ids, sims = np_oracle
    pos = {v: i for i, v in enumerate(ids)}
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in
           cosine_similar_pairs(emb, threshold=0.2).collect()}
    expected = {
        (int(ids[i]), int(ids[j])): round(float(sims[i, j]), 6)
        for i in range(len(ids))
        for j in range(len(ids))
        if ids[i] < ids[j] and sims[i, j] >= 0.2 - 1e-9
    }
    assert set(got) == set(expected)
    for k in got:
        assert abs(got[k] - expected[k]) < 1e-5


def test_topk_matches_numpy(spark, emb, np_oracle):
    ids, sims = np_oracle
    got = {}
    for r in cosine_topk(emb, emb, k=3).collect():
        got.setdefault(r["query_id"], []).append((r["rk"], r["nbr_id"]))
    for qi, qid in enumerate(ids):
        row = sims[qi].copy()
        mask = ids != qid
        order = sorted(
            [(float(-row[j]), int(ids[j])) for j in range(len(ids)) if mask[j]]
        )[:3]
        expected = [(rk + 1, nbr) for rk, (_c, nbr) in enumerate(order)]
        assert sorted(got[int(qid)]) == expected


def test_ann_matmul_recall(spark, emb):
    brute = {(r["query_id"], r["nbr_id"]) for r in cosine_topk(emb, emb, k=3).collect()}
    ann = {(r["query_id"], r["nbr_id"]) for r in ann_topk_matmul(spark, emb, k=3).collect()}
    # same exact math modulo float summation order: allow tiny tie flips
    recall = len(brute & ann) / len(brute)
    assert recall > 0.99


def test_lsh_bucketed_topk_recall(spark, emb):
    """Bucketed ANN trades recall for pruning; with 4 planes (16 buckets on
    120 vecs) recall@3 of the true top-1 neighbor should be substantial."""
    brute_top1 = {
        (r["query_id"], r["nbr_id"])
        for r in cosine_topk(emb, emb, k=1).collect()
    }
    lsh = {}
    for r in lsh_bucketed_topk(emb, k=3, n_planes=4).collect():
        lsh.setdefault(r["query_id"], set()).add(r["nbr_id"])
    hits = sum(1 for q, n in brute_top1 if n in lsh.get(q, set()))
    # random 64-dim embeddings are near-orthogonal — the adversarial case for
    # hyperplane LSH; just require clearly-better-than-nothing recall here
    # (clustered real-world embeddings fare far better)
    assert hits / len(brute_top1) > 0.1
    # every returned neighbor must share the query's bucket — sanity: no self pairs
    assert all(q != n for q, ns in lsh.items() for n in ns)


def test_ann_matmul_refuses_oversized_index(spark):
    from pyspark.sql import functions as F

    emb = spark.range(10).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=1) for _ in range(4)]).alias("embedding"),
    )
    import pytest

    with pytest.raises(ValueError, match="max_index_rows"):
        ann_topk_matmul(spark, emb, k=2, max_index_rows=5)


def test_ivf_full_probe_is_exact(spark):
    from pyspark.sql import functions as F
    from gazetteer_entity_parser_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {tuple(r) for r in cosine_topk(emb, emb, k=3).collect()}
    ivf = {tuple(r) for r in ivf_topk(spark, emb, k=3, n_cells=4, n_probe=4).collect()}
    assert ivf == exact


def test_ivf_partial_probe_recall(spark):
    from gazetteer_entity_parser_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {(r["query_id"], r["nbr_id"]) for r in cosine_topk(emb, emb, k=3).collect()}
    approx = {
        (r["query_id"], r["nbr_id"])
        for r in ivf_topk(spark, emb, k=3, n_cells=8, n_probe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, recall  # partial probing keeps a useful share
    # and the probed candidate set is genuinely smaller than brute force
    assert len(approx - exact) < len(exact)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cosine_pairs_lsh_equals_brute_on_near_dups(spark, emb):
    """The bucketed pair scan must find every injected near-dup pair that the
    brute-force scan finds (recall 1.0 at cosine ~1.0 — parallel vectors agree
    on every hyperplane sign in every table)."""
    from gazetteer_entity_parser_spark.operators.similarity import (
        cosine_similar_pairs_lsh,
    )

    copies = emb.where(F.pmod("vec_id", F.lit(10)) == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x.cast("double") * F.lit(1.01)).cast("float")
        ).alias("embedding"),
    )
    inj = emb.select("vec_id", "embedding").unionByName(copies)
    brute = {(r["id_a"], r["id_b"]) for r in cosine_similar_pairs(inj, threshold=0.95).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in cosine_similar_pairs_lsh(inj, threshold=0.95).collect()}
    assert brute == lsh
    assert len(brute) > 0


def test_cosine_pairs_lsh_plan_has_no_cross_join(spark, emb):
    from gazetteer_entity_parser_spark.operators.similarity import (
        cosine_similar_pairs_lsh,
    )

    plan = _plan(cosine_similar_pairs_lsh(emb, threshold=0.9))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # and the brute baseline genuinely is the cross join we avoided
    assert "CartesianProduct" in _plan(cosine_similar_pairs(emb, threshold=0.9)) or \
        "BroadcastNestedLoopJoin" in _plan(cosine_similar_pairs(emb, threshold=0.9))


def test_lsh_topk_multiprobe_recall_pinned(spark):
    """MEASURED recall at the production multi-probe parameters (k=3,
    n_planes=4, n_tables=4, probe_bits=4: every query also probes its four
    Hamming-1 buckets per table, least-confident sign bits first) on the
    sf0.01 corpus. Planes are blake2b-derived and the corpus is fixed, so
    recall is deterministic: 0.93 — vs 0.4433 single-probe at the same
    plane/table budget (the round-3 shipped number). Random 64-dim vectors
    are the near-orthogonal ADVERSARIAL case for hyperplane LSH; clustered
    real-world embeddings fare better."""
    emb = (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .repartition(8, "vec_id")
        .cache()
    )
    brute = {(r["query_id"], r["nbr_id"]) for r in cosine_topk(emb, emb, k=3).collect()}
    lsh = {
        (r["query_id"], r["nbr_id"])
        for r in lsh_bucketed_topk(
            emb, k=3, n_planes=4, n_tables=4, probe_bits=4
        ).collect()
    }
    recall = len(brute & lsh) / len(brute)
    assert recall >= 0.9, recall
    assert abs(recall - 0.93) < 1e-3, recall
    # high-recall preset: doubling tables through the same matmul assign
    # path reaches 0.992 (still bucketed — on this 500-vector corpus the
    # probe set covers a larger index fraction than it would at 10^9 rows,
    # so treat the absolute number as a small-corpus measurement; the
    # ORDERING single-probe < multi-probe < more-tables is the contract)
    hi = {
        (r["query_id"], r["nbr_id"])
        for r in lsh_bucketed_topk(
            emb, k=3, n_planes=4, n_tables=8, probe_bits=4
        ).collect()
    }
    hi_recall = len(brute & hi) / len(brute)
    assert hi_recall >= 0.95, hi_recall
    assert abs(hi_recall - 0.992) < 1e-3, hi_recall
    emb.unpersist()


def test_lsh_topk_full_probe_is_exact(spark, emb):
    """full_probe covers every bucket of one table, so the bucketed plan must
    reproduce brute-force top-k EXACTLY (the LSH mirror of IVF's
    n_probe == n_cells pin; this is the plan the driver's sim_ann_lsh_topk
    oracle checks at sf0.01)."""
    exact = {tuple(r) for r in cosine_topk(emb, emb, k=3).collect()}
    full = {
        tuple(r)
        for r in lsh_bucketed_topk(emb, k=3, n_planes=4, full_probe=True).collect()
    }
    assert full == exact


def test_lsh_topk_multiprobe_beats_single_probe(spark, emb):
    """On the small module corpus, multi-probe recall of the true top-1
    neighbor must strictly dominate single-probe at the same plane/table
    budget (the whole point of probing the low-margin flips)."""
    brute_top1 = {
        (r["query_id"], r["nbr_id"]) for r in cosine_topk(emb, emb, k=1).collect()
    }

    def recall(**kw):
        got = {}
        for r in lsh_bucketed_topk(emb, k=3, n_planes=4, **kw).collect():
            got.setdefault(r["query_id"], set()).add(r["nbr_id"])
        return sum(1 for q, n in brute_top1 if n in got.get(q, set())) / len(brute_top1)

    single = recall()
    multi = recall(probe_bits=4)
    assert multi > single
    assert multi >= 0.75, (single, multi)


def test_lsh_multiprobe_handles_null_and_ragged_vectors(spark):
    """NULL embeddings must not crash the matmul assign path (they hash to
    bucket 0 like the literal path's NULL dot) and ragged vectors degrade to
    prefix semantics instead of raising from a ragged matmul."""
    base = spark.read.parquet(f"{SF}/embeddings.parquet").limit(20)
    weird = base.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.when(F.col("vec_id") % 3 == 0, F.lit(None).cast("array<float>"))
        .when(F.col("vec_id") % 3 == 1, F.slice("embedding", 1, 7))
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    inj = base.select("vec_id", "embedding").unionByName(weird)
    rows = lsh_bucketed_topk(inj, k=2, n_planes=4, n_tables=4, probe_bits=2).collect()
    assert len(rows) > 0
    assert all(r["query_id"] != r["nbr_id"] for r in rows)


def test_ivf_matmul_path_exact_at_full_probe(spark):
    """n_cells=64 > IVF_LITERAL_MAX_CELLS routes cell assignment through the
    broadcast-matrix mapInPandas matmul; with every cell probed the result is
    still EXACT brute-force top-k (the scale plan changes nothing about the
    verify stage's arithmetic)."""
    from gazetteer_entity_parser_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").repartition(8, "vec_id")
    exact = {tuple(r) for r in cosine_topk(emb, emb, k=3).collect()}
    ivf = {tuple(r) for r in ivf_topk(spark, emb, k=3, n_cells=64, n_probe=64).collect()}
    assert ivf == exact


def test_ivf_plan_literal_vs_matmul(spark):
    """Physical-plan pin for the two assignment strategies: small n_cells
    stays in pure codegen (no Python nodes), large n_cells runs ONE
    mapInPandas instead of n_cells unrolled aggregate expressions."""
    from gazetteer_entity_parser_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    lit_plan = _plan(ivf_topk(spark, emb, k=3, n_cells=8, n_probe=2))
    assert "MapInPandas" not in lit_plan and "ArrowEvalPython" not in lit_plan
    mm_plan = _plan(ivf_topk(spark, emb, k=3, n_cells=48, n_probe=2))
    assert "MapInPandas" in mm_plan
    # centroid scoring is not unrolled as literal aggregate expressions
    assert mm_plan.count("aggregate(") < 10


def test_ivf_kmeans_refinement_improves_partial_probe_recall(spark):
    """Two spherical k-means sweeps over the seed centroids: full probe stays
    exact, and at a fixed probe budget (n_probe=8 of 64 cells) the refined
    cells recall MORE true neighbors than raw seeds (measured 0.60 vs 0.48 on
    sf0.01) — centroids that actually summarize the data make nearby vectors
    land in probed cells."""
    from gazetteer_entity_parser_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").repartition(8, "vec_id").cache()
    exact = {(r["query_id"], r["nbr_id"]) for r in cosine_topk(emb, emb, k=3).collect()}
    full_km = {tuple(r) for r in ivf_topk(spark, emb, k=3, n_cells=64, n_probe=64, kmeans_iters=2).collect()}
    assert {(a, b) for a, b, _c, _r in full_km} == exact  # full probe stays exact
    seed8 = {
        (r["query_id"], r["nbr_id"])
        for r in ivf_topk(spark, emb, k=3, n_cells=64, n_probe=8).collect()
    }
    km8 = {
        (r["query_id"], r["nbr_id"])
        for r in ivf_topk(spark, emb, k=3, n_cells=64, n_probe=8, kmeans_iters=2).collect()
    }
    r_seed = len(exact & seed8) / len(exact)
    r_km = len(exact & km8) / len(exact)
    assert r_km > r_seed, (r_km, r_seed)
    assert r_km >= 0.55, r_km


def test_multiprobe_plan_single_assign_node_no_cross_join(spark, emb):
    """Multi-probe assignment (signs + margins from one BLAS call) sits
    behind the persisted vectors frame: every consumer branch reads the
    InMemoryRelation, so the MapInPandas subtree EXECUTES once even though
    the plan string inlines it per reference; candidates stay a bucketed
    equi-join."""
    df = lsh_bucketed_topk(emb, k=3, n_planes=4, n_tables=4, probe_bits=4)
    plan = _plan(df)
    assert "MapInPandas" in plan  # the matmul assignment path is in use
    assert "InMemoryTableScan" in plan  # ...behind the persist boundary
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_search_mode_separate_queries(spark):
    """Search mode (queries != index): full probe is exact vs brute force of
    the query subset against the whole index, self-pairs included; partial
    probe returns only probed-cell candidates."""
    from gazetteer_entity_parser_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(100).cache()
    q = emb.where(F.pmod("vec_id", F.lit(7)) == 0)
    exact = {
        tuple(r)
        for r in cosine_topk(emb, q, k=3).collect()
    }
    # cosine_topk excludes query_id == nbr_id; search mode includes it, so
    # compare on the common contract: strip rank-1 self hits first
    got = [tuple(r) for r in ivf_topk(spark, emb, k=4, n_cells=4, n_probe=4, queries=q).collect()]
    self_hits = [(a, b) for (a, b, c, rk) in got if a == b]
    assert len(self_hits) == q.count()  # every query finds its own index copy
    assert all(rk == 1 and abs(c - 1.0) < 1e-6 for (a, b, c, rk) in got if a == b)
    rebased = {(a, b, c, rk - 1) for (a, b, c, rk) in got if a != b}
    assert rebased == exact


def test_lsh_search_mode_separate_queries(spark):
    """LSH search mode: full probe exact vs brute force of the query subset
    against the whole index (self-pairs included); multi-probe search keeps
    a useful recall while probing only buckets."""
    emb2 = spark.read.parquet(f"{SF}/embeddings.parquet").limit(100).cache()
    q = emb2.where(F.pmod("vec_id", F.lit(7)) == 0)
    exact = {tuple(r) for r in cosine_topk(emb2, q, k=3).collect()}
    got = [
        tuple(r)
        for r in lsh_bucketed_topk(
            emb2, k=4, n_planes=4, full_probe=True, queries=q
        ).collect()
    ]
    assert all(rk == 1 and abs(c - 1.0) < 1e-6 for (a, b, c, rk) in got if a == b)
    assert {(a, b) for (a, b, _c, _rk) in got if a == b} == {
        (r["vec_id"], r["vec_id"]) for r in q.select("vec_id").collect()
    }
    rebased = {(a, b, c, rk - 1) for (a, b, c, rk) in got if a != b}
    assert rebased == exact

    # multi-probe search: every returned neighbor shares a probed bucket and
    # the query's own copy is always found (identical vector, identical bucket)
    mp = lsh_bucketed_topk(
        emb2, k=3, n_planes=4, n_tables=4, probe_bits=2, queries=q
    ).collect()
    self_found = {r["query_id"] for r in mp if r["query_id"] == r["nbr_id"]}
    assert self_found == {r["vec_id"] for r in q.select("vec_id").collect()}
