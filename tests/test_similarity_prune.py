"""Round-6 optimization pins: the per-bucket numpy pruners in
operators/similarity.py must be LOSSLESS — the pruned plans' output rows are
required to be identical to the pre-optimization candidate-explosion plans
(same pairs, same cosines, same ranks/ties). These tests reconstruct the old
candidate semantics inline from the same hashed frames and diff full rows."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from gazetteer_entity_parser_spark.operators.similarity import (
    _dot,
    _lsh_tables_frame,
    cosine_similar_pairs_lsh,
    lsh_bucketed_topk,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .repartition(8, "vec_id")
        .cache()
    )


def _old_topk_rows(emb, k=3, n_planes=4, dim=64, n_tables=4, probe_bits=0,
                   full_probe=False, queries=None, id_col="vec_id",
                   vec_col="embedding"):
    """The pre-r6 plan, verbatim: explode bucket coincidences into pairs,
    distinct, exact-cosine every pair, window top-k."""
    query_uses_matmul = probe_bits > 0 or n_planes * n_tables > 16
    v, buckets, probes = _lsh_tables_frame(
        emb, id_col, vec_col, n_planes, dim, n_tables,
        probe_bits=probe_bits if queries is None else 0,
        full_probe=full_probe if queries is None else False,
        force_matmul=query_uses_matmul if queries is not None else False,
    )
    if queries is None:
        qv, qside = v, (probes if probes is not None else buckets)
    else:
        qv, qbuckets, qprobes = _lsh_tables_frame(
            queries, id_col, vec_col, n_planes, dim, n_tables,
            probe_bits=probe_bits, full_probe=full_probe,
        )
        qside = qprobes if qprobes is not None else qbuckets
    cand = (
        qside.withColumnRenamed("id", "query_id")
        .join(buckets.withColumnRenamed("id", "nbr_id"), ["t", "bucket"])
        .select("query_id", "nbr_id")
        .distinct()
    )
    if queries is None:
        cand = cand.where(F.col("query_id") != F.col("nbr_id"))
    a = qv.select(F.col("id").alias("query_id"), F.col("v").alias("q_v"),
                  F.col("nrm").alias("q_n"))
    b = v.select(F.col("id").alias("nbr_id"), F.col("v").alias("nbr_v"),
                 F.col("nrm").alias("n_n"))
    cos = _dot(F.col("q_v"), F.col("nbr_v")) / (F.col("q_n") * F.col("n_n"))
    scored = cand.join(a, "query_id").join(b, "nbr_id").withColumn("cosine", cos)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return sorted(
        tuple(r)
        for r in scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "nbr_id", F.round("cosine", 6).alias("cosine"), "rk")
        .collect()
    )


def _new_topk_rows(emb, **kw):
    return sorted(tuple(r) for r in lsh_bucketed_topk(emb, **kw).collect())


def test_topk_prune_identical_multiprobe(spark, emb):
    """The bench configuration (the round-6 headline target)."""
    assert _new_topk_rows(emb, k=3, n_planes=4, n_tables=4, probe_bits=4) == \
        _old_topk_rows(emb, k=3, n_planes=4, n_tables=4, probe_bits=4)


def test_topk_prune_identical_single_probe(spark, emb):
    assert _new_topk_rows(emb, k=3, n_planes=4, n_tables=4) == \
        _old_topk_rows(emb, k=3, n_planes=4, n_tables=4)


def test_topk_prune_identical_full_probe(spark, emb):
    """The driver's sim_ann_lsh_topk oracle configuration."""
    assert _new_topk_rows(emb, k=3, n_planes=4, full_probe=True) == \
        _old_topk_rows(emb, k=3, n_planes=4, n_tables=4, full_probe=True)


def test_topk_prune_identical_search_mode(spark, emb):
    q = emb.where(F.pmod("vec_id", F.lit(7)) == 0)
    for kw in (dict(k=4, n_planes=4, full_probe=True),
               dict(k=3, n_planes=4, n_tables=4, probe_bits=2)):
        assert _new_topk_rows(emb, queries=q, **kw) == \
            _old_topk_rows(emb, queries=q, **kw)


def test_topk_prune_identical_null_and_ragged(spark):
    """NULL vectors must still rank like their JVM NULL cosine (last) and
    ragged pairs like NULL, not like their zero-padded numpy value."""
    base = spark.read.parquet(f"{SF}/embeddings.parquet").limit(40)
    weird = base.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.when(F.col("vec_id") % 3 == 0, F.lit(None).cast("array<float>"))
        .when(F.col("vec_id") % 3 == 1, F.slice("embedding", 1, 7))
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    inj = base.select("vec_id", "embedding").unionByName(weird).cache()
    kw = dict(k=2, n_planes=4, n_tables=4, probe_bits=2)
    assert _new_topk_rows(inj, **kw) == _old_topk_rows(inj, **kw)
    inj.unpersist()


def test_pair_prune_identical(spark, emb):
    """Threshold path: the numpy prefilter + exact verify emits exactly the
    rows the old all-pairs bucket self-join + verify emitted."""
    v, buckets, _ = _lsh_tables_frame(emb, "vec_id", "embedding", 8, 64, 8)
    sized = buckets.withColumn(
        "_bsz", F.count("*").over(Window.partitionBy("t", "bucket"))
    )
    small = sized.where(F.col("_bsz") <= 4096)
    old_cand = (
        small.withColumnRenamed("id", "id_a")
        .join(small.select("t", "bucket", F.col("id").alias("id_b")),
              ["t", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"),
                 F.col("nrm").alias("n_a"))
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"),
                 F.col("nrm").alias("n_b"))
    cos = _dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b"))
    old = sorted(
        tuple(r)
        for r in old_cand.join(a, "id_a").join(b, "id_b")
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= 0.2)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .collect()
    )
    new = sorted(
        tuple(r)
        for r in cosine_similar_pairs_lsh(emb, threshold=0.2).collect()
    )
    assert new == old
    assert len(new) > 0

def test_shingled_frame_equals_expression(spark):
    """r6: the Python shingle pass must be value-identical (same arrays,
    same order) to the token_shingles expression — including Java-\\s-vs-
    Python-\\s edge cases (U+001C..1F are NOT whitespace to Java), short
    texts, empty/whitespace-only texts, and NULL."""
    from gazetteer_entity_parser_spark.operators.dedup import (
        shingled_frame,
        token_shingles,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    edge = spark.createDataFrame(
        [
            (9001, ""),
            (9002, "   "),
            (9003, "one"),
            (9004, "one two"),
            (9005, "a\tb\nc\x0b d\x0c e\r f"),
            (9006, "a\x1cb \x1d c\x1e\x1f d"),  # U+001C-1F are token chars
            (9007, " lead and trail "),
            (9008, "dup dup dup dup"),
            (9009, None),
            (9010, "nb sp stays one token"),
        ],
        "doc_id long, text string",
    )
    inj = docs.select("doc_id", "text").unionByName(edge)
    for n in (2, 3, 13):
        expr = {r["doc_id"]: r["sh"] for r in inj.select(
            "doc_id", token_shingles(F.col("text"), n).alias("sh")).collect()}
        py = {r["id"]: r["sh"] for r in shingled_frame(inj, "doc_id", "text", n).collect()}
        assert expr == py, n
