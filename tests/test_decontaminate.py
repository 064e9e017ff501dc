"""Benchmark-decontamination tests: planted contamination, drop/flag modes,
broadcast-plan shape."""

import pytest
from pyspark.sql import functions as F

from gazetteer_entity_parser_spark.operators.decontaminate import (
    contamination_scores,
    decontaminate,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").limit(100).cache()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_planted_contamination_found(spark, docs):
    """A benchmark that IS a slice of the corpus: the sliced docs must score
    contamination_frac == 1.0 at any n, everything independent scores < 1."""
    bench = docs.where(F.col("doc_id") % 10 == 0)
    scores = {r["doc_id"]: r for r in contamination_scores(docs, bench, n=5).collect()}
    assert len(scores) == docs.count()
    planted = [r["doc_id"] for r in bench.select("doc_id").collect()]
    for did in planted:
        assert scores[did]["contamination_frac"] == 1.0, scores[did]
    # independent word-salad docs share essentially no 5-grams
    others = [scores[d] for d in scores if d not in set(planted)]
    assert sum(1 for r in others if r["contamination_frac"] == 0.0) > len(others) * 0.9


def test_contaminated_span_detected_inside_longer_doc(spark, docs):
    """A document that QUOTES a benchmark passage (prefix inclusion) is
    partially contaminated: its frac is strictly between 0 and 1 and its
    contaminated shingle count matches the quoted span's shingle yield."""
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta")], ["doc_id", "text"]
    )
    quoted = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta plus tail words here"),
            (2, "completely unrelated words nothing shared at all today"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in contamination_scores(quoted, bench, n=5).collect()}
    # doc 1: 12 tokens -> 8 distinct 5-grams, of which the 4 inside the
    # quoted 8-token span hit the benchmark
    assert got[1]["n_shingles"] == 8
    assert got[1]["n_contaminated"] == 4
    assert got[1]["contamination_frac"] == 0.5
    assert got[2]["n_contaminated"] == 0


def test_drop_mode_removes_only_contaminated(spark, docs):
    bench = docs.where(F.col("doc_id") % 10 == 0)
    kept = decontaminate(docs, bench, n=13, mode="drop")
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    planted = {r["doc_id"] for r in bench.select("doc_id").collect()}
    assert kept_ids.isdisjoint(planted)
    # the generator plants near-duplicates in this corpus: a copy sharing a
    # 13-token span with a benchmark doc must be dropped too — that's the
    # point of shingle- (not id-) based decontamination. Independent Python
    # oracle: recompute the 13-gram overlap driver-side on the sample.
    def grams(text, n=13):
        toks = [t for t in text.split() if t]
        if len(toks) < n:
            return {"\x1f".join(toks)}
        return {"\x1f".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    bench_grams = set()
    for r in bench.select("text").collect():
        bench_grams |= grams(r["text"])
    expect_kept = {
        r["doc_id"]
        for r in docs.select("doc_id", "text").collect()
        if not (grams(r["text"]) & bench_grams)
    }
    assert kept_ids == expect_kept
    assert len(expect_kept) < docs.count() - len(planted)  # near-dups really dropped
    # original schema passes through untouched
    assert kept.columns == docs.columns


def test_flag_mode_keeps_all_rows(spark, docs):
    bench = docs.where(F.col("doc_id") % 10 == 0)
    flagged = decontaminate(docs, bench, n=13, mode="flag")
    assert flagged.count() == docs.count()
    flagged_ids = {r["doc_id"] for r in flagged.where("contaminated").collect()}
    planted = {r["doc_id"] for r in bench.select("doc_id").collect()}
    # every planted doc flagged; near-dup copies of planted docs may be too
    assert planted <= flagged_ids
    assert "contamination_frac" in flagged.columns


def test_mode_validation(spark, docs):
    with pytest.raises(ValueError, match="mode"):
        decontaminate(docs, docs, mode="quarantine")


def test_empty_text_scores_zero(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "alpha beta gamma delta epsilon")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(0, "alpha beta gamma delta epsilon")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in contamination_scores(docs, bench, n=3).collect()}
    assert got[1]["n_shingles"] == 0 and got[1]["contamination_frac"] == 0.0
    assert got[2]["n_shingles"] == 0 and got[2]["contamination_frac"] == 0.0
    assert got[3]["contamination_frac"] == 1.0


def test_plan_broadcasts_benchmark_no_corpus_shuffle_on_shingles(spark, docs):
    """The scale contract: the benchmark side is the broadcast build, the
    corpus side never exchanges on shingle keys (its only exchange is the
    doc-keyed count rollup)."""
    bench = docs.where(F.col("doc_id") % 10 == 0)
    plan = _plan(contamination_scores(docs, bench, n=13))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_oversized_benchmark_refused(spark, docs):
    import gazetteer_entity_parser_spark.operators.decontaminate as d

    old = d.MAX_BENCH_SHINGLE_ROWS
    d.MAX_BENCH_SHINGLE_ROWS = 10
    try:
        with pytest.raises(ValueError, match="MAX_BENCH_SHINGLE_ROWS"):
            contamination_scores(docs, docs, n=3)
    finally:
        d.MAX_BENCH_SHINGLE_ROWS = old


def test_bench_text_col_override(spark):
    """An eval table with a differently-named text column works via
    bench_text_col (schemas rarely agree across corpora)."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "nothing shared here at all")],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta")], "qid bigint, question string"
    )
    got = {r["doc_id"]: r["n_contaminated"] for r in
           contamination_scores(docs, bench, n=3, bench_text_col="question").collect()}
    assert got[1] > 0 and got[2] == 0


def test_oracle_handles_short_and_empty_docs(spark):
    """The generated decontaminate oracle must agree with Spark on corpora
    containing sub-n-token and empty docs (whole-doc fallback shingle +
    zero-shingle rows — r4 review finding). Cross-engine check on a
    synthetic corpus the driver's fixed tables don't cover."""
    import duckdb

    from gazetteer_entity_parser_spark.plans.queries import _shingle_sql

    rows = [
        (0, "alpha beta"),            # 2 tokens < n=3 -> whole-doc fallback
        (1, ""),                      # empty: zero shingles
        (20, "alpha beta"),           # doc_id % 20 == 0: in the bench slice
        (3, "alpha beta gamma delta"),
        (40, "alpha beta gamma delta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    bench = docs.where(F.col("doc_id") % 20 == 0)
    got = {
        tuple(r)
        for r in contamination_scores(docs, bench, n=3).collect()
    }
    con = duckdb.connect()
    con.register("documents", __import__("pandas").DataFrame(rows, columns=["doc_id", "text"]))
    sql = f"""
        WITH {_shingle_sql('sh', 'documents', 3)},
        bsh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0)
        SELECT d.doc_id,
               CAST(count(s.s) AS BIGINT) AS n_shingles,
               CAST(count(b.s) AS BIGINT) AS n_contaminated,
               round(CASE WHEN count(s.s) > 0 THEN count(b.s) / count(s.s)
                          ELSE 0.0 END, 6) AS contamination_frac
        FROM documents d
        LEFT JOIN sh s ON s.doc_id = d.doc_id
        LEFT JOIN bsh b ON b.s = s.s
        GROUP BY d.doc_id
    """
    oracle = {tuple(r) for r in con.execute(sql).fetchall()}
    assert got == oracle
    # and the fallback really fires: the 2-token doc 0 is fully contaminated
    # (doc 20 shares its exact whole-doc shingle), the empty doc scores 0
    by_id = {r[0]: r for r in got}
    assert by_id[0][3] == 1.0
    assert by_id[1] == (1, 0, 0, 0.0)


# ---------------------------------------------------------------------------
# embedding-space decontamination
# ---------------------------------------------------------------------------


def _cos(a, b):
    import math

    d = sum(x * y for x, y in zip(a, b))
    return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def test_embedding_scores_brute_matches_python(spark):
    import random

    from gazetteer_entity_parser_spark.operators.decontaminate import (
        contamination_scores_embedding,
    )

    rng = random.Random(71)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(30)}
    rows = [(i, v) for i, v in vecs.items()]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    bench = emb.where("vec_id % 7 = 0")
    got = {
        r["vec_id"]: r["max_cosine"]
        for r in contamination_scores_embedding(emb, bench, method="brute").collect()
    }
    bench_ids = [i for i in vecs if i % 7 == 0]
    expect = {
        i: max(round(_cos(vecs[i], vecs[b]), 6) for b in bench_ids) for i in vecs
    }
    assert set(got) == set(expect)
    for i in expect:
        assert got[i] == pytest.approx(expect[i]), i
    # a benchmark doc present verbatim in the corpus scores exactly 1.0
    for b in bench_ids:
        assert got[b] == pytest.approx(1.0)


def test_embedding_scores_lsh_finds_exact_duplicates(spark):
    """Identical vectors share every bucket in every table, so verbatim
    contamination is ALWAYS found by the LSH path (the recall trade only
    affects near-duplicates)."""
    import random

    from gazetteer_entity_parser_spark.operators.decontaminate import (
        contamination_scores_embedding,
    )

    rng = random.Random(73)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    bench = emb.where("vec_id % 8 = 0")
    got = {
        r["vec_id"]: r["max_cosine"]
        for r in contamination_scores_embedding(
            emb, bench, method="lsh", n_planes=4, n_tables=4
        ).collect()
    }
    assert set(got) == {i for i, _ in rows}  # every corpus doc has a row
    for i, _ in rows:
        if i % 8 == 0:
            assert got[i] == pytest.approx(1.0), i
    brute = {
        r["vec_id"]: r["max_cosine"]
        for r in contamination_scores_embedding(emb, bench, method="brute").collect()
    }
    for i in got:
        # matched rows are a lower bound on the true max; unmatched rows
        # are NULL (no-evidence), never a 0.0 that could overstate an
        # all-negative true max
        if got[i] is not None:
            assert got[i] <= brute[i] + 1e-9, i


def test_embedding_scores_rejects_unknown_method(spark):
    from gazetteer_entity_parser_spark.operators.decontaminate import (
        contamination_scores_embedding,
    )

    emb = spark.createDataFrame([(1, [1.0])], "vec_id bigint, embedding array<double>")
    with pytest.raises(ValueError, match="method"):
        contamination_scores_embedding(emb, emb, method="cosine")
