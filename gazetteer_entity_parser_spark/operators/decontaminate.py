"""Benchmark decontamination: drop (or flag) training documents that overlap
an evaluation set.

Every production pretraining pipeline runs this pass (the GPT-3 / PaLM /
Llama papers all describe n-gram-overlap decontamination against their eval
benchmarks); the engine's dedup family covers train-vs-train duplication but
nothing guarded train-vs-eval leakage until this operator.

Physical shape at 100 TB: the benchmark side is SMALL (eval suites are
thousands of documents, not billions), so its distinct shingle set is
broadcast and the corpus is NEVER shuffled on shingles — the only exchange
is the (doc_id, count-partial) rollup after the broadcast join, with
map-side combine. The corpus is scanned exactly once
(explode -> broadcast-left-join -> doc-keyed agg).

Shingling reuses the dedup family's shingler (:func:`..operators.dedup.
shingled_frame`, value-identical to ``token_shingles``: same tokenizer, same
US-separator join, same distinct-within-doc semantics), so a contamination
threshold is directly comparable with the dedup family's Jaccard numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingled_frame

# refuse to silently degrade: a benchmark whose shingle set is too big to
# broadcast is not an eval suite, it's a second corpus — route that shape
# through the dedup family (minhash between corpora) instead
MAX_BENCH_SHINGLE_ROWS = 50_000_000


def contamination_scores(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 13,
) -> DataFrame:
    """Per-document overlap with the benchmark's n-gram shingle set:
    (doc_id, n_shingles, n_contaminated, contamination_frac).

    ``n_contaminated`` counts the document's DISTINCT n-token shingles that
    appear anywhere in the benchmark; ``contamination_frac`` divides by the
    document's distinct-shingle count. n=13 is the published
    decontamination default (13-gram collision between independent texts is
    vanishingly rare, so any hit is a near-verbatim inclusion); small n
    yields a graded leakage score instead.

    Documents with no shingles (empty/whitespace text) score
    n_shingles=0, frac=0.0 — they cannot leak anything.

    The join key is the raw shingle string: the doc side of a broadcast hash
    join never exchanges, so key width only affects the (small) broadcast
    build — and raw keys keep the operator exactly SQL-expressible for the
    DuckDB oracle (plans/queries.py::decontaminate_scores).
    """
    bench_text = bench_text_col or text_col
    # r6: both sides shingle through the Python pass (dedup.shingled_frame —
    # value-identical to token_shingles, pinned in pytest); the interpreted
    # HOF chain was the dominant cost of this operator at sf1.0. The bench
    # side needs no id, so any column serves as the passthrough id.
    bsh = (
        shingled_frame(benchmark, None, bench_text, n)
        .select(F.explode("sh").alias("_sh"))
        .where(F.col("_sh") != "")
        .distinct()
        .persist()
    )
    # loud refusal, not silent truncation: a benchmark over the cap is a
    # second corpus, and truncating its shingle set would silently pass
    # contaminated documents. The persist makes the count a one-off (the
    # broadcast build reuses the cached rows).
    if bsh.limit(MAX_BENCH_SHINGLE_ROWS + 1).count() > MAX_BENCH_SHINGLE_ROWS:
        raise ValueError(
            f"benchmark shingle set exceeds MAX_BENCH_SHINGLE_ROWS="
            f"{MAX_BENCH_SHINGLE_ROWS}; that is corpus-vs-corpus overlap — "
            "use the dedup family (minhash between corpora) instead"
        )
    bsh = bsh.withColumn("_hit", F.lit(1))
    dsh = shingled_frame(docs, id_col, text_col, n).select(
        F.col("id").alias(id_col),
        F.explode_outer(F.filter("sh", lambda s: s != "")).alias("_sh"),
    )
    return (
        dsh.join(F.broadcast(bsh), "_sh", "left")
        .groupBy(id_col)
        .agg(
            F.count("_sh").alias("n_shingles"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_contaminated"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_contaminated",
            F.round(
                F.when(F.col("n_shingles") > 0,
                       F.col("n_contaminated") / F.col("n_shingles"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("contamination_frac"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 13,
    max_contamination_frac: float = 0.0,
    mode: str = "drop",
) -> DataFrame:
    """Filter (``mode='drop'``) or annotate (``mode='flag'``) documents whose
    benchmark n-gram overlap exceeds ``max_contamination_frac``.

    The default (n=13, max_contamination_frac=0.0) is the published hard
    rule: any shared 13-gram disqualifies the document. ``mode='flag'``
    keeps every row and adds the three score columns plus a boolean
    ``contaminated`` — the audit-friendly shape (decide later, or route
    flagged docs to a quarantine sink).

    All original columns pass through; the score join is on ``id_col`` (the
    corpus shuffles once on its id — unavoidable for attaching any per-doc
    score — and the scores side is count partials, not text).
    """
    if mode not in ("drop", "flag"):
        raise ValueError(f"mode must be 'drop' or 'flag', got {mode!r}")
    scores = contamination_scores(
        docs, benchmark, id_col=id_col, text_col=text_col,
        bench_text_col=bench_text_col, n=n,
    )
    flagged = docs.join(scores, id_col, "left").withColumn(
        "contaminated",
        F.coalesce(F.col("contamination_frac") > max_contamination_frac, F.lit(False)),
    )
    if mode == "flag":
        return flagged
    return (
        flagged.where(~F.col("contaminated"))
        .drop("n_shingles", "n_contaminated", "contamination_frac", "contaminated")
    )


def contamination_scores_embedding(
    corpus_embeddings,
    benchmark_embeddings,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    n_planes: int = 4,
    n_tables: int = 4,
    dim: int | None = None,
):
    """Semantic (embedding-space) benchmark decontamination: for every
    corpus document, the maximum cosine similarity to ANY benchmark
    document — the complement of n-gram overlap (`contamination_scores`),
    catching paraphrased leakage that shares no shingles. Self-id pairs
    are NOT excluded (a benchmark doc present verbatim in the corpus is
    exactly what this flags).

    Output: (id_col, max_cosine); thresholding/drop policy belongs to the
    pipeline, not the metric. Under ``method='lsh'`` corpus docs sharing
    no bucket with any benchmark doc carry NULL max_cosine — "no candidate
    evidence", deliberately distinct from a genuine 0.0 cosine (an
    all-negative benchmark similarity would make a 0.0 sentinel
    OVERSTATE contamination; pinned in tests).

    - ``method='brute'``: exact — the corpus scans once against the
      BROADCAST benchmark (eval sets are small by nature; the corpus side
      is never broadcast or shuffled). The oracle row.
    - ``method='lsh'`` (default, the no-broadcast-assumption path): LSH
      SEARCH mode (lsh_bucketed_topk with the corpus as the query stream
      and the benchmark as the index) — both sides arbitrarily large,
      only (table, bucket)-keyed shuffles; exact cosine verification on
      candidates; recall follows the pinned ANN presets (raise n_tables).
    """
    from pyspark.sql import functions as F

    from .similarity import _as_double, _dot, _norm, lsh_bucketed_topk

    if method == "brute":
        c = corpus_embeddings.select(
            F.col(id_col).alias("_cid"), _as_double(F.col(vec_col)).alias("_cv")
        ).withColumn("_cn", _norm(F.col("_cv")))
        b = benchmark_embeddings.select(
            _as_double(F.col(vec_col)).alias("_bv")
        ).withColumn("_bn", _norm(F.col("_bv")))
        cos = _dot(F.col("_cv"), F.col("_bv")) / (F.col("_cn") * F.col("_bn"))
        return (
            c.crossJoin(F.broadcast(b))
            .select("_cid", F.round(cos, 6).alias("_cos"))
            .groupBy(F.col("_cid").alias(id_col))
            .agg(F.max("_cos").alias("max_cosine"))
        )
    if method != "lsh":
        raise ValueError(f"method must be 'brute' or 'lsh', got {method!r}")
    # dim: hyperplane width for the LSH hash. Default = infer from the first
    # benchmark vector (ADVICE r5: the former hard 64 silently prefix-hashed
    # wider embeddings and degraded recall with no caller-side remedy);
    # an explicit dim overrides, and an empty benchmark falls back to 64.
    if dim is None:
        first = benchmark_embeddings.select(vec_col).where(
            F.col(vec_col).isNotNull()
        ).head(1)
        dim = len(first[0][0]) if first else 64
    topk = lsh_bucketed_topk(
        benchmark_embeddings,
        k=1,
        id_col=id_col,
        vec_col=vec_col,
        n_planes=n_planes,
        dim=dim,
        n_tables=n_tables,
        queries=corpus_embeddings,
    )
    hits = topk.where(F.col("rk") == 1).select(
        F.col("query_id").alias(id_col), F.col("cosine").alias("max_cosine")
    )
    return corpus_embeddings.select(id_col).join(hits, id_col, "left")
