"""Similarity search over embedding columns (array<float>).

- :func:`cosine_similar_pairs` / :func:`cosine_topk`: brute-force baseline,
  fully JVM-side (``zip_with`` dot product inside whole-stage codegen) —
  correct at any scale but O(n^2); used as the recall oracle.
- :func:`lsh_bucketed_topk`: the scale path — random-hyperplane LSH buckets
  shrink the candidate set so the self-join shuffles on bucket keys instead
  of exploding the cross product. Hyperplanes are derived deterministically
  from xxhash64 so driver and executors agree without shipping matrices.
- :func:`ann_topk_matmul`: fixed-index pattern — broadcast the (small) index
  matrix, stream query batches through a numpy matmul in mapInPandas. This
  is the right physical plan when index << corpus (e.g. query 10^12 docs
  against a 10^6-vector index).
- :func:`ivf_topk`: inverted-file ANN — nearest-centroid cells as the join
  key (the centroid-bucketed counterpart of the hyperplane LSH path); full
  probing degenerates to exact top-k, which pins the plan's correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_similar_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """All pairs with cosine >= threshold (brute force, JVM-side). Norms are
    computed once per vector behind a persist() boundary so the O(n^2) pair
    loop evaluates only the dot product (3x fewer HOF ops per pair, and no
    CollapseProject re-inlining into both join branches)."""
    v = emb.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("nrm", _norm(F.col("v"))).persist()
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), F.col("nrm").alias("n_a"))
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), F.col("nrm").alias("n_b"))
    cos = _dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors per query vector (brute force): broadcast the queries,
    score every index row, window top-k. Ties broken by neighbor id. Norms
    precomputed once per vector (persist boundary, see cosine_similar_pairs)."""
    idx = (
        emb.select(F.col(id_col).alias("nbr_id"), _as_double(F.col(vec_col)).alias("nbr_v"))
        .withColumn("nbr_n", _norm(F.col("nbr_v")))
        .persist()
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("q_v")
        )
        .withColumn("q_n", _norm(F.col("q_v")))
        .persist()
    )
    cos = _dot(F.col("q_v"), F.col("nbr_v")) / (F.col("q_n") * F.col("nbr_n"))
    scored = (
        idx.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("nbr_id"))
        .withColumn("cosine", cos)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "nbr_id", F.round("cosine", 6).alias("cosine"), "rk")
    )


def _plane_component(p: int, i: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1] (blake2b
    of (p, i) — stable across Python/OS, no RNG state to ship)."""
    import hashlib

    digest = hashlib.blake2b(f"{p}:{i}".encode(), digest_size=8).digest()
    return (int.from_bytes(digest, "big") % 2001 - 1000) / 1000.0


def hyperplane_signs(vec_col, n_planes: int = 8, dim: int = 64, table: int = 0):
    """Random-hyperplane LSH bucket id: sign bits of dot(v, h_p). Plane
    vectors are generated driver-side and inlined as literal arrays — a
    transform(sequence(...)) per row would leave codegen and recompute the
    planes per row. ``table`` selects an independent plane family (standard
    L-tables construction). Returns an int bucket in [0, 2^n_planes)."""
    bucket = F.lit(0)
    for p in range(n_planes):
        comps = F.array(
            *[F.lit(_plane_component(table * 1000 + p, i)) for i in range(dim)]
        )
        dot = F.aggregate(
            F.zip_with(vec_col, comps, lambda x, h: x.cast("double") * h),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_bucketed_topk(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 64,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k per vector: candidates = same-bucket pairs in ANY of
    ``n_tables`` independent hyperplane tables (L-tables LSH), then exact
    cosine + window over the deduped candidate set. Recall measured against
    :func:`cosine_topk` in tests."""
    v = emb.select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("v"),
        *[
            hyperplane_signs(F.col(vec_col), n_planes, dim, table=t).alias(f"b{t}")
            for t in range(n_tables)
        ],
    ).withColumn("nrm", _norm(F.col("v"))).persist()

    buckets = v.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("t"), F.col(f"b{t}").alias("bucket"))
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("id", "tb.t", "tb.bucket")
    cand = (
        buckets.withColumnRenamed("id", "query_id")
        .join(buckets.withColumnRenamed("id", "nbr_id"), ["t", "bucket"])
        .where(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id")
        .distinct()
    )
    a = v.select(F.col("id").alias("query_id"), F.col("v").alias("q_v"), F.col("nrm").alias("q_n"))
    b = v.select(F.col("id").alias("nbr_id"), F.col("v").alias("nbr_v"), F.col("nrm").alias("n_n"))
    cos = _dot(F.col("q_v"), F.col("nbr_v")) / (F.col("q_n") * F.col("n_n"))
    scored = cand.join(a, "query_id").join(b, "nbr_id").withColumn("cosine", cos)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "nbr_id", F.round("cosine", 6).alias("cosine"), "rk")
    )


MAX_BROADCAST_INDEX_ROWS = 5_000_000


def ann_topk_matmul(
    spark,
    emb: DataFrame,
    index: DataFrame | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_index_rows: int = MAX_BROADCAST_INDEX_ROWS,
) -> DataFrame:
    """Fixed-index ANN: collect+broadcast the index matrix (numpy), stream
    query rows through mapInPandas with one matmul per Arrow batch. The
    physical contract is index << corpus (query 10^12 docs against a 10^6-row
    index): only the index is ever driver-resident, and the collect is HARD
    CAPPED at ``max_index_rows`` — an unbounded index must go through
    :func:`lsh_bucketed_topk` instead. Results are exact top-k against the
    given index (when index == corpus this equals :func:`cosine_topk`)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    index = emb if index is None else index
    # limit(cap+1) bounds what can ever reach the driver; the length check
    # then refuses over-cap indexes instead of silently truncating
    rows = index.select(id_col, vec_col).limit(max_index_rows + 1).collect()
    if len(rows) > max_index_rows:
        raise ValueError(
            f"ann_topk_matmul index exceeds max_index_rows={max_index_rows}; "
            "a corpus-sized 'index' would OOM the driver — use lsh_bucketed_topk"
        )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, mat_n))

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("nbr_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
            T.StructField("rk", T.IntegerType()),
        ]
    )

    def score(batches):
        ids_b, mat_b = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            q_ids = pdf[id_col].to_numpy(dtype=np.int64)
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ mat_b.T  # (batch, index)
            out = {"query_id": [], "nbr_id": [], "cosine": [], "rk": []}
            for r in range(sims.shape[0]):
                row = sims[r]
                mask = ids_b != q_ids[r]
                order = np.lexsort((ids_b[mask], -row[mask]))[:k]
                cand_ids = ids_b[mask][order]
                cand_cos = row[mask][order]
                for rk, (nid, c) in enumerate(zip(cand_ids, cand_cos), start=1):
                    out["query_id"].append(q_ids[r])
                    out["nbr_id"].append(int(nid))
                    # round half away from zero: matches Spark F.round and
                    # DuckDB round() (Python's round() is half-to-even)
                    c = float(c)
                    out["cosine"].append(
                        np.copysign(np.floor(abs(c) * 1e6 + 0.5), c) / 1e6
                    )
                    out["rk"].append(rk)
            yield pd.DataFrame(out)

    return emb.select(id_col, vec_col).mapInPandas(score, schema)


def ivf_topk(
    spark,
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    n_probe: int = 2,
    max_centroid_rows: int = 65536,
) -> DataFrame:
    """IVF (inverted-file) ANN — the centroid-bucketed counterpart of
    :func:`lsh_bucketed_topk`:

    1. centroids: deterministic seeds (the ``n_cells`` lowest-id vectors),
       collected driver-side (bounded by ``max_centroid_rows``) and inlined
       as literal arrays so cell assignment stays in whole-stage codegen —
       a k-means refinement sweep would reuse the same plan shape;
    2. every vector is assigned to its nearest centroid cell (one column of
       unrolled dot products, argmax via struct max);
    3. each query probes its ``n_probe`` nearest cells; candidates come from
       a cell-key equi-join (shuffle on the cell id, never a cross join);
    4. exact cosine + per-query top-k window over the probed candidates.

    With ``n_probe == n_cells`` every cell is probed and the result is EXACT
    brute-force top-k (pinned against :func:`cosine_topk` in tests and by
    the DuckDB oracle); smaller ``n_probe`` trades recall for candidate count.
    """
    seeds = (
        emb.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(min(n_cells, max_centroid_rows))
        .collect()
    )
    centroids = [[float(x) for x in r[1]] for r in seeds]

    def cell_scores(vcol):
        # cos(v, c_j) for each centroid as literal arrays; norms of the
        # centroids fold to constants driver-side
        import math

        scores = []
        for j, c in enumerate(centroids):
            c_norm = math.sqrt(sum(x * x for x in c)) or 1.0
            dot = F.aggregate(
                F.zip_with(vcol, F.array(*[F.lit(x) for x in c]),
                           lambda a, b: a.cast("double") * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            scores.append(
                F.struct((dot / (F.lit(c_norm) * _norm(_as_double(vcol)))).alias("cos"),
                         F.lit(j).alias("cell"))
            )
        return F.array(*scores)

    v = emb.select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("v"),
        cell_scores(F.col(vec_col)).alias("scores"),
    ).withColumn("nrm", _norm(F.col("v"))).persist()

    indexed = v.select("id", "v", "nrm", F.array_max("scores").getField("cell").alias("cell"))
    probes = v.select(
        F.col("id").alias("query_id"),
        F.col("v").alias("q_v"),
        F.col("nrm").alias("q_n"),
        F.explode(
            F.slice(F.reverse(F.array_sort("scores")), 1, n_probe)
        ).alias("probe"),
    ).select("query_id", "q_v", "q_n", F.col("probe.cell").alias("cell"))

    cos = _dot(F.col("q_v"), F.col("nbr_v")) / (F.col("q_n") * F.col("n_n"))
    scored = (
        probes.join(
            indexed.select(
                F.col("id").alias("nbr_id"),
                F.col("v").alias("nbr_v"),
                F.col("nrm").alias("n_n"),
                "cell",
            ),
            "cell",
        )
        .where(F.col("query_id") != F.col("nbr_id"))
        .withColumn("cosine", cos)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "nbr_id", F.round("cosine", 6).alias("cosine"), "rk")
    )
