"""Similarity search over embedding columns (array<float>).

- :func:`cosine_similar_pairs` / :func:`cosine_topk`: brute-force baseline,
  fully JVM-side (``zip_with`` dot product inside whole-stage codegen) —
  correct at any scale but O(n^2); used as the recall oracle.
- :func:`lsh_bucketed_topk` / :func:`cosine_similar_pairs_lsh`: the scale
  paths — random-hyperplane L-table buckets shrink the candidate set so the
  self-join shuffles on (table, bucket) keys instead of exploding the cross
  product. Hyperplanes are derived deterministically from blake2b so driver
  and executors agree without shipping matrices.
- :func:`ann_topk_matmul`: fixed-index pattern — broadcast the (small) index
  matrix, stream query batches through a numpy matmul in mapInPandas. This
  is the right physical plan when index << corpus (e.g. query 10^12 docs
  against a 10^6-vector index).
- :func:`ivf_topk`: inverted-file ANN — nearest-centroid cells as the join
  key (the centroid-bucketed counterpart of the hyperplane LSH path); cell
  assignment is codegen literals for small cell counts and a broadcast
  centroid matrix + mapInPandas matmul above ``IVF_LITERAL_MAX_CELLS``;
  optional spherical k-means refinement (:func:`kmeans_refine_centroids`).
  Full probing degenerates to exact top-k, which pins the plan's
  correctness.
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


def _vectors_matrix(vals, dim):
    """(n, dim) float64 matrix from a sequence of vectors. Rectangular input
    of width ``dim`` is a single zero-copy-ish np.array; ragged or
    differently-sized vectors degrade to prefix semantics (truncate past
    ``dim``, zero-pad short rows) — matching the literal expression paths'
    slice+coalesce behavior instead of raising from a ragged matmul. NULL
    vectors become zero rows (callers that need literal-path parity for
    nulls mask them explicitly — see :func:`_lsh_assign_matmul`)."""
    import numpy as np

    vals = list(vals)
    try:
        q = np.array(vals, dtype=np.float64)
        if q.ndim == 2 and q.shape[1] == dim:
            return q
    except (ValueError, TypeError):
        pass
    out = np.zeros((len(vals), dim), dtype=np.float64)
    for i, v in enumerate(vals):
        if v is None:
            continue
        d = min(len(v), dim)
        out[i, :d] = np.asarray(v[:d], dtype=np.float64)
    return out


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
            # coalesce: a vector shorter than ``dim`` zip-pads with nulls,
            # which would otherwise null the whole dot product and silently
            # collapse every vector into one bucket (prefix-LSH degradation
            # is the sane failure mode for a dim mismatch)
            # slice to ``dim``: a vector LONGER than dim would zip-pad the
            # plane side with nulls and zero the whole dot; slicing keeps the
            # same prefix-LSH degradation as the matmul path
            F.zip_with(
                F.slice(vec_col, 1, dim), comps,
                lambda x, h: F.coalesce(x.cast("double"), F.lit(0.0)) * h,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


# above this total plane count, per-row sign computation moves from literal
# HOF expressions (interpreted aggregate folds: ~n_planes*n_tables*dim
# multiply-adds per row in expression objects) to ONE numpy sign-matmul per
# Arrow batch against the broadcast plane matrix — measured ~10x on the
# 64-plane embedding-dedup default
LSH_LITERAL_MAX_PLANES = 16


def _lsh_assign_matmul(emb: DataFrame, id_col: str, vec_col: str,
                       n_planes: int, dim: int, n_tables: int,
                       probe_bits: int = 0) -> DataFrame:
    """(id, v, b0..b{T-1}[, p0..p{T-1}]) with all n_tables*n_planes sign bits
    from one BLAS matmul per batch. Plane values are identical to the literal
    path (same blake2b derivation); vectors pass through as float64 so
    downstream JVM cosine arithmetic is unchanged. Sign convention matches
    :func:`hyperplane_signs` (dot >= 0 sets the bit).

    NULL vectors hash to bucket 0 in every table — the same bucket the
    literal path's NULL dot product lands in (``when(NULL >= 0)`` falls to
    otherwise(0)) — so plan choice never flips the null failure mode.

    ``probe_bits > 0`` additionally emits per-table MULTI-PROBE bucket arrays
    ``p{t}``: the primary bucket plus the buckets reached by flipping each of
    the ``probe_bits`` lowest-|margin| sign bits (margin = the plane dot
    product, already computed by the same matmul). Flipping the least-confident
    bits probes exactly the buckets a true near neighbor most likely fell
    into — classic multi-probe LSH (Lv et al., VLDB'07) — so recall rises
    steeply without adding tables or planes."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    H = np.array(
        [
            [_plane_component(t * 1000 + p, i) for i in range(dim)]
            for t in range(n_tables)
            for p in range(n_planes)
        ],
        dtype=np.float64,
    )
    bc = emb.sparkSession.sparkContext.broadcast(H)
    weights = (1 << np.arange(n_planes, dtype=np.int64))
    probe_bits = min(probe_bits, n_planes)

    # id passes through untouched (string/uuid ids work exactly like the
    # literal path, which never looks at the id either)
    schema = T.StructType(
        [
            T.StructField("id", emb.schema[id_col].dataType),
            T.StructField("v", T.ArrayType(T.DoubleType())),
        ]
        + [T.StructField(f"b{t}", T.IntegerType()) for t in range(n_tables)]
        + (
            [T.StructField(f"p{t}", T.ArrayType(T.IntegerType()))
             for t in range(n_tables)]
            if probe_bits
            else []
        )
    )

    def assign(batches):
        planes = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            nulls = pdf[vec_col].isna().to_numpy()
            # prefix-LSH degradation on dim mismatch (same as the literal
            # path's slice+coalesce: missing components contribute 0)
            q = _vectors_matrix(pdf[vec_col], planes.shape[1])
            margins = q @ planes.T  # (batch, T*P)
            signs = margins >= 0.0
            # null vector -> every bit unset (bucket 0), matching the literal
            # path's NULL-dot semantics instead of the all-bits-set bucket a
            # zero vector would produce
            signs[nulls] = False
            out = {
                "id": pdf[id_col],
                # pass the ORIGINAL vector through (as float64) so downstream
                # exact-cosine arithmetic matches the other paths even when
                # the matrix was padded/truncated for hashing (np.asarray:
                # one vectorized C conversion per cell, not a float() loop)
                "v": [
                    None if v is None else np.asarray(v, dtype=np.float64)
                    for v in pdf[vec_col]
                ],
            }
            for t in range(n_tables):
                buckets = (
                    signs[:, t * n_planes : (t + 1) * n_planes] @ weights
                ).astype(np.int32)
                out[f"b{t}"] = buckets
                if probe_bits:
                    # flip order = ascending |margin|: the least-confident
                    # sign bits first
                    flips = np.argsort(
                        np.abs(margins[:, t * n_planes : (t + 1) * n_planes]),
                        axis=1,
                        kind="stable",
                    )[:, :probe_bits]
                    out[f"p{t}"] = [
                        [int(b)] + [int(b) ^ (1 << int(p)) for p in fl]
                        for b, fl in zip(buckets, flips)
                    ]
            yield pd.DataFrame(out)

    return emb.select(id_col, vec_col).mapInPandas(assign, schema)


def _lsh_tables_frame(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int,
    dim: int,
    n_tables: int,
    probe_bits: int = 0,
    full_probe: bool = False,
    force_matmul: bool = False,
):
    """(vectors, buckets, probes): ``vectors`` = (id, v, nrm, b0..b{T-1})
    persisted — both consumers (candidate join sides, exact-verify sides)
    reference it and without the boundary CollapseProject re-inlines the
    plane dot products into every branch; ``buckets`` = (id, v, t, bucket)
    exploded per table (the INDEX side — always the primary bucket only).
    Bucket bits come from literal expressions up to
    ``LSH_LITERAL_MAX_PLANES`` total planes and a broadcast-plane-matrix
    mapInPandas matmul above that (the many-table/plane physical plan).

    ``buckets``/``probes`` carry the (float64) vector alongside the bucket
    key: the per-bucket numpy pruners (:func:`_bucket_topk_prune`,
    :func:`_bucket_pair_prune`) consume whole bucket groups, so the vector
    bytes cross the (t, bucket) shuffle ONCE and candidate generation never
    materializes the per-pair explosion (guide §8: decide on lightweight
    rows — here, decide per bucket group — and move payload bytes once).

    ``probes`` is the QUERY side: None by default (queries probe only their
    primary bucket, same frame as ``buckets``). With ``probe_bits > 0`` it is
    the multi-probe expansion (primary + the ``probe_bits`` lowest-|margin|
    single-bit flips per table; assignment always routes through the matmul
    path, which computes the margins for free in the same BLAS call). With
    ``full_probe`` every bucket of table 0 is probed — the candidate set is
    the full index, making downstream top-k EXACT while still exercising the
    real bucketed equi-join plan (the LSH counterpart of IVF's
    n_probe == n_cells exactness pin; one table suffices since any single
    table already covers the whole index)."""
    if full_probe and n_planes > 12:
        raise ValueError(
            f"full_probe explodes 2^n_planes={1 << n_planes} probe rows per "
            "vector; it is the small-plane exactness pin, not a scale path — "
            "use probe_bits multi-probe instead"
        )
    # ``force_matmul``: callers hashing TWO tables (search mode) must route
    # both through the same assignment path — literal Catalyst folds sum
    # sequentially while the BLAS matmul sums blocked/pairwise, and a plane
    # dot within rounding error of zero could flip its sign bit between the
    # paths, splitting an identical vector across buckets
    use_matmul = (
        force_matmul
        or probe_bits > 0
        or n_planes * n_tables > LSH_LITERAL_MAX_PLANES
    )
    if not use_matmul:
        v = emb.select(
            F.col(id_col).alias("id"),
            _as_double(F.col(vec_col)).alias("v"),
            *[
                hyperplane_signs(F.col(vec_col), n_planes, dim, table=t).alias(f"b{t}")
                for t in range(n_tables)
            ],
        )
    else:
        v = _lsh_assign_matmul(
            emb, id_col, vec_col, n_planes, dim, n_tables, probe_bits=probe_bits
        )
    v = v.withColumn("nrm", _norm(F.col("v"))).persist()
    # transport type for the per-bucket pruners: when the SOURCE vectors are
    # float32, the float64 v column is exactly float32-representable, so the
    # bucket shuffle can carry half the bytes losslessly (the pruners upcast
    # back to float64 and compute identical cosines); float64 sources keep
    # float64 transport — never a lossy downcast
    from pyspark.sql import types as _T

    src_elem = emb.schema[vec_col].dataType
    vt = (
        F.col("v").cast("array<float>").alias("v")
        if isinstance(src_elem, _T.ArrayType)
        and isinstance(src_elem.elementType, _T.FloatType)
        else F.col("v")
    )
    buckets = v.select(
        "id",
        vt,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("t"), F.col(f"b{t}").alias("bucket"))
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("id", "v", "tb.t", "tb.bucket")
    probes = None
    if full_probe:
        probes = v.select(
            "id",
            vt,
            F.lit(0).alias("t"),
            F.explode(
                F.sequence(F.lit(0), F.lit((1 << n_planes) - 1))
            ).alias("bucket"),
        )
    elif probe_bits > 0:
        probes = v.select(
            "id",
            vt,
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(t).alias("t"), F.col(f"p{t}").alias("pb"))
                        for t in range(n_tables)
                    ]
                )
            ).alias("tp"),
        ).select("id", "v", F.col("tp.t").alias("t"), F.explode("tp.pb").alias("bucket"))
    return v, buckets, probes


def _pair_lengths(col):
    """True vector lengths (-1 for NULL): the pruners must mirror the JVM
    cosine's NULL semantics — ``zip_with`` null-pads unequal lengths and a
    NULL operand nulls the whole dot product — so any pair whose lengths
    differ (or that involves a NULL vector) ranks/filters exactly as its
    NULL cosine would, never as a zero-padded numpy value."""
    import numpy as np

    return np.array([-1 if x is None else len(x) for x in col], dtype=np.int64)


def _cosine_block(Q, qn, qlen, I_n, ilen):
    """(block, n_index) cosine matrix reproducing Spark's ordering semantics:
    unequal-length / NULL pairs -> -inf (JVM NULL sorts last under desc),
    0/0 -> +inf stand-in for NaN (Spark orders NaN greatest). ``I_n`` is the
    index matrix ALREADY divided by its norms-with-zero-kept (so a zero-norm
    index row divides to nan/inf exactly like the JVM's dot/0)."""
    import numpy as np

    with np.errstate(divide="ignore", invalid="ignore"):
        cos = (Q / qn[:, None]) @ I_n.T
    cos[np.isnan(cos)] = np.inf  # Spark sorts NaN above +Infinity
    cos[qlen[:, None] != ilen[None, :]] = -np.inf  # JVM NULL cosine
    cos[qlen == -1, :] = -np.inf
    cos[:, ilen == -1] = -np.inf
    return cos


_PRUNE_BLOCK_CELLS = 4 << 20  # ~32 MB of float64 cosines per matmul block


def _bucket_topk_prune(qside, iside, k: int, self_mode: bool, q_id_type, n_id_type):
    """(query_id, nbr_id) candidates — per probed bucket, each query's EXACT
    local top-k under the global comparator (cosine desc, nbr_id asc), via
    one numpy matmul + stable argsort per bucket group instead of the
    per-pair explosion. Lossless by the standard distributed-top-k argument:
    any global top-k winner is, inside every bucket containing it, preceded
    by at most k-1 better candidates, so it survives the local cut; the JVM
    tail re-scores survivors with the unchanged exact-cosine expression, so
    emitted values/ties are bit-identical to the unpruned plan. In
    ``self_mode`` the local cut keeps k+1 and drops self-pairs after, so a
    bucket containing the query itself still yields k candidates.

    PRIVATE-HELPER CAVEAT: consume the result through an operator that
    references query_id/nbr_id (the callers' ``.distinct()`` does). A bare
    ``.count()`` on the raw cogroup output lets Catalyst prune the child
    inputs down to the grouping keys before the UDF runs (observed on
    Spark 4.1), and the function then fails loudly on the missing columns."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("query_id", q_id_type), T.StructField("nbr_id", n_id_type)]
    )
    keep = k + 1 if self_mode else k

    def prune(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame(columns=["query_id", "nbr_id"])
        # index sorted by id asc => stable argsort on -cos == (cos desc, id asc)
        right = right.sort_values("id", kind="stable")
        nbr_ids = right["id"].to_numpy()
        ilen = _pair_lengths(right["v"])
        qlen = _pair_lengths(left["v"])
        dim = max(int(ilen.max()), int(qlen.max()), 1)
        I = _vectors_matrix(right["v"], dim)
        with np.errstate(divide="ignore", invalid="ignore"):
            I_n = I / np.linalg.norm(I, axis=1, keepdims=True)
        q_ids = left["id"].to_numpy()
        Q = _vectors_matrix(left["v"], dim)
        qn = np.linalg.norm(Q, axis=1)
        def topk_sel(cos):
            # exact top-keep under (cos desc, index asc): O(n) argpartition
            # pre-cut + stable sort of the slice; rows whose boundary value
            # ties past the slice fall back to the full stable argsort, so
            # selection is identical to sorting the whole row (dup-heavy
            # buckets with >32-way boundary ties stay correct, just slower)
            n_i = cos.shape[1]
            if n_i <= keep + 32:
                return np.argsort(-cos, axis=1, kind="stable")[:, :keep]
            m = keep + 32
            part = np.argpartition(-cos, m - 1, axis=1)[:, :m]
            part.sort(axis=1)  # index-ascending base order for stability
            pc = np.take_along_axis(cos, part, axis=1)
            oo = np.argsort(-pc, axis=1, kind="stable")
            sel = np.take_along_axis(part, oo, axis=1)[:, :keep]
            bv = np.take_along_axis(pc, oo, axis=1)[:, keep - 1]
            bad = (cos == bv[:, None]).sum(axis=1) > (pc == bv[:, None]).sum(axis=1)
            if bad.any():
                sel[bad] = np.argsort(-cos[bad], axis=1, kind="stable")[:, :keep]
            return sel

        out_q, out_n = [], []
        block = max(1, _PRUNE_BLOCK_CELLS // max(len(nbr_ids), 1))
        for s in range(0, len(q_ids), block):
            e = min(s + block, len(q_ids))
            cos = _cosine_block(Q[s:e], qn[s:e], qlen[s:e], I_n, ilen)
            sel = topk_sel(cos)
            bq = np.repeat(q_ids[s:e], sel.shape[1])
            bn = nbr_ids[sel.ravel()]
            if self_mode:
                m = bq != bn
                bq, bn = bq[m], bn[m]
            out_q.append(bq)
            out_n.append(bn)
        return pd.DataFrame(
            {"query_id": np.concatenate(out_q), "nbr_id": np.concatenate(out_n)}
        )

    return (
        qside.groupBy("t", "bucket")
        .cogroup(iside.groupBy("t", "bucket"))
        .applyInPandas(prune, schema)
    )


def _bucket_pair_prune(bucketed, threshold: float, id_type):
    """(id_a, id_b) candidate pairs — per bucket, the pairs whose numpy
    cosine clears ``threshold - 1e-9`` (or is non-finite: the JVM's NaN
    passes ``>=`` under Spark's NaN-greatest semantics, so those pairs must
    reach the exact verify). SUPERSET of the pairs the exact JVM filter
    keeps — float64 matmul and the JVM fold agree far below the 1e-9 margin
    — so the unchanged verify tail emits exactly the unpruned plan's rows
    while the per-pair explosion+distinct over whole buckets disappears."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("id_a", id_type), T.StructField("id_b", id_type)]
    )
    cut = threshold - 1e-9

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(columns=["id_a", "id_b"])
        ids = pdf["id"].to_numpy()
        lens = _pair_lengths(pdf["v"])
        dim = max(int(lens.max()), 1)
        M = _vectors_matrix(pdf["v"], dim)
        nrm = np.linalg.norm(M, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            M_n = M / nrm[:, None]
        out_a, out_b = [], []
        block = max(1, _PRUNE_BLOCK_CELLS // n)
        for s in range(0, n, block):
            e = min(s + block, n)
            cos = _cosine_block(M[s:e], nrm[s:e], lens[s:e], M_n, lens)
            hit = (cos >= cut) | ~np.isfinite(cos)
            hit[lens[s:e, None] != lens[None, :]] = False  # JVM NULL fails >=
            hit[lens[s:e] == -1, :] = False
            hit[:, lens == -1] = False
            r, c = np.nonzero(hit)
            a, b = ids[r + s], ids[c]
            m = a != b
            a, b = a[m], b[m]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    return bucketed.groupBy("t", "bucket").applyInPandas(prune, schema)


def cosine_similar_pairs_lsh(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 8,
    max_bucket_size: int = 4096,
) -> DataFrame:
    """Scale path for :func:`cosine_similar_pairs`: candidate pairs from
    hyperplane L-tables (same-bucket in ANY table), then EXACT cosine verify.
    Precision is exact (every emitted pair passed the real cosine test);
    recall per pair is 1 - (1 - (1 - acos(c)/pi)^n_planes)^n_tables — at the
    defaults, 0.988 at the c=0.95 boundary and ->1.0 as c->1 (true near-dups
    agree on every plane sign). Measured recall is pinned in
    tests/test_similarity.py. The shuffle key is the (table, bucket) id —
    the corpus never cross-joins.

    ``max_bucket_size`` is the hot-bucket skew guard (same shape as the
    minhash one): a mass-duplicated vector puts all its copies in one bucket
    of EVERY table and the self-join would emit O(copies^2) pairs. Buckets
    over the cap switch to chain pairing ordered by the vector's FULL
    bucket signature across all tables (then id), so identical/parallel
    vectors sit adjacent and their chain edges verify at cosine ~1.0 —
    bounded work, clusters stay connected for min-id dedup."""
    from pyspark.sql import Window

    v, buckets, _ = _lsh_tables_frame(emb, id_col, vec_col, n_planes, dim, n_tables)
    # bucket sizes via a COUNT window on the join key (see the minhash
    # variant): one shuffle annotates sizes in place, no groupBy+rejoin
    sized = buckets.withColumn(
        "_bsz", F.count("*").over(Window.partitionBy("t", "bucket"))
    ).persist()
    small = sized.where(F.col("_bsz") <= max_bucket_size)
    # per-bucket numpy threshold prefilter (guide §4.2): one matmul per
    # bucket group replaces the all-pairs self-join + distinct over whole
    # buckets; emits a provable SUPERSET (threshold - 1e-9 margin) of the
    # pairs the unchanged exact JVM verify below keeps, so output rows are
    # identical while the shuffle after this point carries only true-ish
    # near-dup pairs instead of O(bucket^2) candidates
    pairs_small = _bucket_pair_prune(
        small.select("id", "v", "t", "bucket"), threshold, emb.schema[id_col].dataType
    )
    # chain branch enters the plan only when a hot bucket exists (one cheap
    # reduce over the persisted-anyway sized frame; the always-present
    # empty branch was measured ~0.6s/run of fixed stage overhead).
    # NOTE: this makes operator CONSTRUCTION eager — building the plan runs
    # a Spark job. The branch decision is safe across cache eviction because
    # the lineage is deterministic (parquet scan + deterministic hashes):
    # a recompute reproduces the same bucket sizes. Callers feeding a
    # NON-deterministic input (e.g. rand() columns) must persist/checkpoint
    # it first or the chain guard could be silently absent after eviction.
    max_seen = sized.agg(F.max("_bsz")).first()[0]
    if max_seen is None or max_seen <= max_bucket_size:
        cand = pairs_small.distinct()
    else:
        bcols = [f"b{t}" for t in range(n_tables)]
        w = Window.partitionBy("t", "bucket").orderBy(*bcols, "id")
        pairs_big = (
            sized.where(F.col("_bsz") > max_bucket_size)
            .join(v.select("id", *bcols), "id")
            .withColumn("_prev", F.lag("id").over(w))
            .where(F.col("_prev").isNotNull())
            .select(
                F.least("_prev", "id").alias("id_a"),
                F.greatest("_prev", "id").alias("id_b"),
            )
        )
        cand = pairs_small.unionByName(pairs_big).distinct()
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), F.col("nrm").alias("n_a"))
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), F.col("nrm").alias("n_b"))
    cos = _dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def lsh_bucketed_topk(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 64,
    n_tables: int = 4,
    probe_bits: int = 0,
    full_probe: bool = False,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k per vector: candidates = same-bucket pairs in ANY of
    ``n_tables`` independent hyperplane tables (L-tables LSH), then exact
    cosine + per-query top-k window over the deduped candidate set. The
    shuffle key is (table, bucket) — the corpus never cross-joins.

    ``queries=None`` is self-ANN over ``emb`` (self-pairs excluded). A
    separate ``queries`` table is SEARCH mode — query stream vs curated
    index, both arbitrarily large, neither collected nor broadcast: both
    sides hash with the SAME blake2b-derived planes (deterministic, no
    state to ship), the index side keeps one bucket per table, the query
    side probes (multi-probe applies to queries only), and query ids may
    collide with index ids (no self-pair filter — a query's own index
    copy legitimately ranks first at cosine 1.0).

    ``probe_bits``: multi-probe LSH — each QUERY additionally probes the
    buckets reached by flipping its ``probe_bits`` lowest-|margin| sign bits
    per table (the index side stays one bucket per table, so index size is
    unchanged; only the probe fan-out grows by probe_bits+1 per table).
    Recall at the shipped parameters is measured against :func:`cosine_topk`
    and pinned in tests/test_similarity.py (0.93 at n_planes=4, n_tables=4,
    probe_bits=4 on the sf0.01 corpus vs 0.4433 single-probe).

    ``full_probe``: probe every bucket of one table — the candidate set is
    the whole index and the result is EXACT top-k (pinned by the DuckDB
    brute-force oracle) while still exercising the real bucketed equi-join
    physical plan; the LSH mirror of IVF's n_probe == n_cells exactness."""
    # search mode: the query side may need the matmul path (multi-probe
    # margins); the index side must then use the SAME path — mixed paths
    # could flip a near-zero plane dot's sign bit between the two sides
    # and split an identical vector across buckets (see _lsh_tables_frame)
    query_uses_matmul = probe_bits > 0 or n_planes * n_tables > LSH_LITERAL_MAX_PLANES
    v, buckets, probes = _lsh_tables_frame(
        emb, id_col, vec_col, n_planes, dim, n_tables,
        # index-side probes are never used; only build them in self mode
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
    # per-bucket numpy local-top-k pruner (guide §4.2/§8): instead of
    # exploding every (probe, index) bucket coincidence into pair rows,
    # distinct-ing them, and paying the interpreted exact-cosine fold per
    # pair, cogroup each (t, bucket) once and keep each query's exact local
    # top-k under the global comparator — provably every global winner
    # survives, and the unchanged JVM verify tail below re-scores the few
    # survivors so emitted values/ties stay bit-identical to the old plan
    cand = _bucket_topk_prune(
        qside.select("id", "v", "t", "bucket"),
        buckets.select("id", "v", "t", "bucket"),
        k,
        self_mode=queries is None,
        q_id_type=(emb if queries is None else queries).schema[id_col].dataType,
        n_id_type=emb.schema[id_col].dataType,
    ).distinct()
    if queries is None:
        cand = cand.where(F.col("query_id") != F.col("nbr_id"))
    a = qv.select(F.col("id").alias("query_id"), F.col("v").alias("q_v"), F.col("nrm").alias("q_n"))
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
    ids = np.array([r[0] for r in rows])  # dtype inferred: int64 or object (str ids)
    dim = len(rows[0][1]) if rows else 0
    mat = _vectors_matrix([r[1] for r in rows], dim)
    mat_norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat_norms[mat_norms == 0.0] = 1.0  # null/zero index vectors score 0, not nan
    mat_n = mat / mat_norms
    bc = spark.sparkContext.broadcast((ids, mat_n))

    id_type = emb.schema[id_col].dataType  # passthrough: string ids work too
    schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("nbr_id", id_type),
            T.StructField("cosine", T.DoubleType()),
            T.StructField("rk", T.IntegerType()),
        ]
    )

    def score(batches):
        ids_b, mat_b = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            q_ids = pdf[id_col].to_numpy()
            q = _vectors_matrix(pdf[vec_col], mat_b.shape[1])
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0.0] = 1.0  # null/zero queries score 0 everywhere, not nan
            q = q / qn
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
                    out["nbr_id"].append(nid.item() if hasattr(nid, "item") else nid)
                    # round half away from zero: matches Spark F.round and
                    # DuckDB round() (Python's round() is half-to-even)
                    c = float(c)
                    out["cosine"].append(
                        np.copysign(np.floor(abs(c) * 1e6 + 0.5), c) / 1e6
                    )
                    out["rk"].append(rk)
            yield pd.DataFrame(out)

    return emb.select(id_col, vec_col).mapInPandas(score, schema)


# above this cell count, literal-array cell assignment is replaced by a
# broadcast centroid matrix + mapInPandas matmul: n_cells * dim literals per
# row blow up the expression tree / codegen (a 2^12-cell index would inline
# 262k literals and score cells at O(n_cells * dim) interpreted cost per row)
IVF_LITERAL_MAX_CELLS = 32


def _ivf_assign_literal(emb, id_col, vec_col, centroids, n_probe) -> DataFrame:
    """(id, v, nrm, cell, probes) with cell scores as unrolled literal-array
    expressions — whole-stage codegen, right for small n_cells. Centroid
    norms fold to constants driver-side. Ties: higher cell id wins (struct
    max), probe order = cosine desc then cell desc (reverse(array_sort))."""
    import math

    def cell_scores(vcol):
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

    return emb.select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("v"),
        cell_scores(F.col(vec_col)).alias("scores"),
    ).select(
        "id",
        "v",
        _norm(F.col("v")).alias("nrm"),
        F.array_max("scores").getField("cell").alias("cell"),
        F.transform(
            F.slice(F.reverse(F.array_sort("scores")), 1, n_probe),
            lambda s: s.getField("cell"),
        ).alias("probes"),
    )


def _ivf_assign_matmul(spark, emb, id_col, vec_col, centroids, n_probe) -> DataFrame:
    """(id, v, nrm, cell, probes) with cell assignment as ONE numpy matmul per
    Arrow batch against a broadcast centroid matrix — the large-n_cells
    physical plan (the expression tree stays O(1) in n_cells and per-row cost
    is a BLAS row). Tie-breaks replicate the literal path exactly (cosine
    desc, then cell id desc). ``v`` passes through Arrow as float64 and
    ``nrm`` is computed JVM-side afterwards, so downstream exact-cosine
    arithmetic is bit-identical to the literal path."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    cen = np.array(centroids, dtype=np.float64)
    norms = np.linalg.norm(cen, axis=1)
    norms[norms == 0.0] = 1.0
    bc = spark.sparkContext.broadcast(cen / norms[:, None])

    schema = T.StructType(
        [
            T.StructField("id", emb.schema[id_col].dataType),  # passthrough
            T.StructField("v", T.ArrayType(T.DoubleType())),
            T.StructField("cell", T.IntegerType()),
            T.StructField("probes", T.ArrayType(T.IntegerType())),
        ]
    )

    def assign(batches):
        cen_n = bc.value
        n_cells = cen_n.shape[0]
        cells_desc = -np.arange(n_cells)  # lexsort secondary: cell id DESC
        for pdf in batches:
            if pdf.empty:
                continue
            q = _vectors_matrix(pdf[vec_col], cen_n.shape[1])
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0.0] = 1.0
            sims = (q / qn) @ cen_n.T  # (batch, n_cells)
            cell, probes = [], []
            for row in sims:
                order = np.lexsort((cells_desc, -row))[:n_probe]
                cell.append(int(order[0]))
                probes.append([int(c) for c in order])
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    # ORIGINAL vector (as float64) so downstream exact-cosine
                    # matches the other paths even if hashing padded/truncated
                    # (NULL vectors pass through as NULL: zero-row hashing
                    # gives them a cell, their cosine stays NULL either path)
                    "v": [
                        None if v is None else [float(x) for x in v]
                        for v in pdf[vec_col]
                    ],
                    "cell": np.array(cell, dtype=np.int32),
                    "probes": probes,
                }
            )

    assigned = emb.select(id_col, vec_col).mapInPandas(assign, schema)
    return assigned.select("id", "v", _norm(F.col("v")).alias("nrm"), "cell", "probes")


def kmeans_refine_centroids(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
) -> list[list[float]]:
    """Spherical k-means sweeps over the seed centroids: assign every vector
    to its nearest (cosine) centroid, recompute each centroid as the cell
    mean. Distributed-safe at corpus scale: per-partition partial sums are
    accumulated in numpy and ONLY (n_cells x dim) aggregates shuffle — the
    driver never sees vectors, just the (cell, count, sum) rollup. Empty
    cells keep their previous centroid."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = emb.sparkSession
    dim = len(centroids[0])
    schema = T.StructType(
        [
            T.StructField("cell", T.IntegerType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("vsum", T.ArrayType(T.DoubleType())),
        ]
    )
    cen = np.array(centroids, dtype=np.float64)
    for _ in range(iters):
        norms = np.linalg.norm(cen, axis=1)
        norms[norms == 0.0] = 1.0
        bc = spark.sparkContext.broadcast(cen / norms[:, None])

        def partials(batches):
            cen_n = bc.value
            sums = np.zeros((cen_n.shape[0], dim), dtype=np.float64)
            counts = np.zeros(cen_n.shape[0], dtype=np.int64)
            for pdf in batches:
                # drop NULL vectors (they carry no direction to vote with);
                # ragged/wrong-dim vectors degrade to prefix/pad semantics
                # via _vectors_matrix, same as the sibling matmul paths
                pdf = pdf[pdf[vec_col].notna()]
                if pdf.empty:
                    continue
                q = _vectors_matrix(pdf[vec_col], dim)
                qn = np.linalg.norm(q, axis=1, keepdims=True)
                qn[qn == 0.0] = 1.0
                cells = np.argmax((q / qn) @ cen_n.T, axis=1)
                np.add.at(sums, cells, q)
                np.add.at(counts, cells, 1)
            hit = np.flatnonzero(counts)
            if hit.size:  # never yield empty frames (Arrow float64 poisoning)
                yield pd.DataFrame(
                    {
                        "cell": hit.astype(np.int32),
                        "cnt": counts[hit],
                        "vsum": [sums[c].tolist() for c in hit],
                    }
                )

        rolled = (
            emb.select(vec_col)
            .mapInPandas(partials, schema)
            .select("cell", "cnt", F.posexplode("vsum").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.sum("cnt").alias("cnt"), F.sum("x").alias("x"))
            .collect()
        )
        bc.unpersist()
        new_cen = cen.copy()
        # each (cell, pos) group sums cnt once per contributing partition,
        # so r["cnt"] is the cell's total vector count
        for r in rolled:
            new_cen[r["cell"], r["pos"]] = r["x"] / r["cnt"]
        cen = new_cen
    return [list(map(float, row)) for row in cen]


def ivf_topk(
    spark,
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    n_probe: int = 2,
    max_centroid_rows: int = 65536,
    kmeans_iters: int = 0,
    queries: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN — the centroid-bucketed counterpart of
    :func:`lsh_bucketed_topk`:

    1. centroids: deterministic seeds (the ``n_cells`` lowest-id vectors of
       the INDEX side), collected driver-side (bounded by
       ``max_centroid_rows``), optionally refined with ``kmeans_iters``
       spherical k-means sweeps (:func:`kmeans_refine_centroids` — only
       (n_cells x dim) aggregates ever reach the driver);
    2. every vector is assigned to its nearest centroid cell — unrolled
       literal expressions in whole-stage codegen up to
       ``IVF_LITERAL_MAX_CELLS`` cells, a broadcast-matrix mapInPandas
       matmul above that (the 2^12+-cell physical plan);
    3. each query probes its ``n_probe`` nearest cells; candidates come from
       a cell-key equi-join (shuffle on the cell id, never a cross join);
    4. exact cosine + per-query top-k window over the probed candidates.

    ``queries=None`` is self-ANN over ``emb`` (self-pairs excluded, one
    shared assignment pass). A separate ``queries`` table is the production
    search shape — query stream vs curated index, BOTH arbitrarily large
    (neither is collected or broadcast, unlike :func:`ann_topk_matmul`'s
    driver-resident index): the index side takes one cell each, the query
    side fans out to its probe cells, and the only shuffle is the cell-key
    join. Query ids are then allowed to collide with index ids (different
    tables — no self-pair filter).

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
    if kmeans_iters > 0:
        centroids = kmeans_refine_centroids(
            emb, centroids, id_col=id_col, vec_col=vec_col, iters=kmeans_iters
        )

    def assign(df):
        if n_cells <= IVF_LITERAL_MAX_CELLS:
            return _ivf_assign_literal(df, id_col, vec_col, centroids, n_probe)
        return _ivf_assign_matmul(spark, df, id_col, vec_col, centroids, n_probe)

    av = assign(emb).persist()
    if queries is None:
        qv = av
        self_mode = True
    else:
        qv = assign(queries).persist()
        self_mode = False

    indexed = av.select("id", "v", "nrm", "cell")
    probes = qv.select(
        F.col("id").alias("query_id"),
        F.col("v").alias("q_v"),
        F.col("nrm").alias("q_n"),
        F.explode("probes").alias("cell"),
    )

    cos = _dot(F.col("q_v"), F.col("nbr_v")) / (F.col("q_n") * F.col("n_n"))
    scored = probes.join(
        indexed.select(
            F.col("id").alias("nbr_id"),
            F.col("v").alias("nbr_v"),
            F.col("nrm").alias("n_n"),
            "cell",
        ),
        "cell",
    )
    if self_mode:
        scored = scored.where(F.col("query_id") != F.col("nbr_id"))
    scored = scored.withColumn("cosine", cos)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "nbr_id", F.round("cosine", 6).alias("cosine"), "rk")
    )
