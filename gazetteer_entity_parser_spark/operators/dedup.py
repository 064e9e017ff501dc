"""Deduplication operators for large-scale training-data pipelines.

Candidate generation is bucket-keyed (banded minhash / inverted index /
pigeonhole chunks) — never a cross join. Python crosses the boundary only in
Arrow-batched passes: the SimHash bit-vector fold, and (r6) the shingle pass
(:func:`shingled_frame`) plus nothing else — the minhash signature and every
join/aggregation stay JVM-side codegen. Scale notes per operator:

- exact: hash-groupBy on the full text — one shuffle, map-side combine.
- minhash LSH: shingle -> k-permutation minhash -> b bands -> bucket
  self-join. At 10^12 docs the bucket join replaces the O(n^2) cross join;
  banded buckets are the shuffle key, giant buckets (boilerplate pages) are
  AQE-skew-split; candidates verified with exact shingle Jaccard.
- ngram jaccard: inverted-index pair generation (token -> doc postings ->
  doc-pair counts) — the relational formulation that also serves as the
  DuckDB oracle.
- simhash: 64-bit fingerprints, hamming<=3 via 4x16-bit chunk pigeonhole
  bucket join.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd  # module-level: pandas UDF type hints resolve against globals
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ----------------------------------------------------------------- exact dedup


def _text_key(text_col):
    """256-bit content digest used as the dedup group key: the exchange
    carries 32-byte keys instead of the document bytes (at 100 TB a raw-text
    group key shuffles the whole corpus). SHA-256 collisions are below any
    practical error floor (standard content-addressing assumption)."""
    return F.sha2(F.col(text_col) if isinstance(text_col, str) else text_col, 256)


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical texts: (keeper_id, n_copies) per duplicated
    text; keeper = min id (deterministic). Groups on a content digest, not
    the text itself — see :func:`_text_key`."""
    return (
        docs.select(F.col(id_col), _text_key(text_col).alias("_h"))
        .groupBy("_h")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies"))
        .where(F.col("n_copies") > 1)
        .select("keeper_id", "n_copies")
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one row per distinct text (the min-id row). The min-id-per-text
    table is built and joined on the 32-byte content digest so neither the
    aggregation nor the join shuffles document bytes as keys."""
    docs_h = docs.withColumn("_h", _text_key(text_col))
    w_min = docs_h.groupBy("_h").agg(F.min(id_col).alias(id_col))
    return docs_h.join(w_min, ["_h", id_col]).drop("_h")


# ------------------------------------------------------------------- shingles


def token_shingles(text_col, n: int = 3):
    """Distinct n-token shingles as strings (JVM-side; US-separator joined)."""
    toks = F.split(text_col, r"\s+")
    toks = F.filter(toks, lambda t: t != "")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.when(F.size(toks) < n, F.array(F.concat_ws("\x1f", toks))).otherwise(
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws("\x1f", F.slice(toks, i + 1, n)))
        )
    )


# Java's default \s (what Spark's split("\\s+") compiles to) is exactly
# [ \t\n\x0B\f\r] — NOT Python's Unicode \s — so the Python shingler below
# replicates it literally to stay value-identical with the expression form.
_JAVA_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


def _shingle_list(text, n: int):
    """Python replica of :func:`token_shingles` for one text: same
    tokenization (Java-\\s split, empty tokens dropped), same short-text arm
    (a single all-tokens shingle when fewer than n tokens, '' for empty
    text), same first-occurrence-ordered distinct. Value-identity with the
    expression form is pinned in tests/test_similarity_prune.py."""
    if text is None:
        # the expression form yields [''] for NULL text, not NULL:
        # size(NULL) = -1 (non-ANSI) takes the short arm and concat_ws
        # skips its NULL array argument, leaving the empty string
        return [""]
    toks = [t for t in _JAVA_WS_RE.split(text) if t]
    if len(toks) < n:
        return ["\x1f".join(toks)]
    join = "\x1f".join
    return list(dict.fromkeys(join(toks[i : i + n]) for i in range(len(toks) - n + 1)))


def shingled_frame(
    docs: DataFrame,
    id_col: str | None = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(id, sh) with the distinct-shingle array computed in ONE mapInPandas
    pass (guide §4.2): the expression form walks the token array through an
    interpreted transform/concat_ws/array_distinct chain per row (HOFs are
    CodegenFallback), which measured ~2x the whole Python pass at sf1.0.
    Values are identical to ``token_shingles`` (pinned in pytest); ids pass
    through untouched. ``id_col=None`` emits the shingle column alone (the
    id-less benchmark side of decontamination)."""
    from pyspark.sql import types as T

    fields = (
        [T.StructField("id", docs.schema[id_col].dataType)] if id_col else []
    )
    schema = T.StructType(fields + [T.StructField("sh", T.ArrayType(T.StringType()))])

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out = {"sh": [_shingle_list(t, n) for t in pdf[text_col]]}
            if id_col:
                out = {"id": pdf[id_col], **out}
            yield pd.DataFrame(out)

    cols = [id_col, text_col] if id_col else [text_col]
    return docs.select(*cols).mapInPandas(gen, schema)


# ------------------------------------------------------------- minhash + LSH


def _seeded_hash(seed: int):
    # single-parameter lambda: a two-parameter lambda would be treated by
    # F.transform as (element, index) and the index would clobber the seed
    return lambda s: F.xxhash64(s, F.lit(seed))


def minhash_signature(shingles_col, k: int = 64):
    """k minhashes: min over shingles of xxhash64(shingle, seed_i). The seeded
    xxhash64 family stands in for k independent permutations."""
    return F.array(
        *[F.array_min(F.transform(shingles_col, _seeded_hash(i))) for i in range(k)]
    )


def shingled_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n_shingle: int = 3
) -> DataFrame:
    """(id, sh) with the shingle array MATERIALIZED (persist boundary).

    Load-bearing: the minhash signature references its input 64 times; with a
    plain projection, CollapseProject duplicates the whole shingle expression
    into every transform and each row pays 64x the shingling cost (measured
    ~50x slower end-to-end at sf0.1). A persist()'d InMemoryRelation is a
    boundary the optimizer cannot inline across."""
    # r6: one Python pass replaces the interpreted HOF chain (see
    # shingled_frame; value-identity pinned in pytest)
    return shingled_frame(docs, id_col, text_col, n_shingle).persist()


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 3,
    k: int = 64,
    bands: int = 16,
    shingled: DataFrame | None = None,
    max_bucket_size: int = 1024,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) from banded minhash buckets.
    rows = bands * n_docs exploded; the self-join shuffles on (band, hash).

    ``max_bucket_size`` is the hot-bucket skew guard: a boilerplate page
    shared by 10^6 docs would otherwise put all of them in one bucket and
    emit 10^12 pairs from the self-join. Buckets over the cap switch from
    all-pairs to CHAIN pairing — O(bucket) pairs, ordered by the FULL
    minhash signature (then id) so that members of the same dup cluster sit
    adjacent in the chain even when several distinct clusters band-collide
    into one hot bucket (identical/near-identical docs have identical/
    near-identical signatures; a plain id sort would interleave clusters and
    the cross-cluster chain edges would all fail downstream Jaccard
    verification). Within one cluster the chain keeps it CONNECTED, so
    min-id / connected-component dedup sees the same components; only
    non-adjacent intra-cluster edges are traded away, and verification
    would dedupe those anyway. Caveat (by construction of any O(bucket)
    scheme): two clusters whose signatures interleave exactly at the sort
    boundary can still lose edges — the guard bounds work, it is not an
    exactness guarantee; sub-threshold buckets remain exact. Bounded
    candidate counts are pinned in tests/test_skew.py."""
    from pyspark.sql import Window

    rows_per_band = k // bands
    if shingled is None:
        shingled = shingled_docs(docs, id_col, text_col, n_shingle)
    # (r6 note: an explode + codegen-xxhash64 + 64-way MIN hash-agg
    # formulation of the signature was built and A/B-measured ~15% SLOWER
    # at sf1.0 — the added |shingle|-row explode and 64-buffer aggregate
    # outweigh the interpreted-HOF savings — so the expression form stays)
    sig = shingled.select("id", minhash_signature(F.col("sh"), k).alias("sig")).persist()
    # bands unrolled as a literal F.array (driver-side loop): a
    # transform(sequence(...)) lambda here drops the stage out of codegen and
    # was measured ~70x slower (2.4ms/row interpreted)
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice("sig", b * rows_per_band + 1, rows_per_band), F.lit(b)
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select("id", "bh.band", "bh.bucket")
    # bucket sizes via a COUNT window over the same (band, bucket) key the
    # pair join shuffles on: one shuffle annotates every row with its bucket
    # size in place — the groupBy+rejoin formulation cost two extra stages
    # per run, which at sandbox scale was pure scheduling overhead (~0.5s)
    # and at production scale is an extra co-partitioned join to plan
    sized = banded.withColumn(
        "_bsz", F.count("*").over(Window.partitionBy("band", "bucket"))
    ).persist()
    small = sized.where(F.col("_bsz") <= max_bucket_size)
    pairs_small = (
        small.withColumnRenamed("id", "id_a")
        .join(
            small.select("band", "bucket", F.col("id").alias("id_b")),
            ["band", "bucket"],
        )
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    # the chain branch only enters the plan when a hot bucket actually
    # exists: one cheap reduce over the (persisted-anyway) sized frame —
    # an always-present empty branch cost ~0.6s/run in fixed stage
    # overhead (empty window sort + sig rejoin + union) on the driver bench.
    # NOTE: operator construction is therefore eager (building the plan runs
    # a Spark job), and the branch decision survives cache eviction only
    # because the lineage is deterministic — persist non-deterministic
    # inputs before calling (see lsh note in similarity.py)
    max_seen = sized.agg(F.max("_bsz")).first()[0]
    if max_seen is None or max_seen <= max_bucket_size:
        return pairs_small.distinct()
    # chain order: full signature first (clusters group together), id second
    # (deterministic); hot rows are few, so the sig rejoin is cheap
    w = Window.partitionBy("band", "bucket").orderBy("sig", "id")
    pairs_big = (
        sized.where(F.col("_bsz") > max_bucket_size)
        .join(sig, "id")
        .withColumn("_prev", F.lag("id").over(w))
        .where(F.col("_prev").isNotNull())
        .select(
            F.least("_prev", "id").alias("id_a"),
            F.greatest("_prev", "id").alias("id_b"),
        )
    )
    return pairs_small.unionByName(pairs_big).distinct()


def minhash_lsh_dedup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 3,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    max_bucket_size: int = 1024,
) -> DataFrame:
    """LSH candidates verified with exact shingle Jaccard >= threshold.
    ``max_bucket_size`` passes through to the hot-bucket chain guard in
    :func:`minhash_lsh_candidates`."""
    shingled = shingled_docs(docs, id_col, text_col, n_shingle)
    cands = minhash_lsh_candidates(
        docs, id_col, text_col, n_shingle, k, bands, shingled=shingled,
        max_bucket_size=max_bucket_size,
    )
    a = shingled.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a")
    b = shingled.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ------------------------------------------------- relational n-gram jaccard


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 2,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard over token n-gram sets via inverted-index pair counts —
    no cross join: explode shingles, self-join postings on shingle, count
    shared per pair (map-side combinable), divide by union size. This is
    the fully-relational formulation (and the DuckDB oracle shape).

    ``max_shingle_df`` is the hot-shingle skew guard: one boilerplate shingle
    shared by 10^6 docs would emit ~10^12 postings pairs from the self-join.
    When set, shingles with document frequency above the cutoff are dropped
    from the shingle UNIVERSE (postings and set sizes both), i.e. Jaccard is
    computed over non-boilerplate shingles only — the standard CCNet-style
    cut; such shingles carry negligible discriminative mass. The hot set is
    small by construction, so it is removed with a broadcast anti-join.
    Default None preserves exact full-universe semantics (the oracle shape);
    route corpora with unbounded boilerplate to the minhash path or set a
    cutoff. Bounded pair counts are pinned in tests/test_skew.py."""
    shingled = (
        shingled_frame(docs, id_col, text_col, n_shingle)
        .select("id", F.explode("sh").alias("sh"))
        .distinct()
    )
    if max_shingle_df is not None:
        hot = (
            shingled.groupBy("sh")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") > max_shingle_df)
            .select("sh")
        )
        shingled = shingled.join(F.broadcast(hot), "sh", "left_anti")
    sizes = shingled.groupBy("id").agg(F.count("*").alias("n"))
    a = shingled.withColumnRenamed("id", "id_a")
    b = shingled.withColumnRenamed("id", "id_b")
    shared = (
        a.join(b, "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        shared.join(F.broadcast(na), "id_a")
        .join(F.broadcast(nb), "id_b")
        .withColumn("jaccard", F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "shared", "n_a", "n_b", F.round("jaccard", 6).alias("jaccard"))
    )


# --------------------------------------------------------------------- simhash


def _fnv1a_64_batch(tokens: list[bytes]) -> np.ndarray:
    """FNV-1a 64-bit over a batch of byte strings, vectorized across tokens:
    one numpy pass per *byte position* (max token length iterations) instead
    of one Python iteration per byte. Bit-identical to the scalar fold."""
    n = len(tokens)
    lens = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=n)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    buf = np.frombuffer(b"".join(tokens), dtype=np.uint8)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for pos in range(int(lens.max()) if n else 0):
            active = lens > pos
            idx = starts[active] + pos
            h[active] = (h[active] ^ buf[idx].astype(np.uint64)) * prime
    return h


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per doc: sign of the per-bit sum of token hashes.
    Fully vectorized numpy inside a pandas UDF (Arrow batches): all tokens of
    the batch are hashed in one byte-position-sweep FNV pass, and the per-doc
    bit votes are one ``add.reduceat`` over the batch-wide sign matrix —
    no per-byte or per-bit Python in the hot loop."""
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def simhash(texts: pd.Series) -> pd.Series:
        tok_lists = [t.split() if t else [] for t in texts]
        counts = np.fromiter((len(tl) for tl in tok_lists), dtype=np.int64, count=len(tok_lists))
        out = np.zeros(len(texts), dtype=np.int64)
        nonempty = counts > 0
        if not nonempty.any():
            return pd.Series(out)
        # hash each DISTINCT token once (token streams are Zipf-distributed;
        # per-occurrence hashing re-pays the FNV cost thousands of times)
        codes, uniques = pd.factorize(
            pd.Series([tok for tl in tok_lists for tok in tl]), sort=False
        )
        uh = _fnv1a_64_batch([u.encode("utf-8") for u in uniques])
        # signs_u[u, j] = +1/-1 for bit j of unique token u's hash
        # (byte order forced to little-endian so columns line up with bits
        # 0..63 on any host — a native .view would silently byteswap
        # fingerprints on a big-endian platform)
        bits_u = np.unpackbits(uh.astype("<u8").view(np.uint8), bitorder="little").reshape(-1, 64)
        signs_u = 2 * bits_u.astype(np.int32) - 1
        # per-doc vote fold: gather the sign rows for the doc's token codes
        # and segment-sum (no per-byte or per-bit Python anywhere)
        offset = 0
        for i in np.flatnonzero(nonempty):
            c = counts[i]
            votes = signs_u[codes[offset : offset + c]].sum(axis=0, dtype=np.int64)
            offset += c
            out[i] = np.packbits(votes > 0, bitorder="little").view("<i8")[0]
        return pd.Series(out)

    return docs.select(F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("simhash"))


def simhash_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs with hamming(simhash) <= max_hamming via the 4x16-bit pigeonhole:
    any pair differing in <=3 bits agrees on at least one 16-bit chunk, so the
    chunk-equality join generates all true pairs (then exact popcount filters).

    Fingerprints are persist()ed: both self-join sides reference them, and
    without the boundary each side re-runs the Arrow UDF and re-scans the
    corpus (observed 2x UDF + 4x scan in the physical plan)."""
    fps = simhash_fingerprints(docs, id_col, text_col).persist()
    chunks = fps.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("simhash", c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cv"),
    ).select("id", "simhash", "cv.chunk", "cv.val")
    a = chunks.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("fp_a"), "chunk", "val"
    )
    b = chunks.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("fp_b"), "chunk", "val"
    )
    return (
        a.join(b, ["chunk", "val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "fp_a", "fp_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ------------------------------------------------------------ dup clusters


def dedup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_iters: int = 50,
    method: str = "minlabel",
) -> DataFrame:
    """(doc_id, cluster_id) from pairwise near-dup edges: cluster_id is the
    MIN doc id of the connected component — i.e. the canonical keeper every
    member should collapse to. This is the step that turns any of the
    pairwise dedup operators above (minhash / simhash / ngram / embedding)
    into actionable keep/drop decisions when duplicates form chains
    (A~B, B~C but A!~C must still collapse to one keeper).
    Iterative min-label propagation by default; ``method='star'`` routes
    through the O(log n)-round large-star/small-star contraction for
    long-chain graphs — see :mod:`..operators.graph`."""
    from .graph import connected_components

    cc = connected_components(
        pairs, src=id_a, dst=id_b, max_iters=max_iters, method=method
    )
    return cc.select(
        F.col("entity").alias("doc_id"), F.col("component").alias("cluster_id")
    )


# --------------------------------------------- embedding-cosine near-dup


def embedding_near_dup_keepers(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    method: str = "lsh",
    n_planes: int = 8,
    n_tables: int = 8,
    dim: int = 64,
    max_bucket_size: int = 4096,
) -> DataFrame:
    """Single-pass min-id embedding dedup: drop any vector that has a
    more-senior (lower-id) neighbor with cosine >= threshold; return the
    kept ids.

    ``method='lsh'`` (the DEFAULT and the scale path) generates candidate
    pairs from hyperplane L-table buckets and verifies them with exact cosine
    (:func:`..similarity.cosine_similar_pairs_lsh`): the shuffle key is the
    (table, bucket) id, so the corpus never cross-joins — this is the plan
    that survives 100x the vectors. Per-pair recall at the defaults is 0.988
    at the threshold boundary and ->1.0 as cosine ->1 (true near-dups agree
    on every plane sign); measured recall is pinned in tests/test_dedup.py.
    ``method='brute'`` keeps the O(n^2) cross-join pair scan — exact, used as
    the recall oracle and for tiny inputs."""
    from .similarity import cosine_similar_pairs, cosine_similar_pairs_lsh

    if method == "lsh":
        pairs = cosine_similar_pairs_lsh(
            emb, id_col=id_col, vec_col=vec_col, threshold=threshold,
            n_planes=n_planes, n_tables=n_tables, dim=dim,
            max_bucket_size=max_bucket_size,
        )
    elif method == "brute":
        pairs = cosine_similar_pairs(emb, id_col=id_col, vec_col=vec_col, threshold=threshold)
    else:
        raise ValueError(f"method must be 'lsh' or 'brute', got {method!r}")
    # dominated ids are few: broadcast the anti-join so (a) the corpus never
    # shuffles on vec_id and (b) the O(n^2) pair scan materializes ONCE in
    # the broadcast build instead of once per union branch of the input
    # (Spark distributes a shuffled anti-join over union inputs; observed as
    # a doubled BroadcastNestedLoopJoin subtree in the physical plan)
    dominated = pairs.select(F.col("id_b").alias(id_col)).distinct().persist()
    return emb.join(F.broadcast(dominated), id_col, "left_anti").select(id_col)


def keep_best_in_cluster(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "quality_score",
) -> DataFrame:
    """Quality-aware keeper selection: per duplicate cluster, the keeper is
    the HIGHEST-scoring member (ties to the lowest id) instead of the
    min-id default — the curation rule real pipelines want ("of these five
    near-identical pages, keep the cleanest one"). Input: the
    (id, cluster) table from :func:`dedup_clusters` and any per-doc score
    table (quality_scores, repetition signals, a model score...).

    Output: (id, cluster, score, keeper_id) for every clustered doc —
    join-ready for both keep (id == keeper_id) and drop (!=) decisions.
    One cluster-keyed shuffle; the window frame is the whole (small)
    cluster. Docs in no cluster are absent here (they keep themselves) —
    same contract as dedup_clusters. A clustered doc MISSING from
    ``scores`` (quality computed over a filtered slice) still keeps its
    row: the score join is LEFT, a NULL score sorts after every real one
    (Spark desc is NULLS LAST), and an all-unscored cluster falls back to
    the min-id keeper."""
    from pyspark.sql import Window

    scored = clusters.join(scores.select(id_col, score_col), id_col, "left")
    w = (
        Window.partitionBy(cluster_col)
        .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return scored.select(
        id_col,
        cluster_col,
        score_col,
        F.first(id_col).over(w).alias("keeper_id"),
    )
