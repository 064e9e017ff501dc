"""Connected components / dedup clusters: min-label propagation fixpoint."""

import pytest
from pyspark.sql import functions as F

from gazetteer_entity_parser_spark.operators.dedup import dedup_clusters
from gazetteer_entity_parser_spark.operators.graph import connected_components


def test_components_mixed_topology(spark):
    # triangle {1,2,3}, chain 10-11-12-13 (transitive, no direct 10~13 edge),
    # isolated pair {20,21}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (12, 13), (20, 21)],
        "src bigint, dst bigint",
    )
    got = {r["entity"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}


def test_components_converge_on_long_path(spark):
    """A path graph is the worst case for min-label propagation (label must
    walk the whole diameter); 30 hops must still reach fixpoint."""
    n = 30
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src bigint, dst bigint"
    )
    got = {r["entity"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {i: 0 for i in range(n + 1)}


def test_components_string_labels(spark):
    edges = spark.createDataFrame(
        [("B", "C"), ("A", "B"), ("X", "Y")], "src string, dst string"
    )
    got = {r["entity"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {"A": "A", "B": "A", "C": "A", "X": "X", "Y": "X"}


def test_dedup_clusters_chain_collapses_to_one_keeper(spark):
    """A~B, B~C without A~C (the case pairwise keep/drop rules get wrong)
    must still collapse to one keeper cluster."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "id_a bigint, id_b bigint"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_components_random_graphs_match_union_find(spark):
    """Randomized (seeded) cross-check against a pure-Python union-find on
    sparse random graphs — catches propagation bugs topology-specific tests
    miss (multi-hub merges, late component unions)."""
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n = 40
        edges = [
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < 0.05
        ]
        if not edges:
            continue
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        in_graph = {v for e in edges for v in e}
        expected = {}
        for v in in_graph:
            root = find(v)
            expected[v] = min(u for u in in_graph if find(u) == root)

        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        got = {
            r["entity"]: r["component"] for r in connected_components(df).collect()
        }
        assert got == expected, f"seed {seed}"


def test_components_raise_on_exhausted_iterations(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src bigint, dst bigint"
    )
    with pytest.raises(RuntimeError, match="max_iters"):
        connected_components(edges, max_iters=2)


def test_star_method_matches_minlabel_on_mixed_topology(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (12, 13), (20, 21)],
        "src bigint, dst bigint",
    )
    minlabel = {
        r["entity"]: r["component"] for r in connected_components(edges).collect()
    }
    star = {
        r["entity"]: r["component"]
        for r in connected_components(edges, method="star").collect()
    }
    assert star == minlabel


def test_star_converges_on_1024_path_in_log_rounds(spark):
    """The long-chain case min-label cannot touch: a 2^10-hop path graph
    (diameter 1023) must converge within 2*log2(n) star alternations —
    where min-label at the same budget RAISES."""
    n = 1024
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint"
    )
    budget = 20  # 2 * log2(1024)
    got = {
        r["entity"]: r["component"]
        for r in connected_components(edges, method="star", max_iters=budget).collect()
    }
    assert got == {i: 0 for i in range(n)}
    with pytest.raises(RuntimeError, match="max_iters"):
        connected_components(edges, method="minlabel", max_iters=budget)


def test_star_random_graphs_match_union_find(spark):
    import random

    for seed in (7, 99):
        rng = random.Random(seed)
        n = 40
        edges = [
            (a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < 0.05
        ]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        in_graph = {v for e in edges for v in e}
        expected = {
            v: min(u for u in in_graph if find(u) == find(v)) for v in in_graph
        }
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        got = {
            r["entity"]: r["component"]
            for r in connected_components(df, method="star").collect()
        }
        assert got == expected, f"seed {seed}"


def test_star_string_labels_and_self_loops(spark):
    edges = spark.createDataFrame(
        [("B", "C"), ("A", "B"), ("X", "Y"), ("X", "X")], "src string, dst string"
    )
    got = {
        r["entity"]: r["component"]
        for r in connected_components(edges, method="star").collect()
    }
    assert got == {"A": "A", "B": "A", "C": "A", "X": "X", "Y": "X"}


def test_dedup_clusters_same_under_both_methods_on_minhash_pairs(spark):
    """The driver query's graph (minhash near-dup pairs over the sf0.001
    corpus with planted near-dups): both component formulations must produce
    the identical (doc_id, cluster_id) table the recursive-CTE oracle pins."""
    from gazetteer_entity_parser_spark.operators.dedup import (
        minhash_lsh_dedup_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    copies = docs.where(F.pmod("doc_id", F.lit(10)) == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat("text", F.lit(" zz0 zz1")).alias("text"),
    )
    near = docs.select("doc_id", "text").unionByName(copies)
    pairs = minhash_lsh_dedup_pairs(near, n_shingle=2, threshold=0.5).persist()
    a = {tuple(r) for r in dedup_clusters(pairs).collect()}
    b = {tuple(r) for r in dedup_clusters(pairs, method="star").collect()}
    assert a == b
    assert len(a) > 0


def test_unknown_method_rejected(spark):
    edges = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    with pytest.raises(ValueError, match="method"):
        connected_components(edges, method="bfs")


def test_star_keeps_self_loop_only_vertices(spark):
    """A vertex whose only edges are self-loops is still a graph vertex:
    both methods must return it as a singleton (r4 review finding)."""
    edges = spark.createDataFrame(
        [(1, 2), (9, 9)], "src bigint, dst bigint"
    )
    ml = {tuple(r) for r in connected_components(edges).collect()}
    star = {tuple(r) for r in connected_components(edges, method="star").collect()}
    assert star == ml
    assert (9, 9) in star


# ---------------------------------------------------------------------------
# pagerank (fixed-point weighted)
# ---------------------------------------------------------------------------

def _pagerank_reference(edges, n_iter=10, d_pct=85, scale=1_000_000):
    """Independent driver-side replay of the fixed-point recurrence: same
    integer base, same floor(double) contribution formula."""
    import math
    from collections import defaultdict

    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    wout = defaultdict(int)
    for u, _, w in edges:
        wout[u] += w
    base = scale * (100 - d_pct) // 100
    r = {n: scale for n in nodes}
    for _ in range(n_iter):
        c = defaultdict(int)
        for u, v, w in edges:
            c[v] += math.floor(r[u] * float(d_pct) * float(w) / (100.0 * wout[u]))
        r = {n: base + c.get(n, 0) for n in nodes}
    return r


def test_pagerank_matches_python_reference(spark):
    from gazetteer_entity_parser_spark.operators.graph import pagerank

    edges = [
        ("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "a", 5),
        ("d", "c", 1),  # d is a source-only node (in-degree 0)
        ("b", "e", 1),  # e is dangling (no out-edges)
    ]
    df = spark.createDataFrame(edges, "subj string, obj string, weight bigint")
    got = {r["entity"]: r["rank_fp"] for r in pagerank(df, n_iter=10).collect()}
    assert got == _pagerank_reference(edges, n_iter=10)
    # dangling node keeps only the base seed? No — e RECEIVES from b, it
    # just contributes nothing; d receives nothing so d sits at the base.
    assert got["d"] == 150_000


def test_pagerank_partitioning_independent(spark):
    """Integer sums are associative: reduction order (partition count)
    cannot change a single rank bit."""
    from gazetteer_entity_parser_spark.operators.graph import pagerank

    edges = [(f"n{i}", f"n{(i * 7 + 3) % 20}", (i % 5) + 1) for i in range(60)]
    edges = [(u, v, w) for u, v, w in edges if u != v]
    df = spark.createDataFrame(edges, "subj string, obj string, weight bigint")
    a = {tuple(r) for r in pagerank(df, n_iter=6).collect()}
    b = {tuple(r) for r in pagerank(df.repartition(13), n_iter=6).collect()}
    assert a == b


def test_pagerank_checkpoint_boundary_identical(spark):
    """localCheckpoint truncation must not change values — run the same
    graph with checkpoint_every=2 vs never (checkpoint_every > n_iter)."""
    from gazetteer_entity_parser_spark.operators.graph import pagerank

    edges = [("a", "b", 1), ("b", "c", 1), ("c", "a", 1), ("c", "b", 2)]
    df = spark.createDataFrame(edges, "subj string, obj string, weight bigint")
    a = {tuple(r) for r in pagerank(df, n_iter=5, checkpoint_every=2).collect()}
    b = {tuple(r) for r in pagerank(df, n_iter=5, checkpoint_every=99).collect()}
    assert a == b


def test_pagerank_validates_args(spark):
    from gazetteer_entity_parser_spark.operators.graph import pagerank

    df = spark.createDataFrame([("a", "b", 1)], "subj string, obj string, weight bigint")
    with pytest.raises(ValueError, match="d_pct"):
        pagerank(df, d_pct=0)
    with pytest.raises(ValueError, match="d_pct"):
        pagerank(df, d_pct=100)
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(df, n_iter=0)


def _pagerank_reference_dangling(edges, n_iter=10, d_pct=85, scale=1_000_000):
    """Reference WITH classic dangling-mass redistribution."""
    import math
    from collections import defaultdict

    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    wout = defaultdict(int)
    for u, _, w in edges:
        wout[u] += w
    base = scale * (100 - d_pct) // 100
    r = {n: scale for n in nodes}
    for _ in range(n_iter):
        c = defaultdict(int)
        for u, v, w in edges:
            c[v] += math.floor(r[u] * float(d_pct) * float(w) / (100.0 * wout[u]))
        D = sum(r[n] for n in nodes if n not in wout)
        share = (D * d_pct) // (100 * len(nodes))
        r = {n: base + c.get(n, 0) + share for n in nodes}
    return r


def test_pagerank_dangling_redistribution_matches_reference(spark):
    from gazetteer_entity_parser_spark.operators.graph import pagerank

    edges = [
        ("a", "b", 3), ("b", "c", 2), ("c", "a", 5),
        ("b", "e", 1), ("a", "z", 2),  # e and z are dangling
    ]
    df = spark.createDataFrame(edges, "subj string, obj string, weight bigint")
    got = {
        r["entity"]: r["rank_fp"]
        for r in pagerank(df, n_iter=7, redistribute_dangling=True).collect()
    }
    assert got == _pagerank_reference_dangling(edges, n_iter=7)
    # the dangling share must actually be non-zero on this graph
    plain = {r["entity"]: r["rank_fp"] for r in pagerank(df, n_iter=7).collect()}
    assert got != plain


def test_pagerank_dangling_noop_when_no_dangling_nodes(spark):
    from gazetteer_entity_parser_spark.operators.graph import pagerank

    edges = [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)]
    df = spark.createDataFrame(edges, "subj string, obj string, weight bigint")
    a = {tuple(r) for r in pagerank(df, n_iter=5).collect()}
    b = {
        tuple(r)
        for r in pagerank(df, n_iter=5, redistribute_dangling=True).collect()
    }
    assert a == b
