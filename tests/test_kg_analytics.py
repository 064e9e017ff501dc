"""Edge PMI, ranked adjacency, and gazetteer entity resolution — the
round-5 KG-analytics family (operators/triples.py, operators/entity_resolution.py)."""

import math

import pytest

from gazetteer_entity_parser_spark.operators.entity_resolution import (
    resolve_similar_values,
)
from gazetteer_entity_parser_spark.operators.triples import (
    edge_pmi,
    entity_neighbors_topk,
)

TRIPLES = [
    ("a", "b", 10),
    ("a", "c", 1),
    ("b", "c", 4),
    ("c", "a", 2),
    ("b", "a", 3),
]


def _triples_df(spark):
    return spark.createDataFrame(TRIPLES, "subj string, obj string, weight bigint")


def test_edge_pmi_matches_closed_form(spark):
    T = sum(w for _, _, w in TRIPLES)
    ws = {}
    wo = {}
    for s, o, w in TRIPLES:
        ws[s] = ws.get(s, 0) + w
        wo[o] = wo.get(o, 0) + w
    expect = {
        (s, o): round(math.log(w * float(T) / (float(ws[s]) * float(wo[o]))), 6)
        for s, o, w in TRIPLES
    }
    got = {
        (r["subj"], r["obj"]): r["pmi"] for r in edge_pmi(_triples_df(spark)).collect()
    }
    assert got == pytest.approx(expect)


def test_edge_pmi_rare_but_exclusive_pair_beats_popular_pair(spark):
    """The semantic point of the filter: an edge between two entities that
    only ever co-occur with each other outranks a heavier edge between
    ubiquitous entities."""
    rows = [
        ("hub", "x", 50),
        ("hub", "y", 50),
        ("x", "hub", 40),
        ("rare1", "rare2", 2),
    ]
    df = spark.createDataFrame(rows, "subj string, obj string, weight bigint")
    got = {(r["subj"], r["obj"]): r["pmi"] for r in edge_pmi(df).collect()}
    assert got[("rare1", "rare2")] > got[("hub", "x")]


def test_entity_neighbors_merges_directions_and_breaks_ties_by_name(spark):
    got = {
        (r["entity"], r["rk"]): (r["neighbor"], r["weight"])
        for r in entity_neighbors_topk(_triples_df(spark), k=2).collect()
    }
    # a<->b: 10+3=13, a<->c: 1+2=3, b<->c: 4
    assert got[("a", 1)] == ("b", 13)
    assert got[("a", 2)] == ("c", 3)
    assert got[("b", 1)] == ("a", 13)
    assert got[("b", 2)] == ("c", 4)
    assert got[("c", 1)] == ("b", 4)
    assert got[("c", 2)] == ("a", 3)


def test_entity_neighbors_k_prunes_and_tiebreak_is_lexicographic(spark):
    rows = [("q", "zz", 5), ("q", "aa", 5), ("q", "mm", 5), ("q", "bb", 9)]
    df = spark.createDataFrame(rows, "subj string, obj string, weight bigint")
    got = [
        (r["rk"], r["neighbor"])
        for r in entity_neighbors_topk(df, k=3).where("entity = 'q'").collect()
    ]
    assert sorted(got) == [(1, "bb"), (2, "aa"), (3, "mm")]


# ---------------------------------------------------------------------------
# entity resolution (blocked Levenshtein)
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


GAZ = [
    ("analysis", "Analysis"),
    ("analyis", "AnalysisTypo"),  # distance 1 from analysis, different entity
    ("analysts", "Analysts"),  # distance 2 from analysis
    ("banana", "Banana"),
    ("bananna", "Banana"),  # same entity -> excluded by default
    ("zebra", "Zebra"),
]


def _gaz_df(spark):
    return spark.createDataFrame(GAZ, "raw_value string, resolved_value string")


def test_resolution_matches_brute_force_within_block(spark):
    got = {
        (r["value_a"], r["value_b"]): r["distance"]
        for r in resolve_similar_values(_gaz_df(spark), max_distance=2).collect()
    }
    expect = {}
    for va, ea in GAZ:
        for vb, eb in GAZ:
            if va < vb and va[0] == vb[0] and ea != eb and _lev(va, vb) <= 2:
                expect[(va, vb)] = _lev(va, vb)
    assert got == expect
    assert ("analyis", "analysis") in got  # the typo pair made it through


def test_resolution_same_entity_pairs_excluded_by_default(spark):
    got = resolve_similar_values(_gaz_df(spark), max_distance=2).collect()
    assert all(r["entity_a"] != r["entity_b"] for r in got)
    with_same = resolve_similar_values(
        _gaz_df(spark), max_distance=2, exclude_same_entity=False
    ).collect()
    assert any(r["entity_a"] == r["entity_b"] for r in with_same)


def test_resolution_blocking_is_first_char(spark):
    """Documented recall trade: a FIRST-character typo escapes the block."""
    df = spark.createDataFrame(
        [("cat", "Cat"), ("bat", "Bat")], "raw_value string, resolved_value string"
    )
    assert resolve_similar_values(df, max_distance=1).count() == 0


def test_resolution_validates_distance(spark):
    with pytest.raises(ValueError, match="max_distance"):
        resolve_similar_values(_gaz_df(spark), max_distance=0)
