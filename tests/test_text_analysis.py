"""Text-analysis operator tests."""

import pytest

from gazetteer_entity_parser_spark.operators.text_analysis import (
    language_id,
    quality_scores,
    rolling_fingerprint,
    token_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox, version 2.0!"),
            (2, ""),
            (3, "le chat est sur la table et il dort"),
            (4, "el perro es un animal y la casa es grande para que"),
            (5, "der hund ist ein tier und die katze ist mit von"),
            (6, "一个 中文 文本 例子 一个 中文 文本 例子 一个 中文"),
            (7, "xqz vbn mlk"),
        ],
        "doc_id bigint, text string",
    )


def test_token_stats(spark, docs):
    rows = {r["doc_id"]: r for r in token_stats(docs).collect()}
    assert rows[1]["n_ws_tokens"] == 6
    assert rows[1]["n_word_pieces"] == 7  # the quick brown fox version 2 0
    assert rows[2]["n_ws_tokens"] == 0
    assert rows[2]["n_chars"] == 0


def test_quality_scores_ranges(spark, docs):
    for r in quality_scores(docs).collect():
        assert 0.0 <= r["quality_score"] <= 1.0
        assert 0.0 <= r["punct_ratio"] <= 1.0
        assert 0.0 <= r["stopword_ratio"] <= 1.0
    rows = {r["doc_id"]: r for r in quality_scores(docs).collect()}
    # doc 1 contains stopwords + punctuation; doc 7 has neither
    assert rows[1]["stopword_ratio"] > 0
    assert rows[7]["stopword_ratio"] == 0.0
    assert rows[1]["punct_ratio"] > rows[7]["punct_ratio"]


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r["fingerprint"] for r in rolling_fingerprint(df).collect()}
    assert rows[1] == rows[3]
    assert rows[1] != rows[2]


def test_language_id(spark, docs):
    rows = {r["doc_id"]: r["predicted_lang"] for r in language_id(docs).collect()}
    assert rows[1] == "en"
    assert rows[3] == "fr"
    assert rows[4] == "es"
    assert rows[5] == "de"
    assert rows[6] == "zh"
    assert rows[7] == "und"
    assert rows[2] == "und"


def test_language_id_pure_codegen_plan(spark, docs):
    """r2 ADVICE: language ID had the last removable pandas UDF. It is now
    pure built-in expressions — the physical plan must contain no Python
    evaluation node of any kind."""
    plan = language_id(docs)._jdf.queryExecution().executedPlan().toString()
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert node not in plan, node


def test_language_id_tie_breaks_alphabetically(spark):
    """Equal hit counts resolve to the alphabetically-first language (the
    reference Python loop scanned sorted(profiles) with strict >)."""
    df = spark.createDataFrame(
        [(1, "the der"), (2, "que que"), (3, None)],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r["predicted_lang"] for r in language_id(df).collect()}
    assert rows[1] == "de"  # en=1, de=1 -> de (sorted first at the max)
    assert rows[2] == "es"  # 'que' is in es AND fr -> es wins the tie
    assert rows[3] == "und"  # null text


def test_language_id_unicode_whitespace(spark):
    """NBSP-separated words (decoded &nbsp;) must still tokenize — Java \\s is
    ASCII-only without (?U), which silently misclassified such docs as und."""
    df = spark.createDataFrame(
        [(1, "le chat est sur la table et il")],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r["predicted_lang"] for r in language_id(df).collect()}
    assert rows[1] == "fr"
