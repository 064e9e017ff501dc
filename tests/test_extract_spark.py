"""Spark-parity: the mapInPandas extraction stage must emit exactly what the
kernel emits per document (SURVEY.md §5.2)."""

import pytest

from gazetteer_entity_parser_spark.kernel import ParserBuilder, tokenize
from gazetteer_entity_parser_spark.operators.extract import (
    extract_mentions,
    iter_windows,
    split_sentences,
)

GAZ = [
    ("king of pop", "Michael Jackson"),
    ("the rolling stones", "The Rolling Stones"),
    ("the crying stones", "The Crying Stones"),
    ("the fab four", "The Beatles"),
    ("queen of soul", "Aretha Franklin"),
]

DOCS = [
    ("u1", "My favourite artists are the stones and fab four"),
    ("u2", "the king of pop beats the queen of soul. the fab four beat the crying stones!"),
    ("u3", "nothing to see here"),
    ("u4", ""),
    ("u5", "дра नमस्ते the stones épatant"),
]


def kernel_expected(parser, docs, window_tokens=None, max_alternatives=5):
    rows = []
    for url, text in docs:
        if not text:
            continue
        for sent_idx, char_off, base_tok, window, toks in iter_windows(text, window_tokens):
            starts = [s for s, _e, _t in toks]
            from bisect import bisect_right

            for pv in parser.run(window, max_alternatives):
                rows.append(
                    (
                        url,
                        sent_idx,
                        base_tok + bisect_right(starts, pv.range[0]) - 1,
                        char_off + pv.range[0],
                        char_off + pv.range[1],
                        pv.matched_value,
                        pv.resolved_value.resolved,
                        pv.resolved_value.raw_value,
                        tuple(a.resolved for a in pv.alternatives),
                    )
                )
    return sorted(rows)


@pytest.fixture(scope="module")
def parser():
    return ParserBuilder().set_gazetteer(GAZ).minimum_tokens_ratio(2.0 / 3.0).build()


def spark_mentions(spark, parser, docs, window_tokens):
    bc = spark.sparkContext.broadcast(parser)
    df = spark.createDataFrame(docs, "url string, text string")
    out = extract_mentions(
        df, bc, max_alternatives=5, window_tokens=window_tokens, num_partitions=4
    ).collect()
    return sorted(
        (
            r["url"],
            r["sent_idx"],
            r["tok_idx"],
            r["begin"],
            r["end"],
            r["matched_value"],
            r["resolved"],
            r["raw_value"],
            tuple(a["resolved"] for a in r["alternatives"]),
        )
        for r in out
    )


def test_extract_matches_kernel_no_windowing(spark, parser):
    assert spark_mentions(spark, parser, DOCS, None) == kernel_expected(parser, DOCS, None)


def test_extract_matches_kernel_with_windows(spark, parser):
    assert spark_mentions(spark, parser, DOCS, 4) == kernel_expected(parser, DOCS, 4)


def test_mention_offsets_slice_original_text(spark, parser):
    """Doc-global char offsets must slice the original text to the matched
    value (input_hint: byte-identical text per url)."""
    texts = dict(DOCS)
    bc = spark.sparkContext.broadcast(parser)
    df = spark.createDataFrame(DOCS, "url string, text string")
    for r in extract_mentions(df, bc, max_alternatives=0, window_tokens=10).collect():
        assert texts[r["url"]][r["begin"] : r["end"]] == r["matched_value"]


def test_split_sentences_offsets():
    text = "One two. Three four! Five"
    assert split_sentences(text) == [(0, "One two. "), (9, "Three four! "), (21, "Five")]
    # offsets slice back to the original
    for off, sent in split_sentences(text):
        assert text[off : off + len(sent)] == sent


def test_iter_windows_token_ordinals():
    text = "a b c d e f g. h i j"
    seen = []
    for sent_idx, char_off, base_tok, window, toks in iter_windows(text, 3):
        seen.append((sent_idx, base_tok, [t for _s, _e, t in toks]))
        # rebased spans slice the window
        for s, e, t in toks:
            assert window[s:e] == t
    assert seen == [
        (0, 0, ["a", "b", "c"]),
        (1, 3, ["d", "e", "f"]),
        (2, 6, ["g."]),
        (3, 7, ["h", "i", "j"]),
    ]


def test_extract_mentions_column_projection(spark):
    """columns= must equal full output + .select() (Catalyst cannot prune
    through the mapInPandas boundary, so the projection happens in the UDF)."""
    import pytest
    from pyspark.sql import functions as F

    from gazetteer_entity_parser_spark.plans.pipeline import docs_from_sf_dir
    from gazetteer_entity_parser_spark.sources.builder_job import (
        broadcast_parser,
        build_parser_distributed,
    )
    from gazetteer_entity_parser_spark.sources.gazetteer import alias_gazetteer

    docs = docs_from_sf_dir(spark, "/root/testdata/sf0.001").limit(40)
    gaz = alias_gazetteer(docs.select("text"), 20)
    bc = broadcast_parser(
        spark, build_parser_distributed(gaz, 0.6, 2, ["hello"])
    )
    narrow_cols = ["url", "sent_idx", "tok_idx", "resolved", "rank"]
    full = (
        extract_mentions(docs, bc, window_tokens=10)
        .select(*narrow_cols)
        .collect()
    )
    narrow = extract_mentions(docs, bc, window_tokens=10, columns=narrow_cols).collect()
    assert sorted(map(tuple, narrow)) == sorted(map(tuple, full))
    with pytest.raises(ValueError, match="unknown mention columns"):
        extract_mentions(docs, bc, columns=["nope"]).collect()
