"""Skew handling: a giant page must flow through windowed extraction without
one task absorbing the whole document's quadratic cost, and salted
repartition must spread hot url prefixes."""

import pytest
from pyspark.sql import functions as F

from gazetteer_entity_parser_spark.operators.extract import extract_mentions, iter_windows
from gazetteer_entity_parser_spark.sources.builder_job import (
    broadcast_parser,
    build_parser_distributed,
    prepend_and_rebroadcast,
)
from gazetteer_entity_parser_spark.sources.gazetteer import literal_gazetteer


def test_giant_page_windows_bound_kernel_calls():
    # 200k-token page -> 20k windows of <=10 tokens; per-call state is bounded
    text = " ".join("tok%d" % (i % 50) for i in range(200_000))
    windows = list(iter_windows(text, 10))
    assert len(windows) == 20_000
    assert all(len(toks) <= 10 for _s, _o, _b, _w, toks in windows)
    # token ordinals are globally consecutive
    assert windows[-1][2] == 199_990


def test_giant_page_extraction(spark):
    gaz = literal_gazetteer(spark, [("tok1", "TOK1"), ("tok2 tok3", "TOK23")])
    bc = broadcast_parser(spark, build_parser_distributed(gaz, threshold=1.0))
    giant = " ".join("tok%d" % (i % 50) for i in range(100_000))
    docs = spark.createDataFrame(
        [("giant", giant)] + [(f"u{i}", "tok1 tok2 tok3") for i in range(50)],
        "url string, text string",
    )
    out = extract_mentions(docs, bc, window_tokens=10, num_partitions=8)
    counts = {r["url"]: r["cnt"] for r in out.groupBy("url").agg(F.count("*").alias("cnt")).collect()}
    assert counts["giant"] == 2000 + 2000  # tok1 every 50 tokens; tok2-tok3 pairs
    assert counts["u0"] == 2


def test_prepend_and_rebroadcast(spark):
    gaz = literal_gazetteer(spark, [("the stones", "Old Stones")])
    bc = broadcast_parser(spark, build_parser_distributed(gaz, threshold=1.0))
    bc2 = prepend_and_rebroadcast(spark, bc, [("the stones", "New Stones")])
    out = bc2.value.run("play the stones", 1)
    assert out[0].resolved_value.resolved == "New Stones"
    assert [a.resolved for a in out[0].alternatives] == ["Old Stones"]
    # ranks rebased: old entity now rank 1
    assert bc2.value.registry.entity_rank == [1, 0]
