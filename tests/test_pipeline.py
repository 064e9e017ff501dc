"""Pipeline E2E on sf0.001: triples P/R vs the kernel-derived oracle must be
1.0 (north_rule: ≥0.95), text stays byte-identical per url, and checkpoint
replay is idempotent."""

import shutil

import pytest
from pyspark.sql import functions as F

from gazetteer_entity_parser_spark.kernel import Parser
from gazetteer_entity_parser_spark.operators.extract import iter_windows
from gazetteer_entity_parser_spark.plans.pipeline import (
    PipelineConfig,
    docs_from_sf_dir,
    replay_buckets,
    run_pipeline,
)

CFG = PipelineConfig(n_entities=20, threshold=1.0, window_tokens=10, n_buckets=8)


@pytest.fixture(scope="module")
def result(spark, sf_smoke, tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("pipeline"))
    docs = docs_from_sf_dir(spark, sf_smoke)
    return run_pipeline(spark, docs, workdir, CFG), docs, workdir


def kernel_triples(parser: Parser, pages, window_tokens):
    """Driver-side oracle: kernel mentions -> within-window ordered pairs."""
    expected = {}
    for url, text in pages:
        for sent_idx, _off, base_tok, window, toks in iter_windows(text, window_tokens):
            from bisect import bisect_right

            starts = [s for s, _e, _t in toks]
            ms = [
                (base_tok + bisect_right(starts, pv.range[0]) - 1, pv.resolved_value.resolved)
                for pv in parser.run(window, 0)
            ]
            ms.sort()
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    key = (ms[i][1], "co_occurs_with", ms[j][1])
                    expected[key] = expected.get(key, 0) + 1
    return expected


def test_triples_match_kernel_oracle(spark, result):
    res, docs, _ = result
    pages = [(r["url"], r["text"]) for r in docs.select("url", "text").collect()]
    expected = kernel_triples(res["parser"], pages, CFG.window_tokens)

    actual = {
        (r["subj"], r["pred"], r["obj"]): r["weight"] for r in res["triples"].collect()
    }
    # P/R both 1.0: exact dict equality including weights
    assert actual == expected
    assert len(actual) > 0


def test_text_byte_identical_per_url(spark, result, sf_smoke):
    _res, docs, _ = result
    raw = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        F.concat(F.lit("https://example.org/"), "source", F.lit("/"), "doc_id").alias("url"),
        F.col("text").alias("orig"),
    )
    joined = docs.join(raw, "url")
    assert joined.where(F.col("text") != F.col("orig")).count() == 0
    assert joined.count() == docs.count()


def test_mentions_slice_text(spark, result):
    res, docs, _ = result
    texts = {r["url"]: r["text"] for r in docs.select("url", "text").collect()}
    for r in res["mentions"].collect():
        assert texts[r["url"]][r["begin"] : r["end"]] == r["matched_value"]


def test_lineage_covers_all_buckets(spark, result):
    res, _docs, _ = result
    lineage = spark.read.parquet(res["lineage_path"]).collect()
    mention_rows = [r for r in lineage if r["stage"] == "mentions"]
    triple_rows = [r for r in lineage if r["stage"] == "triples"]
    assert sum(r["output_rows"] for r in mention_rows) == res["mentions"].count()
    assert len(triple_rows) > 0  # stage-C lineage present per bucket
    assert {r["stage"] for r in lineage} == {"mentions", "triples"}


def test_checkpoint_replay_idempotent(spark, result):
    res, docs, workdir = result
    mentions_before = sorted(
        map(tuple, res["mentions"].drop("alternatives").collect())
    )
    lineage_before = sorted(
        map(
            tuple,
            spark.read.parquet(res["lineage_path"])
            .where(F.col("stage") == "mentions")
            .collect(),
        )
    )

    # destroy one bucket's checkpoint, then replay just that bucket
    shutil.rmtree(f"{res['mentions_path']}/bucket=3")
    assert spark.read.parquet(res["mentions_path"]).count() < len(mentions_before)

    replay_buckets(spark, docs, workdir, [3], CFG, parser=res["parser"])
    mentions_after = sorted(
        map(tuple, spark.read.parquet(res["mentions_path"]).drop("alternatives").collect())
    )
    assert mentions_after == mentions_before

    # lineage recomputed over the replayed checkpoint matches the original
    from gazetteer_entity_parser_spark.plans.pipeline import lineage_for

    lineage_after = sorted(
        map(
            tuple,
            lineage_for(spark.read.parquet(res["mentions_path"]), "mentions").collect(),
        )
    )
    assert lineage_after == lineage_before
