"""Streaming pipeline: availableNow stream over the same pages must produce
the same canonical triples as the batch pipeline, and the windowed mention
rollup must respect watermark semantics."""

import pytest
from pyspark.sql import functions as F

from gazetteer_entity_parser_spark.operators.extract import extract_mentions
from gazetteer_entity_parser_spark.operators.triples import (
    canonicalize_triples,
    cooccurrence_triples,
)
from gazetteer_entity_parser_spark.plans.pipeline import docs_from_sf_dir
from gazetteer_entity_parser_spark.sources.builder_job import (
    broadcast_parser,
    build_parser_distributed,
)
from gazetteer_entity_parser_spark.sources.gazetteer import vocabulary_gazetteer
from gazetteer_entity_parser_spark.streaming.stream import (
    mention_rate_per_window,
    read_webpage_stream,
    start_triples_stream,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages(spark):
    return docs_from_sf_dir(spark, SF).limit(60).cache()


@pytest.fixture(scope="module")
def parser_bc(spark, pages):
    gaz = vocabulary_gazetteer(pages.select("text"), 20)
    return broadcast_parser(spark, build_parser_distributed(gaz, threshold=1.0))


def test_stream_equals_batch(spark, pages, parser_bc, tmp_path):
    input_dir = str(tmp_path / "pages_in")
    # several files so maxFilesPerTrigger yields multiple micro-batches
    pages.repartition(5).write.parquet(input_dir)

    triples_path = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt")
    stream = read_webpage_stream(spark, input_dir, max_files=2)
    q = start_triples_stream(spark, stream, parser_bc, triples_path, ckpt)
    q.awaitTermination(120)

    streamed = {
        (r["subj"], r["obj"]): r["weight"]
        for r in spark.read.parquet(triples_path).collect()
    }
    batch = {
        (r["subj"], r["obj"]): r["weight"]
        for r in canonicalize_triples(
            cooccurrence_triples(extract_mentions(pages, parser_bc, window_tokens=10))
        ).collect()
    }
    # micro-batch boundaries never split a document, so the merged totals match
    assert streamed == batch


def test_stateful_running_totals(spark, pages, parser_bc, tmp_path):
    from gazetteer_entity_parser_spark.streaming.stream import running_entity_totals

    input_dir = str(tmp_path / "pages_in")
    pages.repartition(4).write.parquet(input_dir)
    stream = read_webpage_stream(spark, input_dir, max_files=1)  # several batches
    mentions = extract_mentions(stream, parser_bc, window_tokens=10)
    q = running_entity_totals(
        mentions, str(tmp_path / "ckpt"), str(tmp_path / "totals")
    )
    q.awaitTermination(120)

    rows = spark.read.parquet(str(tmp_path / "totals")).collect()
    totals = {}
    for r in rows:
        totals[r["resolved"]] = max(totals.get(r["resolved"], 0), r["n_mentions"])

    batch = {
        r["resolved"]: r["cnt"]
        for r in extract_mentions(pages, parser_bc, window_tokens=10)
        .groupBy("resolved")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert totals == batch


def test_mention_rate_window(spark, pages, parser_bc):
    mentions = extract_mentions(pages, parser_bc, window_tokens=10)
    with_ts = mentions.join(pages.select("url", "warc_ts"), "url")
    out = mention_rate_per_window(with_ts, "10 minutes", "10 minutes").collect()
    assert len(out) > 0
    total = sum(r["n_mentions"] for r in out)
    assert total == mentions.count()
    for r in out:
        assert (r["window_end"] - r["window_start"]).total_seconds() == 600


def test_merge_commit_token_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-merging an already-committed batch_id
    must be a no-op (no double-counted additive weights)."""
    from gazetteer_entity_parser_spark.sources.sinks import (
        committed_tokens,
        merge_into_parquet,
    )

    target = str(tmp_path / "triples_store")
    batch = spark.createDataFrame(
        [("A", "co_occurs_with", "B", 3, 0, 1)],
        "subj string, pred string, obj string, weight bigint, "
        "subj_rank bigint, obj_rank bigint",
    )
    assert merge_into_parquet(spark, target, batch, commit_token="0") is True
    # retry of the same batch: skipped
    assert merge_into_parquet(spark, target, batch, commit_token="0") is False
    # a new batch merges additively and carries prior markers forward
    assert merge_into_parquet(spark, target, batch, commit_token="1") is True
    assert committed_tokens(target) == {"0", "1"}
    row = spark.read.parquet(target).collect()[0]
    assert row["weight"] == 6
    assert merge_into_parquet(spark, target, batch, commit_token="1") is False
    assert spark.read.parquet(target).collect()[0]["weight"] == 6


def test_stream_restart_resumes_from_checkpoint(spark, pages, parser_bc, tmp_path):
    """north_rule: resumable from checkpoint. Stop the stream after the first
    tranche of files, add more, restart with the SAME checkpoint — already-
    committed batches must not be re-merged (no double counts) and the final
    totals must equal the batch pipeline over all pages."""
    first = pages.limit(30).cache()
    rest = pages.subtract(first)

    input_dir = str(tmp_path / "pages_in")
    triples_path = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt")

    first.repartition(2).write.mode("append").parquet(input_dir)
    q1 = start_triples_stream(
        spark, read_webpage_stream(spark, input_dir, max_files=1),
        parser_bc, triples_path, ckpt,
    )
    q1.awaitTermination(120)
    after_first = {
        (r["subj"], r["obj"]): r["weight"]
        for r in spark.read.parquet(triples_path).collect()
    }

    # new files arrive while the stream is down; restart from the checkpoint
    rest.repartition(2).write.mode("append").parquet(input_dir)
    q2 = start_triples_stream(
        spark, read_webpage_stream(spark, input_dir, max_files=1),
        parser_bc, triples_path, ckpt,
    )
    q2.awaitTermination(120)

    streamed = {
        (r["subj"], r["obj"]): r["weight"]
        for r in spark.read.parquet(triples_path).collect()
    }
    batch = {
        (r["subj"], r["obj"]): r["weight"]
        for r in canonicalize_triples(
            cooccurrence_triples(extract_mentions(pages, parser_bc, window_tokens=10))
        ).collect()
    }
    assert streamed == batch
    # the restart added the new pages' weight on top of the first tranche
    assert sum(streamed.values()) > sum(after_first.values())


def _bucket_files(store: str) -> dict:
    """{bucket_dir: {filename: md5}} of the store's CURRENT version."""
    import hashlib
    import os

    real = os.path.realpath(store)
    out = {}
    for entry in sorted(os.listdir(real)):
        if entry.startswith("bucket="):
            files = {}
            for f in sorted(os.listdir(os.path.join(real, entry))):
                p = os.path.join(real, entry, f)
                files[f] = hashlib.md5(open(p, "rb").read()).hexdigest()
            out[entry] = files
    return out


def test_merge_rewrites_only_touched_partitions(spark, tmp_path):
    """Scale contract (r2 verdict #3): a merge must rewrite only the
    partitions its updates hash into; every untouched bucket's files stay
    byte-identical (hard-linked, same names, same content)."""
    import os

    from gazetteer_entity_parser_spark.sources.sinks import merge_into_parquet

    target = str(tmp_path / "store")
    seed = spark.createDataFrame(
        [(f"E{i}", "co_occurs_with", f"F{i}", 1, 0, 1) for i in range(64)],
        "subj string, pred string, obj string, weight bigint, "
        "subj_rank bigint, obj_rank bigint",
    )
    assert merge_into_parquet(spark, target, seed, commit_token="0", n_buckets=8)
    before = _bucket_files(target)
    assert len(before) > 2  # 64 subjects spread over several of 8 buckets

    one = spark.createDataFrame(
        [("E0", "co_occurs_with", "F0", 5, 0, 1)],
        "subj string, pred string, obj string, weight bigint, "
        "subj_rank bigint, obj_rank bigint",
    )
    assert merge_into_parquet(spark, target, one, commit_token="1", n_buckets=8)
    after = _bucket_files(target)
    assert set(after) == set(before)

    from pyspark.sql import functions as F2
    touched_bucket = "bucket=%d" % (
        one.select(F2.pmod(F2.xxhash64("subj"), F2.lit(8)).cast("int")).collect()[0][0]
    )
    changed = [b for b in before if before[b] != after[b]]
    assert changed == [touched_bucket]
    for b in before:
        if b != touched_bucket:
            assert after[b] == before[b]  # same file names AND same bytes

    # semantics: the additive upsert folded into the touched partition
    rows = {
        r["subj"]: r["weight"] for r in spark.read.parquet(target).collect()
    }
    assert rows["E0"] == 6 and rows["E1"] == 1 and len(rows) == 64

    # the target is a symlink: publishing is one atomic rename (no window
    # where the store is absent — r2 ADVICE medium)
    assert os.path.islink(target)


def test_merge_crash_recovery_repoints_newest_version(spark, tmp_path):
    """A crash that loses the symlink (the old two-rename hazard) must be
    self-healing: the next call repoints at the newest version dir and the
    commit-token skip logic still sees prior tokens."""
    import os

    from gazetteer_entity_parser_spark.sources.sinks import (
        committed_tokens,
        merge_into_parquet,
    )

    target = str(tmp_path / "store")
    batch = spark.createDataFrame(
        [("A", "p", "B", 3, 0, 1)],
        "subj string, pred string, obj string, weight bigint, "
        "subj_rank bigint, obj_rank bigint",
    )
    assert merge_into_parquet(spark, target, batch, commit_token="0")
    assert merge_into_parquet(spark, target, batch, commit_token="1")
    os.unlink(target)  # simulated crash: link gone, version dirs remain
    assert committed_tokens(target) == {"0", "1"}  # recovery on entry
    assert merge_into_parquet(spark, target, batch, commit_token="1") is False
    assert spark.read.parquet(target).collect()[0]["weight"] == 6


def test_merge_migrates_legacy_unpartitioned_store(spark, tmp_path):
    """A pre-versioning store (plain parquet dir) is folded into the
    partitioned layout on its first merge; weights stay additive."""
    import os

    from gazetteer_entity_parser_spark.sources.sinks import merge_into_parquet

    target = str(tmp_path / "store")
    legacy = spark.createDataFrame(
        [("A", "p", "B", 3, 0, 1), ("C", "p", "D", 2, 0, 1)],
        "subj string, pred string, obj string, weight bigint, "
        "subj_rank bigint, obj_rank bigint",
    )
    legacy.write.parquet(target)  # old layout: real dir, no buckets
    assert not os.path.islink(target)

    batch = spark.createDataFrame(
        [("A", "p", "B", 1, 0, 1)],
        "subj string, pred string, obj string, weight bigint, "
        "subj_rank bigint, obj_rank bigint",
    )
    assert merge_into_parquet(spark, target, batch, commit_token="m0")
    assert os.path.islink(target)
    rows = {r["subj"]: r["weight"] for r in spark.read.parquet(target).collect()}
    assert rows == {"A": 4, "C": 2}
    # a later n_buckets override is ignored in favor of the store marker
    assert merge_into_parquet(spark, target, batch, commit_token="m1", n_buckets=4)
    rows = {r["subj"]: r["weight"] for r in spark.read.parquet(target).collect()}
    assert rows == {"A": 5, "C": 2}


def test_recovery_never_promotes_torn_version(spark, tmp_path):
    """A version dir without its _nbuckets_ completeness marker (crash
    mid-write) must never be promoted by recovery — on a first-ever merge
    the store stays absent and the retry re-merges from scratch; on a later
    merge the previous complete version stays current."""
    import os

    from gazetteer_entity_parser_spark.sources.sinks import (
        committed_tokens,
        merge_into_parquet,
    )

    target = str(tmp_path / "store")
    batch = spark.createDataFrame(
        [("A", "p", "B", 3, 0, 1)],
        "subj string, pred string, obj string, weight bigint, "
        "subj_rank bigint, obj_rank bigint",
    )
    # simulate a torn FIRST merge: data written, no marker, no symlink
    torn = f"{target}.v-000000-deadbeef"
    batch.write.parquet(torn)
    assert committed_tokens(target) == set()  # recovery must NOT promote torn
    assert not os.path.exists(target)
    # the retry merges cleanly and supersedes the orphan
    assert merge_into_parquet(spark, target, batch, commit_token="0") is True
    assert os.path.islink(target)
    assert not os.path.exists(torn)  # orphan pruned
    assert spark.read.parquet(target).collect()[0]["weight"] == 3

    # simulate a torn LATER merge: orphan version newer than current
    torn2 = f"{target}.v-999999-deadbeef"
    batch.write.parquet(torn2)
    os.unlink(target)  # crash also lost the symlink
    assert committed_tokens(target) == {"0"}  # repointed to newest COMPLETE
    assert spark.read.parquet(target).collect()[0]["weight"] == 3


def test_merge_into_refuses_commit_token_on_iceberg(spark, monkeypatch):
    import pytest as _pytest

    from gazetteer_entity_parser_spark.sources import sinks

    monkeypatch.setattr(sinks, "iceberg_available", lambda _s: True)
    batch = spark.createDataFrame(
        [("A", "p", "B", 3, 0, 1)],
        "subj string, pred string, obj string, weight bigint, "
        "subj_rank bigint, obj_rank bigint",
    )
    with _pytest.raises(NotImplementedError, match="commit_token"):
        sinks.merge_into(spark, "cat.db.triples", batch, commit_token="7")


def test_empty_first_merge_does_not_poison_store(spark, tmp_path):
    """An empty first batch must not publish a data-less version dir (which
    every later read would fail to infer a schema from)."""
    import os

    from gazetteer_entity_parser_spark.sources.sinks import merge_into_parquet

    target = str(tmp_path / "store")
    schema = (
        "subj string, pred string, obj string, weight bigint, "
        "subj_rank bigint, obj_rank bigint"
    )
    empty = spark.createDataFrame([], schema)
    assert merge_into_parquet(spark, target, empty, commit_token="0") is True
    assert not os.path.exists(target)  # nothing published, nothing poisoned

    batch = spark.createDataFrame([("A", "p", "B", 3, 0, 1)], schema)
    assert merge_into_parquet(spark, target, batch, commit_token="1") is True
    assert spark.read.parquet(target).collect()[0]["weight"] == 3
    # an empty batch onto an EXISTING store still records its token and
    # keeps every partition readable (hard-linked)
    assert merge_into_parquet(spark, target, empty, commit_token="2") is True
    assert merge_into_parquet(spark, target, empty, commit_token="2") is False
    assert spark.read.parquet(target).collect()[0]["weight"] == 3


def test_merge_into_table_identifier_routing(spark, tmp_path):
    """Routing is a pure function of the target STRING (a filesystem probe
    would let cwd contents flip the same target between sinks across runs):
    only dotted identifiers are table-shaped; bare words are paths; explicit
    table:/path: prefixes force the route."""
    from gazetteer_entity_parser_spark.sources import sinks
    from gazetteer_entity_parser_spark.sources.sinks import is_table_identifier

    assert is_table_identifier("cat.db.triples")
    assert is_table_identifier("db.triples")
    assert not is_table_identifier("triples")  # bare word: ambiguous -> path
    assert not is_table_identifier("out/triples")  # relative path
    assert not is_table_identifier("/abs/triples")
    assert not is_table_identifier("./triples")
    assert not is_table_identifier("db.triples ")  # trailing junk

    # path: prefix forces parquet even for a dotted name; table: forces the
    # SQL route for a bare word (here Iceberg is absent, so it falls back to
    # parquet — but only after taking the table branch, observed via the
    # commit-token refusal that lives on that branch)
    batch = spark.createDataFrame(
        [("A", "p", "B", 1, 0, 0)],
        "subj string, pred string, obj string, weight bigint, "
        "subj_rank bigint, obj_rank bigint",
    )
    stored = str(tmp_path / "db.triples")
    assert sinks.merge_into(spark, f"path:{stored}", batch) == "parquet"
    import os as _os
    assert _os.path.exists(stored)

    import pytest as _pytest
    with _pytest.raises(NotImplementedError, match="commit_token"):
        # force_table + commit_token refuses BEFORE consulting availability:
        # proof the table: prefix reached the SQL-MERGE branch
        orig = sinks.iceberg_available
        sinks.iceberg_available = lambda s: True
        try:
            sinks.merge_into(spark, "table:triples", batch, commit_token="1")
        finally:
            sinks.iceberg_available = orig


def test_streaming_dedup_exact_equals_batch(spark, pages, tmp_path):
    """Stateful streaming dedup must keep exactly one row per distinct
    content digest across micro-batch boundaries (a re-crawl arriving in a
    LATER micro-batch is the case plain per-batch distinct would miss)."""
    from gazetteer_entity_parser_spark.streaming.stream import streaming_dedup_exact

    # re-crawls: every 3rd page again under a different url, forced into
    # separate files so originals and re-crawls land in different batches
    recrawls = (
        pages.where(F.pmod(F.xxhash64("url"), F.lit(3)) == 0)
        .withColumn("url", F.concat(F.col("url"), F.lit("?recrawl")))
    )
    input_dir = str(tmp_path / "pages_in")
    pages.repartition(3).write.parquet(input_dir)
    recrawls.repartition(2).write.mode("append").parquet(input_dir)

    stream = read_webpage_stream(spark, input_dir, max_files=1)
    out_dir = str(tmp_path / "deduped")
    q = (
        streaming_dedup_exact(stream, content_cols=("text",))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    n_distinct_texts = pages.select("text").distinct().count()
    assert got.count() == n_distinct_texts  # one keeper per distinct text
    assert got.select("text").distinct().count() == n_distinct_texts
    # keepers cover exactly the batch-distinct text set
    assert (
        got.select("text").exceptAll(pages.select("text").distinct()).count() == 0
    )


def test_streaming_dedup_watermark_mode(spark, pages, tmp_path):
    """Watermarked variant (bounded state): same-timestamp duplicates are
    inside every watermark window, so the full corpus still dedups here;
    the mode exists to EVICT digests older than the watermark at scale."""
    from gazetteer_entity_parser_spark.streaming.stream import streaming_dedup_exact

    input_dir = str(tmp_path / "pages_in")
    pages.unionByName(pages).repartition(4).write.parquet(input_dir)
    stream = read_webpage_stream(spark, input_dir, max_files=2)
    out_dir = str(tmp_path / "deduped")
    q = (
        streaming_dedup_exact(
            stream, content_cols=("text",),
            event_time_col="warc_ts", watermark="1 hour",
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert (
        spark.read.parquet(out_dir).count()
        == pages.select("text").distinct().count()
    )
    import pytest as _pytest
    with _pytest.raises(ValueError, match="event_time_col"):
        streaming_dedup_exact(stream, watermark="1 hour")


def test_streaming_dedup_digest_distinguishes_nulls(spark, tmp_path):
    """(NULL, 'foo') vs ('foo', NULL) — and null vs empty text — must NOT
    collide: concat_ws would skip the null column and silently drop a
    distinct document; the JSON-struct digest keeps them apart."""
    from gazetteer_entity_parser_spark.streaming.stream import streaming_dedup_exact

    rows = [
        ("u1", "foo", None),
        ("u2", None, "foo"),
        ("u3", None, None),
        ("u4", "", None),
        ("u5", "foo", None),  # true duplicate of u1
    ]
    df = spark.createDataFrame(rows, "url string, lang string, text string")
    input_dir = str(tmp_path / "in")
    df.repartition(1).write.parquet(input_dir)
    stream = (
        spark.readStream.schema("url string, lang string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    out_dir = str(tmp_path / "out")
    q = (
        streaming_dedup_exact(stream, content_cols=("lang", "text"))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = spark.read.parquet(out_dir)
    assert kept.count() == 4  # only the true duplicate dropped
    assert sorted(r["url"] for r in kept.collect())[:4] == ["u1", "u2", "u3", "u4"]


def test_merge_retains_one_superseded_generation(spark, tmp_path):
    """Reader grace window (r3 ADVICE): the version the symlink pointed at
    BEFORE the swap survives the merge that supersedes it (a concurrent
    reader that resolved the symlink pre-swap may still be scanning it) and
    is pruned by the NEXT merge; nothing older than one generation is kept."""
    import os

    from gazetteer_entity_parser_spark.sources.sinks import (
        _version_dirs,
        merge_into_parquet,
    )

    target = str(tmp_path / "store")
    schema = (
        "subj string, pred string, obj string, weight bigint, "
        "subj_rank bigint, obj_rank bigint"
    )

    def batch(tok, w):
        df = spark.createDataFrame([("E0", "p", "F0", w, 0, 1)], schema)
        assert merge_into_parquet(spark, target, df, commit_token=tok, n_buckets=4)

    batch("0", 1)
    v1 = os.path.realpath(target)
    batch("1", 1)
    v2 = os.path.realpath(target)
    dirs = {os.path.abspath(d) for d in _version_dirs(target)}
    assert v1 in dirs and v2 in dirs and len(dirs) == 2  # v1 retained
    # the retained generation is still a complete, readable store snapshot
    assert spark.read.parquet(v1).count() == 1
    batch("2", 1)
    v3 = os.path.realpath(target)
    dirs = {os.path.abspath(d) for d in _version_dirs(target)}
    assert dirs == {v2, v3}  # v1 pruned by the following merge, v2 retained
    assert spark.read.parquet(target).collect()[0]["weight"] == 3
