"""Stage B: the corpus-scale mention-extraction operator.

One Arrow-batched ``mapInPandas`` stage runs the matching kernel over every
page (reference query path: src/parser.rs:146-149 lifted from one string to
10^12 rows; acts as a UDTF: 1 page -> N mentions). No row-at-a-time Python
UDFs anywhere (input_hint constraint).

Scale design (SURVEY.md §4.3 Stage B):
- project to (key, text) *before* the UDF boundary so Catalyst prunes the
  parquet/Iceberg scan (dropping ``html: binary`` is the single biggest I/O
  win at 100 TB);
- optional salted repartition: Common-Crawl shards are size-skewed (giant
  pages, per-host clustering); ``pmod(xxhash64(url), P)`` spreads them;
- sentence splitting + fixed token windows bound per-kernel-call state, so a
  1 GB page costs many small kernel calls, not one quadratic one; mentions
  never span windows, and downstream triples are windowed anyway, so the
  chunking is semantics-preserving for the pipeline;
- the parser arrives via ``SparkContext.broadcast`` — probing the inverted
  index is a broadcast hash join chosen manually (SURVEY.md §4.1).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernel.parser import Parser
from ..kernel.tokenizer import tokenize

MENTIONS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("sent_idx", T.IntegerType()),
        T.StructField("tok_idx", T.IntegerType()),  # doc-global token ordinal
        T.StructField("begin", T.IntegerType()),  # char offsets, doc-global
        T.StructField("end", T.IntegerType()),
        T.StructField("matched_value", T.StringType()),
        T.StructField("resolved", T.StringType()),
        T.StructField("raw_value", T.StringType()),
        T.StructField("entity_id", T.IntegerType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField(
            "alternatives",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("resolved", T.StringType()),
                        T.StructField("raw_value", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

# sentence boundary: punctuation run followed by whitespace (or end)
_BOUNDARY_RE = re.compile(r"[.!?]+(?:\s+|$)")


def split_sentences(text: str) -> list[tuple[int, str]]:
    """[(char_offset, sentence_text)] — offsets into the original text so
    mention spans can be reported doc-globally."""
    out = []
    start = 0
    for m in _BOUNDARY_RE.finditer(text):
        out.append((start, text[start : m.end()]))
        start = m.end()
    if start < len(text):
        out.append((start, text[start:]))
    return out


def iter_windows(
    text: str, window_tokens: int | None
) -> Iterator[tuple[int, int, int, str, list[tuple[int, int, str]]]]:
    """Yield (sent_idx, char_offset, base_tok_idx, window_text, window_tokens).

    Sentences are regex-split; long sentences are further chunked every
    ``window_tokens`` tokens (None = no chunking). Token ordinals are
    doc-global.
    """
    sent_idx = 0
    base_tok = 0
    for sent_off, sent in split_sentences(text):
        toks = tokenize(sent)
        if not toks:
            continue
        if window_tokens is None or len(toks) <= window_tokens:
            yield sent_idx, sent_off, base_tok, sent, toks
            sent_idx += 1
            base_tok += len(toks)
        else:
            for i in range(0, len(toks), window_tokens):
                chunk = toks[i : i + window_tokens]
                c_start = chunk[0][0]
                c_end = chunk[-1][1]
                # re-based token spans within the chunk string
                rebased = [(s - c_start, e - c_start, t) for s, e, t in chunk]
                yield sent_idx, sent_off + c_start, base_tok, sent[c_start:c_end], rebased
                sent_idx += 1
                base_tok += len(chunk)


# begin/end/tok_idx are int32 BY CONSTRUCTION, not by hope: a Spark/Arrow
# string cell is itself capped below 2^31 bytes (and chars <= bytes), so no
# representable document can overflow a char offset; a larger page must be
# pre-chunked upstream of the scan anyway.
def extract_mentions(
    docs: DataFrame,
    parser_broadcast,
    *,
    key_col: str = "url",
    text_col: str = "text",
    max_alternatives: int = 0,
    window_tokens: int | None = 10,
    num_partitions: int | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """docs(key, text, ...) -> mentions DataFrame (MENTIONS_SCHEMA).

    ``num_partitions`` triggers the salted repartition for skewed corpora;
    leave None to inherit upstream partitioning (e.g. when the scan already
    produced well-sized splits).

    ``columns`` projects the OUTPUT inside the UDF: Catalyst cannot push
    column pruning through a mapInPandas boundary, so a narrow consumer (the
    triples path needs only url/sent_idx/tok_idx/resolved/rank) would
    otherwise pay Python string slicing, alternatives materialization, and
    Arrow transfer for columns it immediately drops. Equality with
    full-output + .select() is pinned in tests/test_extract_spark.py.
    """
    pruned = docs.select(F.col(key_col).alias("url"), F.col(text_col).alias("text"))
    if num_partitions:
        pruned = pruned.repartition(
            num_partitions, F.pmod(F.xxhash64("url"), F.lit(num_partitions))
        )
    all_fields = [f.name for f in MENTIONS_SCHEMA.fields]
    if columns is None:
        cols = all_fields
        schema = MENTIONS_SCHEMA
    else:
        if not columns:
            # fail at the driver: an empty projection would otherwise surface
            # as an IndexError inside the executor UDF on the first batch
            raise ValueError(
                "columns must be None or a non-empty subset of MENTIONS_SCHEMA "
                f"fields {all_fields}"
            )
        unknown = set(columns) - set(all_fields)
        if unknown:
            raise ValueError(f"unknown mention columns: {sorted(unknown)}")
        cols = [c for c in all_fields if c in set(columns)]
        schema = T.StructType([MENTIONS_SCHEMA[c] for c in cols])

    def run_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parser: Parser = parser_broadcast.value
        run = parser.run
        # r6: single-token direct-append loop — when every gazetteer entry is
        # one token and no alternatives are requested, a mention is a pure
        # dictionary hit and all 11 output fields are computable without
        # building ParsedValue/ResolvedValue objects per mention (the vocab
        # mentions query emits 2.7M mentions at sf1.0; the object layer was
        # ~30% of the stage). Field-for-field equality with _run_single_token
        # is by construction (same table, same first-posting pick) and the
        # whole path stays pinned by the oracle + pytest goldens.
        st_table = parser._single_token_lookup() if max_alternatives == 0 else None
        full = columns is None
        # r6: light-projection fast lane — when the requested columns need
        # neither char offsets nor matched_value/alternatives (the triples/
        # checkpoint consumers ask exactly for url/sent_idx/tok_idx/resolved/
        # rank), run_light_pos supplies (tok_ordinal, resolved, rank) with no
        # ParsedValue/ResolvedValue construction and no string slicing at
        # all; equality with the full path is pinned in pytest.
        light_pos = (
            not full
            and max_alternatives == 0
            and set(columns) <= {"url", "sent_idx", "tok_idx", "resolved", "rank"}
        )
        run_pos = parser.run_light_pos if light_pos else None
        if not full:
            # per-mention value producers, evaluated only for the projection
            # (the full path below stays a hand-inlined loop — the dispatch
            # indirection measured an 11% tax there)
            makers = {
                "url": lambda ctx, pv: ctx[0],
                "sent_idx": lambda ctx, pv: ctx[1],
                "tok_idx": lambda ctx, pv: ctx[3] + pv.tok_range[0],
                "begin": lambda ctx, pv: ctx[2] + pv.range[0],
                "end": lambda ctx, pv: ctx[2] + pv.range[1],
                "matched_value": lambda ctx, pv: pv.matched_value,
                "resolved": lambda ctx, pv: pv.resolved_value.resolved,
                "raw_value": lambda ctx, pv: pv.resolved_value.raw_value,
                "entity_id": lambda ctx, pv: pv.entity,
                "rank": lambda ctx, pv: pv.rank,
                "alternatives": lambda ctx, pv: [
                    {"resolved": a.resolved, "raw_value": a.raw_value}
                    for a in pv.alternatives
                ],
            }
        st_get = st_table.get if (st_table is not None and full) else None
        for pdf in batches:
            out = {c: [] for c in cols}
            if not full:
                appenders = [(out[c], makers[c]) for c in cols]
            if run_pos is not None:
                lp_url = out.get("url")
                lp_sent = out.get("sent_idx")
                lp_tok = out.get("tok_idx")
                lp_res = out.get("resolved")
                lp_rank = out.get("rank")
            if st_get is not None:
                o_url, o_sent, o_tok = out["url"], out["sent_idx"], out["tok_idx"]
                o_beg, o_end, o_match = out["begin"], out["end"], out["matched_value"]
                o_res, o_raw = out["resolved"], out["raw_value"]
                o_ent, o_rank, o_alt = out["entity_id"], out["rank"], out["alternatives"]
            for url, text in zip(pdf["url"].values, pdf["text"].values):
                if not text:
                    continue
                # r6: sentences are tokenized once and chunks are TOKEN
                # slices only — the kernel receives the full sentence with
                # sentence-relative spans (no per-chunk text copy, no span
                # rebasing), exactly the fused-path convention: the kernel
                # reads text solely to slice matched_value, for which
                # sentence text + sentence-relative spans are identical to
                # chunk text + rebased spans. Window accounting (sent_idx
                # and base_tok advance per non-empty chunk) is unchanged
                # from iter_windows.
                sent_idx = 0
                base_tok = 0
                for sent_off, sent in split_sentences(text):
                    toks = tokenize(sent)
                    nt = len(toks)
                    if not nt:
                        continue
                    if window_tokens is None or nt <= window_tokens:
                        chunks = (toks,)
                    else:
                        chunks = (
                            toks[i : i + window_tokens]
                            for i in range(0, nt, window_tokens)
                        )
                    for chunk in chunks:
                        if run_pos is not None:
                            for pos, res, rank in run_pos(sent, tokens=chunk):
                                if lp_url is not None:
                                    lp_url.append(url)
                                if lp_sent is not None:
                                    lp_sent.append(sent_idx)
                                if lp_tok is not None:
                                    lp_tok.append(base_tok + pos)
                                if lp_res is not None:
                                    lp_res.append(res)
                                if lp_rank is not None:
                                    lp_rank.append(rank)
                        elif st_get is not None:
                            for ti, (s, e, token) in enumerate(chunk):
                                postings = st_get(token)
                                if postings is None:
                                    continue
                                ev, rank, rv = postings[0]
                                o_url.append(url)
                                o_sent.append(sent_idx)
                                o_tok.append(base_tok + ti)
                                o_beg.append(sent_off + s)
                                o_end.append(sent_off + e)
                                o_match.append(token)
                                o_res.append(rv.resolved)
                                o_raw.append(rv.raw_value)
                                o_ent.append(ev)
                                o_rank.append(rank)
                                o_alt.append(())
                        else:
                            parsed = run(sent, max_alternatives, tokens=chunk)
                            if parsed:
                                if full:
                                    for pv in parsed:
                                        begin, end = pv.range
                                        out["url"].append(url)
                                        out["sent_idx"].append(sent_idx)
                                        out["tok_idx"].append(
                                            base_tok + pv.tok_range[0]
                                        )
                                        out["begin"].append(sent_off + begin)
                                        out["end"].append(sent_off + end)
                                        out["matched_value"].append(pv.matched_value)
                                        out["resolved"].append(
                                            pv.resolved_value.resolved
                                        )
                                        out["raw_value"].append(
                                            pv.resolved_value.raw_value
                                        )
                                        out["entity_id"].append(pv.entity)
                                        out["rank"].append(pv.rank)
                                        out["alternatives"].append(
                                            [
                                                {
                                                    "resolved": a.resolved,
                                                    "raw_value": a.raw_value,
                                                }
                                                for a in pv.alternatives
                                            ]
                                        )
                                else:
                                    ctx = (url, sent_idx, sent_off, base_tok)
                                    for pv in parsed:
                                        for lst, mk in appenders:
                                            lst.append(mk(ctx, pv))
                        sent_idx += 1
                        base_tok += len(chunk)
            if out[cols[0]]:  # empty frames would carry float64 columns into Arrow
                yield pd.DataFrame(out, columns=cols)

    return pruned.mapInPandas(run_batches, schema)


TRIPLE_PARTIALS_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("obj", T.StringType()),
        T.StructField("weight", T.LongType()),
        T.StructField("subj_rank", T.IntegerType()),
        T.StructField("obj_rank", T.IntegerType()),
    ]
)


def extract_triple_partials(
    docs: DataFrame,
    parser_broadcast,
    *,
    key_col: str = "url",
    text_col: str = "text",
    window_tokens: int | None = 10,
    num_partitions: int | None = None,
    pred: str = "co_occurs_with",
) -> DataFrame:
    """Fused Stage B+C fast path: mentions -> within-window ordered pairs ->
    PER-BATCH partial aggregation, all inside the one mapInPandas stage.

    Every document is processed whole within one Arrow batch, so every
    co-occurrence window is complete in-batch and pair generation needs no
    shuffle at all; each batch emits ~|distinct triples| partial rows instead
    of ~|mention pairs| raw rows. The only shuffle left in the whole
    mentions->canonical-triples path is the final (subj, pred, obj) rollup
    over tiny partials — at 10^12 documents this removes the 10^13-row pair
    shuffle entirely. Canonical equality with the unfused path is pinned in
    tests/test_triples_grouped.py.

    Use the unfused operators when the raw triple table (url/sent_idx
    provenance) must be materialized.
    """
    pruned = docs.select(F.col(key_col).alias("url"), F.col(text_col).alias("text"))
    if num_partitions:
        pruned = pruned.repartition(
            num_partitions, F.pmod(F.xxhash64("url"), F.lit(num_partitions))
        )

    def run_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parser: Parser = parser_broadcast.value
        run_light = parser.run_light
        for pdf in batches:
            acc: dict[tuple[str, str], list] = {}
            for text in pdf["text"].values:
                if not text:
                    continue
                # aggregation needs only (resolved, rank) per window, so this
                # loop skips iter_windows' chunk-text slicing and offset
                # rebasing: run_light never reads offsets, and the general-
                # path fallback inside it is handed sentence-relative spans
                # with the full sentence text, which is equally valid (char
                # offsets only shape matched_value/ranges, both discarded
                # here). Canonical equality with the unfused path is pinned
                # in tests/test_triples_grouped.py.
                for _off, sent in split_sentences(text):
                    toks = tokenize(sent)
                    n_toks = len(toks)
                    if n_toks < 2:
                        continue
                    if window_tokens is None or n_toks <= window_tokens:
                        chunks = (toks,)
                    else:
                        chunks = (
                            toks[i : i + window_tokens]
                            for i in range(0, n_toks, window_tokens)
                        )
                    for chunk in chunks:
                        ms = run_light(sent, tokens=chunk)
                        if len(ms) < 2:
                            continue
                        for i in range(len(ms) - 1):
                            s_res, s_rank = ms[i]
                            for j in range(i + 1, len(ms)):
                                o_res, o_rank = ms[j]
                                hit = acc.get((s_res, o_res))
                                if hit is None:
                                    acc[(s_res, o_res)] = [1, s_rank, o_rank]
                                else:
                                    hit[0] += 1
                                    if s_rank < hit[1]:
                                        hit[1] = s_rank
                                    if o_rank < hit[2]:
                                        hit[2] = o_rank
            if acc:
                yield pd.DataFrame(
                    {
                        "subj": [k[0] for k in acc],
                        "pred": pred,
                        "obj": [k[1] for k in acc],
                        "weight": [v[0] for v in acc.values()],
                        "subj_rank": [v[1] for v in acc.values()],
                        "obj_rank": [v[2] for v in acc.values()],
                    }
                )

    return pruned.mapInPandas(run_batches, TRIPLE_PARTIALS_SCHEMA)


def canonical_triples_fused(
    docs: DataFrame, parser_broadcast, **kwargs
) -> DataFrame:
    """Final rollup over the fused partials — one small shuffle total."""
    partials = extract_triple_partials(docs, parser_broadcast, **kwargs)
    return partials.groupBy("subj", "pred", "obj").agg(
        F.sum("weight").alias("weight"),
        F.min("subj_rank").alias("subj_rank"),
        F.min("obj_rank").alias("obj_rank"),
    )
