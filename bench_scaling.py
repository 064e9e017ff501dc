"""Two-cluster-size scaling evidence (BASELINE.md / north_rule).

A real N-vs-4N-executor comparison is impossible in this sandbox; per the
driver instruction we run the IDENTICAL job at two parallelism levels
(local[8] vs local[32]) on the same input and report throughput + scaling
efficiency = (X_32 / X_8) / 4.

The sf0.1 corpus is ~280k tokens — far too small for parallelism to matter —
so the job logically replicates each page ``--replicas`` times with suffixed
urls (identical at both levels; this is the same-input requirement, just
enough work that compute dominates fixed overhead). The job is the real
pipeline hot path: broadcast-parser mention extraction (general kernel, alias
gazetteer) + windowed co-occurrence triples + canonicalization.

Usage:
  python bench_scaling.py                # both levels via subprocesses + efficiency
  python bench_scaling.py --single 8    # one level, prints one JSON line
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPLICAS = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICAS", "60"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_level(cpus: int) -> dict:
    import tempfile

    from pyspark.sql import functions as F

    from gazetteer_entity_parser_spark.operators.extract import extract_mentions
    from gazetteer_entity_parser_spark.operators.triples import (
        canonicalize_triples,
        cooccurrence_triples_grouped,
    )
    from gazetteer_entity_parser_spark.session import build_session
    from gazetteer_entity_parser_spark.sources.builder_job import (
        broadcast_parser,
        build_parser_distributed,
    )
    from gazetteer_entity_parser_spark.sources.gazetteer import alias_gazetteer
    from gazetteer_entity_parser_spark.sources.webpages import webpages_from_documents

    # memory scales with cores, as it would across real cluster sizes
    # (N executors -> 4N executors brings 4x total heap); a fixed heap would
    # GC-thrash the 32-thread JVM and mis-measure scaling
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = f"{max(cpus, 8)}g"
    # IDENTICAL job at both levels: constant partition/shuffle counts, only
    # the executor thread count differs (the N-vs-4N contract)
    spark = build_session(f"kg-scaling-{cpus}", parallelism=cpus, shuffle_partitions=64)
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        pages = webpages_from_documents(docs).select("url", "text")
        # the sf input is one parquet row group (serial scan); spread the
        # SMALL table first, then explode per-partition — the amplified data
        # is born parallel and never shuffles before the kernel stage
        amplified = (
            # constant task count (identical at both levels): 256 tasks = 8
            # waves at 32 cores, 32 waves at 8 — stragglers amortize, tasks
            # are the same size either way
            pages.repartition(256, "url")
            .withColumn("replica", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))))
            .select(F.concat("url", F.lit("#r"), "replica").alias("url"), "text")
        )
        n_docs = docs.count() * REPLICAS

        gaz = alias_gazetteer(docs, 40)
        parser = build_parser_distributed(
            gaz, threshold=0.6, n_stop_words=2, additional_stop_words=["hello"]
        )
        bc = broadcast_parser(spark, parser)

        # measure the steady-state job, not session/JIT warmup: one warmup
        # pass over ~1/REPLICAS of the data, then the timed full job
        extract_mentions(
            amplified.where(F.col("url").endswith("#r0")), bc, window_tokens=10
        ).count()

        def best_of(n: int, fn):
            """min wall over n runs: damps transient host noise (this sandbox
            is a VM; occasional hypervisor contention would otherwise land in
            one leg and corrupt the ratio)."""
            best, out = None, None
            for _ in range(n):
                t = time.perf_counter()
                out = fn()
                wall = time.perf_counter() - t
                best = wall if best is None or wall < best else best
            return best, out

        # timed full job, pipeline-shaped: extraction -> mention checkpoint
        # (parquet) -> grouped pair expansion -> canonicalize
        ckpt = tempfile.mkdtemp(prefix=f"kg_bench_mentions_{cpus}_")

        def do_extract():
            # project INSIDE the UDF: Catalyst can't push pruning through
            # mapInPandas, and the checkpoint needs only these five columns
            extract_mentions(
                amplified, bc, window_tokens=10,
                columns=["url", "sent_idx", "tok_idx", "resolved", "rank"],
            ).write.mode("overwrite").parquet(ckpt)

        t_extract, _ = best_of(2, do_extract)

        mentions_ck = spark.read.parquet(ckpt)
        n_mentions = mentions_ck.count()

        t_triples, n_triples = best_of(
            2,
            lambda: canonicalize_triples(
                cooccurrence_triples_grouped(mentions_ck)
            ).count(),
        )
        t_full = t_extract + t_triples

        # fused fast path: mentions+pairs+partial-agg in one mapInPandas
        # stage, single small shuffle — the preferred plan at corpus scale
        from gazetteer_entity_parser_spark.operators.extract import (
            canonical_triples_fused,
        )

        t_fused, n_triples_fused = best_of(
            2, lambda: canonical_triples_fused(amplified, bc, window_tokens=10).count()
        )
        assert n_triples_fused == n_triples

        return {
            "cpus": cpus,
            "replicas": REPLICAS,
            "n_docs": n_docs,
            "n_mentions": n_mentions,
            "n_triples": n_triples,
            "extract_sec": round(t_extract, 3),
            "triples_sec": round(t_triples, 3),
            "full_sec": round(t_full, 3),
            "fused_sec": round(t_fused, 3),
            "docs_per_sec": round(n_docs / t_fused, 1),
            "unfused_docs_per_sec": round(n_docs / t_full, 1),
            "extract_docs_per_sec": round(n_docs / t_extract, 1),
        }
    finally:
        spark.stop()


def _kernel_bench_worker(conn) -> None:
    import time as _t

    from gazetteer_entity_parser_spark.kernel import ParserBuilder, tokenize

    words = [f"w{i}" for i in range(40)]
    gaz = [(w, w.upper()) for w in words] + [
        (f"w{i} w{i + 1}", f"W{i}") for i in range(20)
    ]
    parser = (
        ParserBuilder().set_gazetteer(gaz).minimum_tokens_ratio(0.6).n_stop_words(2).build()
    )
    text = " ".join(words[i % 55] if i % 55 < 40 else f"oov{i}" for i in range(100))
    toks = tokenize(text)
    for _ in range(50):
        parser.run(text, 0, tokens=toks)  # warm
    t0 = _t.perf_counter()
    n = 0
    while _t.perf_counter() - t0 < 6:
        parser.run(text, 0, tokens=toks)
        n += 1
    conn.send(n * 100 / (_t.perf_counter() - t0))


def measure_core_contention_floor() -> float:
    """Socket-level measurement floor of this proxy: per-core throughput of
    the REAL (memory-heavy) kernel workload with all cores running it, vs one
    core alone. Spin-loop probes miss this — the contention is memory
    bandwidth, not CPU. Measured ~0.73 on this box: each core delivers only
    ~73% under full-socket load, an artifact a real N-node vs 4N-node cluster
    does not have (each node has its own memory bus). Raw efficiency divided
    by this ratio is the hardware-normalized scaling efficiency."""
    import multiprocessing as mp
    import statistics

    def run_many(n: int) -> list[float]:
        pipes, procs = [], []
        for _ in range(n):
            parent, child = mp.Pipe()
            proc = mp.Process(target=_kernel_bench_worker, args=(child,))
            proc.start()
            pipes.append(parent)
            procs.append(proc)
        rates = [p.recv() for p in pipes]
        for proc in procs:
            proc.join()
        return rates

    alone = run_many(1)[0]
    n_cpus = os.cpu_count() or 32
    busy = statistics.median(run_many(n_cpus))
    return round(busy / alone, 3)


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--single":
        print(json.dumps(run_level(int(sys.argv[2]))))
        return

    import shutil as _shutil

    have_taskset = _shutil.which("taskset") is not None
    results = {}
    for cpus in (8, 32):
        # pin the WHOLE process tree (JVM + Python workers) to `cpus` cores:
        # unpinned local[8] borrows idle cores for JVM shuffle/GC threads and
        # overstates small-cluster throughput, understating scaling efficiency
        cmd = [sys.executable, os.path.abspath(__file__), "--single", str(cpus)]
        if have_taskset:
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        out = subprocess.run(
            cmd,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
        results[cpus]["core_pinned"] = have_taskset

    floor = measure_core_contention_floor()
    x8, x32 = results[8]["docs_per_sec"], results[32]["docs_per_sec"]
    raw = round((x32 / x8) / 4, 3)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_8_to_32",
                "value": raw,
                "unit": "fraction",
                "core_contention_floor": floor,
                "normalized_efficiency": round(min(raw / floor, 1.0), 3),
                "local8": results[8],
                "local32": results[32],
            }
        )
    )


if __name__ == "__main__":
    main()
