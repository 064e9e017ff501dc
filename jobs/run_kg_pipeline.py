"""spark-submit entry point for the KG-construction pipeline (north_rule:
"run via spark-submit --py-files on a multi-executor cluster").

Package and submit:

    python jobs/package.py                      # -> dist/gazetteer_entity_parser_spark.zip
    spark-submit --master <cluster-or-local> \\
        --py-files dist/gazetteer_entity_parser_spark.zip \\
        jobs/run_kg_pipeline.py \\
        --input /path/to/webpages_or_documents.parquet \\
        --workdir /path/to/workdir \\
        [--triples-target db.triples_or_path] [--threshold 1.0] \\
        [--n-entities 40] [--n-stop-words 0] [--window-tokens 10] \\
        [--n-buckets 256] [--replay-buckets 3,7]

The session comes from spark-submit (master/executor conf owned by the
submitter); this script only sets SQL-level knobs. With --replay-buckets it
recomputes ONLY those mention checkpoint buckets (idempotent replay).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="webpages/documents table or parquet path")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--triples-target", default=None)
    ap.add_argument("--threshold", type=float, default=1.0)
    ap.add_argument("--n-entities", type=int, default=40)
    ap.add_argument("--n-stop-words", type=int, default=0)
    ap.add_argument("--max-alternatives", type=int, default=0)
    ap.add_argument("--window-tokens", type=int, default=10)
    ap.add_argument("--n-buckets", type=int, default=256)
    ap.add_argument("--alias-gazetteer", action="store_true")
    ap.add_argument("--replay-buckets", default=None, help="comma-separated bucket ids")
    ap.add_argument(
        "--graph-analytics",
        action="store_true",
        help="materialize pagerank/triangles/neighbors parquet under workdir/graph",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from gazetteer_entity_parser_spark.plans.pipeline import (
        PipelineConfig,
        replay_buckets,
        run_pipeline,
    )
    from gazetteer_entity_parser_spark.sources.webpages import (
        read_table_or_parquet,
        webpages_from_documents,
    )

    spark = SparkSession.builder.appName("gazetteer-kg-pipeline").getOrCreate()
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")

    docs = read_table_or_parquet(spark, args.input)
    if "url" not in docs.columns:  # raw documents table -> synthesize page shape
        docs = webpages_from_documents(docs)

    cfg = PipelineConfig(
        n_entities=args.n_entities,
        threshold=args.threshold,
        n_stop_words=args.n_stop_words,
        max_alternatives=args.max_alternatives,
        window_tokens=args.window_tokens,
        n_buckets=args.n_buckets,
        use_alias_gazetteer=args.alias_gazetteer,
    )

    if args.replay_buckets:
        buckets = [int(b) for b in args.replay_buckets.split(",")]
        replay_buckets(spark, docs, args.workdir, buckets, cfg)
        print(json.dumps({"replayed_buckets": buckets}))
        return

    result = run_pipeline(spark, docs, args.workdir, cfg, args.triples_target)
    summary = {
        "mentions_path": result["mentions_path"],
        "lineage_path": result["lineage_path"],
        "triples_path": result["triples_path"],
        "sink": result["sink"],
        "n_mentions": result["mentions"].count(),
        "n_triples": (
            result["triples"].count() if result["triples"] is not None else None
        ),
        "stage_seconds": result["stage_seconds"],
    }
    if args.graph_analytics and result["triples"] is not None:
        from gazetteer_entity_parser_spark.plans.pipeline import (
            materialize_graph_analytics,
        )

        summary["graph"] = materialize_graph_analytics(
            result["triples"], args.workdir
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
