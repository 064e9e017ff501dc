"""Graph-analytics scale bench: the round-5 operators on a synthetic
graph orders of magnitude larger than the vocab co-occurrence graph the
correctness gate uses (default 200k vertices / ~1M directed edges),
deterministic (hash-derived, no RNG) so runs are comparable.

    python bench_graph.py [n_vertices] [n_edges]

Prints ONE JSON line: {"metric": "graph_analytics_total", "value": sec,
"unit": "sec", "ops": {...}, "n_vertices": N, "n_edges": E}.

Edge model: endpoint = xxhash64(i, salt) % N with a square to skew the
destination (hubs exist, like a real KG); weight 1-8. Self-loops are
emitted and left for each operator's own hygiene to handle.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    n_vertices = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from gazetteer_entity_parser_spark.operators.graph import (
        connected_components,
        k_core,
        label_propagation,
        pagerank,
        triangle_counts,
    )
    from gazetteer_entity_parser_spark.session import build_session

    spark = build_session(
        "gazetteer-kg-graph-bench", parallelism=cpus, shuffle_partitions=cpus
    )
    # deterministic skewed edge list: dst uses a squared hash so a few
    # vertices become hubs (the shape that breaks naive wedge/pivot joins)
    ids = spark.range(n_edges).select(
        F.concat(
            F.lit("v"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_vertices)).cast("string"),
        ).alias("subj"),
        F.concat(
            F.lit("v"),
            F.pmod(
                F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n_vertices))
                * F.pmod(F.xxhash64("id", F.lit(3)), F.lit(n_vertices)),
                F.lit(n_vertices),
            ).cast("string"),
        ).alias("obj"),
        (F.pmod(F.xxhash64("id", F.lit(4)), F.lit(8)) + 1).alias("weight"),
    )
    edges = ids.repartition(cpus).persist()
    edges.count()

    ops = {}
    t_all = time.perf_counter()

    t = time.perf_counter()
    n_pr = pagerank(edges, n_iter=5).count()
    ops["pagerank_5iter"] = round(time.perf_counter() - t, 2)

    t = time.perf_counter()
    n_tri = triangle_counts(edges).count()
    ops["triangles"] = round(time.perf_counter() - t, 2)

    t = time.perf_counter()
    n_cc = connected_components(
        edges.select("subj", "obj"), src="subj", dst="obj", method="star"
    ).count()
    ops["components_star"] = round(time.perf_counter() - t, 2)

    t = time.perf_counter()
    n_core = k_core(edges, k=3).count()
    ops["k_core_3"] = round(time.perf_counter() - t, 2)

    t = time.perf_counter()
    n_lpa = label_propagation(edges, n_iter=3).count()
    ops["label_prop_3iter"] = round(time.perf_counter() - t, 2)

    total = round(time.perf_counter() - t_all, 2)
    print(
        json.dumps(
            {
                "metric": "graph_analytics_total",
                "value": total,
                "unit": "sec",
                "ops": ops,
                "rows": {
                    "pagerank": n_pr,
                    "triangles": n_tri,
                    "components": n_cc,
                    "k_core": n_core,
                    "label_prop": n_lpa,
                },
                "n_vertices": n_vertices,
                "n_edges": n_edges,
                "cpus": cpus,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
