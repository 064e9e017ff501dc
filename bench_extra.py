"""Round-6 optimization harness (bench.py is FROZEN for measurement — this
file exists for §1-style isolation: noop-sink timing of single queries,
.explain('formatted') capture, and before/after A/B runs).

Usage:
  python bench_extra.py time <name> [--sf DIR] [--reps N]   # noop-sink wall
  python bench_extra.py count <name> [--sf DIR] [--reps N]  # bench.py-identical .count() wall
  python bench_extra.py plan <name> [--sf DIR] [--out FILE] # explain('formatted')

<name> is a key of plans.queries.QUERIES or bench.py's EXTRA_QUERIES.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _resolve(name):
    from gazetteer_entity_parser_spark.plans import queries as Q

    import bench

    return bench.EXTRA_QUERIES.get(name) or Q.QUERIES[name]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["time", "count", "plan"])
    ap.add_argument("name")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from gazetteer_entity_parser_spark.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session("bench-extra", parallelism=cpus, shuffle_partitions=cpus)
    try:
        fn = _resolve(args.name)
        if args.mode == "plan":
            df = fn(spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            if args.out:
                with open(args.out, "w") as f:
                    f.write(txt)
                print(f"wrote {args.out}")
            else:
                print(txt)
            return
        walls = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{args.name} rep{i}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            if args.mode == "time":
                df.write.format("noop").mode("overwrite").save()
                n = None
            else:
                n = df.count()
            walls.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print({"name": args.name, "sf": args.sf, "mode": args.mode,
               "walls": walls, "best": min(walls), "rows": n})
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
