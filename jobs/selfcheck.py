"""Self-run of the driver's correctness gate over ALL registered queries.

The round driver records at most 50 CORRECTNESS rows per round (the first
50 entries of ``QUERIES``, observed across r1-r4), but the contract
registers more queries than that. This job runs the SAME comparison shape
— Spark result vs the registered DuckDB oracle at sf=0.01: row count,
sorted column-name schema, and an order-insensitive value hash with
columns sorted by name — for EVERY query, and writes
``SELFCHECK_r{N}.json`` at the repo root so the overflow queries never
ship on pytest alone (r4 verdict item #1, option (b)).

Float normalization matches tests/test_oracle_parity.py: round to 9
decimal places (the registered oracles already round any genuinely
engine-divergent float to <= 6 places, so 9 is slack, not load-bearing).

Usage: python jobs/selfcheck.py [round_number] [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 9)
    return v


def normalize(rows, columns):
    """Columns sorted by name, rows sorted by repr — the driver's shape."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = sorted(
        (tuple(_norm_cell(row[i]) for i in order) for row in rows), key=repr
    )
    return sorted(columns), out


def value_hash(norm_rows) -> str:
    h = hashlib.sha256()
    for row in norm_rows:
        h.update(repr(row).encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import duckdb

    from gazetteer_entity_parser_spark.plans.queries import ORACLES, QUERIES
    from gazetteer_entity_parser_spark.session import build_session

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = build_session(
        "gazetteer-kg-selfcheck",
        parallelism=8,
        shuffle_partitions=16,
        extra_conf={"spark.driver.memory": "8g"},
    )

    results: dict[str, dict] = {}
    t_start = time.time()
    for name, fn in QUERIES.items():
        rec = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
            "spark_hash": None, "oracle_hash": None,
        }
        try:
            sdf = fn(spark, sf_dir)
            s_cols_raw = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]

            oracle = ORACLES.get(name)
            if oracle is None:
                rec["err"] = "no oracle registered"
                results[name] = rec
                continue
            res = con.execute(oracle)
            d_cols_raw = [d[0] for d in res.description]
            d_rows = res.fetchall()

            s_cols, s_norm = normalize(s_rows, s_cols_raw)
            d_cols, d_norm = normalize(d_rows, d_cols_raw)
            rec["spark_rows"] = len(s_norm)
            rec["oracle_rows"] = len(d_norm)
            rec["rows_match"] = len(s_norm) == len(d_norm)
            rec["schema_match"] = s_cols == d_cols
            rec["spark_hash"] = value_hash(s_norm)
            rec["oracle_hash"] = value_hash(d_norm)
            rec["hash_match"] = rec["spark_hash"] == rec["oracle_hash"]
        except Exception as e:  # noqa: BLE001 — record, don't abort the sweep
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
        results[name] = rec
        ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        print(f"{'PASS' if ok else 'FAIL'} {name} "
              f"({rec['spark_rows']} vs {rec['oracle_rows']} rows)", flush=True)

    out = {
        "_meta": {
            "round": rnd,
            "sf_dir": sf_dir,
            "n_queries": len(results),
            "n_green": sum(
                1 for r in results.values()
                if r["rows_match"] and r["schema_match"] and r["hash_match"]
            ),
            "wall_sec": round(time.time() - t_start, 1),
            "note": (
                "self-run of the driver comparison (rows + sorted-column "
                "schema + order-insensitive value hash) over ALL registered "
                "queries; the driver's own CORRECTNESS file caps at 50"
            ),
        },
        **results,
    }
    path = os.path.join(REPO, f"SELFCHECK_r{rnd:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {out['_meta']['n_green']}/{len(results)} green")
    spark.stop()
    return 0 if out["_meta"]["n_green"] == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
