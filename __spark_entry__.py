"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The engine lives in ``gazetteer_entity_parser_spark/`` (see SURVEY.md §2 and
COVERAGE.md for the operator inventory each query covers). All queries are
oracle-backed except ``sim_ann_lsh_topk``, which is approximate by design
(recall at the SHIPPED parameters measured and pinned at 0.4433 in
tests/test_similarity.py::test_lsh_topk_driver_params_recall_pinned).
``dedup_simhash`` gained an exact closed-form oracle: the pigeonhole join is
exact for hamming <= 3, and the FNV-1a fingerprint fold is expressed in
DuckDB with recursive-CTE HUGEINT mod-2^64 arithmetic.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG construction on sf0.001 — corpus-derived gazetteer →
    broadcast index → mapInPandas mention extraction → windowed co-occurrence
    triples → canonicalization."""
    from gazetteer_entity_parser_spark.plans.queries import q_kg_triples_canonical

    return q_kg_triples_canonical(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gazetteer_entity_parser_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from gazetteer_entity_parser_spark.plans.queries import ORACLES

    return dict(ORACLES)
