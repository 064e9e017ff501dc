"""Entity resolution over gazetteer values: blocked edit-distance matching.

KG construction's node-dedup step — two gazetteer entries whose surface
forms are a typo apart ("analyis" / "analysis") should resolve to one
entity node before triples are aggregated. The classic ER shape:

1. BLOCK: candidate pairs share a cheap key (here the first character),
   turning the O(n^2) all-pairs comparison into per-block joins. Standard
   recall trade (a first-character typo escapes the block), documented and
   chosen because it is also exactly expressible in the SQL oracle.
2. RESIDUAL FILTERS inside the block: length band (|len_a - len_b| <=
   max_distance — a free lower bound on edit distance) before the
   quadratic-cost levenshtein() evaluates.
3. MATCH: classic Levenshtein distance <= max_distance, value_a < value_b
   canonical orientation. Spark's `levenshtein` and DuckDB's `levenshtein`
   implement the same unit-cost edit distance, so the operator is
   oracle-checkable bit-for-bit.

Scale shape: the join is equi-keyed on the block key — per-block work is
O(block^2) worst case, so block keys must be chosen to bound block size
(first char is fine for word-like gazetteers; for web-scale entity tables
use (first char, soundex) or minhash blocking — same plan shape, finer
key). The levenshtein filter runs inside the join's codegen stage; nothing
but (block_key) shuffles.

Reference parity note: the reference parser (lib.rs) has no fuzzy node
merge — this is a pipeline-surface addition (SURVEY.md LLM-pipeline
family), like dedup/ANN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_similar_values(
    gazetteer: DataFrame,
    max_distance: int = 2,
    value_col: str = "raw_value",
    entity_col: str = "resolved_value",
    exclude_same_entity: bool = True,
) -> DataFrame:
    """Candidate merge pairs among gazetteer surface forms: same first
    character, length within ``max_distance``, Levenshtein distance <=
    ``max_distance``. With ``exclude_same_entity`` (default) pairs that
    already resolve to the same entity are dropped — the parser resolves
    those; ER's job is the CROSS-entity near-collisions. Output:
    (value_a, value_b, entity_a, entity_b, distance), value_a < value_b."""
    if max_distance < 1:
        raise ValueError(f"max_distance must be >= 1, got {max_distance}")
    left = gazetteer.select(
        F.substring(F.col(value_col), 1, 1).alias("_blk"),
        F.col(value_col).alias("value_a"),
        F.col(entity_col).alias("entity_a"),
    )
    right = gazetteer.select(
        F.substring(F.col(value_col), 1, 1).alias("_blk"),
        F.col(value_col).alias("value_b"),
        F.col(entity_col).alias("entity_b"),
    )
    d = int(max_distance)
    cond = (
        (F.col("value_a") < F.col("value_b"))
        & (F.abs(F.length("value_a") - F.length("value_b")) <= d)
        & (F.levenshtein("value_a", "value_b") <= d)
    )
    if exclude_same_entity:
        cond = cond & (F.col("entity_a") != F.col("entity_b"))
    return (
        left.join(right, "_blk")
        .where(cond)
        .select(
            "value_a",
            "value_b",
            "entity_a",
            "entity_b",
            F.levenshtein("value_a", "value_b").cast("int").alias("distance"),
        )
    )
