"""Reusable pyspark column expressions (all JVM-side, codegen-friendly).

One import point for the expression-level building blocks the operators are
composed from, so pipelines can reuse them a la carte.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.dedup import minhash_signature, token_shingles
from ..operators.similarity import hyperplane_signs
from ..sources.builder_job import tokenize_udf

__all__ = [
    "cosine_expr",
    "dot_expr",
    "hyperplane_signs",
    "minhash_signature",
    "norm_expr",
    "salted_bucket",
    "token_shingles",
    "tokenize_udf",
    "ws_tokens",
]


def ws_tokens(text_col):
    """Whitespace tokens as an array column (JVM split; for kernel-exact
    tokenization incl. unicode spans use ``tokenize_udf``)."""
    return F.filter(F.split(text_col, r"\s+"), lambda t: t != "")


def dot_expr(a, b):
    """Dot product of two numeric array columns (index-ordered fold)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def norm_expr(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))


def cosine_expr(a, b):
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def salted_bucket(key_col, n_buckets: int):
    """Deterministic skew-spreading bucket: pmod(xxhash64(key), n)."""
    return F.pmod(F.xxhash64(key_col), F.lit(n_buckets)).cast("int")
