"""Spark-free matching kernel: tokenizer, registry, parser, builder.

This subpackage has zero Spark dependencies so the exact same code runs (a)
in unit tests against the reference's golden cases and (b) inside Arrow
batches on executors via ``mapInPandas``.
"""

from .builder import (
    LicenseInfo,
    ParserBuilder,
    dump_parser,
    get_parser_config,
    load_parser,
)
from .fmath import check_threshold, f32
from .parser import ParsedValue, Parser, ResolvedValue
from .registry import Registry
from .tokenizer import tokenize, tokens_only

__all__ = [
    "LicenseInfo",
    "ParsedValue",
    "Parser",
    "ParserBuilder",
    "Registry",
    "ResolvedValue",
    "check_threshold",
    "dump_parser",
    "f32",
    "get_parser_config",
    "load_parser",
    "tokenize",
    "tokens_only",
]
