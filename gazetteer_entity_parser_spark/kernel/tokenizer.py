"""Whitespace tokenizer with character-offset spans.

Re-expresses the reference tokenizer (reference: src/utils.rs:17-58): split on
runs of Unicode whitespace, yield ``(char_start, char_end, token)`` where the
offsets are *code point* offsets (Rust iterates ``chars()``; Python ``str``
indexing is code-point based, so ``re`` match offsets line up exactly —
pinned by the UTF-8 golden tests, reference: src/utils.rs:64-91).

Python's ``\\s`` additionally matches U+001C..U+001F (information
separators), which Rust's ``char::is_whitespace`` (Unicode ``White_Space``)
does not; the token pattern folds those four code points back into token
characters so tokenization is bit-identical to the reference.
"""

from __future__ import annotations

import re

# A token is a maximal run of characters that are either non-whitespace in
# Python's sense or one of U+001C..U+001F (whitespace to Python, token
# characters to Rust's White_Space-based tokenizer).
_TOKEN_RE = re.compile(r"[\S\x1c-\x1f]+")


def tokenize(text: str) -> list[tuple[int, int, str]]:
    """Return [(char_begin, char_end, token), ...] for ``text``.

    Consecutive whitespace collapses (no empty tokens); leading/trailing
    whitespace produces no tokens (reference: src/utils.rs:64-72).
    """
    return [(m.start(), m.end(), m.group()) for m in _TOKEN_RE.finditer(text)]


def tokens_only(text: str) -> list[str]:
    """Tokens without spans (reference: src/data.rs:15-23 into_tokenized)."""
    return _TOKEN_RE.findall(text)
