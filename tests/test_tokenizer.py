"""Tokenizer goldens transcribed from reference: src/utils.rs:64-91."""

from gazetteer_entity_parser_spark.kernel import tokenize


def test_multiple_spaces():
    assert tokenize("ceci est un   \t test ") == [
        (0, 4, "ceci"),
        (5, 8, "est"),
        (9, 11, "un"),
        (16, 20, "test"),
    ]


def test_utf8_char_offsets():
    assert tokenize("c'est épatant\r\n") == [(0, 5, "c'est"), (6, 13, "épatant")]
    assert tokenize("дра \t नमस्ते") == [(0, 3, "дра"), (6, 12, "नमस्ते")]
    assert tokenize("je veux écouter les rolling stones") == [
        (0, 2, "je"),
        (3, 7, "veux"),
        (8, 15, "écouter"),
        (16, 19, "les"),
        (20, 27, "rolling"),
        (28, 34, "stones"),
    ]


def test_empty_and_all_whitespace():
    assert tokenize("") == []
    assert tokenize("  \t\n ") == []


def test_unicode_whitespace_kinds():
    # U+00A0 (nbsp) and U+3000 (ideographic space) are separators
    assert tokenize("a b　c") == [(0, 1, "a"), (2, 3, "b"), (4, 5, "c")]


def test_info_separators_are_not_whitespace():
    # U+001C..U+001F are whitespace to Python's \s but NOT to Rust's
    # char::is_whitespace; they must stay inside tokens.
    assert tokenize("a\x1cb c") == [(0, 3, "a\x1cb"), (4, 5, "c")]
