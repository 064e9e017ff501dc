"""End-to-end kernel goldens transcribed from the reference's own test suite
(reference: src/parser.rs:646-1437, src/lib.rs:12-95, README.rst:12-60).

Every expected value below is hand-copied from the Rust tests; these pin
bit-level parity of the matching kernel (char ranges, rank ties, stop words,
thresholds in f32, injection, alternatives)."""

import pytest

from gazetteer_entity_parser_spark.kernel import Parser, ParserBuilder


def build(gazetteer, threshold=1.0, n_stop_words=None, additional=None) -> Parser:
    b = ParserBuilder().set_gazetteer(gazetteer).minimum_tokens_ratio(threshold)
    if n_stop_words is not None:
        b = b.n_stop_words(n_stop_words)
    if additional is not None:
        b = b.set_additional_stop_words(additional)
    return b.build()


def simplify(parsed):
    """(matched, resolved, raw, begin, end, [alt (resolved, raw)...])"""
    return [
        (
            p.matched_value,
            p.resolved_value.resolved,
            p.resolved_value.raw_value,
            p.range[0],
            p.range[1],
            [(a.resolved, a.raw_value) for a in p.alternatives],
        )
        for p in parsed
    ]


# --------------------------------------------------------------------------
# reference: src/parser.rs:820-861 (test_parse)


def test_parse_basic():
    parser = build(
        [
            ("the flying stones", "The Flying Stones"),
            ("the rolling stones", "The Rolling Stones"),
            ("blink one eight two", "Blink-182"),
            ("je suis animal", "Je Suis Animal"),
        ],
        threshold=0.0,
    )
    parsed = parser.run("i want to listen to rolling stones and blink eight", 5)
    assert simplify(parsed) == [
        ("rolling stones", "The Rolling Stones", "the rolling stones", 20, 34, []),
        ("blink eight", "Blink-182", "blink one eight two", 39, 50, []),
    ]
    assert parser.run("joue moi quelque chose", 5) == []


# reference: src/parser.rs:863-920 (test_multiple_raw_values)


def test_multiple_raw_values():
    gaz = [
        ("blink one eight two", "Blink-182"),
        ("blink 182", "Blink-182"),
        ("blink", "Blink-182"),
    ]
    parser = build(gaz, threshold=0.0)
    assert simplify(parser.run("let's listen to blink 182", 5)) == [
        ("blink 182", "Blink-182", "blink 182", 16, 25, [])
    ]
    parser = build(gaz, threshold=0.5)
    assert simplify(parser.run("let's listen to blink", 5)) == [
        ("blink", "Blink-182", "blink", 16, 21, [])
    ]
    assert simplify(parser.run("let's listen to one eight two", 5)) == [
        ("one eight two", "Blink-182", "blink one eight two", 16, 29, [])
    ]


# reference: src/parser.rs:922-985 (test_disambiguation_with_ranking)


def test_disambiguation_with_ranking():
    parser = build(
        [
            ("jacques brel", "Jacques Brel"),
            ("the rolling stones", "The Rolling Stones"),
            ("the flying stones", "The Flying Stones"),
            ("daniel brel", "Daniel Brel"),
            ("jacques", "Jacques"),
        ],
        threshold=0.5,
    )
    assert simplify(parser.run("je veux écouter the stones", 5)) == [
        (
            "the stones",
            "The Rolling Stones",
            "the rolling stones",
            16,
            26,
            [("The Flying Stones", "the flying stones")],
        )
    ]
    assert simplify(parser.run("je veux écouter the flying stones", 5)) == [
        ("the flying stones", "The Flying Stones", "the flying stones", 16, 33, [])
    ]
    assert simplify(parser.run("je veux écouter jacques", 5)) == [
        ("jacques", "Jacques", "jacques", 16, 23, [])
    ]


# reference: src/parser.rs:700-818 (test_handling_stop_words_and_edge_cases)


@pytest.fixture
def stop_word_parser():
    return build(
        [
            ("the flying stones", "The Flying Stones"),
            ("the rolling stones", "The Rolling Stones"),
            ("the stones rolling", "The Stones Rolling"),
            ("the stones", "The Stones"),
        ],
        threshold=0.5,
        n_stop_words=2,
        additional=["hello"],
    )


def test_stop_words_and_edge_cases(stop_word_parser):
    parser = stop_word_parser
    from gazetteer_entity_parser_spark.kernel import f32

    parser.threshold = f32(0.6)
    assert simplify(parser.run("je veux écouter les the rolling", 5)) == [
        (
            "the rolling",
            "The Rolling Stones",
            "the rolling stones",
            20,
            31,
            [("The Stones Rolling", "the stones rolling")],
        )
    ]

    parser.threshold = f32(1.0)
    assert simplify(parser.run("je veux écouter les the rolling stones", 5)) == [
        ("the rolling stones", "The Rolling Stones", "the rolling stones", 20, 38, [])
    ]
    assert simplify(parser.run("je veux écouter les the stones rolling", 5)) == [
        ("the stones rolling", "The Stones Rolling", "the stones rolling", 20, 38, [])
    ]
    assert simplify(parser.run("je veux écouter les the stones", 5)) == [
        ("the stones", "The Stones", "the stones", 20, 30, [])
    ]

    parser.threshold = f32(0.5)
    assert parser.run("je veux écouter les the", 5) == []
    assert simplify(parser.run("hello I want to listen to the rolling stones", 5)) == [
        ("the rolling stones", "The Rolling Stones", "the rolling stones", 26, 44, [])
    ]
    assert simplify(parser.run("hello I want to listen to the the rolling stones", 5)) == [
        ("the rolling stones", "The Rolling Stones", "the rolling stones", 30, 48, [])
    ]


# reference: src/parser.rs:987-998 (non-adjacent tokens)


def test_should_not_parse_non_adjacent_tokens():
    parser = build([("the rolling stones", "The Rolling Stones")], threshold=0.5)
    assert parser.run("the music I want to listen to is rolling on stones", 5) == []


# reference: src/parser.rs:1000-1022 (unicode whitespace + offsets)


def test_should_parse_with_unicode_whitespace():
    parser = build([("quand est -ce", "Quand est-ce ?")], threshold=0.5)
    assert simplify(parser.run("non quand est survivre", 5)) == [
        ("quand est", "Quand est-ce ?", "quand est -ce", 4, 13, [])
    ]


# reference: src/parser.rs:1024-1046 (out-of-order restart)


def test_should_parse_with_mixed_ordered_entity():
    parser = build([("the rolling stones", "The Rolling Stones")], threshold=0.5)
    assert simplify(parser.run("rolling the stones", 5)) == [
        ("the stones", "The Rolling Stones", "the rolling stones", 8, 18, [])
    ]


# reference: src/parser.rs:1048-1138 (threshold sweep)


def test_parser_with_threshold():
    gaz = [
        ("the flying stones", "The Flying Stones"),
        ("the rolling stones", "The Rolling Stones"),
        ("blink one eight two", "Blink-182"),
        ("je suis animal", "Je Suis Animal"),
        ("les enfoirés", "Les Enfoirés"),
    ]
    parser = build(gaz, threshold=0.5)
    assert simplify(parser.run("je veux écouter les rolling stones", 5)) == [
        ("les", "Les Enfoirés", "les enfoirés", 16, 19, []),
        ("rolling stones", "The Rolling Stones", "the rolling stones", 20, 34, []),
    ]

    parser = build(gaz, threshold=0.3)
    assert simplify(parser.run("je veux écouter les rolling stones", 5)) == [
        ("je", "Je Suis Animal", "je suis animal", 0, 2, []),
        ("les", "Les Enfoirés", "les enfoirés", 16, 19, []),
        ("rolling stones", "The Rolling Stones", "the rolling stones", 20, 34, []),
    ]

    parser = build(gaz, threshold=0.6)
    assert simplify(parser.run("je veux écouter les rolling stones", 5)) == [
        ("rolling stones", "The Rolling Stones", "the rolling stones", 20, 34, []),
    ]


# reference: src/parser.rs:1140-1166 (repeated words)


def test_repeated_words():
    parser = build([("the rolling stones", "The Rolling Stones")], threshold=0.5)
    assert parser.run("the the the", 5) == []

    parser = build([("the rolling stones", "The Rolling Stones")], threshold=1.0)
    assert simplify(
        parser.run("the the the rolling stones stones stones stones", 5)
    ) == [("the rolling stones", "The Rolling Stones", "the rolling stones", 8, 26, [])]


# reference: src/parser.rs:1168-1252 (injection + ranking)


def test_parsing_should_use_ranking_after_injection():
    parser = build([("the rolling stones", "The Rolling Stones")], threshold=0.6)
    new_values = [("the flying stones", "The Flying Stones")]

    parser = parser.inject_new_values(new_values, prepend=False, from_vanilla=False)
    assert simplify(parser.run("je veux écouter les flying stones", 5)) == [
        ("flying stones", "The Flying Stones", "the flying stones", 20, 33, [])
    ]
    assert simplify(parser.run("je veux écouter the stones", 5)) == [
        (
            "the stones",
            "The Rolling Stones",
            "the rolling stones",
            16,
            26,
            [("The Flying Stones", "the flying stones")],
        )
    ]

    parser = parser.inject_new_values(new_values, prepend=True, from_vanilla=True)
    assert simplify(parser.run("je veux écouter les flying stones", 5)) == [
        ("flying stones", "The Flying Stones", "the flying stones", 20, 33, [])
    ]
    assert simplify(parser.run("je veux écouter the stones", 5)) == [
        (
            "the stones",
            "The Flying Stones",
            "the flying stones",
            16,
            26,
            [("The Rolling Stones", "the rolling stones")],
        )
    ]


# reference: src/parser.rs:1254-1294 (injection from vanilla)


def test_injection_from_vanilla():
    parser = build([("the rolling stones", "The Rolling Stones")], threshold=0.6)
    parser = parser.inject_new_values(
        [("the flying stones", "The Flying Stones")], prepend=True, from_vanilla=False
    )
    parser = parser.inject_new_values(
        [("queens of the stone age", "Queens Of The Stone Age")],
        prepend=True,
        from_vanilla=True,
    )
    assert parser.run("je veux écouter les flying stones", 5) == []
    assert simplify(parser.run("je veux écouter queens the stone age", 5)) == [
        (
            "queens the stone age",
            "Queens Of The Stone Age",
            "queens of the stone age",
            16,
            36,
            [],
        )
    ]


# reference: src/parser.rs:1296-1365 (longest substring)


def test_match_longest_substring():
    parser = build(
        [
            ("black and white", "Black And White"),
            ("album", "Album"),
            ("the black and white album", "The Black and White Album"),
            ("one two three four", "1 2 3 4"),
            ("three four five", "3 4 5"),
            ("five six", "5 6"),
        ],
        threshold=0.7,
    )
    assert simplify(parser.run("je veux écouter le black and white album", 5)) == [
        (
            "black and white album",
            "The Black and White Album",
            "the black and white album",
            19,
            40,
            [],
        )
    ]
    assert simplify(parser.run("zero one two three four five", 5)) == [
        ("one two three four", "1 2 3 4", "one two three four", 5, 23, [])
    ]
    assert simplify(parser.run("zero one two three four five six", 5)) == [
        ("one two three four", "1 2 3 4", "one two three four", 5, 23, []),
        ("five six", "5 6", "five six", 24, 32, []),
    ]


# reference: src/parser.rs:1367-1397 (alternatives)


def test_alternative_matches():
    parser = build(
        [
            ("space invader", "Space Invader"),
            ("invader on mars", "Invader on Mars"),
            ("invader attack", "Invader Attack"),
        ],
        threshold=0.5,
    )
    assert simplify(parser.run("I want to play to invader", 5)) == [
        (
            "invader",
            "Space Invader",
            "space invader",
            18,
            25,
            [("Invader Attack", "invader attack")],
        )
    ]


# reference: src/parser.rs:1399-1436 (max alternatives cap)


def test_max_alternative_matches():
    parser = build(
        [
            ("space invader", "Space Invader"),
            ("invader war", "Invader War"),
            ("invader attack", "Invader Attack"),
            ("invader life", "Invader Life"),
        ],
        threshold=0.5,
    )
    assert simplify(parser.run("I want to play to invader", 2)) == [
        (
            "invader",
            "Space Invader",
            "space invader",
            18,
            25,
            [("Invader War", "invader war"), ("Invader Attack", "invader attack")],
        )
    ]


# reference: README.rst:12-60 (2/3 threshold in f32)


def test_readme_two_thirds_threshold():
    parser = build(
        [
            ("king of pop", "Michael Jackson"),
            ("the rolling stones", "The Rolling Stones"),
            ("the crying stones", "The Crying Stones"),
            ("the fab four", "The Beatles"),
            ("queen of soul", "Aretha Franklin"),
        ],
        threshold=2.0 / 3.0,
    )
    assert simplify(parser.run("My favourite artists are the stones and fab four", 5)) == [
        (
            "the stones",
            "The Rolling Stones",
            "the rolling stones",
            25,
            35,
            [("The Crying Stones", "the crying stones")],
        ),
        ("fab four", "The Beatles", "the fab four", 40, 48, []),
    ]


# reference: src/lib.rs:12-95 (doc-test scenario)


def test_lib_doc_scenario():
    parser = build(
        [
            ("the rolling stones", "The Rolling Stones"),
            ("the strokes", "The Strokes"),
            ("the hives", "The Hives"),
            ("jacques brel", "Jacques Brel"),
            ("daniel brel", "Daniel Brel"),
        ],
        threshold=0.5,
        n_stop_words=1,
        additional=["a", "for"],
    )
    assert simplify(parser.run("I want to listen to the stones", 5)) == [
        ("the stones", "The Rolling Stones", "the rolling stones", 20, 30, [])
    ]
    assert simplify(parser.run("I want to listen to brel", 5)) == [
        ("brel", "Jacques Brel", "jacques brel", 20, 24, [("Daniel Brel", "daniel brel")])
    ]
