"""Builder + persistence goldens (reference: src/parser_builder.rs:104-289,
src/parser.rs:646-698)."""

import json

import pytest

from gazetteer_entity_parser_spark.kernel import (
    LicenseInfo,
    ParserBuilder,
    dump_parser,
    f32,
    get_parser_config,
    load_parser,
)


GAZ = [
    ("the flying stones", "The Flying Stones"),
    ("the rolling stones", "The Rolling Stones"),
    ("the stones", "The Rolling Stones"),
]


def test_builder_matches_manual_assembly():
    # reference: src/parser_builder.rs:119-180 — builder ≡ manual add_value loop
    from gazetteer_entity_parser_spark.kernel import Parser, Registry, tokens_only

    built = (
        ParserBuilder()
        .set_gazetteer(GAZ)
        .minimum_tokens_ratio(0.5)
        .n_stop_words(2)
        .set_additional_stop_words(["hello"])
        .build()
    )

    reg = Registry()
    for rank, (raw, res) in enumerate(GAZ):
        reg.add_value(tokens_only(raw), res, rank)
    reg.set_stop_words(2, ["hello"])
    manual = Parser(reg, 0.5)

    assert built.registry == manual.registry
    assert built.threshold == manual.threshold


def test_builder_rejects_bad_threshold():
    # reference: src/parser_builder.rs:83-88
    for bad in (-0.1, 1.5):
        with pytest.raises(ValueError):
            ParserBuilder().set_gazetteer(GAZ).minimum_tokens_ratio(bad).build()


def test_builder_json_round_trip():
    # reference: src/parser_builder.rs:247-289 (serde round-trip incl. license)
    b = (
        ParserBuilder()
        .set_gazetteer(GAZ)
        .minimum_tokens_ratio(0.5)
        .n_stop_words(2)
        .set_additional_stop_words(["hello"])
        .set_license_info(LicenseInfo("LICENSE", "Some content here"))
    )
    b2 = ParserBuilder.from_json(b.to_json())
    assert b2 == b
    # license_info optional with serde(default) (reference: src/parser_builder.rs:15)
    payload = json.loads(b.to_json())
    del payload["license_info"]
    b3 = ParserBuilder.from_json(json.dumps(payload))
    assert b3.license_info is None


def test_serialization_round_trip(tmp_path):
    # reference: src/parser.rs:646-698 — dump → load must be behavior-identical
    # (re-expressed as index rebuild), metadata content pinned
    parser = (
        ParserBuilder()
        .set_gazetteer(GAZ)
        .minimum_tokens_ratio(0.5)
        .n_stop_words(2)
        .set_additional_stop_words(["hello"])
        .set_license_info(LicenseInfo("LICENSE", "Some content here"))
        .build()
    )
    folder = str(tmp_path / "parser")
    dump_parser(parser, folder)

    with open(tmp_path / "parser" / "LICENSE") as fh:
        assert fh.read() == "Some content here"

    reloaded = load_parser(folder)
    assert reloaded.registry == parser.registry
    assert reloaded.threshold == parser.threshold

    config = get_parser_config(parser)
    assert config["threshold"] == f32(0.5)
    assert set(config["stop_words"]) == {"the", "stones", "hello"}
    assert set(config["edge_cases"]) == {"The Rolling Stones"}

    # behavior identity on a query that exercises stop words + edge cases
    q = "je veux écouter les the stones"
    assert parser.run(q, 5) == reloaded.run(q, 5)


def test_round_trip_preserves_injection(tmp_path):
    parser = (
        ParserBuilder().set_gazetteer(GAZ).minimum_tokens_ratio(0.5).build()
    )
    parser = parser.inject_new_values(
        [("the crying stones", "The Crying Stones")], prepend=True, from_vanilla=False
    )
    folder = str(tmp_path / "parser")
    dump_parser(parser, folder)
    reloaded = load_parser(folder)
    assert reloaded.registry == parser.registry
    # vanilla reset still works after reload
    reset = reloaded.inject_new_values([], prepend=False, from_vanilla=True)
    assert [row[1] for row in reset.registry.get_entity_values(True)] == [
        "The Flying Stones",
        "The Rolling Stones",
        "The Rolling Stones",
    ]
