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


def test_load_restores_persisted_stop_words_verbatim(tmp_path):
    """load_parser must restore the dumped stop-word SET, not recompute the
    top-n: a rebuilt registry's interning order (e.g. after prepend) can
    flip a doc-frequency tie and make the reloaded parser resolve
    differently than the one that was dumped."""
    from gazetteer_entity_parser_spark.kernel.builder import (
        ParserBuilder,
        dump_parser,
        load_parser,
    )

    parser = (
        ParserBuilder()
        .set_gazetteer([("the stones", "A"), ("the who", "B"), ("who else", "C")])
        .n_stop_words(1)
        .build()
    )
    # simulate a tie-divergent live set: force the stop word to 'who'
    # (doc-frequency-tied with 'the' at 2 entities each)
    reg = parser.registry
    who = reg.get_token_idx("who")
    reg.stop_words = frozenset({who})
    reg.edge_cases = frozenset(
        ev for ev, toks in enumerate(reg.entity_tokens)
        if all(t in reg.stop_words for t in toks)
    )
    assert reg.get_stop_words() == {"who"}

    folder = str(tmp_path / "dump")
    dump_parser(parser, folder)
    reloaded = load_parser(folder)
    # a top-n recompute would pick 'the' (earlier-interned tie-break);
    # the persisted set must win
    assert reloaded.registry.get_stop_words() == {"who"}


def test_dump_load_roundtrips_license(tmp_path):
    from gazetteer_entity_parser_spark.kernel.builder import (
        LicenseInfo,
        ParserBuilder,
        dump_parser,
        load_parser,
    )

    parser = (
        ParserBuilder()
        .set_gazetteer([("a b", "AB")])
        .set_license_info(LicenseInfo("LICENSE", "MIT-ish text"))
        .build()
    )
    folder = str(tmp_path / "dump")
    dump_parser(parser, folder)
    p2 = load_parser(folder)
    assert p2.license_info is not None
    assert p2.license_info.filename == "LICENSE"
    assert p2.license_info.content == "MIT-ish text"
    # and a second dump carries it forward (was silently lost before)
    folder2 = str(tmp_path / "dump2")
    dump_parser(p2, folder2)
    assert (tmp_path / "dump2" / "LICENSE").read_text() == "MIT-ish text"


def test_dump_rejects_colliding_or_traversing_license_filename(tmp_path):
    """A license filename colliding with the dump's own files would clobber
    them (license is written after the gazetteer); separators/'..' would
    escape the folder on load."""
    import pytest

    from gazetteer_entity_parser_spark.kernel.builder import (
        LicenseInfo,
        ParserBuilder,
        dump_parser,
    )

    for bad in ("gazetteer.json", "metadata.json", "../escape", "a/b", "", ".."):
        parser = (
            ParserBuilder()
            .set_gazetteer([("a b", "AB")])
            .set_license_info(LicenseInfo(bad, "x"))
            .build()
        )
        with pytest.raises(ValueError, match="license filename"):
            dump_parser(parser, str(tmp_path / ("d" + str(hash(bad)))))
