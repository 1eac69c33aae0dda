"""Pluggable generation surface (O-5 replacement): deterministic fallbacks
must match the reference's non-LLM behavior exactly."""

from entity_extractor_linker_api_v2_spark.functions.generation import (
    DEFAULT_GENERATOR, DeterministicGenerator)


def test_synonyms_reference_fallback_dict():
    g = DeterministicGenerator()
    # utils.py:142-145 fallback dict, truncated by max_synonyms
    assert g.synonyms("Berg") == ["Gebirge", "Erhebung"]
    assert g.synonyms("Berg", max_synonyms=1) == ["Gebirge"]
    assert g.synonyms("unbekannt") == []


def test_translate_reference_fallback_string():
    # utils.py:200 exact fallback format
    assert DEFAULT_GENERATOR.translate("Hallo Welt", "en") == \
        "[en translation of]: Hallo Welt"


def test_qa_pairs_deterministic_and_truncated():
    g = DeterministicGenerator()
    pairs = g.qa_pairs("Satz eins. Satz zwei! " + "x" * 100 + ".", num_pairs=2,
                       max_chars=10)
    assert len(pairs) == 2
    assert pairs[0] == ("Was besagt Satz 1?", "Satz eins.")
    assert pairs[1] == ("Was besagt Satz 2?", "Satz zwei!")
    long_pair = g.qa_pairs("x" * 100 + ".", num_pairs=1, max_chars=10)[0]
    assert long_pair[1].endswith("...") and len(long_pair[1]) <= 10
    assert g.qa_pairs("Satz eins.", 5) == g.qa_pairs("Satz eins.", 5)


def test_compendium_shape():
    md = DEFAULT_GENERATOR.compendium("Thema", "**X**: Beschreibung")
    assert md.startswith("# Thema\n\n**X**")
    assert "Keine Quellen" in DEFAULT_GENERATOR.compendium("T", "")
