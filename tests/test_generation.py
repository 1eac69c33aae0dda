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


# ---------------------------------------------------------------------------
# mode="generate" (ref linker.py:120-137, openai_wrapper.py:207-338) —
# mirrors the reference's extract/generate parametrization
# (reference tests/test_linker.py:9-44)
# ---------------------------------------------------------------------------

import pytest

SF_SMALL = "/root/testdata/sf0.001"


@pytest.mark.parametrize("mode", ["extract", "generate"])
def test_pipeline_modes_share_downstream_schema(spark, mode):
    from entity_extractor_linker_api_v2_spark.plans.pipeline import run_pipeline
    out = run_pipeline(spark, SF_SMALL, mode=mode)
    ents = out["entities"]
    assert ents.count() > 0
    base = run_pipeline(spark, SF_SMALL, mode="extract")["entities"]
    assert ents.columns == base.columns
    if mode == "generate":
        # generated labels are exact KB titles -> they link
        assert ents.filter("status = 'linked'").count() > 0


def test_pipeline_unknown_mode_raises(spark):
    from entity_extractor_linker_api_v2_spark.plans.pipeline import run_pipeline
    with pytest.raises(ValueError, match="Unknown mode"):
        run_pipeline(spark, SF_SMALL, mode="hallucinate")


def test_generate_mentions_matches_python_twin(spark):
    """Spark relational generate ≡ DeterministicGenerator.entities row-wise."""
    from entity_extractor_linker_api_v2_spark.operators.generate import generate_mentions
    from entity_extractor_linker_api_v2_spark.sources import tables

    docs = tables.docs_table(spark, SF_SMALL, with_html=False).limit(60).cache()
    got = {}
    for r in generate_mentions(docs, text_col="body_text").collect():
        got.setdefault(r["url"], []).append((r["mention_idx"], r["label"], r["type"]))
    g = DeterministicGenerator()
    for row in docs.select("url", "body_text", "link_lang").collect():
        want = g.entities(row["body_text"], max_entities=10, lang=row["link_lang"])
        have = [(l, t) for _, l, t in sorted(got.get(row["url"], []))]
        assert have == want, (row["url"], have, want)


def test_split_threshold_equals_whole_document(spark):
    """Chunked detection (TEXT_SPLIT_THRESHOLD wired for real) must equal
    whole-document first-occurrence semantics bit-for-bit."""
    from entity_extractor_linker_api_v2_spark.plans.pipeline import run_pipeline

    cols = ["url", "label", "type", "pos", "mention_idx"]
    whole = {tuple(r) for r in
             run_pipeline(spark, SF_SMALL)["mentions"].select(*cols).collect()}
    split = {tuple(r) for r in
             run_pipeline(spark, SF_SMALL, split_threshold=120)["mentions"]
             .select(*cols).collect()}
    assert whole == split
