"""Linking against a 10^4–10^5-row KB: same plan, same results — the
dimension's size must not change semantics (and the alias dictionary build
is itself a distributed job, not driver-side python)."""

from conftest import SF_SMALL


def test_linking_against_scaled_kb_matches_fixture_kb(spark):
    from entity_extractor_linker_api_v2_spark import fixtures
    from entity_extractor_linker_api_v2_spark.operators import linking
    from entity_extractor_linker_api_v2_spark.plans.pipeline import (
        extract_stage, mention_stage)
    from entity_extractor_linker_api_v2_spark.sources import tables

    docs = extract_stage(tables.docs_table(spark, SF_SMALL))
    ments = mention_stage(docs).persist()

    small = linking.link_mentions(spark, ments)
    kb_big = fixtures.scaled_kb_df(spark, n_pages=20_000)
    al_big = fixtures.scaled_aliases_df(spark, kb_big)
    big = linking.link_mentions(spark, ments, aliases=al_big, kb=kb_big)

    cols = ["url", "label", "label_de", "wikidata_id", "status"]
    a = {tuple(r) for r in small.select(cols).collect()}
    b = {tuple(r) for r in big.select(cols).collect()}
    assert a == b and len(a) > 0


def test_scaled_alias_dict_covers_fixture_aliases(spark):
    from entity_extractor_linker_api_v2_spark import fixtures
    got = {(r.alias, r.title, r.lang)
           for r in fixtures.scaled_aliases_df(
               spark, fixtures.kb_pages_df(spark)).collect()}
    want = {(a, t, lang) for a, t, lang, _ in fixtures.alias_rows()}
    assert want == got


def test_bucketed_linking_matches_broadcast_at_scaled_kb(spark, tmp_path):
    """The beyond-broadcast bucketed path must stay value-identical to the
    broadcast path at a 100x-alias scaled KB (20k pages), not just on the
    fixture dims — the regime the bucketed tables exist for."""
    from entity_extractor_linker_api_v2_spark import fixtures
    from entity_extractor_linker_api_v2_spark.operators import linking
    from entity_extractor_linker_api_v2_spark.plans.pipeline import (
        extract_stage, mention_stage)
    from entity_extractor_linker_api_v2_spark.sources import tables

    docs = extract_stage(tables.docs_table(spark, SF_SMALL))
    ments = mention_stage(docs)
    p = linking.probe_keys_df(ments.select("label", "link_lang").distinct())
    red = fixtures.redirects_df(spark)
    kb_big = fixtures.scaled_kb_df(spark, n_pages=20_000)
    al_big = fixtures.scaled_aliases_df(spark, kb_big)

    broad = linking.resolve_candidates(p, red, al_big, kb_big)
    linking.save_kb_bucketed(spark, aliases=al_big, kb=kb_big,
                             prefix="kbscaled", path=str(tmp_path / "kb"))
    buck = linking.resolve_candidates_bucketed(p, red, spark, prefix="kbscaled")

    cols = ["label", "link_lang", "probe_lang", "title", "wikidata_id"]
    a = {tuple(r) for r in broad.select(cols).collect()}
    b = {tuple(r) for r in buck.select(cols).collect()}
    assert a == b and len(a) > 0
