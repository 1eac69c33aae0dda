"""Truth-table tests ported from the reference's own test suite
(FIXTURES.md §6; citations into /root/reference/tests)."""

import pytest

from entity_extractor_linker_api_v2_spark import refsem


# --- name variations (tests/test_wikipedia_fallbacks.py:84-132) -----------

def test_variations_muenchen():
    v = refsem.name_variations("München")
    assert "Muenchen" in v and "münchen" in v and "MÜNCHEN" in v
    assert "München" not in v
    assert len(v) == len(set(v))


def test_variations_der_bundestag():
    assert "Bundestag" in refsem.name_variations("Der Bundestag")


def test_variations_weiss():
    assert "Weiss" in refsem.name_variations("Weiß")


def test_variations_order_is_probe_order():
    # title, lower, upper first (strategies.py:232-234), then folds
    v = refsem.name_variations("München")
    assert v.index("münchen") < v.index("Muenchen")


# --- completeness gate (tests/test_wikipedia_fallbacks.py:34-82) ----------

@pytest.mark.parametrize("tde,ten,ade,aen,exp", [
    ("T", None, "A", None, True),
    (None, "T", None, "A", True),
    ("T", None, None, "A", True),
    (None, None, "A", None, False),     # no title
    ("T", None, None, None, False),     # no abstract
    (None, None, None, None, False),
])
def test_page_complete(tde, ten, ade, aen, exp):
    assert refsem.is_page_complete(tde, ten, ade, aen) is exp


# --- split_text (tests/test_utils.py:18-28; app/core/utils.py:78-138) -----

def test_split_sentences_nonempty():
    chunks = refsem.split_text("Satz eins. Satz zwei! Satz drei.", 100, 10)
    assert chunks == ["Satz eins. Satz zwei! Satz drei."]


def test_split_char_mode_windows():
    text = "abcdefghij" * 5  # 50 chars
    chunks = refsem.split_text(text, 20, 5, preserve_sentences=False)
    # windows advance by 15: starts 0,15,30,45
    assert len(chunks) == 4
    assert chunks[0] == text[0:20]
    assert chunks[1] == text[15:35]


def test_split_sentence_packing_and_overlap():
    text = "Aaa bbb. Ccc ddd. Eee fff. Ggg hhh."
    chunks = refsem.split_text(text, 20, 10)
    assert all(len(c) <= 30 for c in chunks)
    assert "".join(chunks).count("Ccc") >= 1


def test_split_invalid_args():
    with pytest.raises(ValueError):
        refsem.split_text("x", 0, 0)
    with pytest.raises(ValueError):
        refsem.split_text("x", 10, 10)


def test_split_empty():
    assert refsem.split_text("   ") == []


# --- clean_text (app/core/utils.py:20-38) ---------------------------------

def test_clean_text_control_chars():
    assert refsem.clean_text("a\x00b\x01c") == "a b c"
    assert refsem.clean_text("a\t b\nc") == "a b c"
    assert refsem.clean_text("  x  y  ") == "x y"
    assert refsem.clean_text("") == ""


# --- URL / DBpedia derivations (test_wikipedia_service.py:77-79) ----------

def test_wiki_url():
    assert refsem.wiki_url("Albert Einstein", "en").endswith("/wiki/Albert_Einstein")
    assert refsem.wiki_url(None, "de") == ""


def test_dbpedia_uri():
    assert refsem.dbpedia_uri_from_title("Albert Einstein") == \
        "http://dbpedia.org/resource/Albert_Einstein"
    assert refsem.dbpedia_uri_from_title("  ") == ""


def test_finalize_dbpedia_chain():
    assert refsem.finalize_dbpedia_uri("http://x", "Y", "") == "http://x"
    assert refsem.finalize_dbpedia_uri("", "Albert Einstein", "") == \
        "http://dbpedia.org/resource/Albert_Einstein"
    assert refsem.finalize_dbpedia_uri("", "", "https://en.wikipedia.org/wiki/Albert_Einstein") == \
        "http://dbpedia.org/resource/Albert_Einstein"
    assert refsem.finalize_dbpedia_uri("", "", "") == ""


# --- status rule (app/core/linker.py:164-167) ------------------------------

@pytest.mark.parametrize("status,wd,exp", [
    ("found", "Q1", "linked"),
    ("found_from_prompt", "Q1", "linked"),
    ("found", "", "not_linked"),
    ("not_found", "Q1", "not_linked"),
])
def test_linked_status(status, wd, exp):
    assert refsem.linked_status(status, wd) == exp


# --- QA distribution (app/core/qa.py:224-233) ------------------------------

def test_distribute_10_over_8():
    d = refsem.distribute_pairs(10, refsem.DEFAULT_LEVELS)
    assert d["Elementarbereich"] == 2 and d["Primarstufe"] == 2
    assert all(d[lvl] == 1 for lvl in refsem.DEFAULT_LEVELS[2:])
    assert sum(d.values()) == 10


# --- QA parsing (tests/test_qa.py:75-194; qa.py:113-134,352-353) ----------

def test_parse_qa_lines():
    pairs = refsem.parse_qa_lines("Frage eins?;Antwort eins\nFrage zwei?;Antwort zwei")
    assert pairs == [("Frage eins?", "Antwort eins"), ("Frage zwei?", "Antwort zwei")]


def test_parse_qa_truncation():
    pairs = refsem.parse_qa_lines("F?;" + "a" * 100, max_chars=20)
    assert pairs[0][1] == "a" * 17 + "..."


def test_parse_qa_fences():
    assert refsem.parse_qa_lines("```\nF?;A\n```") == [("F?", "A")]


def test_strip_numbering():
    assert refsem.strip_numbering("1. Was ist X?") == "Was ist X?"
    assert refsem.strip_numbering("a) Was ist X?") == "Was ist X?"


def test_closest_level():
    levels = ["Primarstufe", "Sekundarstufe I"]
    assert refsem.closest_level("primarstufe", levels) == "Primarstufe"
    assert refsem.closest_level("Sekundar", levels) == "Sekundarstufe I"
    assert refsem.closest_level("zzz", levels) == "Primarstufe"


# --- topic extraction (compendium.py:30-36) --------------------------------

def test_extract_topic():
    assert refsem.extract_topic("Die Zugspitze ist hoch. Mehr Text.") == \
        "Die Zugspitze ist hoch"
    assert refsem.extract_topic("Kurz. " + "x" * 200) == "Kurz. " + "x" * 94


# --- regex NER (app/core/linker.py:217-239) --------------------------------

def test_regex_ner():
    ents = refsem.regex_ner("Albert Einstein besuchte Berlin und München.")
    labels = [lbl for lbl, _ in ents]
    assert "Albert Einstein" in labels
    assert ("Berlin", "LOCATION") in ents


def test_regex_ner_cap():
    text = " ".join(f"Aaa B{c}b" for c in "abcdefghijklmnop")
    assert len(refsem.regex_ner(text, max_entities=5)) == 5


# --- html round trip (input_hint invariant) --------------------------------

def test_html_roundtrip_byte_identical():
    t = "Die Zugspitze ist der höchste Berg Deutschlands."
    assert refsem.extract_text(refsem.render_html(t)).encode() == \
        refsem.clean_text(t).encode()


def test_extract_text_empty():
    assert refsem.extract_text(None) == ""
    assert refsem.extract_text(b"") == ""


def test_ner_unicode_boundary_emulation_matches_python(spark):
    """The consumed-boundary-group emulation (queries.NER_PATTERNS, used by
    Spark AND the DuckDB oracle) must agree with refsem.regex_ner (Python
    unicode \\b) on the exact cases ASCII \\b gets wrong: leading Ö
    ('Österreich' never matches under ASCII \\b) and ß-final words
    (truncated to the last ASCII word char)."""
    import pyspark.sql.functions as F

    from entity_extractor_linker_api_v2_spark import refsem
    from entity_extractor_linker_api_v2_spark.plans.queries import NER_PATTERNS

    from entity_extractor_linker_api_v2_spark.plans.queries import NER_DOUBLE_SEP

    texts = [
        "Urlaub in Österreich und der Schweiz.",
        "Hans Weiß besuchte Berlin.",
        "Die Hansestadt Hamburg liegt in Deutschland.",
        "Albert Einstein besuchte Berlin und München.",
        "Österreich grenzt an Deutschland",
        "Berlin München Hamburg",           # single-separator adjacency
        "Anna Berta Carl Dora kamen an.",   # adjacent PERSON pairs
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "i long, body_text string")
    cap = 10

    def _tagger(t):
        return lambda m: F.struct(
            F.regexp_replace(m, "  ", " ").alias("label"), F.lit(t).alias("type"))

    doubled = F.regexp_replace("body_text", NER_DOUBLE_SEP, r"$1$1")
    tagged = F.concat(*[
        F.transform(
            F.slice(F.regexp_extract_all(doubled, F.lit(p), F.lit(2)), 1, cap),
            _tagger(t))
        for p, t in NER_PATTERNS])
    got = {r["i"]: [(e["label"], e["type"]) for e in r["ents"]]
           for r in df.select("i", F.slice(tagged, 1, cap).alias("ents")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == refsem.regex_ner(t), (t, got[i], refsem.regex_ner(t))
