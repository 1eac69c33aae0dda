"""Aho-Corasick matcher: equivalence with str.find on randomized inputs and
through the fused Spark stage."""

import random
import string

from conftest import SF_SMALL
from entity_extractor_linker_api_v2_spark.functions.ahocorasick import AhoCorasick


def test_ac_equals_find_randomized():
    rng = random.Random(42)
    alphabet = "ab c"
    for _ in range(50):
        patterns = list({"".join(rng.choices(alphabet, k=rng.randint(1, 5))).strip()
                         for _ in range(30)} - {""})
        text = "".join(rng.choices(alphabet, k=400))
        ac = AhoCorasick(patterns)
        got = ac.first_occurrences(text)
        want = {pid: text.find(p) + 1 for pid, p in enumerate(patterns)
                if text.find(p) >= 0}
        assert got == want


def test_ac_overlapping_and_nested_patterns():
    pats = ["Albert Einstein", "Einstein", "Ein", "stein", "zz"]
    ac = AhoCorasick(pats)
    t = "Der Albert Einstein Text"
    got = ac.first_occurrences(t)
    assert got == {pid: t.find(p) + 1 for pid, p in enumerate(pats)
                   if t.find(p) >= 0}
    assert 4 not in got  # "zz" absent


def test_ac_unicode():
    pats = ["München", "Weiß", "ÄÖÜ"]
    ac = AhoCorasick(pats)
    t = "in München ist es Weiß"
    got = ac.first_occurrences(t)
    assert got == {0: t.find("München") + 1, 1: t.find("Weiß") + 1}


def test_fused_stage_ac_equals_find_loop(spark):
    from entity_extractor_linker_api_v2_spark.operators.extract import extract_and_detect
    from entity_extractor_linker_api_v2_spark.sources import tables
    docs = tables.docs_table(spark, SF_SMALL)
    a = extract_and_detect(docs, dedup=True, use_ac=False)
    b = extract_and_detect(docs, dedup=True, use_ac=True)
    cols = ["url", "surface", "label", "type", "pos", "mention_idx"]
    sa = {tuple(r) for r in a.select(cols).collect()}
    sb = {tuple(r) for r in b.select(cols).collect()}
    assert sa == sb and len(sa) > 0
