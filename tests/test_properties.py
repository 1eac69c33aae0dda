"""Property-based tests (hypothesis) for the deterministic semantic core —
the functions whose byte-level behavior anchors the whole pipeline."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from entity_extractor_linker_api_v2_spark import refsem

text_st = st.text(max_size=300)
safe_word = st.text(alphabet="abcdefghijklmnopqrstuvwxyzäöüßABCDEFGHIJKLMNOPQRSTUVWXYZÄÖÜ",
                    min_size=1, max_size=20)


def _clean_reference(text: str) -> str:
    """Independent re-statement of the cleaning rule (char loop only) to pin
    the fast path against."""
    if not text:
        return text
    kept = "".join(c if (c.isprintable() or c in "\t\n\r") else " " for c in text)
    return re.sub(r"\s+", " ", kept).strip()


@given(text_st)
@settings(max_examples=300)
def test_clean_text_fast_path_equals_reference(s):
    assert refsem.clean_text(s) == _clean_reference(s)


@given(text_st)
def test_clean_text_idempotent(s):
    once = refsem.clean_text(s)
    assert refsem.clean_text(once) == once


@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=200))
@settings(max_examples=200)
def test_clean_text_output_is_json_safe(s):
    out = refsem.clean_text(s)
    assert all(c.isprintable() or c == " " for c in out)
    assert "  " not in out
    assert out == out.strip()


@given(st.text(alphabet="abc .!?", min_size=0, max_size=200),
       st.integers(2, 50), st.integers(0, 10))
def test_split_char_mode_window_arithmetic(s, chunk, overlap):
    if overlap >= chunk:
        overlap = chunk - 1
    chunks = refsem.split_text(s, chunk, overlap, preserve_sentences=False)
    s = s.strip()
    if not s:
        assert chunks == []
        return
    step = chunk - overlap
    assert len(chunks) == (len(s) + step - 1) // step
    # raw windows reassemble the text
    raw = [s[i * step: i * step + chunk] for i in range(len(chunks))]
    assert all(refsem.clean_text(r) == c for r, c in zip(raw, chunks))


@given(st.text(alphabet="abcdef .!?", min_size=1, max_size=300))
def test_split_sentence_mode_covers_all_words(s):
    chunks = refsem.split_text(s, 40, 10)
    joined = " ".join(chunks)
    for w in refsem.clean_text(s).replace(".", " ").replace("!", " ") \
            .replace("?", " ").split():
        assert w in joined


@given(safe_word)
def test_variations_exclude_original_and_dedupe(w):
    v = refsem.name_variations(w)
    assert w not in v
    assert len(v) == len(set(v))


@given(safe_word)
def test_probe_keys_identity_first(w):
    pk = refsem.probe_keys(w)
    assert pk[0] == (w, 0)
    prios = [p for _, p in pk]
    assert prios == sorted(prios)


@given(st.integers(0, 1000), st.integers(1, 20))
def test_distribute_pairs_fair(n, k):
    levels = [f"L{i}" for i in range(k)]
    d = refsem.distribute_pairs(n, levels)
    assert sum(d.values()) == n
    assert max(d.values()) - min(d.values()) <= 1
    # earlier levels get the remainder (qa.py:224-233)
    vals = [d[lvl] for lvl in levels]
    assert vals == sorted(vals, reverse=True)


@given(text_st)
def test_html_roundtrip_any_text(s):
    cleaned = refsem.clean_text(s)
    assert refsem.extract_text(refsem.render_html(s)) == cleaned


def test_html_roundtrip_tag_like_text():
    # permanent regression pins: the r3 hypothesis counterexample '<0>' plus
    # pre-escaped-looking and nested-entity bodies — all must survive the
    # render/extract round-trip byte-identically.
    for s in ["<0>", "<p>x</p>", "a < b > c", "&amp;", "&lt;p&gt;", "& < > &lt;0&gt;",
              "tag <footer>soup</footer> body"]:
        assert refsem.extract_text(refsem.render_html(s)) == refsem.clean_text(s)


def test_html_escape_roundtrip_exact():
    for s in ["", "&", "&&amp;&lt;", "<<>>", "plain", "&amp;amp;"]:
        assert refsem.html_unescape(refsem.html_escape(s)) == s


@given(st.text(alphabet="abcXYZ;?! \n1.)", max_size=200), st.integers(5, 50))
def test_qa_parse_truncation_bound(content, max_chars):
    for q, a in refsem.parse_qa_lines(content, max_chars=max_chars):
        assert q and a
        assert len(a) <= max_chars


# word-initial ß: Python titlecases to 'Ss', Java/DuckDB uppercase to 'SS' —
# German orthography never has it; excluded by the generators (documented in
# functions/textfns.py).
name_st = st.text(
    alphabet="abcdefgäöüß ABCDEFGÄÖÜ-'1", min_size=1, max_size=24
).filter(lambda s: not re.search(r"(^|[^A-Za-zÄÖÜäöü])ß", s))


@given(name_st)
@settings(max_examples=200, deadline=None)
def test_duckdb_title_emulation_matches_python_title(w):
    """The oracle's char-wise _TITLE must be byte-identical to str.title()
    (the reference casing, strategies.py:232) — NOT initcap."""
    import duckdb

    from entity_extractor_linker_api_v2_spark.plans.oracle import _TITLE
    got = duckdb.sql(
        "SELECT " + _TITLE.format(x="x") + " FROM (VALUES (?)) t(x)",
        params=[w]).fetchone()[0]
    assert got == w.title(), (w, got, w.title())


@given(st.text(alphabet="abcdefghij ÄÖÜäöüß", min_size=0, max_size=40))
@settings(max_examples=300)
def test_closest_level_always_valid_and_ordered(s):
    """closest_level returns a member of `valid` for ANY input; exact match
    (case-insensitive) always beats substring; empty/garbage falls back to
    valid[0]."""
    from entity_extractor_linker_api_v2_spark import refsem
    levels = refsem.DEFAULT_LEVELS
    got = refsem.closest_level(s, levels)
    assert got in levels
    for lvl in levels:
        if lvl.lower() == s.lower():
            assert got == lvl
            break


@given(st.lists(st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]),
    min_size=0, max_size=30))
@settings(max_examples=200)
def test_universal_minhash_mix_is_permutation_consistent(words):
    """The universal-hash family must rank identical shingle sets
    identically: the python twin of (A_i·h+B_i) mod P over the base hashes
    is order-insensitive and equal for equal sets — the property the LSH
    band equality relies on."""
    import hashlib

    from entity_extractor_linker_api_v2_spark.operators.dedup import (
        MINHASH_A, MINHASH_B, MINHASH_P, SHINGLE_W)

    text = " ".join(words)
    ws = text.split(" ")
    shingles = {" ".join(ws[i:i + SHINGLE_W])
                for i in range(len(ws) - SHINGLE_W + 1)} if len(ws) >= SHINGLE_W else set()
    if not shingles:
        return

    def base(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    sig1 = [min((a * base(s) + b) % MINHASH_P for s in shingles)
            for a, b in zip(MINHASH_A, MINHASH_B)]
    sig2 = [min((a * base(s) + b) % MINHASH_P for s in sorted(shingles))
            for a, b in zip(MINHASH_A, MINHASH_B)]
    assert sig1 == sig2
    assert all(0 <= v < MINHASH_P for v in sig1)


# q38's DuckDB oracle re-derives the greedy sentence-packing loop as a
# recursive CTE with a CLOSED-FORM overlap carry (monotone suffix totals) —
# subtle enough to deserve a direct property pin against the Python truth.
@given(st.lists(
    st.text(alphabet="ab .!?", min_size=1, max_size=40), min_size=1, max_size=8),
    st.integers(20, 60), st.integers(0, 15))
@settings(deadline=None, max_examples=40)
def test_q38_recursive_cte_oracle_matches_split_text(parts, chunk, overlap):
    import duckdb
    import pandas as pd

    from entity_extractor_linker_api_v2_spark.plans.oracle import _q38_sql

    text = " ".join(parts)
    want = [(0, i, c) for i, c in
            enumerate(refsem.split_text(text, chunk, overlap))]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": [0], "text": [text]}))
    got = con.execute(_q38_sql(chunk, overlap)).fetchall()
    assert sorted(got) == want, (text, chunk, overlap)
