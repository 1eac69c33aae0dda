"""End-to-end Spark pipeline tests: golden-triple P/R, byte-identical text,
per-operator behaviors that aren't SQL-expressible, and skew/salt equivalence."""

import duckdb
import pytest

import refpipe
from conftest import SF_SMALL
from entity_extractor_linker_api_v2_spark import refsem
from entity_extractor_linker_api_v2_spark.plans.pipeline import run_pipeline


@pytest.fixture(scope="module")
def pipe(spark):
    out = run_pipeline(spark, SF_SMALL)
    out["entities"] = out["entities"].cache()
    return out


def _documents_rows():
    return duckdb.connect().execute(
        f"SELECT doc_id, text, lang FROM '{SF_SMALL}/documents.parquet'").fetchall()


def test_golden_triples_precision_recall(pipe):
    golden = refpipe.golden_triples(_documents_rows())
    got = {(r.url, r.subj, r.pred, r.obj) for r in pipe["triples"].collect()}
    # located_at float formatting: golden uses python str(float) == Spark cast
    tp = len(got & golden)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(golden) if golden else 0.0
    assert precision >= 0.95, f"precision {precision}: extra={list(got - golden)[:5]}"
    assert recall >= 0.95, f"recall {recall}: missing={list(golden - got)[:5]}"
    # we expect exact match, not just 0.95
    assert precision == 1.0 and recall == 1.0


def test_byte_identical_extracted_text(pipe):
    rows = pipe["docs"].select("body_text", "extracted_text").limit(200).collect()
    assert rows
    for r in rows:
        assert r.extracted_text.encode("utf-8") == refsem.clean_text(r.body_text).encode("utf-8")


def test_native_html_matches_render_html(pipe):
    """derive_docs' native html expression == refsem.render_html(body_text)
    byte-for-byte, including the escaping of &, <, > in text nodes."""
    rows = pipe["docs"].select("body_text", "html").limit(200).collect()
    assert rows
    for r in rows:
        assert bytes(r.html) == refsem.render_html(r.body_text)


def test_entities_match_refpipe_status(pipe):
    """Spark status/wikidata per (url,label) == sequential reference chain."""
    want = {}
    for url, body, link_lang in refpipe.derive_docs(_documents_rows()):
        for label, etype, _ in refpipe.extract_mentions(body):
            r = refpipe.entity_record(url, label, etype, link_lang)
            want[(url, label)] = (r["linked"], r["wikidata_id"], r["label_de"], r["dbpedia_uri"])
    got = {(r.url, r.label): (r.status, r.wikidata_id, r.label_de, r.dbpedia_uri)
           for r in pipe["entities"].collect()}
    assert set(got) == set(want)
    diffs = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not diffs, f"first diffs: {list(diffs.items())[:5]}"


def test_salted_join_matches_broadcast(spark):
    """Skew path: salted join-back produces identical entities."""
    plain = run_pipeline(spark, SF_SMALL)["entities"]
    salted = run_pipeline(spark, SF_SMALL, n_salt=8)["entities"]
    cols = ["url", "label", "status", "wikidata_id", "label_de"]
    a = {tuple(r) for r in plain.select(cols).collect()}
    b = {tuple(r) for r in salted.select(cols).collect()}
    assert a == b


def test_mention_cap(spark):
    """Per-url cap keeps first max_entities mentions in text order."""
    from entity_extractor_linker_api_v2_spark.operators import mentions as M
    rows = [("u1", "de", f"s{i}", f"L{i}", "T", i + 1) for i in range(15)]
    df = spark.createDataFrame(
        rows, "url string, link_lang string, surface string, label string, type string, pos int")
    out = M.dedup_and_cap(df, max_entities=10).collect()
    assert len(out) == 10
    assert {r.label for r in out} == {f"L{i}" for i in range(10)}


def test_mention_dedup_keeps_first(spark):
    from entity_extractor_linker_api_v2_spark.operators import mentions as M
    rows = [("u1", "de", "Berlin", "Berlin", "LOC", 5),
            ("u1", "de", "berlin", "berlin", "LOC", 9)]
    df = spark.createDataFrame(
        rows, "url string, link_lang string, surface string, label string, type string, pos int")
    out = M.dedup_and_cap(df).collect()
    assert len(out) == 1 and out[0].pos == 5
