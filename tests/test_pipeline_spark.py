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
    """Skew path (hot-key-only auto-sketch): identical entities."""
    plain = run_pipeline(spark, SF_SMALL)["entities"]
    salted = run_pipeline(spark, SF_SMALL, n_salt=8)["entities"]
    cols = ["url", "label", "status", "wikidata_id", "label_de"]
    a = {tuple(r) for r in plain.select(cols).collect()}
    b = {tuple(r) for r in salted.select(cols).collect()}
    assert a == b


def _join_back_fixture(spark):
    from entity_extractor_linker_api_v2_spark.operators import linking
    ments = spark.createDataFrame(
        [(f"u{i}", "Berlin" if i % 2 else f"L{i}", "de") for i in range(40)],
        "url string, label string, link_lang string")
    resolved = spark.createDataFrame(
        [("Berlin", "de", "Berlin_title"), ("L1", "de", "t1"),
         ("L4", "de", "t4")],
        "label string, link_lang string, title string")
    want = {tuple(r) for r in linking.join_back(ments, resolved).collect()}
    return linking, ments, resolved, want


def test_join_back_hot_key_variants_equivalent(spark):
    """All four salting shapes of join_back return the same rows: plain,
    auto-sketched hot-only, caller-provided hot_keys, and the legacy
    all-keys salt_all contrast path."""
    linking, ments, resolved, want = _join_back_fixture(spark)
    for kw in (dict(broadcast_resolved=False, n_salt=4),
               dict(broadcast_resolved=False, n_salt=4,
                    hot_keys=[("Berlin", "de")]),
               dict(broadcast_resolved=False, n_salt=4, salt_all=True)):
        got = {tuple(r) for r in
               linking.join_back(ments, resolved, **kw).collect()}
        assert got == want, f"join_back({kw}) diverged"


def test_join_back_no_hot_keys_joins_plain(spark):
    """A uniform key distribution sketches to zero hot keys (every key
    under the share threshold) and the join must degrade to the plain
    un-salted shape — same rows, no _salt column."""
    linking, ments, resolved, want = _join_back_fixture(spark)
    hot = linking.hot_join_keys(ments, ["label", "link_lang"],
                                hot_share=0.01)
    assert ("Berlin", "de") in hot  # 50% share: the planted head key
    out = linking.join_back(ments, resolved, broadcast_resolved=False,
                            n_salt=4, hot_share=0.99)  # nothing qualifies
    assert "_salt" not in out.columns
    assert {tuple(r) for r in out.collect()} == want


def test_entity_cache_evicts_dirs(spark, tmp_path):
    """The session entity cache must EVICT under corpus churn, not
    accumulate persisted lineage: beyond _MAX_DIRS_PER_SESSION corpora in
    one session, the oldest corpus's BOTH pinned frames (entities +
    mentions) are unpersisted and a re-request is a rebuild (miss event).
    Round-7 guard for the 10x-scale regime where each cached corpus pins
    tens of GB (measured variant: scripts/cache_evict_check.py)."""
    import os

    from entity_extractor_linker_api_v2_spark.plans import queries as Q

    dirs, first_entry = [], None
    for tag in "abcd":  # one more than the cap of 3
        p = tmp_path / f"corpus_{tag}"
        os.symlink(SF_SMALL, p)  # distinct cache keys onto the same data
        dirs.append(str(p))
    try:
        for i, d in enumerate(dirs):
            Q._entities(spark, d).count()  # materialize the persists
            if i == 0:
                first_entry = Q._ENTITY_CACHE[spark][d]
        per = Q._ENTITY_CACHE[spark]
        assert len(per) == Q._MAX_DIRS_PER_SESSION
        assert dirs[0] not in per and dirs[-1] in per
        ent0, ments0 = first_entry
        assert not ent0.is_cached and not ments0.is_cached, \
            "evicted corpus left pinned frames behind"
        assert per[dirs[-1]][0].is_cached  # survivors stay pinned
        Q.drain_entity_cache_events()
        Q._entities(spark, dirs[0])  # evicted -> rebuild, recorded as miss
        assert Q.drain_entity_cache_events() == [False]
    finally:
        per = Q._ENTITY_CACHE.get(spark, {})
        for d in dirs:
            if d in per:
                Q._unpersist_entry(per.pop(d))


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


def test_pipeline_chain_linker_compendium_qa_one_lineage(spark):
    """Reference /pipeline chain (app/api/v1/pipeline.py:196-265): linker →
    compendium → qa as ONE DataFrame lineage from pipeline_from_docs output,
    in BOTH linker modes.

    extract mode: the chained outputs must be value-identical to the
    per-stage driver queries q47_compendium / q48_qa_pairs (which build
    their own entities via the fused path — this also re-asserts
    fused ≡ staged at the chain level).  generate mode: the same chain must
    run end-to-end with generate-mode row-count invariants (one compendium
    row per doc; one QA pair per non-empty-extract entity)."""
    from pyspark.sql import functions as F

    from entity_extractor_linker_api_v2_spark.plans.pipeline import (
        pipeline_from_docs)
    from entity_extractor_linker_api_v2_spark.plans.queries import (
        compendium_from, q_compendium, q_qa_pairs, qa_pairs_from)
    from entity_extractor_linker_api_v2_spark.sources import tables

    docs = tables.docs_table(spark, SF_SMALL, with_html=True)
    plain_docs = tables.docs_table(spark, SF_SMALL, with_html=False)

    # --- extract mode: chain ≡ per-stage queries (value-level) ---
    ents = pipeline_from_docs(spark, docs)["entities"].persist()
    comp = compendium_from(plain_docs, ents)
    qa = qa_pairs_from(ents)
    want_comp = sorted(tuple(r) for r in q_compendium(spark, SF_SMALL).collect())
    want_qa = sorted(tuple(r) for r in q_qa_pairs(spark, SF_SMALL).collect())
    assert sorted(tuple(r) for r in comp.collect()) == want_comp
    assert sorted(tuple(r) for r in qa.collect()) == want_qa
    assert len(want_comp) > 0 and len(want_qa) > 0

    # --- generate mode: same chain, generate-mode invariants ---
    gents = pipeline_from_docs(spark, docs, mode="generate")["entities"].persist()
    gcomp = compendium_from(plain_docs, gents)
    gqa = qa_pairs_from(gents)
    assert gcomp.count() == plain_docs.count()  # one markdown per doc
    assert gqa.count() == gents.filter(F.col("extract") != "").count()
    # every generate-mode QA question follows the O-5 template
    assert gqa.filter(~F.col("question").startswith("Was ist ")).count() == 0
    ents.unpersist()
    gents.unpersist()


def test_replicate_guard_matches_url_namespace(spark):
    """replicate_documents must reject a k that would push doc ids past the
    URL_ID_DIGITS zero-pad width (lpad TRUNCATES over-length ids in both
    Spark and DuckDB — silent url collisions), and accept one that fits.
    The width was widened 6->8 digits for the 10M-page scale-step corpus;
    this pins guard and width together so neither moves alone."""
    import pytest as _pytest

    from entity_extractor_linker_api_v2_spark import fixtures
    from entity_extractor_linker_api_v2_spark.sources import tables

    limit = 10 ** fixtures.URL_ID_DIGITS
    df = spark.createDataFrame(
        [(limit // 10 - 1, "t", "de")], "doc_id long, text string, lang string")
    # (max+1)*k == limit exactly -> max id = limit-1, still representable
    ok = tables.replicate_documents(df, 10)
    assert ok.count() == 10
    derived = tables.derive_docs(ok, with_html=False)
    assert derived.select("url").distinct().count() == 10
    with _pytest.raises(ValueError, match="url namespace"):
        tables.replicate_documents(df, 11)
