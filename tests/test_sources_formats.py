"""JSONL/CSV ingest: round-trip vs the parquet canon + quarantine semantics."""

from __future__ import annotations

import os

import pytest

from entity_extractor_linker_api_v2_spark.sources import formats, tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from entity_extractor_linker_api_v2_spark.session import get_spark
    s = get_spark(app_name="test-formats", master="local[4]",
                  shuffle_partitions=4)
    yield s


def _rows(df):
    return sorted(tuple(r) for r in df.select(*formats._COLS).collect())


@pytest.fixture(scope="module")
def canon(spark):
    return tables.load(spark, SF, "documents")


def test_jsonl_roundtrip_matches_parquet(spark, canon, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("jsonl") / "docs")
    formats.write_documents_jsonl(canon, p)
    good, quarantine = formats.read_documents_jsonl(spark, p)
    assert [f.name for f in good.schema.fields] == formats._COLS
    assert good.schema == formats.DOCUMENTS_SCHEMA
    assert _rows(good) == _rows(canon)
    assert quarantine.count() == 0


def test_csv_roundtrip_matches_parquet(spark, canon, tmp_path_factory):
    # the corpus text is whitespace-joined word soup, but the writer quotes
    # and escapes per RFC 4180, so commas/quotes/newlines would survive too
    p = str(tmp_path_factory.mktemp("csv") / "docs")
    formats.write_documents_csv(canon, p)
    good, quarantine = formats.read_documents_csv(spark, p)
    assert good.schema == formats.DOCUMENTS_SCHEMA
    assert _rows(good) == _rows(canon)
    assert quarantine.count() == 0


def test_csv_multiline_scan_parallelism_guard(spark, canon,
                                              tmp_path_factory):
    """A single multiLine CSV file is one scan task at ANY cluster size —
    the reader must warn and repartition the good rows to core count so
    downstream operators don't inherit the serialized layout (round 7)."""
    import warnings

    p = str(tmp_path_factory.mktemp("csv_one") / "docs")
    formats.write_documents_csv(canon.coalesce(1), p)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        good, _ = formats.read_documents_csv(spark, p)
    hits = [w for w in caught if "not splittable" in str(w.message)]
    assert hits, "single-file multiLine read must emit the guard warning"
    assert good.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert _rows(good) == _rows(canon)

    # the splittable single-line mode must NOT warn or repartition
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        formats.read_documents_csv(spark, p, multi_line=False)
    assert not [w for w in caught if "not splittable" in str(w.message)]


def test_csv_single_line_mode_on_newline_free_export(spark, canon,
                                                     tmp_path_factory):
    """multi_line=False (the splittable fast path) is exact on exports
    whose text carries no literal newlines — the corpus tables qualify."""
    p = str(tmp_path_factory.mktemp("csv1l") / "docs")
    formats.write_documents_csv(canon, p)
    good, quarantine = formats.read_documents_csv(spark, p, multi_line=False)
    assert _rows(good) == _rows(canon)
    assert quarantine.count() == 0


def test_csv_handles_embedded_delimiters(spark, tmp_path_factory):
    src = spark.createDataFrame(
        [(1, 'a,b "quoted" c\nnext line', "de", "src0", 23),
         (2, "plain", "en", "src1", 5)],
        schema=formats.DOCUMENTS_SCHEMA)
    p = str(tmp_path_factory.mktemp("csvq") / "docs")
    formats.write_documents_csv(src, p)
    good, quarantine = formats.read_documents_csv(spark, p)
    assert _rows(good) == _rows(src)
    assert quarantine.count() == 0


def test_jsonl_quarantines_corrupt_lines(spark, canon, tmp_path_factory):
    """One malformed line must not kill the job OR silently vanish."""
    p = str(tmp_path_factory.mktemp("jsonl_bad") / "docs")
    formats.write_documents_jsonl(canon.limit(50), p)
    # a separate damaged shard (appending to a Spark-written part file
    # would only trip its .crc sidecar, not the JSON parser)
    with open(os.path.join(p, "part-bad.json"), "w") as f:
        f.write('{"doc_id": 999, "text": "truncated rec\n')
        f.write("not json at all\n")
    good, quarantine = formats.read_documents_jsonl(spark, p)
    assert good.count() == 50
    bad = sorted(r["raw"] for r in quarantine.collect())
    assert bad == ["not json at all",
                   '{"doc_id": 999, "text": "truncated rec']


def test_csv_quarantines_garbage_lines(spark, canon, tmp_path_factory):
    """CSV permissive mode can emit an all-null row for a garbage line
    instead of setting the corrupt column — the reader must quarantine
    both shapes, not pass null docs downstream."""
    p = str(tmp_path_factory.mktemp("csv_bad") / "docs")
    formats.write_documents_csv(canon.limit(50), p)
    with open(os.path.join(p, "part-bad.csv"), "w") as f:
        f.write("doc_id,text,lang,source,n_chars\n")   # header like any shard
        f.write(",,,,\n")                              # all-null row
        f.write("not-a-long,oops,de,src0,zzz\n")       # type-garbage row
    good, quarantine = formats.read_documents_csv(spark, p)
    assert good.count() == 50
    assert good.filter(good.doc_id.isNull()).count() == 0
    assert quarantine.count() == 2


def test_gzipped_jsonl_reads_transparently(spark, canon, tmp_path_factory):
    """Compression by extension needs no reader change (splittability is a
    deployment concern — one .gz file = one task — not a parse concern)."""
    import gzip
    import json as _json
    p = str(tmp_path_factory.mktemp("jsonl_gz"))
    rows = canon.limit(40).collect()
    with gzip.open(os.path.join(p, "docs.json.gz"), "wt") as f:
        for r in rows:
            f.write(_json.dumps(r.asDict()) + "\n")
    good, quarantine = formats.read_documents_jsonl(spark, p)
    assert good.count() == 40
    assert quarantine.count() == 0
    assert _rows(good) == sorted(
        tuple(r[c] for c in formats._COLS) for r in rows)


def test_ingested_docs_feed_the_pipeline(spark, canon, tmp_path_factory):
    """Format-agnostic downstream: derive_docs over JSONL-ingested rows
    equals derive_docs over the parquet canon."""
    p = str(tmp_path_factory.mktemp("jsonl_pipe") / "docs")
    formats.write_documents_jsonl(canon, p)
    good, _ = formats.read_documents_jsonl(spark, p)
    a = tables.derive_docs(good).select("url", "text", "lang")
    b = tables.derive_docs(canon).select("url", "text", "lang")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
