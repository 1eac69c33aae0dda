"""Sources: the driver's parquet tables + the derived web-page corpus.

`docs_table` derives the Common-Crawl-shaped input mandated by BASELINE.json
`input_hint` — (url, warc_ts, html:binary, text, lang) — deterministically
from the driver-generated `documents` parquet (TESTDATA.md), using only
native Column expressions so the DuckDB oracle (`fixtures.docs_cte`) computes
the identical relation.  At production scale this stage is simply
`spark.read.format("iceberg").load(...)`; everything downstream is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fixtures, refsem

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _sentence_case_col():
    n = len(fixtures.SENTENCES)
    expr = None
    for i, s in enumerate(fixtures.SENTENCES):
        cond = F.col("doc_id") % n == i
        expr = F.when(cond, F.lit(s)) if expr is None else expr.when(cond, F.lit(s))
    return expr


def docs_table(spark: SparkSession, sf_dir: str, with_html: bool = True) -> DataFrame:
    """documents.parquet → (url, warc_ts, html, body_text, text, lang, link_lang).

    `body_text` is the page's logical text (driver text + injected fixture
    sentence + skew sentence on even doc_ids — "Berlin" becomes a hot key in
    ~50% of pages, per the north rule's skew requirement); `html` wraps it in
    deterministic boilerplate so the extract stage has real work.
    """
    return derive_docs(load(spark, sf_dir, "documents"), with_html=with_html)


def replicate_documents(documents: DataFrame, k: int, heavy: int = 1) -> DataFrame:
    """Deterministically scale the corpus for throughput benchmarking:
    ×k rows (each copy gets a distinct doc_id = doc_id*k + copy, preserving
    the sentence/skew injection pattern) and ×heavy text length (text
    repeated, space-joined — real web pages are KBs, the driver rows are
    ~400 B).  doc_id must stay under 10^URL_ID_DIGITS: the url template
    zero-pads to that width and lpad TRUNCATES longer ids, which would
    silently collide urls.
    """
    docs = documents
    if k > 1:
        mx = docs.agg(F.max("doc_id")).collect()[0][0]
        limit = 10 ** fixtures.URL_ID_DIGITS
        if (mx + 1) * k > limit:  # max id = (mx+1)*k - 1 must stay < limit
            raise ValueError(f"replicate k={k} with max doc_id={mx} overflows the "
                             f"{fixtures.URL_ID_DIGITS}-digit url namespace "
                             "(urls would collide)")
        docs = (docs
                .withColumn("_copy", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
                .withColumn("doc_id", F.col("doc_id") * k + F.col("_copy"))
                .drop("_copy"))
    if heavy > 1:
        docs = docs.withColumn(
            "text", F.array_join(F.array_repeat(F.col("text"), heavy), " "))
    return docs


def derive_docs(d: DataFrame, with_html: bool = True) -> DataFrame:
    body = F.concat(
        F.col("text"), F.lit(" "), _sentence_case_col(),
        F.when(F.col("doc_id") % 2 == 0, F.lit(" " + fixtures.SKEW_SENTENCE)).otherwise(F.lit("")),
    )
    out = (
        d.withColumn("url", F.concat(F.lit("https://test.example/"), F.col("lang"),
                                     F.lit("/doc"), F.lpad(F.col("doc_id").cast("string"),
                                                           fixtures.URL_ID_DIGITS, "0")))
        .withColumn("warc_ts", F.expr("timestamp'2025-01-01 00:00:00' + make_interval(0,0,0,0,0,doc_id,0)"))
        .withColumn("body_text", body)
        .withColumn("link_lang", F.when(F.col("lang") == "de", F.lit("de")).otherwise(F.lit("en")))
    )
    if with_html:
        # native mirror of refsem.render_html: minimal invertible escaping of
        # text nodes (& first), so html == render_html(body_text) byte-for-byte
        escaped = F.replace(
            F.replace(F.replace(F.col("body_text"), F.lit("&"), F.lit("&amp;")),
                      F.lit("<"), F.lit("&lt;")),
            F.lit(">"), F.lit("&gt;"))
        out = out.withColumn(
            "html",
            F.encode(F.concat(F.lit(refsem._HTML_PRE), escaped,
                              F.lit(refsem._HTML_POST)), "UTF-8"),
        )
    return out
