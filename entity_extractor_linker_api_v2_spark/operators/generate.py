"""mode="generate" — propose RELATED entities instead of extracting spans.

The reference's generate_entities (openai_wrapper.py:207-338, dispatched by
linker.py:120-135) asks the model for up to max_entities *related* concepts
as EXACT Wikipedia article titles, which then flow through the identical
downstream (dedup, cap, linking).  The deterministic rebuild proposes KB
page titles ranked by content-token overlap between the document text and
the page abstract:

    related(doc) = top-k KB titles by |tokens(text) ∩ tokens(abstract)|,
                   same language, ties by title, overlap ≥ 1

Pure function of (text, KB) — no network, no model.  The Spark formulation
is fully relational: explode distinct content tokens on both sides, join on
(token, lang) with the KB token dim BROADCAST, count, rank — the corpus
side shuffles (url, title) count pairs only.  functions.generation.
DeterministicGenerator.entities is the row-level twin (pytest-asserted).

Generated mentions have pos = NULL (no text span — same as the reference,
whose generated entities carry no offsets) and mention_idx = rank, so every
downstream stage (linking, triples, stats) is shared with extract mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MIN_TOKEN_LEN = 4  # content words only; drops der/die/das/ist/...

# KB infobox_type -> entity TYPE (the generate prompt returns types like
# PERSON/LOCATION/ORGANIZATION; unknown/absent infobox -> CONCEPT)
INFOBOX_TYPE = {"city": "LOCATION", "country": "LOCATION",
                "mountain": "LOCATION", "scientist": "PERSON",
                "organization": "ORGANIZATION", "parliament": "ORGANIZATION"}


def _tokens(col):
    return F.array_distinct(F.filter(
        F.split(F.lower(col), "[^a-zäöüß]+"),
        lambda t: F.length(t) >= MIN_TOKEN_LEN))


def _type_col():
    m = F.create_map(*[F.lit(x) for kv in INFOBOX_TYPE.items() for x in kv])
    return F.coalesce(m[F.col("infobox_type")], F.lit("CONCEPT"))


def generate_mentions(docs: DataFrame, kb: DataFrame | None = None,
                      max_entities: int = 10,
                      text_col: str = "body_text") -> DataFrame:
    """docs → mention-shaped related-entity proposals
    (url, link_lang, surface, label, type, pos=NULL, mention_idx=rank)."""
    from .. import fixtures
    if kb is None:
        kb = fixtures.kb_pages_df(docs.sparkSession)
    dim = (kb.filter(F.col("abstract").isNotNull() & (F.col("abstract") != ""))
           .select(F.col("title"), F.col("lang"), _type_col().alias("type"),
                   F.explode(_tokens("abstract")).alias("tok")))
    d = docs.select("url", "link_lang", F.explode(_tokens(text_col)).alias("tok"))
    scored = (d.join(F.broadcast(dim),
                     (d.tok == dim.tok) & (d.link_lang == dim.lang))
              .groupBy("url", "link_lang", "title", "type")
              .agg(F.count("*").alias("overlap")))
    w = Window.partitionBy("url").orderBy(F.desc("overlap"), "title")
    return (scored.withColumn("mention_idx", F.row_number().over(w))
            .filter(F.col("mention_idx") <= max_entities)
            .select("url", "link_lang",
                    F.col("title").alias("surface"),
                    F.col("title").alias("label"),
                    "type",
                    F.lit(None).cast("int").alias("pos"),
                    F.col("mention_idx").cast("int")))
