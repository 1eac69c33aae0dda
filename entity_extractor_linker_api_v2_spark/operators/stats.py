"""Statistics aggregations (O-20..O-23, O-28).

Reference computes per-request Counters (app/api/v1/linker.py:240-327); at
corpus scale these become global (or per-partition-key) groupBy aggregations:
  * types_distribution    — groupBy(type).count()            (O-21)
  * top-10 categories / internal links over exploded arrays  (O-22/O-28)
  * linked counts + percentages                              (O-20/O-23)
All partial-aggregated map-side by Catalyst; top-k is orderBy+limit (global
k=10 — at 10^12 scale this is a treeAggregate-style 2-level reduction Spark
performs automatically for limit-after-sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def types_distribution(entities: DataFrame) -> DataFrame:
    return (entities.groupBy("type").agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), "type"))


def top10(entities: DataFrame, array_col: str) -> DataFrame:
    """most_common(10) over an exploded array column; deterministic ties."""
    return (entities.select(F.explode(array_col).alias("item"))
            .groupBy("item").agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), "item").limit(10))


TOP10_KEYS = ("wikipedia_categories", "wikipedia_internal_links",
              "wikidata_instance_of", "wikidata_type", "wikidata_subclass_of",
              "wikidata_part_of", "wikidata_has_part", "predicates")


def top10_all(entities: DataFrame) -> DataFrame:
    """All EIGHT statistics top10 keys the reference's Statistics model
    declares (app/api/v1/linker.py:109-118; only two are ever populated
    there — the rebuild fills the wikidata_* keys from the KB claim columns
    and `predicates` from the emitted edge table).

    One pass: per entity build an array of (stat_key, item) pairs, explode
    once, aggregate, rank per key.  wikidata_type = first instance_of claim
    (the P31 head).  Scale: the single explode+groupBy shuffles (key, item)
    pairs — counts, never rows."""
    from . import triples as TR

    def tag(key, arr):
        return F.transform(arr, lambda x: F.struct(
            F.lit(key).alias("stat_key"), x.alias("item")))

    pairs = F.concat(
        tag("wikipedia_categories", F.col("categories")),
        tag("wikipedia_internal_links", F.col("internal_links")),
        tag("wikidata_instance_of", F.col("instance_of")),
        tag("wikidata_type", F.slice(F.col("instance_of"), 1, 1)),
        tag("wikidata_subclass_of", F.col("subclass_of")),
        tag("wikidata_part_of", F.col("part_of")),
        tag("wikidata_has_part", F.col("has_part")),
    )
    ent_pairs = entities.select(F.explode(pairs).alias("p")).select("p.*")
    pred_pairs = TR.emit_triples(entities).select(
        F.lit("predicates").alias("stat_key"), F.col("pred").alias("item"))
    from pyspark.sql import Window
    w = Window.partitionBy("stat_key").orderBy(F.desc("cnt"), "item")
    return (ent_pairs.unionByName(pred_pairs)
            .groupBy("stat_key", "item").agg(F.count("*").alias("cnt"))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 10)
            .select("stat_key", "item", "cnt", "rnk"))


def linked_stats(entities: DataFrame) -> DataFrame:
    """total / wikipedia-linked / wikidata-linked counts and percents.

    Mirrors linker.py:307-324: wikipedia-linked iff url_de or url_en present,
    wikidata-linked iff wikidata_id non-empty."""
    wiki = F.when((F.col("url_de") != "") | (F.col("url_en") != ""), 1).otherwise(0)
    wd = F.when(F.col("wikidata_id") != "", 1).otherwise(0)
    return entities.agg(
        F.count("*").alias("total_entities"),
        F.sum(wiki).alias("linked_wikipedia"),
        F.sum(wd).alias("linked_wikidata"),
        F.round(F.sum(wiki) * 100.0 / F.count("*"), 4).alias("wikipedia_percent"),
        F.round(F.sum(wd) * 100.0 / F.count("*"), 4).alias("wikidata_percent"),
    )


def statistics_envelope(entities: DataFrame) -> DataFrame:
    """The complete one-row Statistics envelope of the reference's response
    model (app/api/v1/linker.py:104-124): total_entities,
    total_relationships (emitted KG edges), qa_pairs (one per
    extract-bearing entity, the /qa analog's cardinality — qa.py:224-233),
    plus the linked counts/percentages.  Two aggregates (entities ×1,
    triples ×1 — the triple relation explodes claim arrays so it cannot
    fold into the entity agg) cross-joined; both sides are single rows."""
    from . import triples as TR
    wiki = F.when((F.col("url_de") != "") | (F.col("url_en") != ""), 1).otherwise(0)
    wd = F.when(F.col("wikidata_id") != "", 1).otherwise(0)
    ent = entities.agg(
        F.count("*").alias("total_entities"),
        F.sum(F.when(F.col("extract") != "", 1).otherwise(0)).alias("qa_pairs"),
        F.sum(wiki).alias("linked_wikipedia"),
        F.sum(wd).alias("linked_wikidata"),
        F.round(F.sum(wiki) * 100.0 / F.count("*"), 4).alias("wikipedia_percent"),
        F.round(F.sum(wd) * 100.0 / F.count("*"), 4).alias("wikidata_percent"))
    rel = TR.emit_triples(entities).agg(
        F.count("*").alias("total_relationships"))
    return ent.crossJoin(rel).select(
        "total_entities", "total_relationships", "qa_pairs",
        "linked_wikipedia", "linked_wikidata",
        "wikipedia_percent", "wikidata_percent")


def extraction_stats(entities: DataFrame) -> DataFrame:
    """O-20 counters per document: extracted / pages fetched / linked."""
    return (entities.groupBy("url").agg(
        F.count("*").alias("entities_extracted"),
        F.sum(F.when(F.col("wiki_status").isin("found", "found_from_prompt"), 1)
               .otherwise(0)).alias("wikipedia_pages_fetched"),
        F.sum(F.when(F.col("status") == "linked", 1).otherwise(0)).alias("entities_linked"),
    ))
