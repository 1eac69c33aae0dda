"""Triple emission + node materialization (O-29 note / SURVEY §7.4 M4).

The reference declares but never populates `relationships`
(app/api/v1/linker.py:132); its statistics schema names the intended
predicates (linker.py:109-118).  The rebuild makes the edges table a
first-class deterministic output: for each entity record emitted by the
linking stage we produce

    (url, subj, pred, obj) with pred ∈
      instance_of   — always, obj = entity type
      same_as       — when wikidata_id present / when dbpedia_uri present
      has_category  — one per category (O-39 prefix-stripped at KB build)
      links_to      — one per internal link
      located_at    — when geo present, obj = "lat,lon"

subj is the canonical German label (label_de, always non-empty after the
prompt-data enhancement).  All emission is native explode/union — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PREDICATES = ("instance_of", "same_as", "has_category", "links_to", "located_at")


def emit_triples(entities: DataFrame) -> DataFrame:
    subj = F.col("label_de")
    base = entities.select("url", subj.alias("subj"), "type", "wikidata_id",
                           "dbpedia_uri", "categories", "internal_links",
                           "geo_lat", "geo_lon")

    inst = base.select("url", "subj", F.lit("instance_of").alias("pred"),
                       F.col("type").alias("obj"))
    wd = (base.filter(F.col("wikidata_id") != "")
          .select("url", "subj", F.lit("same_as").alias("pred"),
                  F.col("wikidata_id").alias("obj")))
    dbp = (base.filter(F.col("dbpedia_uri") != "")
           .select("url", "subj", F.lit("same_as").alias("pred"),
                   F.col("dbpedia_uri").alias("obj")))
    cats = (base.select("url", "subj", F.explode("categories").alias("obj"))
            .select("url", "subj", F.lit("has_category").alias("pred"), "obj"))
    links = (base.select("url", "subj", F.explode("internal_links").alias("obj"))
             .select("url", "subj", F.lit("links_to").alias("pred"), "obj"))
    geo = (base.filter(F.col("geo_lat").isNotNull() & F.col("geo_lon").isNotNull())
           .select("url", "subj", F.lit("located_at").alias("pred"),
                   F.concat(F.col("geo_lat").cast("string"), F.lit(","),
                            F.col("geo_lon").cast("string")).alias("obj")))

    return inst.unionByName(wd).unionByName(dbp).unionByName(cats) \
               .unionByName(links).unionByName(geo)


def nodes_table(entities: DataFrame) -> DataFrame:
    """Materialized nodes: one row per (canonical subject, wikidata_id) with
    aggregated provenance counts.  Array blobs are kept on the entity table;
    nodes carry the flat identity/linking columns (Entity, app/models/entity.py)."""
    return (entities
            .groupBy("label_de", "label_en", "wikidata_id", "dbpedia_uri",
                     "url_de", "url_en", "infobox_type", "status")
            .agg(F.count("*").alias("n_mentions"),
                 F.countDistinct("url").alias("n_docs"),
                 F.min("entity_id").alias("node_id"),
                 F.min("type").alias("type"))
            .withColumnRenamed("label_de", "subj"))
