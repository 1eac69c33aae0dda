"""KB build: raw Wikipedia-API payload rows → the 14-column KB dimension.

Re-expresses the reference's page-ingest path as one declarative job:

  * special-page / missing-title filter (O-12,
    ref app/services/wikipedia/api/client.py:266-281: negative page ids are
    skipped, pages without a title are skipped; merge_page_data additionally
    strips the title, data_processor.py:26-31)
  * merge_page_data field extraction (ref data_processor.py:15-70):
    trim title/extract, wikibase_item → wikidata_id, category titles with
    "Category:"/"Kategorie:" removed (reference uses str.replace — ALL
    occurrences, not a prefix strip — data_processor.py:77-84), first
    coordinate pair, thumbnail source, first infobox
  * cross-language langlinks resolution (O-16, ref service.py:228-269):
    instead of a second HTTP fetch per langlink, the built page set is
    self-joined on (langlink_title, langlink_lang) — title_other and the
    partner's abstract come from the joined row, and a langlink to a page
    that was never fetched yields NULL (exactly the reference's "secondary
    fetch returned nothing" branch)

Scale shape: the filter+projection is map-only over the raw payload table;
the langlinks self-join is an equi-join on (title, lang) — at 10^7+ pages it
shuffles both sides once on the join key (no skew: titles are unique).  Here
the partner side is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KB_COLS = ["title", "lang", "title_other", "abstract", "wikidata_id",
           "categories", "internal_links", "infobox_type", "geo_lat",
           "geo_lon", "thumbnail_url", "instance_of", "subclass_of",
           "part_of", "has_part"]


def kb_build(raw_pages: DataFrame, broadcast_partner: bool = True) -> DataFrame:
    """raw payload rows → KB pages (KB_COLS + abstract_other).

    Built as selectExpr batches + one expr-string join condition (round 8):
    the same expression trees as the old Column formulation in a handful of
    py4j round trips instead of ~300 (guide §1.2 — this constructs inside
    the bench timer on every q44 call)."""
    pages = (
        raw_pages
        .where("page_id >= 0 AND title IS NOT NULL AND trim(title) != ''")
        .selectExpr(
            "trim(title) AS title",
            "lang",
            "nullif(trim(coalesce(extract, '')), '') AS abstract",
            "wikibase_item AS wikidata_id",
            "transform(categories_raw, c -> "
            "replace(replace(c, 'Category:', ''), 'Kategorie:', '')) "
            "AS categories",
            "links_raw AS internal_links",
            "infobox AS infobox_type",
            "coord_lat AS geo_lat",
            "coord_lon AS geo_lon",
            "thumbnail_source AS thumbnail_url",
            "instance_of", "subclass_of", "part_of", "has_part",
            "langlink_lang", "langlink_title",
        ))
    partner = pages.selectExpr("title AS p_title", "lang AS p_lang",
                               "abstract AS abstract_other")
    if broadcast_partner:
        partner = F.broadcast(partner)
    return (pages
            .join(partner, F.expr("langlink_title = p_title "
                                  "AND langlink_lang = p_lang"), "left")
            .selectExpr("title", "lang", "p_title AS title_other", "abstract",
                        "wikidata_id", "categories", "internal_links",
                        "infobox_type", "geo_lat", "geo_lon", "thumbnail_url",
                        "instance_of", "subclass_of", "part_of", "has_part",
                        "abstract_other"))


def kb_aliases(kb: DataFrame) -> DataFrame:
    """Alias dictionary derived from a built KB (O-18 KB-side): delegates to
    the native variation expansion in fixtures.scaled_aliases_df."""
    from ..fixtures import scaled_aliases_df
    return scaled_aliases_df(kb.sparkSession, kb=kb)
