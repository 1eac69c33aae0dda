"""Mention-stage relational operators (all native Columns, no Python).

O-8  mention projection (explode)        — ref app/core/linker.py:139-146
O-9  entity-type filter                  — ref app/core/openai_wrapper.py:88-99
O-26 per-document mention cap            — ref app/core/entity_helpers.py:47
O-29 order-preserving dedup by lower(label) — ref app/core/entity_helpers.py:39-47

The dedup keeps the first occurrence (minimum text position, ties by surface)
per (url, lower(label)); the cap keeps the first `max_entities` mentions per
url in text order — both are per-group windows, NOT global limits, so they
parallelize per document at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..fixtures import DEFAULT_MAX_ENTITIES


def explode_mentions(docs_with_mentions: DataFrame, mentions_col: str = "mentions",
                     extra_cols: list[str] | None = None) -> DataFrame:
    """(url, link_lang, mentions:array<struct>) → one row per raw mention.
    extra_cols (e.g. the split stage's chunk_off) are carried through."""
    extra = list(extra_cols or [])
    return (
        docs_with_mentions
        .select("url", "link_lang", *extra, F.explode(mentions_col).alias("m"))
        .select("url", "link_lang", *extra,
                F.col("m.surface").alias("surface"),
                F.col("m.label").alias("label"),
                F.col("m.type").alias("type"),
                F.col("m.pos").alias("pos"))
    )


def filter_types(mentions: DataFrame, allowed: list[str] | str = "auto") -> DataFrame:
    """O-9: restrict to allowed entity types; "auto" = no-op.  Expressed as a
    Column predicate so Catalyst pushes it below the explode/scan."""
    if allowed == "auto" or not allowed:
        return mentions
    if isinstance(allowed, str):
        allowed = [allowed]
    return mentions.filter(F.col("type").isin(allowed))


def dedup_and_cap(mentions: DataFrame, max_entities: int = DEFAULT_MAX_ENTITIES) -> DataFrame:
    """O-29 + O-26: per-url dedup by lower(label) keeping first occurrence,
    then cap to max_entities in first-occurrence order; assigns mention_idx."""
    w_dup = Window.partitionBy("url", F.lower("label")).orderBy("pos", "surface", "label")
    w_cap = Window.partitionBy("url").orderBy("pos", "surface", "label")
    return (
        mentions
        .withColumn("_rn", F.row_number().over(w_dup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("mention_idx", F.row_number().over(w_cap))
        .filter(F.col("mention_idx") <= max_entities)
    )
