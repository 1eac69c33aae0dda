"""Enrichment operators: closest-level match, synonym expansion, translation.

Corpus-scale rebuilds of three row-level reference utilities:

  * ``closest_level_match`` — O-42 (ref app/core/qa.py:387-403 /
    refsem.closest_level): exact case-insensitive match over the valid
    levels in declaration order, then bidirectional-substring match in the
    same order, else the first valid level.  Expressed as one broadcast
    cross-join against the (tiny) levels dimension + a priority window —
    the per-row when-chain the reference runs, vectorized.
  * ``synonym_expand`` — ref app/core/utils.py:142-165 fallback dict
    (functions.generation.SIMPLE_SYNONYMS): broadcast dictionary
    explode-join; unknown words produce zero rows, matching the
    reference's [] fallback.
  * ``translate_column`` — ref app/core/utils.py:166-205 no-backend
    fallback: the exact "[{lang} translation of]: {text}" template as a
    native concat (a model-backed Generator drops in via
    functions.generation without touching this plan).

All three are map-side (broadcast dims only) — zero corpus shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def closest_level_match(df: DataFrame, provided_col: str, levels: list[str],
                        id_col: str = "doc_id") -> DataFrame:
    """Append ``matched_level``: the reference's closest-match rule over
    `levels` (order-significant).  match_type 0 = exact (case-insensitive),
    1 = substring either direction; ties break on level order; no match →
    levels[0].  `id_col` must be unique per row (the window/join-back key)."""
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(i, lvl) for i, lvl in enumerate(levels)], "level_idx int, level string")
    p, lv = F.lower(F.col(provided_col)), F.lower(F.col("level"))
    mt = (F.when(lv == p, 0)
          .when((F.instr(lv, p) > 0) | (F.instr(p, lv) > 0), 1))
    w = Window.partitionBy(id_col).orderBy("match_type", "level_idx")
    best = (df.select(id_col, provided_col).crossJoin(F.broadcast(dim))
            .withColumn("match_type", mt)
            .filter(F.col("match_type").isNotNull())
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(id_col, "level"))
    return (df.join(best, id_col, "left")
            .withColumn("matched_level", F.coalesce("level", F.lit(levels[0])))
            .drop("level"))


def synonym_dim(spark, synonyms: dict[str, list[str]] | None = None,
                max_synonyms: int = 5) -> DataFrame:
    """(word, syn_idx, synonym) dimension from the fallback dict — the
    broadcast side of the expansion join."""
    from ..functions.generation import SIMPLE_SYNONYMS
    d = synonyms if synonyms is not None else SIMPLE_SYNONYMS
    rows = [(w, i + 1, s)
            for w, syns in d.items() for i, s in enumerate(syns[:max_synonyms])]
    return spark.createDataFrame(rows, "word string, syn_idx int, synonym string")


def synonym_expand(df: DataFrame, word_col: str,
                   synonyms: dict[str, list[str]] | None = None,
                   max_synonyms: int = 5) -> DataFrame:
    """One row per (input row, synonym); unknown words emit nothing
    (reference [] fallback).  The dictionary broadcasts — the corpus side
    never shuffles."""
    dim = synonym_dim(df.sparkSession, synonyms, max_synonyms)
    return df.join(F.broadcast(dim), df[word_col] == dim.word).drop("word")


def translate_column(df: DataFrame, text_col: str, target_lang_col) -> DataFrame:
    """Append ``translated`` via the reference's exact no-backend fallback
    template (utils.py:200)."""
    return df.withColumn(
        "translated",
        F.concat(F.lit("["), target_lang_col, F.lit(" translation of]: "),
                 F.col(text_col)))
