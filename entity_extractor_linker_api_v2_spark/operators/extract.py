"""Arrow-batched extraction UDFs: HTML→text and mention detection.

These are the only Python-executed stages in the pipeline (input_hint: no
per-row Python — both are vectorized pandas UDFs over Arrow batches).

* ``extract_text_udf`` re-expresses the reference's text-ingest boundary
  (app/main.py:91-126 validation + app/core/utils.py:20-38 cleaning) as a
  boilerplate-stripping HTML→text function.  The per-row invariant
  (BASELINE.json): byte-identical output vs the pure function
  ``refsem.extract_text`` called outside Spark.

* ``detect_mentions_udf`` replaces the reference's LLM extractor
  (app/core/openai_wrapper.py:346-454) with the deterministic dictionary
  matcher seeded by the reference's own fallback NER
  (app/core/linker.py:217-239).  Semantics: a gazetteer surface mentions a
  document iff it occurs as a substring of the text; mention position is the
  first occurrence (this is exactly the DuckDB-oracle join formulation
  ``gaz JOIN docs ON strpos(text, surface) > 0`` — the UDF is the scale path,
  one vectorized pass instead of a |gaz| × corpus nested-loop join).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import fixtures, refsem

MENTION_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("surface", T.StringType()),
    T.StructField("label", T.StringType()),
    T.StructField("type", T.StringType()),
    T.StructField("pos", T.IntegerType()),
]))


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(refsem.extract_text)


def make_detect_mentions_udf(gazetteer: list[tuple[str, str, str]] | None = None):
    """Build the mention-detection pandas UDF over a (surface,label,type) dict.

    The gazetteer is closed over (it ships with the serialized task — at real
    scale it would be loaded from a broadcast variable / side file).  Matching
    is vectorized per surface: |gaz| calls to the C-level str.find over each
    Arrow batch.  For dictionaries of 10^5+ surfaces swap the loop for an
    Aho-Corasick automaton (same signature, same semantics).
    """
    gaz = gazetteer if gazetteer is not None else fixtures.GAZETTEER

    @F.pandas_udf(MENTION_SCHEMA)
    def detect_mentions(text: pd.Series) -> pd.Series:
        s = text.fillna("")
        hits_per_surface = []
        for surface, label, etype in gaz:
            pos = s.str.find(surface)
            hits_per_surface.append((surface, label, etype, pos))
        out = []
        for i in range(len(s)):
            row = []
            for surface, label, etype, pos in hits_per_surface:
                p = int(pos.iloc[i])
                if p >= 0:
                    row.append((surface, label, etype, p + 1))  # 1-based like strpos
            row.sort(key=lambda r: (r[3], r[0]))
            out.append(row)
        return pd.Series(out)

    return detect_mentions
