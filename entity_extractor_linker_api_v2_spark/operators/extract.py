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
    return refsem.extract_text_series(html)


MENTION_ROWS_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("link_lang", T.StringType()),
    T.StructField("surface", T.StringType()),
    T.StructField("label", T.StringType()),
    T.StructField("type", T.StringType()),
    T.StructField("pos", T.IntegerType()),
])


MENTION_ROWS_DEDUP_SCHEMA = T.StructType(
    MENTION_ROWS_SCHEMA.fields + [T.StructField("mention_idx", T.IntegerType())])


AC_THRESHOLD = 64  # above this many surfaces, Aho-Corasick beats the find loop


def extract_and_detect(docs, gazetteer: list[tuple[str, str, str]] | None = None,
                       html_col: str = "html", dedup: bool = False,
                       max_entities: int = 10, use_ac: bool | None = None):
    """Fused HTML→text→mentions stage: ONE Arrow round trip, explode done in
    Python (mapInPandas), so the full text never crosses the JVM↔Python
    boundary twice and there is no second UDF stage to schedule.  Semantics
    are exactly extract_text_udf ∘ detect_mentions ∘ explode (equivalence is
    pytest-asserted); this is the throughput path, the composable UDFs remain
    the inspectable/per-stage path.

    With ``dedup=True`` the per-document label-dedup + cap (O-26/O-29) also
    run here: both are strictly per-document, so doing them inside the map
    stage removes the only corpus-wide shuffle from the pipeline (the window
    formulation in operators.mentions remains the relational/oracle surface;
    outputs are identical and pytest-asserted)."""
    gaz = gazetteer if gazetteer is not None else fixtures.GAZETTEER
    if use_ac is None:
        use_ac = len(gaz) > AC_THRESHOLD

    def _match_find_loop(texts, pdf, urls, langs):
        parts = []
        for surface, label, etype in gaz:
            pos = texts.str.find(surface)
            hit = pos >= 0
            if hit.any():
                idx = pdf.index[hit]
                parts.append(pd.DataFrame({
                    "_row": idx, "url": urls[hit], "link_lang": langs[hit],
                    "surface": surface, "label": label, "type": etype,
                    "pos": (pos[hit] + 1).astype("int32")}))
        return parts

    if use_ac:
        from ..functions.ahocorasick import AhoCorasick
        _ac = AhoCorasick([s for s, _, _ in gaz])  # built once, ships in closure

    def _match_ac(texts, pdf, urls, langs):
        # one automaton pass per document: O(|text| + matches) independent of
        # |gaz| — the required shape for 10^5+-surface dictionaries.
        ac = _ac
        cols: dict[str, list] = {k: [] for k in
                                 ("_row", "url", "link_lang", "surface",
                                  "label", "type", "pos")}
        for row, url, lang, text in zip(pdf.index, urls, langs, texts):
            for pid, pos in ac.first_occurrences(text).items():
                surface, label, etype = gaz[pid]
                cols["_row"].append(row)
                cols["url"].append(url)
                cols["link_lang"].append(lang)
                cols["surface"].append(surface)
                cols["label"].append(label)
                cols["type"].append(etype)
                cols["pos"].append(pos)
        if not cols["_row"]:
            return []
        out = pd.DataFrame(cols)
        out["pos"] = out["pos"].astype("int32")
        return [out]

    def run(batches):
        for pdf in batches:
            texts = refsem.extract_text_series(pdf[html_col])
            urls, langs = pdf["url"], pdf["link_lang"]
            parts = (_match_ac if use_ac else _match_find_loop)(texts, pdf, urls, langs)
            if not parts:
                yield pd.DataFrame({c: pd.Series(dtype="int32" if c in ("pos", "mention_idx")
                                                 else object)
                                    for c in ("url", "link_lang", "surface", "label",
                                              "type", "pos", "mention_idx")
                                    if dedup or c != "mention_idx"})
                continue
            m = pd.concat(parts, ignore_index=True)
            if dedup:
                m["_k"] = m["label"].str.lower()
                m = (m.sort_values(["_row", "pos", "surface", "label"], kind="mergesort")
                     .drop_duplicates(["_row", "_k"], keep="first"))
                m["mention_idx"] = (m.groupby("_row").cumcount() + 1).astype("int32")
                m = m[m["mention_idx"] <= max_entities].drop(columns=["_k"])
            yield m.drop(columns=["_row"])

    schema = MENTION_ROWS_DEDUP_SCHEMA if dedup else MENTION_ROWS_SCHEMA
    return (docs.select("url", "link_lang", html_col)
            .mapInPandas(run, schema))


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
