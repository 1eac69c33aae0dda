"""Independent pure-Python reference pipeline (the golden-triple oracle).

Implements the same contract as the Spark pipeline — extraction, fallback
linking, enhancement, triple emission — with plain dicts and loops, mirroring
the reference's per-entity control flow (process_entity, service.py:75-140;
fetch_with_fallbacks, strategies.py:168-225).  The Spark output is graded
against this with precision/recall ≥ 0.95 (BASELINE.json north rule).
"""

from __future__ import annotations

from entity_extractor_linker_api_v2_spark import fixtures, refsem

_ALIAS = {(a, lang): (t, p) for a, t, lang, p in fixtures.alias_rows()}
_REDIR = {(f, lang): t for f, t, lang in fixtures.KB_REDIRECTS}
_KB = {(p["title"], p["lang"]): p for p in fixtures.KB_PAGES}


def derive_docs(documents_rows) -> list[tuple[str, str, str]]:
    """documents rows (doc_id, text, lang) → (url, body_text, link_lang)."""
    out = []
    n = len(fixtures.SENTENCES)
    for doc_id, text, lang in documents_rows:
        body = f"{text} {fixtures.SENTENCES[doc_id % n]}"
        if doc_id % 2 == 0:
            body += " " + fixtures.SKEW_SENTENCE
        url = (f"https://test.example/{lang}/doc"
               f"{doc_id:0{fixtures.URL_ID_DIGITS}d}")
        out.append((url, body, "de" if lang == "de" else "en"))
    return out


def extract_mentions(body: str, max_entities: int = 10):
    hits = []
    for surface, label, etype in fixtures.GAZETTEER:
        pos = body.find(surface)
        if pos >= 0:
            hits.append((pos + 1, surface, label, etype))
    hits.sort(key=lambda h: (h[0], h[1]))
    seen: set[str] = set()
    mentions = []
    for pos, surface, label, etype in hits:
        key = label.lower()
        if key in seen:
            continue
        seen.add(key)
        mentions.append((label, etype, pos))
        if len(mentions) >= max_entities:
            break
    return mentions


def link_label(label: str, link_lang: str):
    """Sequential fallback probing; returns (page, hit_lang) or (None, None)."""
    probes = [(label, link_lang)]
    if link_lang != "de":
        probes.append((label, "de"))
    probes += [(v, link_lang) for v in refsem.name_variations(label)]
    for probe, plang in probes:
        resolved = _REDIR.get((probe, plang), probe)
        hit = _ALIAS.get((resolved, plang))
        if not hit:
            continue
        page = _KB.get((hit[0], plang))
        if page and page["abstract"]:
            return page, plang
    return None, None


def entity_record(url: str, label: str, etype: str, link_lang: str) -> dict:
    page, hit_lang = link_label(label, link_lang)
    if page:
        title_de = page["title"] if hit_lang == "de" else page["title_other"]
        title_en = page["title"] if hit_lang == "en" else page["title_other"]
        rec = {
            "label_de": title_de or "", "label_en": title_en or "",
            "url_de": refsem.wiki_url(title_de, "de") if title_de else "",
            "url_en": refsem.wiki_url(title_en, "en") if title_en else "",
            "extract": page["abstract"] or "", "wikidata_id": page["wikidata_id"] or "",
            "categories": page["categories"] or [], "internal_links": page["internal_links"] or [],
            "geo_lat": page["geo_lat"], "geo_lon": page["geo_lon"],
            "infobox_type": page["infobox_type"] or "",
            "thumbnail_url": page["thumbnail_url"] or "", "status": "found",
            "part_of": page["part_of"] or [], "has_part": page["has_part"] or [],
        }
    else:
        rec = {"label_de": "", "label_en": "", "url_de": "", "url_en": "",
               "extract": "", "wikidata_id": "", "categories": [],
               "internal_links": [], "geo_lat": None, "geo_lon": None,
               "infobox_type": "", "thumbnail_url": "", "status": "not_found",
               "part_of": [], "has_part": []}
    enh = refsem.enhance_fields(rec["label_de"], rec["label_en"], rec["url_de"],
                                rec["url_en"], rec["status"], label)
    rec.update(enh)
    rec["dbpedia_uri"] = refsem.finalize_dbpedia_uri("", rec["label_en"], rec["url_en"])
    rec["linked"] = refsem.linked_status(rec["status"], rec["wikidata_id"])
    rec["url"], rec["label"], rec["type"] = url, label, etype
    return rec


def golden_triples(documents_rows) -> set[tuple[str, str, str, str]]:
    triples: set[tuple[str, str, str, str]] = set()
    for url, body, link_lang in derive_docs(documents_rows):
        for label, etype, _pos in extract_mentions(body):
            r = entity_record(url, label, etype, link_lang)
            subj = r["label_de"]
            triples.add((url, subj, "instance_of", etype))
            if r["wikidata_id"]:
                triples.add((url, subj, "same_as", r["wikidata_id"]))
            if r["dbpedia_uri"]:
                triples.add((url, subj, "same_as", r["dbpedia_uri"]))
            for c in r["categories"]:
                triples.add((url, subj, "has_category", c))
            for li in r["internal_links"]:
                triples.add((url, subj, "links_to", li))
            for po in r["part_of"]:
                triples.add((url, subj, "part_of", po))
            for hp in r["has_part"]:
                triples.add((url, subj, "has_part", hp))
            if r["geo_lat"] is not None and r["geo_lon"] is not None:
                triples.add((url, subj, "located_at", f"{r['geo_lat']},{r['geo_lon']}"))
    return triples
