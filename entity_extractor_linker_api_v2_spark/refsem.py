"""Pure-Python semantic core: deterministic rules re-expressed from the reference.

Every function here is a *behavioral* re-implementation of a deterministic rule
in ``janschachtschabel/entity-extractor-linker-api-v2`` (citations point into
``/root/reference``).  These functions serve three purposes:

1. They are the oracle for the pytest truth-table / byte-identical tests.
2. They run inside Arrow-batched pandas UDFs (the only Python on the hot path).
3. They document the exact semantics the native-Column Spark expressions in
   ``functions/`` and ``operators/`` must reproduce.

No code is copied from the reference; each rule was re-derived from its
observable behavior and the reference's own tests.
"""

from __future__ import annotations

import hashlib
import re

# ---------------------------------------------------------------------------
# O-37: control-char cleaning  (ref: app/core/utils.py:20-38)
# ---------------------------------------------------------------------------

_WS_RUN = re.compile(r"\s+")


_TNR_TO_SPACE = {9: 32, 10: 32, 13: 32}


def clean_text(text: str) -> str:
    """JSON-safe cleaning: non-printables (except \\t\\n\\r) -> space, collapse
    whitespace runs to one space, strip.  Must stay bit-exact: it feeds the
    byte-identical-extracted-text invariant (BASELINE.json input_hint).

    Fast path: when every char is printable-or-\\t\\n\\r (checked at C speed
    via translate+isprintable), the per-char scan is provably the identity,
    so only the whitespace collapse runs.  The exact char loop remains the
    fallback for dirty input — semantics identical by construction.
    """
    if not text:
        return text
    if text.translate(_TNR_TO_SPACE).isprintable():
        # " ".join(split()) ≡ _WS_RUN.sub(" ", text).strip() here: on the
        # printable path the only whitespace chars are {space,\t,\n,\r}
        # (every other char in re's \s — which equals str.isspace()'s set,
        # verified over the BMP — is non-printable), and both formulations
        # collapse runs of exactly those chars and drop leading/trailing
        # runs.  split/join runs at C speed; the regex sub was the dominant
        # cost of the pipeline's text-extraction stage.
        return " ".join(text.split())
    kept = [c if (c.isprintable() or c in "\t\n\r") else " " for c in text]
    return _WS_RUN.sub(" ", "".join(kept)).strip()


# ---------------------------------------------------------------------------
# O-38: text splitter  (ref: app/core/utils.py:41-139)
# ---------------------------------------------------------------------------

_SENT_SPLIT = re.compile(r"(?<=[.!?]) +")


def split_text(
    text: str,
    chunk_size: int = 200,
    overlap: int = 50,
    *,
    preserve_sentences: bool = True,
) -> list[str]:
    """Chunker with the reference's exact window/packing semantics.

    char mode: fixed windows advancing by (chunk_size - overlap).
    sentence mode: greedy packing of regex-split sentences to chunk_size with
    sentence-granular overlap carried into the next chunk.
    """
    text = text.strip()
    if not text:
        return []
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    if overlap < 0 or overlap >= chunk_size:
        raise ValueError("0 <= overlap < chunk_size required")

    if not preserve_sentences:
        out: list[str] = []
        start = 0
        while start < len(text):
            out.append(clean_text(text[start : start + chunk_size]))
            start += chunk_size - overlap
        return out

    sentences = [s.strip() for s in _SENT_SPLIT.split(text)]
    chunks: list[str] = []
    cur = ""
    cur_sents: list[str] = []
    for s in sentences:
        if not s:
            continue
        if len(cur) + len(s) + 1 <= chunk_size:
            cur = f"{cur} {s}" if cur else s
            cur_sents.append(s)
            continue
        if cur:
            chunks.append(clean_text(cur))
        if overlap > 0 and cur_sents:
            # carry whole trailing sentences while they fit in `overlap` chars
            carry = ""
            carry_len = 0
            for prev in reversed(cur_sents):
                if carry_len + len(prev) + 1 <= overlap:
                    carry = prev + (" " + carry if carry else "")
                    carry_len += len(prev) + (1 if carry != prev else 0)
                else:
                    break
            if carry:
                cur = carry + " " + s
                cur_sents = [p for p in cur_sents if p in carry] + [s]
            else:
                cur, cur_sents = s, [s]
        else:
            cur, cur_sents = s, [s]
    if cur:
        chunks.append(clean_text(cur))
    return chunks


# ---------------------------------------------------------------------------
# O-18: alias / name-variation generation
# (ref: app/services/wikipedia/fallbacks/strategies.py:227-258; order is the
#  fallback-chain probe order, so the index doubles as join priority, O-17)
# ---------------------------------------------------------------------------


def name_variations(name: str) -> list[str]:
    """Ordered, de-duplicated variations of an entity name; original excluded."""
    cands = [name.title(), name.lower(), name.upper()]
    for art in ("Der ", "Die ", "Das "):
        if name.startswith(art):
            cands.append(name[len(art) :])
    cands += [
        name.replace("ß", "ss"),
        name.replace("ä", "ae"),
        name.replace("ö", "oe"),
        name.replace("ü", "ue"),
    ]
    seen: set[str] = set()
    out: list[str] = []
    for v in cands:
        if v != name and v not in seen:
            seen.add(v)
            out.append(v)
    return out


def probe_keys(name: str) -> list[tuple[str, int]]:
    """(alias, priority) probe sequence for one mention: identity first, then
    variations in reference fallback order (strategies.py:168-225)."""
    return [(name, 0)] + [(v, i + 1) for i, v in enumerate(name_variations(name))]


# ---------------------------------------------------------------------------
# O-11: page-completeness gate  (ref: strategies.py:20-24)
# ---------------------------------------------------------------------------


def is_page_complete(title_de: str | None, title_en: str | None,
                     abstract_de: str | None, abstract_en: str | None) -> bool:
    return bool((title_de or title_en) and (abstract_de or abstract_en))


# ---------------------------------------------------------------------------
# O-33/O-34/O-35: URL + DBpedia derivations
# (ref: app/services/wikipedia/models.py:29-41;
#  app/services/wikipedia/utils/data_processor.py:154-176, 297-343)
# ---------------------------------------------------------------------------


def wiki_url(title: str | None, lang: str) -> str:
    if not title:
        return ""
    return f"https://{lang}.wikipedia.org/wiki/" + title.replace(" ", "_")


def dbpedia_uri_from_title(title_en: str | None) -> str:
    if not title_en or not title_en.strip():
        return ""
    return "http://dbpedia.org/resource/" + title_en.strip().replace(" ", "_")


def finalize_dbpedia_uri(existing: str, label_en: str, url_en: str) -> str:
    """Coalesce chain: existing -> from label_en -> parsed from url_en -> ''."""
    if existing and existing.strip():
        return existing
    if label_en and label_en.strip():
        return dbpedia_uri_from_title(label_en)
    if url_en and "en.wikipedia.org/wiki/" in url_en:
        title = url_en.split("en.wikipedia.org/wiki/")[-1].replace("_", " ")
        return dbpedia_uri_from_title(title)
    return ""


# ---------------------------------------------------------------------------
# O-36: prompt-data enhancement  (ref: data_processor.py:232-295) — the parts
# that are deterministic given mention label only (the rebuild's prompt
# metadata is {label_de: mention_label}, cf. app/core/linker.py:66-71).
# ---------------------------------------------------------------------------


def enhance_fields(label_de: str, label_en: str, url_de: str, url_en: str,
                   status: str, mention_label: str) -> dict[str, str]:
    """Returns the post-enhancement (label_de, url_de, url_en, status)."""
    if not label_de:
        label_de = mention_label
    if not url_de and label_de:
        url_de = wiki_url(label_de, "de")
        if status == "not_found":
            status = "found_from_prompt"
    if not url_en and label_en:
        url_en = wiki_url(label_en, "en")
    return {"label_de": label_de, "url_de": url_de, "url_en": url_en, "status": status}


# ---------------------------------------------------------------------------
# O-10: linked-status rule  (ref: app/core/linker.py:164-167)
# ---------------------------------------------------------------------------


def linked_status(status: str, wikidata_id: str | None) -> str:
    return "linked" if status in ("found", "found_from_prompt") and wikidata_id else "not_linked"


# ---------------------------------------------------------------------------
# O-13 seed: the reference's deterministic regex NER patterns
# (ref: app/core/linker.py:217-239) — re-expressed as pattern constants used
# both by the Spark native regexp path and the DuckDB oracle.
# ---------------------------------------------------------------------------

NER_PATTERNS: list[tuple[str, str]] = [
    (r"\b[A-ZÄÖÜ][a-zäöüß]+ [A-ZÄÖÜ][a-zäöüß]+\b", "PERSON"),
    (r"\b[A-ZÄÖÜ][a-zäöüß]+(?:stadt|berg|burg|dorf|heim)\b", "LOCATION"),
    (r"\b(?:Deutschland|Österreich|Schweiz|Berlin|München|Hamburg)\b", "LOCATION"),
]


def regex_ner(text: str, max_entities: int = 10) -> list[tuple[str, str]]:
    """Reference fallback extraction: patterns applied in order, each match list
    truncated, global cap applied."""
    out: list[tuple[str, str]] = []
    for pattern, etype in NER_PATTERNS:
        for m in re.findall(pattern, text)[:max_entities]:
            if len(out) >= max_entities:
                break
            out.append((m, etype))
    return out[:max_entities]


# ---------------------------------------------------------------------------
# O-25: QA level distribution  (ref: app/core/qa.py:224-233)
# ---------------------------------------------------------------------------


def distribute_pairs(num_pairs: int, levels: list[str]) -> dict[str, int]:
    base, extra = divmod(num_pairs, len(levels))
    return {lvl: base + (1 if i < extra else 0) for i, lvl in enumerate(levels)}


DEFAULT_LEVELS = [
    "Elementarbereich", "Primarstufe", "Sekundarstufe I", "Sekundarstufe II",
    "Hochschule", "Berufliche Bildung", "Erwachsenenbildung", "Förderschule",
]


# ---------------------------------------------------------------------------
# O-41/O-42: QA semicolon parsing + closest-level match
# (ref: app/core/qa.py:113-134, 343-367, 387-403)
# ---------------------------------------------------------------------------

_NUMBERING = re.compile(r"^\d+[.)\s]+")
_LETTERING = re.compile(r"^[a-zA-Z][.)\s]+")


def parse_qa_lines(content: str, max_chars: int | None = None) -> list[tuple[str, str]]:
    """Parse 'Frage;Antwort' lines; strip code fences; truncate answers."""
    content = content.strip()
    if content.startswith("```"):
        lines = content.split("\n")
        if len(lines) > 2:
            content = "\n".join(lines[1:-1])
    pairs: list[tuple[str, str]] = []
    for line in content.splitlines():
        line = line.strip()
        if ";" not in line or not line:
            continue
        q, _, a = line.partition(";")
        q, a = q.strip(), a.strip()
        if q and a:
            if max_chars and len(a) > max_chars:
                a = a[: max_chars - 3] + "..."
            pairs.append((q, a))
    return pairs


def strip_numbering(q: str) -> str:
    return _LETTERING.sub("", _NUMBERING.sub("", q).strip()).strip()


def closest_level(provided: str, valid: list[str]) -> str:
    p = provided.lower()
    for lvl in valid:
        if lvl.lower() == p:
            return lvl
    for lvl in valid:
        if p in lvl.lower() or lvl.lower() in p:
            return lvl
    return valid[0]


# ---------------------------------------------------------------------------
# O-43: topic extraction  (ref: app/core/compendium.py:30-36)
# ---------------------------------------------------------------------------


def extract_topic(text: str) -> str:
    first = text.split(".")[0].strip()
    if len(first) > 10:
        return first
    return text[:100].strip() if len(text) > 100 else text.strip()


# ---------------------------------------------------------------------------
# O-45: deterministic entity id (replaces uuid4 at app/api/v1/linker.py:253)
# ---------------------------------------------------------------------------


def entity_id(url: str, label: str) -> str:
    return hashlib.sha256(f"{url}{label}".encode()).hexdigest()


# ---------------------------------------------------------------------------
# HTML template + extraction (BASELINE.json input_hint stage).  The synthetic
# html wraps the document text in deterministic boilerplate; extract_text
# strips it.  The byte-identical invariant is: for every url,
# extract_text(render_html(t)) == clean_text(t).
# ---------------------------------------------------------------------------

_HTML_PRE = ("<html><head><title>doc</title><style>.x{color:red}</style></head>"
             "<body><nav>NAVIGATION BOILERPLATE</nav><p>")
_HTML_POST = "</p><footer>FOOTER BOILERPLATE</footer></body></html>"
_P_RE = re.compile(r"<p>(.*?)</p>", re.S)
_TAG_RE = re.compile(r"<[^>]+>")


def html_escape(text: str) -> str:
    """Minimal invertible HTML escaping for text nodes (&, <, > — & first).

    Without it, body text that LOOKS like a tag (hypothesis counterexample
    '<0>') is destroyed by tag-stripping on extraction, breaking the
    byte-identical round-trip invariant (SURVEY §7.4.1)."""
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def html_unescape(text: str) -> str:
    """Exact inverse of html_escape: named entities first, &amp; last."""
    return text.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")

# Conservative "might need the exact char loop" probe: any char outside
# ASCII-printable + \t\n\r + Latin-1 letters (\xc0-\xff, all printable).
# False positives only cost speed, never correctness.
_SUSPECT_RE = re.compile(r"[^\t\n\r\x20-\x7E\xC0-\xFF]")


def render_html(text: str) -> bytes:
    return (_HTML_PRE + html_escape(text) + _HTML_POST).encode("utf-8")


def _extract_text_str(doc: str) -> str:
    paras = _P_RE.findall(doc)
    body = " ".join(_TAG_RE.sub(" ", p) for p in paras) if paras else _TAG_RE.sub(" ", doc)
    return clean_text(html_unescape(body))


def extract_text(html: bytes | None) -> str:
    """Boilerplate-stripping HTML→text: keep <p> bodies, drop nav/footer/style,
    then apply the reference's JSON-safe cleaning (clean_text)."""
    if not html:
        return ""
    return _extract_text_str(html.decode("utf-8", errors="replace"))


def clean_text_series(texts):
    """Vectorized clean_text over a pandas Series — C-level scans for rows
    provably on the fast path (no suspect chars), the exact per-row function
    for the rest.  Output is byte-identical to clean_text row-wise.

    Collapse detection is four C-level substring scans (the regex
    alternation `[\\t\\n\\r]|  ` cost ~9x more on KB-sized rows), and the
    collapse itself is ' '.join(split()) — exact on non-suspect rows, whose
    whitespace is ⊆ {space,\\t,\\n,\\r} by the suspect definition (see
    clean_text's fast-path note)."""
    texts = texts.fillna("")
    suspect = texts.str.contains(_SUSPECT_RE, regex=True)
    # collapse is only needed when a whitespace RUN can exist (tab/newline/
    # carriage-return or a double space); everything else just strips.
    needs_collapse = (texts.str.contains("  ", regex=False)
                      | texts.str.contains("\t", regex=False)
                      | texts.str.contains("\n", regex=False)
                      | texts.str.contains("\r", regex=False)) & ~suspect
    out = texts.str.strip()
    if needs_collapse.any():
        import pandas as pd
        src = texts[needs_collapse]
        out[needs_collapse] = pd.Series(
            [" ".join(x.split()) for x in src], index=src.index, dtype=object)
    if suspect.any():
        out[suspect] = texts[suspect].map(clean_text)
    return out


def extract_text_series(html):
    """Vectorized extract_text over a pandas Series of bytes: the synthetic
    single-<p>, tag-free-body shape takes the C-level path; anything else
    (multiple <p>, nested tags, no <p>) falls back to the exact per-row
    function.  Byte-identical to extract_text row-wise.

    The fast path works on BYTES: markers are located with bytes.find and
    only the <p> body is sliced out and decoded — the full-document decode
    plus the non-greedy `<p>(.*?)</p>` regex over the decoded string cost
    ~2.4x more and were the single largest term of the pipeline's wall
    clock.  Byte-level marker tests are exact: the markers are pure ASCII,
    UTF-8 is self-synchronizing for ASCII, and the errors='replace' handler
    maps invalid bytes to U+FFFD only (never to '<', 'p', '&' or '>'), so
    occurrence counts and positions of '<p>'/'</p>'/'<'/'&' agree between
    the byte string and its decoded form for every input.
    """
    import pandas as pd
    hb = html.fillna(b"")
    vals: list[str | None] = []
    slow_rows: list[bool] = []
    for h in hb:
        a = h.find(b"<p>")
        if a >= 0 and h.find(b"<p>", a + 3) < 0:
            b_ = h.find(b"</p>", a + 3)
            if b_ >= 0:
                body = h[a + 3:b_]
                # "&" excluded from the fast path: an entity-bearing body
                # needs the exact per-row unescape (html_unescape) to
                # preserve the round-trip invariant.
                if b"<" not in body and b"&" not in body:
                    vals.append(body.decode("utf-8", errors="replace"))
                    slow_rows.append(False)
                    continue
        vals.append(None)
        slow_rows.append(True)
    out = pd.Series(vals, index=hb.index, dtype=object)
    fast = ~pd.Series(slow_rows, index=hb.index)
    if fast.any():
        out[fast] = clean_text_series(out[fast])
    slow = ~fast
    if slow.any():
        out[slow] = hb[slow].map(extract_text)
    return out
