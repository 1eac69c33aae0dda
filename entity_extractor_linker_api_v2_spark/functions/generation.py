"""Pluggable generation surface (replaces the reference's OpenAI calls, O-5).

The north rule forbids live LLM/network calls: every generation hook
(entity generation, compendium prose, QA pairs, synonyms, translation —
openai_wrapper.py:144-454, compendium.py:148-154, qa.py:89-94) becomes a
`Generator` protocol the pipeline calls through.  The shipped implementation
is `DeterministicGenerator` — pure functions of the input (the reference's
own fallbacks where it has them); a model-backed implementation can be
registered without touching any pipeline code.
"""

from __future__ import annotations

from typing import Protocol

from .. import refsem

# ref app/core/utils.py:142-145 — the reference's non-LLM synonym fallback
SIMPLE_SYNONYMS: dict[str, list[str]] = {
    "Berg": ["Gebirge", "Erhebung"],
    "hoch": ["groß", "erhaben"],
}


class Generator(Protocol):
    def synonyms(self, word: str, max_synonyms: int, lang: str) -> list[str]: ...
    def translate(self, text: str, target_lang: str) -> str: ...
    def qa_pairs(self, markdown: str, num_pairs: int,
                 max_chars: int | None) -> list[tuple[str, str]]: ...
    def compendium(self, topic: str, context: str) -> str: ...
    def entities(self, text: str, max_entities: int,
                 lang: str) -> list[tuple[str, str]]: ...


class DeterministicGenerator:
    """Network-free generator: reference fallback semantics where defined,
    deterministic templates elsewhere."""

    def synonyms(self, word: str, max_synonyms: int = 5, lang: str = "de") -> list[str]:
        # utils.py:160 — dict fallback, truncated
        return SIMPLE_SYNONYMS.get(word, [])[:max_synonyms]

    def translate(self, text: str, target_lang: str = "en") -> str:
        # utils.py:200 — the reference's exact no-backend fallback string
        return f"[{target_lang} translation of]: {text}"

    def qa_pairs(self, markdown: str, num_pairs: int = 5,
                 max_chars: int | None = None) -> list[tuple[str, str]]:
        """Deterministic QA: one question per leading sentence."""
        sents = [s for s in refsem._SENT_SPLIT.split(markdown.strip()) if s.strip()]
        pairs = []
        for i, s in enumerate(sents[:num_pairs]):
            a = s.strip()
            if max_chars and len(a) > max_chars:
                a = a[: max_chars - 3] + "..."
            pairs.append((f"Was besagt Satz {i + 1}?", a))
        return pairs

    def compendium(self, topic: str, context: str) -> str:
        body = context if context else "*Keine Quellen verfügbar.*"
        return f"# {topic}\n\n{body}"

    def entities(self, text: str, max_entities: int = 10,
                 lang: str = "de") -> list[tuple[str, str]]:
        """mode="generate" twin (openai_wrapper.py:207-338): related KB
        titles by content-token overlap with the page abstract — the
        row-level equivalent of operators.generate.generate_mentions."""
        import re

        from .. import fixtures
        from ..operators.generate import INFOBOX_TYPE, MIN_TOKEN_LEN

        def toks(s: str) -> set[str]:
            return {t for t in re.split(r"[^a-zäöüß]+", s.lower())
                    if len(t) >= MIN_TOKEN_LEN}

        tt = toks(text)
        scored: list[tuple[int, str, str]] = []
        for p in fixtures.KB_PAGES:
            if p["lang"] != lang or not p["abstract"]:
                continue
            ov = len(tt & toks(p["abstract"]))
            if ov >= 1:
                typ = INFOBOX_TYPE.get(p["infobox_type"] or "", "CONCEPT")
                scored.append((-ov, p["title"], typ))
        scored.sort()
        return [(t, typ) for _, t, typ in scored[:max_entities]]


DEFAULT_GENERATOR: Generator = DeterministicGenerator()
