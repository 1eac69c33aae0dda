"""Text-analysis operators for training-data curation: language ID, quality
scoring, token counting.  All native Columns (codegen'd, zero Python)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DE_STOPWORDS = ("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "von", "zu")
EN_STOPWORDS = ("the", "and", "is", "of", "a", "to", "in", "that", "it", "for")


def _hits(text_col: str, words: tuple[str, ...]):
    return F.size(F.filter(F.split(F.lower(text_col), " "),
                           lambda w: w.isin(*words)))


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-profile heuristic language ID (n-gram-free variant; the
    reference fixes language per request, linker.py:17 — a corpus pipeline
    must infer it)."""
    de, en = _hits(text_col, DE_STOPWORDS), _hits(text_col, EN_STOPWORDS)
    return df.select(
        F.col(id_col), de.alias("de_hits"), en.alias("en_hits"),
        F.when(de > en, F.lit("de")).when(en > de, F.lit("en"))
         .otherwise(F.lit("und")).alias("pred_lang"))


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality signals + keep flag.

    Round-8 micro-shape (values unchanged): token count is taken from the
    SAME lowered split the stopword filter traverses (split count is
    case-independent, so one split + one lower instead of two splits), and
    the punctuation count uses translate() — a C-level char strip — instead
    of a regex replace over the full text."""
    toks = F.split(F.lower(text_col), " ")
    n_tok = F.size(toks)
    n_chars = F.length(text_col)
    stop = F.size(F.filter(toks, lambda w: w.isin(*(DE_STOPWORDS + EN_STOPWORDS))))
    n_punct = F.length(text_col) - F.length(F.translate(F.col(text_col), ".,;:!?", ""))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round(n_chars / F.greatest(n_tok, F.lit(1)), 4).alias("avg_token_len"),
        F.round(n_punct * 1.0 / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(stop * 1.0 / F.greatest(n_tok, F.lit(1)), 4).alias("stopword_ratio"),
        ((n_tok >= 10) & (n_chars >= 50)).alias("keep"))


# GPT-2-style pre-tokenizer alternation, restricted to the subset Spark's
# Java regex and the DuckDB oracle's RE2 count IDENTICALLY: no lookahead
# (RE2 lacks it), and whitespace spelled as an explicit class — Java's \s
# includes \x0B (vertical tab) while RE2's does not, so a bare \s makes the
# engines split differently around VT characters.
_WS_CLS = r" \t\n\x0B\f\r"
BPE_SPLIT_RE = (r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+"
                rf"| ?[^{_WS_CLS}\p{{L}}\p{{N}}]+|[{_WS_CLS}]+")


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Three token-count columns per doc: whitespace tokens, alnum runs
    (subword floor) and GPT-2-style pre-tokenizer pieces (the BPE-ish count
    an LLM-data pipeline budgets with — each piece splits further into ≥1
    BPE ids, so this is a stable lower bound proportional to real token
    cost)."""
    return df.select(
        F.col(id_col),
        F.size(F.split(F.trim(text_col), r"\s+")).alias("ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"))
         .alias("alnum_tokens"),
        # Column API, not F.expr: the pattern contains a single quote and
        # backslash classes that SQL-literal escaping would mangle
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_RE), F.lit(0)))
         .alias("bpeish_tokens"))
