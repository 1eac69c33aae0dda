"""Native-Column text functions shared by linking + KB-build.

title_case: Python ``str.title()`` semantics (the reference's casing —
strategies.py:232, mirrored by refsem.name_variations) as a pure Column
expression.  ``F.initcap`` is NOT equivalent: initcap only uppercases after
whitespace, while str.title() treats EVERY uncased character as a word
boundary ("karl-marx-stadt" → "Karl-Marx-Stadt" vs initcap's
"Karl-marx-stadt").  Implemented as one char-wise transform with index —
applied only to distinct labels / KB titles (dimension-side cardinality), so
the per-char array cost is irrelevant at corpus scale.

Known deviation (both engines, documented): a word-INITIAL 'ß' uppercases to
"SS" (Java/DuckDB) where Python titlecases to "Ss"; German orthography has
no word-initial ß, and the fixture/label universe never exercises it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_CASED = r"[\p{Lu}\p{Ll}\p{Lt}]"
# the same character class as it appears INSIDE a Spark SQL string literal
# (the SQL parser unescapes \\ -> \ before the regex engine sees it)
_CASED_SQL = r"[\\p{Lu}\\p{Ll}\\p{Lt}]"


def title_case_sql(x: str) -> str:
    """SQL-text twin of ``title_case`` for an expression string ``x``.

    Parses to the identical expression tree in ONE round trip — the
    lambda-built Column version issues dozens of py4j calls per use, pure
    plan-construction time inside bench timers (guide §1.2).  Equality with
    the Column twin is pytest-asserted on the tricky-name set."""
    return (
        "concat_ws('', transform(split(" + x + ", ''), (c, i) -> "
        "CASE WHEN NOT (c RLIKE '" + _CASED_SQL + "') THEN c "
        "WHEN i = 0 OR NOT (substring(" + x + ", i, 1) RLIKE '"
        + _CASED_SQL + "') THEN upper(c) "
        "ELSE lower(c) END))")


def title_case(col: Column | str) -> Column:
    if isinstance(col, str):
        return F.expr(title_case_sql(col))
    c0 = col
    return F.concat_ws("", F.transform(
        F.split(c0, ""),
        lambda c, i: F.when(~c.rlike(_CASED), c)
        .when((i == 0) | ~c0.substr(i, F.lit(1)).rlike(_CASED), F.upper(c))
        .otherwise(F.lower(c))))
