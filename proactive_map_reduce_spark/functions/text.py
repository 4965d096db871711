"""Scalar text functions (SURVEY §2.9 F1-F5, M2/M3).

All pure built-in column expressions (JVM-side, whole-stage-codegen
friendly) — no Python UDFs. Each mirrors a reference behavior:

- normalize_text   → reference ``normalize_answer``/``normalize_text``
  (test_proactive.py:51-65, 89-108): lower → strip punctuation → remove
  articles ``\\b(a|an|the)\\b`` → collapse whitespace.
- normalize_question → test_proactive.py:35-39.
- exact_match / substring_match → test_proactive.py:79-83.
- any_answer_contained → ``text_has_answer`` test_proactive.py:68-76.
- first_line → ``get_answer_from_model_output`` test_proactive.py:85-87 and
  pipeline_70b_samsum.py:302-303 (lstrip newlines, take first line).

The regexes are chosen to behave identically under Java regex (Spark) and
RE2 (DuckDB) so every one of these is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Kept deliberately simple/portable: strip everything except lowercase
# alphanumerics and whitespace (the reference's normalize_answer removes
# only punctuation; deleting \n/\t here would MERGE adjacent words —
# 'foo\nbar' must normalize to 'foo bar', not 'foobar'). Whitespace is an
# explicit char class, not \s: Java's \s includes \x0B while RE2's
# (DuckDB's) does not, so \s in a deletion/collapse pattern silently
# diverges across engines on vertical tabs. Non-ASCII letters are still
# dropped — a documented simplification (the fixture corpus is ASCII).
_WS_CHARS = " \t\n\r\f"
_PUNCT_PATTERN = f"[^a-z0-9{_WS_CHARS}]"
_ARTICLE_PATTERN = r"\b(a|an|the)\b"
_WS_PATTERN = f"[{_WS_CHARS}]+"


def normalize_text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, _PUNCT_PATTERN, "")
    c = F.regexp_replace(c, _ARTICLE_PATTERN, " ")
    c = F.regexp_replace(c, _WS_PATTERN, " ")
    return F.trim(c)


def normalize_question(col: Column | str) -> Column:
    """Append '?' if missing; lowercase the first character."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.when(c.endswith("?"), c).otherwise(F.concat(c, F.lit("?")))
    return F.concat(F.lower(c.substr(F.lit(1), F.lit(1))), c.substr(F.lit(2), F.length(c) - 1))


def norm_tokens(col: Column | str) -> Column:
    """``normalize_answer(x).split()`` as a column (test_proactive.py:
    111-112 — the reference tokenizes the NORMALIZED answer for every
    F1/accuracy computation). normalize_text trims and collapses
    whitespace, so splitting on single spaces yields clean tokens; an
    empty normalization yields ZERO tokens (the reference's no-answer),
    not ['']. Non-HOF: a when() on the normalized length, codegen-safe."""
    c = F.col(col) if isinstance(col, str) else col
    n = normalize_text(c)
    return F.when(F.length(n) == 0, F.array().cast("array<string>")).otherwise(
        F.split(n, " ")
    )


def exact_match(pred: Column, gold: Column) -> Column:
    return (normalize_text(pred) == normalize_text(gold)).cast("int")


def substring_match(pred: Column, gold: Column) -> Column:
    return F.contains(normalize_text(pred), normalize_text(gold)).cast("int")


def any_answer_contained(text: Column, answers: Column) -> Column:
    """1 iff any normalized answer appears in the normalized text."""
    norm_text = normalize_text(text)
    return F.exists(answers, lambda a: F.contains(norm_text, normalize_text(a))).cast("int")


def first_line(col: Column | str) -> Column:
    """lstrip('\\n') then first line — Spark's ltrim strips only spaces, so
    leading newlines are removed explicitly (ref lstrip('\\n'))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.regexp_replace(c, "^\n+", ""), "\n").getItem(0)


def words(col: Column | str) -> Column:
    """Whitespace word tokens of a document (the engine's base text unit)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")
