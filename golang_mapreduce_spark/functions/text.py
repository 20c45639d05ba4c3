"""Tokenization expressions (all JVM-side, whole-stage-codegen friendly).

The reference's word-count tokenizer splits on any non-letter rune
(``unicode.IsLetter`` via FieldsFunc, 6.5840/src/mrapps/wc.go:19-31).
:data:`LETTER_SPLIT_RE` mirrors that with the Unicode letter class
``\\p{L}``, which has identical semantics in Spark's Java regex engine and
DuckDB's RE2 — pinned in one place so the engine and the SQL oracles can
never drift (SURVEY.md §7 "hard parts" #1).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Split pattern: one-or-more non-letter code points. Both engines keep
#: leading/trailing empty strings, which callers must filter out.
LETTER_SPLIT_RE = r"[^\p{L}]+"


def letter_words(col: Column | str) -> Column:
    """Array of letter-run words, empty strings removed — exact analog of
    the reference map UDF's FieldsFunc(unicode.IsLetter) (wc.go:21-28)."""
    return F.filter(
        F.split(col, LETTER_SPLIT_RE), lambda w: w != F.lit("")
    )


def ws_words(col: Column | str) -> Column:
    """Whitespace tokens (empty strings removed) — the tokenizer used by
    the python map_reduce facade and the text-statistics operators."""
    return F.filter(F.split(col, r"\s+"), lambda w: w != F.lit(""))
