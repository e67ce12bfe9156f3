"""Text normalization + PII masking: the cleanup pass a corpus runs
before dedup/tokenization (siblings of text/stats.py, text/dedup.py).

Pure per-row ``regexp_replace`` chains — whole-stage codegen, no
shuffle, linear scan. Every pattern is shared with the DuckDB oracle,
so the regex dialect is restricted to the Java∩RE2 subset (explicit
character classes, no lookaround, no \\p{...} unicode properties).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (pattern, replacement) applied in order; order matters (mask PII
#: before whitespace collapse so replaced tokens keep spacing).
NORMALIZE_STEPS: list[tuple[str, str]] = [
    (r"[\x00-\x08\x0b\x0c\x0e-\x1f]", " "),  # control chars (keep \t \n \r)
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^ \t\n\r]+", "<URL>"),
    # Long digit runs (phones, ids). The middle class MUST cover every
    # whitespace char the collapse step below folds into ' ': with bare
    # ' ' only, "0000000\n0" failed to mask on pass 1, collapsed to
    # "0000000 0", then masked on pass 2 — not idempotent (r3/r4
    # hypothesis counterexample).
    (r"[0-9][0-9 \t\n\r.-]{7,}[0-9]", "<NUM>"),

    (r"[ \t\n\r]+", " "),  # whitespace collapse
]


def _normalize_expr(col: Column, lowercase: bool) -> Column:
    out = col
    for pat, rep in NORMALIZE_STEPS:
        out = F.regexp_replace(out, pat, rep)
    out = F.trim(out)
    return F.lower(out) if lowercase else out


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_norm",
    lowercase: bool = True,
) -> DataFrame:
    """Append ``out_col``: control chars stripped, emails/URLs/long
    digit runs masked to stable placeholders, whitespace collapsed,
    trimmed, optionally lowercased."""
    return df.withColumn(out_col, _normalize_expr(F.col(text_col), lowercase))


def sql_normalize_expr(col_expr: str, lowercase: bool = True) -> str:
    """The DuckDB twin of ``_normalize_expr`` over ``col_expr`` —
    generated from the same NORMALIZE_STEPS list so the engines cannot
    drift."""
    out = col_expr
    for pat, rep in NORMALIZE_STEPS:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    out = f"trim({out})"
    return f"lower({out})" if lowercase else out
