"""Text-analysis operators for LLM-data pipelines (BASELINE.json
north-star extension; not present in the reference, which is pure
energy telemetry).

All expressions are JVM-side built-ins (split/transform/filter/
aggregate) — no Python UDFs — so they whole-stage-codegen and scale
linearly with no shuffle (per-row ops) or one map-side-combined
shuffle (the grouped ones).

Cross-engine notes: token counts and ratios are integer arithmetic +
one division (bit-identical in DuckDB); fingerprints use md5, which is
identical everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# Deterministic and small on purpose: the operator contract is "score
# languages by stopword hit-rate, argmax with lexicographic tie-break".
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "fr": ("le", "la", "de", "et", "est"),
    "es": ("el", "la", "de", "y", "es"),
    "de": ("der", "die", "das", "und", "ist"),
}


def tokens(text_col: str | Column) -> Column:
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(col, " ")


def text_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document stats: char/token counts, average token length,
    unique-token ratio, punctuation ratio, English-stopword ratio, and
    a composite quality score in [0,1]. ``keep_cols`` passes grouping
    metadata (source, lang, …) through so downstream rollups don't
    need a doc_id re-join back onto the input."""
    toks = tokens(text_col)
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^a-z0-9 ]", ""))
    stop_list = STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*stop_list)))
    uniq_ratio = n_uniq.cast("double") / n_tokens
    # n_chars = 0 (empty text) guard: ANSI-mode Spark RAISES on 0/0
    # and DuckDB yields NaN — both wrong; an empty doc has no defined
    # punctuation ratio (and hence no quality score), so both are NULL
    # in both engines. n_tokens needs no guard (split('') → ['']).
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars)
    stop_ratio = n_stop.cast("double") / n_tokens
    # Composite quality: long enough, low punctuation noise, diverse
    # vocabulary, some stopword mass (fluent text has function words).
    quality = (
        F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.25
        + (1 - punct_ratio) * 0.25
        + uniq_ratio * 0.25
        + F.least(stop_ratio * F.lit(10.0), F.lit(1.0)) * 0.25
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        n_chars.cast("bigint").alias("n_chars"),
        n_tokens.cast("bigint").alias("n_tokens"),
        n_uniq.cast("bigint").alias("n_uniq_tokens"),
        n_stop.cast("bigint").alias("n_stopwords"),
        uniq_ratio.alias("uniq_ratio"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit-rate language ID. Emits per-language hit counts and
    the argmax prediction ('und' when nothing hits); ties break by
    lexicographic language code, deterministically in both engines."""
    toks = tokens(text_col)

    def hit_filter(words):
        # Closure, not a default arg: PySpark derives lambda arity from
        # the signature, so an extra defaulted param breaks it.
        return lambda t: t.isin(*words)

    hits = {
        lang: F.size(F.filter(toks, hit_filter(words)))
        for lang, words in STOPWORDS.items()
    }
    best = F.greatest(*hits.values())
    pred = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        pred = F.when(hits[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best <= 0, F.lit("und")).otherwise(pred)
    out = [F.col(id_col)]
    out += [hits[lang].cast("bigint").alias(f"hits_{lang}") for lang in sorted(STOPWORDS)]
    out.append(pred.alias("pred_lang"))
    return df.select(*out)


# BPE-ish lexer: letter runs, digit runs, single punctuation marks —
# the pre-tokenization regex shape GPT-2-family BPEs apply before
# merges. RE2 (DuckDB) and Java regex (Spark) agree on this subset.
BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"
SUBWORD_CHUNK = 4  # crude merge-table stand-in: ≤4-char subword pieces


def token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token counting two ways (whitespace + BPE-ish regex) plus a
    subword estimate (ceil(len/4) pieces per regex token — a
    deterministic proxy for a merge-table BPE's token count). All
    JVM-side built-ins: regexp_extract_all / transform / aggregate."""
    ws = F.split(F.col(text_col), " ")
    re_toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 0)
    n_subword = F.aggregate(
        F.transform(re_toks, lambda t: F.ceil(F.length(t) / F.lit(float(SUBWORD_CHUNK)))),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return df.select(
        F.col(id_col),
        F.size(ws).cast("bigint").alias("n_ws_tokens"),
        F.size(re_toks).cast("bigint").alias("n_re_tokens"),
        F.size(F.array_distinct(re_toks)).cast("bigint").alias("n_uniq_re_tokens"),
        n_subword.cast("bigint").alias("n_subword_est"),
    )


def _hex8_to_long(col: Column) -> Column:
    """First 8 hex chars of an md5 → bigint — the engine-portable hash
    primitive (DuckDB: ``('0x'||substr(md5(x),1,8))::BIGINT``)."""
    return F.conv(F.substring(col, 1, 8), 16, 10).cast("bigint")


def _hex15_to_long(col: Column) -> Column:
    """First 15 hex chars of an md5 → 60-bit bigint (DuckDB:
    ``('0x'||substr(md5(x),1,15))::BIGINT``). Wide enough that joining
    on the hash instead of the string is collision-free in practice
    (n²/2⁶¹ — ~1e-11 at a billion keys) while shuffling 8-byte longs
    instead of arbitrary-length strings."""
    return F.conv(F.substring(col, 1, 15), 16, 10).cast("bigint")


def shingles(text_col: str, n: int) -> Column:
    """Distinct word n-gram shingles of the named column. Documents
    shorter than n words yield an empty array (callers filter).

    The token array is bound ONCE per row by transforming over a
    singleton array — higher-order-function lambdas are interpreted
    per element with no cross-lambda subexpression elimination, so
    inlining ``split(text)`` into the inner lambda would re-split the
    document for EVERY shingle (O(tokens²) splits per doc; measured
    3.7 s → 0.9 s for the sf0.1 shingle explode when bound)."""
    # CASE guard: Spark's sequence(1, 0) yields a DESCENDING [1, 0],
    # so short docs must short-circuit to an empty array instead.
    return F.expr(
        f"element_at(transform(array(split({text_col}, ' ')), tk -> "
        f"CASE WHEN size(tk) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size(tk) - {n} + 1),"
        f" i -> concat_ws(' ', slice(tk, i, {n})))) "
        f"ELSE array() END), 1)"
    )


def fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 5
) -> DataFrame:
    """Document fingerprints: full-text md5 plus a winnowing-style
    min-shingle-hash (the minimum portable hash over word n-gram
    shingles — robust to local edits, the 1-permutation MinHash)."""
    sh = shingles(text_col, n)
    min_shingle = F.array_min(
        F.transform(sh, lambda s: _hex8_to_long(F.md5(s)))
    )
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("md5_fp"),
        min_shingle.cast("bigint").alias("min_shingle_fp"),
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
) -> DataFrame:
    """Per-document repetition profile — the Gopher-class repetition
    quality signals (duplicate-word fraction, most-frequent-word
    fraction, duplicate n-gram fraction) used to drop boilerplate and
    degenerate generations from LLM corpora.

    Everything is a map-side higher-order-function fold over the token
    array (split / array_sort / aggregate / transform) — per-row
    codegen, zero shuffle, linear at any corpus size. The
    most-frequent-word count is the longest run in the SORTED token
    array, computed with one ``aggregate`` fold instead of an
    explode + double-group (which would shuffle every token)."""
    toks = tokens(text_col)
    nt = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    run_state = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    top = run_state["best"]
    # Token array bound once per row (see shingles() — HOF lambdas have
    # no cross-lambda subexpression elimination, so an inlined split
    # would re-split the doc for every n-gram).
    grams = F.expr(
        f"element_at(transform(array(split({text_col}, ' ')), tk -> "
        f"CASE WHEN size(tk) >= {ngram} THEN "
        f"transform(sequence(1, size(tk) - {ngram} + 1),"
        f" i -> concat_ws(' ', slice(tk, i, {ngram}))) "
        f"ELSE array() END), 1)"
    )
    ng = F.size(grams)
    ngd = F.size(F.array_distinct(grams))
    # Two-stage projection: each fold/array expression is evaluated
    # ONCE per row in the first select (referencing `top` in both the
    # count and the fraction would otherwise run the whole sort+fold
    # twice — measured 2x the query cost at sf0.1).
    counts = df.select(
        F.col(id_col),
        nt.cast("bigint").alias("n_words"),
        nd.cast("bigint").alias("n_distinct_words"),
        top.cast("bigint").alias("top_word_count"),
        ng.cast("bigint").alias("__ng"),
        ngd.cast("bigint").alias("__ngd"),
    )
    return counts.select(
        F.col(id_col),
        "n_words",
        "n_distinct_words",
        "top_word_count",
        # Divisions of identical integers — bit-exact cross-engine.
        (
            (F.col("n_words") - F.col("n_distinct_words")) / F.col("n_words")
        ).alias("dup_word_frac"),
        (F.col("top_word_count") / F.col("n_words")).alias("top_word_frac"),
        F.when(
            F.col("__ng") > 0,
            (F.col("__ng") - F.col("__ngd")) / F.col("__ng"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_ngram_frac"),
    )
