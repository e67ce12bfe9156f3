"""Cleaning / data-quality operators (SURVEY.md §2.3 F1-F2, §2.5 A2).

- ``drop_nulls``: the reference drops any-null rows in every pipeline
  (``...load_latest_BQ_archive_csv.py:69`` etc.).
- ``dedup``: full-row ``dropDuplicates`` (``...merge...py:106``); at
  scale prefer the keyed form — full-row dedup shuffles every byte of
  every column, keyed dedup shuffles only the keys' hash.
- ``null_profile``: the per-column null-count single-row aggregate the
  reference logs for monitoring (``...merge...py:86-87``, README.md:118).
  One pass, one row out — safe at any scale.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_nulls(df: DataFrame, subset: Iterable[str] | None = None) -> DataFrame:
    """F1: drop rows containing any null (optionally in ``subset``)."""
    return df.na.drop(subset=list(subset) if subset is not None else None)


def dedup(df: DataFrame, keys: Iterable[str] | None = None) -> DataFrame:
    """F2: duplicate elimination. ``keys=None`` = full-row distinct
    (reference semantics); with keys, keeps an arbitrary row per key
    (Spark's dropDuplicates contract)."""
    return df.dropDuplicates(list(keys)) if keys is not None else df.dropDuplicates()


def dedup_latest(
    df: DataFrame,
    keys: Iterable[str],
    order_col: str,
    tiebreak: Iterable[str] = (),
) -> DataFrame:
    """Keyed dedup keeping the LATEST row per key by ``order_col`` (the
    CDC / re-ingested-feed shape: the reference's at-least-once archive
    loop can append the same interval twice; this keeps one
    deterministic winner). ``tiebreak`` columns break order ties
    ascending — with them, fully deterministic.

    One shuffle on the keys; ``row_number`` is planned as a
    WindowGroupLimit (per-partition top-1, no global sort)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), *[F.col(c).asc() for c in tiebreak]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def null_profile(df: DataFrame) -> DataFrame:
    """A2: single-row DataFrame of per-column null counts.

    Uses one aggregate pass (the reference re-scans the source for it;
    here callers can ``df.cache()`` or fold it into ``observe()``)."""
    return df.select(
        [F.sum(F.col(c).isNull().cast("int")).alias(c) for c in df.columns]
    )


def validate_rows(
    df: DataFrame,
    rules: dict[str, "str | F.Column"],
    out_col: str = "failed_rules",
) -> DataFrame:
    """Row-level expectations (the DLT ``EXPECT`` shape, on plain
    DataFrames): each rule is a boolean expression that must hold;
    ``out_col`` lists the names of the rules a row FAILS (empty array
    = valid row). A rule evaluating to NULL counts as failed — an
    expectation that cannot be decided has not held, the same
    null-is-not-a-pass rule the CDC op validator applies.

    Pure per-row expressions (one projection, no shuffle, codegen'd);
    compose with sinks via :func:`split_valid`."""
    checks = [
        F.when(
            ~F.coalesce(
                F.expr(rule) if isinstance(rule, str) else rule, F.lit(False)
            ),
            F.lit(name),
        )
        for name, rule in rules.items()
    ]
    return df.withColumn(out_col, F.array_compact(F.array(*checks)))


def split_valid(
    df: DataFrame,
    rules: dict[str, "str | F.Column"],
) -> tuple[DataFrame, DataFrame]:
    """Expectation gate: ``(good, quarantine)`` — good rows drop the
    audit column, quarantined rows keep ``failed_rules`` for the
    dead-letter sink (the jsonl corrupt-line quarantine's row-level
    sibling). The input plan is shared; at scale write both sides from
    one pass (``persist`` or foreachBatch) rather than triggering the
    lineage twice."""
    flagged = validate_rows(df, rules)
    good = flagged.filter(F.size("failed_rules") == 0).drop("failed_rules")
    bad = flagged.filter(F.size("failed_rules") > 0)
    return good, bad
