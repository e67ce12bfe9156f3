"""Aggregation operators (SURVEY.md §2.5 A1-A7).

The reference's four analytics queries (BigQuery SQL, ``Queries/*.sql``
+ README.md:216-300) re-expressed as DataFrame builders. All are
hash-aggregates with map-side partial aggregation — one shuffle of
(group-key, partial-state), never of raw rows, so they scale linearly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def avg_by_month(
    df: DataFrame, ts_col: str, value_col: str, alias: str = "avg_value"
) -> DataFrame:
    """A4 — ``Queries/Average Energy Consumption by Month.sql:3-11``:
    AVG(value) grouped by EXTRACT(MONTH FROM ts), ordered by month."""
    return (
        df.groupBy(F.month(ts_col).alias("month"))
        .agg(F.avg(value_col).alias(alias))
        .orderBy("month")
    )


def avg_by_hour(
    df: DataFrame, ts_col: str, value_col: str, alias: str = "avg_value"
) -> DataFrame:
    """A5 — ``Queries/How does energy consumption vary by time of day_.sql:1-9``."""
    return (
        df.groupBy(F.hour(ts_col).alias("hour"))
        .agg(F.avg(value_col).alias(alias))
        .orderBy("hour")
    )


def mix_percentage(df: DataFrame, source_cols: Sequence[str]) -> DataFrame:
    """A6 — ``Queries/Percentage Distribution of Each Energy.sql:5-15``:
    one-row result, ``ROUND(SUM(x) / SUM(x1+...+xn) * 100, 2)`` per
    source. Denominator is the SUM of the row-level n-way sum, exactly
    as the reference writes it (equivalent to the sum of sums only when
    no source is null — preserved as-is)."""
    total = sum((F.col(c) for c in source_cols[1:]), F.col(source_cols[0]))
    return df.agg(
        *[
            F.round(F.sum(F.col(c)) / F.sum(total) * 100, 2).alias(f"{c}_percent")
            for c in source_cols
        ]
    )


def multikey_avg_desc(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    alias: str = "average_price",
) -> DataFrame:
    """A7 — README.md:288-300: AVG rounded to 2dp over composite keys,
    ordered by the aggregate descending."""
    return (
        df.groupBy(*group_cols)
        .agg(F.round(F.avg(value_col), 2).alias(alias))
        .orderBy(F.desc(alias))
    )
