"""Top-K per group (SURVEY.md §2.6 O3 generalized).

The reference's top-of-list queries are global ORDER BY DESC
(README.md:288-300); the per-group form is the standard OLAP
generalization: rank within a window and keep ``rn <= k``. Spark plans
this as a single shuffle on the partition keys with a partial top-k
(``WindowGroupLimit`` pushes the limit into the sort since 3.5) — no
global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
    rank_alias: str = "rn",
) -> DataFrame:
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn(rank_alias, F.row_number().over(w))
        .filter(F.col(rank_alias) <= k)
    )
