"""Set operations (SURVEY.md §2.7 Set1).

The reference folds per-file DataFrames with ``union`` on the driver
(``PySpark Scripts/mergeHistoricalWeather.py:42-44``). Here multi-way
union is by NAME (positional union silently mis-aligns on column-order
drift) and the preferred path is not calling this at all — a directory
scan parallelizes over files natively.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_all(*dfs: DataFrame, allow_missing: bool = False) -> DataFrame:
    if not dfs:
        raise ValueError("union_all needs at least one DataFrame")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), dfs
    )
