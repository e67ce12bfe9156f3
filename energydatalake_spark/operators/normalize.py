"""Column-name normalization (SURVEY.md §2.2 P1).

The reference lowercases and underscores every CSV header, either via a
select-of-aliases (``PySpark Scripts/ercot_pyspark_load_historical_BQ_archive_csv.py:39``)
or pandas rename on the driver (``...merge_fm_load...py:63-64``). This is
pure metadata — ``toDF`` rewrites the plan's output names with no
projection node and no data movement.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def normalize_name(name: str) -> str:
    """``'Interval Start' -> 'interval_start'``; also collapses repeats."""
    return re.sub(r"_+", "_", name.strip().replace(" ", "_")).lower()


def normalize_columns(df: DataFrame) -> DataFrame:
    return df.toDF(*[normalize_name(c) for c in df.columns])
