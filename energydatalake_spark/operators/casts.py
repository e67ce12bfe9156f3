"""Typed projections / casts (SURVEY.md §2.2 P2-P5, P7-P8).

The reference reads CSV all-string and imposes types after the fact:
``to_timestamp`` (bare and with the offset pattern ``yyyy-MM-dd HH:mm:ssXXX``,
``PySpark Scripts/test_pyspark_merge_spp_weather.py:49-51``),
``DecimalType(10,2)`` for MW measures
(``...merge_fm_load...py:96-99``), ``float`` for weather/price
(``test_pyspark_merge_spp_weather.py:64-71``). All casts stay inside
whole-stage codegen — no UDFs.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType


def cast_timestamps(
    df: DataFrame, cols: Iterable[str], fmt: str | None = None
) -> DataFrame:
    """P3. ``fmt=None`` matches the reference's bare ``to_timestamp``;
    pass ``"yyyy-MM-dd HH:mm:ssXXX"`` for the offset-aware SPP feed.

    ``try_to_timestamp``, not ``to_timestamp``: under ANSI mode (Spark 4
    default) the latter throws on malformed input, while the reference's
    pipelines rely on unparseable→null→dropped (P3+F1 interaction)."""
    exprs = {
        c: (
            F.try_to_timestamp(F.col(c), F.lit(fmt))
            if fmt
            else F.try_to_timestamp(F.col(c))
        )
        for c in cols
    }
    return df.withColumns(exprs)


def cast_decimal(
    df: DataFrame, cols: Iterable[str], precision: int = 10, scale: int = 2
) -> DataFrame:
    """P4. decimal(10,2) exactly, per README.md:115 of the reference."""
    typ = DecimalType(precision, scale)
    return df.withColumns({c: F.col(c).cast(typ) for c in cols})


def cast_float(df: DataFrame, cols: Iterable[str]) -> DataFrame:
    """P5."""
    return df.withColumns({c: F.col(c).cast("float") for c in cols})


def to_local_time(df: DataFrame, col: str, tz: str = "America/Chicago") -> DataFrame:
    """P7: UTC instant → local wall time (reference does this ingest-side,
    ``Cloud Functions/open_weather_live_data.py:66``)."""
    return df.withColumn(col, F.from_utc_timestamp(F.col(col), tz))
