"""Cross-engine-portable numeric primitives shared by every oracled
query (see plans/registry.py module docstring for the full
determinism contract). Leaf module: importable from text/ and
similarity/ operators without touching plans/ (which imports them)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_round(col: Column, n: int) -> Column:
    """``floor(x·10ⁿ + 0.5) / 10ⁿ`` — the one rounding form whose
    result is bit-identical in Spark and DuckDB (both sides compute
    the identical IEEE multiply/floor/divide sequence; ``round()``
    differs between engines on .5 ties and negative inputs)."""
    p = float(10**n)
    return F.floor(col * F.lit(p) + F.lit(0.5)) / F.lit(p)
