"""Cross-engine-portable numeric primitives shared by every oracled
query (see plans/registry.py module docstring for the full
determinism contract). Leaf module: importable from text/ and
similarity/ operators without touching plans/ (which imports them)."""

from __future__ import annotations

import weakref

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_round(col: Column, n: int) -> Column:
    """``floor(x·10ⁿ + 0.5) / 10ⁿ`` — the one rounding form whose
    result is bit-identical in Spark and DuckDB (both sides compute
    the identical IEEE multiply/floor/divide sequence; ``round()``
    differs between engines on .5 ties and negative inputs)."""
    p = float(10**n)
    return F.floor(col * F.lit(p) + F.lit(0.5)) / F.lit(p)


#: Parsed-expression cache for the rendered SQL families (codebook
#: literals, MinHash signature chains, sign-LSH folds). The texts are
#: deterministic in their parameters, so repeat builds — every k-means
#: iteration, every consumer of the same (k, bands, rows) geometry —
#: re-parse byte-identical strings; Catalyst charges ~0.2 s per large
#: literal parse plus one py4j round trip per F.expr call. ``Column``
#: is an immutable wrapper over an unresolved expression tree, so one
#: parsed object is safely shared by any number of plans.
_EXPR_CACHE: dict[str, Column] = {}
#: Lifecycle guard: cached java objects die with their JVM. A weakref
#: to the owning SparkContext *Python object* detects session turnover
#: without paying a py4j call per lookup — a restarted context is a
#: new Python object by construction, so identity mismatch ⇒ clear.
_EXPR_CACHE_SC: list[weakref.ref | None] = [None]
#: Texts are parameter-bounded (a few dozen distinct strings per
#: session); the cap only guards a pathological caller looping over
#: unbounded distinct texts.
_EXPR_CACHE_MAX = 512


def cached_expr(sql: str) -> Column:
    """``F.expr(sql)`` with a per-SparkContext parse cache — same
    Column object back for a byte-identical text within one session
    (VERDICT r19 backlog: the rendered-literal re-parse cost, ~0.2 s
    per kmeans iteration per consumer, is pure driver latency)."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    if sc is None:
        return F.expr(sql)
    ref = _EXPR_CACHE_SC[0]
    if ref is None or ref() is not sc:
        _EXPR_CACHE.clear()
        _EXPR_CACHE_SC[0] = weakref.ref(sc)
    col = _EXPR_CACHE.get(sql)
    if col is None:
        if len(_EXPR_CACHE) >= _EXPR_CACHE_MAX:
            _EXPR_CACHE.clear()
        col = F.expr(sql)
        _EXPR_CACHE[sql] = col
    return col
