"""Skew-mitigated equi-join via key salting.

When one join key carries a disproportionate share of rows (the ERCOT
case: 4 load zones, or a boilerplate shingle shared by half a corpus),
a shuffle join sends that key's entire population to one task. AQE's
skew-join splitting handles the sort-merge case automatically; salting
is the explicit, planner-independent fix and the only one that also
works for aggregation keys.

Mechanics: the skewed (large) side gets a uniform random salt in
[0, n_salts); the small side is replicated n_salts times with every
salt value; the join key becomes (key, salt) so the hot key fans out
across n_salts tasks. Replication multiplies the small side — use for
dimension-sized right sides (same memory envelope as a broadcast, but
shuffle-joinable when broadcast is too big).

Results are identical to the plain join: salting only refines the
partitioning, never the match predicate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⨝ small`` on ``on`` with the large side salted
    and the small side replicated ``n_salts``×. Output columns follow
    Spark's usual join-on-names contract (join keys appear once)."""
    on = list(on)
    if how.replace("_", "") not in (
        "inner",
        "left",
        "leftouter",
        "leftsemi",
        "leftanti",
        "semi",
        "anti",
    ):
        # right/full outer would emit each unmatched replicated small-side
        # row n_salts times; large-side-preserving joins are exact.
        raise ValueError(f"salted_join supports inner/left-side joins, not {how!r}")
    salted_large = large.withColumn(
        _SALT, (F.rand(seed=42) * n_salts).cast("int")
    )
    replicated_small = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_large.join(replicated_small, [*on, _SALT], how).drop(_SALT)
