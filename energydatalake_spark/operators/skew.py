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

Decision rule — AQE skew-join vs explicit salt (measured, local[8],
4M fact rows with 95% on one key ⨝ 50k dim, broadcast disabled):

======================================  ======
plain join, AQE defaults (256MB thr.)   1.75 s
plain join, AQE skew thresholds tuned   0.65 s
salted_join(n_salts=8), AQE defaults    0.95 s
salted_join(n_salts=8), AQE tuned       0.69 s
======================================  ======

1. **Prefer AQE's runtime split when it can engage**: sort-merge /
   shuffled-hash join with ``spark.sql.adaptive.skewJoin.enabled``
   AND the hot partition actually exceeding
   ``skewedPartitionThresholdInBytes`` (default 256MB) and
   ``skewedPartitionFactor``× the median. When those fire, the plain
   join is fastest and needs no code change (0.65 s above; the
   physical plan shows ``skew=true`` on the SMJ side).
2. **Salt when AQE cannot engage**: (a) hot partitions sit under the
   byte threshold yet still serialize on one task — the measured
   default-conf case, where salting is 1.8× faster (0.95 vs
   1.75 s); (b) the skew is on an *aggregation* key (AQE skew
   handling covers joins only — salt + two-phase agg is the fix);
   (c) the skewed shuffle's partitioning is reused downstream, which
   makes AQE skip the split to preserve co-partitioning.
3. Salting on top of an engaged AQE split buys nothing (0.69 vs
   0.65 s) — don't stack them.
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
