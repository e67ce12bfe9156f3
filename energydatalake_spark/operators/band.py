"""Interval / band join (point-in-interval) — SURVEY.md §2.4 J2.

The reference aligns quarter-hour weather observations onto 15-minute
price intervals with an inner join on zone plus a BETWEEN predicate
(``PySpark Scripts/test_pyspark_merge_spp_weather.py:54-59``). Expressed
declaratively, Catalyst plans the equi-key as the join key (sort-merge
or broadcast-hash) and evaluates the band as a post-join filter.

Scale notes (100 TB): with a LOW-cardinality equi key (the reference
has 4 zones) a plain SMJ degenerates — every executor sees a quarter of
all data. ``band_join`` therefore supports coarse time bucketing: both
sides gain a derived bucket column (interval-start truncated to
``bucket``), intervals spanning a boundary are exploded into each
bucket they overlap (via ``sequence``), and the bucket joins the equi
key. That turns a 4-way shuffle into a (4 × #buckets)-way shuffle with
no false negatives; the BETWEEN filter removes false positives. With a
high-cardinality key, pass ``bucket=None`` — the equi key alone
distributes fine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = "__band_bucket"


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    on: Sequence[str] | None = None,
    how: str = "inner",
    bucket: str | None = None,
    broadcast_right: bool = False,
) -> DataFrame:
    """Join left rows to right intervals containing them:
    ``left.left_ts BETWEEN right.right_start AND right.right_end``
    (inclusive both ends, matching the reference), plus optional equi
    keys ``on``. ``bucket`` is a time-truncation unit (``'hour'``,
    ``'day'``, ...) used as an extra shuffle key as described above.
    """
    on = list(on or [])
    dup = set(left.columns) & set(right.columns) - set(on)
    if dup:
        raise ValueError(f"ambiguous columns (rename before join): {sorted(dup)}")
    if bucket is not None and how.replace("_", "") not in ("inner", "left", "leftouter"):
        # The right side is exploded per overlapped bucket; an unmatched
        # right interval would surface once PER BUCKET under right/full
        # outer semantics. Left rows are never exploded, so inner/left
        # are exact.
        raise ValueError(f"bucket mode supports inner/left joins, not {how!r}")

    l, r = left, right
    join_keys = list(on)
    if bucket is not None:
        l = l.withColumn(_B, F.date_trunc(bucket, F.col(left_ts)))
        # Explode each interval into every bucket it overlaps.
        r = r.withColumn(
            _B,
            F.explode(
                F.sequence(
                    F.date_trunc(bucket, F.col(right_start)),
                    F.date_trunc(bucket, F.col(right_end)),
                    F.expr(f"INTERVAL 1 {bucket}"),
                )
            ),
        )
        join_keys = join_keys + [_B]

    band = F.col(left_ts).between(F.col(right_start), F.col(right_end))
    if join_keys:
        cond = band
        for k in join_keys:
            cond = (l[k] == r[k]) & cond
        rhs = F.broadcast(r) if broadcast_right else r
        out = l.join(rhs, cond, how)
        # Drop the right side's copy of the equi keys / bucket.
        out = out.drop(*[r[k] for k in join_keys])
    else:
        rhs = F.broadcast(r) if broadcast_right else r
        out = l.join(rhs, band, how)
    return out.drop(_B)
