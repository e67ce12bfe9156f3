"""Interval / band join (point-in-interval) — SURVEY.md §2.4 J2.

The reference aligns quarter-hour weather observations onto 15-minute
price intervals with an inner join on zone plus a BETWEEN predicate
(``PySpark Scripts/test_pyspark_merge_spp_weather.py:54-59``). Expressed
declaratively, Catalyst plans the equi-key as the join key (sort-merge
or broadcast-hash) and evaluates the band as a post-join filter.

Scale notes (100 TB): with a LOW-cardinality equi key (the reference
has 4 zones) a plain SMJ degenerates — every executor sees a quarter of
all data (measured 143× the bucketed cost at x100, r18 join probe).
``band_join`` therefore supports coarse time bucketing: both sides
gain a derived bucket column (interval-start truncated to ``bucket``),
intervals spanning a boundary are exploded into each bucket they
overlap (via ``sequence``), and the bucket joins the equi key. That
turns a 4-way shuffle into a (4 × #buckets)-way shuffle with no false
negatives; the BETWEEN filter removes false positives. With a
high-cardinality key the equi key alone distributes fine.

Since r19 the tier choice is AUTOMATIC (VERDICT r18 #2): the default
``bucket="auto"`` probes the right side once (key cardinality +
interval-width stats, one column-pruned aggregate) and picks both the
tier and the truncation unit — see ``_auto_bucket_unit``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from energydatalake_spark.operators.dispatch import (
    BAND_AUTO_CONF,
    auto_key_threshold,
    axis_double,
    key_tuple,
)

_B = "__band_bucket"

#: date_trunc units the auto tier chooses from, with their nominal
#: widths in seconds (month/year nominal — the ladder only sizes
#: buckets, correctness never depends on it).
_UNIT_LADDER: tuple[tuple[str, float], ...] = (
    ("minute", 60.0),
    ("hour", 3600.0),
    ("day", 86400.0),
    ("week", 604800.0),
    ("month", 2592000.0),
    ("year", 31536000.0),
)

#: Ceiling on the per-interval explosion factor the auto tier will
#: accept: an outlier interval ``max_width`` wide explodes into
#: ``max_width / unit + 1`` bucket rows, so the ladder is walked up
#: until that bound fits. 1024 rows per interval is noise next to the
#: data-sized left side; typical intervals (width ≈ avg) land in 1-2.
_MAX_EXPLODE = 1024


def _pick_unit(avg_width_s: float, max_width_s: float) -> str | None:
    """Smallest ladder unit ≥ the typical interval width (so a typical
    interval overlaps ≤2 buckets), walked up until the worst-case
    explosion (``max_width / unit + 1``) fits ``_MAX_EXPLODE``. None
    when even the top rung cannot honor the bound (r19 review: a
    far-future sentinel end date — max_width millennia wide — must
    make auto DECLINE to bucket, not silently explode each sentinel
    interval into thousands of rows). Pure arithmetic — unit-tested
    directly."""
    idx = 0
    while idx < len(_UNIT_LADDER) - 1 and _UNIT_LADDER[idx][1] < avg_width_s:
        idx += 1
    while (
        idx < len(_UNIT_LADDER) - 1
        and max_width_s / _UNIT_LADDER[idx][1] + 1 > _MAX_EXPLODE
    ):
        idx += 1
    if max_width_s / _UNIT_LADDER[idx][1] + 1 > _MAX_EXPLODE:
        return None
    return _UNIT_LADDER[idx][0]


def _auto_bucket_unit(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    on: Sequence[str],
    how: str,
    broadcast_right: bool,
) -> str | None:
    """Resolve ``bucket="auto"`` to a truncation unit or None.

    Buckets only when they can help and are legal: an inner/left join
    (bucket mode's exactness contract) on a time axis, equi keys
    present, batch inputs (a probe aggregate is illegal on an
    unstarted stream). A model-sized key-cardinality probe of the
    right side runs first; at or above the threshold
    (``spark.graft.band.autoBucketMaxKeys``, default
    ``spark.sql.shuffle.partitions``) the equi key alone distributes
    fine and the answer is None — the common high-cardinality default
    path pays exactly ONE probe job. Below it, two more model-result
    probes size the unit: the left side's time span (column-pruned
    min/max — only reached in the regime where bucketing wins), then
    the right side's interval widths CLAMPED to that span (r19 review
    pass 2: an open-ended sentinel row — end 9999-12-31 — must not
    skew the stats; only the overlap with where left rows actually
    exist matters, which also excludes inverted and non-overlapping
    rows the explode drops anyway). ``_pick_unit`` then derives the
    unit — for the reference's shape (4 zones, 15-min intervals)
    exactly the ``"hour"`` the pipeline used to hard-code. The probe
    is a pure performance decision: bucketing never changes results
    (explosion covers every overlapped bucket; the BETWEEN filter
    removes false positives)."""
    if how.replace("_", "") not in ("inner", "left", "leftouter"):
        return None
    if not on or broadcast_right or left.isStreaming or right.isStreaming:
        # No equi keys → the plain plan is already a (broadcastable)
        # range join; broadcast_right → no shuffle to balance, bucket
        # explosion would be pure overhead; streams can't be probed.
        return None
    time_types = (T.DateType, T.TimestampType, T.TimestampNTZType)
    if not all(
        isinstance(df.schema[c].dataType, time_types)
        for df, c in ((left, left_ts), (right, right_start), (right, right_end))
    ):
        return None
    threshold = auto_key_threshold(right.sparkSession, BAND_AUTO_CONF)
    if threshold <= 0:
        return None
    n_keys = right.agg(
        F.approx_count_distinct(key_tuple(on)).alias("n")
    ).first()["n"]
    if n_keys is None or int(n_keys) >= threshold:
        return None
    ax_l = axis_double(left, F.col(left_ts), left_ts)
    span = left.agg(F.min(ax_l).alias("lo"), F.max(ax_l).alias("hi")).first()
    if span["lo"] is None:
        return None  # empty left — nothing can match anyway
    lo, hi = float(span["lo"]), float(span["hi"])
    s = axis_double(right, F.col(right_start), right_start)
    e = axis_double(right, F.col(right_end), right_end)
    eff = F.least(e, F.lit(hi)) - F.greatest(s, F.lit(lo))
    # >= 0 keeps point intervals; negatives are inverted or fully
    # outside the left span — rows that can never match.
    eff = F.when(eff >= 0, eff)
    stats = right.agg(F.avg(eff).alias("avg_w"), F.max(eff).alias("max_w")).first()
    if stats["avg_w"] is None or stats["max_w"] is None:
        return None  # no matchable intervals — nothing to balance
    return _pick_unit(float(stats["avg_w"]), float(stats["max_w"]))


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    on: Sequence[str] | None = None,
    how: str = "inner",
    bucket: str | None = "auto",
    broadcast_right: bool = False,
) -> DataFrame:
    """Join left rows to right intervals containing them:
    ``left.left_ts BETWEEN right.right_start AND right.right_end``
    (inclusive both ends, matching the reference), plus optional equi
    keys ``on``. ``bucket`` is a time-truncation unit (``'hour'``,
    ``'day'``, ...) used as an extra shuffle key as described above;
    pass ``None`` to force the plain equi-key plan. The default
    ``"auto"`` (r19, VERDICT r18 #2) probes the right side once and
    self-dispatches — see ``_auto_bucket_unit``; an explicit unit or
    None always wins and skips the probe.
    """
    on = list(on or [])
    dup = set(left.columns) & set(right.columns) - set(on)
    if dup:
        raise ValueError(f"ambiguous columns (rename before join): {sorted(dup)}")
    if bucket == "auto":
        bucket = _auto_bucket_unit(
            left, right, left_ts, right_start, right_end, on, how, broadcast_right
        )
    if bucket is not None and how.replace("_", "") not in ("inner", "left", "leftouter"):
        # The right side is exploded per overlapped bucket; an unmatched
        # right interval would surface once PER BUCKET under right/full
        # outer semantics. Left rows are never exploded, so inner/left
        # are exact. (auto resolves to None for these hows — only an
        # EXPLICIT unit can reach this raise.)
        raise ValueError(f"bucket mode supports inner/left joins, not {how!r}")

    l, r = left, right
    join_keys = list(on)
    if bucket is not None:
        l = l.withColumn(_B, F.date_trunc(bucket, F.col(left_ts)))
        # Explode each interval into every bucket it overlaps — CLAMPED
        # to the left side's observed bucket range via lazy scalar
        # subqueries (no driver job; one column-pruned min/max subplan
        # evaluated inside the job). Left rows exist only in
        # [b_lo, b_hi], so buckets outside can never match: clamping
        # preserves every inner/left match while bounding an
        # open-ended sentinel interval (end 9999-12-31) to the data's
        # span instead of exploding it into millennia of rows (r19
        # review pass 2). An INVERTED interval (end < start —
        # malformed feed row) would make F.sequence throw mid-job
        # (r19 review pass 1, reproduced); it can never satisfy the
        # BETWEEN predicate, and inner/left (bucket mode's only hows)
        # drop unmatched right rows anyway — so the when() maps these
        # to NULL and explode drops them: exactly the plain plan's
        # match-nothing semantics, not a crash. NOTE F.greatest/least
        # skip NULLs, so the empty-left case (NULL scalars) is guarded
        # explicitly — every right row drops, and an inner/left join
        # with an empty left is empty regardless.
        b_lo = left.agg(F.min(F.date_trunc(bucket, F.col(left_ts)))).scalar()
        b_hi = left.agg(F.max(F.date_trunc(bucket, F.col(left_ts)))).scalar()
        seq_lo = F.greatest(F.date_trunc(bucket, F.col(right_start)), b_lo)
        seq_hi = F.least(F.date_trunc(bucket, F.col(right_end)), b_hi)
        r = r.withColumn(
            _B,
            F.explode(
                F.when(
                    b_lo.isNotNull()
                    & (F.col(right_start) <= F.col(right_end))
                    & (seq_lo <= seq_hi),
                    F.sequence(seq_lo, seq_hi, F.expr(f"INTERVAL 1 {bucket}")),
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
