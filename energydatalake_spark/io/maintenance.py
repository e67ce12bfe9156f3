"""Table maintenance: small-file compaction (+ optional layout sort).

The reference's warehouse accretes one file batch per pipeline run
(every ``append_table`` call lands new part files); left alone, a
year of 5-minute feeds is ~100k tiny files and every scan pays their
open/footer overhead. Compaction is the standard lakehouse fix:
rewrite a folder into ~target-sized files, optionally sorted on a
filter column so min/max row-group statistics prune reads.

Safety contract (the part that matters in production): the rewrite
goes to a temp sibling directory, is VERIFIED against the source —
row count AND an order-independent whole-content checksum (sum of
per-row xxhash64 over every column), so a rewrite that corrupted or
reordered values inside rows cannot pass — before any destructive
step, and nothing is deleted until the new layout is live. Folders
containing entries the rewrite cannot carry (subdirectories,
non-parquet data files) are refused up front. The swap is two directory renames; a crash
between them leaves BOTH complete layouts on disk (the canonical
path is briefly absent — recovery is renaming the ``__precompact``
backup back) — data is never half-mixed and never lost. A failed
write or verify removes the temp directory and leaves the original
untouched. (On a real object store the same shape runs against a
manifest/transaction log — Delta's OPTIMIZE is exactly this loop
with a log commit as the swap.)

Hive-partitioned roots (``dt=...`` subdirectories, the layout
``append_table(partition_date_col=...)`` writes) are REFUSED with a
clear error: a flat rewrite would silently drop the partition layout
(the row-count verify cannot see it) and the next partitioned append
would produce a mixed directory Spark refuses to read. Compact those
one partition at a time by passing the partition subfolder — which
is also how a real maintenance job schedules the work.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _partition_dirs(folder: str) -> list[str]:
    """Hive-style ``col=value`` subdirectories of ``folder``."""
    return [
        f
        for f in os.listdir(folder)
        if "=" in f and os.path.isdir(os.path.join(folder, f))
    ]


def _foreign_entries(folder: str) -> list[str]:
    """Non-hidden entries a flat parquet rewrite would silently drop:
    subdirectories of any kind and non-parquet data files. The rewrite
    only carries ``spark.read.parquet``-visible rows, so anything else
    in the folder (a stray CSV export, a nested folder) must refuse the
    compaction rather than vanish."""
    out = []
    for f in os.listdir(folder):
        if f.startswith(("_", ".")):
            continue  # Spark/_SUCCESS markers, hidden files
        p = os.path.join(folder, f)
        if os.path.isdir(p) or not f.endswith(".parquet"):
            out.append(f)
    return out


def _content_checksum(df: DataFrame) -> int:
    """Order-independent whole-content checksum: exact decimal sum of
    per-row xxhash64 over every column. Any changed, dropped, or
    duplicated value moves it; row order does not (the rewrite
    reorders rows by design)."""
    row = df.select(
        F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("c")
    ).collect()[0]
    return int(row["c"]) if row["c"] is not None else 0


def compact_folder(
    spark: SparkSession,
    folder: str,
    target_rows_per_file: int = 1_000_000,
    sort_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
) -> dict:
    """Rewrite the parquet ``folder`` into ``ceil(rows/target)`` files,
    optionally laid out for pruning:

    - ``sort_by``: range-partitioned sort on ONE key — min/max
      statistics become disjoint, selective scans on that key prune
      whole files;
    - ``zorder_by``: Morton-code layout over SEVERAL numeric keys
      (Delta OPTIMIZE ZORDER BY's shape) — each file covers a small
      hyper-rectangle, so scans filtered on ANY of the keys prune,
      at the price of weaker pruning per single key than a dedicated
      sort. Mutually exclusive with ``sort_by``.

    Returns ``{"rows": n, "files_before": a, "files_after": b}``.
    Raises (and leaves the original untouched) if the folder is a
    hive-partitioned root or the rewritten row count / content
    checksum does not match the source.
    """
    if sort_by and zorder_by:
        raise ValueError("compact_folder: sort_by and zorder_by are exclusive")

    def _parts(d: str) -> list[str]:
        return [
            f
            for f in os.listdir(d)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]

    parts = _partition_dirs(folder)
    if parts:
        raise ValueError(
            f"compact_folder: {folder} is a hive-partitioned root "
            f"({parts[0]}, ...); a flat rewrite would drop the partition "
            f"layout — compact per partition by passing the subfolder"
        )
    foreign = _foreign_entries(folder)
    if foreign:
        raise ValueError(
            f"compact_folder: {folder} contains non-parquet entries the "
            f"rewrite would silently drop ({foreign[:3]}, ...); move them "
            f"out (or compact a parquet-only folder) first"
        )
    df = spark.read.parquet(folder)
    n_rows = df.count()
    checksum = _content_checksum(df)
    files_before = len(_parts(folder))
    n_files = max(1, math.ceil(n_rows / target_rows_per_file))
    if sort_by:
        out = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(
            *sort_by
        )
    elif zorder_by:
        zdf, zcol = zorder_column(df, zorder_by)
        out = (
            zdf.repartitionByRange(n_files, zcol)
            .sortWithinPartitions(zcol)
            .drop(zcol)
        )
    else:
        out = df.repartition(n_files)
    tmp = f"{folder.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    try:
        out.write.mode("overwrite").parquet(tmp)
        rewritten = spark.read.parquet(tmp)
        n_new = rewritten.count()
        if n_new != n_rows:
            raise RuntimeError(
                f"compact_folder: rewrite row count {n_new} != source "
                f"{n_rows}; original left untouched"
            )
        # Row count alone would accept a rewrite that corrupted values;
        # the order-independent content checksum must survive the
        # rewrite bit-for-bit BEFORE anything destructive happens.
        c_new = _content_checksum(rewritten)
        if c_new != checksum:
            raise RuntimeError(
                f"compact_folder: rewrite content checksum {c_new} != "
                f"source {checksum}; original left untouched"
            )
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    backup = f"{folder.rstrip('/')}__precompact_{uuid.uuid4().hex[:8]}"
    os.rename(folder, backup)
    os.rename(tmp, folder)
    shutil.rmtree(backup)
    return {
        "rows": n_rows,
        "files_before": files_before,
        "files_after": len(_parts(folder)),
    }


#: Bits per dimension in the z-value (16 → 2 columns pack into 32 bits).
_Z_BITS = 16


def zorder_column(df, cols: list[str]):
    """Z-value (Morton code) over numeric ``cols``: each column is
    min/max-normalized to a ``_Z_BITS``-bit integer grid (one cheap
    global agg for the bounds), then the bits are interleaved. Sorting
    by the z-value gives MULTI-column locality: a file holds a small
    hyper-rectangle of the space, so min/max statistics prune scans
    filtered on ANY prefix-free subset of the columns — the property a
    single-column sort only has for its leading column. Linear
    normalization (vs rank) keeps the code a pure per-row expression:
    no global sort, no sampled quantiles, deterministic. Skewed
    columns degrade locality gracefully (dense region shares grid
    cells) — the pruning claim is still measured, not assumed, in the
    tests. Nulls map to grid cell 0 (co-located, prunable).

    Returns ``(df_with_column, colname)``; the column is internal.
    """
    from pyspark.sql import functions as F

    if len(cols) * _Z_BITS > 64:
        # Spark's shiftleft masks the shift count mod 64 on bigint, so
        # a bit position past 63 would silently garble the z-value and
        # the layout (ADVICE r7). Fail loudly instead.
        raise ValueError(
            f"zorder_column: {len(cols)} columns × {_Z_BITS} bits/dim "
            f"exceeds the 64-bit z-value; at most {64 // _Z_BITS} "
            "columns are supported"
        )

    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    grid_max = (1 << _Z_BITS) - 1
    cells = []
    for i, c in enumerate(cols):
        mn, mx = bounds[f"mn_{i}"], bounds[f"mx_{i}"]
        span = (mx - mn) if (mn is not None and mx is not None and mx > mn) else 1.0
        scaled = F.floor(
            (F.col(c).cast("double") - F.lit(mn or 0.0)) / F.lit(span) * grid_max
        ).cast("bigint")
        cells.append(
            F.least(F.greatest(F.coalesce(scaled, F.lit(0)), F.lit(0)), F.lit(grid_max))
        )
    z = F.lit(0).cast("bigint")
    for bit in range(_Z_BITS):
        for i, cell in enumerate(cells):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(cell, bit).bitwiseAND(F.lit(1)),
                    bit * len(cells) + i,
                )
            )
    name = "__zval"
    return df.withColumn(name, z), name


def expire_partitions(
    folder: str,
    keep_days: int,
    today: "datetime.date | None" = None,
) -> dict:
    """Retention sweep over a Hive ``dt=``-partitioned warehouse root:
    remove every partition directory strictly older than ``today -
    keep_days`` — the storage-policy sibling of archive-after-write
    (reference README.md:143-148 keeps the ingest side tidy; this
    keeps the warehouse side bounded). Partition-drop granularity is
    the ONLY retention shape that scales: the decision reads directory
    names, never data, so a 100 TB table expires in directory-count
    time (on Delta/Iceberg the same call is a metadata-only
    ``DELETE WHERE dt < cutoff`` + VACUUM).

    ``today`` is injectable for tests and replay (defaults to the
    current UTC date). The null-dt partition
    (``dt=__HIVE_DEFAULT_PARTITION__`` — rows whose source timestamp
    never parsed) has no age and is NEVER expired; non-``dt=`` entries
    are refused loudly rather than guessed at. Returns
    ``{"dropped": [...], "kept": n}``; dropping nothing is a no-op,
    not an error.
    """
    import datetime
    import os
    import shutil

    if keep_days < 0:
        raise ValueError(f"expire_partitions: keep_days {keep_days} < 0")
    if today is None:
        today = datetime.datetime.now(datetime.timezone.utc).date()
    cutoff = today - datetime.timedelta(days=keep_days)
    entries = [n for n in os.listdir(folder) if not n.startswith((".", "_"))]
    bad = [
        n
        for n in entries
        if not (n.startswith("dt=") and os.path.isdir(os.path.join(folder, n)))
    ]
    if bad:
        raise ValueError(
            f"expire_partitions: {folder} is not a dt=-partitioned root "
            f"(unexpected entries: {sorted(bad)[:5]})"
        )
    dropped = []
    kept = 0
    for n in sorted(entries):
        val = n[len("dt=") :]
        if val == "__HIVE_DEFAULT_PARTITION__":
            kept += 1
            continue
        try:
            d = datetime.date.fromisoformat(val)
        except ValueError as exc:
            raise ValueError(
                f"expire_partitions: unparseable partition {n!r}"
            ) from exc
        if d < cutoff:
            shutil.rmtree(os.path.join(folder, n))
            dropped.append(n)
        else:
            kept += 1
    return {"dropped": dropped, "kept": kept}


def compact_partitioned_root(
    spark: SparkSession,
    folder: str,
    target_rows_per_file: int = 1_000_000,
    sort_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
) -> dict:
    """Maintenance driver for a Hive ``dt=``-partitioned root: run
    ``compact_folder`` on EACH partition directory — the per-partition
    scheduling loop its docstring prescribes (a flat rewrite of the
    root would silently drop the partition layout, which is why
    compact_folder refuses roots). Partitions keep their independent
    verify-then-swap safety: a failure in one partition leaves it and
    every other partition intact (the exception propagates with the
    partition named).

    At 100 TB this loop IS the nightly OPTIMIZE job: each partition is
    a bounded unit of work, trivially schedulable/resumable, and only
    partitions past their write window need visiting (callers filter
    the returned names on their own freshness policy before re-runs).
    Returns ``{partition_name: compact_folder_result}``.
    """
    parts = sorted(_partition_dirs(folder))
    if not parts:
        raise ValueError(
            f"compact_partitioned_root: {folder} has no col= partition "
            "directories — use compact_folder for flat folders"
        )
    results = {}
    for p in parts:
        try:
            results[p] = compact_folder(
                spark,
                os.path.join(folder, p),
                target_rows_per_file=target_rows_per_file,
                sort_by=sort_by,
                zorder_by=zorder_by,
            )
        except Exception as exc:
            raise RuntimeError(
                f"compact_partitioned_root: partition {p} failed: {exc}"
            ) from exc
    return results


def vacuum_folder(folder: str, recover: bool = True) -> dict:
    """Crash-recovery sweep for ``compact_folder``'s two-rename swap:
    a crash can leave ``__compact_*`` temp rewrites (unverified —
    always safe to delete) and ``__precompact_*`` backups. A backup
    WITH the canonical folder present means the swap completed and
    only cleanup died — the backup is a verified-equal stale copy,
    deleted. A backup WITHOUT the canonical folder means the crash hit
    between the two renames; with ``recover=True`` the backup is
    renamed back (restoring the pre-compaction layout — the documented
    recovery), else reported for manual action.

    Operates on directory names only; never opens data. Returns
    ``{"removed": [...], "recovered": [...], "needs_action": [...]}``.
    """
    import os
    import re
    import shutil

    parent, base = os.path.split(folder.rstrip("/"))
    parent = parent or "."
    removed, recovered, needs_action = [], [], []
    pat = re.compile(re.escape(base) + r"__(compact|precompact)_[0-9a-f]{8}$")
    for name in sorted(os.listdir(parent)):
        m = pat.match(name)
        if not m:
            continue
        p = os.path.join(parent, name)
        if m.group(1) == "compact":
            shutil.rmtree(p)
            removed.append(name)
        elif os.path.isdir(folder):
            shutil.rmtree(p)
            removed.append(name)
        elif recover:
            os.rename(p, folder)
            recovered.append(name)
        else:
            needs_action.append(name)
    return {
        "removed": removed,
        "recovered": recovered,
        "needs_action": needs_action,
    }


def table_stats(folder: str) -> dict:
    """Footer-only table statistics — the path-based warehouse's
    ``ANALYZE TABLE`` equivalent: row count, file count/bytes, and
    per-column min/max/null-count aggregated from parquet row-group
    statistics. Reads METADATA only (never data pages), so a 100 TB
    table profiles in footer-count time; the output is what a planner
    or a freshness monitor consumes (CBO row estimates, partition
    pruning sanity, null-rate drift alarms).

    Columns whose type has no min/max ordering in the footer (nested,
    binary) report ``None`` bounds; ``null_count`` is always exact.

    String/binary bounds are BOUNDS, not witnesses: parquet writers may
    truncate long string statistics (a truncated max is rounded UP to a
    value that need not exist in the data; a truncated min is rounded
    down). This pyarrow version exposes no exactness flag on
    ``ColumnChunkMetaData.statistics``, so consumers must treat string
    min/max as a containing range — fine for pruning, wrong for
    "smallest/largest actual value" reporting.
    """
    import os

    import pyarrow.parquet as pq

    files = [
        os.path.join(folder, f)
        for f in sorted(os.listdir(folder))
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    if not files:
        raise ValueError(f"table_stats: no parquet files under {folder}")
    n_rows = 0
    n_bytes = 0
    cols: dict[str, dict] = {}
    for path in files:
        n_bytes += os.path.getsize(path)
        md = pq.ParquetFile(path).metadata
        n_rows += md.num_rows
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                st = cols.setdefault(
                    name, {"min": None, "max": None, "null_count": 0}
                )
                s = col.statistics
                if s is None:
                    continue
                if s.null_count is not None:
                    st["null_count"] += s.null_count
                if s.has_min_max:
                    if st["min"] is None or s.min < st["min"]:
                        st["min"] = s.min
                    if st["max"] is None or s.max > st["max"]:
                        st["max"] = s.max
    return {
        "n_rows": n_rows,
        "n_files": len(files),
        "n_bytes": n_bytes,
        "columns": cols,
    }
