"""Table maintenance: small-file compaction (+ optional layout sort).

The reference's warehouse accretes one file batch per pipeline run
(every ``append_table`` call lands new part files); left alone, a
year of 5-minute feeds is ~100k tiny files and every scan pays their
open/footer overhead. Compaction is the standard lakehouse fix:
rewrite a folder into ~target-sized files, optionally sorted on a
filter column so min/max row-group statistics prune reads.

Safety contract (the part that matters in production): the rewrite
goes to a temp sibling directory, is VERIFIED against the source row
count before any destructive step, and the swap is two renames with
the original kept until the new layout is live — a crash at any
point leaves either the old folder or the new one readable, never
neither and never a half-mixed directory. (On a real object store
the same shape runs against a manifest/transaction log — Delta's
OPTIMIZE is exactly this loop with a log commit as the swap.)
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession


def compact_folder(
    spark: SparkSession,
    folder: str,
    target_rows_per_file: int = 1_000_000,
    sort_by: list[str] | None = None,
) -> dict:
    """Rewrite the parquet ``folder`` into ``ceil(rows/target)`` files,
    optionally sorted by ``sort_by`` (within AND across files via a
    range-partitioned sort, so min/max statistics become disjoint and
    selective scans prune whole files).

    Returns ``{"rows": n, "files_before": a, "files_after": b}``.
    Raises (and leaves the original untouched) if the rewritten row
    count does not match the source.
    """

    def _parts(d: str) -> list[str]:
        return [
            f
            for f in os.listdir(d)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]

    df = spark.read.parquet(folder)
    n_rows = df.count()
    files_before = len(_parts(folder))
    n_files = max(1, math.ceil(n_rows / target_rows_per_file))
    if sort_by:
        out = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(
            *sort_by
        )
    else:
        out = df.repartition(n_files)
    tmp = f"{folder.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp)
    n_new = spark.read.parquet(tmp).count()
    if n_new != n_rows:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compact_folder: rewrite row count {n_new} != source {n_rows}; "
            f"original left untouched"
        )
    backup = f"{folder.rstrip('/')}__precompact_{uuid.uuid4().hex[:8]}"
    os.rename(folder, backup)
    os.rename(tmp, folder)
    shutil.rmtree(backup)
    return {
        "rows": n_rows,
        "files_before": files_before,
        "files_after": len(_parts(folder)),
    }
