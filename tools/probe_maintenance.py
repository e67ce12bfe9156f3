"""Maintenance-tier-at-scale probe (VERDICT r16 #7): the small-file
problem is the first thing a 100 TB ingest hits, and the maintenance
tier (io/maintenance.py) was pytest-proven but never measured on a
many-thousand-file layout.

Scenario: a dt=-partitioned warehouse root of ``N_PARTS`` partitions ×
``FILES_PER_PART`` small files (6,000 files total — a year-class
accretion at the reference's one-file-batch-per-cron-run rate), then:

1. the small-file penalty itself — a filtered scan-aggregate over the
   6,000-file root (the BEFORE number);
2. ``table_stats`` on the worst partition — footer-only, so
   many-file-count time, no data pages;
3. ``compact_partitioned_root`` (verify-then-swap per partition) with a
   0.5 s transient-disk sampler on the root's parent: the safety
   contract's cost claim is that the rewrite holds source + temp for
   ONE partition at a time, so the transient peak is ~one partition's
   bytes, never ~the table's;
4. the same scan-aggregate on the compacted root (the AFTER number);
5. ``expire_partitions`` dropping the oldest ``EXPIRE_DROP`` partitions
   — directory-name-only, so directory-count time.

Results merge into BENCHHEAVY_sf10.json under ``maintenance_x100``.
Fresh JVM per run (scale_probe precedent).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/sfgen/maintenance_x100"
ROOT = os.path.join(BASE, "warehouse")
N_PARTS = 50
FILES_PER_PART = 120
ROWS_PER_FILE = 8_000
EXPIRE_DROP = 10
_GEN_SEED = 20260816
D0 = (2026, 1, 1)  # first partition date, fixed (no Date.now in probes)


def _dates() -> list[str]:
    import datetime

    d = datetime.date(*D0)
    return [
        (d + datetime.timedelta(days=i)).isoformat() for i in range(N_PARTS)
    ]


def gen_root() -> dict:
    mpath = os.path.join(BASE, "manifest.json")
    want = {
        "n_parts": N_PARTS,
        "files_per_part": FILES_PER_PART,
        "rows_per_file": ROWS_PER_FILE,
        "seed": _GEN_SEED,
        "gen_version": 1,
    }
    if os.path.exists(mpath):
        try:
            have = json.load(open(mpath))
            # reuse only a PRISTINE root: the probe itself compacts and
            # expires it, so a post-run root fails the file-count check
            # and regenerates instead of measuring already-compacted data
            if (
                {k: have.get(k) for k in want} == want
                and _count_files(ROOT) == N_PARTS * FILES_PER_PART
            ):
                print(f"# root reuse: {ROOT}", file=sys.stderr)
                return have
        except Exception:
            pass
    shutil.rmtree(ROOT, ignore_errors=True)
    rng = np.random.default_rng(_GEN_SEED)
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("value", pa.float64()),
            ("category", pa.string()),
        ]
    )
    cats = np.array([f"c{i:02d}" for i in range(24)])
    eid = 0
    t0 = time.time()
    for pi, d in enumerate(_dates()):
        pdir = os.path.join(ROOT, f"dt={d}")
        os.makedirs(pdir, exist_ok=True)
        for fi in range(FILES_PER_PART):
            n = ROWS_PER_FILE
            tbl = pa.table(
                {
                    "event_id": pa.array(
                        np.arange(eid, eid + n, dtype=np.int64)
                    ),
                    "user_id": pa.array(
                        rng.integers(0, 2_000_000, size=n, dtype=np.int64)
                    ),
                    "value": pa.array(rng.random(n)),
                    "category": pa.array(
                        cats[rng.integers(0, len(cats), size=n)]
                    ),
                },
                schema=schema,
            )
            pq.write_table(tbl, os.path.join(pdir, f"part-{fi:05d}.parquet"))
            eid += n
        if (pi + 1) % 10 == 0:
            print(
                f"# gen: {pi + 1}/{N_PARTS} partitions "
                f"({time.time() - t0:.0f}s)",
                file=sys.stderr,
            )
    with open(mpath, "w") as fh:
        json.dump(want, fh, indent=1)
    return want


def _du(path: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                n += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return n


def _count_files(root: str) -> int:
    n = 0
    for _r, _d, files in os.walk(root):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def run() -> dict:
    from energydatalake_spark.io.maintenance import (
        compact_partitioned_root,
        expire_partitions,
        table_stats,
    )
    from energydatalake_spark.session import get_spark

    spark = get_spark("probe_maintenance")

    def scan_agg() -> tuple[float, int]:
        # the query class small files hurt: full-root filtered aggregate
        from pyspark.sql import functions as F

        t0 = time.perf_counter()
        n = (
            spark.read.parquet(ROOT)
            .where(F.col("category") == "c07")
            .groupBy("dt")
            .agg(F.sum("value").alias("s"), F.count("*").alias("n"))
            .count()
        )
        return round(time.perf_counter() - t0, 2), n

    out: dict = {"files_before": _count_files(ROOT)}
    # Warm the parquet-scan + agg codegen on a tiny UNRELATED layout so
    # the BEFORE number measures the small-file penalty (listing +
    # footers + per-file task overhead on 6,000 files) and not one-time
    # session bring-up — otherwise the before/after speedup overstates
    # (r17 self-review). The 6,000-file listing itself stays cold:
    # that IS the thing being measured.
    warm_dir = os.path.join(BASE, "__scan_warm")
    if not os.path.exists(warm_dir):
        os.makedirs(os.path.join(warm_dir, "dt=1970-01-01"), exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([1, 2], pa.int64()),
                    "user_id": pa.array([1, 2], pa.int64()),
                    "value": pa.array([0.1, 0.2]),
                    "category": pa.array(["c07", "c01"]),
                }
            ),
            os.path.join(warm_dir, "dt=1970-01-01", "part-00000.parquet"),
        )
    from pyspark.sql import functions as F

    (
        spark.read.parquet(warm_dir)
        .where(F.col("category") == "c07")
        .groupBy("dt")
        .agg(F.sum("value").alias("s"), F.count("*").alias("n"))
        .count()
    )

    out["scan_before_sec"], out["scan_groups"] = scan_agg()

    t0 = time.perf_counter()
    st = table_stats(os.path.join(ROOT, f"dt={_dates()[0]}"))
    out["table_stats_one_part_sec"] = round(time.perf_counter() - t0, 2)
    out["table_stats_rows"] = st["n_rows"]

    # transient-disk sampler: the verify-then-swap budget claim
    baseline = _du(BASE)
    peak = [baseline]
    stop = threading.Event()

    def sample() -> None:
        while not stop.is_set():
            try:
                peak[0] = max(peak[0], _du(BASE))
            except Exception:
                pass
            stop.wait(0.5)

    th = threading.Thread(target=sample, daemon=True)
    th.start()
    t0 = time.perf_counter()
    results = compact_partitioned_root(
        spark, ROOT, target_rows_per_file=1_000_000
    )
    compact_sec = round(time.perf_counter() - t0, 2)
    stop.set()
    th.join(timeout=5)
    out["compact_sec"] = compact_sec
    out["compact_partitions"] = len(results)
    out["files_after"] = _count_files(ROOT)
    part_bytes = baseline // N_PARTS
    out["disk_baseline_gb"] = round(baseline / 2**30, 2)
    out["disk_transient_peak_extra_gb"] = round(
        (peak[0] - baseline) / 2**30, 3
    )
    out["disk_one_partition_gb"] = round(part_bytes / 2**30, 3)
    # the budget claim itself, recorded as a boolean the ledger can cite:
    # transient extra stays within ~2 partitions' bytes (source+temp for
    # the partition in flight, plus sampler-visible rename slack)
    out["transient_within_two_partitions"] = (
        peak[0] - baseline <= 2 * part_bytes + (64 << 20)
    )

    out["scan_after_sec"], groups_after = scan_agg()
    out["scan_groups_match"] = groups_after == out["scan_groups"]
    out["scan_speedup"] = (
        round(out["scan_before_sec"] / out["scan_after_sec"], 2)
        if out["scan_after_sec"] > 0
        else None
    )

    import datetime

    t0 = time.perf_counter()
    exp = expire_partitions(
        ROOT,
        keep_days=N_PARTS - EXPIRE_DROP,
        today=datetime.date(*D0) + datetime.timedelta(days=N_PARTS),
    )
    out["expire_sec"] = round(time.perf_counter() - t0, 3)
    out["expired_dropped"] = len(exp["dropped"])
    out["expired_kept"] = exp["kept"]
    return out


def merge(result: dict, manifest: dict) -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "BENCHHEAVY_sf10.json")
    prior = {}
    if os.path.exists(path):
        try:
            prior = json.load(open(path))
        except Exception:
            prior = {}
    prior["maintenance_x100"] = {"manifest": manifest, **result}
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(prior, fh, indent=1, sort_keys=True)
        fh.write("\n")
    os.replace(tmp, path)


def main() -> None:
    if "--run" in sys.argv:
        manifest = gen_root()
        result = run()
        result["driver_mem"] = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        with open(os.path.join(BASE, "result.json"), "w") as fh:
            json.dump({"manifest": manifest, **result}, fh, indent=1)
        print(json.dumps(result))
        return
    # parent: fresh JVM for the measured run
    import subprocess

    os.makedirs(BASE, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    rc = subprocess.call(
        [sys.executable, os.path.abspath(__file__), "--run"]
    )
    if rc != 0:
        print(f"--run exited {rc}", file=sys.stderr)
        sys.exit(rc)
    d = json.load(open(os.path.join(BASE, "result.json")))
    manifest = d.pop("manifest")
    merge(d, manifest)
    print("merged maintenance_x100", file=sys.stderr)


if __name__ == "__main__":
    main()
