"""Streaming-at-scale probe (VERDICT r16 #1): the last surface with no
heavy-scale evidence. Measures the two 100 TB streaming risks on an
x100-scale file backlog:

- **state-store growth** — exact streaming dedup
  (``streaming/dedup.py``) keeps one state entry per distinct key
  FOREVER in the unbounded variant; the watermark-bounded variant
  (``dropDuplicatesWithinWatermark``) evicts state older than the
  event-time horizon. This probe drives both over the same backlog and
  logs per-batch state rows + state bytes, so the ledger can name the
  point where unbounded in-heap state becomes the scale-killer and
  show the bounded variant holding flat.
- **backlog drain** — thousands of queued files after an outage,
  drained through ``maxFilesPerTrigger`` micro-batches under
  ``Trigger.AvailableNow`` (the production re-start shape): per-batch
  latency is logged against remaining backlog depth.

Backlog: ``N_FILES`` parquet files (mtime- and name-ordered so batches
follow event time), each ``ROWS_PER_FILE`` rows of (k string, ts
timestamp, v double). 20% of rows duplicate a key drawn from the
previous ~12 minutes of event time — inside the 1-hour watermark even
across batch boundaries, so BOTH variants must emit exactly the
backlog's distinct-key count (recorded in the manifest and asserted
per variant: the probe is a correctness crosscheck, not just a timer).

Variants (one fresh JVM each, scale_probe precedent — a shared session
contaminates later runs with heap/GC pressure):

- ``dedup_unbounded``      — dropDuplicates, default in-heap
                             HDFSBackedStateStore
- ``dedup_watermark_1h``   — dropDuplicatesWithinWatermark, 1 h horizon
- ``dedup_unbounded_rocksdb`` — dropDuplicates on the built-in RocksDB
                             provider: the disk-backed path unbounded
                             state must take once it outgrows the heap
                             (its memoryUsedBytes is a block-cache +
                             memtable estimate, not comparable to the
                             HDFS provider's in-heap map size).

Results merge per-variant into BENCHHEAVY_sf10.json under
``streaming_x100`` (crash-safe: a dead variant loses only itself).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/sfgen/streaming_x100"
BACKLOG = os.path.join(BASE, "backlog")
N_FILES = 2400
ROWS_PER_FILE = 20_000
FILE_SPAN_SEC = 72          # 2400 files * 72 s = 48 h of event time
DUP_RATE = 0.20
DUP_LAG_FILES = 10          # dups reference keys <= ~12 min old
MAX_FILES_PER_TRIGGER = 120  # -> 20 micro-batches
T0_EPOCH = 1_767_225_600    # 2026-01-01T00:00:00Z, fixed (no Date.now)
_GEN_SEED = 20260816
VARIANTS = ("dedup_unbounded", "dedup_watermark_1h", "dedup_unbounded_rocksdb")


def _manifest() -> dict:
    return {
        "n_files": N_FILES,
        "rows_per_file": ROWS_PER_FILE,
        "file_span_sec": FILE_SPAN_SEC,
        "dup_rate": DUP_RATE,
        "dup_lag_files": DUP_LAG_FILES,
        "seed": _GEN_SEED,
        "gen_version": 1,
    }


def gen_backlog() -> dict:
    """Generate (or reuse, manifest-gated) the file backlog; returns the
    manifest extended with the realized distinct-key count."""
    mpath = os.path.join(BASE, "manifest.json")
    want = _manifest()
    if os.path.exists(mpath):
        try:
            have = json.load(open(mpath))
            if {k: have.get(k) for k in want} == want and "n_unique" in have:
                print(f"# backlog reuse: {BACKLOG}", file=sys.stderr)
                return have
        except Exception:
            pass
    shutil.rmtree(BACKLOG, ignore_errors=True)
    os.makedirs(BACKLOG, exist_ok=True)
    rng = np.random.default_rng(_GEN_SEED)
    schema = pa.schema(
        [("k", pa.string()), ("ts", pa.timestamp("us", tz="UTC")),
         ("v", pa.float64())]
    )
    next_key = 0
    # keys eligible for duplication: the previous DUP_LAG_FILES files'
    # fresh keys (bounded driver RSS — ADVICE r16 precedent)
    recent: list[np.ndarray] = []
    n_unique = 0
    t_start = time.time()
    for i in range(N_FILES):
        n_dup = int(ROWS_PER_FILE * DUP_RATE) if recent else 0
        n_new = ROWS_PER_FILE - n_dup
        fresh = np.arange(next_key, next_key + n_new, dtype=np.int64)
        next_key += n_new
        n_unique += n_new
        pool = np.concatenate(recent) if recent else fresh
        dups = pool[rng.integers(0, len(pool), size=n_dup)] if n_dup else \
            np.empty(0, dtype=np.int64)
        keys = np.concatenate([fresh, dups])
        rng.shuffle(keys)
        ts = (
            T0_EPOCH + i * FILE_SPAN_SEC + rng.random(ROWS_PER_FILE) *
            FILE_SPAN_SEC
        )
        tbl = pa.table(
            {
                "k": pa.array(np.char.add("k", keys.astype("U12"))),
                "ts": pa.array((ts * 1e6).astype(np.int64),
                               pa.timestamp("us", tz="UTC")),
                "v": pa.array(rng.random(ROWS_PER_FILE)),
            },
            schema=schema,
        )
        pq.write_table(tbl, os.path.join(BACKLOG, f"f{i:05d}.parquet"))
        recent.append(fresh)
        if len(recent) > DUP_LAG_FILES:
            recent.pop(0)
        if (i + 1) % 400 == 0:
            print(
                f"# gen: {i + 1}/{N_FILES} files "
                f"({time.time() - t_start:.0f}s)",
                file=sys.stderr,
            )
    out = {**want, "n_unique": n_unique,
           "n_rows": N_FILES * ROWS_PER_FILE}
    with open(mpath, "w") as fh:
        json.dump(out, fh, indent=1)
    return out


def run_variant(variant: str) -> dict:
    """Child entry: one fresh JVM, one variant, full per-batch metrics."""
    from energydatalake_spark.session import get_spark
    from energydatalake_spark.streaming.dedup import (
        streaming_dedup,
        streaming_dedup_within_watermark,
    )

    manifest = json.load(open(os.path.join(BASE, "manifest.json")))
    extra = {}
    if variant.endswith("_rocksdb"):
        extra["spark.sql.streaming.stateStore.providerClass"] = (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )
    spark = get_spark(f"probe_streaming_{variant}", extra_conf=extra)
    reader = (
        spark.readStream.schema("k string, ts timestamp, v double")
        .option("maxFilesPerTrigger", str(MAX_FILES_PER_TRIGGER))
        .parquet(BACKLOG)
    )
    if variant == "dedup_watermark_1h":
        deduped = streaming_dedup_within_watermark(
            reader, ["k"], "ts", "1 hour"
        )
    else:
        deduped = streaming_dedup(reader, ["k"])

    ckpt = os.path.join(BASE, f"ckpt_{variant}")
    shutil.rmtree(ckpt, ignore_errors=True)
    emitted: list[int] = []

    def sink(batch_df, _epoch) -> None:
        # count() executes the batch and gives the hard correctness
        # crosscheck (sum == manifest n_unique for BOTH variants);
        # identical work in every variant, so latencies stay comparable
        emitted.append(batch_df.count())

    t0 = time.perf_counter()
    q = (
        deduped.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = round(time.perf_counter() - t0, 2)

    batches = []
    done = 0
    for p in q.recentProgress:
        if not p or p.get("numInputRows", 0) == 0 and not p.get(
            "stateOperators"
        ):
            continue
        so = (p.get("stateOperators") or [{}])[0]
        done += int(round(p["numInputRows"] / manifest["rows_per_file"]))
        row = {
            "batch": p.get("batchId"),
            "input_rows": p.get("numInputRows"),
            "batch_sec": round(
                p.get("durationMs", {}).get("triggerExecution", 0) / 1000.0, 2
            ),
            "state_rows": so.get("numRowsTotal"),
            "state_mb": round(so.get("memoryUsedBytes", 0) / 2**20, 1),
            "backlog_files_left": manifest["n_files"] - done,
        }
        # keep provider-specific metrics verbatim (RocksDB SST/memtable
        # sizes etc.) — the r17 run showed hand-picking one key captures
        # nothing when the provider names it differently
        cm = so.get("customMetrics") or {}
        if cm:
            row["custom_metrics"] = cm
        batches.append(row)
    shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "variant": variant,
        "wall_sec": wall,
        "n_batches": len(emitted),
        "rows_emitted": int(sum(emitted)),
        "emitted_matches_unique": int(sum(emitted)) == manifest["n_unique"],
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "batches": batches,
    }


LISTING_FILES = 24_000
LISTING_ROWS = 100
LISTING_PER_TRIGGER = 800  # -> 30 batches

#: The three listing runs (VERDICT r17 #3): the r17.14 baseline named
#: its mitigations without measuring them. `archive` re-runs the same
#: 24k-file stateless drain with cleanSource=archive so the listed
#: directory SHRINKS as the drain progresses (per-batch source cost
#: should FALL); `mft2400` is the maxFilesPerTrigger sensitivity point
#: (10 triggers instead of 30 over the same static listing). Each runs
#: in a fresh JVM; the archive variant drains a hardlink CLONE of the
#: backlog so the shared corpus survives.
LISTING_VARIANTS = {
    "source_listing_24k": {"clean_source": None, "per_trigger": 800},
    "source_listing_24k_archive": {"clean_source": "archive", "per_trigger": 800},
    "source_listing_24k_mft2400": {"clean_source": None, "per_trigger": 2400},
}


def run_listing(
    clean_source: str | None = None,
    per_trigger: int = LISTING_PER_TRIGGER,
    variant: str = "source_listing_24k",
) -> dict:
    """File-SOURCE overhead isolated at a 24,000-file backlog (r17.5
    follow-up: the dedup probe only reached 2,400 files, and 'listing
    is noise' deserves a 10× harder test). Tiny 100-row files make
    data cost ~0, a stateless passthrough removes state-store work, so
    per-batch time is listing + seen-files-log + task dispatch. The
    trigger breakdown (latestOffset/getBatch = source side, addBatch =
    execution) is logged per batch: the known 100 TB risk is that the
    source re-lists the FULL directory every trigger and replays a
    growing seen-files map, so source-side time should GROW with
    files-processed even as per-batch data stays constant — this probe
    measures the slope of that growth, and (r18) the ``archive``
    variant measures the engine's own mitigation: with
    ``cleanSource=archive`` (the io/file_queue.py default) the drained
    directory shrinks batch-over-batch, recorded per batch in
    ``files_left`` alongside the falling source-side cost."""
    import numpy as np

    from energydatalake_spark.session import get_spark

    base = os.path.join(BASE, "listing")
    backlog = os.path.join(base, "backlog")
    mpath = os.path.join(base, "manifest.json")
    want = {
        "n_files": LISTING_FILES,
        "rows_per_file": LISTING_ROWS,
        "seed": _GEN_SEED,
        "gen_version": 1,
    }
    have = None
    if os.path.exists(mpath):
        try:
            have = json.load(open(mpath))
        except Exception:
            pass
    if have != want:
        shutil.rmtree(backlog, ignore_errors=True)
        os.makedirs(backlog, exist_ok=True)
        rng = np.random.default_rng(_GEN_SEED)
        tmpl = pa.table(
            {
                "k": pa.array(np.arange(LISTING_ROWS, dtype=np.int64)),
                "v": pa.array(rng.random(LISTING_ROWS)),
            }
        )
        t0 = time.time()
        for i in range(LISTING_FILES):
            pq.write_table(tmpl, os.path.join(backlog, f"f{i:06d}.parquet"))
            if (i + 1) % 8000 == 0:
                print(
                    f"# listing gen: {i + 1}/{LISTING_FILES} "
                    f"({time.time() - t0:.0f}s)",
                    file=sys.stderr,
                )
        os.makedirs(base, exist_ok=True)
        with open(mpath, "w") as fh:
            json.dump(want, fh, indent=1)

    src_dir = backlog
    archive_dir = None
    if clean_source:
        # Drain a hardlink CLONE so archiving (which MOVES each
        # processed file out of the source directory) cannot destroy
        # the shared corpus for later runs. 24k hardlinks ≈ 1 s.
        src_dir = os.path.join(base, f"work_{variant}")
        archive_dir = os.path.join(base, f"archived_{variant}")
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(archive_dir, ignore_errors=True)
        os.makedirs(src_dir)
        for f in os.listdir(backlog):
            os.link(os.path.join(backlog, f), os.path.join(src_dir, f))

    spark = get_spark(f"probe_{variant}")
    reader = spark.readStream.schema("k bigint, v double").option(
        "maxFilesPerTrigger", str(per_trigger)
    )
    if clean_source:
        reader = reader.option("cleanSource", clean_source).option(
            "sourceArchiveDir", archive_dir
        )
    reader = reader.parquet(src_dir)
    ckpt = os.path.join(base, f"ckpt_{variant}")
    shutil.rmtree(ckpt, ignore_errors=True)
    rows = []
    files_left = {}

    def sink(batch_df, epoch_id) -> None:
        rows.append(batch_df.count())
        # Directory size as the drain progresses, keyed by batchId
        # (ADVICE r18: recentProgress is a capped ring buffer — default
        # 100 entries — so a positional pairing would silently misalign
        # any variant with >100 batches; the batchId join below cannot).
        # NOTE the reading LAGS the drain by roughly one batch: this
        # listdir runs inside foreachBatch BEFORE the source commits /
        # archives the batch's own files, so batch i's value reflects
        # the archive state after batch i-1.
        files_left[epoch_id] = len(os.listdir(src_dir))

    t0 = time.perf_counter()
    q = (
        reader.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = round(time.perf_counter() - t0, 2)
    batches = []
    for p in q.recentProgress:
        if not p:
            continue
        dm = p.get("durationMs", {})
        row = {
            "batch": p.get("batchId"),
            "input_rows": p.get("numInputRows"),
            "batch_sec": round(dm.get("triggerExecution", 0) / 1000.0, 3),
            "source_sec": round(
                (dm.get("latestOffset", 0) + dm.get("getBatch", 0))
                / 1000.0,
                3,
            ),
            "exec_sec": round(dm.get("addBatch", 0) / 1000.0, 3),
        }
        if clean_source and p.get("batchId") in files_left:
            row["files_left"] = files_left[p.get("batchId")]
        batches.append(row)
    shutil.rmtree(ckpt, ignore_errors=True)
    if clean_source:
        # archived files keep their ORIGINAL path nested under
        # sourceArchiveDir — count recursively, not the top level
        n_archived = sum(
            len(fs) for _, _, fs in os.walk(archive_dir)
        ) if os.path.isdir(archive_dir) else 0
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(archive_dir, ignore_errors=True)
    done = [b for b in batches if b["input_rows"]]
    import numpy as np  # slopes of per-batch cost vs batch index

    y = np.array([b["batch_sec"] for b in done])
    x = np.arange(len(y), dtype=float)
    slope = float(np.polyfit(x, y, 1)[0]) if len(y) > 2 else 0.0
    ys = np.array([b["source_sec"] for b in done])
    src_slope = float(np.polyfit(x, ys, 1)[0]) if len(ys) > 2 else 0.0
    out = {
        "variant": variant,
        "clean_source": clean_source,
        "max_files_per_trigger": per_trigger,
        "wall_sec": wall,
        "n_batches": len(rows),
        "rows_emitted": int(sum(rows)),
        "rows_expected": LISTING_FILES * LISTING_ROWS,
        "batch_sec_slope_per_batch": round(slope, 4),
        "source_sec_slope_per_batch": round(src_slope, 4),
        "manifest": want,
        "batches": batches,
    }
    if clean_source:
        out["files_archived"] = n_archived
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
    sect = prior.get("streaming_x100", {})
    if sect.get("manifest") != manifest:
        sect = {"manifest": manifest}  # corpus changed: drop stale variants
    sect[result["variant"]] = {
        k: v for k, v in result.items() if k != "variant"
    }
    prior["streaming_x100"] = sect
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(prior, fh, indent=1, sort_keys=True)
        fh.write("\n")
    os.replace(tmp, path)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--listing-child" in sys.argv:
        variant = sys.argv[sys.argv.index("--listing-child") + 1]
        cfg = LISTING_VARIANTS[variant]
        out = run_listing(variant=variant, **cfg)
        with open(os.path.join(BASE, f"result_{variant}.json"), "w") as fh:
            json.dump(out, fh, indent=1)
        print(json.dumps({k: v for k, v in out.items() if k != "batches"}))
        if out["rows_emitted"] != out["rows_expected"]:
            print(
                f"{variant}: emitted {out['rows_emitted']} != expected "
                f"{out['rows_expected']} — exiting nonzero so the parent "
                "skips the merge",
                file=sys.stderr,
            )
            sys.exit(3)
        return
    if "--listing" in sys.argv:
        names = [a for a in sys.argv[1:] if not a.startswith("-")]
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        path = os.path.join(repo, "BENCHHEAVY_sf10.json")
        for variant in names or LISTING_VARIANTS:
            print(f"== {variant}", file=sys.stderr)
            rc = subprocess.call(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--listing-child",
                    variant,
                ]
            )
            if rc != 0:
                print(f"{variant} exited {rc}; skipping merge", file=sys.stderr)
                continue
            out = json.load(open(os.path.join(BASE, f"result_{variant}.json")))
            prior = json.load(open(path)) if os.path.exists(path) else {}
            sect = prior.setdefault("streaming_x100", {})
            sect[variant] = {k: v for k, v in out.items() if k != "variant"}
            tmp = path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(prior, fh, indent=1, sort_keys=True)
                fh.write("\n")
            os.replace(tmp, path)
            print(f"merged {variant}", file=sys.stderr)
        return
    if "--variant" in sys.argv:
        variant = sys.argv[sys.argv.index("--variant") + 1]
        out = run_variant(variant)
        with open(os.path.join(BASE, f"result_{variant}.json"), "w") as fh:
            json.dump(out, fh, indent=1)
        print(json.dumps({k: v for k, v in out.items() if k != "batches"}))
        # The docstring's correctness crosscheck must have teeth
        # (ADVICE r17): a variant that emits the wrong distinct-key
        # count exits nonzero so the parent skips the merge instead of
        # landing an invalid measurement in BENCHHEAVY_sf10.json.
        if not out.get("emitted_matches_unique", False):
            print(
                f"{variant}: emitted rows != manifest distinct keys — "
                "exiting nonzero so the parent skips the merge",
                file=sys.stderr,
            )
            sys.exit(3)
        return
    manifest = gen_backlog()
    # 16g: big enough for the ~38M-key unbounded map to complete, small
    # enough that the in-heap growth curve is read against a realistic
    # single-executor heap (not this container's full 125 GB).
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    for variant in (args or VARIANTS):
        print(f"== {variant}", file=sys.stderr)
        rc = subprocess.call(
            [sys.executable, os.path.abspath(__file__), "--variant", variant]
        )
        if rc != 0:
            print(f"{variant} exited {rc}; continuing", file=sys.stderr)
            continue
        result = json.load(
            open(os.path.join(BASE, f"result_{variant}.json"))
        )
        merge(result, manifest)
        print(f"merged {variant}", file=sys.stderr)


if __name__ == "__main__":
    main()
