"""Temporal-join-at-scale probe (VERDICT r17 #2): the as-of join (J1)
and band join (J2) are the reference's two flagship operators
(`PySpark Scripts/pyspark_ercot_merge_fm_load_latest_BQ_archive_csv.py:59-79`,
`test_pyspark_merge_spp_weather.py:54-59`) and the reason the rebuild
exists (the reference's as-of collected both sides to the driver), yet
through r17 they were the last SURVEY §2 surface with zero heavy-scale
evidence — every BENCHHEAVY family was dedup/similarity; asof/band
stopped at sf1.

Measures keyed as-of (high-cardinality AND the reference's real
4-zone skewed key), KEYLESS as-of (the bucketed tier,
operators/asof.py:_global_asof), and band join at x100 → x1000 row
decades under the r15.4 protocol: 3 fresh-JVM quiet-machine reps per
(variant, scale), warm-then-timed inside each child, α recomputed
from per-scale MEDIANS with the rep spread disclosed. Degenerate
shapes run alongside their mitigations so the scale-killer carries a
measured number, not an assertion:

- ``asof_keyed_4zone_plain``     — by=zone window: 4 window
                                   partitions, each zone's timeline
                                   serialized through ONE task
- ``asof_keyed_4zone_bucketed``  — bucket_by_time=True: per
                                   (zone, time-bucket) fill, the r18
                                   engine tier
- ``asof_keyless_serial``        — time_buckets=1 (x100 only): what
                                   keyless as-of would cost WITHOUT
                                   the range-bucketed tier
- ``band_4zone_plain``           — SMJ on a 4-value equi key (x100
                                   only): per-key pair buffering
- ``band_4zone_bucketed``        — bucket='hour': the (4 × #buckets)-
                                   way shuffle documented in band.py

Every timed run's consumer is a tiny exact aggregate over INT64
payloads (count / matched-count / sums), which doubles as the
correctness crosscheck: the parent asserts plain == bucketed per
scale (same data, independent plans), left-row conservation
(n == n_left for left-preserving as-of), and keyless grid independence
(time_buckets=256 vs 101, one extra untimed child per scale). The
bucket-carry seam's model-sizedness is verified numerically: each
bucketed child counts the distinct (key, time-bucket) cells feeding
the carry table — capped at n_keys × time_buckets regardless of row
count — and the parent asserts the cap held at both scales.

Merges per-variant into BENCHHEAVY_sf10.json under ``joins_x100``
(crash-safe: a dead child loses only its own rep).

Usage:
  python tools/probe_joins.py                  # full protocol
  python tools/probe_joins.py VARIANT ...      # restrict variants
  python tools/probe_joins.py --child V MULT BUCKETS OUT  # one rep
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/sfgen/joins_x100"
_GEN_SEED = 20260816
_GEN_VERSION = 1  # bump on ANY generator change → regenerates corpora
T0_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in epoch-µs
ZONES = ["LZ_HOUSTON", "LZ_NORTH", "LZ_SOUTH", "LZ_WEST"]
ZONE_W = [0.45, 0.30, 0.15, 0.10]  # the reference's real load skew shape
REPS = 3
SCALES = (100, 1000)
DEFAULT_BUCKETS = 256

# variant -> scales it runs at (degenerates capped at x100: their
# x1000 cost is the extrapolation the x100 number exists to justify)
VARIANTS: dict[str, tuple[int, ...]] = {
    "asof_keyed_highcard": SCALES,
    "asof_keyed_4zone_plain": SCALES,
    "asof_keyed_4zone_bucketed": SCALES,
    "asof_keyless": SCALES,
    "asof_keyless_serial": (100,),
    "band_highcard": SCALES,
    "band_4zone_plain": (100,),
    "band_4zone_bucketed": SCALES,
}


def _sizes(mult: int) -> dict:
    n_left = 100_000 * mult
    range_sec = 86_400 * mult  # density constant: matches/left-row ~O(1)
    return {
        "n_left": n_left,
        "n_right": n_left // 5,
        "n_uids": n_left // 100,
        "n_tiles_per_zone": range_sec // 900,
        "range_sec": range_sec,
    }


def _manifest(mult: int) -> dict:
    return {"mult": mult, "seed": _GEN_SEED, "version": _GEN_VERSION,
            **_sizes(mult)}


def _write_chunked(path: str, n: int, make_chunk, chunk_rows: int = 2_000_000) -> None:
    os.makedirs(path, exist_ok=True)
    k = 0
    for lo in range(0, n, chunk_rows):
        hi = min(n, lo + chunk_rows)
        pq.write_table(make_chunk(lo, hi), os.path.join(path, f"part{k:04d}.parquet"))
        k += 1


def gen_dir(mult: int) -> str:
    d = os.path.join(BASE, f"x{mult}")
    mpath = os.path.join(d, "manifest.json")
    want = _manifest(mult)
    if os.path.exists(mpath):
        try:
            if json.load(open(mpath)) == want:
                print(f"x{mult}: reusing {d}", file=sys.stderr)
                return d
        except Exception:
            pass
        print(f"x{mult}: manifest mismatch — regenerating", file=sys.stderr)
        import shutil

        shutil.rmtree(d, ignore_errors=True)
    s = _sizes(mult)
    rng = np.random.default_rng(_GEN_SEED + mult)
    range_us = s["range_sec"] * 1_000_000
    zone_arr = np.array(ZONES)

    def ts_col(n: int) -> pa.Array:
        return pa.array(
            T0_US + rng.integers(0, range_us, size=n),
            type=pa.timestamp("us", tz="UTC"),
        )

    def left_chunk(lo: int, hi: int) -> pa.Table:
        n = hi - lo
        return pa.table(
            {
                "uid": rng.integers(0, s["n_uids"], size=n),
                "zone": pa.array(zone_arr[rng.choice(4, size=n, p=ZONE_W)]),
                "ts": ts_col(n),
                "lv": rng.integers(0, 1_000_000, size=n),
            }
        )

    def right_chunk(lo: int, hi: int) -> pa.Table:
        n = hi - lo
        return pa.table(
            {
                "uid": rng.integers(0, s["n_uids"], size=n),
                "zone": pa.array(zone_arr[rng.choice(4, size=n, p=ZONE_W)]),
                "ts": ts_col(n),
                "rv": rng.integers(0, 1_000_000, size=n),
            }
        )

    def windows_chunk(lo: int, hi: int) -> pa.Table:
        # one 1-day window per uid (the orders/order-window shape)
        n = hi - lo
        start = T0_US + rng.integers(0, max(1, range_us - 86_400_000_000), size=n)
        return pa.table(
            {
                "uid": np.arange(lo, hi, dtype=np.int64),
                "w_start": pa.array(start, type=pa.timestamp("us", tz="UTC")),
                "w_end": pa.array(
                    start + 86_400_000_000, type=pa.timestamp("us", tz="UTC")
                ),
                "wv": rng.integers(0, 1_000_000, size=n),
            }
        )

    def tiles_chunk(lo: int, hi: int) -> pa.Table:
        # contiguous 900 s tiling per zone (the real SPP interval
        # shape): row i = (zone i % 4, interval i // 4). Inclusive-end
        # band semantics → end = start + 900 s − 1 µs, no double-match.
        idx = np.arange(lo, hi, dtype=np.int64)
        start = T0_US + (idx // 4) * 900_000_000
        return pa.table(
            {
                "zone": pa.array(zone_arr[idx % 4]),
                "i_start": pa.array(start, type=pa.timestamp("us", tz="UTC")),
                "i_end": pa.array(
                    start + 900_000_000 - 1, type=pa.timestamp("us", tz="UTC")
                ),
                "iv": rng.integers(0, 1_000_000, size=hi - lo),
            }
        )

    t0 = time.time()
    _write_chunked(os.path.join(d, "left"), s["n_left"], left_chunk)
    _write_chunked(os.path.join(d, "right"), s["n_right"], right_chunk)
    _write_chunked(os.path.join(d, "windows"), s["n_uids"], windows_chunk)
    _write_chunked(
        os.path.join(d, "tiles"), 4 * s["n_tiles_per_zone"], tiles_chunk
    )
    with open(mpath, "w") as fh:
        json.dump(want, fh, indent=1, sort_keys=True)
    print(f"x{mult}: generated in {time.time() - t0:.0f}s", file=sys.stderr)
    return d


def _effective_buckets(variant: str, buckets: int) -> int | None:
    """The time_buckets value the measured plan ACTUALLY uses: None for
    variants whose plan ignores the knob entirely (plain keyed window,
    band joins — band_4zone_bucketed's real knob is bucket='hour'), 1
    for the serial keyless variant, the CLI value for the bucketed
    tiers. Single source of truth so the artifact can never again
    document a configuration the plan never used (r18 review rounds 1
    finding #3 and 2 finding #3)."""
    if variant in ("asof_keyless", "asof_keyed_4zone_bucketed"):
        return buckets
    if variant == "asof_keyless_serial":
        return 1
    return None


def _build(spark, d: str, variant: str, buckets: int):
    """The plan under test + its exact-aggregate consumer."""
    from pyspark.sql import functions as F

    from energydatalake_spark.operators.asof import asof_join
    from energydatalake_spark.operators.band import band_join

    left = spark.read.parquet(os.path.join(d, "left"))
    right = spark.read.parquet(os.path.join(d, "right"))

    def agg(j, matched_col):
        return j.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(matched_col).alias("n_matched"),
            F.sum(matched_col).alias("sum_matched"),
            F.sum("lv").alias("sum_lv"),
        )

    if variant == "asof_keyed_highcard":
        j = asof_join(
            left.select("uid", "ts", "lv"),
            right.select("uid", "ts", "rv"),
            on="ts",
            by=["uid"],
        )
        return agg(j, "rv")
    if variant in ("asof_keyed_4zone_plain", "asof_keyed_4zone_bucketed"):
        j = asof_join(
            left.select("zone", "ts", "lv"),
            right.select("zone", "ts", "rv"),
            on="ts",
            by=["zone"],
            time_buckets=buckets,
            bucket_by_time=variant.endswith("bucketed"),
        )
        return agg(j, "rv")
    if variant in ("asof_keyless", "asof_keyless_serial"):
        j = asof_join(
            left.select("ts", "lv"),
            right.select("ts", "rv"),
            on="ts",
            time_buckets=1 if variant.endswith("serial") else buckets,
        )
        return agg(j, "rv")
    if variant == "band_highcard":
        w = spark.read.parquet(os.path.join(d, "windows"))
        j = band_join(
            left.select("uid", "ts", "lv"),
            w,
            left_ts="ts",
            right_start="w_start",
            right_end="w_end",
            on=["uid"],
        )
        return agg(j, "wv")
    if variant in ("band_4zone_plain", "band_4zone_bucketed"):
        tiles = spark.read.parquet(os.path.join(d, "tiles"))
        j = band_join(
            left.select("zone", "ts", "lv"),
            tiles,
            left_ts="ts",
            right_start="i_start",
            right_end="i_end",
            on=["zone"],
            bucket="hour" if variant.endswith("bucketed") else None,
        )
        return agg(j, "iv")
    raise ValueError(f"unknown variant {variant!r}")


def _seam_cells(spark, d: str, variant: str, buckets: int) -> dict | None:
    """Count the distinct (key, time-bucket) cells that feed the
    edge-carry seam — the operator's only cross-bucket state. Uses the
    operator's own bucket arithmetic (global min/max over the union
    axis via the operator's ``_axis_double``, fixed-width division) —
    ADVICE r18: the axis expression is imported, not re-implemented,
    so if the operator's axis handling ever changes (e.g.
    TIMESTAMP_NTZ routing through a session-tz cast) this diagnostic
    counts the SAME grid the plan uses. Model-sized claim: cells ≤
    n_keys × time_buckets no matter how many rows the inputs grow
    to."""
    if variant not in (
        "asof_keyed_4zone_bucketed",
        "asof_keyless",
        "asof_keyless_serial",
    ):
        return None
    from pyspark.sql import functions as F

    from energydatalake_spark.operators.asof import _axis_double

    left = spark.read.parquet(os.path.join(d, "left"))
    right = spark.read.parquet(os.path.join(d, "right"))
    axis = _axis_double(right, F.col("ts"), "ts")
    lo, hi = (
        left.select("ts")
        .unionByName(right.select("ts"))
        .agg(F.min(axis), F.max(axis))
        .collect()[0]
    )
    n_b = 1 if variant.endswith("serial") else buckets
    width = (hi - lo) / n_b
    bucket = F.least(
        F.lit(n_b - 1), F.floor((axis - F.lit(lo)) / F.lit(width)).cast("int")
    )
    keys = ["zone"] if variant.startswith("asof_keyed") else []
    cells = (
        right.select(*keys, bucket.alias("b"))
        .distinct()
        .count()
    )
    n_keys = 4 if keys else 1
    return {"seam_cells": cells, "seam_cap": n_keys * n_b,
            "within_cap": cells <= n_keys * n_b}


def run_child(variant: str, mult: int, buckets: int, out_path: str) -> None:
    from energydatalake_spark.session import get_spark

    spark = get_spark(f"probe_joins_{variant}_x{mult}")
    warm_dir = os.path.join(BASE, "x1")
    # warm: the SAME plan shape at x1, untimed (codegen/JIT/scan setup)
    _build(spark, warm_dir, variant, buckets).collect()
    d = os.path.join(BASE, f"x{mult}")
    t0 = time.perf_counter()
    row = _build(spark, d, variant, buckets).collect()[0]
    wall = round(time.perf_counter() - t0, 3)
    result = {
        "variant": variant,
        "mult": mult,
        "time_buckets": _effective_buckets(variant, buckets),
        "wall_sec": wall,
        "agg": {
            "n": row["n"],
            "n_matched": row["n_matched"],
            "sum_matched": int(row["sum_matched"]) if row["sum_matched"] is not None else None,
            "sum_lv": int(row["sum_lv"]),
        },
    }
    seam = _seam_cells(spark, d, variant, buckets)
    if seam:
        result["seam"] = seam
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


def run_spill_check(variant: str, mult: int, buckets: int) -> dict:
    """Diagnostic (NOT part of the timed family — the UI adds ~1-2 %
    overhead): run one variant once with the Spark UI enabled and sum
    the completed stages' spill/shuffle bytes from the REST API, to
    turn the r18.10 'x3000 crosses the 16 g heap so it spills' claim
    from arithmetic into an observed number. The tiny x1 warm run's
    stages are included in the sums (negligible by construction)."""
    import urllib.request

    from energydatalake_spark.session import get_spark

    spark = get_spark(
        f"spill_{variant}_x{mult}", extra_conf={"spark.ui.enabled": "true"}
    )
    _build(spark, os.path.join(BASE, "x1"), variant, buckets).collect()
    t0 = time.perf_counter()
    _build(spark, os.path.join(BASE, f"x{mult}"), variant, buckets).collect()
    wall = round(time.perf_counter() - t0, 3)
    base = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=COMPLETE"
        )
    )
    gib = 1024.0**3
    out = {
        "variant": variant,
        "mult": mult,
        "wall_sec_ui_on": wall,
        "n_stages": len(stages),
        "memory_spilled_gib": round(
            sum(s.get("memoryBytesSpilled", 0) for s in stages) / gib, 2
        ),
        "disk_spilled_gib": round(
            sum(s.get("diskBytesSpilled", 0) for s in stages) / gib, 2
        ),
        "shuffle_write_gib": round(
            sum(s.get("shuffleWriteBytes", 0) for s in stages) / gib, 2
        ),
    }
    print(json.dumps(out))
    return out


def _merge(section: dict) -> None:
    """Deep-merge into BENCHHEAVY joins_x100: per-scale manifests merge
    by key (a LATER run at a new scale extends the section; only a
    CHANGED manifest for an overlapping scale drops stale variants),
    and per-variant dicts merge field-wise so an x3000 extension run
    adds runs_x3000/t_x3000 beside the existing x100/x1000 fields.
    Cross-decade alphas are (re)computed from whatever medians exist
    after the merge."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "BENCHHEAVY_sf10.json")
    prior = {}
    if os.path.exists(path):
        try:
            prior = json.load(open(path))
        except Exception:
            prior = {}
    prev = prior.get("joins_x100", {})
    pm = prev.get("manifest", {})
    nm = section["manifest"]
    if any(k in pm and pm[k] != nm[k] for k in nm):
        prev, pm = {}, {}  # corpus changed at an overlapping scale
    prev["manifest"] = {**pm, **nm}
    for k, v in section.items():
        if k == "manifest":
            continue
        if isinstance(v, dict) and isinstance(prev.get(k), dict):
            old_scales = prev[k].get("scales")
            prev[k] = {**prev[k], **v}
            if old_scales and v.get("scales"):
                prev[k]["scales"] = sorted(set(old_scales) | set(v["scales"]))
        else:
            prev[k] = v
    for v in prev.values():
        if not isinstance(v, dict) or "reps" not in v:
            continue
        for lo, hi in ((100, 1000), (1000, 3000)):
            if f"t_x{lo}" in v and f"t_x{hi}" in v:
                v[f"alpha_x{lo}_x{hi}"] = round(
                    float(
                        np.log10(v[f"t_x{hi}"] / v[f"t_x{lo}"])
                        / np.log10(hi / lo)
                    ),
                    3,
                )
    prior["joins_x100"] = prev
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(prior, fh, indent=1, sort_keys=True)
        fh.write("\n")
    os.replace(tmp, path)


def main() -> None:
    if "--spill-check" in sys.argv:
        i = sys.argv.index("--spill-check")
        variant, mult = sys.argv[i + 1], int(sys.argv[i + 2])
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
        # same manifest-gated corpus guarantee as the timed path (r18
        # review round 2 #1: reading whatever is on disk would crash on
        # a clean machine or silently measure a stale corpus)
        gen_dir(1)
        gen_dir(mult)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        path = os.path.join(repo, "BENCHHEAVY_sf10.json")
        prior = json.load(open(path)) if os.path.exists(path) else {}
        recorded = (
            prior.get("joins_x100", {}).get("manifest", {}).get(str(mult))
        )
        if recorded is not None and recorded != _manifest(mult):
            raise SystemExit(
                f"joins_x100 manifest for x{mult} is stale vs the current "
                "generator — re-run the timed protocol before recording "
                "spill diagnostics beside it"
            )
        out = run_spill_check(variant, mult, DEFAULT_BUCKETS)
        sect = prior.setdefault("joins_x100", {}).setdefault(variant, {})
        sect[f"spill_x{mult}"] = {
            k: v for k, v in out.items() if k not in ("variant", "mult")
        }
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(prior, fh, indent=1, sort_keys=True)
            fh.write("\n")
        os.replace(tmp, path)
        return
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        variant, mult, buckets, out = (
            sys.argv[i + 1],
            int(sys.argv[i + 2]),
            int(sys.argv[i + 3]),
            sys.argv[i + 4],
        )
        run_child(variant, mult, buckets, out)
        return

    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    variants = {v: s for v, s in VARIANTS.items() if not only or v in only}
    unknown = [v for v in only if v not in VARIANTS]
    if unknown:
        raise SystemExit(f"unknown variants: {unknown} (have {list(VARIANTS)})")
    if "--fifth" in sys.argv:
        # Fifth-decade extension: x3000 (300M left + 60M right). The
        # no-args default covers the SCALE paths only — the
        # degenerates' x3000 cost is the extrapolation their
        # x100/x1000 numbers justify skipping (plain band SMJ ~hours).
        # EXPLICITLY named variants run regardless (e.g. paying ~40 min
        # to replace the 4-zone plain window's ~750 s extrapolation
        # with a measurement). Results deep-merge beside the existing
        # x100/x1000 fields.
        default_fifth = (
            "asof_keyed_highcard",
            "asof_keyed_4zone_bucketed",
            "asof_keyless",
            "band_highcard",
            "band_4zone_bucketed",
        )
        variants = {
            v: (3000,)
            for v in variants
            if (v in only) or (not only and v in default_fifth)
        }

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    gen_dir(1)  # warm-up corpus
    for m in sorted({m for s in variants.values() for m in s}):
        gen_dir(m)

    results: dict[str, dict] = {}
    for variant, scales in variants.items():
        entry: dict = {
            "scales": list(scales),
            "reps": REPS,
            "time_buckets": _effective_buckets(variant, DEFAULT_BUCKETS),
        }
        for mult in scales:
            walls, aggs, seams = [], [], []
            for rep in range(REPS):
                out = os.path.join(BASE, f"res_{variant}_x{mult}_r{rep}.json")
                if os.path.exists(out):
                    os.unlink(out)
                rc = subprocess.call(
                    [
                        sys.executable,
                        os.path.abspath(__file__),
                        "--child",
                        variant,
                        str(mult),
                        str(DEFAULT_BUCKETS),
                        out,
                    ]
                )
                if rc != 0 or not os.path.exists(out):
                    print(
                        f"{variant} x{mult} rep{rep}: child rc={rc}; skipping",
                        file=sys.stderr,
                    )
                    continue
                r = json.load(open(out))
                walls.append(r["wall_sec"])
                aggs.append(r["agg"])
                if "seam" in r:
                    seams.append(r["seam"])
                print(
                    f"== {variant} x{mult} rep{rep}: {r['wall_sec']}s "
                    f"agg={r['agg']}",
                    file=sys.stderr,
                )
            if not walls:
                continue
            if any(a != aggs[0] for a in aggs[1:]):
                print(
                    f"!! {variant} x{mult}: reps DISAGREE on the exact "
                    f"aggregate — refusing to merge this variant",
                    file=sys.stderr,
                )
                entry[f"x{mult}_nondeterministic"] = aggs
                continue
            entry[f"runs_x{mult}"] = walls
            entry[f"t_x{mult}"] = round(statistics.median(walls), 3)
            entry[f"agg_x{mult}"] = aggs[0]
            if seams:
                entry[f"seam_x{mult}"] = seams[0]
        if "t_x100" in entry and "t_x1000" in entry:
            entry["alpha_x100_x1000"] = round(
                float(np.log10(entry["t_x1000"] / entry["t_x100"])), 3
            )
        results[variant] = entry

    # keyless grid independence: one extra untimed child per scale at
    # a different bucket count — results must be identical
    grid_checks = {}
    if "asof_keyless" in results:
        for mult in variants["asof_keyless"]:
            key = f"agg_x{mult}"
            if key not in results["asof_keyless"]:
                continue
            out = os.path.join(BASE, f"res_gridcheck_x{mult}.json")
            if os.path.exists(out):
                os.unlink(out)
            rc = subprocess.call(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--child",
                    "asof_keyless",
                    str(mult),
                    "101",
                    out,
                ]
            )
            if rc == 0 and os.path.exists(out):
                alt = json.load(open(out))["agg"]
                grid_checks[f"keyless_grid_independent_x{mult}"] = (
                    alt == results["asof_keyless"][key]
                )

    checks = dict(grid_checks)
    for mult in SCALES:
        a = results.get("asof_keyed_4zone_plain", {}).get(f"agg_x{mult}")
        b = results.get("asof_keyed_4zone_bucketed", {}).get(f"agg_x{mult}")
        if a is not None and b is not None:
            checks[f"asof_4zone_plain_eq_bucketed_x{mult}"] = a == b
        bp = results.get("band_4zone_plain", {}).get(f"agg_x{mult}")
        bb = results.get("band_4zone_bucketed", {}).get(f"agg_x{mult}")
        if bp is not None and bb is not None:
            checks[f"band_4zone_plain_eq_bucketed_x{mult}"] = bp == bb
    ks = results.get("asof_keyless_serial", {}).get("agg_x100")
    kb = results.get("asof_keyless", {}).get("agg_x100")
    if ks is not None and kb is not None:
        checks["keyless_serial_eq_bucketed_x100"] = ks == kb
    # left-row conservation for the left-preserving as-of variants
    for v in (
        "asof_keyed_highcard",
        "asof_keyed_4zone_plain",
        "asof_keyed_4zone_bucketed",
        "asof_keyless",
    ):
        for mult in variants.get(v, ()):
            a = results.get(v, {}).get(f"agg_x{mult}")
            if a is not None:
                checks[f"{v}_left_preserved_x{mult}"] = (
                    a["n"] == _sizes(mult)["n_left"]
                )

    ran_scales = sorted({m for s in variants.values() for m in s})
    section = {
        # the scales THIS run generated/used (r18 review: --fifth runs
        # at x3000 but (1, *SCALES) recorded only 1/100/1000, leaving
        # 300M-row timings with no recorded corpus manifest)
        "manifest": {str(m): _manifest(m) for m in (1, *ran_scales)},
        "protocol": (
            f"{REPS} fresh-JVM reps per (variant, scale), warm-then-timed "
            f"(same plan at x1 untimed first), medians reported; exact "
            f"int64 aggregates double as cross-implementation checks; "
            f"driver {os.environ['SPARK_GRAFT_DRIVER_MEM']}, default codec"
        ),
        "checks": checks,
        **results,
    }
    _merge(section)
    bad = {k: v for k, v in checks.items() if v is not True}
    print(json.dumps({"checks_failed": bad, "n_checks": len(checks)}))
    if bad:
        sys.exit(4)


if __name__ == "__main__":
    main()
