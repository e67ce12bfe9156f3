"""Bracket simhash_pairs' fourth-decade exponent (VERDICT r16 #2).

The r16 BENCHHEAVY entry (queries_fourth.simhash_pairs, alpha 0.226)
was a SINGLE warm-then-timed run with both scales sharing one JVM, and
its own note flags the exponent as variance-caveated. This tool runs
the r15.4 adjudication protocol: 3 fresh-JVM quiet-machine reps PER
SCALE (x300, x1000 on the standing saturated corpora, manifest-gated
reuse), warm-then-timed inside each child, zstd shuffle codec (the
fourth-decade standard, apples-to-apples with the r16 numbers), alpha
recomputed from per-scale MEDIANS with the min/max envelope disclosed.

Updates BENCHHEAVY_sf10.json queries_fourth.simhash_pairs in place:
t_x300/t_x1000 become the per-scale medians, the per-rep values land
in runs_x300/runs_x1000, and the variance note is replaced with the
measured spread.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERY = "simhash_pairs"
BASE = "/tmp/sfgen/probe100"
SCALES = (300, 1000)
REPS = 3


def child(scale: int) -> None:
    """One fresh JVM: warm run, scratch reclaim, timed run (with the
    standing 5 s scratch sampler — same measurement class as the r16
    number, disclosed via scratch_sampled)."""
    import threading

    from tools.scale_probe import _gen_dir

    from energydatalake_spark import release_caches
    from energydatalake_spark.plans.registry import QUERIES
    from energydatalake_spark.session import get_spark

    sf_dir = _gen_dir(BASE, scale, heaps=False)
    spark = get_spark(
        "bracket_simhash",
        extra_conf={"spark.io.compression.codec": "zstd"},
    )

    import glob as _glob
    import tempfile as _tempfile

    roots = [
        p
        for p in os.environ.get("SPARK_LOCAL_DIRS", "").split(",")
        if p.strip()
    ]
    try:
        roots.append(spark.conf.get("spark.local.dir"))
    except Exception:
        pass
    roots = [r.strip() for r in roots if r and r.strip()] or [
        _tempfile.gettempdir()
    ]

    def scratch_bytes() -> int:
        n = 0
        for root_dir in dict.fromkeys(roots):
            for d in _glob.glob(os.path.join(root_dir, "blockmgr-*")):
                for r, _ds, files in os.walk(d):
                    for f in files:
                        try:
                            n += os.path.getsize(os.path.join(r, f))
                        except OSError:
                            pass
        return n

    def reclaim() -> None:
        deadline = time.time() + 120
        prev, stable = None, 0
        while time.time() < deadline:
            spark.sparkContext._jvm.System.gc()
            time.sleep(3)
            cur = scratch_bytes()
            if cur < 1 << 30:
                break
            stable = stable + 1 if (prev is not None and cur >= prev) else 0
            if stable >= 2:
                break
            prev = cur

    QUERIES[QUERY].build(spark, sf_dir).collect()  # warm
    release_caches()
    reclaim()

    peak = [0]
    stop = threading.Event()

    def sample() -> None:
        while not stop.is_set():
            try:
                peak[0] = max(peak[0], scratch_bytes())
            except Exception:
                pass
            stop.wait(5.0)

    th = threading.Thread(target=sample, daemon=True)
    th.start()
    t0 = time.perf_counter()
    QUERIES[QUERY].build(spark, sf_dir).collect()
    elapsed = time.perf_counter() - t0
    stop.set()
    th.join(timeout=10)
    peak[0] = max(peak[0], scratch_bytes())
    print(
        json.dumps(
            {"t": round(elapsed, 4), "peak_gb": round(peak[0] / 2**30, 2)}
        )
    )


def main() -> None:
    if "--child" in sys.argv:
        child(int(sys.argv[sys.argv.index("--child") + 1]))
        return

    import math

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    runs: dict[int, list[float]] = {s: [] for s in SCALES}
    peaks: dict[int, float] = {s: 0.0 for s in SCALES}
    for rep in range(REPS):
        for scale in SCALES:
            print(f"== rep {rep + 1}/{REPS} x{scale}", file=sys.stderr)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 str(scale)],
                capture_output=True, text=True,
            )
            line = out.stdout.strip().splitlines()[-1] if out.stdout else ""
            try:
                d = json.loads(line)
            except Exception:
                print(
                    f"child x{scale} rep{rep} failed: "
                    f"{out.stderr[-500:]}",
                    file=sys.stderr,
                )
                continue
            runs[scale].append(d["t"])
            peaks[scale] = max(peaks[scale], d["peak_gb"])
            print(f"   t={d['t']}s peak={d['peak_gb']}G", file=sys.stderr)

    if not all(runs[s] for s in SCALES):
        print("missing runs; not updating artifact", file=sys.stderr)
        sys.exit(1)
    med = {s: statistics.median(runs[s]) for s in SCALES}
    a, b = SCALES
    alpha = math.log(med[b] / med[a]) / math.log(b / a)
    env = [
        math.log(tb / ta) / math.log(b / a)
        for ta in runs[a]
        for tb in runs[b]
    ]

    from tools.scale_probe import _manifest_stamp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "BENCHHEAVY_sf10.json")
    prior = json.load(open(path))
    entry = prior.get("queries_fourth", {}).get(QUERY, {})
    entry.update(
        {
            "t_x300": round(med[300], 4),
            "t_x1000": round(med[1000], 4),
            "runs_x300": runs[300],
            "runs_x1000": runs[1000],
            "alpha_x300_x1000": round(alpha, 3),
            "alpha_envelope": [round(min(env), 3), round(max(env), 3)],
            "codec": "zstd",
            "scratch_sampled": True,
            "scratch_peak_gb": {
                "x300": peaks[300],
                "x1000": peaks[1000],
            },
            "gen": _manifest_stamp(False, SCALES),
            "note": (
                f"BRACKETED r17 (VERDICT r16 #2, r15.4 protocol): {REPS} "
                "fresh-JVM warm-then-timed reps per scale, alpha from "
                "per-scale medians, envelope = all cross-rep pairs. "
                "Replaces the r16 single-run alpha 0.226 whose own note "
                "carried the variance caveat."
            ),
        }
    )
    prior.setdefault("queries_fourth", {})[QUERY] = entry
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(prior, fh, indent=1, sort_keys=True)
        fh.write("\n")
    os.replace(tmp, path)
    print(
        f"alpha(median)={alpha:.3f} envelope={min(env):.3f}..{max(env):.3f} "
        f"med_x300={med[300]:.1f}s med_x1000={med[1000]:.1f}s"
    )


if __name__ == "__main__":
    main()
