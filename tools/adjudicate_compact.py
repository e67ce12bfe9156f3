"""Multi-run adjudication of the compact LSH rerank's scaling exponent
(VERDICT r14 #1): the r14 gate-forced-off A/B measured int8 at
α(x100→x300) = 1.70 from ONE fresh-JVM run per width, against a 1.37
output floor and 1.08 candidate growth — by the repo's own r12 rule a
single run cannot adjudicate a borderline exponent (substring_dedup's
1.67 turned out to be spill lottery across a 68.6–177.1 s draw).

This tool settles it: N fresh-JVM, quiet-machine timing runs per scale
(default 3 × x100 + 3 × x300, gate forced off via
SPARK_GRAFT_ND_BCAST_MAX=0, same warm-then-timed protocol as
tools/scale_probe.py), plus one instrumented run per scale counting
candidates / margin-filter survivors / output pairs (the r15
per-vector-margin survivor band). Results merge into
BENCHHEAVY_sf10.json under queries_third_lsh_compact.

Usage:
  python tools/adjudicate_compact.py               # full adjudication
  python tools/adjudicate_compact.py --runs 4      # more timing runs
  python tools/adjudicate_compact.py --child-time 100       # internal
  python tools/adjudicate_compact.py --child-survivors 300  # internal
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

MULTS = (100, 300)
RESULT_TAG = "adjudication-json:"


def _probe_dir(mult: int) -> str:
    import scale_probe as sp

    return sp._gen_dir("/tmp/sfgen/probe100", mult, heaps=False)


def _child_env() -> dict[str, str]:
    env = dict(os.environ)
    env["SPARK_GRAFT_ND_BCAST_MAX"] = "0"  # force the compact tier
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    return env


def child_time(mult: int) -> None:
    os.environ["SPARK_GRAFT_ND_BCAST_MAX"] = "0"
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    d = _probe_dir(mult)
    from energydatalake_spark.plans.registry import QUERIES
    from energydatalake_spark.session import get_spark
    from energydatalake_spark.similarity.neardup import release_quantized_cache

    spark = get_spark("adjudicate_compact")
    q = QUERIES["dedup_embedding_lsh"]
    q.build(spark, d).collect()  # warm (scale_probe protocol)
    release_quantized_cache()
    t0 = time.perf_counter()
    n = len(q.build(spark, d).collect())
    t = time.perf_counter() - t0
    release_quantized_cache()
    print(RESULT_TAG + json.dumps({"mult": mult, "t": round(t, 4), "rows": n}))


def child_survivors(mult: int) -> None:
    os.environ["SPARK_GRAFT_ND_BCAST_MAX"] = "0"
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    d = _probe_dir(mult)
    from energydatalake_spark.io.readers import read_table
    from energydatalake_spark.plans import llm_ops
    from energydatalake_spark.session import get_spark
    from energydatalake_spark.similarity.neardup import embedding_near_dup_lsh

    spark = get_spark("adjudicate_compact_survivors")
    n = llm_ops._parquet_rows(d, "embeddings")
    stats: dict = {}
    out = embedding_near_dup_lsh(
        read_table(spark, d, "embeddings"),
        threshold=llm_ops.ND_THRESHOLD,
        n_planes=llm_ops._nd_lsh_planes(n),
        dim=llm_ops.LSH_DIM,
        n_tables=llm_ops.ND_LSH_TABLES,
        compact_rerank=True,
        _compact_stats=stats,
    )
    true_pairs = out.count()
    survivors = stats["survivors"].count()
    candidates = stats["candidates"].count()
    print(
        RESULT_TAG
        + json.dumps(
            {
                "mult": mult,
                "true_pairs": true_pairs,
                "survivors": survivors,
                "candidates": candidates,
                "band": round(survivors / max(1, true_pairs), 3),
            }
        )
    )


def _run_child(args: list[str]) -> dict | None:
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__)] + args,
        env=_child_env(),
        capture_output=True,
        text=True,
    )
    for line in p.stdout.splitlines():
        if line.startswith(RESULT_TAG):
            return json.loads(line[len(RESULT_TAG):])
    print(
        f"child {args} produced no result (rc={p.returncode});"
        f" stderr tail: {p.stderr[-800:]}",
        file=sys.stderr,
    )
    return None


def _alpha(t_lo: float, t_hi: float) -> float:
    return math.log(t_hi / t_lo) / math.log(MULTS[1] / MULTS[0])


def main() -> None:
    if "--child-time" in sys.argv:
        child_time(int(sys.argv[sys.argv.index("--child-time") + 1]))
        return
    if "--child-survivors" in sys.argv:
        child_survivors(int(sys.argv[sys.argv.index("--child-survivors") + 1]))
        return
    runs = (
        int(sys.argv[sys.argv.index("--runs") + 1])
        if "--runs" in sys.argv
        else 3
    )

    times: dict[int, list[float]] = {m: [] for m in MULTS}
    for m in MULTS:
        for i in range(runs):
            r = _run_child(["--child-time", str(m)])
            if r:
                times[m].append(r["t"])
                print(f"x{m} run {i + 1}/{runs}: {r['t']:.1f}s ({r['rows']} pairs)")
    bands = {}
    for m in MULTS:
        r = _run_child(["--child-survivors", str(m)])
        if r:
            bands[m] = r
            print(
                f"x{m} survivors: {r['survivors']:,} / true {r['true_pairs']:,}"
                f" = band {r['band']}x (candidates {r['candidates']:,})"
            )

    if not (times[100] and times[300]):
        print("FATAL: missing timing runs; nothing merged", file=sys.stderr)
        sys.exit(1)
    med = {m: sorted(ts)[len(ts) // 2] for m, ts in times.items()}
    entry = {
        "runs_t_x100": times[100],
        "runs_t_x300": times[300],
        "t_x100": med[100],
        "t_x300": med[300],
        "alpha_median": round(_alpha(med[100], med[300]), 3),
        "alpha_min": round(_alpha(max(times[100]), min(times[300])), 3),
        "alpha_max": round(_alpha(min(times[100]), max(times[300])), 3),
    }
    for m in MULTS:
        if m in bands:
            b = bands[m]
            entry[f"survivor_band_x{m}"] = {
                "survivors": b["survivors"],
                "true_pairs": b["true_pairs"],
                "ratio": b["band"],
            }
    if 100 in bands and 300 in bands:
        entry["survivors_growth_alpha"] = round(
            _alpha(bands[100]["survivors"], bands[300]["survivors"]), 3
        )
        entry["output_growth_alpha"] = round(
            _alpha(bands[100]["true_pairs"], bands[300]["true_pairs"]), 3
        )
        entry["candidate_growth_alpha"] = round(
            _alpha(bands[100]["candidates"], bands[300]["candidates"]), 3
        )

    path = os.path.join(REPO, "BENCHHEAVY_sf10.json")
    with open(path) as fh:
        doc = json.load(fh)
    doc.setdefault("queries_third_lsh_compact", {})[
        "dedup_embedding_lsh_int8_pv_r15"
    ] = entry
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
        fh.write("\n")
    os.replace(tmp, path)
    print(f"merged into {path}")
    print(json.dumps(entry, indent=1))


if __name__ == "__main__":
    main()
