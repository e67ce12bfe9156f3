"""End-to-end wall-time for the 120-bit two-slice SimHash tier at x100
(VERDICT r14 #8): the tier's r14 evidence was component-wise — 3,567×
candidate-mass cut (16.56M → 4,642 at 500k docs) for ~1.6× fingerprint
cost — but no single number showed the wider vote aggregate paying for
itself end-to-end on a corpus that actually hits the 60-bit ceiling.

One fresh JVM per config (60-bit/15-bit-band registry geometry vs
120-bit/30-bit-band wide tier), warm-then-timed on the saturated x100
corpus, merged into BENCHHEAVY_sf10.json as ``simhash_wide_x100_e2e``.
NOTE the two configs compute DIFFERENT pair sets by design (hamming ≤ 3
over 120 bits is stricter than over 60) — this is a cost comparison of
the banding regimes, not an output-parity check (the lo-word identity
and python-model twin tests pin correctness).

Usage:
  python tools/probe_simhash_wide.py            # both configs + merge
  python tools/probe_simhash_wide.py --child 60 # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

RESULT_TAG = "simhash-wide-json:"


def child(bits: int) -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    import scale_probe as sp

    d = sp._gen_dir("/tmp/sfgen/probe100", 100, heaps=False)
    from energydatalake_spark.io.readers import read_table
    from energydatalake_spark.plans import llm_ops
    from energydatalake_spark.session import get_spark
    from energydatalake_spark.text.dedup import simhash_pairs

    spark = get_spark("probe_simhash_wide")
    band_bits = 30 if bits == 120 else llm_ops.SHP_BAND_BITS

    def run() -> tuple[float, int]:
        t0 = time.perf_counter()
        n = (
            simhash_pairs(
                read_table(spark, d, "documents"),
                bits=bits,
                max_hamming=llm_ops.SP_MAX_HAMMING,
                band_bits=band_bits,
                n=llm_ops.SH_N,
            ).count()
        )
        return time.perf_counter() - t0, n

    run()  # warm (scale_probe protocol: fresh JVM, time the 2nd run)
    t, n = run()
    print(
        RESULT_TAG
        + json.dumps(
            {"bits": bits, "band_bits": band_bits, "t": round(t, 4), "pairs": n}
        )
    )


def main() -> None:
    if "--child" in sys.argv:
        child(int(sys.argv[sys.argv.index("--child") + 1]))
        return
    results = {}
    for bits in (60, 120):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(bits)],
            capture_output=True,
            text=True,
        )
        for line in p.stdout.splitlines():
            if line.startswith(RESULT_TAG):
                r = json.loads(line[len(RESULT_TAG):])
                results[f"bits{bits}"] = r
                print(f"bits={bits}: {r['t']:.1f}s, {r['pairs']} pairs")
        if f"bits{bits}" not in results:
            print(
                f"child bits={bits} failed (rc={p.returncode}); stderr "
                f"tail: {p.stderr[-800:]}",
                file=sys.stderr,
            )
    if len(results) < 2:
        sys.exit(1)
    entry = {
        **results,
        "speedup_e2e": round(
            results["bits60"]["t"] / results["bits120"]["t"], 3
        ),
        "note": (
            "fresh JVM per config, saturated x100 corpus (500k docs), "
            "warm-then-timed; pair sets differ by design (hamming<=3 "
            "over 120 bits is stricter)"
        ),
    }
    path = os.path.join(REPO, "BENCHHEAVY_sf10.json")
    with open(path) as fh:
        doc = json.load(fh)
    doc["simhash_wide_x100_e2e"] = entry
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
        fh.write("\n")
    os.replace(tmp, path)
    print(f"merged into {path}")
    print(json.dumps(entry, indent=1))


if __name__ == "__main__":
    main()
