"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan build + execution + collect of the
result — results here are small aggregates / bounded projections, so
collect measures engine work, not driver serialization).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from energydatalake_spark.plans.registry import QUERIES
    from energydatalake_spark.session import get_spark

    spark = get_spark("bench")

    # Warm-up: JVM/codegen/parquet-footer costs out of the measurement.
    from energydatalake_spark.io.readers import read_table

    read_table(spark, sf_dir, "lineitem").count()
    read_table(spark, sf_dir, "events").count()

    timings: dict[str, float] = {}
    for name, q in QUERIES.items():
        t0 = time.perf_counter()
        df = q.build(spark, sf_dir)
        n = len(df.collect())
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "registry_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
