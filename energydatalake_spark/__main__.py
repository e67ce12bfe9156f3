"""CLI: run the six reference pipelines end-to-end over a local lake,
or any registry query ad hoc.

    python -m energydatalake_spark --base /tmp/lake [--fixtures]
    python -m energydatalake_spark query pricing_summary [--sf-dir DIR]
    python -m energydatalake_spark list-queries

Pipelines mode mirrors the reference's operational layout
(README.md:83-105: source folders → transform → warehouse tables →
archive folders) on a local directory tree. ``--fixtures`` seeds the
source folders with the deterministic synthetic feeds first; without
it the CLI processes whatever CSVs are already in the source folders
(re-running is a clean no-op thanks to the empty-source guard — the
archive step drains the queues, exactly like the reference's cron
re-runs).

Query mode is the interactive analyst surface: every SURVEY.md §2
operator is addressable by registry name, with ``--explain`` to print
the formatted physical plan instead of rows and ``--limit`` to bound
terminal output (the limit is applied to the PLAN, so Spark prunes
work, not just display).
"""

from __future__ import annotations

import argparse
import json
import os

from energydatalake_spark.pipelines import ercot
from energydatalake_spark.pipelines.ercot import PipelineConfig
from energydatalake_spark.session import get_spark


def build_configs(base: str) -> dict[str, PipelineConfig]:
    src = lambda *p: os.path.join(base, *p)
    wh = lambda t: os.path.join(base, "warehouse", t)
    arch = lambda *p: os.path.join(base, "archive", *p)
    return {
        "load_latest": PipelineConfig(
            source_dir=src("ercot_load_csv", "load_latest"),
            sink_path=wh("ercot_load_latest"),
            archive_dir=arch("load_latest"),
        ),
        "load_forecast": PipelineConfig(
            source_dir=src("ercot_load_forecast_csv"),
            sink_path=wh("ercot_load_forecast"),
            archive_dir=arch("load_forecast"),
        ),
        "fm_load_merge": PipelineConfig(
            source_dir=src("ercot_fm_csv", "fm_latest"),
            source2_dir=src("ercot_load_csv", "load_latest"),
            sink_path=wh("ercot_fm_load_merged"),
            archive_dir=arch("fm_latest"),
            archive2_dir=None,  # load queue owned by load_latest below
        ),
        "spp_weather_merge": PipelineConfig(
            source_dir=src("ercot_spp_csv", "spp_latest"),
            source2_dir=src("openweather_live_data", "quarter_hourly_weather_data"),
            sink_path=wh("ercot_spp_weather_merged"),
            archive_dir=arch("spp_latest"),
            archive2_dir=arch("weather_live"),
        ),
        "merge_historical_weather": PipelineConfig(
            source_dir=src("openmeteo-weather", "hourly-historical-weather-data"),
            sink_path=wh("historical_weather_data"),
            archive_dir=arch("weather_historical"),
        ),
    }


def run_query_cli(argv: list[str]) -> None:
    """`query <name>` / `list-queries` subcommands."""
    from energydatalake_spark.plans.registry import QUERIES

    if argv[0] == "list-queries":
        for name, q in QUERIES.items():
            oracle = "oracle" if q.oracle else "rows-only"
            print(f"{name}\t[{q.survey_ops}]\t{oracle}")
        return

    ap = argparse.ArgumentParser(prog="energydatalake_spark query")
    ap.add_argument("name", choices=sorted(QUERIES), metavar="name")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="table directory (default $SPARK_GRAFT_SF_DIR or sf0.01)",
    )
    ap.add_argument("--limit", type=int, default=20, help="row cap (0 = all)")
    ap.add_argument(
        "--explain", action="store_true", help="print the physical plan, no rows"
    )
    args = ap.parse_args(argv[1:])

    spark = get_spark("energydatalake_query")
    df = QUERIES[args.name].build(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
        return
    if args.limit:
        df = df.limit(args.limit)
    df.show(n=args.limit or 10_000_000, truncate=False)


def main() -> None:
    import sys

    if len(sys.argv) > 1 and sys.argv[1] in ("query", "list-queries"):
        run_query_cli(sys.argv[1:])
        return

    ap = argparse.ArgumentParser(prog="energydatalake_spark")
    ap.add_argument("--base", required=True, help="lake root directory")
    ap.add_argument(
        "--fixtures", action="store_true", help="seed source folders first"
    )
    ap.add_argument(
        "--only", nargs="*", default=None, help="subset of pipeline names"
    )
    args = ap.parse_args()

    if args.fixtures:
        from energydatalake_spark.pipelines.fixtures import generate_all

        generate_all(args.base)

    spark = get_spark("energydatalake")
    configs = build_configs(args.base)
    # fm_load_merge consumes the same load_latest queue as load_latest;
    # run the merge FIRST (the reference runs them as separate crons
    # against separate folder copies; locally we share one queue, and
    # load_latest's archive step would otherwise drain it).
    order = [
        "fm_load_merge",
        "load_latest",
        "load_forecast",
        "spp_weather_merge",
        "merge_historical_weather",
    ]
    reports: dict[str, object] = {}
    for name in order:
        if args.only and name not in args.only:
            continue
        fn = getattr(ercot, name)
        rep = fn(spark, configs[name])
        reports[name] = rep if rep is not None else "no-op (empty source)"
        print(f"# {name}: {reports[name]}")
    print(json.dumps({"pipelines": list(reports)}, default=str))


if __name__ == "__main__":
    main()
