"""Optimization-round measurement harness.

For each headline query (or an explicit list): capture the physical plan
(``.explain("formatted")``) into plans/<tag>/<name>_<suffix>.txt and time
the query with the SAME forcing action bench.py uses (noop sink for wide
outputs, collect for bounded ones), min-of-N.

Usage:
    python tools/profile_queries.py [--plans-only] [--runs N]
        [--tag r09] [--suffix before] [--out FILE] [query ...]

Timing numbers go to stdout as one JSON line {name: sec} and to --out
(default /tmp/profile_<tag>_<suffix>.json).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--time-only", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tag", default="r09")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    import bench
    import __spark_entry__ as entrymod
    from data_pipeline_framework_spark import get_spark

    spark = get_spark(
        app_name="profile",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.ui.retainedExecutions": "8",
            "spark.ui.retainedJobs": "100",
            "spark.ui.retainedStages": "100",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    names = args.queries or [n for n in bench.HEADLINE if n in qs]
    for n in names:
        if n not in qs:
            raise SystemExit(f"unknown query: {n}")

    plans_dir = ROOT / "plans" / args.tag
    plans_dir.mkdir(parents=True, exist_ok=True)

    # warm: JVM + parquet footers
    qs[names[0]](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        if not args.time_only:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            # strip auto-generated ids that churn between runs for
            # stable diffs (keeps #NN expr ids — they're stable enough
            # within one capture)
            (plans_dir / f"{name}_{args.suffix}.txt").write_text(plan)
        if args.plans_only:
            continue
        best = float("inf")
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            bench.run_action(name, df)
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]}", file=sys.stderr, flush=True)

    if not args.plans_only:
        out = args.out or f"/tmp/profile_{args.tag}_{args.suffix}.json"
        payload = {
            "sf_dir": sf_dir, "cpus": cpus, "runs": args.runs,
            "total": round(sum(timings.values()), 3), "queries": timings,
        }
        Path(out).write_text(json.dumps(payload, indent=1))
        print(json.dumps({"total": payload["total"], "out": out}))


if __name__ == "__main__":
    main()
