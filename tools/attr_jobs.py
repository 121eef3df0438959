"""Per-job wall-clock attribution for one or more headline queries.

Runs each query the way bench.py does (same forcing action), with the
Spark event log enabled, then parses the event log into a per-job
timeline: job id, duration, gaps between jobs (driver-side time), and
per-stage shuffle/input metrics. The gaps are where py4j plan-build /
collect overhead lives — executor work shows up inside jobs.

Usage: python tools/attr_jobs.py <query> [query ...] [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    evdir = "/tmp/spark_attr_events"
    os.makedirs(evdir, exist_ok=True)

    import bench
    import __spark_entry__ as entrymod
    from data_pipeline_framework_spark import get_spark

    spark = get_spark(
        app_name="attr",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            "spark.sql.ui.retainedExecutions": "8",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    qs = entrymod.queries()
    qs[args.queries[0]](spark, sf_dir).count()  # warm

    marks = {}
    for name in args.queries:
        best, best_t0, best_t1 = float("inf"), 0.0, 0.0
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"attr:{name}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            bench.run_action(name, df)
            t1 = time.time()
            if t1 - t0 < best:
                best, best_t0, best_t1 = t1 - t0, t0, t1
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(None)
        marks[name] = (best_t0, best_t1, best)

    # flush the event log
    spark.stop()

    evfile = Path(evdir) / app_id
    jobs = []  # (jobid, submit_ms, end_ms, desc)
    stages = {}  # stageid -> dict
    sub = {}
    desc = {}
    stage_of_job = {}
    with open(evfile) as fh:
        for line in fh:
            e = json.loads(line)
            t = e.get("Event")
            if t == "SparkListenerJobStart":
                jid = e["Job ID"]
                sub[jid] = e["Submission Time"]
                desc[jid] = e.get("Properties", {}).get(
                    "spark.job.description", ""
                )
                stage_of_job[jid] = [
                    s["Stage ID"] for s in e.get("Stage Infos", [])
                ]
            elif t == "SparkListenerJobEnd":
                jid = e["Job ID"]
                jobs.append((jid, sub.get(jid, 0), e["Completion Time"],
                             desc.get(jid, "")))
            elif t == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "tasks": si["Number of Tasks"],
                    "ms": si.get("Completion Time", 0)
                    - si.get("Submission Time", 0),
                }

    for name, (t0, t1, best) in marks.items():
        t0ms, t1ms = t0 * 1000, t1 * 1000
        mine = [j for j in jobs if j[1] >= t0ms - 5 and j[2] <= t1ms + 5
                and f"attr:{name}" in j[3]]
        mine.sort(key=lambda j: j[1])
        print(f"\n=== {name}: best {best:.3f}s, {len(mine)} jobs ===")
        prev_end = t0ms
        jobtot = 0.0
        for jid, s, c, _d in mine:
            gap = (s - prev_end) / 1000
            dur = (c - s) / 1000
            jobtot += dur
            st = [
                f"s{sid}:{stages[sid]['ms']}ms/{stages[sid]['tasks']}t"
                for sid in stage_of_job.get(jid, []) if sid in stages
            ]
            print(f"  gap {gap:6.3f}s | job {jid} {dur:6.3f}s  {' '.join(st)}")
            prev_end = c
        print(f"  gap {(t1ms - prev_end) / 1000:6.3f}s | (tail)")
        print(f"  jobs total {jobtot:.3f}s, gaps total "
              f"{best - jobtot:.3f}s")


if __name__ == "__main__":
    main()
