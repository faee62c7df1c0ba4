#!/usr/bin/env python
"""Per-query profiler (r16, guide §1): run one or more declared queries
with the Spark UI's REST API enabled and attribute wall time to jobs /
stages — task time, shuffle read/write bytes, input bytes, GC — plus the
Python-side split between plan construction and execution.

This answers "where do the bench seconds actually go" at a resolution
bench.py cannot: a 2 s bench row might be 1 job of real work or 14 jobs
of eager localCheckpoint barriers; a slow stage might be shuffle-bound
or compute-bound.  Results print as JSON per query and (optionally)
write to a file with --out.

Usage: python scripts/profile_query.py [sf_dir] query [query ...]
       [--runs 2] [--out FILE.json]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def rest(port: int, path: str):
    url = f"http://localhost:{port}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    args = [a for a in sys.argv[1:]]
    out_file = None
    runs = 2
    if "--out" in args:
        i = args.index("--out")
        out_file = args[i + 1]
        del args[i : i + 2]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    names = args[1:] if args and "/" in args[0] else args

    import os

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    # fresh session with UI on (get_spark pins ui.enabled=false)
    import __spark_entry__ as entry_mod
    from csv_etl_spark.session import get_spark

    spark = (
        SparkSession.builder.appName("profile")
        .master(f"local[{os.environ['SPARK_GRAFT_CPUS']}]")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4050")
        .getOrCreate()
    )
    # re-apply the library defaults the bench session would have
    get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    app_id = spark.sparkContext.applicationId
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])

    # warm-up: python workers + codegen infra
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _noop(s):
        return s

    spark.range(0, 1024, 1, 32).select(_noop(F.col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    results = {}
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"?? unknown query {name}", file=sys.stderr)
            continue
        prof_runs = []
        for r in range(runs):
            jobs_before = {j["jobId"] for j in rest(port, f"applications/{app_id}/jobs")}
            spark.sparkContext.setJobDescription(f"profile:{name}:run{r}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_plan = time.perf_counter() - t0
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_exec = time.perf_counter() - t1
            spark.sparkContext.setJobDescription(None)
            jobs = [
                j
                for j in rest(port, f"applications/{app_id}/jobs")
                if j["jobId"] not in jobs_before
            ]
            stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
            stages = []
            all_stages = {
                s["stageId"]: s
                for s in rest(port, f"applications/{app_id}/stages")
            }
            for sid in stage_ids:
                s = all_stages.get(sid)
                if not s or s["status"] == "SKIPPED":
                    continue
                stages.append(
                    {
                        "stage": sid,
                        "name": s["name"].split("\n")[0][:80],
                        "tasks": s["numCompleteTasks"],
                        "task_time_s": round(s.get("executorRunTime", 0) / 1e3, 2),
                        "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
                        "gc_s": round(s.get("jvmGcTime", 0) / 1e3, 2),
                        "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                        "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                        "sh_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                        "sh_fetch_wait_s": round(
                            s.get("shuffleFetchWaitTime", 0) / 1e3, 2
                        ),
                    }
                )
            prof_runs.append(
                {
                    "t_plan_s": round(t_plan, 3),
                    "t_exec_s": round(t_exec, 3),
                    "n_jobs": len(jobs),
                    "n_stages": len(stages),
                    "sum_task_time_s": round(
                        sum(s["task_time_s"] for s in stages), 2
                    ),
                    "sum_sh_read_mb": round(
                        sum(s["sh_read_mb"] for s in stages), 1
                    ),
                    "stages": stages,
                }
            )
        results[name] = prof_runs
        last = prof_runs[-1]
        print(
            f"{name}: plan {last['t_plan_s']}s exec {last['t_exec_s']}s "
            f"jobs {last['n_jobs']} stages {last['n_stages']} "
            f"task-time {last['sum_task_time_s']}s shuffle {last['sum_sh_read_mb']}MB"
        )
        for s in last["stages"]:
            print(
                f"   s{s['stage']:>4} {s['tasks']:>4}t run {s['task_time_s']:>7.2f}s "
                f"cpu {s['cpu_s']:>7.2f}s gc {s['gc_s']:>5.2f}s in {s['input_mb']:>8.1f}MB "
                f"shR {s['sh_read_mb']:>7.1f}MB shW {s['sh_write_mb']:>7.1f}MB  {s['name']}"
            )
    if out_file:
        Path(out_file).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
