"""Per-key profiler: runs registry keys steady-state (warm run, then a
timed run) and reports wall seconds, Spark JOB count, STAGE count, task
count, and summed executor run time from the status API.  The gap
between wall and executor time over many small jobs is exactly the
driver/scheduler latency the r11 host episode inflates — keys with high
job counts are both jitter-sensitive on this box AND stage-barrier-heavy
on a real cluster, so job-count reduction is the optimization target.

Usage: python scripts/profile_key.py key1 key2 ... [--sf DIR]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]

    from pythonql_spark import get_spark
    from pythonql_spark.benchqueries import QUERIES

    spark = get_spark("profile", **{"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app}"

    # warm the worker pool the way bench.py does
    QUERIES["group_agg"](spark, sf_dir).count()
    from pyspark.sql import functions as F
    spark.range(64).select(
        F.pandas_udf(lambda s: s * 2, "long")(F.col("id"))).count()

    rows = []
    for name in args:
        if name not in QUERIES:
            print(f"# unknown key {name}", file=sys.stderr)
            continue
        QUERIES[name](spark, sf_dir).count()          # warm
        jobs_before = {j["jobId"] for j in rest(base, "/jobs")}
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()          # timed
        wall = time.perf_counter() - t0
        time.sleep(0.3)
        jobs = [j for j in rest(base, "/jobs")
                if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        exec_ms = 0
        tasks = 0
        for sid in stage_ids:
            try:
                for att in rest(base, f"/stages/{sid}"):
                    exec_ms += att.get("executorRunTime", 0)
                    tasks += att.get("numCompleteTasks", 0)
            except Exception:
                pass
        rows.append({"key": name, "wall_s": round(wall, 3),
                     "jobs": len(jobs), "stages": len(stage_ids),
                     "tasks": tasks,
                     "executor_s": round(exec_ms / 1000, 3)})
        print(json.dumps(rows[-1]), flush=True)

    print("\nkey                        wall   jobs  stages  tasks  exec_s")
    for r in rows:
        print(f"{r['key']:<26}{r['wall_s']:>6.2f}  {r['jobs']:>4}  "
              f"{r['stages']:>5}  {r['tasks']:>5}  {r['executor_s']:>6.2f}")


if __name__ == "__main__":
    main()
