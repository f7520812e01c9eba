"""Per-stage drill-down for ONE registry key: stage id, name, task
count, executor run time, input/shuffle bytes — ranks where a key's
executor time actually goes (profile_key.py gives the per-key summary).

Usage: python scripts/profile_stages.py key [--sf=DIR]
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
    name = sys.argv[1]
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[2:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]

    from pythonql_spark import get_spark
    from pythonql_spark.benchqueries import QUERIES

    spark = get_spark("stageprof", **{"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app}"

    QUERIES["group_agg"](spark, sf_dir).count()
    from pyspark.sql import functions as F
    spark.range(64).select(
        F.pandas_udf(lambda s: s * 2, "long")(F.col("id"))).count()

    QUERIES[name](spark, sf_dir).count()          # warm
    jobs_before = {j["jobId"] for j in rest(base, "/jobs")}
    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).count()          # timed
    wall = time.perf_counter() - t0
    time.sleep(0.5)
    jobs = [j for j in rest(base, "/jobs") if j["jobId"] not in jobs_before]
    print(f"{name}: wall {wall:.2f}s, {len(jobs)} jobs")
    for j in sorted(jobs, key=lambda x: x["jobId"]):
        sub = j.get("jobGroup") or ""
        print(f"  job {j['jobId']}: {j.get('name','')[:80]} "
              f"stages={j['stageIds']} {sub}")
    stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
    rows = []
    for sid in stage_ids:
        try:
            for att in rest(base, f"/stages/{sid}"):
                det = att.get("description") or ""
                if not det:
                    d = att.get("details", "")
                    det = " | ".join(ln.strip() for ln in d.splitlines()
                                     if "pythonql_spark" in ln)[:160]
                rows.append({
                    "stage": sid,
                    "tasks": att.get("numCompleteTasks", 0),
                    "exec_s": att.get("executorRunTime", 0) / 1000,
                    "cpu_s": att.get("executorCpuTime", 0) / 1e9,
                    "in_mb": att.get("inputBytes", 0) / 1e6,
                    "sh_r_mb": att.get("shuffleReadBytes", 0) / 1e6,
                    "sh_w_mb": att.get("shuffleWriteBytes", 0) / 1e6,
                    "name": (det or att.get("name", ""))[:160]})
        except Exception:
            pass
    rows.sort(key=lambda r: -r["exec_s"])
    print(f"{'stage':>5} {'tasks':>5} {'exec_s':>7} {'cpu_s':>7} "
          f"{'in_mb':>7} {'sh_r':>6} {'sh_w':>6}  name")
    for r in rows:
        print(f"{r['stage']:>5} {r['tasks']:>5} {r['exec_s']:>7.2f} "
              f"{r['cpu_s']:>7.2f} {r['in_mb']:>7.1f} {r['sh_r_mb']:>6.1f} "
              f"{r['sh_w_mb']:>6.1f}  {r['name']}")


if __name__ == "__main__":
    main()
