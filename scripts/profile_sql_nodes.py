"""Operator-level (SQL node) metrics for ONE registry key, from the
REST /sql endpoint — names the operator that owns the time, where
stage callsites are opaque ($anonfun AQE stage jobs).

Usage: python scripts/profile_sql_nodes.py key [--sf=DIR] [--top=N]
"""

from __future__ import annotations

import json
import re
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def parse_ms(val: str) -> float:
    """Best-effort: 'total (min, med, max...)\n5.2 s (...)' → seconds."""
    m = re.search(r"([\d.]+)\s*(ms|s|m)\b", val)
    if not m:
        return 0.0
    v = float(m.group(1))
    return v / 1000 if m.group(2) == "ms" else v * 60 if m.group(2) == "m" else v


def main() -> None:
    name = sys.argv[1]
    sf_dir = "/root/testdata/sf0.1"
    top = 25
    for a in sys.argv[2:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        if a.startswith("--top="):
            top = int(a.split("=", 1)[1])

    from pythonql_spark import get_spark
    from pythonql_spark.benchqueries import QUERIES

    spark = get_spark("sqlprof", **{"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app}"

    QUERIES["group_agg"](spark, sf_dir).count()
    from pyspark.sql import functions as F
    spark.range(64).select(
        F.pandas_udf(lambda s: s * 2, "long")(F.col("id"))).count()

    QUERIES[name](spark, sf_dir).count()          # warm
    before = {e["id"] for e in rest(base, "/sql?length=1000")}
    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).count()          # timed
    wall = time.perf_counter() - t0
    time.sleep(0.5)
    execs = [e for e in rest(base, "/sql?length=1000&details=true&planDescription=false")
             if e["id"] not in before]
    print(f"{name}: wall {wall:.2f}s, {len(execs)} SQL executions")
    rows = []
    for e in execs:
        for node in e.get("nodes", []):
            interesting = {}
            for m in node.get("metrics", []):
                mn = m["name"]
                if any(k in mn for k in (
                        "time", "Time", "duration", "Duration")):
                    sec = parse_ms(m["value"])
                    if sec > 0.05:
                        interesting[mn] = round(sec, 2)
            if interesting:
                rows.append((max(interesting.values()), e["id"],
                             node["nodeName"], interesting))
    rows.sort(key=lambda r: -r[0])
    for sec, eid, nn, mm in rows[:top]:
        print(f"  exec {eid} {nn[:60]:60s} {mm}")


if __name__ == "__main__":
    main()
