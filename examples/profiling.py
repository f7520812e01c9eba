"""Incremental corpus profiling walkthrough: the sketch toolkit.

The append-only 100 TB question is never "what is the distinct count"
— it is "what is the distinct count WITHOUT rescanning history".
Every answer here is a few-KB mergeable artifact built from one scan
of each DELTA, then pure algebra:

* distinct counts   — md5-HLL register tables (max-merge)
* frequencies       — Count-Min counter tables (sum-merge)
* quantiles         — bottom-k md5 samples (bottom-k-merge)
* distinct-per-day  — keyed register deltas rolled hour → day

All four have DuckDB value oracles over the identical expressions
(`profile_sketch_md5` / `profile_cms` / `profile_quantiles_md5` /
`rollup_distinct` in the registry), and the first two have streaming
maintainers (`streaming.ingest.sketch_maintain_stream` /
`cms_maintain_stream`).  Run:  python examples/profiling.py [SF_DIR]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pythonql_spark import get_spark
from pythonql_spark.sources import load_sf


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("examples-profiling")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_sf(spark, sf_dir)
    docs, events = t["documents"], t["events"]

    from pythonql_spark.operators.sketch import (
        cms_counters_md5, cms_estimate, hll_estimate_md5,
        hll_registers_keyed, hll_registers_md5, merge_md5_registers,
        merge_registers_keyed, sample_quantiles_md5)

    # --- distinct counts: sketch two "days" independently, merge ---
    day1 = hll_registers_md5(docs.filter("doc_id % 2 = 0"),
                             ["doc_id", "lang", "source"])
    day2 = hll_registers_md5(docs.filter("doc_id % 2 = 1"),
                             ["doc_id", "lang", "source"])
    merged = merge_md5_registers(day1, day2)   # algebra, no rescan
    print("distinct counts from merged register tables:")
    hll_estimate_md5(merged).orderBy("col_name").show()

    # --- frequencies: how often does each user appear? ---
    counters = cms_counters_md5(events, "user_id")
    heavy = cms_estimate(counters,
                         events.select("user_id").distinct(), "user_id")
    print("top user frequencies (CMS estimate, one-sided error):")
    heavy.orderBy("n_est", ascending=False).show(5)

    # --- quantiles: deterministic bottom-k sample per event type ---
    print("p50/p90/p99 of value per event type (bottom-k sample):")
    sample_quantiles_md5(events, "value", "event_type",
                         "event_id", k=256).orderBy("event_type").show()

    # --- distinct users per DAY maintained from HOURLY deltas ---
    hourly = hll_registers_keyed(
        events, {"hour": "date_trunc('hour', ts)"}, "user_id")
    daily = merge_registers_keyed(hourly,
                                  {"day": "cast(to_date(hour) as string)"})
    print("distinct users per day, rolled up from hourly registers:")
    (hll_estimate_md5(daily.withColumnRenamed("day", "col_name"))
     .withColumnRenamed("col_name", "day")
     .orderBy("day").show(5))


if __name__ == "__main__":
    main()
