"""Composed crawl-curation rehearsal: the 100 TB deployment shape as
ONE pipeline over a synthesized crawl, run end-to-end with per-stage
parquet sinks, plan gates, REST executor metrics, and EXACT planted
invariants —

  s1 url_dedup   curate_urls -> one survivor per canonical URL
  s2 quality     c4_clean line surgery -> gopher_pass thresholds
  s3 decontam    Bloom benchmark decontamination (cleaned text)
  s4 minhash     banded LSH near-dup pairs -> components -> keep min
  s5 pack        GPT-style sequence packing (token offsets)
  s6 shards      fixed-row training shards + manifest

The individual operators are each rehearsed (scale_rehearsal.py,
stream_rehearsal.py); THIS script exercises their composition —
cross-stage plan interactions (e.g. CollapseProject re-evaluating a
stage's expression tree inside the next stage's lambdas) that no
per-operator run can catch.

Planted structure (all computed back from doc_id arithmetic, never
stored flags, so the pipeline cannot cheat by reading a label):
  * refetches — every 8th doc is crawled 3x under spelling variants
    (www+UPPER+tracking+fragment / http+:80+trailing slash) of its
    canonical URL: s1 must reject EXACTLY the 2 extra fetches of each
    and keep exactly one record per doc.
  * garbage    — rep%33>=2 and (base+rep)%51==2: symbol junk with a
    '{' (fails the C4 page rule AND gopher's alpha/symbol bounds):
    s2 must remove EVERY one.
  * contamination — rep%33>=2 and (base+rep)%51==5: a 10-word
    benchmark line (marker words that occur nowhere organically)
    appended as its own C4-surviving line: s3 must flag EXACTLY the
    planted set — Bloom has no false negatives, and at these filter
    parameters the expected false-positive count is ~1e-14, so the
    flagged set must EQUAL the planted set.
  * near-dups  — rep 0 and rep%33==1 of each base doc are suffix-only
    edits of one another (every other rep is word-salted so its
    shingle set is genuinely distinct): s4 must collapse >=95% of the
    clusters alive at its input (short docs can legitimately fall
    under the Jaccard threshold; merges into intrinsic base-corpus
    siblings are accounted, not failed).
  * conservation — s5's token totals must equal an independent sum
    over s4's survivors; s6's manifest must cover every survivor in
    uniform shards (remainder in the last).

Run: python scripts/crawl_curation_rehearsal.py [reps ...]  (default 101)
Prints per-stage lines + ONE JSON line per scale.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pythonql_spark import get_spark
from pythonql_spark.plans import assert_plan
from pythonql_spark.sources import load_table

SF = "/root/testdata/sf0.1"
SCRATCH = Path("/root/repo/.scratch/crawl_rehearsal")
NEARDUP_MOD = 33
N_HOSTS = 997          # prime: no resonance with the mod-8 refetch
                       # slice or the mod-51 planted slices
BENCH_LINE = ("zqalpha zqbravo zqcharlie zqdelta zqecho zqfoxtrot "
              "zqgolf zqhotel zqindia zqjuliet.")
GARBAGE = "@#$ {x} !!! %% ^^ &&& *( )) @@ ## $$ " * 8


from scripts.scale_rehearsal import stage_totals  # noqa: E402 — one
# definition of the REST-metric snapshot for every rehearsal script


def build_crawl(spark, reps: int, path: str) -> None:
    """Synthesize the crawl at reps x sf0.1 (5k base docs).  Text gets
    sentence/line structure (testdata text is punctuation-free, and
    C4's line rules need lines to rule on), per-rep word salt, and the
    planted structures; every doc then becomes 1 or 3 crawl records."""
    docs = load_table(spark, SF, "documents")
    r = spark.range(reps).withColumnRenamed("id", "rep")
    base = docs.crossJoin(F.broadcast(r)).selectExpr(
        "doc_id as base", "rep",
        f"doc_id * {reps} + rep as doc_id",
        # rep 0: original.  rep%MOD==1: near-dup (suffix edit).  else:
        # per-rep token after every 2nd word — replicas share no
        # shingles (see scale_rehearsal.py for why the salt is dense)
        f"""CASE
              WHEN rep = 0 THEN text
              WHEN rep % {NEARDUP_MOD} = 1
                THEN concat(text, ' dtok', cast(rep as string))
              ELSE concat_ws(' ', flatten(transform(split(text, ' '),
                     (w, i) -> IF(i % 2 = 1,
                                  array(w, concat('r', cast(rep as string))),
                                  array(w)))))
            END as text""",
        "lang", "source")
    lineified = base.withColumn("text", F.expr(
        # every 12th word ends a sentence/line — C4-shaped web text
        "concat_ws(' ', transform(split(text, ' '), "
        "(w, i) -> IF(i % 12 = 11, concat(w, '.\\n'), w)))"))
    planted = lineified.selectExpr(
        "doc_id", "lang", "source",
        f"""CASE
              WHEN rep % {NEARDUP_MOD} >= 2 AND (base + rep) % 51 = 2
                THEN '{GARBAGE}'
              WHEN rep % {NEARDUP_MOD} >= 2 AND (base + rep) % 51 = 5
                THEN concat(text, '\\n', '{BENCH_LINE}')
              ELSE text
            END as text""")
    stem = f"cast(doc_id % {N_HOSTS} as string)"
    pid = "cast(doc_id as string)"
    canonical = planted.selectExpr(
        "doc_id * 4 as crawl_id",
        f"concat('https://s', {stem}, '.co.uk/p/', {pid}) as url",
        "doc_id", "text", "lang", "source")
    refetch_src = planted.filter("doc_id % 8 = 0")
    v1 = refetch_src.selectExpr(
        "doc_id * 4 + 1 as crawl_id",
        f"concat('https://WWW.S', {stem}, '.CO.UK/p/', {pid},"
        f" '?utm_source=feed&gclid=zz#top') as url",
        "doc_id", "text", "lang", "source")
    v2 = refetch_src.selectExpr(
        "doc_id * 4 + 2 as crawl_id",
        f"concat('http://s', {stem}, '.co.uk:80/p/', {pid}, '/') as url",
        "doc_id", "text", "lang", "source")
    crawl = canonical.unionByName(v1).unionByName(v2)
    crawl.repartition(max(32, reps * 2)).write.mode(
        "overwrite").parquet(path)


def run_stage(spark, name: str, build, sink: str, *, max_exchanges: int,
              rows: list) -> tuple[int, "DataFrame"]:
    """Plan-gate a stage, run it through a real parquet sink, record
    wall + REST delta, return (row count, re-read output).  The REST
    snapshot brackets THIS stage's jobs only — the invariant checks
    main runs between stages are deliberately outside it, so a
    stage's task_time/metrics never absorb its predecessor's
    verification work."""
    before = stage_totals(spark)
    t0 = time.perf_counter()
    df = build()
    rep = assert_plan(df, max_exchanges=max_exchanges,
                      no_cartesian=True, no_python_row_udf=True)
    df.write.mode("overwrite").parquet(sink)
    wall = time.perf_counter() - t0
    out = spark.read.parquet(sink)
    n = out.count()
    after = stage_totals(spark)
    delta = {k: after[k] - before[k] for k in after}
    mb = {k: round(v / 2**20, 1) for k, v in delta.items()
          if k.endswith("Bytes") or "Spilled" in k}
    row = {"stage": name, "rows_out": n, "wall_sec": round(wall, 2),
           "exchanges": rep["exchanges"],
           "broadcast_exchanges": rep["broadcast_exchanges"],
           "broadcast_joins": rep["broadcast_hash_joins"],
           "row_udfs": rep["python_row_evals"],
           "task_time_sec": round(delta["executorRunTime"] / 1000, 1),
           "metrics_mb": mb}
    rows.append(row)
    print(json.dumps(row), flush=True)
    return n, out


def plant_pred(col: str, reps: int, mod51: int) -> str:
    """Planted-slice membership recomputed from doc_id arithmetic."""
    return (f"({col} % {reps}) % {NEARDUP_MOD} >= 2 "
            f"AND (({col} div {reps}) + ({col} % {reps})) % 51 = {mod51}")


def main() -> None:
    reps_list = [int(a) for a in sys.argv[1:]] or [101]
    spark = get_spark("crawl_rehearsal", **{"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    from pythonql_spark.operators.bloom import decontaminate_bloom
    from pythonql_spark.operators.dedup import dedup_keep, minhash_lsh_pairs
    from pythonql_spark.operators.text import (c4_clean, gopher_pass,
                                               token_count)
    from pythonql_spark.operators.url import curate_urls
    from pythonql_spark.sources.catalog import write_training_shards

    for reps in reps_list:
        d = SCRATCH / f"x{reps}"
        crawl_path = str(d / "crawl.parquet")
        t0 = time.perf_counter()
        build_crawl(spark, reps, crawl_path)
        crawl = spark.read.parquet(crawl_path)
        n_crawl = crawl.count()
        n_docs = crawl.filter("crawl_id % 4 = 0").count()
        n_refetch = crawl.filter("crawl_id % 4 != 0").count()
        sz = sum(f.stat().st_size
                 for f in Path(crawl_path).rglob("*.parquet"))
        print(f"--- crawl x{reps}: {n_crawl:,} records ({n_docs:,} docs"
              f" + {n_refetch:,} refetches), {sz / 2**20:,.0f} MB, "
              f"built in {time.perf_counter() - t0:.1f}s", flush=True)

        rows: list = []
        invariants: dict = {}
        wall0 = time.perf_counter()

        # s1: canonical-URL dedup — one survivor per page
        from pyspark.sql.window import Window as W

        def s1():
            cur = curate_urls(crawl)
            return (cur.withColumn("__rn", F.row_number().over(
                        W.partitionBy("url_norm").orderBy("crawl_id")))
                    .filter("__rn = 1")
                    .select("crawl_id", "doc_id", "domain",
                            "text", "lang", "source"))
        n1, out1 = run_stage(spark, "s1_url_dedup", s1,
                             str(d / "s1"), max_exchanges=3, rows=rows)
        non_canon = out1.filter("crawl_id % 4 != 0").count()
        invariants["url_dedup"] = {
            "survivors": n1, "expected": n_docs,
            "rejected": n_crawl - n1, "expected_rejected": n_refetch,
            "non_canonical_survivors": non_canon}
        assert n1 == n_docs and non_canon == 0, invariants["url_dedup"]

        # s2: C4 line surgery then Gopher thresholds on cleaned text
        def s2():
            c4 = c4_clean(out1, extra_cols=["domain", "lang", "source"])
            return (c4.filter("c4_keep")
                    .filter(gopher_pass("text"))
                    .select("doc_id", "domain", "lang", "source", "text"))
        n2, out2 = run_stage(spark, "s2_quality", s2,
                             str(d / "s2"), max_exchanges=1, rows=rows)
        g_pred = plant_pred("doc_id", reps, 2)
        garbage_in = out1.filter(g_pred).count()
        garbage_out = out2.filter(g_pred).count()
        invariants["quality"] = {
            "garbage_in": garbage_in, "garbage_survived": garbage_out,
            "organic_removed": n1 - n2
                               - (garbage_in - garbage_out)}
        assert garbage_out == 0, invariants["quality"]

        # s3: Bloom decontamination of the cleaned corpus
        bench = spark.createDataFrame([(1, BENCH_LINE)],
                                      ["bench_id", "text"])

        def s3():
            # production hash: xxhash64 positions are ~1.7x cheaper
            # than the dual-dialect md5 path (the md5 form exists for
            # DuckDB oracle portability, which a rehearsal doesn't
            # need); the planted invariant is hash-agnostic
            cont = decontaminate_bloom(out2, bench, hash_fn="xxhash64")
            return out2.join(
                cont.filter("NOT contaminated").select("doc_id"),
                "doc_id")
        n3, out3 = run_stage(spark, "s3_decontam", s3,
                             str(d / "s3"), max_exchanges=4, rows=rows)
        c_pred = plant_pred("doc_id", reps, 5)
        planted_in = out2.filter(c_pred).count()
        planted_out = out3.filter(c_pred).count()
        flagged = n2 - n3
        invariants["decontam"] = {
            "planted_reaching_s3": planted_in,
            "planted_survived": planted_out,
            "flagged_total": flagged,
            "false_positives": flagged - planted_in}
        assert planted_out == 0 and flagged == planted_in, \
            invariants["decontam"]

        # s4: MinHash-LSH near-dup dedup
        def s4():
            pairs = minhash_lsh_pairs(out3, jaccard_threshold=0.5)
            return dedup_keep(out3, pairs)
        n_kept, out4 = run_stage(spark, "s4_minhash", s4,
                                 str(d / "s4"), max_exchanges=20,
                                 rows=rows)
        nd_reps = [0] + [r for r in range(1, reps)
                         if r % NEARDUP_MOD == 1]
        nd_in = (out3.filter(F.expr(f"doc_id % {reps}").isin(nd_reps))
                 .groupBy(F.expr(f"doc_id div {reps}").alias("b"))
                 .agg(F.count(F.lit(1)).alias("m"))
                 .filter("m >= 2"))
        live = nd_in.count()
        surv = (out4.filter(F.expr(f"doc_id % {reps}").isin(nd_reps))
                .groupBy(F.expr(f"doc_id div {reps}").alias("b"))
                .count())
        collapsed = nd_in.join(surv.filter("count = 1"), "b").count()
        merged = live - nd_in.join(surv, "b").count()
        invariants["minhash"] = {
            "live_clusters": live, "fully_collapsed": collapsed,
            "merged_into_siblings": merged}
        assert collapsed + merged >= 0.95 * live, invariants["minhash"]

        # s5: sequence packing — token conservation
        from pythonql_spark.operators.packing import pack_sequences

        def s5():
            return pack_sequences(out4, 1024, shard_col="source")
        n5, out5 = run_stage(spark, "s5_pack", s5,
                             str(d / "s5"), max_exchanges=2, rows=rows)
        tok_direct = out4.selectExpr(
            f"sum({token_count('text')}) as t").head().t
        tok_packed = out5.selectExpr("sum(n_tokens) as t").head().t
        invariants["pack"] = {
            "rows": n5, "expected_rows": n_kept,
            "tokens": int(tok_packed), "tokens_direct": int(tok_direct)}
        assert (invariants["pack"]["rows"]
                == invariants["pack"]["expected_rows"]
                and tok_packed == tok_direct), invariants["pack"]

        # s6: training shards + manifest
        rps = 100_000
        before6 = stage_totals(spark)
        t0 = time.perf_counter()
        with_tok = out4.selectExpr(
            "doc_id", "domain", "lang", "source", "text",
            f"{token_count('text')} as n_tokens")
        manifest = write_training_shards(
            with_tok, str(d / "shards"), rows_per_shard=rps,
            order_col="doc_id", token_col="n_tokens")
        m = manifest.collect()
        delta = {k: v - before6[k]
                 for k, v in stage_totals(spark).items()}
        rows.append({
            "stage": "s6_shards", "rows_out": len(m),
            "wall_sec": round(time.perf_counter() - t0, 2),
            "task_time_sec": round(delta["executorRunTime"] / 1000, 1),
            "metrics_mb": {k: round(v / 2**20, 1)
                           for k, v in delta.items()
                           if k.endswith("Bytes") or "Spilled" in k}})
        print(json.dumps(rows[-1]), flush=True)
        full = [r for r in m if r.shard < max(x.shard for x in m)] \
            if len(m) > 1 else []
        invariants["shards"] = {
            "n_shards": len(m),
            "manifest_rows": int(sum(r.n_rows for r in m)),
            "expected_rows": n_kept,
            "manifest_tokens": int(sum(r.n_tokens for r in m)),
            "uniform_full_shards": all(r.n_rows == rps for r in full)}
        assert (invariants["shards"]["manifest_rows"] == n_kept
                and invariants["shards"]["manifest_tokens"] == tok_direct
                and invariants["shards"]["uniform_full_shards"]), \
            invariants["shards"]

        total_wall = round(time.perf_counter() - wall0, 2)
        spill = sum(r["metrics_mb"].get("memoryBytesSpilled", 0)
                    + r["metrics_mb"].get("diskBytesSpilled", 0)
                    for r in rows)
        summary = {"pipeline": f"crawl_curation_x{reps}",
                   "crawl_records": n_crawl, "docs": n_docs,
                   "rows_final": n_kept,
                   "wall_sec_total": total_wall,
                   "sec_per_1k_docs": round(1000 * total_wall / n_docs, 3),
                   "spill_mb_total": round(spill, 1),
                   "stages": rows, "invariants": invariants}
        print(json.dumps(summary), flush=True)
        shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
