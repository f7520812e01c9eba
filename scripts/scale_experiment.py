"""Scaling experiment: replicate the sf0.1 corpus Nx (unique ids, a
per-replica suffix token so near-dup structure stays realistic) and
measure the dedup / decontamination / ANN operators at 1x, 4x, 16x —
plus a 64x octave for the heaviest operators (PQ ANN, bitext mining,
snapshot diff, the curation composition).

What this demonstrates (SURVEY §4): the candidate-generation operators
are bucket joins, so runtime should grow ~linearly with corpus size as
long as buckets stay bounded — the property that matters at 100 TB.

Run: python scripts/scale_experiment.py
Prints one line per (operator, scale): rows, wall seconds, sec/1x-unit.
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pythonql_spark import get_spark
from pythonql_spark.sources import load_table

SF = "/root/testdata/sf0.1"
SCRATCH = Path("/root/repo/.scratch/scale")


def replicate_docs(spark, n: int, path: str) -> None:
    docs = load_table(spark, SF, "documents")
    reps = spark.range(n).withColumnRenamed("id", "rep")
    (docs.crossJoin(F.broadcast(reps))
     .select((F.col("doc_id") * n + F.col("rep")).alias("doc_id"),
             F.concat("text", F.lit(" rtok"), F.col("rep").cast("string"))
              .alias("text"),
             "lang", "source", "n_chars")
     .write.mode("overwrite").parquet(path))


def replicate_embs(spark, n: int, path: str) -> None:
    emb = load_table(spark, SF, "embeddings")
    reps = spark.range(n).withColumnRenamed("id", "rep")
    # tiny deterministic per-replica rotation so vectors are distinct
    (emb.crossJoin(F.broadcast(reps))
     .select((F.col("vec_id") * n + F.col("rep")).alias("vec_id"),
             F.expr("transform(embedding, (x, i) -> x + 0.001 * rep * "
                    "(1 + i % 3))").alias("embedding"),
             "label")
     .write.mode("overwrite").parquet(path))


def _url_curation(docs, n: int) -> int:
    """The SAME messy-URL synthesis the url_curate oracle key uses
    (benchqueries._messy_url_expr — page-keyed hosts so the 3
    spelling variants of each page genuinely collapse 3→1), with
    host cardinality ∝ corpus the way a real crawl's domain count
    grows, through curate → url_norm dedup → domain cap."""
    from pyspark.sql.window import Window as W

    from pythonql_spark.benchqueries import _messy_url_expr
    from pythonql_spark.operators.url import curate_urls
    curated = curate_urls(docs.selectExpr(
        "doc_id", "n_chars",
        f"{_messy_url_expr('spark', n_hosts=1000 * n)} as url"))
    deduped = (curated.withColumn("__rn", F.row_number().over(
        W.partitionBy("url_norm").orderBy("doc_id")))
        .filter("__rn = 1").drop("__rn"))
    return (deduped.withColumn("__rn", F.row_number().over(
        W.partitionBy("domain").orderBy(F.col("n_chars").desc(),
                                        F.col("doc_id"))))
        .filter("__rn <= 10").count())


def _domain_cap_skew(docs, n: int) -> int:
    """domain_cap under the adversarial crawl mixture: ~20% of rows
    on ONE hot template domain (the skew case the cap exists for),
    5% non-http frontier garbage (NULL domain — ALL of it shares the
    single NULL cap bucket, the documented semantics), the rest on
    page-keyed registrable .co.uk domains growing ∝ corpus.  The cap
    must plan as WindowGroupLimit so each map task ships at most n
    rows per domain — the hot key and the NULL bucket are bounded
    exactly like the long tail, which is why sec/unit falls through
    the octaves instead of the hot domain's row count dominating."""
    from pythonql_spark.operators.url import domain_cap
    from pythonql_spark.plans import assert_plan
    k = 1000 * n
    pid = "cast(doc_id as string)"
    url = f"""CASE
      WHEN doc_id % 5 = 0
        THEN concat('https://hot.example.com/p/', {pid})
      WHEN doc_id % 20 = 1 THEN concat('ftp://junk', {pid}, '/f')
      ELSE concat('https://s', cast(doc_id % {k} as string),
                  '.co.uk/p/', {pid})
    END"""
    capped = domain_cap(
        docs.selectExpr("doc_id", "n_chars", f"{url} as url"),
        10, order=["n_chars desc", "doc_id"])
    assert_plan(capped, require_window_group_limit=True,
                no_cartesian=True, no_python_row_udf=True)
    return capped.count()


def replicate_events(spark, n: int, path: str) -> None:
    # distinct per-replica user spaces: per-key density stays constant
    # as the corpus grows, which is how real event data scales
    ev = load_table(spark, SF, "events")
    reps = spark.range(n).withColumnRenamed("id", "rep")
    (ev.crossJoin(F.broadcast(reps))
     .select((F.col("event_id") * n + F.col("rep")).alias("event_id"),
             "ts",
             (F.col("user_id") * n + F.col("rep")).alias("user_id"),
             "event_type", "value")
     .write.mode("overwrite").parquet(path))


def main() -> None:
    spark = get_spark("scale-exp")
    spark.sparkContext.setLogLevel("ERROR")
    from pythonql_spark.operators.asof import asof_join
    from pythonql_spark.operators.bpe import bpe_encode, train_bpe
    from pythonql_spark.operators.dedup import (dedup_keep,
                                                minhash_lsh_pairs,
                                                simhash_pairs)
    from pythonql_spark.operators.decontam import decontaminate
    from pythonql_spark.operators.dsir import dsir_logweights
    from pythonql_spark.operators.rangejoin import range_join
    from pythonql_spark.operators.retrieval import bm25_search
    from pythonql_spark.operators.bloom import decontaminate_bloom
    from pythonql_spark.operators.classifier import classify_quality
    from pythonql_spark.operators.profile import (check_expectations,
                                                  group_stats_filter,
                                                  percentile_normalize,
                                                  psi_drift)
    from pythonql_spark.operators.sampling import interleave_order
    from pythonql_spark.operators.sampling import (sample_exact_n_stratified,
                                                   select_to_budget)
    from pythonql_spark.operators.similarity import (brute_topk,
                                                     cluster_embeddings,
                                                     lsh_topk,
                                                     mine_hard_negatives,
                                                     semantic_dedup)
    from pythonql_spark.operators.bitext import mine_bitext
    from pythonql_spark.operators.window_clause import predicate_windows
    from pythonql_spark.operators.pq import ivfpq_topk, pq_topk
    from pythonql_spark.operators.quantize import int8_topk
    from pythonql_spark.operators import multimodal as MM
    from pythonql_spark.operators import text as TX
    from pythonql_spark.operators.cooccur import cooccurrence_pmi
    from pythonql_spark.operators.fuzzy import fuzzy_pairs
    from pythonql_spark.operators.graph import pagerank
    from pythonql_spark.operators.retrieval import docsim_cosine
    from pythonql_spark.operators.classifier import classification_report
    from pythonql_spark.operators.spans import (clone_pairs, dup_span_stats,
                                                winnow_fingerprints)
    from pythonql_spark.operators.timeseries import moving_agg
    from pythonql_spark.operators.timeseries import (merge_rollups,
                                                     rollup_delta)
    from pythonql_spark.operators.topk import top_k_per_group

    from pythonql_spark.operators.diff import snapshot_diff
    from pythonql_spark.operators.sketch import (cms_counters_md5,
                                                 hll_registers_keyed,
                                                 merge_registers_keyed,
                                                 sample_quantiles_md5)
    from pythonql_spark.benchqueries import (journey_default_rate,
                                             pql_burnrate, text_bpe_fixed)

    def _curation_composition(docs, n):
        from pythonql_spark.benchqueries import _LINED
        from pythonql_spark.operators.bloom import decontaminate_bloom
        from pythonql_spark.operators.text import c4_clean
        lined = docs.selectExpr("doc_id", "lang", "n_chars",
                                _LINED + " as text")
        c4 = (c4_clean(lined, min_words=4, min_lines=2,
                       extra_cols=["lang", "n_chars"])
              .filter("c4_keep")).localCheckpoint(eager=False)
        kept = c4.filter("doc_id % 97 != 0").select(
            "doc_id", "lang", "n_chars", "text")
        bench = c4.filter("doc_id % 97 = 0").select("text")
        flags = decontaminate_bloom(kept, bench, ngram=5,
                                    hash_fn="xxhash64")
        clean = kept.join(flags.filter("NOT contaminated")
                          .select("doc_id"), "doc_id")
        pct = percentile_normalize(
            clean.select("doc_id", "lang", "n_chars"), ["n_chars"])
        return select_to_budget(
            pct, "lang",
            {"en": 20000 * n, "de": 6000 * n, "fr": 6000 * n},
            size_col="n_chars", order="n_chars_pct DESC",
            default_budget=5000 * n)

    def attribution(ev):
        p = ev.filter("event_type = 'purchase'").select(
            F.col("event_id").alias("pid"), "user_id",
            (F.col("ts") - F.expr("INTERVAL 4 HOURS")).alias("lo"),
            F.col("ts").alias("hi"))
        c = ev.filter("event_type = 'click'").select(
            "user_id", F.col("ts").alias("cts"))
        return range_join(c, p, point="cts", start="lo", end="hi",
                          on="user_id", bin_width=4 * 3600)

    # the 64x octave runs only the heavyweights (the 16x evidence
    # covers the rest): one more doubling octave catches superlinear
    # terms the 16x point hides.  r8 adds the r7 newcomers (they
    # stopped at 16x) + fuzzy under the new auto-q guardrail.
    _64X_OPS = {"ann_pq", "bitext", "snap_diff", "curation",
                "winnow", "clones", "eval_cls", "moving_avg",
                "fuzzy", "docsim", "pagerank", "pmi", "phash",
                "ann_int8", "burnrate",
                # r9 newcomers: journey packs the whole event volume
                # (the collect_list shuffle is the thing to watch);
                # the sketches ride along — they're cheap and the
                # bounded-shuffle claim deserves the fourth point
                "journey", "hll_rollup", "cms", "bottomk_q",
                # r10: the PSL-backed curation composition
                "url_curate",
                # r11: the cap alone under hot-domain + NULL-bucket
                # skew (WindowGroupLimit retention plan-gated inline)
                "domain_cap"}
    results = []
    for n in (1, 4, 16, 64):
        d = SCRATCH / f"x{n}"
        replicate_docs(spark, n, str(d / "documents.parquet"))
        replicate_embs(spark, n, str(d / "embeddings.parquet"))
        replicate_events(spark, n, str(d / "events.parquet"))
        docs = spark.read.parquet(str(d / "documents.parquet"))
        embs = spark.read.parquet(str(d / "embeddings.parquet"))
        evs = spark.read.parquet(str(d / "events.parquet"))
        n_docs, n_vecs = docs.count(), embs.count()

        ops = {
            "minhash": lambda: minhash_lsh_pairs(docs).count(),
            "simhash": lambda: simhash_pairs(docs).count(),
            "decontam": lambda: decontaminate(
                docs.filter("doc_id % 50 != 0"),
                docs.filter("doc_id % 50 = 0"), ngram=5).count(),
            # full pipeline incl. connected components + anti-join:
            # rounds grow with log(cluster diameter), not corpus size
            "dedup_e2e": lambda: dedup_keep(
                docs, minhash_lsh_pairs(docs, jaccard_threshold=0.5)).count(),
            "ann_brute": lambda: brute_topk(
                embs, query_ids=list(range(10)), k=5,
                id_col="vec_id", vec_col="embedding").count(),
            "ann_lsh": lambda: lsh_topk(
                embs, query_ids=list(range(10)), k=5,
                id_col="vec_id", vec_col="embedding").count(),
            "range_join": lambda: attribution(evs).count(),
            "topk_group": lambda: top_k_per_group(
                evs.select("user_id", "event_id", "value"),
                "user_id", ["value desc", "event_id"], 3).count(),
            # incremental rollup: two disjoint halves rolled up
            # independently, merged by bucket algebra — merge cost is
            # |buckets|, so sec/unit should FALL as buckets saturate
            "rollup_incr": lambda: merge_rollups(
                rollup_delta(evs.filter("event_id % 2 = 0"), "ts", 3600,
                             keys=["event_type"]),
                rollup_delta(evs.filter("event_id % 2 = 1"), "ts", 3600,
                             keys=["event_type"])).count(),
            # exact-30-per-stratum: WindowGroupLimit ships ~n*|strata|
            # rows per map task regardless of corpus size
            "exact_strat": lambda: sample_exact_n_stratified(
                docs.select("doc_id", "lang", "source"), "lang", 30).count(),
            # one scan + a 1-row broadcast: should be scan-bound flat
            "bm25": lambda: bm25_search(
                docs, ["query", "join", "hash"], k=20).count(),
            # one explode + two <=4096-row bucket aggs broadcast back
            "dsir": lambda: dsir_logweights(docs, "lang = 'en'").count(),
            # k-gram hash groupBy + hash-keyed join back (longs only).
            # NB: aggregate over the computed columns — a bare count()
            # lets Catalyst ELIMINATE the cardinality-preserving left
            # joins and measure only the scan
            "dup_spans": lambda: int(dup_span_stats(docs, k=5).selectExpr(
                "sum(n_dup_kgrams)").collect()[0][0]),
            # bounded driver-side train + one Arrow encode pass (sum
            # over the encoding so the UDF can't be pruned away)
            "bpe_encode": lambda: bpe_encode(
                docs, train_bpe(docs, num_merges=120, sample_docs=256)
            ).selectExpr("sum(n_bpe_tokens)").collect()[0][0],
            # SemDeDup: cells -> within-cell pairs -> components ->
            # keep.  n_clusters grows with the corpus so cell sizes
            # stay bounded (the SemDeDup design point: cost Σ|cell|²,
            # k ∝ n keeps it linear)
            "sem_dedup": lambda: semantic_dedup(
                embs, threshold=0.95, n_clusters=64 * n,
                train_sample=8192).count(),
            # shuffle-free Arrow matmul assignment (aggregate over the
            # assignment so the UDF column isn't pruned)
            "cluster": lambda: int(cluster_embeddings(embs, 16).selectExpr(
                "count(1)", "sum(centroid_cos)").collect()[0][0]),
            # bloom decontamination: the reference folds into a FIXED
            # 128 KB bit array regardless of scale; probe is scan-fused
            # k-bit tests — cost should track the corpus scan alone.
            # xxhash64 is the production hash (the md5 path exists for
            # the DuckDB oracle; ~8x costlier per shingle)
            "bloom_decon": lambda: int(decontaminate_bloom(
                docs.filter("doc_id % 50 != 0"),
                docs.filter("doc_id % 50 = 0"), ngram=5,
                hash_fn="xxhash64")
                .selectExpr("sum(n_maybe)").collect()[0][0]),
            # learned classifier: bounded driver train (fixed sample
            # size at any scale) + one scan-fused scoring pass
            "quality_cls": lambda: int(classify_quality(
                docs, "contains(text, 'vector')", sample_docs=1024)
                .selectExpr("sum(abs(quality_logit))").collect()[0][0]),
            # global percentile calibration: range-partition + local
            # rank + broadcast offsets (NO single-task window) — cost
            # is one range exchange + one Arrow pass, ~linear
            "score_norm": lambda: int(percentile_normalize(
                docs.select("doc_id", "n_chars"), ["n_chars"]
            ).selectExpr("sum(n_chars_pct)").collect()[0][0]),
            # budget mixing with TWO huge strata — the adversarial
            # case for the old per-stratum window (each stratum one
            # task); the two-phase prefix sum keeps every partition
            # busy, so sec/unit should stay ~flat
            "mix_budget": lambda: select_to_budget(
                docs.selectExpr(
                    "doc_id", "n_chars",
                    "case when doc_id % 2 = 0 then 'a' else 'b' end as g"),
                "g", {"a": 40_000_000, "b": 500_000},
                size_col="n_chars").count(),
            # PQ ANN: bounded driver train (fixed-size sample at any
            # scale), one Arrow encode pass over the corpus, ADC
            # search over the m-byte code column with per-batch
            # partial top-k — only k x |Q| x batches rows shuffle, so
            # sec/unit should FALL toward the scan cost
            # composed IVF-PQ: the probe's plan-side cell filter keeps
            # the ADC stage at ~n_probe/n_cells of the code column, so
            # sec/unit should fall even faster than raw PQ
            "ann_ivfpq": lambda: ivfpq_topk(
                embs, query_ids=list(range(10)), k=5, n_cells=64,
                n_probe=8, m=16, nbits=8,
                id_col="vec_id", vec_col="embedding").count(),
            "ann_pq": lambda: pq_topk(
                embs, query_ids=list(range(10)), k=5, m=16, nbits=8,
                id_col="vec_id", vec_col="embedding").count(),
            # int8 (SQ8) quantized brute ANN: one Arrow quantize pass
            # + broadcast-probe integer-dot scoring — linear corpus scan
            "ann_int8": lambda: int8_topk(
                embs, query_ids=list(range(10)), k=5, dim=64).count(),
            # r9: burn-rate query shape (per-entity month grid as
            # per-row HOFs, one collect_list shuffle) — the pql()
            # front-end's nested-let machinery at growing event volume
            "burnrate": lambda: pql_burnrate(spark, str(d)).count(),
            # r9: production BPE Arrow encoder under the fixed merge
            # table (the oracled sibling's Spark side) — linear map
            "bpe_fixed": lambda: text_bpe_fixed(spark, str(d)).count(),
            # bitext mining, deployment shape: FIXED probe chunk
            # (mine per language-pair chunk at 100 TB — knn_join's
            # documented bounded-probe contract) against a corpus
            # that grows — per-batch BLAS partial top-k keeps it
            # linear in the corpus side
            "bitext": lambda: mine_bitext(
                embs.filter("label % 2 = 0 AND vec_id < 500"),
                embs.filter("label % 2 = 1"), k=4,
                threshold=1.0).count(),
            # predicate windows over a key count that GROWS with the
            # corpus (distinct per-replica user spaces): the sorted-run
            # mapInPandas dispatch ships one Arrow batch per core, so
            # sec/unit should stay ~flat — per-key applyInPandas would
            # pay one Arrow round-trip per key and blow up instead
            "pred_window": lambda: predicate_windows(
                evs.select("user_id", "ts", "value"),
                order_by=["ts"],
                start_when=lambda c, a, p, n: c["value"] > 150
                    and (p is None or p["value"] <= 150),
                end_when=lambda c, a, p, n, sc, sa:
                    (n is not None and n["value"] < sc["value"] * 0.5)
                    or (a - sa >= 8),
                partition_by="user_id", only_end=True).count(),
            # snapshot diff: one full-outer join on (key, 8-byte
            # hash) — shuffle carries hashes, output ∝ change (~3% of
            # the corpus here at every scale)
            "snap_diff": lambda: snapshot_diff(
                docs.select("doc_id", "text"),
                docs.filter("doc_id % 100 != 7").selectExpr(
                    "doc_id",
                    "case when doc_id % 100 = 3 "
                    "then concat(text, ' EDITED') else text end as text")
                .union(docs.filter("doc_id % 100 = 7").selectExpr(
                    "doc_id + 1000000000 as doc_id", "text")),
                key_col="doc_id", compare_cols=["text"]).count(),
            # the curation_v2 composition: C4 gate -> Bloom decontam
            # (fixed 128 KB bits) -> global percentile (one narrow
            # range exchange) -> budget mixing (two-phase prefix sum).
            # Four scale-safe stages; sec/unit should stay ~flat
            "curation": lambda: _curation_composition(docs, n).count(),
            # hard-negative mining: fixed anchor set (the deployment
            # shape — mine per training-batch chunk), corpus grows;
            # per-batch masked partial top-k keeps it linear in the
            # corpus scan, so sec/unit should FALL toward scan cost
            "mine_neg": lambda: mine_hard_negatives(
                embs.filter("vec_id < 10"), embs, k=5).count(),
            # PSI drift: two partial-aggregated (lang, bin) scans are
            # the only corpus-sized work; everything after runs on
            # |langs| x nbins rows — sec/unit should be ~flat
            "psi": lambda: psi_drift(
                docs.filter("doc_id % 2 = 0"),
                docs.filter("doc_id % 2 = 1"),
                "n_chars", 0.0, 600.0, 20, keys=["lang"]).count(),
            # group-stats gate: one partial agg on source + broadcast
            # join of survivor keys — corpus never shuffles, ~flat
            "src_filter": lambda: group_stats_filter(
                docs, ["source"],
                {"n_docs": "count(*)", "avg_chars": "avg(n_chars)"},
                "n_docs >= 10 AND avg_chars >= 290").count(),
            # expectation suite: one aggregate pass, verdicts on
            # |checks| rows — should track the scan alone
            "checks": lambda: check_expectations(docs, {
                "null_rate": ("avg(cast(text IS NULL as double))",
                              "value < 0.01"),
                "ids_unique": ("cast(count(*) - count(distinct doc_id) "
                               "as double)", "value = 0"),
            }).count(),
            # round-robin interleave: one range exchange + broadcast
            # per-stratum minima — ~the cost of one global sort, flat
            "interleave": lambda: interleave_order(
                docs.select("doc_id", "source", "n_chars"),
                "source", ["n_chars DESC", "doc_id"]).count(),
            # winnowing sketch: the per-doc window-min sort is the
            # one corpus shuffle; fingerprints/doc bounded by text
            # length, so sec/unit should track the scan
            "winnow": lambda: int(winnow_fingerprints(docs, k=5, w=4)
                                  .selectExpr("count(1)").collect()[0][0]),
            # clone detection: winnow → shared-fingerprint pair join,
            # bounded per fingerprint by the stop rule (≤ cap²/2
            # pairs/fp) — replicas share fingerprints, so pairs grow
            # ~n² per fp until the cap bites; the stop rule is what
            # keeps it from exploding
            "clones": lambda: clone_pairs(docs, k=5, w=4, min_shared=2,
                                          max_docs_per_fp=50).count(),
            # classification report: one partial-agg (label, pred)
            # groupBy; everything after is |classes|² rows — ~flat
            "eval_cls": lambda: int(classification_report(
                docs.selectExpr("lang", TX.lang_id("text") + " as pred"),
                "lang", "pred").selectExpr("sum(tp)").collect()[0][0]),
            # trailing time-RANGE window: one keyed shuffle shared by
            # all three aggregates; per-key density constant as users
            # scale out, so sec/unit should be ~flat (sum() over the
            # window output so Catalyst can't prune the frame)
            "moving_avg": lambda: int(moving_agg(
                evs.filter("event_type = 'purchase'")
                   .select("event_id", "user_id", "ts", "value"),
                "ts", "value", 3600, "user_id")
                .selectExpr("sum(mov_n)").collect()[0][0]),
            # fuzzy join: md5-suffix keys give ~zero OUTPUT pairs, so
            # what's measured is pure candidate generation.  q=None
            # engages the choose_q guardrail, which now MEASURES
            # prefix-bucket collision mass and grows q until
            # candidates ≤ 8/row (the old fixed q=2 — ≤256 hex bigram
            # buckets — measurably went quadratic here).  The suffix
            # is 10 hex chars so the key's entropy region can satisfy
            # the q·d+1 prefix-gram need; with the r7 6-char suffix
            # the shared 13-char text prefix makes TRUE candidate
            # structure superlinear at every q (measured 23–200 M for
            # q=4..9 at 64x) and choose_q RAISES — the loud-failure
            # path the r7 verdict asked for, unit-tested in
            # tests/test_operators.py::test_fuzzy_choose_q_guardrail.
            "fuzzy": lambda: fuzzy_pairs(
                docs.selectExpr(
                    "doc_id",
                    "substring(lower(text), 1, 12) || '-' || "
                    "substring(md5(cast(doc_id as string)), 1, 10) "
                    "as name"),
                "name", 1).count(),
            # sparse TF-IDF all-pairs: the df<=64 stop cut excludes
            # ever more base-corpus tokens as replicas multiply their
            # document frequency — postings build (scan-bound) is
            # what's measured
            "docsim": lambda: docsim_cosine(
                docs, threshold=0.3, max_df=64).count(),
            # PageRank over user->event-type edges: users grow with
            # the corpus, the 5 type nodes become super-hubs (degree
            # ∝ n) — the partial-agg groupBy must absorb them
            "pagerank": lambda: pagerank(
                evs.selectExpr(
                    "user_id * 2 as src",
                    "(abs(hash(event_type)) % 1024) * 2 + 1 as dst")
                .distinct(), iters=3).count(),
            # PMI: contexts (users) grow, the item vocabulary is
            # fixed — per-context pair join bounded by |items|²
            "pmi": lambda: cooccurrence_pmi(
                evs, "user_id", "event_type").count(),
            # perceptual hashing: render + real PNG decode + aHash +
            # banded self-join over the whole corpus — one Arrow pass
            # per stage, pair candidates sparse (distinct texts)
            "phash": lambda: MM.ahash_pairs(
                MM.image_ahash(
                    docs.select("doc_id", MM.make_media(
                        MM.render_text_png("text"), "image", "png",
                        8, 8).alias("media")))
                .select("doc_id", "ahash"), max_hamming=3).count(),
            # r9 md5-sketch family: the corpus-sized work is one scan
            # with a map-side partial max/sum, shuffle bounded at
            # |groups| x registers/slots rows at ANY input size — all
            # three should fall toward pure scan cost per unit
            "hll_rollup": lambda: merge_registers_keyed(
                hll_registers_keyed(
                    evs, {"hour": "date_trunc('hour', ts)"}, "user_id"),
                {"day": "cast(to_date(hour) as string)"}).count(),
            "cms": lambda: cms_counters_md5(evs, "user_id").count(),
            # bottom-k quantile sample: WindowGroupLimit ships <=k
            # rows per group per map task — the shuffle is bounded by
            # k x |groups| x tasks, not the corpus
            "bottomk_q": lambda: sample_quantiles_md5(
                evs, "value", "event_type", "event_id", k=256).count(),
            # r9 journey packing + per-row HOF analysis: ONE
            # collect_list shuffle, per-user state bounded by that
            # user's events (user count grows with the corpus, per-key
            # density constant) — sec/unit should be ~flat
            "journey": lambda: journey_default_rate(spark, str(d)).count(),
            # full URL curation (r10, PSL-backed): canonicalize
            # (arithmetic pct decode + one PSL broadcast join) →
            # exact dedup on url_norm → top-10-per-domain cap.
            # Domain count grows ∝ corpus (real crawls add sites as
            # they grow) so the cap's WindowGroupLimit bound and the
            # dedup shuffle both scale linearly — sec/unit ~flat
            "url_curate": lambda: _url_curation(docs, n),
            # the cap alone under 20%-hot-domain + 5%-non-http skew;
            # WindowGroupLimit retention is asserted inside
            "domain_cap": lambda: _domain_cap_skew(docs, n),
            # compound-key as-of: one sort-shuffle on (user, type)
            "asof_join": lambda: asof_join(
                evs.filter("event_type = 'purchase'")
                   .select("user_id", F.lit("x").alias("seg"), "ts",
                           F.col("value").alias("pv")),
                evs.filter("event_type = 'click'")
                   .select("user_id", F.lit("x").alias("seg"), "ts",
                           F.col("value").alias("cv")),
                on=["user_id", "seg"]).count(),
        }
        import os
        only = os.environ.get("SCALE_OPS")
        if only:
            ops = {k: v for k, v in ops.items() if k in only.split(",")}
        if n >= 64:
            ops = {k: v for k, v in ops.items() if k in _64X_OPS}
        for name, fn in ops.items():
            t0 = time.perf_counter()
            rows = fn()
            dt = time.perf_counter() - t0
            results.append((name, n, n_docs if "ann" not in name else n_vecs,
                            rows, dt))
            print(f"{name:10s} x{n:<3d} input={results[-1][2]:>9,d} "
                  f"rows={rows:>8,d}  {dt:7.2f}s  {dt / n:6.2f}s/unit",
                  flush=True)
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
