"""Corpus-curation walkthrough: the quality/dedup/shaping operators a
100 TB training-data build chains together, run end-to-end on the
synthetic documents table.  Run:  python examples/curation.py [SF_DIR]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pythonql_spark import get_spark
from pythonql_spark.sources import load_table


def incremental_refresh(spark, old_docs, new_docs, table_path: str, *,
                        n_shards: int = 8) -> dict:
    """Incremental corpus refresh: re-embed only changed docs,
    re-shard only touched shards.

    Composition of three operators: :func:`snapshot_diff` accounts
    for exactly what changed between corpus versions (one hash-only
    full-outer join — output ∝ change, not corpus); the expensive
    derived stage (here an embedding stand-in) runs ONLY on the
    added/changed keys; :func:`merge_upsert` rewrites ONLY the shard
    partitions those keys live in (copy-on-write at partition
    granularity — untouched shard files are never opened, proven
    byte-identical in tests/test_sources.py).  The shard key is a
    stable function of doc_id, so a doc's shard never moves between
    refreshes (merge_upsert's partition-pruned-merge contract).

    Removed keys are reported but left in place — whole-row upsert
    cannot delete; route removals as an explicit rewrite of their
    (equally prunable) shard partitions.

    Returns {"added": n, "changed": n, "removed": n, **merge_stats}.
    """
    from pythonql_spark.operators.diff import snapshot_diff
    from pythonql_spark.sources.catalog import merge_upsert

    def embed_and_shard(docs):
        # stand-in for the expensive per-doc stage (a GPU embedding
        # pass at 100 TB); deterministic so tests can cross-check the
        # incremental result against a full rebuild
        return docs.selectExpr(
            "doc_id", "text",
            "transform(sequence(0, 3), i -> round(sin(xxhash64(text, i)), 6))"
            " as embedding",
            f"pmod(xxhash64(doc_id), {n_shards}) as shard")

    diff = snapshot_diff(old_docs, new_docs, key_col="doc_id",
                         compare_cols=["text"]).cache()
    counts = {r["change"]: r["n"] for r in
              diff.groupBy("change").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    touched = diff.filter("change in ('added', 'changed')") \
        .select("doc_id")
    updates = embed_and_shard(new_docs.join(touched, "doc_id"))
    stats = merge_upsert(spark, table_path, updates, ["doc_id"],
                         partition_by=["shard"])
    diff.unpersist()
    return {"added": counts.get("added", 0),
            "changed": counts.get("changed", 0),
            "removed": counts.get("removed", 0), **stats}


def build_shard_table(spark, docs, table_path: str, *,
                      n_shards: int = 8) -> dict:
    """Initial full build of the sharded curated table (same derived
    stage + layout as :func:`incremental_refresh`)."""
    empty = docs.filter("1 = 0")
    return incremental_refresh(spark, empty, docs, table_path,
                               n_shards=n_shards)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("examples-curation")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()
    print(f"raw corpus: {n0} docs")

    # 0. pre-flight expectation gate: one aggregate pass over the raw
    #    snapshot BEFORE any expensive stage runs on it
    from pythonql_spark.operators.profile import check_expectations
    gate = check_expectations(docs, {
        "text_null_rate": ("avg(cast(text IS NULL as double))",
                           "value < 0.01"),
        "doc_id_unique": ("cast(count(*) - count(distinct doc_id) "
                          "as double)", "value = 0"),
        "langs_present": ("cast(count(distinct lang) as double)",
                          "value >= 3"),
    }).collect()
    for r in gate:
        print(f"  check {r.check_name}: value={r.value} "
              f"{'ok' if r.passed else 'FAIL'}")
    assert all(r.passed for r in gate), "snapshot failed pre-flight"

    # 1. C4 line surgery (terminal punctuation / min words / js lines
    #    dropped; lorem-ipsum & brace pages flagged), then the Gopher
    #    statistical gate — both pure scalar expressions fused into
    #    the scan
    from pythonql_spark.operators.text import c4_clean, gopher_pass
    c4 = c4_clean(docs, min_words=3, min_lines=1,
                  extra_cols=["lang", "source", "n_chars"])
    n_c4 = c4.filter("c4_keep").count()
    print(f"c4 line rules would keep {n_c4} pages — the synthetic "
          "corpus has no sentence punctuation, so the gate is "
          "reported, not applied, here")
    gated = docs.filter(F.expr(gopher_pass("text", min_words=10)))
    print(f"gopher gate: -> {gated.count()} docs")

    # 1b. benchmark decontamination at fixed memory: the eval set's
    #     shingles fold into a 128 KB Bloom bit array; docs whose
    #     shingles probably overlap it are dropped (false negatives
    #     impossible — the safe direction)
    from pythonql_spark.operators.bloom import decontaminate_bloom
    benchmark = docs.filter("doc_id % 97 = 0")       # stand-in eval set
    flags = decontaminate_bloom(gated, benchmark, ngram=5,
                                hash_fn="xxhash64")
    gated = (gated.join(flags.filter("NOT contaminated")
                        .select("doc_id"), "doc_id"))
    print(f"bloom decontamination: -> {gated.count()} docs")

    # 2. duplicate-SPAN stripping: verbatim repeated 5-grams survive
    #    only in their canonical (min-id) document
    from pythonql_spark.operators.spans import strip_dup_spans
    stripped = strip_dup_spans(gated.select("doc_id", "text"), k=5) \
        .join(gated.drop("text"), "doc_id")
    removed = stripped.agg(F.sum("n_removed_tokens")).first()[0]
    print(f"span strip: {removed} duplicated tokens removed")

    # 3. fluency scoring: interpolated bigram LM (corpus-trained),
    #    calibrated to per-language percentiles
    from pythonql_spark.operators.profile import percentile_normalize
    from pythonql_spark.operators.text import bigram_logprob
    scored = stripped.join(bigram_logprob(stripped), "doc_id")
    scored = percentile_normalize(scored, ["mean_bigram_logprob"],
                                  keys=["lang"])
    fluent = scored.filter("mean_bigram_logprob_pct >= 0.05")
    print(f"fluency floor (bottom 5% per lang dropped): "
          f"-> {fluent.count()} docs")

    # 3b. learned quality signal (fastText-style): trained driver-side
    #     on a bounded sample to imitate the rule gate, scored in one
    #     scan-fused pass — the cheap stand-in for an expensive
    #     labeler at 100 TB
    from pythonql_spark.operators.classifier import classify_quality
    fluent = classify_quality(
        fluent, gopher_pass("text", min_words=10), sample_docs=512)
    print("learned-vs-rule quality agreement:")
    (fluent.groupBy((F.col("quality_logit_prob") > 0.5).alias("model_keep"))
     .count().orderBy("model_keep").show())

    # 4. DSIR reshape toward the English target distribution
    from pythonql_spark.operators.dsir import dsir_resample
    shaped = dsir_resample(fluent, "lang = 'en'", rate=0.9)
    print("DSIR-reshaped language mix:")
    shaped.groupBy("lang").count().orderBy("lang").show()

    # 5. per-language char budgets, filled in fluency order
    from pythonql_spark.operators.sampling import (select_to_budget,
                                                   train_test_split)
    mixed = select_to_budget(
        shaped, "lang", {"en": 20000, "de": 6000, "fr": 6000},
        size_col="n_chars", order="mean_bigram_logprob_pct DESC",
        default_budget=4000)
    print("budget-mixed corpus:")
    (mixed.groupBy("lang")
     .agg(F.count(F.lit(1)).alias("docs"),
          F.sum("n_chars").alias("chars")).orderBy("lang").show())

    # 6. deterministic split — stable under growth and reruns
    final = train_test_split(mixed, {"train": 0.9, "val": 0.1}, seed=7)
    final.groupBy("split").count().orderBy("split").show()

    # 7. how much of the curated set is new vs the previous snapshot?
    #    (Theta sketch algebra — no distinct-join)
    from pythonql_spark.operators.sketch import set_sketch, sketch_overlap
    prev = docs.filter("doc_id % 3 != 0")  # stand-in for yesterday
    ov = sketch_overlap(set_sketch(mixed, "doc_id", lg_k=14),
                        set_sketch(prev, "doc_id", lg_k=14)).first()
    print(f"vs previous snapshot: {ov.n_only_a} new docs, "
          f"jaccard {ov.jaccard}")

    # 7b. gate whole SOURCES whose aggregate stats fail (the verdict
    #     is a property of the source, not the row), then check the
    #     curated set's length distribution didn't drift vs the
    #     previous snapshot (PSI per language)
    from pythonql_spark.operators.profile import group_stats_filter, psi_drift
    gated = group_stats_filter(
        mixed, ["source"],
        {"n_docs": "count(*)", "avg_chars": "avg(n_chars)"},
        "n_docs >= 5 AND avg_chars >= 250")
    drift = psi_drift(gated, prev, "n_chars", 0.0, 600.0, 20,
                      keys=["lang"]).orderBy("lang")
    print(f"source gate kept {gated.count()}/{mixed.count()} docs; "
          "PSI vs previous snapshot per lang:")
    drift.show()

    # 8. incremental refresh: diff the new snapshot against the old,
    #    re-embed only the changed docs, rewrite only their shards
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        table = f"{tmp}/curated"
        build_shard_table(spark, prev.select("doc_id", "text"), table)
        stats = incremental_refresh(
            spark, prev.select("doc_id", "text"),
            docs.select("doc_id", "text"), table)
        print(f"incremental refresh: {stats['added']} added, "
              f"{stats['changed']} changed, {stats['removed']} removed "
              f"-> {stats['rewritten_partitions']} of 8 shards rewritten")


if __name__ == "__main__":
    main()
