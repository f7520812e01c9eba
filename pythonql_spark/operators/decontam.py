"""Benchmark decontamination for training corpora: score every corpus
document by its word n-gram overlap with a benchmark/eval set, so
contaminated docs can be dropped before training.

Scale shape (the benchmark is always the small side): the benchmark's
distinct shingle set is broadcast; the corpus is scanned once, its
shingles exploded and left-joined against the broadcast set, then ONE
map-side-combinable groupBy(doc) counts total vs matched shingles.  No
corpus shuffle other than the per-doc aggregation; never O(corpus ×
benchmark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pythonql_spark.operators.text import ngram_list, sql_str as _sql_str


def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text", *,
                  ngram: int = 5) -> DataFrame:
    """One row per corpus doc: ``(id_col, n_grams, n_matched,
    contamination)`` where contamination = matched distinct shingles /
    total distinct shingles.  Filter ``contamination > 0`` (or a
    threshold) downstream to drop contaminated docs."""
    grams = ngram_list(text_col, ngram, "spark")
    bench_grams = (benchmark
                   .select(F.explode(F.expr(grams)).alias("g"))
                   .distinct()
                   .withColumn("__hit", F.lit(1)))
    corpus_grams = corpus.select(
        F.col(id_col),
        F.explode(F.expr(f"array_distinct({grams})")).alias("g"))
    return (corpus_grams
            .join(F.broadcast(bench_grams), "g", "left")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.count("__hit").alias("n_matched"))
            .withColumn("contamination", F.round(
                F.col("n_matched").cast("double") /
                F.col("n_grams").cast("double"), 6)))


def decontaminate_multi(corpus: DataFrame, benchmarks: DataFrame,
                        bench_col: str = "bench",
                        id_col: str = "doc_id",
                        text_col: str = "text", *,
                        ngram: int = 5,
                        max_benchmarks: int = 63) -> DataFrame:
    """Per-(doc, benchmark) contamination against MANY eval sets in
    ONE corpus scan — production pipelines decontaminate against
    dozens of benchmarks, and scanning the corpus once per benchmark
    is the naive 100 TB mistake this operator exists to avoid.

    ``benchmarks`` holds (bench_col, text_col) rows.  Each distinct
    benchmark shingle carries a BITMASK of the (≤63, sorted-name
    indexed — bit 63 is the bigint sign bit and stays unused)
    benchmarks containing it; the broadcast shingle→mask map
    is at most one long bigger per row than the single-set variant.
    The corpus scan ORs nothing — per-doc, per-benchmark match counts
    are ``n_benchmarks`` codegen'd conditional sums over the joined
    mask, then the wide row unpivots to one output row per
    CONTAMINATED (doc, benchmark) pair: ``(id_col, bench, n_grams,
    n_matched, contamination)``.  Output ∝ contamination found, not
    |corpus| × |benchmarks|.  The benchmark NAME list (not the
    shingles) is a bounded driver collect, sorted for determinism."""
    names = sorted(r[0] for r in
                   benchmarks.select(bench_col).distinct().collect())
    if len(names) > min(max_benchmarks, 63):
        raise ValueError(
            f"{len(names)} benchmarks > max_benchmarks="
            f"{min(max_benchmarks, 63)} (the bitmask packs into one "
            "bigint's 63 value bits; shard the benchmark set to go "
            "wider)")
    grams = ngram_list(text_col, ngram, "spark")
    bidx = {n: i for i, n in enumerate(names)}
    mask_of = F.expr("cast(" + " + ".join(
        f"CASE WHEN {bench_col} = {_sql_str(n)} THEN {1 << bidx[n]} "
        "ELSE 0 END" for n in names) + " as bigint)")
    bench_grams = (benchmarks
                   .select(mask_of.alias("__m"),
                           F.explode(F.expr(f"array_distinct({grams})"))
                           .alias("g"))
                   .groupBy("g")
                   .agg(F.expr("bit_or(__m)").alias("__mask")))
    corpus_grams = corpus.select(
        F.col(id_col),
        F.explode(F.expr(f"array_distinct({grams})")).alias("g"))
    wide = (corpus_grams
            .join(F.broadcast(bench_grams), "g", "left")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 *[F.sum(F.expr(
                     f"CASE WHEN (__mask >> {i}) & 1 = 1 THEN 1 "
                     "ELSE 0 END")).alias(f"__m{i}")
                   for i in range(len(names))]))
    pairs = F.array(*[
        F.struct(F.lit(n).alias("bench"),
                 F.col(f"__m{bidx[n]}").alias("n_matched"))
        for n in names])
    return (wide.select(id_col, "n_grams",
                        F.explode(pairs).alias("p"))
            .filter("p.n_matched > 0")
            .select(F.col(id_col), F.col("p.bench").alias("bench"),
                    "n_grams", F.col("p.n_matched").alias("n_matched"),
                    F.round(F.col("p.n_matched").cast("double") /
                            F.col("n_grams").cast("double"), 6)
                    .alias("contamination")))


def decontaminate_multi_oracle_sql(bench_sql: str, *,
                                   id_col: str = "doc_id",
                                   text_col: str = "text",
                                   ngram: int = 5,
                                   corpus_table: str = "documents") -> str:
    """DuckDB mirror of :func:`decontaminate_multi`; ``bench_sql``
    yields (bench, text) rows."""
    grams = ngram_list(text_col, ngram, "duck")
    bgrams = ngram_list("text", ngram, "duck")
    return f"""
WITH bench AS ({bench_sql}),
bg AS (
  SELECT DISTINCT bench, unnest(list_distinct({bgrams})) AS g
  FROM bench),
cg AS (
  SELECT {id_col}, unnest(list_distinct({grams})) AS g
  FROM {corpus_table}),
tot AS (SELECT {id_col}, count(*) AS n_grams FROM cg GROUP BY 1),
hits AS (
  SELECT cg.{id_col}, bg.bench, count(*) AS n_matched
  FROM cg JOIN bg USING (g) GROUP BY 1, 2)
SELECT h.{id_col}, h.bench, t.n_grams, h.n_matched,
       round(h.n_matched / cast(t.n_grams as double), 6)
         AS contamination
FROM hits h JOIN tot t USING ({id_col})"""
