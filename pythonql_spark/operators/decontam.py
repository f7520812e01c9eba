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

from pythonql_spark.operators.text import ngram_list


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
