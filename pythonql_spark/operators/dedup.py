"""Deduplication operators for training-data pipelines, designed for
the 100 TB regime: no O(n²) comparisons — candidate generation is
always a bucket join (exact hash, LSH band, or simhash band), with an
optional exact-similarity verify pass on candidates only.

* exact_dedup        — hash-groupBy keep-first (one shuffle)
* minhash_lsh_pairs  — word-shingle MinHash signatures → banded LSH
                       bucket join → Jaccard verify (all JVM-side:
                       xxhash64 + higher-order array functions)
* simhash_pairs      — 64-bit SimHash → band bucket join → hamming
                       verify via bit_count(xor)
* ngram_jaccard_pairs— exact n-gram Jaccard over a bounded candidate
                       join (same-key blocking)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pythonql_spark.operators.text import fingerprint


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per normalized-text fingerprint.

    groupBy(min) + semi-join back would scan twice; a window
    row_number needs a full sort per key.  min-id via groupBy then
    broadcast-friendly join is the classic; here: single shuffle
    groupBy fingerprint with min_by (keeps whole row)."""
    fp = F.expr(fingerprint(text_col))
    return (df.withColumn("__fp", fp)
            .groupBy("__fp")
            .agg(F.min(id_col).alias(id_col),
                 F.count(F.lit(1)).alias("dup_count"))
            .drop("__fp"))


def word_ngrams(text_col: str, n: int = 3) -> str:
    """Word n-gram shingles as an expression (JVM higher-order fns)."""
    w = f"split(trim(lower({text_col})), '\\\\s+')"
    return (f"CASE WHEN size({w}) < {n} THEN array(concat_ws(' ', {w})) "
            f"ELSE transform(sequence(1, size({w}) - {n} + 1), "
            f"i -> concat_ws(' ', slice({w}, i, {n}))) END")


def minhash_signature(text_col: str, num_hashes: int = 64, n: int = 3) -> str:
    """MinHash signature as array<bigint>: for seed i, min over
    shingles of xxhash64(shingle, i)."""
    sh = word_ngrams(text_col, n)
    return (f"transform(sequence(0, {num_hashes - 1}), "
            f"i -> array_min(transform({sh}, s -> xxhash64(s, i))))")


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", *,
                      num_hashes: int = 64, bands: int = 16,
                      ngram: int = 3,
                      jaccard_threshold: float | None = 0.5,
                      max_bucket_size: int = 500) -> DataFrame:
    """Near-duplicate candidate pairs (id_a < id_b) via banded MinHash
    LSH, optionally verified with exact n-gram Jaccard.

    Plan shape: scan → signature (no shuffle) → explode bands (×bands)
    → shuffle on (band, band_hash) via self-join → pairs; candidate
    count is data-dependent, never O(n²).

    ``max_bucket_size`` is the skew guard that keeps it that way:
    degenerate buckets (boilerplate/empty shingle sets hashing
    together) otherwise produce quadratic within-bucket pairs — the
    classic LSH-dedup failure at corpus scale.  Oversized buckets are
    dropped (their members still pair up via their other, more
    selective bands)."""
    r = num_hashes // bands
    sig = minhash_signature(text_col, num_hashes, ngram)
    buckets = (df
               .select(F.col(id_col).alias("id"),
                       F.expr(sig).alias("sig"))
               .select("id",
                       F.explode(F.expr(
                           f"transform(sequence(0, {bands - 1}), "
                           f"b -> struct(b as band, "
                           f"xxhash64(concat_ws(',', slice(sig, b * {r} + 1, {r})), 777) as h))"
                       )).alias("bk"))
               .select("id", "bk.band", "bk.h"))
    from pyspark.sql.window import Window as W
    bucket_sz = (buckets
                 .withColumn("__sz", F.count(F.lit(1)).over(
                     W.partitionBy("band", "h")))
                 .filter((F.col("__sz") >= 2) & (F.col("__sz") <= max_bucket_size))
                 .drop("__sz"))
    pairs = (bucket_sz.alias("a")
             .join(bucket_sz.alias("b"),
                   on=[F.col("a.band") == F.col("b.band"),
                       F.col("a.h") == F.col("b.h"),
                       F.col("a.id") < F.col("b.id")])
             .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
             .distinct())
    if jaccard_threshold is None:
        return pairs
    # verify pass on candidates only
    grams = F.expr(f"array_distinct({word_ngrams(text_col, ngram)})")
    docs = df.select(F.col(id_col).alias("id"), grams.alias("grams"))
    return (pairs
            .join(docs.withColumnRenamed("id", "id_a")
                      .withColumnRenamed("grams", "grams_a"), "id_a")
            .join(docs.withColumnRenamed("id", "id_b")
                      .withColumnRenamed("grams", "grams_b"), "id_b")
            .withColumn("jaccard", F.expr(
                "cast(size(array_intersect(grams_a, grams_b)) as double) / "
                "cast(size(array_union(grams_a, grams_b)) as double)"))
            .filter(F.col("jaccard") >= jaccard_threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))


def simhash_expr(text_col: str, bits: int = 64) -> str:
    """64-bit SimHash over word hashes, pure JVM: for each bit b, sum
    ±1 across word hashes; bit set iff the sum is positive."""
    w = f"array_distinct(split(trim(lower({text_col})), '\\\\s+'))"
    # bit b contribution of word s: sign of bit b of xxhash64(s)
    return (f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), "
            f"(acc, b) -> acc + CASE WHEN "
            f"aggregate({w}, 0, (c, s) -> c + CASE WHEN (shiftright(xxhash64(s), b) & 1) = 1 "
            f"THEN 1 ELSE -1 END) > 0 THEN shiftleft(cast(1 as bigint), b) ELSE cast(0 as bigint) END)")


def simhash_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", *,
                  band_bits: int = 16,
                  max_hamming: int = 3,
                  max_bucket_size: int = 500) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit hash into 64/band_bits
    buckets (a pair within hamming ≤ bands-1 shares ≥1 exact band),
    join on (band, band_value), verify with bit_count(xor).
    ``max_bucket_size`` guards degenerate buckets (see
    minhash_lsh_pairs)."""
    n_bands = 64 // band_bits
    sim = (df.select(F.col(id_col).alias("id"),
                     F.expr(simhash_expr(text_col)).alias("sh")))
    banded = sim.select(
        "id", "sh",
        F.explode(F.expr(
            f"transform(sequence(0, {n_bands - 1}), "
            f"b -> struct(b as band, "
            f"shiftright(sh, b * {band_bits}) & {(1 << band_bits) - 1} as v))"
        )).alias("bk")).select("id", "sh", "bk.band", "bk.v")
    from pyspark.sql.window import Window as W
    banded = (banded
              .withColumn("__sz", F.count(F.lit(1)).over(W.partitionBy("band", "v")))
              .filter((F.col("__sz") >= 2) & (F.col("__sz") <= max_bucket_size))
              .drop("__sz"))
    return (banded.alias("a")
            .join(banded.alias("b"),
                  on=[F.col("a.band") == F.col("b.band"),
                      F.col("a.v") == F.col("b.v"),
                      F.col("a.id") < F.col("b.id")])
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.expr("bit_count(a.sh ^ b.sh)").alias("hamming"))
            .distinct()
            .filter(F.col("hamming") <= max_hamming))


def ngram_jaccard_pairs(df: DataFrame, block_cols: list[str],
                        id_col: str = "doc_id", text_col: str = "text",
                        *, ngram: int = 2,
                        threshold: float = 0.3) -> DataFrame:
    """Exact word-ngram Jaccard over pairs within the same blocking
    key (never all-pairs).  Word lists are sorted-distinct so the
    intersect/union sizes are engine-portable."""
    grams = F.expr(f"array_sort(array_distinct({word_ngrams(text_col, ngram)}))")
    side = df.select(F.col(id_col).alias("id"), grams.alias("grams"),
                     *[F.col(c) for c in block_cols])
    a, b = side.alias("a"), side.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    cond.append(F.col("a.id") < F.col("b.id"))
    return (a.join(b, on=cond)
            .withColumn("jaccard", F.expr(
                "cast(size(array_intersect(a.grams, b.grams)) as double) / "
                "cast((size(a.grams) + size(b.grams) - size(array_intersect(a.grams, b.grams))) as double)"))
            .filter(F.col("jaccard") >= threshold)
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.round("jaccard", 6).alias("jaccard")))
