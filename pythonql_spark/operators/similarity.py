"""Similarity search over embedding columns (array<float>).

* dot / cosine — engine-portable expression built as an explicit
  left-to-right sum of element products, so Spark and DuckDB produce
  bit-identical doubles (no engine-internal accumulation order).
* brute_topk   — exact top-k neighbours for a set of query vectors:
  broadcast the queries, one pass over the corpus, per-query top-k via
  window row_number (TakeOrdered shape after AQE).
* cosine_pairs — near-duplicate pairs within a blocking key.
* lsh_topk     — random-hyperplane LSH: 16-bit signature buckets as
  candidate filter, exact cosine re-rank inside buckets.  The scale
  path: shuffles on bucket keys, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def dot_expr(a: str, b: str, dim: int, base: int = 0) -> str:
    """Explicit sum of products — deterministic accumulation order.
    ``base``: array index origin (Spark SQL brackets are 0-based,
    DuckDB lists are 1-based), letting the SAME formula serve as the
    engine expression and the DuckDB oracle."""
    return "(" + " + ".join(
        f"cast({a}[{i + base}] as double) * cast({b}[{i + base}] as double)"
        for i in range(dim)) + ")"


def norm_expr(a: str, dim: int, base: int = 0) -> str:
    return f"sqrt({dot_expr(a, a, dim, base)})"


def cosine_expr(a: str, b: str, dim: int, base: int = 0) -> str:
    return (f"round({dot_expr(a, b, dim, base)} / "
            f"({norm_expr(a, dim, base)} * {norm_expr(b, dim, base)}), 6)")


def _dim(df: DataFrame, col: str) -> int:
    row = df.select(F.size(F.col(col)).alias("d")).first()
    return int(row["d"])


def brute_topk(df: DataFrame, query_ids, k: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: queries × corpus (queries broadcast), then
    per-query top-k.  At 100 TB the corpus side streams; the only
    shuffle is the final per-query top-k (tiny)."""
    dim = _dim(df, vec_col)
    # norms once per vector (not per pair): the per-pair work drops to
    # one dot product + one divide
    qs = F.broadcast(
        df.filter(F.col(id_col).isin(list(query_ids)))
          .select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
                  F.expr(norm_expr(vec_col, dim)).alias("q_norm")))
    corpus = df.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("c_vec"),
                       F.expr(norm_expr(vec_col, dim)).alias("c_norm"))
    scored = (corpus.crossJoin(qs)
              .filter(F.col("q_id") != F.col("n_id"))
              .select(F.col("q_id"), F.col("n_id"),
                      F.expr(f"round({dot_expr('q_vec', 'c_vec', dim)} / "
                             f"(q_norm * c_norm), 6)").alias("cosine")))
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "n_id", "cosine", "rank"))


def cosine_pairs(df: DataFrame, block_col: str, threshold: float,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Near-duplicate embedding pairs within a blocking key."""
    dim = _dim(df, vec_col)
    side = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                     F.col(block_col).alias("blk"),
                     F.expr(norm_expr(vec_col, dim)).alias("nrm"))
    return (side.alias("a")
            .join(side.alias("b"),
                  on=[F.col("a.blk") == F.col("b.blk"),
                      F.col("a.id") < F.col("b.id")])
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.expr(f"round({dot_expr('a.v', 'b.v', dim)} / "
                           f"(a.nrm * b.nrm), 6)").alias("cosine"))
            .filter(F.col("cosine") >= threshold))


def lsh_signature_expr(vec_col: str, dim: int, n_planes: int = 16) -> str:
    """Random-hyperplane signature: bit p = sign of <v, h_p> where
    h_p[i] = ±1 derived from xxhash64(p, i) — deterministic, no
    stored projection matrix, computable at read time anywhere."""
    terms = lambda p: " + ".join(
        f"CASE WHEN (shiftright(xxhash64(cast({p} as bigint)), {i % 63}) & 1) = 1 "
        f"THEN cast({vec_col}[{i}] as double) ELSE -cast({vec_col}[{i}] as double) END"
        for i in range(dim))
    return ("(" + " + ".join(
        f"CASE WHEN ({terms(p)}) > 0 THEN {1 << p} ELSE 0 END"
        for p in range(n_planes)) + ")")


def lsh_topk(df: DataFrame, query_ids, k: int = 5, *,
             n_planes: int = 12, probe_hamming: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates = corpus vectors whose LSH
    signature is within ``probe_hamming`` bits of the query signature
    (bucket join on signature would miss near-boundary vectors; the
    hamming probe trades a wider candidate set for recall), then
    exact cosine re-rank."""
    dim = _dim(df, vec_col)
    sig = F.expr(lsh_signature_expr(vec_col, dim, n_planes))
    corpus = df.select(F.col(id_col).alias("n_id"),
                       F.col(vec_col).alias("c_vec"), sig.alias("c_sig"),
                       F.expr(norm_expr(vec_col, dim)).alias("c_norm"))
    qs = F.broadcast(
        df.filter(F.col(id_col).isin(list(query_ids)))
          .select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
                  sig.alias("q_sig"),
                  F.expr(norm_expr(vec_col, dim)).alias("q_norm")))
    cand = (corpus.join(qs,
                        F.expr(f"bit_count(c_sig ^ q_sig) <= {probe_hamming}")
                        & (F.col("n_id") != F.col("q_id"))))
    scored = cand.select(
        "q_id", "n_id",
        F.expr(f"round({dot_expr('q_vec', 'c_vec', dim)} / "
               f"(q_norm * c_norm), 6)").alias("cosine"))
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "n_id", "cosine", "rank"))
