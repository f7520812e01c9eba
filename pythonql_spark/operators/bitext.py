"""Margin-based bitext mining over embedding columns.

The standard parallel-corpus mining step for multilingual training
data (Artetxe & Schwenk, "Margin-based Parallel Corpus Mining with
Multilingual Sentence Embeddings", ACL 2019; the LASER / CCMatrix
pipeline): a source/target pair scores by its cosine RELATIVE to how
close each side is to its own k-nearest neighbourhood —

    margin(x, y) = cos(x, y) /
        ((avgNN_k(x, tgt) + avgNN_k(y, src)) / 2)

which suppresses "hub" vectors that are close to everything and is
far more precise than an absolute cosine threshold.

Scale shape: both directions reuse :func:`similarity.knn_join`
(broadcast probe side, per-Arrow-batch partial top-k — the |S|×|T|
score matrix never materializes; at 100 TB mine per language-pair
chunk with the probe side bounded, knn_join's documented contract).
Exactness: the margin is a ratio of exact-millionth quantities and
can land exactly ON a rounding boundary, where double `round()`
diverges between engines (observed at sf0.001).  So the margin is
computed in INTEGER arithmetic end-to-end — cosines as bigint
millionths, neighbourhood sums as bigint, the ratio by cross-
multiplied integer division — and surfaced as ``margin_e6`` (margin
× 10⁶, floor).  Bit-identical across engines and partitionings by
construction; the DuckDB oracle replays the same integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import knn_join

# cosine is np.round(x, 6): ×1e6 is within 1e-9 of an integer, so
# round() recovers the exact millionth count identically in every
# engine — from there everything is bigint math.
_COS_M = "cast(round(cosine * 1000000) as bigint)"


def mine_bitext(src: DataFrame, tgt: DataFrame, *, k: int = 4,
                threshold: float = 1.0, mutual: bool = True,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Mine aligned (src_id, tgt_id, cosine, margin) pairs.

    ``mutual=True`` keeps a pair only when each side is the other's
    best margin-scored candidate (ratio-margin is symmetric, so this
    is rank-1 of the shared candidate set on both keys).  Ids must be
    disjoint only per side (src and tgt may overlap freely).

    Returns (src_id, tgt_id, cosine, margin_e6): ``margin_e6`` is
    ``floor(margin × 10⁶)`` — exact bigint, see module docstring."""
    fwd = knn_join(src, tgt, k=k, q_id_col=id_col, c_id_col=id_col,
                   vec_col=vec_col)
    bwd = knn_join(tgt, src, k=k, q_id_col=id_col, c_id_col=id_col,
                   vec_col=vec_col)
    nn_x = (fwd.groupBy("q_id")
            .agg(F.expr(f"sum({_COS_M})").alias("sx"),
                 F.count(F.lit(1)).alias("cx"))
            .withColumnRenamed("q_id", "src_id"))
    nn_y = (bwd.groupBy("q_id")
            .agg(F.expr(f"sum({_COS_M})").alias("sy"),
                 F.count(F.lit(1)).alias("cy"))
            .withColumnRenamed("q_id", "tgt_id"))
    # candidates: union of both directions' top-k (either side may
    # surface the true pair), deduped on the pair key
    cand = (fwd.select(F.col("q_id").alias("src_id"),
                       F.col("n_id").alias("tgt_id"), "cosine")
            .unionByName(
                bwd.select(F.col("n_id").alias("src_id"),
                           F.col("q_id").alias("tgt_id"), "cosine"))
            .groupBy("src_id", "tgt_id")
            .agg(F.max("cosine").alias("cosine")))
    # margin = cos / ((sx/cx + sy/cy) / 2)  ⇒  in millionths:
    # 2·cos_m·cx·cy·10⁶ div (sx·cy + sy·cx) — all bigint, exact.
    scored = (cand.join(nn_x, "src_id").join(nn_y, "tgt_id")
              .withColumn("margin_e6", F.expr(
                  "CASE WHEN sx * cy + sy * cx > 0 THEN "
                  f"(2 * {_COS_M} * cx * cy * 1000000L) div "
                  "(sx * cy + sy * cx) END"))
              .filter(F.col("margin_e6") >= int(round(threshold * 1e6)))
              .select("src_id", "tgt_id", "cosine", "margin_e6"))
    if not mutual:
        return scored
    from pyspark.sql.window import Window as W
    ws = W.partitionBy("src_id").orderBy(F.col("margin_e6").desc(),
                                         F.col("cosine").desc(),
                                         F.col("tgt_id"))
    wt = W.partitionBy("tgt_id").orderBy(F.col("margin_e6").desc(),
                                         F.col("cosine").desc(),
                                         F.col("src_id"))
    return (scored
            .withColumn("r_s", F.row_number().over(ws))
            .withColumn("r_t", F.row_number().over(wt))
            .filter("r_s = 1 AND r_t = 1")
            .select("src_id", "tgt_id", "cosine", "margin_e6"))


def bitext_oracle_sql(*, k: int = 4, threshold: float = 1.0,
                      mutual: bool = True, src_where: str,
                      tgt_where: str, dim: int,
                      table: str = "embeddings",
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> str:
    """DuckDB replay of :func:`mine_bitext` for the driver oracle:
    same rounded cosine (explicit left-to-right sum, 1-based lists),
    same exact bigint margin arithmetic, same tiebreaks."""
    from .similarity import cosine_expr

    cos = cosine_expr(f"s.{vec_col}", f"t.{vec_col}", dim, base=1)
    mutual_sql = ("QUALIFY row_number() OVER (PARTITION BY src_id "
                  "ORDER BY margin_e6 DESC, cosine DESC, tgt_id) = 1 "
                  "AND row_number() OVER (PARTITION BY tgt_id "
                  "ORDER BY margin_e6 DESC, cosine DESC, src_id) = 1"
                  if mutual else "")
    return f"""
WITH s AS (SELECT * FROM {table} WHERE {src_where}),
     t AS (SELECT * FROM {table} WHERE {tgt_where}),
pairs AS (
  SELECT s.{id_col} AS src_id, t.{id_col} AS tgt_id, {cos} AS cosine
  FROM s, t),
fwd AS (SELECT * FROM pairs
        QUALIFY row_number() OVER (PARTITION BY src_id
                 ORDER BY cosine DESC, tgt_id) <= {k}),
bwd AS (SELECT * FROM pairs
        QUALIFY row_number() OVER (PARTITION BY tgt_id
                 ORDER BY cosine DESC, src_id) <= {k}),
nn_x AS (SELECT src_id,
                sum(cast(round(cosine * 1000000) as bigint)) AS sx,
                count(*) AS cx
         FROM fwd GROUP BY src_id),
nn_y AS (SELECT tgt_id,
                sum(cast(round(cosine * 1000000) as bigint)) AS sy,
                count(*) AS cy
         FROM bwd GROUP BY tgt_id),
cand AS (
  SELECT src_id, tgt_id, max(cosine) AS cosine FROM (
    SELECT * FROM fwd UNION ALL SELECT * FROM bwd)
  GROUP BY src_id, tgt_id)
SELECT src_id, tgt_id, cosine,
       cast((2 * cast(round(cosine * 1000000) as bigint) * cx * cy
             * 1000000) // (sx * cy + sy * cx) as bigint) AS margin_e6
FROM cand JOIN nn_x USING (src_id) JOIN nn_y USING (tgt_id)
WHERE sx * cy + sy * cx > 0
  AND cast((2 * cast(round(cosine * 1000000) as bigint) * cx * cy
            * 1000000) // (sx * cy + sy * cx) as bigint)
      >= {int(round(threshold * 1e6))}
{mutual_sql}
"""
