"""Symmetric per-vector int8 embedding quantization + quantized ANN.

The standard memory/bandwidth lever for vector search at corpus scale
(FAISS ``SQ8``, Milvus/pgvector int8): store ``round(x / qscale)``
with ``qscale = max|x| / 127`` per vector — a 4× cut vs float32 —
and rank by cosine over the CODES.  Per-vector symmetric scaling
cancels in cosine, so the quantized ranking needs only EXACT integer
dot products (≤ 127²·dim per pair, far inside both int64 and the
2^53 double-exact window): every engine computes the identical
number, which is what lets the DuckDB oracle replay the whole
pipeline bit-for-bit — quantization is elementwise IEEE double
arithmetic (``floor(x / qscale + 0.5)``) and scoring is integer math.

Scale shape: quantize is one narrow Arrow pass (no shuffle); top-k is
broadcast-probe × streamed corpus with a per-query WindowGroupLimit —
the |Q|×|C| score matrix never shuffles, matching ``brute_topk``.
No reference analog (the reference engine has no vector types);
complements the PQ/IVF-PQ family (operators/pq.py) at the other end
of the accuracy/compression trade-off.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

Q8_MAX = 127

# unrolled-SQL vs Arrow threshold, same rationale as
# similarity.CODEGEN_DIM_LIMIT: tiny dims keep the textual form that
# is character-identical to the oracle; real embedding dims take the
# vectorized path, whose elementwise float64 ops produce the same
# bits anyway (verified by the full value oracle at dim 64).
CODEGEN_DIM_LIMIT = 16


def _el(vec_col: str, i: int, dialect: str) -> str:
    return (f"element_at({vec_col}, {i + 1})" if dialect == "spark"
            else f"{vec_col}[{i + 1}]")


def q8_scale_expr(vec_col: str, dim: int, dialect: str = "spark") -> str:
    """``max|x| / 127`` as a SQL string (both dialects).  dim == 1
    skips greatest(): Spark requires ≥2 arguments (ADVICE r8)."""
    terms = [f"abs(cast({_el(vec_col, i, dialect)} as double))"
             for i in range(dim)]
    mx = terms[0] if dim == 1 else f"greatest({', '.join(terms)})"
    return f"({mx} / {float(Q8_MAX)!r})"


def q8_code_exprs(vec_col: str, dim: int, scale: str,
                  dialect: str = "spark") -> list[str]:
    """Per-element int8 code expressions: ``floor(x / qscale + 0.5)``
    — round-half-up via floor, because ``round()``'s half-way rule is
    the one spot where engines disagree."""
    return [f"(CASE WHEN {scale} = 0.0 THEN 0 ELSE "
            f"cast(floor(cast({_el(vec_col, i, dialect)} as double) "
            f"/ {scale} + 0.5) as bigint) END)"
            for i in range(dim)]


def _dim(df: DataFrame, col: str) -> int:
    row = (df.select(F.size(F.col(col)).alias("d"))
           .filter(F.col("d").isNotNull()).first())
    if row is None:
        raise ValueError(f"no non-null vectors in {col!r}")
    return int(row["d"])


def _np_codes(A: "np.ndarray") -> tuple["np.ndarray", "np.ndarray"]:
    """(codes int64, qscale float64) — the same elementwise IEEE
    double chain as :func:`q8_code_exprs`."""
    A = A.astype(np.float64)
    mx = np.abs(A).max(axis=1)
    sc = mx / float(Q8_MAX)
    safe = np.where(sc == 0.0, 1.0, sc)
    C = np.floor(A / safe[:, None] + 0.5).astype(np.int64)
    C[sc == 0.0] = 0
    return C, sc


def quantize_embeddings(df: DataFrame, *, vec_col: str = "embedding",
                        dim: int | None = None,
                        out_col: str = "q8") -> DataFrame:
    """Add ``out_col`` (array<bigint> codes) + ``qscale`` (double).
    Dim-thresholded: unrolled codegen'd expressions at tiny dims, one
    Arrow pass above — both compute the identical doubles."""
    dim = dim or _dim(df, vec_col)
    if dim <= CODEGEN_DIM_LIMIT:
        scale = q8_scale_expr(vec_col, dim, "spark")
        codes = ", ".join(q8_code_exprs(vec_col, dim, scale, "spark"))
        return df.selectExpr("*", f"array({codes}) as {out_col}",
                             f"{scale} as qscale")

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<codes: array<bigint>, qscale: double>")
    def q8(a: pd.Series) -> pd.DataFrame:
        if len(a) == 0:
            return pd.DataFrame({"codes": [], "qscale": []})
        C, sc = _np_codes(np.vstack(a.to_numpy()))
        return pd.DataFrame({"codes": list(C), "qscale": sc})

    packed = df.withColumn("_q8", q8(F.col(vec_col)))
    return (packed.withColumn(out_col, F.col("_q8.codes"))
            .withColumn("qscale", F.col("_q8.qscale")).drop("_q8"))


def _int_norm2(codes_col: str):
    """Σ c² as an exact int64 Column (one Arrow pass)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def n2(c: pd.Series) -> pd.Series:
        if len(c) == 0:
            return pd.Series([], dtype="int64")
        C = np.vstack(c.to_numpy()).astype(np.int64)
        return pd.Series(np.einsum("ij,ij->i", C, C))

    return n2(F.col(codes_col))


def quantize_index(df: DataFrame, *, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   dim: int | None = None) -> DataFrame:
    """The stored int8 index rows: (id, codes, exact ∫norm²) — what a
    persisted or incrementally-maintained index lands on disk; the
    raw float vectors never need to."""
    qz = quantize_embeddings(df, vec_col=vec_col, dim=dim)
    return qz.select(F.col(id_col), F.col("q8"),
                     _int_norm2("q8").alias("n2"))


def int8_topk(df: DataFrame, query_ids, k: int = 5,
              id_col: str = "vec_id", vec_col: str = "embedding",
              dim: int | None = None,
              encoded: DataFrame | None = None) -> DataFrame:
    """Exact top-k cosine over int8 codes: quantize once, broadcast
    the query rows, integer dot per pair (Arrow int64 einsum — exact),
    per-query top-k via WindowGroupLimit.  Column shape matches
    ``brute_topk`` (q_id, n_id, cosine, rank).

    Pass ``encoded`` (a :func:`quantize_index` frame, e.g. read back
    from :func:`~pythonql_spark.streaming.ingest.int8_index_ingest_
    stream`'s sink) to search a pre-built index: only the query rows
    are quantized, the corpus side scans codes — the encode-once /
    search-many deployment shape."""
    from pyspark.sql.functions import pandas_udf

    if encoded is not None:
        base = encoded.select(F.col(id_col).alias("n_id"),
                              F.col("q8").alias("c_vec"),
                              F.col("n2").alias("c_n2"))
    else:
        base = quantize_index(df, id_col=id_col, vec_col=vec_col,
                              dim=dim).select(
            F.col(id_col).alias("n_id"), F.col("q8").alias("c_vec"),
            F.col("n2").alias("c_n2"))
    qs = F.broadcast(
        quantize_index(df.filter(F.col(id_col).isin(list(query_ids))),
                       id_col=id_col, vec_col=vec_col, dim=dim)
        .select(F.col(id_col).alias("q_id"), F.col("q8").alias("q_vec"),
                F.col("n2").alias("q_n2")))

    @pandas_udf("double")
    def icos(a: pd.Series, b: pd.Series, na2: pd.Series,
             nb2: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = np.vstack(a.to_numpy()).astype(np.int64)
        B = np.vstack(b.to_numpy()).astype(np.int64)
        dot = np.einsum("ij,ij->i", A, B).astype(np.float64)
        den = np.sqrt((na2.to_numpy() * nb2.to_numpy()).astype(np.float64))
        return pd.Series(np.round(dot / den, 6))

    scored = (base.crossJoin(qs)
              .filter(F.col("q_id") != F.col("n_id"))
              .select("q_id", "n_id",
                      icos("q_vec", "c_vec", "q_n2", "c_n2")
                      .alias("cosine")))
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                      F.col("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "n_id", "cosine", "rank"))


# ---------------------------------------------------------- oracle SQL

def quantize_oracle_sql(dim: int, *, table: str = "embeddings",
                        vec_col: str = "embedding",
                        select: str = "vec_id, label") -> str:
    """DuckDB mirror of the quantize pass, pinning every code through
    an md5 of the comma-joined array."""
    scale = q8_scale_expr(vec_col, dim, "duck")
    codes = ", ".join(q8_code_exprs(vec_col, dim, "qscale", "duck"))
    return f"""
WITH m AS (SELECT {select}, {vec_col}, {scale} AS qscale FROM {table}),
q AS (SELECT {select}, qscale, [{codes}] AS codes FROM m)
SELECT {select}, cast(round(qscale, 6) as double) AS qscale,
       md5(array_to_string(codes, ',')) AS q8_md5
FROM q
"""


def int8_topk_oracle_sql(dim: int, query_ids, k: int = 5, *,
                         table: str = "embeddings",
                         vec_col: str = "embedding",
                         id_col: str = "vec_id") -> str:
    """DuckDB mirror of :func:`int8_topk`: same quantization chain,
    exact integer dot (every term < 2^53, so double sums are exact),
    same rounded cosine and tie-break."""
    scale = q8_scale_expr(vec_col, dim, "duck")
    codes = ", ".join(q8_code_exprs(vec_col, dim, "qscale", "duck"))
    ids = ", ".join(str(int(i)) for i in query_ids)
    return f"""
WITH m AS (SELECT {id_col}, {vec_col}, {scale} AS qscale FROM {table}),
q AS (SELECT {id_col}, [{codes}] AS codes FROM m),
n AS (SELECT {id_col}, codes,
             cast(list_sum([c * c for c in codes]) as bigint) AS n2
      FROM q),
p AS (SELECT a.{id_col} AS q_id, b.{id_col} AS n_id,
             round(cast(list_sum([a.codes[i] * b.codes[i]
                                  for i in generate_series(1, {dim})])
                        as double)
                   / sqrt(cast(a.n2 * b.n2 as double)), 6) AS cosine
      FROM n a JOIN n b ON a.{id_col} IN ({ids})
                       AND a.{id_col} != b.{id_col}),
r AS (SELECT q_id, n_id, cosine,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cosine DESC, n_id) AS rank
      FROM p)
SELECT q_id, n_id, cosine, cast(rank as int) AS rank
FROM r WHERE rank <= {k}
"""
