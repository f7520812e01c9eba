"""Sequence chunking and packing for LLM pretraining corpora.

* :func:`chunk_documents` — split long documents into overlapping
  fixed-token-window chunks (context-window preparation).  Pure
  per-row array expressions: no shuffle, no Python.
* :func:`pack_sequences` — concatenated-stream packing: documents are
  laid out in deterministic order within a shard and the stream is cut
  every ``max_tokens``; each doc gets its starting offset and the
  training-sequence id it starts in.  This is GPT-style pack-then-split
  (docs may straddle a boundary).  One window cumsum per shard — the
  shard key is the parallelism unit at scale, and the only shuffle.

Both emit Spark + DuckDB dialects from the same definitions so their
outputs are oracle-checked value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pythonql_spark.operators.text import token_count, _ws


def chunk_expr(text_col: str, chunk: int, overlap: int,
               dialect: str = "spark") -> str:
    """Array/list of (chunk_idx, chunk_text) structs: word windows of
    ``chunk`` tokens starting every ``chunk - overlap`` tokens.  A doc
    shorter than ``chunk`` yields one chunk; a trailing window keeps
    at least ``overlap + 1`` tokens."""
    if not 0 <= overlap < chunk:
        raise ValueError("need 0 <= overlap < chunk")
    stride = chunk - overlap
    if dialect == "spark":
        starts = f"sequence(1, greatest(size(w) - {overlap}, 1), {stride})"
        body = (f"transform({starts}, i -> struct("
                f"cast((i - 1) div {stride} as int) as chunk_idx, "
                f"concat_ws(' ', slice(w, i, {chunk})) as chunk_text))")
        return (f"transform(array(split(trim({text_col}), '{_ws('spark')}')), "
                f"w -> {body})[0]")
    w = f"str_split_regex(trim({text_col}), '{_ws('duck')}')"
    starts = f"range(1, greatest(len({w}) - {overlap}, 1) + 1, {stride})"
    return (f"list_transform({starts}, i -> struct_pack("
            f"chunk_idx := cast((i - 1) // {stride} as int), "
            f"chunk_text := array_to_string(list_slice({w}, i, i + {chunk} - 1), ' ')))")


def chunk_documents(df: DataFrame, chunk: int, overlap: int = 0,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """One row per chunk: (id_col, chunk_idx, chunk_text,
    n_chunk_tokens)."""
    return (df
            .select(F.col(id_col),
                    F.explode(F.expr(chunk_expr(text_col, chunk, overlap)))
                     .alias("c"))
            .select(id_col, "c.chunk_idx", "c.chunk_text",
                    F.expr(token_count("c.chunk_text"))
                     .alias("n_chunk_tokens")))


def pack_sequences(df: DataFrame, max_tokens: int,
                   shard_col: str = "source",
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(shard, id, n_tokens, start_offset, seq_id): token offset of each
    doc in its shard's concatenated stream, and the fixed-size training
    sequence that offset falls in."""
    from pyspark.sql.window import Window as W
    n_tok = F.expr(token_count(text_col))
    w = (W.partitionBy(shard_col).orderBy(id_col)
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (df
            .select(F.col(shard_col), F.col(id_col), n_tok.alias("n_tokens"))
            .withColumn("start_offset",
                        F.sum("n_tokens").over(w) - F.col("n_tokens"))
            .withColumn("seq_id",
                        (F.col("start_offset") / max_tokens)
                        .cast("bigint")))


def pack_oracle_sql(max_tokens: int, shard_col: str = "source",
                    id_col: str = "doc_id", text_col: str = "text",
                    table: str = "documents") -> str:
    """DuckDB mirror of :func:`pack_sequences`."""
    n_tok = token_count(text_col, "duck")
    return f"""
WITH t AS (
  SELECT {shard_col}, {id_col}, {n_tok} AS n_tokens FROM {table}),
o AS (
  SELECT *, cast(sum(n_tokens) OVER (PARTITION BY {shard_col} ORDER BY {id_col}
              ROWS UNBOUNDED PRECEDING) - n_tokens as bigint) AS start_offset
  FROM t)
SELECT {shard_col}, {id_col}, n_tokens, start_offset,
       cast(floor(start_offset / {max_tokens}) as bigint) AS seq_id
FROM o
"""
