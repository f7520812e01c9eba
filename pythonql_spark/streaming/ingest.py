"""Continuous corpus ingestion: streaming micro-batches deduplicated
against a standing corpus before they land.

Spark-first shape for "documents arrive all day, only novel ones may
enter the training corpus": Structured Streaming supplies ordering,
checkpointing and replay; each micro-batch runs the engine's
INCREMENTAL dedup (operators/dedup.py — bipartite LSH, cost
|batch| + |corpus|, never the product) inside ``foreachBatch``; the
sink writes one directory partition per micro-batch with dynamic
partition overwrite, so a replayed batch (restart after a crash)
OVERWRITES its own partition instead of appending twice —
exactly-once output without a transactional table format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

BATCH_COL = "_ingest_batch"


def dedup_ingest_stream(stream_df: DataFrame, corpus: DataFrame,
                        out_path: str, checkpoint: str, *,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        jaccard_threshold: float = 0.5,
                        index_table: str | None = None,
                        trigger_available_now: bool = True,
                        **lsh_kw) -> StreamingQuery:
    """Start a streaming query that filters each micro-batch down to
    documents that are near-duplicates neither of ``corpus`` nor of an
    earlier row in the same batch, and appends the survivors to
    ``out_path`` (parquet, partitioned by micro-batch id).

    ``corpus`` is a (batch) DataFrame — typically the accumulated
    corpus parquet.  Without ``index_table`` every micro-batch
    recomputes the corpus's LSH signatures (fine for tests, wasteful
    in production); pass the table name of a persisted
    ``operators.dedup.build_minhash_index`` (built with the SAME
    num_hashes/bands/ngram) and each batch instead PROBES the
    bucketed index — only the small batch side shuffles, the corpus's
    signatures are computed exactly once per index build.
    """
    from pythonql_spark.operators.dedup import (dedup_increment,
                                                dedup_keep,
                                                minhash_lsh_pairs,
                                                probe_minhash_index)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if index_table is None:
            kept = dedup_increment(batch_df, corpus, id_col, text_col,
                                   jaccard_threshold=jaccard_threshold,
                                   **lsh_kw)
        else:
            within = dedup_keep(
                batch_df,
                minhash_lsh_pairs(batch_df, id_col, text_col,
                                  jaccard_threshold=jaccard_threshold,
                                  **lsh_kw),
                id_col)
            cross = probe_minhash_index(
                within, index_table, corpus, id_col, text_col,
                jaccard_threshold=jaccard_threshold, **lsh_kw)
            dupes = cross.select(F.col("id_a").alias(id_col)).distinct()
            kept = within.join(dupes, id_col, "left_anti")
        (kept.withColumn(BATCH_COL, F.lit(batch_id))
         .write.mode("overwrite")
         .partitionBy(BATCH_COL)
         .option("partitionOverwriteMode", "dynamic")
         .parquet(out_path))

    writer = (stream_df.writeStream.foreachBatch(_apply)
              .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
