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


def _df_from_rows(spark, rows, schema):
    """One-partition DataFrame from a small collected row list.

    ``spark.createDataFrame(rows, schema)`` parallelizes the list into
    defaultParallelism slices; a following ``coalesce(1)`` then runs
    ONE task that cycles a Python worker once per slice — measured
    ~4 s of pure fixed cost per micro-batch for a few-hundred-row
    state table on local[32].  Parallelizing into a single slice up
    front writes the same file in ~0.3 s, which is the difference
    between a state-maintenance stream being write-bound and being
    scan-bound."""
    from pythonql_spark.helpers import local_rows_df
    return local_rows_df(spark, [tuple(r) for r in rows], schema)


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


def bloom_dedup_ingest_stream(stream_df: DataFrame, corpus: DataFrame,
                              out_path: str, checkpoint: str, *,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              n_bits: int = 1 << 22, k: int = 5,
                              hash_fn: str = "xxhash64",
                              trigger_available_now: bool = True
                              ) -> StreamingQuery:
    """EXACT-content streaming dedup at bounded memory: the standing
    corpus's content hashes fold once into a Bloom filter (n_bits/8
    bytes — fixed no matter how large the corpus grows); each
    micro-batch probes it scan-fused.

    Definitely-new rows (no bloom hit — the guaranteed direction)
    skip any join entirely; only the maybe-duplicate subset (true
    dups + the filter's small fp rate) is confirmed EXACTLY with an
    anti-join against corpus ∪ previously-landed keys, so the join
    input shrinks from |batch| to |candidates|.  Kept keys update the
    in-driver filter between batches; on restart the filter simply
    rebuilds from corpus + landed output.

    Replay-idempotent like dedup_ingest_stream: the confirm side
    excludes the batch's OWN landed partition (a replayed batch would
    otherwise see its pre-crash output and reject itself), and the
    dynamic partition-overwrite sink replaces rather than appends.
    """
    from pythonql_spark.operators.bloom import bloom_bits, bloom_mark

    key = f"md5({text_col})" if hash_fn == "md5" else \
        f"cast(xxhash64({text_col}) as string)"
    spark = corpus.sparkSession

    def landed(exclude_batch: int | None = None) -> DataFrame | None:
        # probe through Spark's FS layer (out_path may be s3://... or
        # hdfs://..., where a driver-local os.path check is always
        # False and previously-landed keys would silently be forgotten)
        from pyspark.errors import AnalysisException
        try:
            df = spark.read.parquet(out_path)
            df.head(1)
        except AnalysisException:       # path absent yet (first batch)
            return None
        if exclude_batch is not None:
            df = df.filter(F.col(BATCH_COL) != exclude_batch)
        return df

    def known_keys(exclude_batch: int | None = None) -> DataFrame:
        keys = corpus.selectExpr(f"{key} as __k")
        prev = landed(exclude_batch)
        if prev is not None:
            keys = keys.union(prev.selectExpr(f"{key} as __k"))
        return keys

    state = {"bits": None}

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if state["bits"] is None:           # first batch or restart
            state["bits"] = bloom_bits(
                known_keys(exclude_batch=batch_id), "__k",
                n_bits=n_bits, k=k, hash_fn=hash_fn)
        # in-batch exact dedup first (keep the smallest id per key)
        from pyspark.sql.window import Window as W
        within = (batch_df
                  .withColumn("__k", F.expr(key))
                  .withColumn("__rn", F.row_number().over(
                      W.partitionBy("__k").orderBy(id_col)))
                  .filter("__rn = 1").drop("__rn"))
        marked = bloom_mark(within, state["bits"], "__k",
                            n_bits=n_bits, k=k, hash_fn=hash_fn)
        fresh = marked.filter("NOT bloom_hit").drop("bloom_hit")
        maybe = marked.filter("bloom_hit").drop("bloom_hit")
        # exact confirmation with the SCALE-right join order: the huge
        # known-key side is scanned ONCE map-side against the
        # broadcast candidate keys (left-semi), so only the <=|batch|
        # present keys ever shuffle; a plain anti-join of maybe
        # against known would shuffle the full corpus key set per
        # micro-batch
        maybe_keys = maybe.select("__k").distinct()
        present = (known_keys(exclude_batch=batch_id)
                   .join(F.broadcast(maybe_keys), "__k", "leftsemi")
                   .distinct())
        confirmed_new = maybe.join(F.broadcast(present), "__k",
                                   "left_anti")
        kept = fresh.unionByName(confirmed_new)
        (kept.drop("__k").withColumn(BATCH_COL, F.lit(batch_id))
         .write.mode("overwrite")
         .partitionBy(BATCH_COL)
         .option("partitionOverwriteMode", "dynamic")
         .parquet(out_path))
        # fold the kept keys into the filter for the next batch
        add = bloom_bits(kept.select("__k"), "__k",
                         n_bits=n_bits, k=k, hash_fn=hash_fn)
        state["bits"] = [a | b for a, b in zip(state["bits"], add)]

    writer = (stream_df.writeStream.foreachBatch(_apply)
              .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def pq_index_ingest_stream(stream_df: DataFrame, codebook,
                           out_path: str, checkpoint: str, *,
                           centroids=None,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           trigger_available_now: bool = True
                           ) -> StreamingQuery:
    """Streaming ANN index maintenance: vectors arrive continuously,
    the PQ index stays searchable without ever rebuilding.

    Each micro-batch is encoded with a FIXED pre-trained codebook
    (``operators.pq.train_pq`` — train once on a bounded corpus
    sample; codebook drift is an offline rebuild decision, never an
    ingest-path concern) and lands as one ``(id, pq_code)`` partition
    per micro-batch — the stored index rows are the m-byte codes
    only, the raw vectors never land.  One Arrow encode pass per
    batch, no shuffle, no state; the same dynamic partition-overwrite
    sink as :func:`dedup_ingest_stream` makes a replayed batch
    overwrite its own partition (exactly-once output).

    Search: ``pq_topk(queries_df, ..., codebook=codebook,
    encoded=spark.read.parquet(out_path))`` — the
    encode-once/search-many deployment shape, now fed incrementally.

    Pass ``centroids`` (from ``operators.pq.train_ivfpq``) to
    maintain the composed IVF-PQ index instead: batches encode to
    (cell, residual code) and land partitioned by (batch, cell), so
    ``ivfpq_topk``'s probe filter prunes the incrementally-built
    index at the FILE level exactly like a batch-built one.
    """
    from pythonql_spark.operators.pq import ivfpq_encode, pq_encode

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if centroids is None:
            enc = pq_encode(batch_df, codebook, vec_col=vec_col) \
                .select(id_col, "pq_code")
            parts = [BATCH_COL]
        else:
            enc = ivfpq_encode(batch_df, centroids, codebook,
                               vec_col=vec_col) \
                .select(id_col, "ivf_cell", "pq_code")
            parts = [BATCH_COL, "ivf_cell"]
        (enc.withColumn(BATCH_COL, F.lit(batch_id))
         .write.mode("overwrite")
         .partitionBy(*parts)
         .option("partitionOverwriteMode", "dynamic")
         .parquet(out_path))

    writer = (stream_df.writeStream.foreachBatch(_apply)
              .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def int8_index_ingest_stream(stream_df: DataFrame,
                             out_path: str, checkpoint: str, *,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             dim: int | None = None,
                             trigger_available_now: bool = True
                             ) -> StreamingQuery:
    """Streaming int8 (SQ8) ANN index maintenance — the zero-state
    sibling of :func:`pq_index_ingest_stream`: symmetric per-vector
    scalar quantization depends on NOTHING trained, so the maintained
    index never needs a rebuild decision at all (no codebook, no
    drift).  Each micro-batch quantizes in one Arrow pass and lands
    (id, codes, exact ∫norm²) as its own partition — 4× smaller than
    the float32 vectors, and the norms are precomputed so search
    never touches raw vectors.  Replayed batches overwrite their own
    partition (exactly-once output).

    Search: ``int8_topk(queries_df, ...,
    encoded=spark.read.parquet(out_path))``.
    """
    from pythonql_spark.operators.quantize import quantize_index

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():      # dim inference needs a row
            return
        (quantize_index(batch_df, id_col=id_col, vec_col=vec_col,
                        dim=dim)
         .withColumn(BATCH_COL, F.lit(batch_id))
         .write.mode("overwrite")
         .partitionBy(BATCH_COL)
         .option("partitionOverwriteMode", "dynamic")
         .parquet(out_path))

    writer = (stream_df.writeStream.foreachBatch(_apply)
              .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drift_monitor_stream(stream_df: DataFrame, reference: DataFrame,
                         col: str, lo: float, hi: float, nbins: int,
                         out_path: str, checkpoint: str, *,
                         keys: list[str] | None = None,
                         smooth: float = 0.5,
                         trigger_available_now: bool = True
                         ) -> StreamingQuery:
    """Continuous distribution-drift monitoring: every arriving
    micro-batch's distribution of ``col`` is PSI-compared against a
    FIXED reference snapshot (operators.profile.psi_drift semantics;
    the batch is side "a", the reference side "b"), and one
    (keys..., psi, n_a, n_b) row per stratum lands per batch — the
    alert log a curation pipeline tails to catch an upstream crawl
    shift while it is happening, not at the next full rebuild.

    The reference corpus is scanned ONCE at stream start: its
    |strata| × nbins binned counts materialize eagerly (checkpointed,
    so the corpus scan is not re-planned per batch) and only that tiny
    frame joins each batch's counts.  Per batch the corpus-sized work
    is one partial-aggregated groupBy over the batch itself.

    The log is partitioned by micro-batch id with dynamic partition
    overwrite, so a replayed batch rewrites its own rows — the same
    exactly-once convention as the ingest sinks."""
    from pythonql_spark.operators.profile import (binned_counts,
                                                  psi_from_binned)

    ref_counts = binned_counts(reference, col, lo, hi, nbins, keys) \
        .localCheckpoint()                      # one corpus scan, ever

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        batch_counts = binned_counts(batch_df, col, lo, hi, nbins, keys)
        (psi_from_binned(batch_counts, ref_counts, nbins, keys,
                         smooth=smooth)
         .withColumn(BATCH_COL, F.lit(batch_id))
         .write.mode("overwrite")
         .partitionBy(BATCH_COL)
         .option("partitionOverwriteMode", "dynamic")
         .parquet(out_path))

    writer = (stream_df.writeStream.foreachBatch(_apply)
              .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def image_dedup_ingest_stream(stream_df: DataFrame, index: DataFrame,
                              out_path: str, checkpoint: str, *,
                              id_col: str = "doc_id",
                              media_col: str = "media",
                              max_hamming: int = 3,
                              trigger_available_now: bool = True
                              ) -> StreamingQuery:
    """Continuous PERCEPTUAL image dedup (the multimodal sibling of
    dedup_ingest_stream): each arriving micro-batch's images are
    decoded and aHashed once, batch-internal near-duplicates collapse
    to their min-id representative (operators.multimodal.ahash_pairs),
    survivors probe the standing (id, ahash) ``index`` with the
    banded cross join (ahash_matches — only the batch's bands
    shuffle; the index hashes were computed ONCE at stream start and
    never re-decode), and novel images land as (id, ahash) rows
    partitioned by micro-batch id with dynamic partition overwrite —
    replay-idempotent like the other ingest sinks.

    The landed output IS index-shaped: periodic compaction can fold
    it into the standing index without re-decoding anything."""
    from pythonql_spark.operators.multimodal import (ahash_matches,
                                                     ahash_pairs,
                                                     image_ahash)

    idx = (index.select(F.col(id_col), "ahash")
           .localCheckpoint())              # hash the index once, ever

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        hashed = (image_ahash(batch_df, media_col)
                  .select(id_col, "ahash")
                  .localCheckpoint())       # decode once per batch
        within = ahash_pairs(hashed, id_col=id_col,
                             max_hamming=max_hamming) \
            .select(F.col("id_b").alias(id_col)).distinct()
        kept = hashed.join(within, id_col, "left_anti")
        dupes = (ahash_matches(kept, idx, id_col=id_col,
                               max_hamming=max_hamming)
                 .select(F.col("probe_id").alias(id_col)).distinct())
        novel = kept.join(dupes, id_col, "left_anti")
        (novel.withColumn(BATCH_COL, F.lit(batch_id))
         .write.mode("overwrite")
         .partitionBy(BATCH_COL)
         .option("partitionOverwriteMode", "dynamic")
         .parquet(out_path))

    writer = (stream_df.writeStream.foreachBatch(_apply)
              .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sample_maintain_stream(stream_df: DataFrame, n: int,
                           out_path: str, checkpoint: str, *,
                           id_col: str = "doc_id", seed: int = 0,
                           trigger_available_now: bool = True
                           ) -> StreamingQuery:
    """Maintain an EXACT-n uniform sample of an ever-growing stream —
    the continuous eval/inspection sample every live corpus needs.
    The bottom-k sketch over the deterministic md5(seed, id) key is a
    SEMIGROUP: keep-n-smallest(current ∪ batch) absorbs batches in
    any order, equals the batch sample_exact_n over everything seen,
    and RE-applying a replayed batch is a no-op by algebra (min-n is
    stable under re-union of a subset) — idempotence needs no
    partition bookkeeping at all.  Per batch the work is one
    TakeOrderedAndProject over n + |batch| rows."""
    from pythonql_spark.operators.sampling import sample_exact_n

    spark = stream_df.sparkSession
    schema = stream_df.schema

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        # probe existence through Spark's FS layer, not the driver's
        # local os.path — out_path may be s3://... or hdfs://..., where
        # a local check is always False and each batch would silently
        # discard the maintained sample.  The read call itself raises
        # AnalysisException EAGERLY on a missing path; an extra
        # head(1) action here would cost a full scheduled job per
        # micro-batch for nothing (the empty-dir edge just unions
        # zero rows — harmless under the min-n algebra)
        from pyspark.errors import AnalysisException
        pool = batch_df
        try:
            existing = spark.read.schema(schema).parquet(out_path)
            pool = existing.unionByName(batch_df)
        except AnalysisException:   # path absent yet (first batch)
            pass
        # a replayed batch re-unions rows already in the sample: the
        # min-n algebra only absorbs it if the pool is a SET by id
        pool = pool.dropDuplicates([id_col])
        sample = sample_exact_n(pool, n, id_col=id_col, seed=seed)
        # materialize BEFORE overwriting: the sample's plan reads
        # out_path, and Spark cannot overwrite a path it is reading
        # from lazily; the collect is n rows — the documented
        # bottom-k state bound
        rows = sample.collect()
        (_df_from_rows(spark, rows, schema)
         .write.mode("overwrite").parquet(out_path))

    writer = (stream_df.writeStream.foreachBatch(_apply)
              .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def quality_monitor_stream(stream_df: DataFrame,
                           checks: dict, out_path: str,
                           checkpoint: str, *,
                           keys: list[str] | None = None,
                           trigger_available_now: bool = True
                           ) -> StreamingQuery:
    """Continuous data-quality gate: every micro-batch runs the
    one-pass expectation suite (operators.profile.check_expectations
    — the Deequ-style pre-flight) and its verdict rows land
    partitioned by micro-batch id with dynamic overwrite — the alert
    log a pipeline tails to catch a broken upstream delivery at the
    batch it arrives in, not at the next full audit."""
    from pythonql_spark.operators.profile import check_expectations

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        (check_expectations(batch_df, checks, keys=keys)
         .withColumn(BATCH_COL, F.lit(batch_id))
         .write.mode("overwrite")
         .partitionBy(BATCH_COL)
         .option("partitionOverwriteMode", "dynamic")
         .parquet(out_path))

    writer = (stream_df.writeStream.foreachBatch(_apply)
              .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sketch_maintain_stream(stream_df: DataFrame, cols: list[str],
                           out_path: str, checkpoint: str, *,
                           p_bits: int | None = None,
                           trigger_available_now: bool = True
                           ) -> StreamingQuery:
    """Maintain a distinct-count sketch of an ever-growing stream —
    the continuous counterpart of operators.sketch.hll_registers_md5
    (the corpus profile question "how many distinct users/langs/docs
    so far" answered from a few-KB register table, never a rescan).

    Each micro-batch lands ITS OWN register delta (one scan of the
    batch, ≤ cols * 2^p_bits rows) in a batch-id partition with
    dynamic overwrite; :func:`read_sketch_registers` max-merges the
    landed partitions into the current registers.  Two layers of
    replay safety: a crash-replayed batch REWRITES its own partition
    (the landing contract every ingest sink here shares), and even a
    duplicated or partial landing is absorbed because max-merge is a
    commutative IDEMPOTENT semigroup.  A read-modify-overwrite state
    file would be strictly worse — mode('overwrite') deletes the
    path before rewriting it, so a crash between the two silently
    drops ALL history while the checkpoint only replays the last
    batch.  Periodic compaction = merge_md5_registers over old
    partitions, folding them into one."""
    from pythonql_spark.operators.sketch import (HLL_P_BITS,
                                                 hll_registers_md5)
    p = HLL_P_BITS if p_bits is None else p_bits

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        regs = hll_registers_md5(batch_df, cols, p)
        (regs.withColumn(BATCH_COL, F.lit(batch_id))
         .coalesce(1).write.mode("overwrite")
         .partitionBy(BATCH_COL)
         .option("partitionOverwriteMode", "dynamic")
         .parquet(out_path))

    writer = (stream_df.writeStream.foreachBatch(_apply)
              .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_sketch_registers(spark, out_path: str) -> DataFrame:
    """Current md5-HLL registers from a :func:`sketch_maintain_stream`
    output directory: max-merge over the landed per-batch deltas
    (≤ cols * 2^p_bits rows each) — feed to
    operators.sketch.hll_estimate_md5 for the distinct counts."""
    from pythonql_spark.operators.sketch import merge_md5_registers
    return merge_md5_registers(
        spark.read.parquet(out_path).drop(BATCH_COL))


def cms_maintain_stream(stream_df: DataFrame, col: str,
                        out_path: str, checkpoint: str, *,
                        depth: int | None = None,
                        width: int | None = None,
                        trigger_available_now: bool = True
                        ) -> StreamingQuery:
    """Maintain a Count-Min frequency sketch of an ever-growing
    stream — the frequency counterpart of sketch_maintain_stream
    ("how often has URL/user/shingle X appeared so far" from
    depth*width ints, never a rescan).

    CMS counters merge by SUM, which is a semigroup but NOT
    idempotent — a replayed batch re-added into a single state table
    would double-count.  So unlike the HLL maintainer this one lands
    each batch's counter table in its own partition with dynamic
    partition overwrite (the replayed batch REWRITES itself), and the
    read-side merge (operators.sketch.cms_merge over the landed
    partitions, ≤ depth*width rows per batch) produces the current
    sketch.  Periodic compaction can fold old partitions into one —
    also just cms_merge — without touching raw history."""
    from pythonql_spark.operators.sketch import (CMS_DEPTH, CMS_WIDTH,
                                                 cms_counters_md5)
    d = CMS_DEPTH if depth is None else depth
    w = CMS_WIDTH if width is None else width

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        counters = cms_counters_md5(batch_df, col, depth=d, width=w)
        (counters.withColumn(BATCH_COL, F.lit(batch_id))
         .coalesce(1).write.mode("overwrite")
         .partitionBy(BATCH_COL)
         .option("partitionOverwriteMode", "dynamic")
         .parquet(out_path))

    writer = (stream_df.writeStream.foreachBatch(_apply)
              .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _hadoop_fs(spark, path_str: str):
    """(FileSystem, Path-factory) for ``path_str`` through Spark's
    Hadoop FS layer — every listing/delete in the compaction helpers
    goes through this, never driver-local os.path (out_path and
    checkpoint may be s3://... or hdfs://..., where a local listing
    is empty or raises and state maintenance silently breaks)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    mk = jvm.org.apache.hadoop.fs.Path
    return mk(path_str).getFileSystem(conf), mk


def _list_batch_partitions(spark, out_path: str) -> list:
    """Sorted batch ids currently landed under ``out_path``."""
    import re as _re
    fs, mk = _hadoop_fs(spark, out_path)
    ids = []
    for st in fs.listStatus(mk(out_path)):
        m = _re.match(rf"{BATCH_COL}=(\d+)$", st.getPath().getName())
        if m:
            ids.append(int(m.group(1)))
    return sorted(ids)


def _delete_batch_partitions(spark, out_path: str, ids) -> None:
    fs, mk = _hadoop_fs(spark, out_path)
    for b in ids:
        fs.delete(mk(out_path, f"{BATCH_COL}={b}"), True)


def _last_committed_batch(spark, checkpoint: str):
    """Largest batch id with a COMMIT marker in the checkpoint —
    batches at or below it are never re-executed by Structured
    Streaming.  Read through the Hadoop FS (a driver-local listdir
    breaks on hdfs://-style checkpoints)."""
    fs, mk = _hadoop_fs(spark, checkpoint)
    commits = mk(checkpoint, "commits")
    if not fs.exists(commits):
        return None
    ids = [int(st.getPath().getName())
           for st in fs.listStatus(commits)
           if st.getPath().getName().isdigit()]
    return max(ids) if ids else None


def compact_sketch_registers(spark, out_path: str) -> int:
    """Fold a :func:`sketch_maintain_stream` output directory's landed
    per-batch register deltas into ONE partition — bounding the
    directory at a single ≤ cols * 2^p_bits-row file no matter how
    many batches have run.

    The partition listing is SNAPSHOTTED first and the fold reads,
    lands into, and deletes exactly that snapshot: a batch landed
    concurrently (after the snapshot) is never touched, so running
    this alongside the live stream is safe.  Max-merge idempotence
    covers the crash windows: the fold lands into the snapshot's
    LOWEST id (rewriting one of its own sources) BEFORE the other
    sources are deleted, and a partition re-landed by a crash replay
    after folding re-merges to a no-op.  (The CMS sibling below needs
    a manifest protocol instead — sum is not idempotent.)  Returns
    the number of register rows in the folded partition."""
    from pythonql_spark.operators.sketch import merge_md5_registers

    ids = _list_batch_partitions(spark, out_path)
    if len(ids) <= 1:
        return 0
    target = ids[0]
    snap = (spark.read.parquet(out_path)
            .filter(F.col(BATCH_COL).isin(ids)).drop(BATCH_COL))
    folded = merge_md5_registers(snap)
    rows = folded.collect()                # bounded: cols * 2^p_bits
    (_df_from_rows(spark, rows, folded.schema)
     .withColumn(BATCH_COL, F.lit(target))
     .coalesce(1).write.mode("overwrite")
     .partitionBy(BATCH_COL)
     .option("partitionOverwriteMode", "dynamic")
     .parquet(out_path))
    _delete_batch_partitions(spark, out_path,
                             [b for b in ids if b != target])
    return len(rows)


_CMS_TMP = "_cms_compact_tmp"
_CMS_MANIFEST = "_cms_compact_manifest.json"


def compact_cms_counters(spark, out_path: str, checkpoint: str) -> int:
    """Fold a :func:`cms_maintain_stream` output directory's landed
    per-batch counter tables into ONE partition — the sum-merge
    counterpart of :func:`compact_sketch_registers`, with the two
    guards sum (NOT idempotent) requires:

    * COMMITTED HORIZON — only batches whose commit marker exists in
      the checkpoint are folded; a batch a crash replay might
      re-execute would otherwise be counted twice when it rewrites
      its partition.
    * TWO-PHASE FOLD — the fold is written to a temp dir and a
      manifest records (target, sources) BEFORE any partition is
      touched; the swap (delete target → rename tmp → delete other
      sources → delete manifest) is resumable, so a crash at any
      point either leaves the originals intact or is completed by
      the next call — never the fold AND its sources both counted
      (the naive write-fold-then-delete shape double-counts
      permanently if it dies between the two).

    Crash-resume covers BOTH phases: fold-incomplete (tmp/_SUCCESS
    absent and the target partition unmarked → originals intact,
    discard and restart) and swap-started (the fold's _SUCCESS is
    present in tmp or already renamed into the target partition →
    the swap MUST be finished, never discarded).

    ATOMICITY ASSUMPTION: the swap relies on ``fs.rename`` being
    atomic, which holds on HDFS/local but NOT on object stores (S3A
    rename is copy+delete) — a crash mid-rename there can leave a
    partial target partition the resume path cannot distinguish from
    a completed one.  On s3:// run compaction under a coordinator
    that retries the whole call on failure, or point ``out_path`` at
    an HDFS/ABFS-class store for the compacted copy; the live
    landed-partition protocol itself never renames and is unaffected.

    Returns the number of counter rows in the folded partition (0 if
    there was nothing to fold)."""
    import json as _json

    from pythonql_spark.operators.sketch import cms_merge

    fs, mk = _hadoop_fs(spark, out_path)
    manifest_p = mk(out_path, _CMS_MANIFEST)
    tmp_dir = f"{out_path}/{_CMS_TMP}"

    if fs.exists(manifest_p):              # resume a crashed run
        stream = fs.open(manifest_p)
        try:
            raw = bytes(spark.sparkContext._jvm.org.apache.commons.io
                        .IOUtils.toByteArray(stream))
        finally:
            stream.close()
        try:
            man = _json.loads(raw.decode())
        except (ValueError, UnicodeDecodeError):
            # crash DURING the manifest write itself: the manifest is
            # fully written before the fold starts, so a truncated/
            # unparseable one proves the originals are intact —
            # discard and start fresh (without this, every later call
            # would raise here and compaction would wedge forever)
            man = None
        if man is None:
            fs.delete(mk(tmp_dir), True)
            fs.delete(manifest_p, False)
            man = {}
        swapped = bool(man) and fs.exists(  # rename already happened:
            mk(out_path,
               f"{BATCH_COL}={int(man['target'])}/_SUCCESS"))
        # the fold's _SUCCESS rode
        # along into the target partition (normally-landed batches
        # never have a per-partition _SUCCESS — dynamic overwrite
        # writes it at the directory root), so its presence under the
        # manifest's target means the swap phase started and MUST be
        # completed; discarding the manifest here would leave the
        # folded sum AND its un-deleted sources both counted.
        if fs.exists(mk(tmp_dir, "_SUCCESS")) or swapped:
            _finish_cms_swap(spark, out_path, man)
        else:                              # fold never completed:
            fs.delete(mk(tmp_dir), True)   # originals are intact
            fs.delete(manifest_p, False)

    horizon = _last_committed_batch(spark, checkpoint)
    if horizon is None:
        return 0
    ids = [b for b in _list_batch_partitions(spark, out_path)
           if b <= horizon]
    if len(ids) <= 1:
        return 0
    target = max(ids)                      # committed: never re-run

    man = {"target": target, "sources": ids}
    out_stream = fs.create(manifest_p, True)
    try:
        out_stream.write(bytearray(_json.dumps(man).encode()))
    finally:
        out_stream.close()
    folded = cms_merge(spark.read.parquet(out_path)
                       .filter(F.col(BATCH_COL).isin(ids))
                       .drop(BATCH_COL))
    rows = folded.collect()                # bounded: depth * width
    (_df_from_rows(spark, rows, folded.schema)
     .coalesce(1).write.mode("overwrite").parquet(tmp_dir))
    _finish_cms_swap(spark, out_path, man)
    return len(rows)


def _finish_cms_swap(spark, out_path: str, man: dict) -> None:
    """Resumable tail of :func:`compact_cms_counters`: the completed
    fold in the temp dir replaces the target partition, the other
    source partitions and the manifest are removed.  Every step is
    re-runnable from the manifest."""
    fs, mk = _hadoop_fs(spark, out_path)
    target = int(man["target"])
    tmp = mk(out_path, _CMS_TMP)
    part = mk(out_path, f"{BATCH_COL}={target}")
    if fs.exists(tmp):                     # not yet swapped in
        fs.delete(part, True)
        fs.rename(tmp, part)
    _delete_batch_partitions(
        spark, out_path,
        [int(b) for b in man["sources"] if int(b) != target])
    fs.delete(mk(out_path, _CMS_MANIFEST), False)


def url_dedup_ingest_stream(stream_df: DataFrame, corpus: DataFrame,
                            out_path: str, checkpoint: str, *,
                            id_col: str = "doc_id",
                            url_col: str = "url",
                            n_bits: int = 1 << 22, k: int = 5,
                            trigger_available_now: bool = True
                            ) -> StreamingQuery:
    """Continuous CANONICAL-URL dedup ingestion — the crawl-frontier
    question "have we already fetched this page under any spelling":
    both the standing ``corpus`` and every arriving micro-batch are
    canonicalized (operators.url.curate_urls: scheme/host case, www,
    userinfo, ports, fragments, tracking params, param order,
    trailing slash, percent-encoding — scan-fused column expressions
    plus the one stream-static PSL broadcast join, all legal in
    append-mode streams), then exact dedup runs on ``url_norm``
    through the Bloom-prefiltered path: the corpus's canonical-url
    hashes fold once into a fixed-size bit array, definitely-new
    pages skip any join, and only bloom hits are confirmed exactly.
    Inherits bloom_dedup_ingest_stream's replay contract (the confirm
    side excludes the batch's own landed partition; dynamic overwrite
    rewrites a replayed batch).  Landed rows carry ``url_norm`` and
    ``domain``, ready for downstream domain caps."""
    from pythonql_spark.operators.url import curate_urls

    return bloom_dedup_ingest_stream(
        curate_urls(stream_df, url_col),
        curate_urls(corpus, url_col),
        out_path, checkpoint,
        id_col=id_col, text_col="url_norm",
        n_bits=n_bits, k=k,
        trigger_available_now=trigger_available_now)
