"""Streaming: the window helpers declare identical plans on batch and
stream inputs; a rate-source smoke test executes one micro-batch."""

import time

import pytest
from pyspark.sql import functions as F

from pythonql_spark.streaming import (
    session_agg,
    sliding_agg,
    tumbling_agg,
    with_watermark,
)


def test_batch_stream_same_api(spark, tables):
    ev = tables["events"]
    out = tumbling_agg(ev, "1 hour", keys=["event_type"])
    assert {"window_start", "event_type", "n_events"} <= set(out.columns)
    out2 = sliding_agg(ev, "1 hour", "30 minutes")
    # every event lands in exactly 2 sliding windows
    total = out2.agg(F.sum("n_events")).first()[0]
    assert total == 2 * ev.count()
    out3 = session_agg(ev, "30 minutes", keys=["user_id"])
    assert out3.count() > 0


def test_stream_smoke(spark):
    stream = (spark.readStream.format("rate")
              .option("rowsPerSecond", 100).load()
              .withColumnRenamed("timestamp", "ts"))
    agg = tumbling_agg(with_watermark(stream, "ts", "5 seconds"),
                       "5 seconds", ts_col="ts")
    assert agg.isStreaming
    q = (agg.writeStream.format("memory").queryName("t_smoke")
         .outputMode("append").trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 30
        while time.time() < deadline and not q.recentProgress:
            time.sleep(1)
        assert q.isActive
    finally:
        q.stop()
    # schema contract held on a live stream
    assert "window_start" in spark.table("t_smoke").columns


def test_stateful_sessionize_stream_matches_batch(spark, tables, tmp_path):
    """applyInPandasWithState sessions on a REAL stream (file source,
    availableNow, memory sink) must equal batch sessionization.  A
    session is closed either by a later event of the same key (gap
    elapsed in data) or by the event-time timeout once the watermark
    passes its last event + gap — in a finite run the watermark ends
    at max(ts), so final sessions older than that are closed too."""
    from pyspark.sql.window import Window as W

    from pythonql_spark.streaming import stateful_sessionize, with_watermark

    gap_s = 30 * 60
    ev = tables["events"].select("user_id", "ts", "value")
    src = str(tmp_path / "ev")
    ev.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    sessions = stateful_sessionize(
        with_watermark(stream, "ts", "0 seconds"), gap_ms=gap_s * 1000)
    q = (sessions.writeStream.format("memory").queryName("t_sessions")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.user_id, r.session_start, r.n_events, round(r.sum_value, 6))
           for r in spark.table("t_sessions").collect()}

    wk = W.partitionBy("user_id").orderBy("ts", "value")
    lagged = ev.withColumn(
        "new_s",
        F.when(F.lag("ts").over(wk).isNull()
               | (F.col("ts").cast("long") - F.lag("ts").over(wk).cast("long")
                  >= gap_s), 1).otherwise(0))
    sid = lagged.withColumn(
        "sid", F.sum("new_s").over(
            wk.rowsBetween(W.unboundedPreceding, W.currentRow)))
    batch = (sid.groupBy("user_id", "sid")
             .agg(F.min("ts").alias("session_start"),
                  F.count(F.lit(1)).alias("n_events"),
                  F.sum("value").alias("sum_value"),
                  F.max("ts").alias("last_ts")))
    global_max = ev.agg(F.max("ts")).first()[0]
    last = batch.groupBy("user_id").agg(F.max("sid").alias("_last"))
    closed = (batch.join(last, "user_id")
              .filter((F.col("sid") != F.col("_last"))
                      | (F.col("last_ts").cast("long") + gap_s
                         <= F.lit(global_max).cast("timestamp").cast("long"))))
    want = {(r.user_id, r.session_start, r.n_events, round(r.sum_value, 6))
            for r in closed.collect()}
    assert got == want


def test_streaming_text_pipeline_matches_batch(spark, tables, tmp_path):
    """The text operators are plain column expressions, so the same
    quality-filter + windowed per-language counts run unchanged on a
    real stream; append-mode output for every window the watermark
    closed must equal the batch run over the same rows."""
    from pythonql_spark.operators import text as TX

    docs = (tables["documents"]
            .selectExpr("doc_id", "lang", "text",
                        "timestamp_micros(doc_id * 600000000) as ts"))
    src = str(tmp_path / "docs")
    docs.coalesce(1).write.parquet(src)

    def pipeline(df):
        scored = df.selectExpr(
            "lang", "ts", TX.quality_score("text") + " as quality")
        return tumbling_agg(scored.filter("quality >= 0.5"),
                            "1 hour", keys=["lang"], ts_col="ts")

    stream = spark.readStream.schema(docs.schema).parquet(src)
    out = pipeline(with_watermark(stream, "ts", "0 seconds"))
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("t_textpipe")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.lang, r.window_start, r.n_events)
           for r in spark.table("t_textpipe").collect()}

    # batch reference, minus windows still open at the final watermark
    max_ts = docs.agg(F.max("ts")).first()[0]
    batch = pipeline(docs).filter(
        F.col("window_start") + F.expr("INTERVAL 1 HOUR") <= F.lit(max_ts))
    want = {(r.lang, r.window_start, r.n_events) for r in batch.collect()}
    assert got == want and got


def test_dedup_stream_matches_batch(spark, tables, tmp_path):
    """dropDuplicatesWithinWatermark on a real file stream keeps one
    row per key; matches batch dropDuplicates key set."""
    from pythonql_spark.streaming import dedup_stream

    ev = tables["events"].select("user_id", "event_type", "ts")
    src = str(tmp_path / "evd")
    ev.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = dedup_stream(stream, ["user_id", "event_type"], delay="1 minute")
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("t_dedup")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.user_id, r.event_type)
           for r in spark.table("t_dedup").collect()}
    want = {(r.user_id, r.event_type)
            for r in dedup_stream(ev, ["user_id", "event_type"]).collect()}
    assert got == want
    # one row per key on the stream side too
    assert spark.table("t_dedup").count() == len(got)


def test_interval_join_stream_matches_batch(spark, tables, tmp_path):
    """Stream-stream interval join (click→purchase attribution) on
    real file-source streams must equal the same declaration on batch
    frames.  The event-time range condition is what lets Spark bound
    both sides' join state at the watermark horizon."""
    from pythonql_spark.streaming import interval_join

    e = tables["events"]
    p = e.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("purchase_ts"))
    c = e.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts").alias("click_ts"))
    batch = {(r.purchase_id, r.click_id) for r in interval_join(
        p, c, on="user_id", left_ts="purchase_ts", right_ts="click_ts",
        lower=-4 * 3600, upper=0).collect()}
    assert batch  # nonempty at sf0.001

    pd_dir, cl_dir = str(tmp_path / "p"), str(tmp_path / "c")
    p.coalesce(1).write.parquet(pd_dir)
    c.coalesce(1).write.parquet(cl_dir)
    sp = spark.readStream.schema(p.schema).parquet(pd_dir)
    sc = spark.readStream.schema(c.schema).parquet(cl_dir)
    out = interval_join(sp, sc, on="user_id",
                        left_ts="purchase_ts", right_ts="click_ts",
                        lower=-4 * 3600, upper=0, watermark="1 minute")
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("t_ivj")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.purchase_id, r.click_id)
           for r in spark.table("t_ivj").collect()}
    assert got == batch


def test_file_sink_exactly_once(spark, tables, tmp_path):
    """Checkpointed file sink: a restart after a completed drain must
    append NOTHING (offsets + sink commit log make re-runs no-ops);
    new source files after restart are picked up incrementally."""
    from pythonql_spark.streaming import run_to_completion, write_stream_files

    ev = tables["events"].select("event_id", "user_id", "value")
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    ev.filter("event_id % 2 = 0").coalesce(1).write.mode("append").parquet(src)

    def drain():
        stream = spark.readStream.schema(ev.schema).parquet(src)
        run_to_completion(write_stream_files(stream, out, ckpt))

    drain()
    n1 = spark.read.parquet(out).count()
    assert n1 == ev.filter("event_id % 2 = 0").count()
    # restart with no new data: exactly-once means no duplicates
    drain()
    assert spark.read.parquet(out).count() == n1
    # add a new source file: only the delta lands
    ev.filter("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    drain()
    assert spark.read.parquet(out).count() == ev.count()


def test_stateful_timeout_behind_watermark(spark, tmp_path):
    """A file source delivers batches in FILE order, not event-time
    order: a later batch can carry a key whose whole sequence is older
    than the watermark an earlier batch advanced, making the key's
    last-event+gap timeout land in the past.  setTimeoutTimestamp
    rejects past timestamps, so without the watermark clamp the query
    CRASHES (INVALID_TIMEOUT_TIMESTAMP — found by the x7 predicate-
    window scale rehearsal).  Both stateful operators must survive the
    shape and still emit every in-data-closed window/session."""
    import datetime
    import os

    from pythonql_spark.streaming import (run_to_completion,
                                          stateful_predicate_windows,
                                          stateful_sessionize,
                                          with_watermark)
    TS = datetime.datetime
    # file 0 (processed first): a key deep in the future -> watermark
    # jumps to day 28.  file 1: an OLD key whose last+gap << watermark.
    new = [(1, TS(2024, 1, 28, 0, 0, s), float(150 + s)) for s in (0, 1)] \
        + [(1, TS(2024, 1, 28, 0, 0, 30), 5.0)]
    old = [(2, TS(2024, 1, 1, 0, 0, s), float(150 + s)) for s in (0, 1)] \
        + [(2, TS(2024, 1, 1, 0, 0, 30), 5.0)]
    schema = "user_id long, ts timestamp, value double"
    src = tmp_path / "wm_in"
    src.mkdir()
    for i, rows in enumerate([new, old]):
        f = tmp_path / f"f{i}"
        # parallelize(…, 1) first: createDataFrame(local rows)
        # .coalesce(1) cycles a Python worker per default-parallelism
        # slice (~4 s for 3 rows on local[32])
        spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), schema) \
            .write.mode("overwrite").parquet(str(f))
        part = next(f.glob("part-*.parquet"))
        dst = src / f"f{i}.parquet"
        part.rename(dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    w = stateful_predicate_windows(
        with_watermark(stream, "ts", "0 seconds"),
        start_when=lambda c, at, p, n: c["value"] >= 150,
        end_when=lambda c, at, p, n, sc, sa: c["value"] < 20,
        only_end=True)
    ck = str(tmp_path / "wm_ck")
    q = (w.writeStream.format("memory").queryName("t_wmclamp")
         .outputMode("append").option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    run_to_completion(q)
    got = sorted((r.user_id, r.s_at, r.e_at, r.n_events)
                 for r in spark.table("t_wmclamp").collect())
    # both keys' windows close IN DATA (value 5.0 < 20) and must emit
    # regardless of which batch carried them
    assert got == [(1, 0, 2, 3), (2, 0, 2, 3)]

    stream2 = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(str(src)))
    s = stateful_sessionize(
        with_watermark(stream2, "ts", "0 seconds"),
        gap_ms=10_000, key_col="user_id")
    q2 = (s.writeStream.format("memory").queryName("t_wmclamp_s")
          .outputMode("append")
          .option("checkpointLocation", str(tmp_path / "wm_ck2"))
          .trigger(availableNow=True).start())
    run_to_completion(q2)
    # sessions close in-data on the 10s gap; the trailing open session
    # of each key may or may not flush (availableNow fires no final
    # timer pass) — the invariant here is NO CRASH + the closed ones
    got_s = sorted((r.user_id, r.n_events)
                   for r in spark.table("t_wmclamp_s").collect())
    assert [(u, n) for u, n in got_s if n >= 2] == [(1, 2), (2, 2)]


def test_predicate_windows_stream_matches_batch(spark, tables, tmp_path):
    """The reference's tumbling predicate window clause on a REAL
    stream (applyInPandasWithState) must emit the same closed windows
    as the batch operator: open on value >= 150, absorb, close on
    value < 20, per user, in event-time order."""
    from pythonql_spark.operators.window_clause import predicate_windows
    from pythonql_spark.streaming import (stateful_predicate_windows,
                                          with_watermark)

    start = lambda curr, at, prev, nxt: curr["value"] >= 150
    end = lambda curr, at, prev, nxt, s_curr, s_at: curr["value"] < 20

    ev = tables["events"].select("user_id", "ts", "value")
    src = str(tmp_path / "evw")
    ev.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = stateful_predicate_windows(
        with_watermark(stream, "ts", "0 seconds"),
        start_when=start, end_when=end, only_end=True)
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("t_predwin")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.user_id, r.s_at, r.e_at, r.n_events, round(r.sum_value, 6))
           for r in spark.table("t_predwin").collect()}

    batch = predicate_windows(
        ev, order_by=["ts", "value"], partition_by="user_id",
        tumbling=True, only_end=True,
        start_when=lambda curr, at, prev, nxt: curr["value"] >= 150,
        end_when=lambda curr, at, prev, nxt, s_curr, s_at:
            curr["value"] < 20)
    want = set()
    for r in batch.collect():
        want.add((r.user_id, r.s_at, r.e_at, len(r.window),
                  round(sum(x["value"] for x in r.window), 6)))
    assert got == want and got


def test_stateful_predicate_windows_batch_flushes_open_window(spark, tables):
    """On BATCH input NoTimeout never fires, so the end-of-input path
    must flush the trailing open window when only_end=False — same
    contract as the batch operator's unclosed-window emission
    (window_clause.predicate_windows, closed=False rows)."""
    from pythonql_spark.operators.window_clause import predicate_windows
    from pythonql_spark.streaming import stateful_predicate_windows

    start = lambda curr, at, prev, nxt: curr["value"] >= 150
    end = lambda curr, at, prev, nxt, s_curr, s_at: curr["value"] < 20

    ev = tables["events"].select("user_id", "ts", "value")
    out = stateful_predicate_windows(
        ev, start_when=start, end_when=end, only_end=False)
    got = {(r.user_id, r.s_at, r.e_at, r.n_events, round(r.sum_value, 6))
           for r in out.collect()}

    batch = predicate_windows(
        ev, order_by=["ts", "value"], partition_by="user_id",
        tumbling=True, only_end=False,
        start_when=start, end_when=end)
    want = set()
    for r in batch.collect():
        want.add((r.user_id, r.s_at, r.e_at, len(r.window),
                  round(sum(x["value"] for x in r.window), 6)))
    assert got == want and got
    # at least one key's trailing window is open at end-of-input
    assert any(not r.closed for r in batch.collect())


def test_stateful_sessionize_batch_flushes_final_sessions(spark, tables):
    """Batch input: every key's final session must be emitted (the
    stream emits it via event-time timeout; batch flushes at
    end-of-input), so total events across sessions == input rows."""
    from pythonql_spark.streaming import stateful_sessionize

    ev = tables["events"].select("user_id", "ts", "value")
    sess = stateful_sessionize(ev, gap_ms=30 * 60 * 1000)
    total = sess.groupBy().sum("n_events").first()[0]
    assert total == ev.count()


def test_dedup_ingest_stream_matches_batch(spark, tables, tmp_path):
    """foreachBatch incremental dedup: stream output == the batch
    dedup_increment on the same data, and a replayed run is idempotent
    (partition overwrite, not double-append)."""
    from pythonql_spark.operators.dedup import dedup_increment
    from pythonql_spark.streaming import dedup_ingest_stream, run_to_completion

    docs = tables["documents"]
    corpus = docs.filter("doc_id < 300").select("doc_id", "text").cache()
    # arriving batch: fresh docs + exact copies of corpus docs (near-dup
    # catches verbatim copies trivially) + an in-batch duplicate pair
    fresh = docs.filter("doc_id >= 300 and doc_id < 340") \
        .select("doc_id", "text")
    copies = (corpus.filter("doc_id < 10")
              .selectExpr("doc_id + 100000 as doc_id", "text"))
    twin = fresh.filter("doc_id = 300") \
        .selectExpr("doc_id + 200000 as doc_id", "text")
    arriving = fresh.union(copies).union(twin)

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    arriving.write.parquet(src)

    stream = spark.readStream.schema(arriving.schema).parquet(src)
    q = dedup_ingest_stream(stream, corpus, out, ck,
                            jaccard_threshold=0.5)
    run_to_completion(q)

    got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    want = sorted(r.doc_id for r in
                  dedup_increment(arriving, corpus,
                                  jaccard_threshold=0.5).collect())
    assert got == want
    # copies of corpus docs and the in-batch twin were rejected
    assert not any(d >= 100000 for d in got)
    assert 300 in got

    # replay the SAME batch from a fresh checkpoint: the batch-id
    # partition is overwritten, never appended twice
    import shutil
    shutil.rmtree(ck)
    stream2 = spark.readStream.schema(arriving.schema).parquet(src)
    q2 = dedup_ingest_stream(stream2, corpus, out, ck,
                             jaccard_threshold=0.5)
    run_to_completion(q2)
    again = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert again == got


def test_dedup_ingest_stream_with_persisted_index(spark, tables, tmp_path):
    """The production shape: micro-batches probe a persisted bucketed
    LSH index instead of re-signaturing the corpus — output must equal
    the recompute path."""
    import shutil

    from pythonql_spark.operators.dedup import build_minhash_index
    from pythonql_spark.streaming import dedup_ingest_stream, run_to_completion

    docs = tables["documents"]
    corpus = docs.filter("doc_id < 300").select("doc_id", "text").cache()
    arriving = (docs.filter("doc_id >= 300 and doc_id < 360")
                .select("doc_id", "text")
                .union(corpus.filter("doc_id < 15")
                       .selectExpr("doc_id + 500000 as doc_id", "text")))
    src = str(tmp_path / "in2")
    arriving.write.parquet(src)

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/ingest_idx", ignore_errors=True)
    spark.sql("DROP TABLE IF EXISTS ingest_idx")
    build_minhash_index(corpus, "ingest_idx")

    outs = {}
    for tag, kw in (("recompute", {}), ("indexed", {"index_table": "ingest_idx"})):
        out = str(tmp_path / f"out_{tag}")
        ck = str(tmp_path / f"ck_{tag}")
        stream = spark.readStream.schema(arriving.schema).parquet(src)
        run_to_completion(dedup_ingest_stream(
            stream, corpus, out, ck, jaccard_threshold=0.5, **kw))
        outs[tag] = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert outs["indexed"] == outs["recompute"]
    assert not any(d >= 500000 for d in outs["indexed"])
    assert len(outs["indexed"]) > 0


def test_bloom_dedup_ingest_exact_and_replay(spark, tables, tmp_path):
    """Bloom-prefiltered EXACT streaming dedup: output equals a batch
    exact dedup against corpus ∪ in-batch (no false negatives by
    construction, fp confirmed away by the exact anti-join), and a
    replayed batch is idempotent."""
    import shutil

    from pythonql_spark.streaming import (bloom_dedup_ingest_stream,
                                          run_to_completion)

    docs = tables["documents"]
    corpus = docs.filter("doc_id < 300").select("doc_id", "text").cache()
    fresh = docs.filter("doc_id >= 300 and doc_id < 340") \
        .select("doc_id", "text")
    copies = (corpus.filter("doc_id < 10")
              .selectExpr("doc_id + 100000 as doc_id", "text"))
    twin = fresh.filter("doc_id = 300") \
        .selectExpr("doc_id + 200000 as doc_id", "text")
    arriving = fresh.union(copies).union(twin)

    src, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    arriving.write.parquet(src)
    stream = spark.readStream.schema(arriving.schema).parquet(src)
    run_to_completion(bloom_dedup_ingest_stream(stream, corpus, out, ck))

    got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    # exact recompute: texts not in corpus, one id (smallest) per text
    want = sorted(r.doc_id for r in
                  arriving.join(corpus.select("text").distinct(),
                                "text", "left_anti")
                  .groupBy("text").agg({"doc_id": "min"})
                  .withColumnRenamed("min(doc_id)", "doc_id").collect())
    assert got == want
    assert not any(d >= 100000 for d in got)   # corpus copies + twin out
    assert 300 in got

    # replay from a fresh checkpoint: partition overwritten, not doubled
    shutil.rmtree(ck)
    stream2 = spark.readStream.schema(arriving.schema).parquet(src)
    run_to_completion(bloom_dedup_ingest_stream(stream2, corpus, out, ck))
    again = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert again == got


def test_pq_index_ingest_stream_parity_and_replay(spark, tables, tmp_path):
    """Streaming PQ index maintenance: streamed encodes are byte-equal
    to a batch pq_encode with the same codebook, a replayed batch is
    idempotent, and search over the incrementally-built index equals
    search over a batch-built one."""
    import shutil

    from pythonql_spark.operators.pq import pq_encode, pq_topk, train_pq
    from pythonql_spark.streaming import (pq_index_ingest_stream,
                                          run_to_completion)

    emb = tables["embeddings"]
    corpus = emb.filter("vec_id < 350").cache()
    arriving = emb.filter("vec_id >= 350")
    codebook = train_pq(corpus, m=8, nbits=4, train_sample=512)

    src, out, ck = (str(tmp_path / d) for d in ("in", "idx", "ck"))
    arriving.write.parquet(src)
    stream = spark.readStream.schema(arriving.schema).parquet(src)
    run_to_completion(pq_index_ingest_stream(stream, codebook, out, ck))

    streamed = {r.vec_id: bytes(r.pq_code)
                for r in spark.read.parquet(out).collect()}
    batch = {r.vec_id: bytes(r.pq_code)
             for r in pq_encode(arriving, codebook)
             .select("vec_id", "pq_code").collect()}
    assert streamed == batch                     # byte-equal codes

    # replay from a fresh checkpoint: partition overwritten, not doubled
    shutil.rmtree(ck)
    stream2 = spark.readStream.schema(arriving.schema).parquet(src)
    run_to_completion(pq_index_ingest_stream(stream2, codebook, out, ck))
    assert spark.read.parquet(out).count() == len(batch)

    # search over corpus-encode ∪ streamed index == search over a
    # batch-built index of the same rows
    full = corpus.union(arriving)
    inc_index = pq_encode(corpus, codebook).select("vec_id", "pq_code") \
        .unionByName(spark.read.parquet(out).select("vec_id", "pq_code"))
    got = pq_topk(full, [1, 2, 3], k=5, codebook=codebook,
                  encoded=inc_index).collect()
    want = pq_topk(full, [1, 2, 3], k=5, codebook=codebook,
                   encoded=pq_encode(full, codebook)).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_ivfpq_index_ingest_stream(spark, tables, tmp_path):
    """Streaming IVF-PQ maintenance: batches land cell-partitioned
    residual codes; search over the incrementally-built index equals
    a batch-built one, and the probe filter prunes partitions."""
    from pythonql_spark.operators.pq import (ivfpq_encode, ivfpq_topk,
                                             train_ivfpq)
    from pythonql_spark.streaming import (pq_index_ingest_stream,
                                          run_to_completion)

    emb = tables["embeddings"]
    corpus = emb.filter("vec_id < 350").cache()
    arriving = emb.filter("vec_id >= 350")
    cents, cb = train_ivfpq(corpus, n_cells=16, m=8, nbits=4,
                            train_sample=256)

    src, out, ck = (str(tmp_path / d) for d in ("in", "idx", "ck"))
    arriving.write.parquet(src)
    stream = spark.readStream.schema(arriving.schema).parquet(src)
    run_to_completion(pq_index_ingest_stream(stream, cb, out, ck,
                                             centroids=cents))

    inc_index = (ivfpq_encode(corpus, cents, cb)
                 .select("vec_id", "ivf_cell", "pq_code")
                 .unionByName(spark.read.parquet(out)
                              .select("vec_id", "ivf_cell", "pq_code")))
    full = corpus.union(arriving)
    got = ivfpq_topk(full, [1, 2, 3], k=5, n_probe=4, centroids=cents,
                     codebook=cb, encoded=inc_index).collect()
    want = ivfpq_topk(full, [1, 2, 3], k=5, n_probe=4, centroids=cents,
                      codebook=cb,
                      encoded=ivfpq_encode(full, cents, cb)).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # cell directories exist under each batch partition (file-level
    # pruning surface for the probe filter)
    import glob
    assert glob.glob(f"{out}/{'_ingest_batch'}=*/ivf_cell=*")


def test_interval_join_fractional_seconds(spark):
    """Sub-second bounds: repr(1e-05) is scientific notation, which the
    INTERVAL literal parser rejects — bounds must render fixed-point."""
    import datetime
    from pythonql_spark.streaming import interval_join
    t0 = datetime.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, t0)], "k int, ts timestamp")
    right = spark.createDataFrame(
        [(1, t0), (1, t0 + datetime.timedelta(seconds=1))],
        "k int, ts timestamp")
    out = interval_join(left, right, on="k", lower=-1e-05, upper=1e-05)
    assert out.count() == 1          # only the exact-time match


def test_stateful_ops_string_keys(spark, tmp_path):
    """Key columns are not restricted to long: the output schema and the
    batch path's empty-chunk dtypes must derive from the input schema.
    Covers batch predicate windows, batch sessionize, and a streaming
    sessionize whose session closes mid-stream (gap elapsed in data)."""
    import datetime
    from pythonql_spark.streaming import (stateful_predicate_windows,
                                          stateful_sessionize,
                                          with_watermark)
    TS = datetime.datetime
    rows = ([("alice", TS(2024, 1, 1, 0, 0, s), float(s)) for s in (0, 1, 2)]
            + [("alice", TS(2024, 1, 1, 0, 0, s), float(s)) for s in (30, 31)]
            + [("bob", TS(2024, 1, 1, 0, 0, 5), 5.0)])
    ev = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")

    w = stateful_predicate_windows(
        ev,
        start_when=lambda c, at, p, n: c["value"] >= 1,
        end_when=lambda c, at, p, n, sc, sa: c["value"] >= sc["value"] + 29,
        only_end=True)
    got = sorted((r.user_id, r.s_at, r.e_at) for r in w.collect())
    assert got == [("alice", 1, 3)]

    s = stateful_sessionize(ev, gap_ms=10_000, key_col="user_id")
    got = sorted((r.user_id, r.n_events) for r in s.collect())
    assert got == [("alice", 2), ("alice", 3), ("bob", 1)]

    # streaming: alice's first session closes when the s=30 event
    # arrives (28s >= 10s gap) — emitted even though the watermark
    # never times the final sessions out
    src, ck = str(tmp_path / "skey_in"), str(tmp_path / "skey_ck")
    ev.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    st = stateful_sessionize(with_watermark(stream, "ts", "1 minute"),
                             gap_ms=10_000, key_col="user_id")
    q = (st.writeStream.format("memory").queryName("skey_sessions")
         .outputMode("append").option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted((r.user_id, r.n_events)
                 for r in spark.table("skey_sessions").collect())
    assert got == [("alice", 3)]


def test_drift_monitor_stream_matches_batch(spark, tables, tmp_path):
    """foreachBatch PSI monitor: the streamed per-batch PSI row equals
    the batch psi_drift on the same data, and a replayed run is
    idempotent (partition overwrite, not double-append)."""
    import shutil

    from pythonql_spark.operators.profile import psi_drift
    from pythonql_spark.streaming import drift_monitor_stream, run_to_completion

    docs = tables["documents"]
    reference = docs.filter("doc_id % 2 = 1").select("lang", "n_chars")
    arriving = docs.filter("doc_id % 2 = 0").select("lang", "n_chars")

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    arriving.write.parquet(src)

    stream = spark.readStream.schema(arriving.schema).parquet(src)
    q = drift_monitor_stream(stream, reference, "n_chars", 0.0, 600.0, 20,
                             out, ck, keys=["lang"])
    run_to_completion(q)

    got = sorted((r.lang, r.psi, r.n_a, r.n_b)
                 for r in spark.read.parquet(out).collect())
    want = sorted((r.lang, r.psi, r.n_a, r.n_b)
                  for r in psi_drift(arriving, reference, "n_chars",
                                     0.0, 600.0, 20,
                                     keys=["lang"]).collect())
    assert got == want and len(got) > 0

    # replay from a fresh checkpoint: the batch partition is rewritten
    shutil.rmtree(ck)
    stream2 = spark.readStream.schema(arriving.schema).parquet(src)
    q2 = drift_monitor_stream(stream2, reference, "n_chars", 0.0, 600.0,
                              20, out, ck, keys=["lang"])
    run_to_completion(q2)
    again = sorted((r.lang, r.psi, r.n_a, r.n_b)
                   for r in spark.read.parquet(out).collect())
    assert again == got


def test_image_dedup_ingest_stream(spark, tables, tmp_path):
    """Perceptual image ingest: stream output == the same batch
    composition (in-batch ahash collapse + banded index probe), and
    a replayed batch is idempotent."""
    import shutil

    from pyspark.sql import functions as F

    from pythonql_spark.operators import multimodal as MM
    from pythonql_spark.streaming import run_to_completion
    from pythonql_spark.streaming.ingest import image_dedup_ingest_stream

    docs = tables["documents"]

    def media_of(df):
        return df.select(
            "doc_id",
            MM.make_media(MM.render_text_png("text"), "image", "png",
                          8, 8).alias("media"))

    corpus = media_of(docs.filter("doc_id < 30"))
    index = MM.image_ahash(corpus).select("doc_id", "ahash").cache()
    # arriving: fresh docs + exact pixel copies of indexed docs + an
    # in-batch twin (same text -> same image)
    fresh = docs.filter("doc_id >= 30 and doc_id < 50") \
        .select("doc_id", "text")
    copies = (docs.filter("doc_id < 10")
              .selectExpr("doc_id + 100000 as doc_id", "text"))
    twin = docs.filter("doc_id = 30") \
        .selectExpr("doc_id + 200000 as doc_id", "text")
    arriving = media_of(fresh.union(copies).union(twin))

    src, out, ck = (str(tmp_path / p) for p in ("in", "out", "ck"))
    arriving.write.parquet(src)
    stream = spark.readStream.schema(arriving.schema).parquet(src)
    run_to_completion(image_dedup_ingest_stream(stream, index, out, ck))
    got = sorted(r.doc_id for r in spark.read.parquet(out).collect())

    # batch reference: same operators, no stream
    hashed = MM.image_ahash(arriving).select("doc_id", "ahash")
    within = (MM.ahash_pairs(hashed)
              .select(F.col("id_b").alias("doc_id")).distinct())
    kept = hashed.join(within, "doc_id", "left_anti")
    dup = (MM.ahash_matches(kept, index)
           .select(F.col("probe_id").alias("doc_id")).distinct())
    want = sorted(r.doc_id for r in
                  kept.join(dup, "doc_id", "left_anti").collect())
    assert got == want
    assert not any(d >= 100000 for d in got)   # copies + twin rejected
    assert 30 in got

    shutil.rmtree(ck)
    stream2 = spark.readStream.schema(arriving.schema).parquet(src)
    run_to_completion(image_dedup_ingest_stream(stream2, index, out, ck))
    again = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert again == got


def test_sample_maintain_stream_bottom_k(spark, tables, tmp_path):
    """The streamed bottom-k sample == batch sample_exact_n over
    everything seen, regardless of batch arrival; replaying the last
    batch is a no-op by the min-n algebra."""
    import shutil

    from pythonql_spark.operators.sampling import sample_exact_n
    from pythonql_spark.streaming import run_to_completion
    from pythonql_spark.streaming.ingest import sample_maintain_stream

    docs = tables["documents"].select("doc_id", "text")
    src, out, ck = (str(tmp_path / p) for p in ("in", "sample", "ck"))
    # two waves into the same source dir == multiple micro-batches
    docs.filter("doc_id < 200").write.parquet(src)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 2).parquet(src))
    run_to_completion(sample_maintain_stream(stream, 25, out, ck))
    docs.filter("doc_id >= 200").write.mode("append").parquet(src)
    stream2 = (spark.readStream.schema(docs.schema)
               .option("maxFilesPerTrigger", 2).parquet(src))
    run_to_completion(sample_maintain_stream(stream2, 25, out, ck))

    got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    want = sorted(r.doc_id for r in sample_exact_n(docs, 25).collect())
    assert got == want and len(got) == 25

    # replay everything from a fresh checkpoint: same sample
    shutil.rmtree(ck)
    stream3 = spark.readStream.schema(docs.schema).parquet(src)
    run_to_completion(sample_maintain_stream(stream3, 25, out, ck))
    again = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert again == got


def test_quality_monitor_stream_flags_bad_batch(spark, tables, tmp_path):
    """Per-batch expectation verdicts land per micro-batch; a batch
    with planted nulls fails the null-rate check, clean batches pass;
    replay rewrites rather than double-appends."""
    import shutil

    from pyspark.sql import functions as F

    from pythonql_spark.streaming import run_to_completion
    from pythonql_spark.streaming.ingest import quality_monitor_stream

    docs = tables["documents"].select("doc_id", "text")
    good = docs.filter("doc_id < 100")
    bad = docs.filter("doc_id >= 100 and doc_id < 200") \
        .selectExpr("doc_id",
                    "case when doc_id % 2 = 0 then NULL else text end "
                    "as text")
    src, out, ck = (str(tmp_path / p) for p in ("in", "log", "ck"))
    good.coalesce(1).write.parquet(src)
    bad.coalesce(1).write.mode("append").parquet(src)
    checks = {"null_rate": ("avg(cast(text IS NULL as double))",
                            "value < 0.05")}
    stream = (spark.readStream.schema(good.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    run_to_completion(quality_monitor_stream(stream, checks, out, ck))
    log = spark.read.parquet(out)
    rows = log.collect()
    assert len(rows) == 2
    assert sorted(r.passed for r in rows) == [False, True]

    shutil.rmtree(ck)
    stream2 = spark.readStream.schema(good.schema).parquet(src)
    run_to_completion(quality_monitor_stream(stream2, checks, out, ck))
    assert spark.read.parquet(out).count() == 2


def test_int8_index_ingest_stream_parity_and_replay(spark, tables, tmp_path):
    """Streaming int8 index maintenance: streamed codes+norms are
    byte-equal to a batch quantize_index (scalar quantization has no
    trained state, so parity is unconditional), a replayed batch is
    idempotent, and search over the incrementally-built index equals
    a direct int8_topk over the same rows."""
    import shutil

    from pythonql_spark.operators.quantize import int8_topk, quantize_index
    from pythonql_spark.streaming import (int8_index_ingest_stream,
                                          run_to_completion)

    emb = tables["embeddings"]
    corpus = emb.filter("vec_id < 350").cache()
    arriving = emb.filter("vec_id >= 350")

    src, out, ck = (str(tmp_path / d) for d in ("in", "idx", "ck"))
    arriving.write.parquet(src)
    stream = spark.readStream.schema(arriving.schema).parquet(src)
    run_to_completion(int8_index_ingest_stream(stream, out, ck))

    streamed = {r.vec_id: (tuple(r.q8), r.n2)
                for r in spark.read.parquet(out).collect()}
    batch = {r.vec_id: (tuple(r.q8), r.n2)
             for r in quantize_index(arriving).collect()}
    assert streamed == batch                    # bit-equal codes+norms

    # replay from a fresh checkpoint: partition overwritten, not doubled
    shutil.rmtree(ck)
    stream2 = spark.readStream.schema(arriving.schema).parquet(src)
    run_to_completion(int8_index_ingest_stream(stream2, out, ck))
    assert spark.read.parquet(out).count() == len(batch)

    # search: corpus index ∪ streamed index == direct quantized search
    full = corpus.union(arriving)
    inc_index = quantize_index(corpus).unionByName(
        spark.read.parquet(out).select("vec_id", "q8", "n2"))
    got = int8_topk(full, [1, 2, 3], k=5, encoded=inc_index).collect()
    want = int8_topk(full, [1, 2, 3], k=5).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_sketch_maintain_stream_matches_batch(spark, tables, tmp_path):
    """The read-side max-merge of the streamed per-batch register
    deltas == the batch hll_registers_md5 over everything seen,
    regardless of micro-batch boundaries; a crash-replayed batch
    rewrites its own partition AND would be absorbed by max
    idempotence even if it double-landed."""
    import os
    import shutil

    from pythonql_spark.operators.sketch import (hll_estimate_md5,
                                                 hll_registers_md5)
    from pythonql_spark.streaming import run_to_completion
    from pythonql_spark.streaming.ingest import (read_sketch_registers,
                                                 sketch_maintain_stream)

    docs = tables["documents"].select("doc_id", "lang", "source")
    cols = ["doc_id", "lang"]
    src, out, ck = (str(tmp_path / p) for p in ("in", "regs", "ck"))

    docs.filter("doc_id < 200").write.parquet(src)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 2).parquet(src))
    run_to_completion(sketch_maintain_stream(stream, cols, out, ck))
    # second wave arrives; the maintainer lands only the delta
    docs.filter("doc_id >= 200").write.mode("append").parquet(src)
    stream2 = (spark.readStream.schema(docs.schema)
               .option("maxFilesPerTrigger", 2).parquet(src))
    run_to_completion(sketch_maintain_stream(stream2, cols, out, ck))

    def as_map(df):
        return {(r.col_name, r.bucket): r.register for r in df.collect()}

    got = as_map(read_sketch_registers(spark, out))
    want = as_map(hll_registers_md5(docs, cols))
    assert got == want

    # the state answers the profile question without any rescan
    est = {r.col_name: r.n_distinct for r in hll_estimate_md5(
        read_sketch_registers(spark, out)).collect()}
    exact = docs.selectExpr("count(distinct doc_id) as n").collect()[0].n
    assert abs(est["doc_id"] - exact) <= max(0.26 * exact, 8)

    # crash replay: drop the LAST batch's commit marker so a restart
    # re-executes that batch — it must REWRITE its partition, leaving
    # the merged registers unchanged
    commits = os.path.join(ck, "commits")
    last = max((f for f in os.listdir(commits) if f.isdigit()), key=int)
    os.remove(os.path.join(commits, last))
    crc = os.path.join(commits, f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    stream3 = (spark.readStream.schema(docs.schema)
               .option("maxFilesPerTrigger", 2).parquet(src))
    run_to_completion(sketch_maintain_stream(stream3, cols, out, ck))
    assert as_map(read_sketch_registers(spark, out)) == want
    shutil.rmtree(ck)


def test_cms_maintain_stream_matches_batch(spark, tables, tmp_path):
    """The read-side merge of the streamed per-batch CMS partitions
    == the batch cms_counters_md5 over everything seen; replaying
    from a fresh checkpoint rewrites partitions instead of
    double-counting (sum is not idempotent — the landing pattern is
    what makes replay safe)."""
    import shutil

    from pythonql_spark.operators.sketch import (cms_counters_md5,
                                                 cms_merge)
    from pythonql_spark.streaming import run_to_completion
    from pythonql_spark.streaming.ingest import cms_maintain_stream

    orders = tables["orders"].select("o_orderkey", "o_custkey")
    src, out, ck = (str(tmp_path / p) for p in ("in", "cms", "ck"))
    orders.filter("o_orderkey % 3 != 0").write.parquet(src)
    stream = (spark.readStream.schema(orders.schema)
              .option("maxFilesPerTrigger", 2).parquet(src))
    run_to_completion(cms_maintain_stream(stream, "o_custkey", out, ck))
    orders.filter("o_orderkey % 3 = 0").write.mode("append").parquet(src)
    stream2 = (spark.readStream.schema(orders.schema)
               .option("maxFilesPerTrigger", 2).parquet(src))
    run_to_completion(cms_maintain_stream(stream2, "o_custkey", out, ck))

    def as_map(df):
        return {(r.d, r.slot): r.counter for r in df.collect()}

    landed = spark.read.parquet(out).drop("_ingest_batch")
    got = as_map(cms_merge(landed))
    want = as_map(cms_counters_md5(orders, "o_custkey"))
    assert got == want

    # crash replay: drop the LAST batch's commit marker so a restart
    # re-executes that batch against the same checkpoint — the
    # re-executed batch must REWRITE its own partition (dynamic
    # overwrite), leaving the merged totals unchanged.  (A fresh
    # checkpoint is a new stream identity with new batch boundaries —
    # sum-merge state is only replay-safe under the checkpointed
    # contract, which is exactly what a crash-restart exercises.)
    import os
    commits = os.path.join(ck, "commits")
    last = max((f for f in os.listdir(commits) if f.isdigit()), key=int)
    os.remove(os.path.join(commits, last))
    crc = os.path.join(commits, f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    stream3 = (spark.readStream.schema(orders.schema)
               .option("maxFilesPerTrigger", 2).parquet(src))
    run_to_completion(cms_maintain_stream(stream3, "o_custkey", out, ck))
    landed2 = spark.read.parquet(out).drop("_ingest_batch")
    assert as_map(cms_merge(landed2)) == want
    shutil.rmtree(ck)


def test_compact_sketch_registers(spark, tables, tmp_path):
    """Compaction folds the landed per-batch register deltas into one
    partition without changing the merged registers, and the stream
    keeps absorbing new batches afterwards."""
    import os

    from pythonql_spark.operators.sketch import hll_registers_md5
    from pythonql_spark.streaming import run_to_completion
    from pythonql_spark.streaming.ingest import (compact_sketch_registers,
                                                 read_sketch_registers,
                                                 sketch_maintain_stream)

    docs = tables["documents"].select("doc_id", "lang")
    src, out, ck = (str(tmp_path / p) for p in ("in", "regs", "ck"))
    docs.filter("doc_id < 200").repartition(4).write.parquet(src)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    run_to_completion(sketch_maintain_stream(stream, ["doc_id"], out, ck))

    def as_map():
        return {(r.col_name, r.bucket): r.register
                for r in read_sketch_registers(spark, out).collect()}

    before = as_map()
    n_parts_before = len([d for d in os.listdir(out)
                          if d.startswith("_ingest_batch=")])
    assert n_parts_before > 1            # multiple landed batches
    compact_sketch_registers(spark, out)
    assert as_map() == before            # fold is value-neutral
    n_parts_after = len([d for d in os.listdir(out)
                         if d.startswith("_ingest_batch=")])
    assert n_parts_after == 1

    # the stream continues against the compacted directory
    docs.filter("doc_id >= 200").write.mode("append").parquet(src)
    stream2 = (spark.readStream.schema(docs.schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
    run_to_completion(sketch_maintain_stream(stream2, ["doc_id"], out, ck))
    want = {(r.col_name, r.bucket): r.register
            for r in hll_registers_md5(docs, ["doc_id"]).collect()}
    assert as_map() == want


def test_compact_cms_counters_respects_commit_horizon(spark, tables,
                                                      tmp_path):
    """CMS compaction folds only COMMITTED batches (sum is not
    idempotent): after compaction the merged totals are unchanged,
    and a crash replay of the LAST batch — simulated by deleting its
    commit marker before compacting — must leave that batch's
    partition out of the fold so its re-execution rewrites rather
    than double-counts."""
    import os
    import shutil

    from pythonql_spark.operators.sketch import (cms_counters_md5,
                                                 cms_merge)
    from pythonql_spark.streaming import run_to_completion
    from pythonql_spark.streaming.ingest import (cms_maintain_stream,
                                                 compact_cms_counters)

    orders = tables["orders"].select("o_orderkey", "o_custkey")
    src, out, ck = (str(tmp_path / p) for p in ("in", "cms", "ck"))
    orders.repartition(6).write.parquet(src)
    stream = (spark.readStream.schema(orders.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    run_to_completion(cms_maintain_stream(stream, "o_custkey", out, ck))

    def as_map():
        landed = spark.read.parquet(out).drop("_ingest_batch")
        return {(r.d, r.slot): r.counter for r in cms_merge(landed).collect()}

    def parts():
        return sorted(int(d.split("=")[1]) for d in os.listdir(out)
                      if d.startswith("_ingest_batch="))

    want = {(r.d, r.slot): r.counter
            for r in cms_counters_md5(orders, "o_custkey").collect()}
    assert as_map() == want
    assert len(parts()) > 2

    # simulate a crash after the last batch LANDED but before it
    # COMMITTED: its partition exists, its commit marker does not
    commits = os.path.join(ck, "commits")
    last = max((f for f in os.listdir(commits) if f.isdigit()), key=int)
    os.remove(os.path.join(commits, last))
    crc = os.path.join(commits, f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    compact_cms_counters(spark, out, ck)
    # the uncommitted batch's partition survived the fold untouched
    assert int(last) in parts() and len(parts()) == 2
    assert as_map() == want

    # restart: Structured Streaming re-executes the uncommitted batch,
    # rewriting its partition — totals must remain exact, not doubled
    stream2 = (spark.readStream.schema(orders.schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
    run_to_completion(cms_maintain_stream(stream2, "o_custkey", out, ck))
    assert as_map() == want
    shutil.rmtree(ck)


def test_compact_cms_crash_between_fold_and_swap_is_resumable(
        spark, tables, tmp_path, monkeypatch):
    """The two-phase CMS compaction must never double-count across a
    crash: if the process dies after the fold landed in the temp dir
    but before the partition swap, the directory still reads EXACTLY
    (originals intact, temp ignored by the reader), and the next
    compaction call resumes the swap from the manifest instead of
    re-folding the fold."""
    import os

    import pythonql_spark.streaming.ingest as ingest
    from pythonql_spark.operators.sketch import (cms_counters_md5,
                                                 cms_merge)
    from pythonql_spark.streaming import run_to_completion

    orders = tables["orders"].select("o_orderkey", "o_custkey")
    src, out, ck = (str(tmp_path / p) for p in ("in", "cms", "ck"))
    orders.repartition(5).write.parquet(src)
    stream = (spark.readStream.schema(orders.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    run_to_completion(ingest.cms_maintain_stream(
        stream, "o_custkey", out, ck))

    def as_map():
        landed = spark.read.parquet(out).drop("_ingest_batch")
        return {(r.d, r.slot): r.counter
                for r in cms_merge(landed).collect()}

    want = {(r.d, r.slot): r.counter
            for r in cms_counters_md5(orders, "o_custkey").collect()}
    assert as_map() == want

    # crash exactly between phase 1 (manifest + temp fold written)
    # and phase 2 (the swap)
    real_finish = ingest._finish_cms_swap

    def boom(*a, **k):
        raise RuntimeError("simulated crash before swap")

    monkeypatch.setattr(ingest, "_finish_cms_swap", boom)
    try:
        ingest.compact_cms_counters(spark, out, ck)
        assert False, "crash did not fire"
    except RuntimeError:
        pass
    monkeypatch.setattr(ingest, "_finish_cms_swap", real_finish)

    # mid-crash state: manifest + completed temp fold on disk, all
    # original partitions untouched — and the reader still sums exact
    assert os.path.exists(os.path.join(out, ingest._CMS_MANIFEST))
    assert os.path.exists(os.path.join(out, ingest._CMS_TMP, "_SUCCESS"))
    assert as_map() == want

    # the next call resumes the swap (no re-fold) and finishes
    ingest.compact_cms_counters(spark, out, ck)
    parts = [d for d in os.listdir(out) if d.startswith("_ingest_batch=")]
    assert len(parts) == 1
    assert not os.path.exists(os.path.join(out, ingest._CMS_MANIFEST))
    assert as_map() == want


def test_compact_cms_crash_after_rename_is_resumable(
        spark, tables, tmp_path, monkeypatch):
    """Crash on the OTHER side of the swap seam: the fold was renamed
    into the target partition but the process died before the source
    partitions / manifest were deleted.  The resume path must detect
    that phase 2 started (the fold's _SUCCESS marker rode into the
    target partition — landed batches never carry one) and FINISH the
    swap; treating it as 'fold never completed' would discard the
    manifest and leave the folded sum plus its sources both counted
    forever (sum-merge is not idempotent)."""
    import os

    import pythonql_spark.streaming.ingest as ingest
    from pythonql_spark.operators.sketch import (cms_counters_md5,
                                                 cms_merge)
    from pythonql_spark.streaming import run_to_completion

    orders = tables["orders"].select("o_orderkey", "o_custkey")
    src, out, ck = (str(tmp_path / p) for p in ("in", "cms", "ck"))
    orders.repartition(5).write.parquet(src)
    stream = (spark.readStream.schema(orders.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    run_to_completion(ingest.cms_maintain_stream(
        stream, "o_custkey", out, ck))

    def as_map():
        landed = spark.read.parquet(out).drop("_ingest_batch")
        return {(r.d, r.slot): r.counter
                for r in cms_merge(landed).collect()}

    def parts():
        return sorted(int(d.split("=")[1]) for d in os.listdir(out)
                      if d.startswith("_ingest_batch="))

    want = {(r.d, r.slot): r.counter
            for r in cms_counters_md5(orders, "o_custkey").collect()}
    assert as_map() == want
    n_before = len(parts())
    assert n_before > 2

    # crash exactly after the rename: delete-target + rename happen,
    # then the process dies before any source partition is removed
    real_delete = ingest._delete_batch_partitions

    def boom(*a, **k):
        raise RuntimeError("simulated crash after rename")

    monkeypatch.setattr(ingest, "_delete_batch_partitions", boom)
    try:
        ingest.compact_cms_counters(spark, out, ck)
        assert False, "crash did not fire"
    except RuntimeError:
        pass
    monkeypatch.setattr(ingest, "_delete_batch_partitions", real_delete)

    # mid-crash state: manifest present, tmp gone (renamed away), the
    # target partition carries the fold's _SUCCESS, sources remain
    target = max(parts())
    assert os.path.exists(os.path.join(out, ingest._CMS_MANIFEST))
    assert not os.path.exists(os.path.join(out, ingest._CMS_TMP))
    assert os.path.exists(
        os.path.join(out, f"_ingest_batch={target}", "_SUCCESS"))
    assert len(parts()) == n_before

    # the next call must FINISH the swap — deleting the sources, not
    # the manifest — so the directory reads exact again, once
    ingest.compact_cms_counters(spark, out, ck)
    assert parts() == [target]
    assert not os.path.exists(os.path.join(out, ingest._CMS_MANIFEST))
    assert as_map() == want


def test_compact_cms_truncated_manifest_recovers(spark, tables,
                                                 tmp_path):
    """A crash DURING the manifest write leaves a truncated (or
    empty) manifest file; the manifest is fully written before any
    fold starts, so the originals are provably intact — the next
    compaction call must discard it and compact normally instead of
    raising JSONDecodeError forever."""
    import os

    import pythonql_spark.streaming.ingest as ingest
    from pythonql_spark.operators.sketch import (cms_counters_md5,
                                                 cms_merge)
    from pythonql_spark.streaming import run_to_completion

    orders = tables["orders"].select("o_orderkey", "o_custkey")
    src, out, ck = (str(tmp_path / p) for p in ("in", "cms", "ck"))
    orders.repartition(4).write.parquet(src)
    stream = (spark.readStream.schema(orders.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    run_to_completion(ingest.cms_maintain_stream(
        stream, "o_custkey", out, ck))

    def as_map():
        landed = spark.read.parquet(out).drop("_ingest_batch")
        return {(r.d, r.slot): r.counter
                for r in cms_merge(landed).collect()}

    want = {(r.d, r.slot): r.counter
            for r in cms_counters_md5(orders, "o_custkey").collect()}
    assert as_map() == want

    # simulate the mid-write crash: a half-written manifest on disk
    with open(os.path.join(out, ingest._CMS_MANIFEST), "w") as f:
        f.write('{"target": 3, "sour')

    rows = ingest.compact_cms_counters(spark, out, ck)
    assert rows > 0
    parts = [d for d in os.listdir(out)
             if d.startswith("_ingest_batch=")]
    assert len(parts) == 1
    assert not os.path.exists(os.path.join(out, ingest._CMS_MANIFEST))
    assert as_map() == want


def test_url_dedup_ingest_stream(spark, tables, tmp_path):
    """Canonical-URL dedup ingestion: arriving spellings of pages the
    corpus already holds (www/case/params/percent-encoding variants)
    are rejected even though the raw strings differ; genuinely new
    pages land with their url_norm/domain columns; in-batch spelling
    twins collapse to one row."""
    from pythonql_spark.streaming import run_to_completion
    from pythonql_spark.streaming.ingest import url_dedup_ingest_stream

    corpus = spark.createDataFrame([
        (1, "https://site.com/a?x=1"),
        (2, "https://site.com/b"),
    ], ["doc_id", "url"])
    arriving = spark.createDataFrame([
        # spelling variants of corpus pages -> must be rejected
        (10, "https://WWW.Site.COM/a?utm_source=z&x=1#frag"),
        (11, "http://site.com:80/b/"),
        (12, "https://site.com/%62"),
        # a new page, plus an in-batch spelling twin of it
        (20, "https://site.com/c?y=2"),
        (21, "https://site.com/c?utm_medium=m&y=2"),
        # and a second genuinely new page
        (30, "https://other.com/d"),
    ], ["doc_id", "url"])

    src, out, ck = (str(tmp_path / p) for p in ("in", "out", "ck"))
    arriving.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(arriving.schema).parquet(src)
    run_to_completion(url_dedup_ingest_stream(stream, corpus, out, ck))

    landed = spark.read.parquet(out)
    got = sorted(r.doc_id for r in landed.collect())
    assert got == [20, 30], got
    norms = {r.doc_id: (r.url_norm, r.domain) for r in landed.collect()}
    assert norms[20] == ("https://site.com/c?y=2", "site.com")
    assert norms[30] == ("https://other.com/d", "other.com")
