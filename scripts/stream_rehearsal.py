"""Streaming dress rehearsal (r9): the continuous-ingest half of the
100 TB story, with the same REST-metric truth the batch rehearsal
established in r8 (scale_rehearsal.py).

Shape under test: ``dedup_ingest_stream`` with the PERSISTED bucketed
LSH index probe — the production "documents arrive all day" path.
The standing corpus stays FIXED at sf0.1 (its index is built once,
outside the timed window); the ARRIVING volume is the REALISTIC
rehearsal corpus (scale_rehearsal.build_corpus: per-replica word
salts so replicas share zero shingles, plus planted exact copies
[rep 0] and near-dup suffix edits [rep % 33 == 1] of the standing
corpus), delivered in constant-size micro-batches.

Recorded per (scale, batch-size) row:
  * per-batch wall times from the streaming progress feed (median /
    p95 / max), arriving rows, rows/s
  * the REST executor-metric delta (shuffle bytes, spill, in/out)
  * state on disk: the persisted index + the checkpoint
  * planted-structure invariants: every rep-0 EXACT copy rejected,
    every salted replica kept, ≥95% of the near-dup edits rejected
  * REPLAY idempotence AT SCALE: the last commit file is deleted
    from the checkpoint and the stream restarted — Spark re-runs the
    final micro-batch; output count + content hash must be unchanged
    (dynamic partition overwrite, not double-append)

Batch sizing rule (MEASURED, see REHEARSAL_r9.json): fixed per-batch
cost c ≈ 2.7 s (probe-join planning + landed-partition maintenance),
marginal ≈ 0.031 ms/doc — x101 fpt4 ran 51 batches @ 3.00 s (10k
docs/batch), fpt16 ran 13 @ 3.92 s (40k docs/batch), throughput
3.3k → 9.9k rows/s; per-batch cost stayed FLAT at 5× the volume
(x512 median 3.95 s at the same batch size) and checkpoint state
grew only 0.1 → 0.8 MB across 505k → 2.56M arriving docs.  Rule:
size micro-batches ≥ 250k docs so the fixed cost is < 25% of batch
wall, unless a latency SLO dictates smaller batches.

Run: python scripts/stream_rehearsal.py [reps ...]   (default: 101)
Prints one JSON line per (scale, files/trigger) config.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pythonql_spark import get_spark
from pythonql_spark.sources import load_table

SF = "/root/testdata/sf0.1"
SCRATCH = Path("/root/repo/.scratch/stream_rehearsal")
NEARDUP_MOD = 33   # keep in sync with scale_rehearsal


def dir_mb(path: str) -> float:
    p = Path(path)
    if not p.exists():
        return 0.0
    return round(sum(f.stat().st_size for f in p.rglob("*")
                     if f.is_file()) / 2**20, 1)


def out_fingerprint(spark, out_path: str):
    """(rows, order-free content hash) of the landed output."""
    df = spark.read.parquet(out_path)
    row = (df.selectExpr(
        "count(*) AS n",
        "sum(cast(xxhash64(doc_id, text) as decimal(38,0))) AS h")
        .first())
    return int(row.n), int(row.h)


def stream_run_stats(spark, q, before):
    """(batches, sorted batch walls, metric-MB delta) for a finished
    streaming query — shared by both rehearsal modes so their
    reported metrics can never drift apart."""
    from scripts.scale_rehearsal import stage_totals
    prog = [p for p in q.recentProgress if p["numInputRows"] > 0]
    batch_walls = sorted(
        p["durationMs"].get("triggerExecution", 0) / 1000
        for p in prog)
    delta = {k: v - before[k] for k, v in stage_totals(spark).items()}
    mb = {k: round(v / 2**20, 1) for k, v in delta.items()
          if k.endswith("Bytes") or "Spilled" in k}
    return prog, batch_walls, mb



def _sketch_rehearsal(spark, src: str, d, n_rows: int, reps: int) -> None:
    """REST-metric rehearsal rows for the r9 sketch maintainers: HLL
    register deltas and CMS counters maintained over the arriving
    corpus in constant-size micro-batches.  Correctness here is EXACT
    algebra, not a tolerance: the streamed state max/sum-merges to
    the identical register/counter table the batch operator computes
    over everything seen; crash replay (last commit deleted) and
    compaction both leave it bit-identical."""
    from scripts.scale_rehearsal import stage_totals

    from pythonql_spark.operators.sketch import (cms_counters_md5,
                                                 cms_merge,
                                                 hll_registers_md5)
    from pythonql_spark.streaming import run_to_completion
    from pythonql_spark.streaming.ingest import (
        cms_maintain_stream, compact_cms_counters,
        compact_sketch_registers, read_sketch_registers,
        sketch_maintain_stream)

    arriving = spark.read.parquet(src)
    docs = arriving.select("doc_id", "lang", "text")
    batch_hll = {(r.col_name, r.bucket): r.register
                 for r in hll_registers_md5(
                     docs, ["doc_id", "lang"]).collect()}
    batch_cms = {(r.d, r.slot): r.counter
                 for r in cms_counters_md5(docs, "doc_id").collect()}

    for name, launch, state_of, batch_state, compact in (
        ("hll_maintain",
         lambda s, out, ck: sketch_maintain_stream(
             s.select("doc_id", "lang"), ["doc_id", "lang"], out, ck),
         lambda out: {(r.col_name, r.bucket): r.register
                      for r in read_sketch_registers(spark, out).collect()},
         batch_hll,
         lambda out, ck: compact_sketch_registers(spark, out)),
        ("cms_maintain",
         lambda s, out, ck: cms_maintain_stream(s, "doc_id", out, ck),
         lambda out: {(r.d, r.slot): r.counter for r in cms_merge(
             spark.read.parquet(out).drop("_ingest_batch")).collect()},
         batch_cms,
         lambda out, ck: compact_cms_counters(spark, out, ck)),
    ):
        out, ck = str(d / f"out_{name}"), str(d / f"ck_{name}")
        stream = (spark.readStream.schema(arriving.schema)
                  .option("maxFilesPerTrigger", 16).parquet(src))
        before = stage_totals(spark)
        t0 = time.perf_counter()
        q = launch(stream, out, ck)
        run_to_completion(q, timeout_s=1800)
        wall = time.perf_counter() - t0
        prog, batch_walls, mb = stream_run_stats(spark, q, before)

        assert state_of(out) == batch_state, f"{name}: stream != batch"
        # crash replay: forget the last commit, restart, state unchanged
        commits = sorted((Path(ck) / "commits").glob("[0-9]*"),
                         key=lambda p: int(p.name))
        commits[-1].unlink()
        crc = commits[-1].parent / f".{commits[-1].name}.crc"
        if crc.exists():
            crc.unlink()
        stream2 = (spark.readStream.schema(arriving.schema)
                   .option("maxFilesPerTrigger", 16).parquet(src))
        run_to_completion(launch(stream2, out, ck), timeout_s=1800)
        assert state_of(out) == batch_state, f"{name}: replay diverged"
        state_before_compact = dir_mb(out)
        compact(out, ck)
        assert state_of(out) == batch_state, f"{name}: compaction changed state"

        print(json.dumps({
            "pipeline": f"{name}_x{reps}",
            "arriving_rows": n_rows,
            "batches": len(prog),
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(n_rows / wall),
            "batch_wall_median_s": round(
                batch_walls[len(batch_walls) // 2], 2),
            "batch_wall_max_s": round(batch_walls[-1], 2),
            "stream_equals_batch": True,
            "replay_idempotent": True,
            "compaction_value_neutral": True,
            "state_mb": {"before_compaction": state_before_compact,
                         "after_compaction": dir_mb(out),
                         "checkpoint": dir_mb(ck)},
            "metrics_mb": mb,
        }), flush=True)


def _url_corpus_expr(page: str) -> str:
    """Deterministic canonical-spelling URL for page id expression
    ``page`` — a mix of .example.com and .co.uk (PSL multi-part)
    hosts with a two-param query."""
    host = (f"concat('s', cast({page} % 1000 as string), "
            f"case when {page} % 7 = 0 then '.co.uk' "
            f"else '.example.com' end)")
    return (f"concat('https://', {host}, '/p/', "
            f"cast({page} as string), '?a=1&b=2')")


def _build_url_corpus(spark, reps: int, path: str) -> None:
    """Arriving crawl frontier for the URL-dedup rehearsal: rep 0 is
    a SPELLING VARIANT of each standing-corpus page (www + uppercase
    host + tracking params + fragment / percent-encoded path +
    reordered params / :443 + trailing slash / HTTP://:80 + gclid —
    each must canonicalize onto the corpus url and be REJECTED), all
    other reps are genuinely new pages (every one must be KEPT),
    with a deterministic ftp:// slice among the new pages exercising
    the non-http passthrough at scale."""
    docs = load_table(spark, SF, "documents").select("doc_id")
    r = spark.range(reps).withColumnRenamed("id", "rep")
    page = "(case when rep = 0 then doc_id " \
           "else doc_id + rep * 10000000 end)"
    host = (f"concat('s', cast({page} % 1000 as string), "
            f"case when {page} % 7 = 0 then '.co.uk' "
            f"else '.example.com' end)")
    pid = f"cast({page} as string)"
    url = f"""CASE
      WHEN rep > 0 AND doc_id % 97 = 0
        THEN concat('ftp://x', {pid}, '/f')
      WHEN rep > 0 THEN {_url_corpus_expr(page)}
      WHEN doc_id % 4 = 0 THEN concat('https://WWW.', upper({host}),
             '/p/', {pid}, '?utm_source=x&b=2&a=1#f')
      WHEN doc_id % 4 = 1 THEN concat('https://', {host}, '/%70/',
             {pid}, '?b=2&a=1')
      WHEN doc_id % 4 = 2 THEN concat('https://', {host}, ':443/p/',
             {pid}, '/?a=1&b=2')
      ELSE concat('HTTP://', {host}, ':80/p/', {pid},
             '?a=1&b=2&gclid=z')
    END"""
    out = (docs.crossJoin(F.broadcast(r)).selectExpr(
        f"doc_id * {reps} + rep as doc_id", f"{url} as url"))
    n_files = max(32, reps * 2)
    out.repartition(n_files).write.mode("overwrite").parquet(path)


def _url_fingerprint(spark, out_path: str):
    df = spark.read.parquet(out_path)
    row = (df.selectExpr(
        "count(*) AS n",
        "sum(cast(xxhash64(doc_id, url_norm) as decimal(38,0))) AS h")
        .first())
    return int(row.n), int(row.h)


def _url_rehearsal(spark, d, reps: int) -> None:
    """REST-metric rehearsal row for url_dedup_ingest_stream (35q):
    the canonical-URL crawl-frontier dedup under arriving volume —
    the staged ~450-replace percent-decode chain plus the PSL
    broadcast join run INSIDE every micro-batch's incremental plan,
    so this measures their real per-batch cost, not the batch-mode
    amortization.  Planted invariants are exact: every rep-0
    spelling variant rejected, every new page (ftp slice included)
    kept; replay idempotence re-checked at scale by forgetting the
    last commit."""
    from scripts.scale_rehearsal import stage_totals

    from pythonql_spark.streaming import run_to_completion
    from pythonql_spark.streaming.ingest import url_dedup_ingest_stream

    docs = load_table(spark, SF, "documents").select("doc_id")
    n_corpus = docs.count()
    corpus = docs.selectExpr(
        "doc_id", f"{_url_corpus_expr('doc_id')} as url").cache()
    corpus.count()

    src = str(d / "in")
    t0 = time.perf_counter()
    _build_url_corpus(spark, reps, src)
    arriving = spark.read.parquet(src)
    n_rows = arriving.count()
    print(f"--- arriving x{reps}: {n_rows:,} urls ({dir_mb(src):,.0f} "
          f"MB) built in {time.perf_counter() - t0:.1f}s", flush=True)

    fpt = 16 if reps <= 128 else 64
    out, ck = str(d / "out_url"), str(d / "ck_url")
    stream = (spark.readStream.schema(arriving.schema)
              .option("maxFilesPerTrigger", fpt).parquet(src))
    before = stage_totals(spark)
    t0 = time.perf_counter()
    q = url_dedup_ingest_stream(stream, corpus, out, ck)
    run_to_completion(q, timeout_s=1800)
    wall = time.perf_counter() - t0
    prog, batch_walls, mb = stream_run_stats(spark, q, before)

    landed = spark.read.parquet(out)
    by_rep = (landed.withColumn("rep", F.expr(f"doc_id % {reps}"))
              .groupBy().agg(
        F.sum(F.expr("cast(rep = 0 as long)")).alias("rep0"),
        F.count("*").alias("kept")).first())
    assert int(by_rep.rep0) == 0, \
        f"{int(by_rep.rep0)} corpus spelling variants slipped through"
    assert int(by_rep.kept) == n_rows - n_corpus, \
        f"kept {int(by_rep.kept)} != new pages {n_rows - n_corpus}"

    n_before, h_before = _url_fingerprint(spark, out)
    commits = sorted((Path(ck) / "commits").glob("[0-9]*"),
                     key=lambda p: int(p.name))
    commits[-1].unlink()
    crc = commits[-1].parent / f".{commits[-1].name}.crc"
    if crc.exists():
        crc.unlink()
    stream2 = (spark.readStream.schema(arriving.schema)
               .option("maxFilesPerTrigger", fpt).parquet(src))
    run_to_completion(url_dedup_ingest_stream(stream2, corpus, out, ck),
                      timeout_s=1800)
    assert (n_before, h_before) == _url_fingerprint(spark, out), \
        "replayed final batch changed the output"

    print(json.dumps({
        "pipeline": f"url_dedup_ingest_stream_x{reps}_fpt{fpt}",
        "arriving_rows": n_rows,
        "batches": len(prog),
        "files_per_trigger": fpt,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(n_rows / wall),
        "batch_wall_median_s": round(
            batch_walls[len(batch_walls) // 2], 2),
        "batch_wall_p95_s": round(
            batch_walls[int(len(batch_walls) * 0.95) - 1], 2),
        "batch_wall_max_s": round(batch_walls[-1], 2),
        "kept_rows": int(by_rep.kept),
        "planted": {"variant_rejected": n_corpus,
                    "new_kept": int(by_rep.kept)},
        "replay_idempotent": True,
        "state_mb": {"checkpoint": dir_mb(ck),
                     "landed": dir_mb(out)},
        "metrics_mb": mb,
    }), flush=True)


def _image_rehearsal(spark, d, reps: int) -> None:
    """REST-metric rehearsal row for image_dedup_ingest_stream (35h-n
    family) — the priciest per-row stream (every arriving image is
    PNG-decoded and aHashed inside the micro-batch).  Standing index:
    the sf0.1 corpus rendered + hashed ONCE outside the timed window.
    Arriving: rep 0 is an exact pixel copy of the corpus image (must
    be rejected by the static-index probe — batch-placement-proof),
    every other rep renders genuinely different pixels (sha256-seeded,
    so distinct text → independent hash; must be kept up to the
    computable random-collision slack of the 32-bit-effective aHash),
    and a planted twin slice arrives as two same-pixel rows CO-LOCATED
    in one input file (maxFilesPerTrigger never splits a file, so the
    pair always shares a micro-batch — the larger id must collapse
    in-batch, exactly).  Global stream==batch parity is NOT asserted
    at scale: with multiple micro-batches a random near-pair split
    across batches legitimately diverges from a one-shot batch run —
    the unit test pins parity on the single-batch shape."""
    from scripts.scale_rehearsal import stage_totals

    from pythonql_spark.operators import multimodal as MM
    from pythonql_spark.streaming import run_to_completion
    from pythonql_spark.streaming.ingest import image_dedup_ingest_stream

    TW = 10_000_000_000          # twin-copy id offset

    def media_of(df):
        return df.select(
            "doc_id",
            MM.make_media(MM.render_text_png("text"), "image", "png",
                          8, 8).alias("media"))

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    n_corpus = docs.count()
    t0 = time.perf_counter()
    index = (MM.image_ahash(media_of(docs))
             .select("doc_id", "ahash").cache())
    index.count()                # hash the standing corpus once
    idx_build = round(time.perf_counter() - t0, 1)

    src = str(d / "in")
    r = spark.range(reps).withColumnRenamed("id", "rep")
    base = docs.crossJoin(F.broadcast(r)).selectExpr(
        f"doc_id * {reps} + rep as doc_id",
        "case when rep = 0 then text "
        "else concat(text, ' r', cast(rep as string)) end as text",
        "rep")
    twins = base.filter(f"rep > 0 and doc_id % 101 = 7") \
        .selectExpr(f"doc_id + {TW} as doc_id", "text", "rep")
    arr = base.drop("rep").unionByName(twins.drop("rep")) \
        .withColumn("twin_key", F.expr(f"doc_id % {TW}"))
    n_files = max(32, reps * 2)
    t0 = time.perf_counter()
    media_of(arr.repartition(n_files, "twin_key")).write.mode(
        "overwrite").parquet(src)
    arriving = spark.read.parquet(src)
    n_rows = arriving.count()
    n_twins = arriving.filter(f"doc_id >= {TW}").count()
    n_salted = n_rows - n_corpus - n_twins
    print(f"--- arriving x{reps}: {n_rows:,} images ({dir_mb(src):,.0f}"
          f" MB) built in {time.perf_counter() - t0:.1f}s; index "
          f"{n_corpus:,} hashes in {idx_build}s", flush=True)

    fpt = 16 if reps <= 128 else 64
    out, ck = str(d / "out_img"), str(d / "ck_img")
    stream = (spark.readStream.schema(arriving.schema)
              .option("maxFilesPerTrigger", fpt)
              .parquet(src).drop("twin_key"))
    before = stage_totals(spark)
    t0 = time.perf_counter()
    q = image_dedup_ingest_stream(stream, index, out, ck)
    run_to_completion(q, timeout_s=3000)
    wall = time.perf_counter() - t0
    prog, batch_walls, mb = stream_run_stats(spark, q, before)

    landed = spark.read.parquet(out)
    stats = landed.groupBy().agg(
        F.sum(F.expr(f"cast(doc_id < {TW} and doc_id % {reps} = 0 "
                     f"as long)")).alias("rep0"),
        F.sum(F.expr(f"cast(doc_id >= {TW} as long)")).alias("twin"),
        F.count("*").alias("kept")).first()
    salted_kept = int(stats.kept) - int(stats.rep0) - int(stats.twin)
    assert int(stats.rep0) == 0, \
        f"{int(stats.rep0)} exact corpus copies slipped the index probe"
    assert int(stats.twin) == 0, \
        f"{int(stats.twin)} co-located twin copies survived in-batch"
    # render_text_png pixels repeat the sha256 digest, so bits i and
    # i+32 coincide: the aHash is 32-bit effective and a random pair
    # collides at hamming<=3 with p = 33/2^32 — allow 0.5% slack and
    # report the measured loss
    assert salted_kept >= 0.995 * n_salted, \
        f"salted survivors {salted_kept} vs arrivals {n_salted}"

    def fp():
        row = spark.read.parquet(out).selectExpr(
            "count(*) as n",
            "sum(cast(xxhash64(doc_id, ahash) as decimal(38,0))) as h"
        ).first()
        return int(row.n), int(row.h)

    before_fp = fp()
    commits = sorted((Path(ck) / "commits").glob("[0-9]*"),
                     key=lambda p: int(p.name))
    commits[-1].unlink()
    crc = commits[-1].parent / f".{commits[-1].name}.crc"
    if crc.exists():
        crc.unlink()
    stream2 = (spark.readStream.schema(arriving.schema)
               .option("maxFilesPerTrigger", fpt)
               .parquet(src).drop("twin_key"))
    run_to_completion(image_dedup_ingest_stream(stream2, index, out, ck),
                      timeout_s=3000)
    assert fp() == before_fp, "replayed final batch changed the output"

    print(json.dumps({
        "pipeline": f"image_dedup_ingest_stream_x{reps}_fpt{fpt}",
        "arriving_rows": n_rows,
        "batches": len(prog),
        "files_per_trigger": fpt,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(n_rows / wall),
        "batch_wall_median_s": round(
            batch_walls[len(batch_walls) // 2], 2),
        "batch_wall_p95_s": round(
            batch_walls[int(len(batch_walls) * 0.95) - 1], 2),
        "batch_wall_max_s": round(batch_walls[-1], 2),
        "kept_rows": int(stats.kept),
        "planted": {"exact_copy_rejected": n_corpus,
                    "twin_copy_rejected": n_twins,
                    "salted_kept": salted_kept,
                    "salted_arrived": n_salted,
                    "random_ahash_losses": n_salted - salted_kept},
        "replay_idempotent": True,
        "state_mb": {"index": round(
            index.count() * 16 / 2**20, 2),
            "checkpoint": dir_mb(ck), "landed": dir_mb(out)},
        "metrics_mb": mb,
    }), flush=True)


def _timeordered_events_src(spark, d, reps: int, n_files: int):
    """Replicate sf0.1 events to reps× distinct key spaces and write
    them as ``n_files`` TIME-RANGE parquet files with ascending
    mtimes.  A real event stream arrives (roughly) in event-time
    order; a RANDOM file scatter would hand a stateful operator a
    key's events out of order across micro-batches, which no
    stateful stream can reorder — range-partitioning by ts and
    feeding files in mtime order makes cross-batch order BE event
    time (within a batch the operators sort).  ONE definition shared
    by the predicate-window and sessionize rehearsals so the
    parity-critical ordering trick can never drift between them.
    Returns (src_path, arriving_df, n_rows, n_keys)."""
    import os

    ev = load_table(spark, SF, "events").select("user_id", "ts", "value")
    r = spark.range(reps).withColumnRenamed("id", "rep")
    arr = ev.crossJoin(F.broadcast(r)).selectExpr(
        f"user_id * {reps} + rep as user_id", "ts", "value")
    src = str(d / "in")
    t0 = time.perf_counter()
    (arr.repartitionByRange(n_files, "ts").sortWithinPartitions("ts")
     .write.mode("overwrite").parquet(src))
    for i, f in enumerate(sorted(Path(src).glob("part-*.parquet"))):
        os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))
    arriving = spark.read.parquet(src)
    n_rows = arriving.count()
    n_keys = reps * ev.select("user_id").distinct().count()
    print(f"--- arriving x{reps}: {n_rows:,} events / {n_keys:,} keys "
          f"in {n_files} time-range files ({dir_mb(src):,.0f} MB), "
          f"built in {time.perf_counter() - t0:.1f}s", flush=True)
    return src, arriving, n_rows, n_keys


def _predicate_rehearsal(spark, d, reps: int) -> None:
    """REST-metric rehearsal row for stateful_predicate_windows (35b
    family): the reference's tumbling predicate window clause on
    unbounded input, at reps x the sf0.1 events table — every replica
    key carries the full per-user event sequence, so keys scale to
    ~768k at x512 while per-key state stays O(1) scalars.  The
    invariant is EXACT stream==batch parity: the batch dispatch (the
    oracled `stream_predicate` path) over the same replicated input
    must produce the identical window multiset — both paths walk each
    key's events in the same order, so even the float sums agree
    bit-for-bit (fingerprinted at round-6 for safety).

    ``sequence_gap_ms`` is set LONGER than the corpus time span: the
    gap timeout deliberately ENDS a key's logical sequence (dropping
    its open window and restarting its indices), and on a batched
    file source it fires for any key that skips a whole micro-batch —
    real divergence-by-design from the gap-less batch dispatch, not a
    bug (measured: ~10 of 1500 base users skip one of 13 batches at
    x101, each losing exactly the windows the gap semantics say they
    lose).  Parity isolates the distributed state machinery; the gap
    semantics have their own unit tests."""
    from scripts.scale_rehearsal import stage_totals

    from pythonql_spark.streaming import (run_to_completion,
                                          stateful_predicate_windows,
                                          with_watermark)

    start = lambda curr, at, prev, nxt: curr["value"] >= 150
    end = lambda curr, at, prev, nxt, s_curr, s_at: curr["value"] < 20

    n_files = max(32, reps * 2)
    src, arriving, n_rows, n_keys = _timeordered_events_src(
        spark, d, reps, n_files)

    def win_fingerprint(df):
        row = df.selectExpr(
            "count(*) as n",
            "sum(cast(xxhash64(user_id, s_at, e_at, n_events, "
            "round(sum_value, 6)) as decimal(38,0))) as h").first()
        return int(row.n), int(row.h) if row.h is not None else 0

    fpt = 16 if reps <= 128 else 64
    out, ck = str(d / "out_pw"), str(d / "ck_pw")
    stream = (spark.readStream.schema(arriving.schema)
              .option("maxFilesPerTrigger", fpt).parquet(src))
    before = stage_totals(spark)
    t0 = time.perf_counter()
    gap_ms = 45 * 86_400_000          # > the corpus' one-month span
    w = stateful_predicate_windows(
        with_watermark(stream, "ts", "10 seconds"),
        start_when=start, end_when=end, only_end=True,
        sequence_gap_ms=gap_ms)
    q = (w.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .outputMode("append").trigger(availableNow=True).start())
    run_to_completion(q, timeout_s=3000)
    wall = time.perf_counter() - t0
    prog, batch_walls, mb = stream_run_stats(spark, q, before)

    got = win_fingerprint(spark.read.parquet(out))
    batch = stateful_predicate_windows(
        arriving, start_when=start, end_when=end, only_end=True)
    want = win_fingerprint(batch)
    assert got == want and got[0] > 0, \
        f"stream {got} != batch {want} windows"
    # every replica of a user must emit the same window count as the
    # user's rep-0 sequence — key independence under state partitioning
    per_rep = (spark.read.parquet(out)
               .groupBy(F.expr(f"user_id div {reps}").alias("u"),
                        F.expr(f"user_id % {reps}").alias("rep"))
               .count().groupBy("u")
               .agg(F.countDistinct("count").alias("variants"),
                    F.count("*").alias("reps_seen")))
    bad = per_rep.filter(f"variants != 1 OR reps_seen != {reps}").count()
    assert bad == 0, f"{bad} users with replica-divergent windows"

    print(json.dumps({
        "pipeline": f"stateful_predicate_windows_x{reps}_fpt{fpt}",
        "arriving_rows": n_rows, "keys": n_keys,
        "batches": len(prog),
        "files_per_trigger": fpt,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(n_rows / wall),
        "batch_wall_median_s": round(
            batch_walls[len(batch_walls) // 2], 2),
        "batch_wall_p95_s": round(
            batch_walls[int(len(batch_walls) * 0.95) - 1], 2),
        "batch_wall_max_s": round(batch_walls[-1], 2),
        "windows_emitted": got[0],
        "stream_equals_batch": True,
        "replica_consistent": True,
        "state_mb": {"checkpoint": dir_mb(ck)},
        "metrics_mb": mb,
    }), flush=True)


def _session_rehearsal(spark, d, reps: int) -> None:
    """REST-metric rehearsal row for stateful_sessionize (35b family)
    at reps x the sf0.1 events table.  Invariant: EXACT stream==batch
    parity on the session multiset with ``emit_open_on_timeout=False``
    (both sides drop each key's trailing open session).

    Parity premise: the stream closes sessions IN DATA (next event
    >= gap after the last) only when no event-time TIMER fires
    mid-stream — a timer fires for any key absent from a batch once
    the watermark passes its last+gap, and under ``False`` it DROPS
    a session the gap-less batch plan would emit.  So the source is
    cut into a FEW large time-range files (every key has events in
    every multi-day range, so no key ever misses a batch) and the
    run asserts the premise: batches == the planned count and every
    key appears in every batch's range.  Cross-batch state handoff
    for reps*1500 keys is still fully exercised — that, plus the
    pure-JVM batch dispatch equivalence, is what this rehearses; the
    timer semantics have their own unit tests and the predicate
    rehearsal."""
    from scripts.scale_rehearsal import stage_totals

    from pythonql_spark.streaming import (run_to_completion,
                                          stateful_sessionize,
                                          with_watermark)

    gap_ms = 4 * 3600_000                 # 4 h sessions in month data
    n_files = 4                           # ~1-week ranges
    src, arriving, n_rows, n_keys = _timeordered_events_src(
        spark, d, reps, n_files)
    # premise check: every key in every file range
    per_file = (arriving.withColumn(
        "__f", F.expr("regexp_extract(input_file_name(), "
                      "'part-(\\\\d+)', 1)"))
        .groupBy("__f").agg(F.countDistinct("user_id").alias("k")))
    assert all(r.k == n_keys for r in per_file.collect()), \
        "a key misses a file range — the no-timer premise is broken"

    def fp(df):
        row = df.selectExpr(
            "count(*) as n",
            "sum(cast(xxhash64(user_id, cast(session_start as string), "
            "n_events, round(sum_value, 6)) as decimal(38,0))) as h"
        ).first()
        return int(row.n), int(row.h) if row.h is not None else 0

    out, ck = str(d / "out_ss"), str(d / "ck_ss")
    stream = (spark.readStream.schema(arriving.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    before = stage_totals(spark)
    t0 = time.perf_counter()
    s = stateful_sessionize(
        with_watermark(stream, "ts", "10 seconds"),
        gap_ms=gap_ms, emit_open_on_timeout=False)
    q = (s.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .outputMode("append").trigger(availableNow=True).start())
    run_to_completion(q, timeout_s=3000)
    wall = time.perf_counter() - t0
    prog, batch_walls, mb = stream_run_stats(spark, q, before)
    assert len(prog) == n_files, (len(prog), n_files)

    got = fp(spark.read.parquet(out))
    want = fp(stateful_sessionize(arriving, gap_ms=gap_ms,
                                  emit_open_on_timeout=False))
    assert got == want and got[0] > 0, \
        f"stream {got} != batch {want} sessions"

    print(json.dumps({
        "pipeline": f"stateful_sessionize_x{reps}_fpt1",
        "arriving_rows": n_rows, "keys": n_keys,
        "batches": len(prog),
        "files_per_trigger": 1,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(n_rows / wall),
        "batch_wall_median_s": round(
            batch_walls[len(batch_walls) // 2], 2),
        "batch_wall_p95_s": round(
            batch_walls[int(len(batch_walls) * 0.95) - 1], 2),
        "batch_wall_max_s": round(batch_walls[-1], 2),
        "sessions_emitted": got[0],
        "stream_equals_batch": True,
        "state_mb": {"checkpoint": dir_mb(ck)},
        "metrics_mb": mb,
    }), flush=True)


def main() -> None:
    from scripts.scale_rehearsal import build_corpus, stage_totals

    reps_list = [int(a) for a in sys.argv[1:]] or [101]
    spark = get_spark("stream-rehearsal", **{
        "spark.ui.enabled": "true",
        # keep every micro-batch's progress row for the per-batch stats
        "spark.sql.streaming.numRecentProgressUpdates": "512",
    })
    spark.sparkContext.setLogLevel("ERROR")

    import os
    mode_fns = {"url": _url_rehearsal, "image": _image_rehearsal,
                "predicate": _predicate_rehearsal,
                "session": _session_rehearsal}
    mode = os.environ.get("STREAM_RH_OPS", "")
    matched = [fn for tag, fn in mode_fns.items() if tag in mode]
    if matched:
        # STREAM_RH_OPS=url|image|predicate|session (comma-
        # combinable): each is a self-contained rehearsal (own
        # arriving corpus + invariants), no text/LSH machinery
        # needed — EVERY matching mode runs, in declaration order
        for fn in matched:
            for reps in reps_list:
                d = SCRATCH / f"x{reps}"
                shutil.rmtree(d, ignore_errors=True)
                fn(spark, d, reps)
                shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(SCRATCH, ignore_errors=True)
        return

    from pythonql_spark.operators.dedup import build_minhash_index
    from pythonql_spark.streaming import run_to_completion
    from pythonql_spark.streaming.ingest import dedup_ingest_stream

    corpus = (load_table(spark, SF, "documents")
              .select("doc_id", "text").cache())
    n_corpus = corpus.count()
    warehouse = spark.conf.get("spark.sql.warehouse.dir") \
        .removeprefix("file:")
    shutil.rmtree(f"{warehouse}/sr_idx", ignore_errors=True)
    spark.sql("DROP TABLE IF EXISTS sr_idx")
    t0 = time.perf_counter()
    build_minhash_index(corpus, "sr_idx")     # once, outside timing
    idx_build = round(time.perf_counter() - t0, 1)
    idx_mb = dir_mb(f"{warehouse}/sr_idx")
    print(f"--- standing corpus {n_corpus:,} docs; index {idx_mb} MB "
          f"built in {idx_build}s", flush=True)

    for reps in reps_list:
        d = SCRATCH / f"x{reps}"
        shutil.rmtree(d, ignore_errors=True)
        src = str(d / "in")
        t0 = time.perf_counter()
        build_corpus(spark, reps, src)
        arriving = spark.read.parquet(src)
        n_rows = arriving.count()
        print(f"--- arriving x{reps}: {n_rows:,} docs "
              f"({dir_mb(src):,.0f} MB) built in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)

        # two batch sizes at the smallest scale measure the per-batch
        # fixed cost for the sizing rule; larger scales run the rule's
        # recommended size only (override with STREAM_RH_FPT=a,b).
        # STREAM_RH_OPS=sketch swaps the run to the r9 sketch
        # maintainers (HLL registers + CMS counters) over the same
        # arriving corpus — their correctness check is EXACT (streamed
        # state == batch sketch over everything seen), so the planted
        # dedup invariants are replaced by algebra equality.
        import os
        if "sketch" in os.environ.get("STREAM_RH_OPS", ""):
            _sketch_rehearsal(spark, src, d, n_rows, reps)
            shutil.rmtree(d, ignore_errors=True)
            continue
        fpts = tuple(int(x) for x in os.environ.get(
            "STREAM_RH_FPT",
            "4,16" if reps == reps_list[0] else "16").split(","))
        for fpt in fpts:
            out = str(d / f"out_{fpt}")
            ck = str(d / f"ck_{fpt}")
            shutil.rmtree(out, ignore_errors=True)
            shutil.rmtree(ck, ignore_errors=True)
            stream = (spark.readStream.schema(arriving.schema)
                      .option("maxFilesPerTrigger", fpt).parquet(src))
            before = stage_totals(spark)
            t0 = time.perf_counter()
            q = dedup_ingest_stream(
                stream.select("doc_id", "text"), corpus, out, ck,
                jaccard_threshold=0.5, index_table="sr_idx")
            run_to_completion(q, timeout_s=1800)
            wall = time.perf_counter() - t0
            prog, batch_walls, mb = stream_run_stats(spark, q, before)

            # ---- planted-structure invariants -----------------------
            landed = spark.read.parquet(out)
            by_rep = (landed.withColumn("rep", F.expr(f"doc_id % {reps}"))
                      .groupBy().agg(
                F.sum(F.expr("cast(rep = 0 as long)")).alias("rep0"),
                F.sum(F.expr(
                    f"cast(rep != 0 and rep % {NEARDUP_MOD} = 1 "
                    f"as long)")).alias("neardup"),
                F.count("*").alias("kept")).first())
            n_nd = len([r for r in range(1, reps)
                        if r % NEARDUP_MOD == 1]) * n_corpus
            n_salted = n_rows - n_corpus - n_nd
            rep0_kept, nd_kept = int(by_rep.rep0), int(by_rep.neardup)
            salted_kept = int(by_rep.kept) - rep0_kept - nd_kept
            assert rep0_kept == 0, \
                f"{rep0_kept} exact corpus copies slipped through"
            # intrinsic base-corpus near-dup SIBLINGS share a salt
            # token per rep, so their salted replicas legitimately
            # collapse pairwise — allow that small fraction
            assert 0.97 * n_salted <= salted_kept <= n_salted, \
                f"salted survivors {salted_kept} vs arrivals {n_salted}"
            assert n_nd == 0 or nd_kept <= 0.05 * n_nd, \
                f"near-dup rejects below 95%: kept {nd_kept}/{n_nd}"

            # ---- replay idempotence at scale ------------------------
            n_before, h_before = out_fingerprint(spark, out)
            commits = sorted((Path(ck) / "commits").glob("[0-9]*"),
                             key=lambda p: int(p.name))
            last = commits[-1]
            last.unlink()              # forget the last batch's commit
            crc = last.parent / f".{last.name}.crc"
            if crc.exists():
                crc.unlink()           # and its Hadoop checksum shadow,
                # or the replay's commit rename fails as a phantom
                # "concurrent query"
            stream2 = (spark.readStream.schema(arriving.schema)
                       .option("maxFilesPerTrigger", fpt).parquet(src))
            run_to_completion(dedup_ingest_stream(
                stream2.select("doc_id", "text"), corpus, out, ck,
                jaccard_threshold=0.5, index_table="sr_idx"),
                timeout_s=1800)
            n_after, h_after = out_fingerprint(spark, out)
            assert (n_before, h_before) == (n_after, h_after), \
                "replayed final batch changed the output"

            row = {
                "pipeline": f"dedup_ingest_stream_x{reps}_fpt{fpt}",
                "arriving_rows": n_rows,
                "batches": len(prog),
                "files_per_trigger": fpt,
                "wall_sec": round(wall, 2),
                "rows_per_sec": round(n_rows / wall),
                "batch_wall_median_s": round(
                    batch_walls[len(batch_walls) // 2], 2),
                "batch_wall_p95_s": round(
                    batch_walls[int(len(batch_walls) * 0.95) - 1], 2),
                "batch_wall_max_s": round(batch_walls[-1], 2),
                "kept_rows": int(by_rep.kept),
                "planted": {"rep0_exact_rejected": n_corpus,
                            "neardup_rejected": n_nd - nd_kept,
                            "neardup_total": n_nd,
                            "salted_kept": salted_kept},
                "replay_idempotent": True,
                "state_mb": {"index": idx_mb,
                             "checkpoint": dir_mb(ck)},
                "metrics_mb": mb,
            }
            print(json.dumps(row), flush=True)
        shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
