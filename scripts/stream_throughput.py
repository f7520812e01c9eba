"""Streaming-throughput octaves for the foreachBatch maintenance
streams (SURVEY §4): the standing corpus/reference stays FIXED at 1×
while the ARRIVING stream grows 1× → 4× → 16×, delivered in
constant-size micro-batches (maxFilesPerTrigger) — the production
shape where a continuous ingest keeps running as volume grows.

Reports wall seconds, sec/1x-unit and rows/s for:
* dedup_ingest_stream (indexed probe path — the persisted bucketed
  LSH index is built once, outside the timed window)
* drift_monitor_stream (reference binned once at stream start)

Run: python scripts/stream_throughput.py
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pythonql_spark import get_spark
from pythonql_spark.sources import load_table

SF = "/root/testdata/sf0.1"
SCRATCH = Path("/root/repo/.scratch/stream_tp")


def main() -> None:
    import os

    from scripts.scale_experiment import replicate_docs, replicate_embs

    octaves = tuple(int(x) for x in os.environ.get(
        "STREAM_TP_OCTAVES", "1,4,16").split(","))
    only = [s for s in os.environ.get("STREAM_TP_OPS", "").split(",") if s]

    spark = get_spark("stream-tp")
    spark.sparkContext.setLogLevel("ERROR")

    from pythonql_spark.operators.dedup import build_minhash_index
    from pythonql_spark.streaming import run_to_completion
    from pythonql_spark.streaming.ingest import (cms_maintain_stream,
                                                 dedup_ingest_stream,
                                                 drift_monitor_stream,
                                                 int8_index_ingest_stream,
                                                 quality_monitor_stream,
                                                 sample_maintain_stream,
                                                 sketch_maintain_stream)

    corpus = (load_table(spark, SF, "documents")
              .select("doc_id", "text").cache())
    corpus.count()
    reference = load_table(spark, SF, "documents").cache()
    reference.count()

    warehouse = spark.conf.get("spark.sql.warehouse.dir") \
        .removeprefix("file:")
    shutil.rmtree(f"{warehouse}/tp_idx", ignore_errors=True)
    spark.sql("DROP TABLE IF EXISTS tp_idx")
    build_minhash_index(corpus, "tp_idx")   # once, outside timing

    for n in octaves:
        d = SCRATCH / f"x{n}"
        shutil.rmtree(d, ignore_errors=True)
        raw = str(d / "raw")
        src = str(d / "in")
        replicate_docs(spark, n, raw)
        # constant micro-batch size: 4n files, 4 per trigger → n
        # triggers of ~1x-size batches
        spark.read.parquet(raw).repartition(4 * n).write.parquet(src)
        arriving = spark.read.parquet(src)
        n_rows = arriving.count()

        for name, launch in (
            ("dedup_ingest", lambda s: dedup_ingest_stream(
                s.select("doc_id", "text"), corpus,
                str(d / "out_dedup"), str(d / "ck_dedup"),
                jaccard_threshold=0.5, index_table="tp_idx")),
            ("drift_monitor", lambda s: drift_monitor_stream(
                s, reference, "n_chars", 0.0, 600.0, 20,
                str(d / "out_drift"), str(d / "ck_drift"),
                keys=["lang"])),
            ("quality_monitor", lambda s: quality_monitor_stream(
                s, {"null_rate": ("avg(cast(text IS NULL as double))",
                                  "value < 0.01"),
                    "min_chars": ("cast(min(n_chars) as double)",
                                  "value >= 0")},
                str(d / "out_qm"), str(d / "ck_qm"))),
            ("sample_maintain", lambda s: sample_maintain_stream(
                s.select("doc_id", "text"), 1000,
                str(d / "out_smp"), str(d / "ck_smp"))),
            # r9 sketch maintainers: per-batch work is one scan of the
            # batch with a bounded-output aggregate; both land their
            # per-batch delta (<= cols*256 register rows / <= depth*
            # width counter rows) in a batch-id partition — flat
            # per-batch cost as arrival volume grows
            ("hll_maintain", lambda s: sketch_maintain_stream(
                s.select("doc_id", "lang", "source"),
                ["doc_id", "lang", "source"],
                str(d / "out_hll"), str(d / "ck_hll"))),
            ("cms_maintain", lambda s: cms_maintain_stream(
                s.select("doc_id", "source"), "source",
                str(d / "out_cms"), str(d / "ck_cms"))),
        ):
            if only and name not in only:
                continue
            stream = (spark.readStream.schema(arriving.schema)
                      .option("maxFilesPerTrigger", 4).parquet(src))
            t0 = time.perf_counter()
            run_to_completion(launch(stream))
            dt = time.perf_counter() - t0
            print(f"{name:14s} x{n:<3d} rows={n_rows:>8,d}  "
                  f"{dt:7.2f}s  {dt / n:6.2f}s/unit  "
                  f"{n_rows / dt:>9,.0f} rows/s", flush=True)

        # int8 index maintenance streams EMBEDDINGS, not documents
        if only and "int8_index" not in only:
            continue
        eraw, esrc = str(d / "eraw"), str(d / "ein")
        replicate_embs(spark, n, eraw)
        spark.read.parquet(eraw).repartition(4 * n).write.parquet(esrc)
        earr = spark.read.parquet(esrc)
        e_rows = earr.count()
        estream = (spark.readStream.schema(earr.schema)
                   .option("maxFilesPerTrigger", 4).parquet(esrc))
        t0 = time.perf_counter()
        run_to_completion(int8_index_ingest_stream(
            estream, str(d / "out_i8"), str(d / "ck_i8"), dim=64))
        dt = time.perf_counter() - t0
        print(f"{'int8_index':14s} x{n:<3d} rows={e_rows:>8,d}  "
              f"{dt:7.2f}s  {dt / n:6.2f}s/unit  "
              f"{e_rows / dt:>9,.0f} rows/s", flush=True)
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
