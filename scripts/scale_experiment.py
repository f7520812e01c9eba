"""Scaling experiment: replicate the sf0.1 corpus Nx (unique ids, a
per-replica suffix token so near-dup structure stays realistic) and
measure the dedup / decontamination / ANN operators at 1x, 4x, 16x.

What this demonstrates (SURVEY §4): the candidate-generation operators
are bucket joins, so runtime should grow ~linearly with corpus size as
long as buckets stay bounded — the property that matters at 100 TB.

Run: python scripts/scale_experiment.py
Prints one line per (operator, scale): rows, wall seconds, sec/1x-unit.
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pythonql_spark import get_spark
from pythonql_spark.sources import load_table

SF = "/root/testdata/sf0.1"
SCRATCH = Path("/root/repo/.scratch/scale")


def replicate_docs(spark, n: int, path: str) -> None:
    docs = load_table(spark, SF, "documents")
    reps = spark.range(n).withColumnRenamed("id", "rep")
    (docs.crossJoin(F.broadcast(reps))
     .select((F.col("doc_id") * n + F.col("rep")).alias("doc_id"),
             F.concat("text", F.lit(" rtok"), F.col("rep").cast("string"))
              .alias("text"),
             "lang", "source", "n_chars")
     .write.mode("overwrite").parquet(path))


def replicate_embs(spark, n: int, path: str) -> None:
    emb = load_table(spark, SF, "embeddings")
    reps = spark.range(n).withColumnRenamed("id", "rep")
    # tiny deterministic per-replica rotation so vectors are distinct
    (emb.crossJoin(F.broadcast(reps))
     .select((F.col("vec_id") * n + F.col("rep")).alias("vec_id"),
             F.expr("transform(embedding, (x, i) -> x + 0.001 * rep * "
                    "(1 + i % 3))").alias("embedding"),
             "label")
     .write.mode("overwrite").parquet(path))


def main() -> None:
    spark = get_spark("scale-exp")
    spark.sparkContext.setLogLevel("ERROR")
    from pythonql_spark.operators.dedup import (dedup_keep,
                                                minhash_lsh_pairs,
                                                simhash_pairs)
    from pythonql_spark.operators.decontam import decontaminate
    from pythonql_spark.operators.similarity import brute_topk, lsh_topk

    results = []
    for n in (1, 4, 16):
        d = SCRATCH / f"x{n}"
        replicate_docs(spark, n, str(d / "documents.parquet"))
        replicate_embs(spark, n, str(d / "embeddings.parquet"))
        docs = spark.read.parquet(str(d / "documents.parquet"))
        embs = spark.read.parquet(str(d / "embeddings.parquet"))
        n_docs, n_vecs = docs.count(), embs.count()

        ops = {
            "minhash": lambda: minhash_lsh_pairs(docs).count(),
            "simhash": lambda: simhash_pairs(docs).count(),
            "decontam": lambda: decontaminate(
                docs.filter("doc_id % 50 != 0"),
                docs.filter("doc_id % 50 = 0"), ngram=5).count(),
            # full pipeline incl. connected components + anti-join:
            # rounds grow with log(cluster diameter), not corpus size
            "dedup_e2e": lambda: dedup_keep(
                docs, minhash_lsh_pairs(docs, jaccard_threshold=0.5)).count(),
            "ann_brute": lambda: brute_topk(
                embs, query_ids=list(range(10)), k=5,
                id_col="vec_id", vec_col="embedding").count(),
            "ann_lsh": lambda: lsh_topk(
                embs, query_ids=list(range(10)), k=5,
                id_col="vec_id", vec_col="embedding").count(),
        }
        for name, fn in ops.items():
            t0 = time.perf_counter()
            rows = fn()
            dt = time.perf_counter() - t0
            results.append((name, n, n_docs if "ann" not in name else n_vecs,
                            rows, dt))
            print(f"{name:10s} x{n:<3d} input={results[-1][2]:>9,d} "
                  f"rows={rows:>8,d}  {dt:7.2f}s  {dt / n:6.2f}s/unit",
                  flush=True)
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
