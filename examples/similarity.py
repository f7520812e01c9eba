"""ANN index lifecycle walkthrough: the embedding-similarity paths a
100 TB corpus actually deploys, end-to-end on the synthetic embeddings
table.  Run:  python examples/similarity.py [SF_DIR]

The engine ships six search paths (operators/similarity.py, pq.py);
this example walks the deployment-shaped one — composed IVF-PQ with a
persisted, cell-partitioned index and streaming maintenance — and
cross-checks it against the exact path.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pythonql_spark import get_spark
from pythonql_spark.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("examples-similarity")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    print(f"corpus: {n} vectors")

    # 1. exact baseline (broadcast queries, streamed corpus)
    from pythonql_spark.operators.similarity import brute_topk
    qids = [1, 2, 3]
    exact = brute_topk(emb, qids, k=5)
    exact_set = {(r.q_id, r.n_id) for r in exact.collect()}
    print(f"exact top-5 for {len(qids)} queries: {len(exact_set)} pairs")

    # 2. train the IVF-PQ index ONCE on a bounded sample (coarse
    #    cells + residual codebook — a few hundred KB, broadcastable
    #    at any corpus size)
    from pythonql_spark.operators.pq import (ivfpq_encode, ivfpq_topk,
                                             train_ivfpq)
    cents, cb = train_ivfpq(emb, n_cells=16, m=8, nbits=8,
                            train_sample=2048)
    print(f"index params: {len(cents)} cells, "
          f"codebook {cb.shape} ({cb.nbytes // 1024} KB)")

    with tempfile.TemporaryDirectory() as tmp:
        # 3. encode the corpus once and persist PARTITIONED BY CELL:
        #    each probe's cell filter then prunes index FILES, so a
        #    search reads ~n_probe/n_cells of the m-byte codes and
        #    none of the raw vectors
        path = f"{tmp}/ivfpq_index"
        (ivfpq_encode(emb, cents, cb)
         .select("vec_id", "ivf_cell", "pq_code")
         .write.partitionBy("ivf_cell").parquet(path))
        index = spark.read.parquet(path)
        got = ivfpq_topk(emb, qids, k=5, n_probe=4, centroids=cents,
                         codebook=cb, encoded=index)
        got_set = {(r.q_id, r.n_id) for r in got.collect()}
        print(f"IVF-PQ (n_probe=4/16) recall vs exact: "
              f"{len(got_set & exact_set)}/{len(exact_set)}")

        # 4. vectors keep arriving: maintain the index incrementally
        #    (streaming encode with the FIXED codebook; replayed
        #    batches overwrite their own partition)
        from pythonql_spark.streaming import (pq_index_ingest_stream,
                                              run_to_completion)
        arriving = emb.selectExpr(f"vec_id + {n} as vec_id",
                                  "embedding", "label")
        src, inc, ck = f"{tmp}/in", f"{tmp}/inc", f"{tmp}/ck"
        arriving.write.parquet(src)
        stream = spark.readStream.schema(arriving.schema).parquet(src)
        run_to_completion(pq_index_ingest_stream(
            stream, cb, inc, ck, centroids=cents))
        merged = index.unionByName(
            spark.read.parquet(inc).select("vec_id", "ivf_cell",
                                           "pq_code"))
        print(f"incrementally-maintained index: {merged.count()} codes "
              f"({index.count()} base + streamed)")

    # 5. turn the labeled corpus into contrastive training triplets:
    #    nearest same-label positive + hardest different-label
    #    negatives per anchor (label mask inside the partial top-k)
    from pythonql_spark.operators.similarity import mine_triplets
    trips = mine_triplets(emb.filter("vec_id < 5"), emb, n_neg=3)
    hard = trips.filter("margin < 0.05")
    print(f"training triplets: {trips.count()} "
          f"({hard.count()} hard, margin < 0.05)")


if __name__ == "__main__":
    main()
