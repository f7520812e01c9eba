"""Training-data pipeline walkthrough: the operator set a 100 TB
corpus build needs, composed on the synthetic documents/embeddings
testdata.  Run:  python examples/training_data.py [SF_DIR]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pythonql_spark import get_spark
from pythonql_spark.operators.dedup import dedup_keep, minhash_lsh_pairs
from pythonql_spark.operators.decontam import decontaminate
from pythonql_spark.operators.packing import pack_sequences
from pythonql_spark.operators.sampling import shuffle_rows
from pythonql_spark.operators.similarity import knn_join
from pythonql_spark.sources import load_sf


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("examples-training")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_sf(spark, sf_dir)
    docs, emb = t["documents"], t["embeddings"]

    # near-dup dedup: LSH candidates -> jaccard verify -> connected
    # components -> keep one doc per cluster
    deduped = dedup_keep(docs, minhash_lsh_pairs(docs, jaccard_threshold=0.5))
    print(f"dedup: {docs.count()} -> {deduped.count()} docs")

    # benchmark decontamination (every 50th doc stands in for a bench)
    cont = decontaminate(deduped.filter("doc_id % 50 != 0"),
                         docs.filter("doc_id % 50 = 0"), ngram=5)
    clean = deduped.join(
        cont.filter("contamination < 0.2").select("doc_id"), "doc_id")
    print(f"decontaminate: -> {clean.count()} docs")

    # deterministic epoch shuffle, then pack into training sequences
    packed = pack_sequences(shuffle_rows(clean, seed=0),
                            max_tokens=512, shard_col="source")
    print("packed sequences per shard:")
    packed.groupBy("source").max("seq_id").show()

    # similarity search over the embedding table
    knn = knn_join(emb.filter("vec_id < 3"), emb.filter("vec_id >= 3"), k=3)
    print("3-NN for the first three vectors:")
    knn.show()

    # perplexity-proxy quality signal: mean unigram log-prob under the
    # corpus's own LM — low scores flag rare-token gibberish
    from pythonql_spark.operators.text import unigram_logprob
    lp = unigram_logprob(docs)
    print("lowest-logprob (most suspicious) documents:")
    lp.orderBy("mean_logprob").show(3)

    # multimodal: binary image columns decoded distributed — REAL PNG
    # decoding (stdlib codec), no image library needed
    from pythonql_spark.operators import multimodal as MM
    media = (docs.filter("doc_id < 8")
             .select("doc_id", MM.render_text_png("text").alias("img"))
             .select("doc_id", MM.make_media("img", "image", "png",
                                             8, 8).alias("media")))
    print("decoded image features:")
    MM.decode_image(media).select("doc_id", "mean_intensity").show(4)

    # duplicate-SPAN dedup: strip verbatim repeated 5-gram substrings,
    # keeping one canonical copy corpus-wide
    from pythonql_spark.operators.spans import strip_dup_spans
    stripped = strip_dup_spans(docs, k=5)
    print("tokens removed as duplicated spans:")
    stripped.selectExpr("sum(n_removed_tokens) as removed").show()

    # DSIR: reweight the crawl toward the English target distribution
    from pythonql_spark.operators.dsir import dsir_resample
    shaped = dsir_resample(docs, "lang = 'en'", rate=0.7)
    print("DSIR-resampled language mix:")
    shaped.groupBy("lang").count().orderBy("lang").show()

    # keyword retrieval over the curated corpus
    from pythonql_spark.operators.retrieval import bm25_search
    print("BM25 top-5 for [query, join, hash]:")
    bm25_search(docs, ["query", "join", "hash"], k=5).show()

    # language rebalancing: temperature sampling flattens the mix
    # toward n^0.5, then fractional epoch factors oversample the
    # languages the schedule wants more of
    from pythonql_spark.operators.sampling import (sample_temperature,
                                                   upsample_epochs)
    mix = sample_temperature(docs.select("doc_id", "lang"), "lang")
    epochs = upsample_epochs(mix, "lang", {"en": 1.5}, default_repeat=1.0)
    print("temperature-rebalanced + epoch-weighted mix:")
    epochs.groupBy("lang").count().orderBy("lang").show()

    # compressed-domain ANN: 16-byte PQ codes instead of full vectors
    from pythonql_spark.operators.pq import pq_topk
    print("PQ asymmetric-distance top-3:")
    pq_topk(emb, query_ids=[0, 1], k=3, m=16, nbits=8).show()

    # parallel-corpus mining between two sides of the embedding space
    from pythonql_spark.operators.bitext import mine_bitext
    print("margin-mined aligned pairs (mutual-best):")
    mine_bitext(emb.filter("label % 2 = 0"), emb.filter("label % 2 = 1"),
                k=4, threshold=1.0).show(5)

    # probe a mixed media column (container/frame-header truth only)
    from pythonql_spark.operators import multimodal as MM
    from pyspark.sql import functions as F
    media = docs.limit(6).select(
        "doc_id",
        MM.make_media(
            F.when(F.col("doc_id") % 2 == 0, MM.render_mp4("doc_id"))
             .otherwise(MM.render_mp3("doc_id")),
            "media", "mixed").alias("media"))
    print("ffprobe-style media probe:")
    MM.probe_media(media).drop("media").show()

    # training order: difficulty deciles (scale-safe NTILE), then a
    # round-robin interleave across sources so no source dominates a
    # stretch of the schedule; hard-negative triplets for the
    # retrieval head
    from pythonql_spark.operators.sampling import (interleave_order,
                                                   quantile_buckets)
    from pythonql_spark.operators.similarity import mine_triplets
    tiers = quantile_buckets(docs.select("doc_id", "source", "n_chars"),
                             ["n_chars", "doc_id"], 10)
    order = interleave_order(tiers, "source", ["bucket", "doc_id"])
    print("interleaved schedule head (one doc per source per round):")
    order.orderBy("train_key").limit(5).show()
    print("contrastive triplets (smallest margins are the hard cases):")
    mine_triplets(emb.filter("vec_id < 3"), emb, n_neg=2) \
        .orderBy("margin").show(3)

    # terminal sink: fixed-row shards + manifest for the loader
    import tempfile
    from pythonql_spark.operators.sampling import shuffle_key
    from pythonql_spark.sources.catalog import write_training_shards
    out = tempfile.mkdtemp() + "/shards"
    manifest = write_training_shards(
        docs.select("doc_id", "lang", "n_chars")
            .withColumn("sk", F.expr(shuffle_key("doc_id", seed=1))),
        out, rows_per_shard=200, order_col="sk", token_col="n_chars")
    print("training-shard manifest:")
    manifest.show()


if __name__ == "__main__":
    main()
