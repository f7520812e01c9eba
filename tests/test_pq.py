"""Product-quantization ANN (operators/pq.py): codebook determinism,
encode correctness vs a numpy reference, ADC exactness on codeword
vectors, planted-duplicate recovery, recall vs the exact path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pythonql_spark.operators.pq import pq_encode, pq_topk, train_pq
from pythonql_spark.operators.similarity import brute_topk
from pythonql_spark.sources import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


def test_codebook_shape_and_determinism(spark, emb):
    c1 = train_pq(emb, m=8, nbits=4, train_sample=256)
    c2 = train_pq(emb, m=8, nbits=4, train_sample=256)
    assert c1.shape == (8, 16, 8)              # dim 64 / m 8
    assert np.array_equal(c1, c2)
    with pytest.raises(ValueError):
        train_pq(emb, m=7)                     # 64 % 7 != 0


def test_encode_matches_numpy_argmin(spark, emb):
    cb = train_pq(emb, m=8, nbits=4, train_sample=256)
    rows = (pq_encode(emb, cb).select("vec_id", "embedding", "pq_code")
            .orderBy("vec_id").limit(50).collect())
    m, K, sub = cb.shape
    for r in rows:
        x = np.array(r.embedding, dtype=np.float64)
        x /= max(np.linalg.norm(x), 1e-12)
        code = np.frombuffer(bytes(r.pq_code), dtype=np.uint8)
        assert len(code) == m
        for s in range(m):
            d = ((cb[s] - x[s * sub:(s + 1) * sub]) ** 2).sum(axis=1)
            assert code[s] == d.argmin()


def test_adc_exact_on_codeword_vectors(spark):
    """A corpus vector assembled from codewords has zero quantization
    error: ADC must equal the true cosine exactly (6 dp)."""
    rng = np.random.RandomState(3)
    base = rng.randn(40, 64).astype("f4")
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(len(base))],
        "vec_id long, embedding array<float>")
    cb = train_pq(df, m=8, nbits=4, train_sample=40)
    # Rebuild vector 7 from its own codewords → zero residual.
    enc = {r.vec_id: np.frombuffer(bytes(r.pq_code), np.uint8)
           for r in pq_encode(df, cb).collect()}
    recon = np.concatenate([cb[s][enc[7][s]] for s in range(8)])
    rows = df.union(spark.createDataFrame(
        [(100, [float(x) for x in recon])],
        "vec_id long, embedding array<float>"))
    out = {r.n_id: r.adc_cos
           for r in pq_topk(rows, [100], k=40, m=8, nbits=4,
                            train_sample=40).collect()}
    # vector 7 quantizes to the same codes as the reconstruction ⇒
    # its ADC cosine is the query's cosine to that exact code point.
    x7 = np.array(base[7], np.float64); x7 /= np.linalg.norm(x7)
    q = recon / np.linalg.norm(recon)
    assert out[7] == pytest.approx(round(float(1 - ((q - np.concatenate(
        [cb[s][enc[7][s]] for s in range(8)])) ** 2).sum() / 2), 6), abs=1e-6)


def test_planted_duplicates_rank_first(spark, emb):
    """Exact duplicate vectors share a PQ code: ADC must rank the twin
    top-1 (zero asymmetric distance beyond the query's own residual)."""
    twins = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label")
    corpus = emb.union(twins)
    out = pq_topk(corpus, [10000 + i for i in range(5)], k=1,
                  m=16, nbits=8)
    got = {r.q_id: r.n_id for r in out.collect()}
    assert got == {10000 + i: i for i in range(5)}


def test_recall_vs_exact(spark, emb):
    qids = list(range(10))
    exact = {(r.q_id, r.n_id) for r in brute_topk(emb, qids, k=5).collect()}
    approx = {(r.q_id, r.n_id)
              for r in pq_topk(emb, qids, k=5, m=16, nbits=8).collect()}
    recall = len(exact & approx) / len(exact)
    # random gaussian testdata is the adversarial case (cf. ivf_topk
    # docstring); deterministic training makes this a fixed number
    assert recall >= 0.55, recall


def test_reused_index_matches_fresh_search(spark, emb):
    """The 100 TB deployment shape: train once, encode once, search
    many — must equal the one-shot path exactly."""
    cb = train_pq(emb, m=16, nbits=8)
    encoded = pq_encode(emb, cb)
    a = sorted(map(tuple, pq_topk(emb, [1, 2], k=5, codebook=cb,
                                  encoded=encoded).collect()))
    b = sorted(map(tuple, pq_topk(emb, [1, 2], k=5, m=16,
                                  nbits=8).collect()))
    assert a == b
