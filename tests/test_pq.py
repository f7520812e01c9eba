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


# ------------------------------------------------------------- IVF-PQ

def test_ivfpq_full_probe_matches_residual_quality(spark, emb):
    """With n_probe == n_cells the IVF filter admits everything, so
    recall vs the exact path must be at least as good as raw PQ at
    the same code budget (residual coding is strictly finer)."""
    from pythonql_spark.operators.pq import ivfpq_topk
    qids = list(range(8))
    exact = {(r.q_id, r.n_id)
             for r in brute_topk(emb, qids, k=5).collect()}
    ivf = {(r.q_id, r.n_id)
           for r in ivfpq_topk(emb, qids, k=5, n_cells=16, n_probe=16,
                               m=8, nbits=8).collect()}
    raw = {(r.q_id, r.n_id)
           for r in pq_topk(emb, qids, k=5, m=8, nbits=8).collect()}
    assert len(ivf & exact) >= len(raw & exact)
    assert len(ivf & exact) / len(exact) >= 0.45


def test_ivfpq_reused_index_matches_fresh(spark, emb):
    from pythonql_spark.operators.pq import (ivfpq_encode, ivfpq_topk,
                                             train_ivfpq)
    cents, cb = train_ivfpq(emb, n_cells=16, m=8, nbits=4,
                            train_sample=256)
    enc = ivfpq_encode(emb, cents, cb).select(
        "vec_id", "ivf_cell", "pq_code").cache()
    reused = ivfpq_topk(emb, [1, 2, 3], k=5, centroids=cents,
                        codebook=cb, encoded=enc).collect()
    fresh = ivfpq_topk(emb, [1, 2, 3], k=5, n_cells=16, m=8, nbits=4,
                       train_sample=256).collect()
    assert sorted(map(tuple, reused)) == sorted(map(tuple, fresh))
    # determinism across partitionings (the rows-only contract)
    re8 = ivfpq_topk(emb.repartition(8), [1, 2, 3], k=5,
                     centroids=cents, codebook=cb,
                     encoded=enc.repartition(8)).collect()
    assert sorted(map(tuple, re8)) == sorted(map(tuple, reused))


def test_ivfpq_probe_prunes_cells(spark, emb):
    """The plan must filter the encoded index to the probed cells
    BEFORE the Python stage — the property that turns into
    partition/file pruning on a cell-partitioned index."""
    from pythonql_spark.operators.pq import ivfpq_topk
    df = ivfpq_topk(emb, [1], k=5, n_cells=16, n_probe=2, m=8, nbits=4)
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    # the probed-cell filter survives as a plan-side IN over the cell
    # column (n_probe=2 -> exactly two literals), evaluated before the
    # ADC Python stage
    import re as _re
    m_ = _re.search(r"\.cell IN \((\d+(?:,\d+)*)\)", plan)
    assert m_ and len(m_.group(1).split(",")) == 2, plan
    assert df.count() > 0


def test_ivfpq_planted_duplicates_rank_first(spark):
    rng = np.random.RandomState(11)
    base = rng.randn(60, 64).astype("f8")
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(60)]
    # plant near-duplicates of vectors 0 and 1
    rows += [(100, (base[0] + 0.01 * rng.randn(64)).tolist()),
             (101, (base[1] + 0.01 * rng.randn(64)).tolist())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from pythonql_spark.operators.pq import ivfpq_topk
    got = {r.q_id: r.n_id
           for r in ivfpq_topk(df, [0, 1], k=1, n_cells=8, n_probe=4,
                               m=8, nbits=4, train_sample=64).collect()}
    assert got == {0: 100, 1: 101}


def test_ivfpq_persisted_index_partition_pruning(spark, emb, tmp_path):
    """The documented deployment: the encoded index persisted
    partitioned by cell — a probe's cell filter must surface as
    parquet PartitionFilters (files of unprobed cells are never
    read), and search over the persisted index must equal search over
    the in-memory encode."""
    from pythonql_spark.operators.pq import (ivfpq_encode, ivfpq_topk,
                                             train_ivfpq)
    cents, cb = train_ivfpq(emb, n_cells=16, m=8, nbits=4,
                            train_sample=256)
    path = str(tmp_path / "ivfpq_index")
    (ivfpq_encode(emb, cents, cb)
     .select("vec_id", "ivf_cell", "pq_code")
     .write.partitionBy("ivf_cell").parquet(path))
    index = spark.read.parquet(path)
    df = ivfpq_topk(emb, [1, 2], k=5, n_probe=2, centroids=cents,
                    codebook=cb, encoded=index)
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    import re as _re
    m_ = _re.search(r"PartitionFilters: \[.*ivf_cell.*IN \(([^)]*)\)", plan)
    assert m_ and 1 <= len(m_.group(1).split(",")) <= 4, plan
    mem = ivfpq_topk(emb, [1, 2], k=5, n_probe=2, centroids=cents,
                     codebook=cb,
                     encoded=ivfpq_encode(emb, cents, cb))
    assert sorted(map(tuple, df.collect())) == \
        sorted(map(tuple, mem.collect()))


def test_ivfpq_md5_excludes_self_and_ranks(spark, tables):
    from pythonql_spark.operators.pq import ivfpq_topk_md5
    out = ivfpq_topk_md5(tables["embeddings"], query_ids=[0, 2, 4],
                         k=3).collect()
    by_q = {}
    for r in out:
        assert r.q_id != r.n_id
        by_q.setdefault(r.q_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        cosines = [r.adc_cos for r in rows]
        assert cosines == sorted(cosines, reverse=True)
