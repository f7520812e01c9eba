"""BM25 search + TF-IDF keywords: behavior and physical-plan shape."""

import pytest
from pyspark.sql import Row

from pythonql_spark.operators.retrieval import bm25_search, tfidf_keywords


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([
        Row(doc_id=1, text="spark spark spark joins data"),
        Row(doc_id=2, text="spark appears once here today"),
        Row(doc_id=3, text="nothing relevant in this document"),
        Row(doc_id=4, text="spark spark and more spark spark spark"),
        Row(doc_id=5, text="a very long document about other things "
                           "entirely with many many words but no hits"),
    ])


def test_bm25_ranks_term_frequency(corpus):
    rows = bm25_search(corpus, ["spark"], k=10).collect()
    ids = [r.doc_id for r in rows]
    # non-matching docs excluded; heavier tf ranks higher
    assert set(ids) == {1, 2, 4}
    assert ids[0] == 4 and ids[-1] == 2
    assert all(rows[i].score >= rows[i + 1].score
               for i in range(len(rows) - 1))


def test_bm25_multi_term_and_k(corpus):
    rows = bm25_search(corpus, ["spark", "joins"], k=2).collect()
    assert len(rows) == 2
    # doc 1 matches both terms; 'joins' is rarer so its idf dominates
    assert rows[0].doc_id == 1


def test_bm25_plan_is_topk_no_shuffle_join(corpus):
    explained = bm25_search(corpus, ["spark", "joins"], k=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in explained
    # scoring side must not shuffle: the only shuffle exchange is the
    # 1-row corpus-stats aggregate (SinglePartition); stats come back
    # via broadcast
    import re
    shuffles = re.findall(r"(?<![A-Za-z])Exchange (\w+)", explained)
    assert all(e == "SinglePartition" for e in shuffles), explained


def test_tfidf_keywords_basic(corpus):
    out = tfidf_keywords(corpus, top_n=2, min_token_len=4)
    rows = {(r.doc_id, r.rank): r.token for r in out.collect()}
    # doc 4's dominant distinctive term is 'spark'
    assert rows[(4, 1)] == "spark"
    # every doc has rank 1; ranks are 1..n with no gaps
    by_doc = {}
    for (d, r) in rows:
        by_doc.setdefault(d, []).append(r)
    for d, ranks in by_doc.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_tfidf_plan_window_group_limit(corpus):
    explained = tfidf_keywords(corpus, top_n=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in explained


def test_bm25_empty_terms_raise(corpus):
    with pytest.raises(ValueError):
        bm25_search(corpus, ["  "], k=3)


# ------------------------------------------------- embedding clustering

def _planted(spark, per=30, dim=8):
    """Three well-separated planted clusters on coordinate axes."""
    import numpy as np
    from pyspark.sql import Row
    rs = np.random.RandomState(3)
    rows = []
    for c in range(3):
        base = np.zeros(dim)
        base[c] = 10.0
        for i in range(per):
            v = base + rs.normal(0, 0.05, dim)
            rows.append(Row(vec_id=c * per + i,
                            embedding=[float(x) for x in v],
                            label=c))
    return spark.createDataFrame(rows)


def test_cluster_embeddings_recovers_planted(spark):
    from pythonql_spark.operators.similarity import cluster_embeddings
    df = _planted(spark)
    out = cluster_embeddings(df, n_clusters=3, train_sample=90)
    rows = out.collect()
    assert len(rows) == 90
    # every planted group lands in exactly one cell, cells are distinct
    by_group = {}
    for r in rows:
        by_group.setdefault(r.vec_id // 30, set()).add(r.cluster)
    assert all(len(s) == 1 for s in by_group.values())
    assert len(set().union(*by_group.values())) == 3
    # tight clusters: cosine to own centroid is ~1
    assert min(r.centroid_cos for r in rows) > 0.99


def test_cluster_profile_dominant_label(spark):
    from pythonql_spark.operators.similarity import cluster_profile
    df = _planted(spark)
    prof = cluster_profile(df, n_clusters=3, label_col="label",
                           train_sample=90).collect()
    assert len(prof) == 3
    assert sorted(p.top_label for p in prof) == [0, 1, 2]
    assert all(p.top_label_share == 1.0 for p in prof)
    assert all(p.n_members == 30 for p in prof)
    assert all(p.mean_cos > 0.99 for p in prof)


def test_cluster_assignment_no_shuffle(spark):
    from pythonql_spark.operators.similarity import cluster_embeddings
    df = _planted(spark)
    explained = cluster_embeddings(df, n_clusters=3, train_sample=90) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in explained, explained


def test_retrieval_metrics(spark):
    import math

    import pytest as _pytest
    from pythonql_spark.operators.retrieval import retrieval_metrics
    # q1: relevant {11, 12}; top-3 has 11 at rank 2 (12 at rank 4 is
    # cut by k).  q2: relevant {13}, retriever misses.  q3: in qrels
    # but entirely absent from the run -> all zeros.
    run = spark.createDataFrame(
        [(1, 99, 1), (1, 11, 2), (1, 98, 3), (1, 12, 4),
         (2, 97, 1), (2, 96, 2)],
        "q_id long, n_id long, rank int")
    qrels = spark.createDataFrame(
        [(1, 11), (1, 12), (2, 13), (3, 14)], "q_id long, n_id long")
    row = retrieval_metrics(run, qrels, 3).collect()[0]
    g = lambda r: round(1.0 / math.log2(r + 1), 9)
    ndcg1 = g(2) / (g(1) + g(2))                 # dcg@{rank2} / idcg(R=2)
    assert row.n_queries == 3
    assert row.mrr == round((0.5 + 0 + 0) / 3, 6)
    assert row.recall_at_k == round((0.5 + 0 + 0) / 3, 6)
    assert row.ndcg_at_k == round(round(ndcg1, 9) / 3, 6)
    with _pytest.raises(ValueError):
        retrieval_metrics(run, qrels, 0)


def test_docsim_cosine_planted_similarity(spark):
    from pythonql_spark.operators.retrieval import docsim_cosine
    rows = [
        (0, "quantum entanglement experiments measure photon spin"),
        (1, "quantum entanglement experiments measure electron spin"),
        (2, "medieval castle architecture features defensive towers"),
        (3, "medieval castle architecture features defensive moats"),
        (4, "recipe lemon butter garlic shrimp pasta dinner"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.id_a, r.id_b): r.cosine
           for r in docsim_cosine(df, threshold=0.3).collect()}
    assert (0, 1) in out and (2, 3) in out
    assert all(p in {(0, 1), (2, 3)} for p in out)
    assert all(0 < v <= 1.000001 for v in out.values())


def test_docsim_cosine_max_df_drops_ubiquitous(spark):
    from pythonql_spark.operators.retrieval import docsim_cosine
    # "common" appears in every doc; with max_df=2 it can't pair docs
    rows = [(i, f"common unique{i} word{i}") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert docsim_cosine(df, threshold=0.01, max_df=2).count() == 0
