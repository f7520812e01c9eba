"""Keyword retrieval over a document corpus: BM25 top-k search and
TF-IDF keyword extraction.

Reference parity: pythonql has no retrieval operators — these belong to
the LLM-training-data extension set (corpus curation needs "find docs
about X" and "what is this doc about" at 100 TB).

Scale shapes
------------
* ``bm25_search`` — the query term set is tiny and FIXED, so per-doc
  term frequencies are computed as narrow array expressions over one
  scan (no explode, no per-term shuffle).  The only wide operations are
  a single keyless aggregate (corpus size, avg doc length, per-term doc
  frequencies — ONE row, broadcast back) and the final top-k, which
  Spark executes as TakeOrderedAndProject (per-task partial top-k,
  never a global sort).  Cost at 100 TB: one scan + one 1-row exchange.
* ``tfidf_keywords`` — needs the real vocabulary-wide document
  frequency table, i.e. the inverted-index build: ONE explode feeding a
  by-token aggregate (map-side combined; the shuffle carries 64-bit
  token rows, not documents), a token-keyed join back, and a per-doc
  WindowGroupLimit top-n (each map task ships at most n rows per doc).

Determinism: per-term scores are rounded to decimal(20,10) before the
(fixed-order) sum and the final score to 6 dp, so Spark and DuckDB
rank and hash identically despite libm ``ln`` ulp differences — same
contract as text.unigram_logprob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pythonql_spark.operators.text import _ws, sql_str as _sql_str, words


def _norm_terms(query_terms) -> list[str]:
    terms = sorted({t.strip().lower() for t in query_terms if t.strip()})
    if not terms:
        raise ValueError("query_terms must contain at least one term")
    return terms


def _doc_stats_expr(terms: list[str], text_col: str, dialect: str) -> list[str]:
    """Per-document [dl, tf_0, tf_1, ...] as ONE array expression —
    the word array binds once as a lambda variable (Spark) / a
    subquery column (DuckDB), so the text splits exactly once."""
    if dialect == "spark":
        tfs = ", ".join(
            f"size(filter(w, t -> t = {_sql_str(t)}))" for t in terms)
        return (f"transform(array({words(f'lower({text_col})', 'spark')}), "
                f"w -> array(size(w), {tfs}))[0]")
    tfs = ", ".join(
        f"len(list_filter(w, t -> t = {_sql_str(t)}))" for t in terms)
    return f"[len(w), {tfs}]"


def bm25_search(df: DataFrame, query_terms, k: int = 10, *,
                k1: float = 1.2, b: float = 0.75,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25
    (Robertson/Sparck-Jones idf: ln(1 + (N - df + .5)/(df + .5))).

    Returns (id_col, score) ordered by score desc, id asc; documents
    matching no query term are excluded.
    """
    terms = _norm_terms(query_terms)
    stats = df.select(
        F.col(id_col),
        F.expr(_doc_stats_expr(terms, text_col, "spark")).alias("s"))
    proj = [F.expr("s[0]").cast("bigint").alias("dl")] + [
        F.expr(f"s[{i + 1}]").cast("bigint").alias(f"tf{i}")
        for i in range(len(terms))]
    stats = stats.select(F.col(id_col), *proj)
    # one keyless aggregate -> one broadcast row: N, avgdl, df_t
    aggs = [F.count(F.lit(1)).alias("n_docs"),
            F.expr("cast(sum(dl) as double) / count(1)").alias("avgdl")] + [
        F.expr(f"sum(cast(tf{i} > 0 as bigint))").alias(f"df{i}")
        for i in range(len(terms))]
    corpus = stats.agg(*aggs)
    per_term = " + ".join(
        f"cast(round(ln(1.0 + (n_docs - df{i} + 0.5) / (df{i} + 0.5)) * "
        f"(tf{i} * ({k1} + 1.0)) / "
        f"(tf{i} + {k1} * (1.0 - {b} + {b} * dl / avgdl)), 10) "
        f"as decimal(20,10))" for i in range(len(terms)))
    return (stats.crossJoin(F.broadcast(corpus))
            .withColumn("score",
                        F.expr(f"cast(round({per_term}, 6) as double)"))
            .filter(F.col("score") > 0)
            .orderBy(F.desc("score"), F.col(id_col))
            .limit(k)
            .select(id_col, "score"))


def bm25_oracle_sql(query_terms, k: int = 10, *, k1: float = 1.2,
                    b: float = 0.75, id_col: str = "doc_id",
                    text_col: str = "text",
                    table: str = "documents") -> str:
    """DuckDB mirror of :func:`bm25_search` (same rounding)."""
    terms = _norm_terms(query_terms)
    arr = _doc_stats_expr(terms, text_col, "duck")
    proj = ["cast(s[1] as bigint) AS dl"] + [
        f"cast(s[{i + 2}] as bigint) AS tf{i}" for i in range(len(terms))]
    dfs = ", ".join(
        f"sum(cast(tf{i} > 0 as bigint)) AS df{i}"
        for i in range(len(terms)))
    per_term = " + ".join(
        f"cast(round(ln(1.0 + (n_docs - df{i} + 0.5) / (df{i} + 0.5)) * "
        f"(tf{i} * ({k1} + 1.0)) / "
        f"(tf{i} + {k1} * (1.0 - {b} + {b} * dl / avgdl)), 10) "
        f"as decimal(20,10))" for i in range(len(terms)))
    return f"""
WITH split AS (
  SELECT {id_col},
         {words(f'lower({text_col})', 'duck')} AS w
  FROM {table}),
stats0 AS (SELECT {id_col}, {arr} AS s FROM split),
stats AS (SELECT {id_col}, {', '.join(proj)} FROM stats0),
corpus AS (
  SELECT count(*) AS n_docs,
         cast(sum(dl) as double) / count(*) AS avgdl, {dfs}
  FROM stats)
SELECT {id_col}, cast(round({per_term}, 6) as double) AS score
FROM stats CROSS JOIN corpus
WHERE {' + '.join(f'tf{i}' for i in range(len(terms)))} > 0
ORDER BY score DESC, {id_col} LIMIT {k}"""


def tfidf_keywords(df: DataFrame, top_n: int = 3, *,
                   id_col: str = "doc_id",
                   text_col: str = "text",
                   min_token_len: int = 3) -> DataFrame:
    """Top-``top_n`` keywords per document by TF-IDF.

    tfidf = (tf / dl) * ln(N / df); tokens shorter than
    ``min_token_len`` are dropped (articles/punctuation noise).
    Returns (id_col, rank, token, tfidf); ties break on token text so
    the output is deterministic.
    """
    toks = (df.select(F.col(id_col), F.explode(
        F.expr(words(f"lower({text_col})"))).alias("tok"))
        .filter(F.length("tok") >= min_token_len))
    # tf is the single consumer of the exploded token stream, and both
    # dl and dft fold out of tf itself (doc length = Σ counts), so the
    # corpus-token-sized frame is traversed ONCE and the reused
    # intermediate is the much smaller distinct-(doc, token) table
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("cnt"))
    tf = tf.localCheckpoint(eager=False)      # reused by dl + dft + join
    dl = tf.groupBy(id_col).agg(F.sum("cnt").alias("dl"))
    dft = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("dft"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (tf.join(dl, id_col).join(dft, "tok")
              .crossJoin(F.broadcast(n_docs))
              .select(F.col(id_col), F.col("tok"), F.expr(
                  "cast(round((cnt / cast(dl as double)) * "
                  "ln(cast(n_docs as double) / dft), 10) "
                  "as decimal(20,10))").alias("w")))
    ranked = scored.withColumn("rank", F.expr(
        f"row_number() OVER (PARTITION BY {id_col} "
        f"ORDER BY w DESC, tok)"))
    return (ranked.filter(F.col("rank") <= top_n)
            .select(F.col(id_col), F.col("rank").cast("int").alias("rank"),
                    F.col("tok").alias("token"),
                    F.expr("cast(w as double)").alias("tfidf")))


def tfidf_keywords_oracle_sql(top_n: int = 3, *, id_col: str = "doc_id",
                              text_col: str = "text",
                              min_token_len: int = 3,
                              table: str = "documents") -> str:
    """DuckDB mirror of :func:`tfidf_keywords`."""
    w = words(f"lower({text_col})", "duck")
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest({w}) AS tok FROM {table}),
t2 AS (SELECT * FROM toks WHERE length(tok) >= {min_token_len}),
tf AS (SELECT {id_col}, tok, count(*) AS cnt FROM t2 GROUP BY 1, 2),
dl AS (SELECT {id_col}, count(*) AS dl FROM t2 GROUP BY 1),
dft AS (SELECT tok, count(*) AS dft FROM tf GROUP BY 1),
nd AS (SELECT count(*) AS n_docs FROM {table}),
scored AS (
  SELECT {id_col}, tok,
         cast(round((cnt / cast(dl as double)) *
              ln(cast(n_docs as double) / dft), 10)
              as decimal(20,10)) AS w
  FROM tf JOIN dl USING ({id_col}) JOIN dft USING (tok) CROSS JOIN nd),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY {id_col}
                               ORDER BY w DESC, tok) AS rank
  FROM scored)
SELECT {id_col}, cast(rank as int) AS rank, tok AS token,
       cast(w as double) AS tfidf
FROM ranked WHERE rank <= {top_n}"""


def hybrid_search(docs: DataFrame, emb: DataFrame, query_terms,
                  query_vec_id: int, k: int = 10, *, k_each: int = 20,
                  rrf_k: int = 60, id_col: str = "doc_id",
                  text_col: str = "text", vec_id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Hybrid lexical + dense retrieval via reciprocal-rank fusion
    (Cormack et al. 2009): the RAG-stack fusion step — BM25 top-k_each
    over the text corpus, exact-cosine top-k_each around a query
    vector, fused by ``Σ 1/(rrf_k + rank)`` over a full-outer join of
    the two candidate lists.

    Scale shape: each leg keeps its own scale story (bm25_search: one
    scan + a 1-row exchange + TakeOrderedAndProject; brute_topk:
    broadcast query, streamed corpus — swap in lsh/ivf/pq_topk for
    larger k_each); the fusion itself touches only 2·k_each candidate
    rows.  Returns (id_col, lex_rank, dense_rank, rrf_score) ordered
    by score desc, id asc.  Ranks are deterministic (score ties break
    on id in both legs), so the whole operator is value-oracled
    (`hybrid_oracle_sql`)."""
    from pythonql_spark.operators.similarity import brute_topk

    lex = (bm25_search(docs, query_terms, k=k_each, id_col=id_col,
                       text_col=text_col)
           .withColumn("lex_rank", F.expr(
               f"cast(row_number() OVER (ORDER BY score DESC, {id_col}) "
               "as int)"))
           .select(F.col(id_col).alias("__id"), "lex_rank"))
    dense = (brute_topk(emb, [query_vec_id], k=k_each,
                        id_col=vec_id_col, vec_col=vec_col)
             .select(F.col("n_id").alias("__id"),
                     F.col("rank").alias("dense_rank")))
    rrf = (f"cast(round(coalesce(1.0 / ({rrf_k} + lex_rank), 0.0) + "
           f"coalesce(1.0 / ({rrf_k} + dense_rank), 0.0), 6) as double)")
    return (lex.join(dense, "__id", "full_outer")
            .withColumn("rrf_score", F.expr(rrf))
            .orderBy(F.desc("rrf_score"), F.col("__id"))
            .limit(k)
            .select(F.col("__id").alias(id_col), "lex_rank",
                    "dense_rank", "rrf_score"))


def hybrid_oracle_sql(query_terms, query_vec_id: int, k: int = 10, *,
                      k_each: int = 20, rrf_k: int = 60, dim: int = 64,
                      id_col: str = "doc_id", text_col: str = "text",
                      vec_id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      doc_table: str = "documents",
                      emb_table: str = "embeddings") -> str:
    """DuckDB mirror of :func:`hybrid_search`."""
    from pythonql_spark.operators.similarity import cosine_expr
    bm25 = bm25_oracle_sql(query_terms, k=k_each, id_col=id_col,
                           text_col=text_col, table=doc_table)
    cos = cosine_expr("q.q_vec", "c.c_vec", dim, base=1)
    return f"""
WITH lex0 AS ({bm25}),
lex AS (
  SELECT {id_col} AS id,
         cast(row_number() OVER (ORDER BY score DESC, {id_col}) as int)
           AS lex_rank
  FROM lex0),
q AS (SELECT {vec_col} AS q_vec FROM {emb_table}
      WHERE {vec_id_col} = {query_vec_id}),
c AS (SELECT {vec_id_col} AS id, {vec_col} AS c_vec FROM {emb_table}
      WHERE {vec_id_col} <> {query_vec_id}),
dense0 AS (
  SELECT c.id, {cos} AS cosine FROM c CROSS JOIN q),
dense AS (
  SELECT id, cast(rank as int) AS dense_rank FROM (
    SELECT id, row_number() OVER (ORDER BY cosine DESC, id) AS rank
    FROM dense0) WHERE rank <= {k_each})
SELECT coalesce(lex.id, dense.id) AS {id_col}, lex_rank, dense_rank,
       cast(round(coalesce(1.0 / ({rrf_k} + lex_rank), 0.0) +
                  coalesce(1.0 / ({rrf_k} + dense_rank), 0.0), 6)
            as double) AS rrf_score
FROM lex FULL OUTER JOIN dense ON lex.id = dense.id
ORDER BY rrf_score DESC, {id_col} LIMIT {k}"""


def retrieval_metrics(run: DataFrame, qrels: DataFrame, k: int, *,
                      q_col: str = "q_id", d_col: str = "n_id",
                      rank_col: str = "rank") -> DataFrame:
    """IR evaluation of a retrieval run — the gate before a mined /
    indexed corpus feeds retrieval training: MRR, recall@k and
    (binary) nDCG@k of ``run`` (q, doc, 1-based rank) against
    ``qrels`` (q, doc) relevant pairs.  Queries present in ``qrels``
    but absent from ``run`` score 0 (a retriever must be penalized
    for returning nothing).

    Output: one row (n_queries, mrr, recall_at_k, ndcg_at_k), each
    metric the mean over qrels-queries, rounded to 6 dp.

    Engine-portability: every per-query metric is either an exact
    rational (1/min_rank, hit-count ratios) or a sum of per-rank
    ``1/log2(rank+1)`` gains each rounded to 9 dp and accumulated as
    exact decimal (order-independent), so a DuckDB oracle reproduces
    the values bit-for-bit.

    Scale shape: run and qrels join on (q, doc) — one hash-key
    shuffle of rank/flag rows (never text or vectors); everything
    after the per-query groupBy is |queries| rows.  The ideal-DCG
    table is k rows broadcast."""
    if k <= 0:
        raise ValueError("need k >= 1")
    spark = run.sparkSession
    gain = "cast(round(1.0 / log2(%s + 1), 9) as decimal(38,9))"
    topk = (run.filter(F.col(rank_col) <= k)
            .select(F.col(q_col).alias("__q"),
                    F.col(d_col).alias("__d"),
                    F.col(rank_col).alias("__r")))
    rel = (qrels.select(F.col(q_col).alias("__q"),
                        F.col(d_col).alias("__d"))
           .distinct())
    hits = (topk.join(rel, ["__q", "__d"])
            .groupBy("__q")
            .agg(F.min("__r").alias("__minr"),
                 F.count(F.lit(1)).alias("__nhit"),
                 F.sum(F.expr(gain % "__r")).alias("__dcg")))
    totals = rel.groupBy("__q").agg(F.count(F.lit(1)).alias("__nrel"))
    # ideal DCG for R relevant docs = prefix sum of gains at ranks
    # 1..min(R, k): a k-row broadcast lookup
    from pyspark.sql.window import Window as W
    ideal = spark.range(1, k + 1).select(
        F.col("id").alias("__n"),
        F.sum(F.expr(gain % "id")).over(
            W.orderBy("id").rowsBetween(W.unboundedPreceding, 0))
        .alias("__idcg"))
    per_q = (totals.join(hits, "__q", "left")
             .withColumn("__n", F.least(F.col("__nrel"), F.lit(k)))
             .join(F.broadcast(ideal), "__n")
             .select(
                 F.coalesce(1.0 / F.col("__minr"), F.lit(0.0))
                 .alias("rr"),
                 (F.coalesce(F.col("__nhit"), F.lit(0)).cast("double")
                  / F.col("__nrel")).alias("recall"),
                 (F.coalesce(F.col("__dcg").cast("double"), F.lit(0.0))
                  / F.col("__idcg").cast("double")).alias("ndcg")))
    dec = "cast(round(%s, 9) as decimal(38,9))"
    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.sum(F.expr(dec % "rr")).cast("double")
                / F.count(F.lit(1)), 6).alias("mrr"),
        F.round(F.sum(F.expr(dec % "recall")).cast("double")
                / F.count(F.lit(1)), 6).alias("recall_at_k"),
        F.round(F.sum(F.expr(dec % "ndcg")).cast("double")
                / F.count(F.lit(1)), 6).alias("ndcg_at_k"))


def retrieval_metrics_oracle_sql(run_sql: str, qrels_sql: str,
                                 k: int, *, q_col: str = "q_id",
                                 d_col: str = "n_id",
                                 rank_col: str = "rank") -> str:
    """DuckDB mirror of :func:`retrieval_metrics` — identical 9-dp
    gain rounding, decimal accumulation and ideal-DCG prefix table."""
    gain = "cast(round(1.0 / log2(%s + 1), 9) as decimal(38,9))"
    dec = "cast(round(%s, 9) as decimal(38,9))"
    return f"""
WITH topk AS (
  SELECT {q_col} AS q, {d_col} AS d, {rank_col} AS r
  FROM ({run_sql}) WHERE {rank_col} <= {k}),
rel AS (SELECT DISTINCT {q_col} AS q, {d_col} AS d FROM ({qrels_sql})),
hits AS (
  SELECT t.q, min(t.r) AS minr, count(*) AS nhit,
         sum({gain % 't.r'}) AS dcg
  FROM topk t JOIN rel ON t.q = rel.q AND t.d = rel.d GROUP BY t.q),
totals AS (SELECT q, count(*) AS nrel FROM rel GROUP BY q),
ideal AS (
  SELECT n, sum({gain % 'n'}) OVER (ORDER BY n
            ROWS UNBOUNDED PRECEDING) AS idcg
  FROM (SELECT unnest(generate_series(1, {k})) AS n)),
per_q AS (
  SELECT coalesce(1.0 / hits.minr, 0.0) AS rr,
         cast(coalesce(hits.nhit, 0) as double) / totals.nrel AS recall,
         cast(coalesce(hits.dcg, 0) as double)
           / cast(ideal.idcg as double) AS ndcg
  FROM totals LEFT JOIN hits ON totals.q = hits.q
  JOIN ideal ON ideal.n = least(totals.nrel, {k}))
SELECT cast(count(*) as bigint) AS n_queries,
       round(cast(sum({dec % 'rr'}) as double) / count(*), 6) AS mrr,
       round(cast(sum({dec % 'recall'}) as double) / count(*), 6)
         AS recall_at_k,
       round(cast(sum({dec % 'ndcg'}) as double) / count(*), 6)
         AS ndcg_at_k
FROM per_q
"""


def docsim_cosine(df: DataFrame, threshold: float = 0.2, *,
                  id_col: str = "doc_id", text_col: str = "text",
                  min_token_len: int = 3,
                  max_df: int = 64) -> DataFrame:
    """All-pairs sparse TF-IDF cosine similarity ≥ ``threshold`` —
    the lexical document-similarity join (the Bayardo 2007 / APSS
    problem shape): each document becomes a unit-normalized tf·idf
    vector over its tokens and pairs score by the postings-list
    self-join, never a cross join.

    ``max_df`` drops tokens appearing in more documents (the
    inverted-index stop cut): ubiquitous tokens contribute the least
    idf weight but the most pairs — at 100 TB they ARE the quadratic
    term, so the cut is the documented semantic parameter of the
    operator (similarity over the discriminative vocabulary), not a
    silent approximation.

    Scale shape: one explode + (id, token) groupBy builds the tf
    postings (shuffle carries tokens, never text); norms are one
    per-doc partial agg; the pair join keys on tokens with ≤ max_df
    postings each (≤ max_df²/2 pairs per token); per-pair products
    round to 9 dp and sum as decimal(38,9) — the engine-portable
    cosine the DuckDB oracle replays exactly."""
    toks = (df.select(F.col(id_col).alias("__id"), F.explode(
        F.expr(words(f"lower({text_col})"))).alias("tok"))
        .filter(F.length("tok") >= min_token_len))
    toks = toks.localCheckpoint(eager=False)
    tf = toks.groupBy("__id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    tf = tf.localCheckpoint(eager=False)      # reused by dft + postings
    dft = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("dft"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    w = (tf.join(dft.filter(F.col("dft") <= max_df), "tok")
         .crossJoin(F.broadcast(n_docs))
         .select("__id", "tok", F.expr(
             "cast(cnt as double) * ln(cast(n_docs as double) / dft)")
             .alias("w")))
    norm = (w.groupBy("__id")
            .agg(F.expr("sqrt(cast(sum(cast(round(w * w, 9) as "
                        "decimal(38,9))) as double))").alias("nrm")))
    post = (w.join(norm, "__id")
            .select("__id", "tok", F.expr("w / nrm").alias("wn")))
    a = post.select(F.col("__id").alias("id_a"),
                    F.col("wn").alias("w_a"), "tok")
    b = post.select(F.col("__id").alias("id_b"),
                    F.col("wn").alias("w_b"), "tok")
    return (a.join(b, "tok")
            .filter("id_a < id_b")
            .groupBy("id_a", "id_b")
            .agg(F.expr("cast(sum(cast(round(w_a * w_b, 9) as "
                        "decimal(38,9))) as double)").alias("__s"))
            .filter(F.col("__s") >= threshold)
            .select("id_a", "id_b",
                    F.expr("cast(round(__s, 6) as double)")
                    .alias("cosine")))


def docsim_cosine_oracle_sql(threshold: float = 0.2, *,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             min_token_len: int = 3, max_df: int = 64,
                             table: str = "documents") -> str:
    """DuckDB mirror of :func:`docsim_cosine` — identical weights,
    9-dp product rounding and decimal sums."""
    wexpr = words(f"lower({text_col})", "duck")
    return f"""
WITH toks AS (
  SELECT {id_col} AS id, unnest({wexpr}) AS tok FROM {table}),
t2 AS (SELECT * FROM toks WHERE length(tok) >= {min_token_len}),
tf AS (SELECT id, tok, count(*) AS cnt FROM t2 GROUP BY 1, 2),
dft AS (SELECT tok, count(*) AS dft FROM tf GROUP BY 1
        HAVING count(*) <= {max_df}),
n AS (SELECT count(*) AS n_docs FROM {table}),
w AS (
  SELECT id, tf.tok,
         cast(cnt as double) *
         ln(cast((SELECT n_docs FROM n) as double) / dft) AS w
  FROM tf JOIN dft ON tf.tok = dft.tok),
nrm AS (
  SELECT id, sqrt(cast(sum(cast(round(w * w, 9) as decimal(38,9)))
                  as double)) AS nrm
  FROM w GROUP BY id),
post AS (
  SELECT w.id, w.tok, w.w / nrm.nrm AS wn
  FROM w JOIN nrm ON w.id = nrm.id)
SELECT id_a, id_b, cast(round(s, 6) as double) AS cosine FROM (
  SELECT a.id AS id_a, b.id AS id_b,
         cast(sum(cast(round(a.wn * b.wn, 9) as decimal(38,9)))
              as double) AS s
  FROM post a JOIN post b ON a.tok = b.tok AND a.id < b.id
  GROUP BY a.id, b.id)
WHERE s >= {threshold}"""
