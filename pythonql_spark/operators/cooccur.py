"""Co-occurrence association mining: pointwise mutual information of
item pairs sharing a context (Church & Hanks 1990) — "which event
types / tokens / tools appear together far more than chance".  The
statistic behind phrase mining, item2vec-style negative sampling
tables and co-click analysis.

PMI(a,b) = ln( P(a,b) / (P(a)·P(b)) ) with probabilities over
contexts (users, sessions, documents):
``ln( (c_ab · N) / (c_a · c_b) )``.

Scale shape: one distinct (context, item) projection (partial-agg
dedup), pair generation as a per-context self-join — the shuffle is
keyed by context and each context contributes ≤ |items-in-context|²
pairs, the documented density contract (sessionize or cap first for
pathological contexts); marginals are one groupBy; the final PMI
join runs on |item-vocabulary|-sized frames.  The context count
rides a broadcast 1-row frame (bm25's 1-row-exchange trick) — no
driver-side state at all.

Engine portability: counts are exact; the single ``ln`` of a
double ratio evaluates the identical expression in both engines and
rounds to 9 dp — the eval_retrieval log-gain precedent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_pmi(df: DataFrame, context_col: str, item_col: str,
                     *, min_pairs: int = 1) -> DataFrame:
    """(item_a, item_b, n_ab, n_a, n_b, pmi) for item_a < item_b."""
    ci = (df.select(F.col(context_col).alias("ctx"),
                    F.col(item_col).alias("item"))
          .filter("ctx IS NOT NULL AND item IS NOT NULL")
          .distinct())
    n_ctx = (ci.select("ctx").distinct()
             .agg(F.count(F.lit(1)).alias("__nctx")))
    a = ci.select("ctx", F.col("item").alias("item_a"))
    b = ci.select("ctx", F.col("item").alias("item_b"))
    pairs = (a.join(b, "ctx")
             .filter(F.col("item_a") < F.col("item_b"))
             .groupBy("item_a", "item_b")
             .agg(F.count(F.lit(1)).alias("n_ab"))
             .filter(F.col("n_ab") >= min_pairs))
    marg = ci.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    return (pairs
            .join(marg.select(F.col("item").alias("item_a"),
                              F.col("n").alias("n_a")), "item_a")
            .join(marg.select(F.col("item").alias("item_b"),
                              F.col("n").alias("n_b")), "item_b")
            .crossJoin(F.broadcast(n_ctx))
            .select("item_a", "item_b", "n_ab", "n_a", "n_b",
                    F.expr("cast(round(ln(cast(n_ab as double) * "
                           "cast(__nctx as double) / "
                           "(cast(n_a as double) * cast(n_b as double))"
                           "), 9) as double)").alias("pmi")))


def cooccurrence_pmi_oracle_sql(context_col: str, item_col: str, *,
                                min_pairs: int = 1,
                                table: str = "events") -> str:
    """DuckDB mirror of :func:`cooccurrence_pmi` — identical counts
    and the identical ln-ratio expression."""
    return f"""
WITH ci AS (
  SELECT DISTINCT {context_col} AS ctx, {item_col} AS item
  FROM {table}
  WHERE {context_col} IS NOT NULL AND {item_col} IS NOT NULL),
n AS (SELECT count(DISTINCT ctx) AS nctx FROM ci),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_ab
  FROM ci a JOIN ci b ON a.ctx = b.ctx AND a.item < b.item
  GROUP BY a.item, b.item
  HAVING count(*) >= {min_pairs}),
marg AS (SELECT item, count(*) AS n FROM ci GROUP BY item)
SELECT p.item_a, p.item_b, p.n_ab, ma.n AS n_a, mb.n AS n_b,
       cast(round(ln(cast(p.n_ab as double) *
                     cast((SELECT nctx FROM n) as double) /
                     (cast(ma.n as double) * cast(mb.n as double))
                  ), 9) as double) AS pmi
FROM pairs p JOIN marg ma ON ma.item = p.item_a
             JOIN marg mb ON mb.item = p.item_b"""
