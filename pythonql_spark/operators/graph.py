"""Graph analytics over edge DataFrames — PageRank (Brin & Page
1998) with fixed iterations.

Link-graph signals are standard LLM-curation inputs (host-level
PageRank is a Common-Crawl quality feature), and fixed-iteration
power iteration is the shape that actually ships: deterministic cost,
deterministic output, resumable.

Scale shape: degrees are one partial-aggregated groupBy; each
iteration is one equi-join of the edge list with the |V|-row rank
frame plus one partial-aggregated groupBy on the destination — the
classic Pregel superstep as two shuffles, both keyed, no windows, no
driver-side state beyond the node count.  ``checkpoint_every`` cuts
lineage for long runs.

Engine portability: per-edge contributions round to 9 dp and sum as
decimal(38,9) (order-insensitive exact), every scalar step is the
same double expression in both dialects, and rank literals never
touch Python's banker-rounding ``round`` — so the unrolled-CTE
DuckDB oracle (:func:`pagerank_oracle_sql`) is bit-exact.

Note connected components live in operators/dedup.py (pointer
jumping); this module holds the rank-propagation side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirected(edges: DataFrame, src: str, dst: str) -> DataFrame:
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    return fwd.union(
        edges.select(F.col(dst).alias("src"),
                     F.col(src).alias("dst"))).distinct()


def pagerank(edges: DataFrame, *, src: str = "src", dst: str = "dst",
             iters: int = 3, damping: float = 0.85,
             undirected: bool = True,
             checkpoint_every: int = 8) -> DataFrame:
    """(node, rank) after ``iters`` power iterations.

    ``undirected=True`` (default) symmetrizes the edge list first —
    every node then has out-degree ≥ 1, so there is no dangling-mass
    term to redistribute (the variant curation pipelines typically
    use for host graphs; pass ``undirected=False`` for a directed
    graph you know has no sinks)."""
    e = (_undirected(edges, src, dst) if undirected
         else edges.select(F.col(src).alias("src"),
                           F.col(dst).alias("dst")).distinct())
    # materialize the (possibly expensive) edge derivation ONCE: each
    # iteration references e and deg several times, and without the
    # lineage cut Catalyst re-executes the upstream joins per
    # reference (measured: 20 scans of the source tables for 3
    # iterations on the orders⋈lineitem edge list)
    e = e.localCheckpoint(eager=False)
    deg = (e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
           .localCheckpoint(eager=False))
    n = deg.count()
    # attach the out-degree to the edge list ONCE, outside the loop:
    # every iteration previously joined deg again (guide §2.4 — two
    # operations keyed the same way share one exchange; here the
    # (edge ⋈ deg) result is iteration-invariant, so hoisting it
    # removes one join + its exchanges from EVERY superstep)
    ed = (e.join(deg, "src").select("src", "dst", "deg")
          .localCheckpoint(eager=False))
    base = (f"(cast(1.0 as double) - cast({damping!r} as double))"
            f" / {n}")
    r = deg.select(F.col("src").alias("node"),
                   F.expr(f"cast(round(cast(1.0 as double) / {n}, 9) as double)")
                   .alias("rank"))
    for it in range(iters):
        contrib = (ed.join(r, ed.src == r.node)
                   .select(F.col("dst").alias("node"),
                           F.expr("cast(round(rank / deg, 9) as "
                                  "decimal(38,9))").alias("c")))
        sums = (contrib.groupBy("node")
                .agg(F.expr("cast(sum(c) as double)").alias("s")))
        r = (deg.select(F.col("src").alias("node"))
             .join(sums, "node", "left")
             .select("node", F.expr(
                 f"cast(round({base} + cast({damping!r} as double) * "
                 f"coalesce(s, cast(0 as double)), 9) as double)")
                 .alias("rank")))
        if (it + 1) % checkpoint_every == 0:
            r = r.localCheckpoint(eager=False)
    return r


def pagerank_oracle_sql(edges_sql: str, *, iters: int = 3,
                        damping: float = 0.85,
                        undirected: bool = True) -> str:
    """DuckDB mirror of :func:`pagerank` — the power iteration
    unrolled to one CTE pair per step, identical 9-dp contribution
    rounding and decimal sums.  ``edges_sql`` must select columns
    ``src, dst``."""
    sym = (f"SELECT src, dst FROM e0 UNION "
           f"SELECT dst AS src, src AS dst FROM e0"
           if undirected else "SELECT DISTINCT src, dst FROM e0")
    d = f"cast({damping!r} as double)"
    parts = [f"WITH e0 AS ({edges_sql})",
             f"e AS ({sym})",
             "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src)",
             "n AS (SELECT count(*) AS c FROM deg)",
             "r0 AS (SELECT src AS node, cast(round(cast(1.0 as double) / "
             "(SELECT c FROM n), 9) as double) AS rank FROM deg)"]
    for t in range(iters):
        parts.append(
            f"c{t + 1} AS (SELECT e.dst AS node, cast(sum(cast(round("
            f"r.rank / deg.deg, 9) as decimal(38,9))) as double) AS s "
            f"FROM e JOIN r{t} r ON e.src = r.node "
            f"JOIN deg ON e.src = deg.src GROUP BY e.dst)")
        parts.append(
            f"r{t + 1} AS (SELECT deg.src AS node, cast(round("
            f"(cast(1.0 as double) - {d}) / (SELECT c FROM n) + "
            f"{d} * coalesce(c{t + 1}.s, cast(0 as double)), 9) "
            f"as double) AS rank "
            f"FROM deg LEFT JOIN c{t + 1} ON deg.src = c{t + 1}.node)")
    return (", ".join(parts)
            + f" SELECT node, rank FROM r{iters}")
