"""Mergeable cardinality sketches for incremental corpus profiling.

`profile.table_profile(approx=True)` answers "how many distinct X"
with one scan — but at 100 TB the corpus is append-only and rescanning
history for every report is the real cost.  HyperLogLog sketches fix
that: build a per-column sketch for each new partition/day (one scan
of the DELTA only), persist the few-KB binary, and merge sketches at
query time for any window's distinct count.  Spark ships the Apache
DataSketches HLL implementation as SQL aggregates
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``),
so everything here is JVM-side expressions — no UDFs.

Flow:
    day1 = distinct_sketch(batch1_df, ["user_id", "doc_id"])
    day2 = distinct_sketch(batch2_df, ["user_id", "doc_id"])
    both = merge_sketches(day1, day2)     # sketch algebra, no rescan
    sketch_estimates(both)                # column, n_distinct
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# log2 of HLL register count: 12 → ~1.6% relative standard error, 4KB
DEFAULT_LG_K = 12


def distinct_sketch(df: DataFrame, cols: list[str] | None = None,
                    lg_k: int = DEFAULT_LG_K) -> DataFrame:
    """One row per column: (column string, sketch binary).

    ONE scan builds every column's sketch (the aggregates share the
    pass); each sketch is a few KB regardless of input size, so the
    result is a driver-safe profiling artifact that can be persisted
    next to the data it summarizes."""
    cols = cols or df.columns
    row = df.agg(*[
        F.hll_sketch_agg(F.col(c).cast("string"), F.lit(lg_k)).alias(c)
        for c in cols])
    # long → tall: (column, sketch) so merges join by column name
    return row.select(F.explode(F.create_map(
        *[x for c in cols for x in (F.lit(c), F.col(c))]
    )).alias("column", "sketch"))


def merge_sketches(*sketches: DataFrame) -> DataFrame:
    """Union sketch tables by column name — pure sketch algebra
    (hll_union_agg), never touching the original data."""
    if not sketches:
        raise ValueError("need at least one sketch table")
    allof = sketches[0]
    for s in sketches[1:]:
        allof = allof.unionByName(s)
    return (allof.groupBy("column")
            .agg(F.hll_union_agg("sketch").alias("sketch")))


def sketch_estimates(sketch_df: DataFrame) -> DataFrame:
    """(column, n_distinct) from a sketch table."""
    return sketch_df.select(
        "column",
        F.hll_sketch_estimate("sketch").alias("n_distinct"))


# ------------------------------------------------- KLL quantile sketches

def quantile_sketch(df: DataFrame, cols: list[str],
                    keys: list[str] | None = None,
                    k: int = 200) -> DataFrame:
    """Mergeable KLL quantile sketches — the percentile counterpart of
    :func:`distinct_sketch`.  One scan builds a per-(key-group, column)
    DataSketches KLL sketch (``kll_sketch_agg_double``, JVM-side, a few
    KB each at k=200 with ~1.3% rank error); persist the binaries per
    ingest batch and answer "p95 over any window" by sketch algebra
    instead of rescanning history — the hypertable-rollup story
    (timeseries.incremental_rollup) extended to quantiles.

    Returns (``*keys``, column string, sketch binary)."""
    keys = keys or []
    row = (df.groupBy(*keys) if keys else df.groupBy()).agg(*[
        F.kll_sketch_agg_double(F.col(c).cast("double"), F.lit(k)).alias(c)
        for c in cols])
    return row.select(*keys, F.explode(F.create_map(
        *[x for c in cols for x in (F.lit(c), F.col(c))]
    )).alias("column", "sketch"))


def merge_quantile_sketches(*sketches: DataFrame,
                            keys: list[str] | None = None) -> DataFrame:
    """Union quantile-sketch tables by (keys, column) — pure sketch
    algebra (``kll_merge_agg_double``), never touching original data."""
    if not sketches:
        raise ValueError("need at least one sketch table")
    keys = keys or []
    allof = sketches[0]
    for s in sketches[1:]:
        allof = allof.unionByName(s)
    return (allof.groupBy(*keys, "column")
            .agg(F.kll_merge_agg_double("sketch").alias("sketch")))


def sketch_quantiles(sketch_df: DataFrame,
                     quantiles: list[float] = (0.5, 0.9, 0.99),
                     keys: list[str] | None = None) -> DataFrame:
    """(keys, column, n, q_50, q_90, ...) from a quantile-sketch
    table.  Column names use the percent (q_50 for 0.5) when that is
    unambiguous; quantiles that would collide at percent precision
    (0.999 → q_999 via digit concatenation, never q_100) fall back to
    the full digit string, and an outright duplicate raises."""
    keys = keys or []

    def qname(q: float) -> str:
        pct = f"q_{int(round(q * 100))}"
        digits = "q_" + f"{q:g}".replace("0.", "").replace(".", "_")
        return pct if abs(q * 100 - round(q * 100)) < 1e-9 else digits

    names = [qname(q) for q in quantiles]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate quantile column names: {names}")
    return sketch_df.select(
        *keys, "column",
        F.kll_sketch_get_n_double("sketch").alias("n"),
        *[F.kll_sketch_get_quantile_double("sketch", F.lit(q))
          .alias(n_) for q, n_ in zip(quantiles, names)])


# ------------------------------------------------- Theta set sketches

def set_sketch(df: DataFrame, col: str, lg_k: int = 12) -> DataFrame:
    """One-row (sketch binary) Theta sketch of a column's distinct
    set.  Unlike HLL, Theta sketches support INTERSECTION and
    DIFFERENCE by sketch algebra — the corpus-versioning questions
    ("how many docs do crawl A and crawl B share", "how much of this
    delta is genuinely new") answered from few-KB artifacts instead of
    a distinct-join over 100 TB."""
    return df.agg(F.expr(
        f"theta_sketch_agg(cast({col} as string), {lg_k})").alias("sketch"))


def merge_set_sketches(*sketches: DataFrame) -> DataFrame:
    """Union one-row Theta sketch tables — pure sketch algebra."""
    if not sketches:
        raise ValueError("need at least one sketch table")
    allof = sketches[0]
    for s in sketches[1:]:
        allof = allof.unionByName(s)
    return allof.agg(F.expr("theta_union_agg(sketch)").alias("sketch"))


def sketch_overlap(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set-relationship estimates between two one-row Theta sketches
    (from :func:`set_sketch` / :func:`merge_set_sketches`):
    (n_a, n_b, n_union, n_intersection, n_only_a, jaccard).

    All algebra happens on the few-KB sketch binaries in ONE cross
    join of two 1-row frames — the original tables are never touched.
    """
    return (a.select(F.col("sketch").alias("sa"))
            .crossJoin(b.select(F.col("sketch").alias("sb")))
            .select(
                F.expr("cast(round(theta_sketch_estimate(sa)) as bigint)")
                .alias("n_a"),
                F.expr("cast(round(theta_sketch_estimate(sb)) as bigint)")
                .alias("n_b"),
                F.expr("cast(round(theta_sketch_estimate("
                       "theta_union(sa, sb))) as bigint)").alias("n_union"),
                F.expr("cast(round(theta_sketch_estimate("
                       "theta_intersection(sa, sb))) as bigint)")
                .alias("n_intersection"),
                F.expr("cast(round(theta_sketch_estimate("
                       "theta_difference(sa, sb))) as bigint)")
                .alias("n_only_a"))
            .withColumn("jaccard", F.expr(
                "cast(round(n_intersection / cast(greatest(n_union, 1) "
                "as double), 6) as double)")))
