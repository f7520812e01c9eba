"""Corpus/table profiling: one-pass per-column statistics.

`table_profile` computes count / nulls / exact distinct / min / max
for every requested column in a SINGLE aggregation pass (one job, one
final-agg row), then unpivots to one row per column.  The per-column
distinct counts plan as Spark's expand + two-round aggregate, so the
shuffle carries (column, value) partials — at 100 TB that is the same
cost envelope as one wide groupBy, not one scan per column the way a
naive describe() loop would behave.

For quick looks at huge tables swap `approx_count_distinct` in via
``approx=True`` (HLL sketch, bounded memory, not oracle-comparable).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def table_profile(df: DataFrame, cols: list[str] | None = None, *,
                  approx: bool = False) -> DataFrame:
    """(column, n, n_null, n_distinct, min_value, max_value) — one row
    per column; min/max rendered as strings so the schema is uniform
    across column types."""
    cols = cols or df.columns
    nd = (F.approx_count_distinct if approx else F.count_distinct)
    aggs = []
    for c in cols:
        aggs.append(F.struct(
            F.lit(c).alias("column"),
            F.count(F.col(c)).alias("n"),
            F.sum(F.col(c).isNull().cast("long")).alias("n_null"),
            nd(F.col(c)).alias("n_distinct"),
            F.min(F.col(c)).cast("string").alias("min_value"),
            F.max(F.col(c)).cast("string").alias("max_value"),
        ).alias(f"__p_{c}"))
    one = df.agg(*aggs)
    return (one.select(F.explode(F.array(*[F.col(f"__p_{c}") for c in cols]))
                       .alias("p"))
            .select("p.*"))


def histogram(df: DataFrame, col: str, lo: float, hi: float,
              nbins: int) -> DataFrame:
    """Fixed-range equi-width histogram in ONE aggregation pass:
    (bin, bin_lo, bin_hi, n) for values in [lo, hi] (x == hi lands in
    the last bin; values outside the range are dropped).  Fixed edges
    — not data-driven min/max — keep it a single scan; get the range
    from `table_profile` first if unknown.  The bin id is an integer
    groupBy key, so the shuffle carries nbins partial rows per map
    task regardless of data size."""
    if nbins <= 0 or hi <= lo:
        raise ValueError("need nbins >= 1 and hi > lo")
    w = (hi - lo) / nbins
    bin_ = F.least(F.floor((F.col(col) - F.lit(lo)) / F.lit(w)),
                   F.lit(nbins - 1)).cast("bigint")
    return (df.filter((F.col(col) >= lo) & (F.col(col) <= hi))
            .groupBy(bin_.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("bin_lo", F.lit(lo) + F.col("bin") * F.lit(w))
            .withColumn("bin_hi", F.lit(lo) + (F.col("bin") + 1) * F.lit(w))
            .select("bin", "bin_lo", "bin_hi", "n"))


def histogram_oracle_sql(col: str, lo: float, hi: float, nbins: int,
                         table: str) -> str:
    """DuckDB mirror of `histogram` — identical floor/least formula so
    bin boundaries match bit-for-bit."""
    w = (hi - lo) / nbins
    b = f"cast(least(floor(({col} - {lo}) / {w}), {nbins - 1}) as bigint)"
    return (f"SELECT {b} AS bin, {lo} + {b} * {w} AS bin_lo, "
            f"{lo} + ({b} + 1) * {w} AS bin_hi, count(*) AS n "
            f"FROM {table} WHERE {col} >= {lo} AND {col} <= {hi} "
            f"GROUP BY 1, 2, 3")


def profile_oracle_sql(cols: list[str], table: str = "documents") -> str:
    """DuckDB mirror: one SELECT per column, UNION ALL."""
    parts = []
    for c in cols:
        parts.append(
            f"SELECT '{c}' AS column, count({c}) AS n, "
            f"cast(sum(cast({c} IS NULL as bigint)) as bigint) AS n_null, "
            f"cast(count(DISTINCT {c}) as bigint) AS n_distinct, "
            f"cast(min({c}) as varchar) AS min_value, "
            f"cast(max({c}) as varchar) AS max_value FROM {table}")
    return "\nUNION ALL\n".join(parts)


def percentile_normalize(df, score_cols: list[str],
                         keys: list[str] | None = None, *,
                         id_col: str = "doc_id",
                         suffix: str = "_pct"):
    """Rank-normalize score columns to [0,1] percentiles, optionally
    within strata — the calibration step before combining
    heterogeneous curation signals (a Gopher verdict, a DSIR weight
    and a perplexity score live on incomparable scales; their
    percentiles don't).

    percent_rank ties broken by ``id_col`` so the output is
    deterministic and engine-portable.

    Scale shape: the per-stratum mode (``keys=``) is one window
    shuffle per key spec — strata parallelize across tasks.  The
    GLOBAL mode must NOT be ``percent_rank() OVER (ORDER BY ...)``:
    an empty partition spec funnels the whole corpus through ONE task.
    And it must not range-shuffle the corpus once PER SCORE COLUMN
    (the ≥2-signal calibration use case would multiply full corpus
    exchanges): instead ALL columns explode to narrow
    (id, col_idx, score) rows and ride ONE range exchange — the
    :func:`..sampling.global_index` composition (range-partition on
    (col_idx, score, id), number locally, broadcast the tiny offset
    table) numbers every column's sort order in a single pass, each
    column's rows forming a contiguous (col_idx) run whose 0-base is
    ``col_idx * n``.  Percentiles pivot back over id (narrow rows)
    and join to the untouched original frame — the only full-width
    exchange is that one join, regardless of how many score columns
    are normalized.  Because (score, id) is a total order,
    rank == row_number == pos + 1, so the result is bit-identical to
    the window form (the DuckDB oracle keeps using percent_rank()).
    Score columns are compared AS DOUBLE with ``id_col`` tie-break
    (exact for |ints| < 2^53) and assumed non-null; ``id_col`` must
    be unique (it already must be for deterministic tie-breaks).
    """
    from pyspark.sql import functions as F
    if not score_cols:
        return df                  # no signals: the identity (the old
    out = df                       # per-column loop's behaviour)
    if keys:
        part = f"PARTITION BY {', '.join(keys)} "
        for c in score_cols:
            out = out.withColumn(c + suffix, F.expr(
                f"cast(round(percent_rank() OVER ({part}"
                f"ORDER BY {c}, {id_col}), 6) as double)"))
        return out
    from .sampling import global_index
    ncols = len(score_cols)
    arr = F.array(*[
        F.struct(F.lit(i).alias("__ci"),
                 F.col(c).cast("double").alias("__s"))
        for i, c in enumerate(score_cols)])
    narrow = (df.select(F.col(id_col).alias("__id"),
                        F.explode(arr).alias("x"))
              .select("__id", F.col("x.__ci").alias("__ci"),
                      F.col("x.__s").alias("__s")))
    idx = global_index(narrow,
                       [F.col("__ci"), F.col("__s"), F.col("__id")],
                       out_col="__pos", total_col="__tot")
    pct = idx.select(
        "__id", "__ci",
        F.expr(f"cast(round((__pos - __ci * (__tot div {ncols})) / "
               f"greatest(__tot div {ncols} - 1, 1), 6) as double)")
        .alias("__pct"))
    wide = pct.groupBy("__id").agg(*[
        F.max(F.when(F.col("__ci") == i, F.col("__pct")))
        .alias(score_cols[i] + suffix) for i in range(ncols)])
    return df.join(wide.withColumnRenamed("__id", id_col), id_col)


def binned_counts(df: DataFrame, col: str, lo: float, hi: float,
                  nbins: int, keys: list[str] | None = None) -> DataFrame:
    """(keys..., __bin, __c) — per-stratum fixed equi-width bin counts
    (same formula as :func:`histogram`; values outside [lo, hi]
    dropped).  One partial-aggregated groupBy; the building block
    :func:`psi_drift` runs per side — compute a reference snapshot's
    counts ONCE and reuse them against every new batch via
    :func:`psi_from_binned`."""
    if nbins <= 0 or hi <= lo:
        raise ValueError("need nbins >= 1 and hi > lo")
    keys = keys or []
    w = (hi - lo) / nbins
    bin_ = F.least(F.floor((F.col(col) - F.lit(lo)) / F.lit(w)),
                   F.lit(nbins - 1)).cast("bigint")
    return (df.filter((F.col(col) >= lo) & (F.col(col) <= hi))
            .groupBy(*keys, bin_.alias("__bin"))
            .agg(F.count(F.lit(1)).alias("__c")))


def psi_drift(df_a: DataFrame, df_b: DataFrame, col: str,
              lo: float, hi: float, nbins: int,
              keys: list[str] | None = None, *,
              smooth: float = 0.5) -> DataFrame:
    """Population Stability Index between two snapshots of a corpus —
    the drift monitor a curation pipeline runs between crawls: did the
    distribution of ``col`` (a length, a quality score, a perplexity)
    move, overall or within each ``keys`` stratum?

    PSI = Σ_bins (p_a - p_b) · ln(p_a / p_b) over the same fixed
    equi-width bins as :func:`histogram` (values outside [lo, hi]
    dropped on BOTH sides, identically).  Bin probabilities are
    additively smoothed — p = (count + smooth) / (n + smooth·nbins) —
    so bins observed on only one side contribute finitely.  Bins empty
    on BOTH sides are omitted from the sum (their smoothed
    contribution is not exactly zero when n_a ≠ n_b, but it is
    O(smooth²/n²) and the omission is applied identically in the
    engine and the oracle).  Conventional read: < 0.1 stable,
    0.1–0.25 drifting, > 0.25 shifted.

    Output: (keys..., psi, n_a, n_b) with psi rounded to 6 dp.

    Scale shape: each snapshot passes through ONE partial-aggregated
    groupBy on (keys, bin) — the only corpus-sized work; the union,
    per-key totals window and PSI sum all run on ≤ |strata| × nbins
    rows.  Nothing corpus-sized is joined, windowed or collected."""
    a = binned_counts(df_a, col, lo, hi, nbins, keys)
    b = binned_counts(df_b, col, lo, hi, nbins, keys)
    return psi_from_binned(a, b, nbins, keys, smooth=smooth)


def psi_from_binned(counts_a: DataFrame, counts_b: DataFrame,
                    nbins: int, keys: list[str] | None = None, *,
                    smooth: float = 0.5) -> DataFrame:
    """PSI from two pre-aggregated :func:`binned_counts` frames — the
    streaming/incremental entry point: the reference side's counts are
    |strata| × nbins rows computed once, not a corpus re-scan per
    comparison."""
    if smooth <= 0:
        raise ValueError("smooth must be > 0 (keeps ln() total)")
    keys = keys or []
    both = (counts_a.withColumn("__side", F.lit("a"))
            .unionByName(counts_b.withColumn("__side", F.lit("b"))))
    # tiny from here on: ≤ |strata| × nbins × 2 rows
    per_bin = (both.groupBy(*keys, "__bin")
               .agg(F.sum(F.when(F.col("__side") == "a", F.col("__c"))
                          .otherwise(F.lit(0))).alias("ca"),
                    F.sum(F.when(F.col("__side") == "b", F.col("__c"))
                          .otherwise(F.lit(0))).alias("cb")))
    kw = (W.partitionBy(*keys) if keys
          else W.partitionBy(F.lit(1)))
    per_bin = (per_bin
               .withColumn("na", F.sum("ca").over(kw))
               .withColumn("nb", F.sum("cb").over(kw)))
    pa = (f"(cast(ca + {smooth} as double) / "
          f"cast(na + {smooth} * {nbins} as double))")
    pb = (f"(cast(cb + {smooth} as double) / "
          f"cast(nb + {smooth} * {nbins} as double))")
    # Each bin's contribution is rounded to 9 dp and summed as exact
    # decimal: the total is then independent of partial-agg order (and
    # of last-ulp ln() differences between engines), so the 6-dp psi
    # is engine-portable.
    contrib = F.expr(f"cast(round(({pa} - {pb}) * ln({pa} / {pb}), 9) "
                     f"as decimal(38,9))")
    return (per_bin.withColumn("__x", contrib)
            .groupBy(*keys)
            .agg(F.round(F.sum("__x").cast("double"), 6).alias("psi"),
                 F.max("na").alias("n_a"), F.max("nb").alias("n_b")))


def psi_drift_oracle_sql(table_a: str, table_b: str, col: str,
                         lo: float, hi: float, nbins: int,
                         keys: list[str] | None = None, *,
                         smooth: float = 0.5) -> str:
    """DuckDB mirror of :func:`psi_drift` — identical bin formula,
    smoothing and contribution expression (missing bins materialize as
    zero counts via the side-conditional sums, same as the engine)."""
    keys = keys or []
    w = (hi - lo) / nbins
    b = f"cast(least(floor(({col} - {lo}) / {w}), {nbins - 1}) as bigint)"
    ks = ("".join(k + ", " for k in keys))
    kcols = ", ".join(keys) if keys else None
    pa = (f"(cast(ca + {smooth} as double) / "
          f"cast(na + {smooth} * {nbins} as double))")
    pb = (f"(cast(cb + {smooth} as double) / "
          f"cast(nb + {smooth} * {nbins} as double))")
    grp_tail = f"GROUP BY {kcols}" if kcols else ""
    part = f"PARTITION BY {kcols}" if kcols else ""
    sel_keys = f"{kcols}, " if kcols else ""
    return f"""
WITH u AS (
  SELECT {ks}{b} AS bin, count(*) AS c, 'a' AS side FROM {table_a}
  WHERE {col} >= {lo} AND {col} <= {hi} GROUP BY {ks}bin
  UNION ALL
  SELECT {ks}{b} AS bin, count(*) AS c, 'b' AS side FROM {table_b}
  WHERE {col} >= {lo} AND {col} <= {hi} GROUP BY {ks}bin),
pb AS (
  SELECT {ks}bin,
         sum(CASE WHEN side = 'a' THEN c ELSE 0 END) AS ca,
         sum(CASE WHEN side = 'b' THEN c ELSE 0 END) AS cb
  FROM u GROUP BY {ks}bin),
pt AS (
  SELECT *, sum(ca) OVER ({part}) AS na, sum(cb) OVER ({part}) AS nb
  FROM pb)
SELECT {sel_keys}round(cast(sum(cast(round(({pa} - {pb}) * ln({pa} / {pb}),
                                           9) as decimal(38,9)))
                            as double), 6) AS psi,
       cast(max(na) as bigint) AS n_a, cast(max(nb) as bigint) AS n_b
FROM pt {grp_tail}
"""


def percentile_normalize_oracle_sql(score_cols: list[str],
                                    keys: list[str] | None = None, *,
                                    id_col: str = "doc_id",
                                    suffix: str = "_pct",
                                    select: str = "*",
                                    table: str = "documents") -> str:
    """DuckDB mirror of :func:`percentile_normalize`."""
    part = f"PARTITION BY {', '.join(keys)} " if keys else ""
    cols = ", ".join(
        f"cast(round(percent_rank() OVER ({part}"
        f"ORDER BY {c}, {id_col}), 6) as double) AS {c}{suffix}"
        for c in score_cols)
    return f"SELECT {select}, {cols} FROM {table}"


def group_stats_filter(df: DataFrame, keys: list[str],
                       stats: dict[str, str], keep_when: str,
                       *, broadcast_groups: bool = True) -> DataFrame:
    """Keep only rows whose GROUP passes aggregate thresholds — the
    source/domain-level curation gate ("drop every domain whose mean
    quality is low or that has fewer than N docs"), where the verdict
    is a property of the group, not the row.

    ``stats`` maps output names to SQL aggregate expressions evaluated
    per ``keys`` group; ``keep_when`` is a boolean SQL expression over
    those names.  Rows from passing groups are returned unchanged.

    Scale shape: one partial-aggregated groupBy on ``keys`` produces
    the per-group stats (|groups| rows — sources/domains number in the
    millions at 100 TB, not billions), the failing groups are filtered
    OUT of that tiny frame, and the corpus inner-joins the survivor
    keys broadcast (``broadcast_groups=False`` falls back to a shuffle
    join for pathological group cardinality).  The corpus itself is
    never shuffled and no window runs over it.
    """
    if not keys:
        raise ValueError("need at least one group key")
    if not stats:
        raise ValueError("need at least one stats aggregate")
    bad = {n for n in stats if n in df.columns or n in keys}
    if bad:
        raise ValueError(f"stats names collide with input columns: {bad}")
    grp = (df.groupBy(*keys)
           .agg(*[F.expr(e).alias(n) for n, e in stats.items()])
           .filter(keep_when)
           .select(*keys))
    if broadcast_groups:
        grp = F.broadcast(grp)
    return df.join(grp, keys, "inner")


def group_stats_filter_oracle_sql(keys: list[str], stats: dict[str, str],
                                  keep_when: str, *,
                                  select: str = "*",
                                  table: str = "documents") -> str:
    """DuckDB mirror of :func:`group_stats_filter` (semi-join against
    the HAVING-filtered group list)."""
    kcols = ", ".join(keys)
    scols = ", ".join(f"{e} AS {n}" for n, e in stats.items())
    on = " AND ".join(f"t.{k} = g.{k}" for k in keys)
    return (f"SELECT {select} FROM {table} t WHERE EXISTS ("
            f"SELECT 1 FROM (SELECT {kcols}, {scols} FROM {table} "
            f"GROUP BY {kcols}) g WHERE {on} AND ({keep_when}))")


def check_expectations(df: DataFrame,
                       checks: dict[str, tuple[str, str]],
                       keys: list[str] | None = None) -> DataFrame:
    """Data-quality expectation suite (the Deequ/Great-Expectations
    role): every check's metric computes in ONE aggregation pass over
    the corpus, then the pass/fail verdicts evaluate on the
    |checks|-row result — the pre-flight gate a training build runs
    before pointing 1000 executors at a new snapshot.

    ``checks`` maps a check name to ``(metric_expr, pass_when)``:
    ``metric_expr`` is a SQL aggregate producing one double;
    ``pass_when`` is a boolean SQL expression over the column
    ``value`` (the metric's result), e.g.::

        {"text_null_rate": ("avg(cast(text IS NULL as double))",
                            "value < 0.01"),
         "langs_present":  ("cast(count(distinct lang) as double)",
                            "value >= 3")}

    Output: (keys..., check_name, value, passed), one row per check
    (per group when ``keys`` is given — the per-source report card;
    global with one 1-row exchange otherwise).

    Scale shape: a single aggregate — every metric partial-aggregates
    map-side and one exchange (keyless or on ``keys``) finalizes; the
    explode to rows and the verdicts run on |groups| × |checks| rows.
    Adding a check adds a column to the agg, never a pass over the
    data."""
    if not checks:
        raise ValueError("need at least one check")
    keys = keys or []
    aggs = [F.expr(metric).cast("double").alias(f"__m_{i}")
            for i, (metric, _) in enumerate(checks.values())]
    one = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
    rows = one.select(*keys, F.explode(F.array(*[
        F.struct(F.lit(name).alias("check_name"),
                 F.col(f"__m_{i}").alias("value"),
                 F.expr(re.sub(r"\bvalue\b", f"__m_{i}", pw))
                 .alias("passed"))
        for i, (name, (_, pw)) in enumerate(checks.items())]))
        .alias("r"))
    return rows.select(*keys, "r.*")


def check_expectations_oracle_sql(checks: dict[str, tuple[str, str]],
                                  table: str = "documents",
                                  keys: list[str] | None = None) -> str:
    """DuckDB mirror of :func:`check_expectations` — one SELECT per
    check over the same table, verdict inlined over the metric."""
    keys = keys or []
    ks = "".join(k + ", " for k in keys)
    grp = (" GROUP BY " + ", ".join(keys)) if keys else ""
    parts = []
    for name, (metric, pw) in checks.items():
        m = f"cast(({metric}) as double)"
        verdict = re.sub(r"\bvalue\b", lambda _: m, pw)
        parts.append(
            f"SELECT {ks}'{name}' AS check_name, {m} AS value, "
            f"({verdict}) AS passed FROM {table}{grp}")
    return "\nUNION ALL\n".join(parts)


def zscore_normalize(df: DataFrame, score_cols: list[str],
                     *, keys: list[str] | None = None,
                     suffix: str = "_z",
                     broadcast_stats: bool = True) -> DataFrame:
    """Standardize curation signals to z-scores, globally or per
    stratum — the parametric sibling of :func:`percentile_normalize`
    (use percentiles for heavy-tailed signals, z-scores when a
    downstream mixer expects centered/unit-variance features).

    Engine-exact: mean and variance derive from decimal(18,6) sums
    (Σx and Σx² are order-insensitive exact; 18,6 — not 38,6 —
    because DuckDB caps the product width at 38, so signals must fit
    |x| < 10¹² — every doc-level curation signal does; rescale first
    otherwise), the population std is
    ``sqrt((n·Σx² − (Σx)²) / n²)`` evaluated on the exact pieces cast
    to double, and the final z rounds to 6 dp — so the DuckDB oracle
    (:func:`zscore_normalize_oracle_sql`) matches bit-for-bit.

    Scale shape: ONE partial-aggregated groupBy produces |strata|
    rows of (Σx, Σx², n) which broadcast back; the corpus is never
    shuffled and no window runs over it (``percentile_normalize``
    needs a range exchange — z-scores don't even need that).
    Constant-signal strata (std = 0) yield NULL z, never a division
    crash."""
    keys = list(keys or [])
    aggs = []
    for c in score_cols:
        aggs += [
            F.expr(f"sum(cast({c} as decimal(18,6)))").alias(f"__s_{c}"),
            F.expr(f"sum(cast({c} as decimal(18,6)) * "
                   f"cast({c} as decimal(18,6)))").alias(f"__q_{c}"),
            F.expr(f"count({c})").alias(f"__n_{c}"),
        ]
    stats = (df.groupBy(*keys).agg(*aggs) if keys
             else df.groupBy().agg(*aggs))
    if broadcast_stats:
        stats = F.broadcast(stats)
    out = (df.join(stats, keys, "inner") if keys
           else df.crossJoin(stats))
    for c in score_cols:
        s, q, n = f"__s_{c}", f"__q_{c}", f"__n_{c}"
        mean = f"(cast({s} as double) / {n})"
        std = (f"sqrt((cast({n} as double) * cast({q} as double) - "
               f"cast({s} as double) * cast({s} as double)) / "
               f"(cast({n} as double) * cast({n} as double)))")
        out = out.withColumn(
            c + suffix,
            F.expr(f"cast(round((cast({c} as double) - {mean}) / "
                   f"nullif({std}, 0.0), 6) as double)"))
    return out.drop(*[f"__{t}_{c}" for c in score_cols
                      for t in ("s", "q", "n")])


def zscore_normalize_oracle_sql(score_cols: list[str],
                                *, keys: list[str] | None = None,
                                suffix: str = "_z", select: str = "*",
                                table: str = "documents") -> str:
    """DuckDB mirror of :func:`zscore_normalize` — identical decimal
    sums and double expression tree."""
    keys = list(keys or [])
    kcols = ", ".join(keys)
    aggs = ", ".join(
        f"sum(cast({c} as decimal(18,6))) AS __s_{c}, "
        f"sum(cast({c} as decimal(18,6)) * cast({c} as decimal(18,6)))"
        f" AS __q_{c}, count({c}) AS __n_{c}"
        for c in score_cols)
    zs = []
    for c in score_cols:
        s, q, n = f"__s_{c}", f"__q_{c}", f"__n_{c}"
        mean = f"(cast({s} as double) / {n})"
        std = (f"sqrt((cast({n} as double) * cast({q} as double) - "
               f"cast({s} as double) * cast({s} as double)) / "
               f"(cast({n} as double) * cast({n} as double)))")
        zs.append(f"cast(round((cast({c} as double) - {mean}) / "
                  f"nullif({std}, 0.0), 6) as double) AS {c}{suffix}")
    grp = f"SELECT {kcols + ', ' if kcols else ''}{aggs} FROM {table}" \
          + (f" GROUP BY {kcols}" if kcols else "")
    join = (f"JOIN ({grp}) g ON "
            + " AND ".join(f"t.{k} = g.{k}" for k in keys)
            if keys else f"CROSS JOIN ({grp}) g")
    return f"SELECT {select}, {', '.join(zs)} FROM {table} t {join}"


def conversion_ztest(df: DataFrame, group_col: str,
                     success_expr: str) -> DataFrame:
    """Per-variant conversion report with a two-proportion z-test of
    each variant against the POOLED rest — the experiment-analysis
    table (A/B/n dashboards): (variant, n, conv, rate, z).

    z = (p₁ − p₂) / √( p̂(1 − p̂)(1/n₁ + 1/n₂) ) with p̂ pooled over
    both sides.  Everything derives from four counts per variant, so
    the DuckDB oracle replays it exactly (identical double expression
    tree, 9-dp round); degenerate pools (p̂ ∈ {0, 1} or an empty
    rest) yield NULL z, never a division crash.

    Scale shape: ONE partial-aggregated groupBy on the variant is the
    only corpus-sized work; the rest runs on |variants| rows against
    a broadcast 1-row total."""
    per = (df.groupBy(F.col(group_col).alias("variant"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.expr(f"sum(cast(({success_expr}) as bigint))")
                .alias("conv")))
    tot = per.agg(F.expr("sum(n)").alias("tn"),
                  F.expr("sum(conv)").alias("tc"))
    z = ("(cast(conv as double) / n - "
         "cast(tc - conv as double) / (tn - n)) / "
         "sqrt((cast(tc as double) / tn) * (1.0 - cast(tc as double) / tn)"
         " * (cast(1.0 as double) / n + cast(1.0 as double) / (tn - n)))")
    return (per.crossJoin(F.broadcast(tot))
            .select("variant", "n", "conv",
                    F.expr("cast(round(cast(conv as double) / n, 6) "
                           "as double)").alias("rate"),
                    F.expr(f"cast(round(CASE WHEN tn > n AND tc > 0 "
                           f"AND tc < tn THEN {z} END, 9) as double)")
                    .alias("z")))


def conversion_ztest_oracle_sql(group_col: str, success_expr: str, *,
                                table: str = "events") -> str:
    """DuckDB mirror of :func:`conversion_ztest`."""
    z = ("(cast(conv as double) / n - "
         "cast(tc - conv as double) / (tn - n)) / "
         "sqrt((cast(tc as double) / tn) * (1.0 - cast(tc as double) / tn)"
         " * (cast(1.0 as double) / n + cast(1.0 as double) / (tn - n)))")
    return f"""
WITH per AS (
  SELECT {group_col} AS variant, count(*) AS n,
         cast(sum(cast(({success_expr}) as bigint)) as bigint) AS conv
  FROM {table} GROUP BY 1),
tot AS (SELECT sum(n) AS tn, sum(conv) AS tc FROM per)
SELECT variant, n, conv,
       cast(round(cast(conv as double) / n, 6) as double) AS rate,
       cast(round(CASE WHEN tn > n AND tc > 0 AND tc < tn
                  THEN {z} END, 9) as double) AS z
FROM per CROSS JOIN tot"""
