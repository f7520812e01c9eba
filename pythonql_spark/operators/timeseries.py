"""Time-series resampling with gap fill — downsample events to a
fixed grid and materialize EMPTY bins, the step dashboards and
forecasting features need that a plain groupBy silently skips.

Spark shape: the aggregation is one keyed shuffle on (key, bin); the
bin spine is `spark.range(n_bins)` (generated, never collected) cross
joined with the distinct key set — keys are the only data-derived
side and they're aggregated before the (broadcast) cross join, so the
spine costs |keys| × n_bins rows of generated data, no second scan of
the input.  Explicit [start, end) bounds keep it single-pass; derive
them from `table_profile` when unknown.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def resample(df: DataFrame, ts_col: str, step_s: int, *,
             start: str, end: str,
             keys: list[str] | None = None,
             aggs: dict[str, Column] | None = None,
             fill: dict[str, float] | None = None) -> DataFrame:
    """(keys..., bin_start, aggs...) with one row for EVERY step-sized
    bin in [start, end) per key combination; bins with no events get
    the ``fill`` value for each agg column (default 0; map a column to
    ``None`` to leave empty bins NULL — e.g. to `forward_fill` after).

    start/end — ``'YYYY-MM-DD HH:MM:SS'`` timestamps; events outside
    the range are dropped.  aggs default to ``{"n_events": count}``.
    """
    keys = list(keys or [])
    aggs = aggs or {"n_events": F.count(F.lit(1))}
    fill = fill or {}
    spark = df.sparkSession

    lo = F.unix_timestamp(F.lit(start))
    # ceil, not truncate: when (end-start) is not a multiple of step_s
    # the trailing PARTIAL bin still holds events that pass the
    # ts < end filter — truncating n_bins would silently drop them
    # from the spine join.  The last bin is simply shorter.
    # driver-side arithmetic (raises a CLEAR error on an unparseable
    # bound instead of a null-propagated TypeError, and avoids
    # launching a Spark job to subtract two literals); the difference
    # of two same-format naive datetimes matches unix_timestamp's.
    import math
    from datetime import datetime
    try:
        span_s = (datetime.strptime(end, "%Y-%m-%d %H:%M:%S")
                  - datetime.strptime(start, "%Y-%m-%d %H:%M:%S")
                  ).total_seconds()
    except ValueError as e:
        raise ValueError(
            f"start/end must be 'YYYY-MM-DD HH:MM:SS' timestamps: {e}")
    n_bins = int(math.ceil(span_s / step_s))
    if n_bins <= 0:
        raise ValueError("end must be after start")

    binned = (df.filter((F.col(ts_col) >= F.lit(start).cast("timestamp"))
                        & (F.col(ts_col) < F.lit(end).cast("timestamp")))
              .withColumn("__bin", F.floor(
                  (F.unix_timestamp(F.col(ts_col)) - lo) / step_s))
              .groupBy(*keys, "__bin")
              .agg(*[c.alias(n) for n, c in aggs.items()]))

    binned = binned.localCheckpoint(eager=False)  # key-set reuse below
    spine = spark.range(n_bins).withColumnRenamed("id", "__bin")
    if keys:
        # key set comes from the ALREADY-AGGREGATED frame (tiny),
        # not a second scan of the input
        spine = spine.crossJoin(F.broadcast(binned.select(*keys).distinct()))

    # null-safe key equality: a NULL-valued key is a real group (the
    # spine carries its NULL row from the distinct() above) — a plain
    # name join would never match it and silently replace its real
    # aggregates with the fill value
    sp, bn = spine.alias("sp"), binned.alias("bn")
    cond = [F.col("sp.__bin") == F.col("bn.__bin")] + [
        F.col(f"sp.{k}").eqNullSafe(F.col(f"bn.{k}")) for k in keys]
    out = (sp.join(bn, cond, "left")
           .select(*[F.col(f"sp.{k}").alias(k) for k in keys],
                   F.timestamp_seconds(lo + F.col("sp.__bin") * step_s)
                    .alias("bin_start"),
                   *[(F.col(f"bn.{n}") if (n in fill and fill[n] is None)
                      else F.coalesce(F.col(f"bn.{n}"),
                                      F.lit(fill.get(n, 0))
                                      .cast(binned.schema[n].dataType)))
                     .alias(n) for n in aggs]))
    return out


def forward_fill(df: DataFrame, cols: list[str] | str, *,
                 order_by: str, keys: list[str] | None = None) -> DataFrame:
    """Replace NULLs with the most recent non-NULL value per key in
    ``order_by`` order (classic time-series imputation after a
    resample with ``fill={col: None}``).  One running
    `last(ignorenulls)` frame per column — a single shuffle on the
    keys shared by all filled columns; rows before the first
    observation stay NULL."""
    from pyspark.sql.window import Window as W
    cols = [cols] if isinstance(cols, str) else list(cols)
    w = (W.partitionBy(*(keys or [])).orderBy(order_by)
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    for c in cols:
        df = df.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return df


def rollup_delta(df: DataFrame, ts_col: str, step_s: int,
                 keys: list[str] | None = None,
                 value_col: str = "value") -> DataFrame:
    """Mergeable per-bucket partial aggregate of ONE batch of events:
    (keys..., bucket_start, n, sum_v, min_v, max_v).  Every column is
    a semigroup (count/sum/min/max merge associatively), which is what
    makes the rollup INCREMENTALLY maintainable — see
    :func:`merge_rollups`."""
    keys = list(keys or [])
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / step_s) * step_s)
    # sum in decimal(38,6): exact and order-independent, so merging
    # deltas in any order (or re-merging late data) reproduces the
    # single-pass total bit-for-bit
    return (df.groupBy(*keys, bucket.alias("bucket_start"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col(value_col).cast("decimal(38,6)")).alias("sum_v"),
                 F.min(value_col).alias("min_v"),
                 F.max(value_col).alias("max_v")))


def merge_rollups(*rollups: DataFrame) -> DataFrame:
    """Hypertable-style continuous aggregate maintenance: combine
    stored rollups (yesterday's materialized buckets + today's delta
    from :func:`rollup_delta`) WITHOUT rescanning raw history — the
    merge is a groupBy over |buckets| rows, not |events|.  Late data
    is just another delta; buckets it touches re-merge to the correct
    totals because every column is associative.  avg = sum_v / n at
    read time."""
    if not rollups:
        raise ValueError("need at least one rollup")
    allof = rollups[0]
    for r in rollups[1:]:
        allof = allof.unionByName(r)
    group_cols = [c for c in allof.columns
                  if c not in ("n", "sum_v", "min_v", "max_v")]
    return (allof.groupBy(*group_cols)
            .agg(F.sum("n").alias("n"),
                 F.sum("sum_v").cast("decimal(38,6)").alias("sum_v"),
                 F.min("min_v").alias("min_v"), F.max("max_v").alias("max_v")))


def moving_agg(df: DataFrame, ts_col: str, value_col: str,
               window_s: int, keys: list[str] | str, *,
               prefix: str = "mov_") -> DataFrame:
    """Trailing time-RANGE aggregates per key — "each event's 1-hour
    running count/sum/avg for this user": a RANGE frame over event
    time, so the window holds however many rows fall inside the
    interval (ROWS frames can't express this).  Adds
    ``{prefix}n / {prefix}sum / {prefix}avg`` columns; the frame is
    [ts - window_s, ts] inclusive, tie rows (equal timestamps) are
    all included by RANGE semantics, making the result independent of
    tie order.

    Sums accumulate as decimal(38,6) (order-insensitive, exact) and
    the average divides that exact sum — engine-portable without
    rounding tricks.

    Scale shape: ONE shuffle on ``keys`` shared by all three window
    functions; keys (users, devices) parallelize across tasks.  For a
    single giant key this is the documented per-key-window caveat —
    sessionize or bucket first."""
    if window_s <= 0:
        raise ValueError("window_s must be > 0")
    from pyspark.sql.window import Window as W
    keys = [keys] if isinstance(keys, str) else list(keys)
    us = window_s * 1_000_000
    ecol = F.unix_micros(F.col(ts_col))
    w = (W.partitionBy(*keys).orderBy(ecol.cast("long"))
         .rangeBetween(-us, 0))
    dec = F.col(value_col).cast("decimal(38,6)")
    out = (df.withColumn(f"{prefix}n", F.count(F.lit(1)).over(w))
           .withColumn("__s", F.sum(dec).over(w)))
    # avg divides the DOUBLE sum (identical in both engines) by the
    # count — decimal division result scales differ across engines
    return (out.withColumn(f"{prefix}sum",
                           F.col("__s").cast("double"))
            .withColumn(f"{prefix}avg",
                        F.col(f"{prefix}sum") / F.col(f"{prefix}n"))
            .drop("__s"))


def moving_agg_oracle_sql(ts_col: str, value_col: str, window_s: int,
                          keys: list[str] | str, *,
                          prefix: str = "mov_", select: str = "*",
                          table: str = "events") -> str:
    """DuckDB mirror of :func:`moving_agg` — identical microsecond
    RANGE frame and decimal accumulation."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    us = window_s * 1_000_000
    part = ", ".join(keys)
    frame = (f"OVER (PARTITION BY {part} ORDER BY epoch_us({ts_col}) "
             f"RANGE BETWEEN {us} PRECEDING AND CURRENT ROW)")
    dec = f"cast({value_col} as decimal(38,6))"
    return (f"SELECT {select}, "
            f"count(*) {frame} AS {prefix}n, "
            f"cast(sum({dec}) {frame} as double) AS {prefix}sum, "
            f"cast(sum({dec}) {frame} as double) / (count(*) {frame}) "
            f"AS {prefix}avg FROM {table}")
