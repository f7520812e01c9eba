"""Event-time windows — the Spark-first upgrade of the reference's
window clause (Grammar.md `window`; Executor.py:568-638).

The reference scans an in-memory sequence; at 100 TB the same
semantics are event-time windows over a (possibly unbounded) stream.
These helpers work identically on batch DataFrames and on
``readStream`` DataFrames — the functions only declare the plan, so
the same code path is used by the batch oracle queries and the
streaming tests (with watermarks for state eviction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str = "ts",
                   delay: str = "10 minutes") -> DataFrame:
    """Late-data bound; on a stream this also bounds window state.
    TIMESTAMP_NTZ event-time columns are cast to TimestampType first —
    withWatermark rejects NTZ (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE)
    and the session TZ is pinned UTC so the cast is instant-preserving."""
    from ..helpers import ensure_event_time

    df = ensure_event_time(df, [ts_col])
    return df.withWatermark(ts_col, delay) if df.isStreaming else df


def dedup_stream(df: DataFrame, keys: list[str], ts_col: str = "ts",
                 delay: str = "10 minutes") -> DataFrame:
    """Exact dedup on an unbounded stream: keep the first arrival per
    key, with per-key state evicted once the watermark passes arrival
    time + ``delay`` (``dropDuplicatesWithinWatermark``) — so state is
    bounded by the duplicate-arrival horizon, not corpus size.  On a
    batch DataFrame the same call degrades to a global
    ``dropDuplicates``.  Dedup-by-content: add a fingerprint column
    first (operators.text.fingerprint) and pass it as the key."""
    from ..helpers import ensure_event_time

    df = ensure_event_time(df, [ts_col])
    if df.isStreaming:
        return (df.withWatermark(ts_col, delay)
                .dropDuplicatesWithinWatermark(keys))
    return df.dropDuplicates(keys)


def _aggs(aggs: dict[str, Column] | None) -> list[Column]:
    aggs = aggs or {"n_events": F.count(F.lit(1))}
    return [c.alias(n) for n, c in aggs.items()]


def tumbling_agg(df: DataFrame, duration: str, ts_col: str = "ts",
                 keys: list[str] | None = None,
                 aggs: dict[str, Column] | None = None) -> DataFrame:
    """Non-overlapping event-time windows (epoch-aligned)."""
    w = F.window(F.col(ts_col), duration)
    return (df.groupBy(w, *(keys or []))
            .agg(*_aggs(aggs))
            .withColumn("window_start", F.col("window.start"))
            .drop("window"))


def sliding_agg(df: DataFrame, duration: str, slide: str,
                ts_col: str = "ts", keys: list[str] | None = None,
                aggs: dict[str, Column] | None = None) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    w = F.window(F.col(ts_col), duration, slide)
    return (df.groupBy(w, *(keys or []))
            .agg(*_aggs(aggs))
            .withColumn("window_start", F.col("window.start"))
            .drop("window"))


def session_agg(df: DataFrame, gap: str, ts_col: str = "ts",
                keys: list[str] | None = None,
                aggs: dict[str, Column] | None = None) -> DataFrame:
    """Gap-based session windows (a new session starts when the gap
    since the previous event reaches ``gap``)."""
    w = F.session_window(F.col(ts_col), gap)
    return (df.groupBy(w, *(keys or []))
            .agg(*_aggs(aggs))
            .withColumn("session_start", F.col("session_window.start"))
            .drop("session_window"))
