"""Range (interval) join — each point row matched to every interval
row whose [start, end) contains it, optionally within equi keys.

The reference expresses this shape as a nested `for` with a range
`where` (tuple-at-a-time nested loop — Executor.py:119-139 composes
the clause generators, so cost is |points| x |intervals| per key).
Catalyst is no better by default: a join whose only condition is a
range predicate plans as BroadcastNestedLoopJoin / cartesian, and
with equi keys the range is a post-join filter over every key pair —
both quadratic in the hot key at 100 TB.

Scale shape here is bin-and-join: quantize the point to ONE bucket of
width `bin_width`, explode each interval into the buckets it overlaps
(ceil(len/bin_width)+1 rows, ~2 when bin_width ~ interval length),
then a plain EQUI-join on (bucket [, keys]) + a residual range filter.
Cost: one hash shuffle of |points| + |intervals|*bins_per_interval
rows, fully codegen'd, AQE-skew-splittable — no nested loop anywhere.
A point lives in exactly one bucket, so no pair dedup is needed.

Pick `bin_width` on the order of the TYPICAL interval length: too
small explodes long intervals into many buckets, too large puts many
points+intervals in one bucket (the residual filter then does the
work).  Timestamps are binned on their epoch-seconds value, so
`bin_width` is in seconds for timestamp columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BOUNDS = {"[)", "[]", "(]", "()"}


def _num(df: DataFrame, name: str) -> Column:
    """Numeric view of a point/bound column (timestamp → epoch secs).

    Branches on the column's dtype: TIMESTAMP / TIMESTAMP_NTZ / DATE
    go through epoch micros (NTZ cast to timestamp first — session TZ
    is UTC, see session.py — because Spark refuses a direct NTZ→double
    cast); everything else casts to double directly.  Sub-second
    precision is preserved (micros / 1e6)."""
    dt = df.schema[name].dataType.simpleString()
    c = F.col(name)
    if dt in ("timestamp", "timestamp_ntz", "date"):
        return F.unix_micros(c.cast("timestamp")) / F.lit(1e6)
    return c.cast("double")


def range_join(points: DataFrame, intervals: DataFrame, *,
               point: str, start: str, end: str,
               bin_width: float, on: list[str] | str | None = None,
               bounds: str = "[)", suffix: str = "_r") -> DataFrame:
    """Inner-join `points` to the `intervals` rows containing them.

    point / start / end — column names on their respective sides
    (timestamps or numerics).  `on` — equi-key column name(s) present
    on BOTH sides.  `bounds` — interval endpoint semantics, default
    half-open `[)`.  Interval-side columns whose names collide with
    point-side columns come back suffixed with `suffix`.
    """
    if bounds not in _BOUNDS:
        raise ValueError(f"bounds must be one of {_BOUNDS}")
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    keys = [on] if isinstance(on, str) else list(on or [])

    w = F.lit(float(bin_width))
    p = points.withColumn("__bin", F.floor(_num(points, point) / w))
    # drop inverted intervals, then explode into every bucket the
    # interval touches (sequence is inclusive on both ends)
    iv = (intervals
          .filter(_num(intervals, end) >= _num(intervals, start))
          .withColumn("__bin", F.explode(F.sequence(
              F.floor(_num(intervals, start) / w),
              F.floor(_num(intervals, end) / w)))))

    # disambiguate colliding interval-side columns (incl. equi keys)
    collide = {c for c in intervals.columns if c in points.columns}
    ren = {c: (c + suffix if c in collide else c) for c in intervals.columns}
    iv = iv.select("__bin", *[F.col(c).alias(ren[c]) for c in intervals.columns])

    lo_ok = (F.col(point) >= F.col(ren[start]) if bounds[0] == "["
             else F.col(point) > F.col(ren[start]))
    hi_ok = (F.col(point) <= F.col(ren[end]) if bounds[1] == "]"
             else F.col(point) < F.col(ren[end]))
    cond = p["__bin"] == iv["__bin"]
    for k in keys:
        cond = cond & (p[k] == iv[ren[k]])
    out = p.join(iv, cond, "inner").filter(lo_ok & hi_ok)
    drop = ["__bin"] + [ren[k] for k in keys if ren[k] != k]
    return out.drop(*drop)


def band_join(left: DataFrame, right: DataFrame, *,
              left_val: str, right_val: str, eps: float,
              on: list[str] | str | None = None,
              suffix: str = "_r") -> DataFrame:
    """|left_val - right_val| <= eps join (both endpoints inclusive):
    the right value expands to the interval [v-eps, v+eps] and the
    range join above does the rest — one equi shuffle, no nested loop.
    For timestamp columns `eps` is in seconds.  ``eps`` must be
    positive: the bin width derives from it, and a ~zero width makes
    timestamp-scale bucket ids overflow into ONE bucket — the per-key
    cross join this operator exists to avoid (use an equi join for
    exact matching)."""
    if not eps > 0:
        raise ValueError(
            "eps must be > 0 (exact matching is an equi join, "
            "not a band join)")
    iv = (right
          .withColumn("__lo", _num(right, right_val) - F.lit(float(eps)))
          .withColumn("__hi", _num(right, right_val) + F.lit(float(eps))))
    pts = left.withColumn("__pt", _num(left, left_val))
    out = range_join(pts, iv, point="__pt", start="__lo", end="__hi",
                     bin_width=max(float(eps) * 2.0, 1e-12), on=on,
                     bounds="[]", suffix=suffix)
    return out.drop("__pt", "__lo", "__hi")
