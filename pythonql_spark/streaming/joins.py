"""Stream-stream interval join — the unbounded-input counterpart of
operators/rangejoin.py (reference window clause joins sequences
in memory; at 100 TB the same semantics arrive as two streams).

Spark's stream-stream join machinery keeps per-key state on both
sides; an event-TIME range condition between the two sides is what
lets it EVICT that state — each side's buffer is bounded by the
interval span plus the watermark delay, so state stays O(throughput ×
horizon), not O(stream length).  The same declaration on two batch
DataFrames plans an ordinary equi+range join, which is how the batch
oracle checks it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(left: DataFrame, right: DataFrame, *,
                  on: list[str] | str, lower: float, upper: float,
                  left_ts: str = "ts", right_ts: str = "ts",
                  watermark: str | None = None,
                  suffix: str = "_r") -> DataFrame:
    """Match right rows whose event time lies in
    ``[left_ts + lower, left_ts + upper]`` seconds (both ends
    inclusive; negative bounds look back), within equi key(s) ``on``.

    On streaming inputs pass ``watermark`` (e.g. ``"10 minutes"``) —
    both sides get ``withWatermark`` and the range condition bounds
    the join state.  Right-side columns colliding with left names come
    back suffixed.
    """
    if upper < lower:
        raise ValueError("upper must be >= lower")
    keys = [on] if isinstance(on, str) else list(on)

    from ..helpers import ensure_event_time

    left = ensure_event_time(left, [left_ts])
    right = ensure_event_time(right, [right_ts])

    if watermark is not None:
        if left.isStreaming:
            left = left.withWatermark(left_ts, watermark)
        if right.isStreaming:
            right = right.withWatermark(right_ts, watermark)

    collide = {c for c in right.columns if c in left.columns}
    ren = {c: (c + suffix if c in collide else c) for c in right.columns}
    r = right.select(*[F.col(c).alias(ren[c]) for c in right.columns])

    rt = F.col(ren[right_ts])
    lt = F.col(left_ts)
    # fixed-point rendering: repr(1e-05) is scientific notation, which
    # the INTERVAL literal parser rejects; 6 dp == microseconds, the
    # timestamp resolution
    lo, hi = f"{float(lower):.6f}", f"{float(upper):.6f}"
    cond = ((rt >= lt + F.expr(f"INTERVAL '{lo}' SECOND"))
            & (rt <= lt + F.expr(f"INTERVAL '{hi}' SECOND")))
    for k in keys:
        cond = cond & (left[k] == r[ren[k]])
    out = left.join(r, cond, "inner")
    return out.drop(*[ren[k] for k in keys if ren[k] != k])
