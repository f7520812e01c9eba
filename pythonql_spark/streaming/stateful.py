"""Custom stateful streaming operators via applyInPandasWithState —
the unbounded-stream form of the reference's predicate window clause
(Executor.py:568-638): state that opens on a condition, absorbs
events, and closes on a condition, per key, across micro-batches.

Design for scale: state is per-key and O(1) per open session (start,
last-seen, count, sum — never the raw events), keys are hash-
partitioned across executors by the groupBy, and event-time timeout +
watermark bound state size under late data.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_sessionize(events: DataFrame, *, gap_ms: int,
                        key_col: str = "user_id", ts_col: str = "ts",
                        value_col: str = "value",
                        emit_open_on_timeout: bool = True) -> DataFrame:
    """Gap-based sessions as explicit keyed state: a session closes
    when the next event of the same key arrives ``gap_ms`` or more
    after the previous one (strictly: gap >= gap_ms), or when the
    event-time timeout fires after the watermark passes the last event
    + gap.  Emits one row per CLOSED session:
    (key, session_start, n_events, sum_value).

    Works on a streaming DataFrame (requires a watermark on
    ``ts_col`` for the timeout path).  On a batch DataFrame use the
    equivalent lag/cumsum query (benchqueries.sessionize) — same
    results for closed sessions; this operator exists for unbounded
    input where that query's global window per key cannot run."""
    from ..helpers import ensure_event_time

    events = ensure_event_time(events, [ts_col])
    out_schema = (f"{key_col} long, session_start timestamp, "
                  f"n_events long, sum_value double")
    state_schema = "start long, last long, n long, s double"
    gap_us = gap_ms * 1000

    def fn(key, pdfs, state: GroupState):
        (k,) = key
        closed = []

        def load():
            if state.exists:
                return list(state.get)
            return None

        cur = load()
        rows = []
        for pdf in pdfs:
            rows.append(pdf[[ts_col, value_col]])
        if rows:
            batch = pd.concat(rows).sort_values(ts_col, kind="mergesort")
            for ts, val in zip(batch[ts_col], batch[value_col]):
                ts_us = int(ts.value // 1000)  # pandas ns -> µs epoch
                if cur is None:
                    cur = [ts_us, ts_us, 0, 0.0]
                elif ts_us - cur[1] >= gap_us:
                    closed.append(cur)
                    cur = [ts_us, ts_us, 0, 0.0]
                cur[1] = ts_us
                cur[2] += 1
                cur[3] += float(val)
        if state.hasTimedOut:
            if cur is not None and emit_open_on_timeout:
                closed.append(cur)
            cur = None
            state.remove()
        elif cur is not None:
            state.update(tuple(cur))
            # flush the open session once the watermark passes last+gap
            state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
        if not closed:
            yield pd.DataFrame(columns=[key_col, "session_start",
                                        "n_events", "sum_value"])
            return
        yield pd.DataFrame({
            key_col: [k] * len(closed),
            "session_start": [pd.Timestamp(c[0] * 1000) for c in closed],
            "n_events": [c[2] for c in closed],
            "sum_value": [c[3] for c in closed],
        })

    return (events
            .groupBy(key_col)
            .applyInPandasWithState(
                fn, out_schema, state_schema,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout
                if events.isStreaming else GroupStateTimeout.NoTimeout))
