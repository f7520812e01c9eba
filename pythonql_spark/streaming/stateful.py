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

# Spark SQL type -> pandas dtype for the key column of an EMPTY output
# chunk (a bare [] Series defaults to float64, which Arrow can't cast
# to string/long); non-numeric keys ride as object.
_KEY_PD_DTYPE = {"bigint": "int64", "int": "int32", "smallint": "int16",
                 "tinyint": "int8", "double": "float64", "float": "float32"}


def _key_sql_type(events: DataFrame, key_col: str) -> str:
    return events.schema[key_col].dataType.simpleString()


def _set_event_timeout(state: GroupState, want_ms: int) -> None:
    """Set an event-time timeout, clamped to AFTER the current
    watermark.  A file source delivers micro-batches in file order,
    not event-time order, so a batch can carry a key whose whole
    sequence is OLDER than the watermark another batch already
    advanced — its last-event+gap timestamp is then in the past and
    a raw ``setTimeoutTimestamp`` raises INVALID_TIMEOUT_TIMESTAMP,
    crashing the query (found by the x7 scale rehearsal: 700k events
    across 14 files, month-spread timestamps).  Clamping to
    watermark+1 fires the timeout at the next batch boundary — the
    earliest moment Spark processes timers anyway, so the observable
    flush is identical."""
    wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(want_ms, wm + 1))


def stateful_predicate_windows(
        events: DataFrame, *,
        start_when, end_when,
        key_col: str = "user_id", ts_col: str = "ts",
        value_col: str = "value",
        only_end: bool = True,
        sequence_gap_ms: int = 3600_000) -> DataFrame:
    """The reference's TUMBLING predicate window clause
    (window_clause.predicate_windows, Executor.py:568-638) on
    UNBOUNDED input: per key, in event-time order, a window opens when
    ``start_when`` holds (only if none is open), absorbs every element,
    and closes when ``end_when`` holds.  Emits one row per closed
    window: (key, s_at, e_at, s_ts, e_ts, n_events, sum_value), where
    s_at/e_at are 0-based positions in the key's sequence.

    Conditions receive the same arguments as the batch operator —
    ``start_when(curr, at, prev, nxt)`` /
    ``end_when(curr, at, prev, nxt, s_curr, s_at)`` — except that on a
    stream ``nxt`` is always None (no lookahead) and rows are dicts
    ``{"ts": int-microseconds, "value": float}``; conditions meant to
    run identically on both paths should use ``value``/indexes only.

    Scale shape: state per key is O(1) scalars (running aggregate,
    never absorbed rows), keys hash-partition across executors, and an
    event-time timeout ends a key's logical sequence once the
    watermark passes its last event + ``sequence_gap_ms`` — unclosed
    windows are then dropped (``only_end=True``, the reference's `only
    end`) or emitted, and the state is freed.  Tumbling-only: sliding
    predicate windows keep unbounded open-window sets per key, which is
    exactly what an unbounded stream cannot state-bound.

    BATCH input (Spark rejects applyInPandasWithState outside
    streaming) dispatches to the batch ``predicate_windows`` operator
    with identical semantics — end-of-input plays the role of the
    timeout, so with ``only_end=False`` the trailing open window is
    emitted, same as the stream's timeout flush.  Conditions written
    against ``value``/indexes (per the contract above) behave
    identically on both paths."""
    from ..helpers import ensure_event_time

    events = ensure_event_time(events, [ts_col])
    out_cols = [key_col, "s_at", "e_at", "s_ts", "e_ts",
                "n_events", "sum_value"]
    if not events.isStreaming:
        # Batch dispatch (Spark rejects applyInPandasWithState outside
        # streaming): the SAME scalar-state loop as the stream path,
        # over key-repartitioned + key-sorted partitions via
        # mapInPandas.  Two prior shapes were measured and rejected at
        # sf0.1 (100k events / 1500 keys): window arrays-of-structs
        # via predicate_windows + F.aggregate (7.5s) and per-key
        # applyInPandas (11.8s — groupBy.applyInPandas ships one Arrow
        # batch PER KEY, and 1500 tiny batches cost ~4s even for a
        # no-op).  mapInPandas processes whole sorted partitions —
        # ~n_cores Arrow transfers total (1.3s).  Batch conditions
        # additionally see the real ``nxt`` row (a stream has no
        # lookahead), per the operator contract.
        import pandas as _pd
        from pyspark.sql import types as T

        key_pd = _KEY_PD_DTYPE.get(_key_sql_type(events, key_col),
                                   "object")
        schema = T.StructType([
            events.schema[key_col],
            T.StructField("s_at", T.LongType()),
            T.StructField("e_at", T.LongType()),
            T.StructField("s_ts", T.TimestampType()),
            T.StructField("e_ts", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ])

        def _key_windows(k, ts_us, vals):
            n_rows = len(vals)
            dicts = [{"ts": t, "value": v} for t, v in zip(ts_us, vals)]
            closed = []
            open_, s_at, s_start, n, s = False, 0, None, 0, 0.0
            for i in range(n_rows):
                curr = dicts[i]
                prev = dicts[i - 1] if i > 0 else None
                nxt = dicts[i + 1] if i + 1 < n_rows else None
                if not open_ and start_when(curr, i, prev, nxt):
                    open_, s_at, s_start, n, s = True, i, curr, 0, 0.0
                if open_:
                    n += 1
                    s += vals[i]
                    if end_when(curr, i, prev, nxt, s_start, s_at):
                        closed.append((k, s_at, i, s_start["ts"],
                                       ts_us[i], n, s))
                        open_ = False
            if open_ and not only_end:
                closed.append((k, s_at, n_rows - 1, s_start["ts"],
                               ts_us[-1], n, s))
            return closed

        def _frame(closed):
            # explicit dtypes: an empty chunk must still ship
            # Arrow-compatible columns (bare [] defaults to float64,
            # which can't cast to timestamp)
            return _pd.DataFrame({
                key_col: _pd.Series([c[0] for c in closed],
                                    dtype=key_pd),
                "s_at": _pd.Series([c[1] for c in closed],
                                   dtype="int64"),
                "e_at": _pd.Series([c[2] for c in closed],
                                   dtype="int64"),
                "s_ts": _pd.Series(
                    [_pd.Timestamp(c[3] * 1000) for c in closed],
                    dtype="datetime64[ns]"),
                "e_ts": _pd.Series(
                    [_pd.Timestamp(c[4] * 1000) for c in closed],
                    dtype="datetime64[ns]"),
                "n_events": _pd.Series([c[5] for c in closed],
                                       dtype="int64"),
                "sum_value": _pd.Series([c[6] for c in closed],
                                        dtype="float64"),
            }, columns=out_cols)

        def gen(batches):
            # sorted-run grouping: a key's rows arrive contiguously
            # (partition sorted on key) but may span Arrow batches —
            # buffer the current key across batch boundaries.  Closed
            # windows accumulate and ship as ONE output frame per
            # partition: yielding per key costs one Arrow batch each
            # (1500 keys ≈ +4s at sf0.1, measured)
            out: list = []
            buf_key, buf_ts, buf_vals = None, [], []
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                ts_us = (pdf[ts_col].astype("int64") // 1000).tolist()
                vals = pdf[value_col].astype("float64").tolist()
                keys = pdf[key_col].tolist()
                start = 0
                for i in range(1, len(keys) + 1):
                    if i == len(keys) or keys[i] != keys[start]:
                        if buf_key is not None and keys[start] == buf_key:
                            buf_ts += ts_us[start:i]
                            buf_vals += vals[start:i]
                        else:
                            if buf_key is not None:
                                out += _key_windows(
                                    buf_key, buf_ts, buf_vals)
                            buf_key = keys[start]
                            buf_ts = ts_us[start:i]
                            buf_vals = vals[start:i]
                        start = i
            if buf_key is not None:
                out += _key_windows(buf_key, buf_ts, buf_vals)
            yield _frame(out)

        return (events.select(key_col, ts_col, value_col)
                .repartition(key_col)
                .sortWithinPartitions(key_col, ts_col, value_col)
                .mapInPandas(gen, schema))
    out_schema = (f"{key_col} {_key_sql_type(events, key_col)}, "
                  f"s_at long, e_at long, "
                  f"s_ts timestamp, e_ts timestamp, "
                  f"n_events long, sum_value double")
    state_schema = ("idx long, open boolean, s_at long, s_ts long, "
                    "s_val double, n long, s double, "
                    "prev_ts long, prev_val double, has_prev boolean")

    def fn(key, pdfs, state: GroupState):
        (k,) = key
        if state.exists:
            (idx, open_, s_at, s_ts, s_val, n, s,
             prev_ts, prev_val, has_prev) = state.get
        else:
            idx, open_, s_at, s_ts, s_val, n, s = 0, False, 0, 0, 0.0, 0, 0.0
            prev_ts, prev_val, has_prev = 0, 0.0, False
        closed = []
        rows = [pdf[[ts_col, value_col]] for pdf in pdfs]
        if rows:
            batch = pd.concat(rows).sort_values([ts_col, value_col],
                                                kind="mergesort")
            for ts, val in zip(batch[ts_col], batch[value_col]):
                ts_us = int(ts.value // 1000)
                curr = {"ts": ts_us, "value": float(val)}
                prev = ({"ts": prev_ts, "value": prev_val}
                        if has_prev else None)
                if not open_ and start_when(curr, idx, prev, None):
                    open_, s_at, s_ts, s_val = True, idx, ts_us, float(val)
                    n, s = 0, 0.0
                if open_:
                    n += 1
                    s += float(val)
                    if end_when(curr, idx, prev, None,
                                {"ts": s_ts, "value": s_val}, s_at):
                        closed.append((s_at, idx, s_ts, ts_us, n, s))
                        open_ = False
                prev_ts, prev_val, has_prev = ts_us, float(val), True
                idx += 1
        if state.hasTimedOut:
            # watermark passed last event + gap: the logical sequence
            # ends — flush or drop the unclosed window, free the state
            if open_ and not only_end:
                closed.append((s_at, idx - 1, s_ts, prev_ts, n, s))
            state.remove()
        else:
            state.update((idx, open_, s_at, s_ts, s_val, n, s,
                          prev_ts, prev_val, has_prev))
            _set_event_timeout(state, prev_ts // 1000 + sequence_gap_ms)
        if not closed:
            yield pd.DataFrame(columns=[key_col, "s_at", "e_at", "s_ts",
                                        "e_ts", "n_events", "sum_value"])
            return
        yield pd.DataFrame({
            key_col: [k] * len(closed),
            "s_at": [c[0] for c in closed],
            "e_at": [c[1] for c in closed],
            "s_ts": [pd.Timestamp(c[2] * 1000) for c in closed],
            "e_ts": [pd.Timestamp(c[3] * 1000) for c in closed],
            "n_events": [c[4] for c in closed],
            "sum_value": [c[5] for c in closed],
        })

    return (events
            .groupBy(key_col)
            .applyInPandasWithState(
                fn, out_schema, state_schema,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout
                if events.isStreaming else GroupStateTimeout.NoTimeout))


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
    ``ts_col`` for the timeout path).  BATCH input (Spark rejects
    applyInPandasWithState outside streaming) dispatches to the
    equivalent lag/cumsum plan — pure JVM window functions, no Python
    loop — where end-of-input plays the role of the timeout: with
    ``emit_open_on_timeout`` every key's final session is emitted,
    otherwise dropped, exactly mirroring the stream."""
    from ..helpers import ensure_event_time

    events = ensure_event_time(events, [ts_col])
    out_schema = (f"{key_col} {_key_sql_type(events, key_col)}, "
                  f"session_start timestamp, "
                  f"n_events long, sum_value double")
    state_schema = "start long, last long, n long, s double"
    gap_us = gap_ms * 1000

    if not events.isStreaming:
        from pyspark.sql.window import Window as W
        wk = W.partitionBy(key_col).orderBy(ts_col, value_col)
        us = F.unix_micros(F.col(ts_col))
        lag_us = F.unix_micros(F.lag(ts_col).over(wk))
        marked = events.withColumn(
            "__new_s",
            F.when(lag_us.isNull() | (us - lag_us >= gap_us), 1).otherwise(0))
        sid = marked.withColumn(
            "__sid", F.sum("__new_s").over(
                wk.rowsBetween(W.unboundedPreceding, W.currentRow)))
        sess = (sid.groupBy(key_col, "__sid")
                .agg(F.min(ts_col).alias("session_start"),
                     F.count(F.lit(1)).alias("n_events"),
                     F.sum(F.col(value_col).cast("double"))
                      .alias("sum_value")))
        if not emit_open_on_timeout:
            # the stream never closes a key's final session without a
            # timeout; mirror that by dropping the max-sid session
            last = W.partitionBy(key_col)
            sess = (sess.withColumn("__last", F.max("__sid").over(last))
                    .filter(F.col("__sid") != F.col("__last")))
        return sess.select(key_col, "session_start", "n_events", "sum_value")

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
            _set_event_timeout(state, (cur[1] + gap_us) // 1000)
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
