"""Predicate-driven sliding / tumbling windows.

Reference semantics (Executor.py:568-638 processWindowClause +
Grammar.md `window`): scan an ordered sequence; open a window when
``start_when`` holds (tumbling: only if no window is open); every open
window absorbs each element; close it when ``end_when`` holds; with
``only_end`` unclosed windows are dropped, otherwise they are emitted
at end-of-sequence.  Start/end conditions see the current element, its
index, and its neighbours (the reference's s_curr/s_at/s_prev/s_next
and e_* variables).

Spark-first shape: the sequence is a DataFrame partitioned by
``partition_by`` (one logical sequence per key — e.g. one per user)
and ordered by ``order_by`` within the key.  Each key's sequence is
processed in one Arrow batch via ``applyInPandas`` — distributed
across executors by key, never collected to the driver.  For a single
global sequence pass ``partition_by=None`` (all rows flow to one
task; fine for bounded sequences, document the skew).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _norm_key(v):
    """NaN/NaT → None so null partition keys compare equal (NaN != NaN
    would splinter null-keyed rows into singleton groups).  Non-scalar
    key values (arrays) pass through untouched."""
    try:
        return None if pd.isna(v) else v
    except (TypeError, ValueError):
        return v


def predicate_windows(
    df: DataFrame,
    order_by: str | list[str],
    start_when: Callable,
    end_when: Callable | None = None,
    *,
    partition_by: str | list[str] | None = None,
    tumbling: bool = False,
    only_end: bool = False,
    exclude_from_window: list[str] | None = None,
) -> DataFrame:
    """Returns one row per window: partition keys, ``window`` (array of
    structs of the non-partition columns, in order), ``s_at``/``e_at``
    (0-based indexes into the key's sequence) and ``closed``.

    ``start_when(curr, at, prev, nxt)`` and
    ``end_when(curr, at, prev, nxt, s_curr, s_at)`` receive dict rows
    (or the bare value if the sequence has a single value column).
    """
    part = [partition_by] if isinstance(partition_by, str) else (partition_by or [])
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    hidden = set(exclude_from_window or [])

    value_fields = [f for f in df.schema.fields
                    if f.name not in part and f.name not in hidden]
    value_names = [f.name for f in value_fields]
    single = value_names[0] if len(value_names) == 1 else None

    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name in part]
        + [
            T.StructField("window", T.ArrayType(T.StructType(value_fields))),
            T.StructField("s_at", T.LongType()),
            T.StructField("e_at", T.LongType()),
            T.StructField("closed", T.BooleanType()),
        ]
    )

    def run(pdf: pd.DataFrame, presorted: bool = False) -> pd.DataFrame:
        if not presorted:
            pdf = pdf.sort_values(order, kind="mergesort")
        keys = {k: pdf.iloc[0][k] for k in part} if part else {}
        rows = pdf[value_names].to_dict("records")
        vals = [r[single] if single else r for r in rows]
        n = len(vals)
        out = []
        open_ws: list[dict] = []
        for i in range(n):
            prev = vals[i - 1] if i > 0 else None
            nxt = vals[i + 1] if i + 1 < n else None
            if not tumbling or not open_ws:
                if start_when(vals[i], i, prev, nxt):
                    open_ws.append({"rows": [], "s_at": i, "s_curr": vals[i]})
            still = []
            for w in open_ws:
                w["rows"].append(rows[i])
                if end_when and end_when(vals[i], i, prev, nxt,
                                         w["s_curr"], w["s_at"]):
                    out.append({**keys, "window": w["rows"],
                                "s_at": w["s_at"], "e_at": i, "closed": True})
                else:
                    still.append(w)
            open_ws = still
        if not only_end:
            for w in open_ws:
                out.append({**keys, "window": w["rows"],
                            "s_at": w["s_at"], "e_at": n - 1, "closed": False})
        return pd.DataFrame(out, columns=[*part, "window", "s_at", "e_at", "closed"])

    if part:
        # Batch dispatch, not per-key applyInPandas: FlatMapGroupsInPandas
        # ships ONE Arrow batch per key — ruinous at high key cardinality
        # (a no-op over 1500 keys costs ~4 s at sf0.1; see
        # streaming/stateful.py where this was first measured).  Instead
        # repartition+sort by key and walk sorted runs inside mapInPandas:
        # one Arrow transfer per core, one output frame per partition.  A
        # key's rows arrive contiguously but may span Arrow batches, so
        # the current key buffers across the boundary.
        out_cols = [*part, "window", "s_at", "e_at", "closed"]
        # Yield incrementally (every ~_FLUSH_ROWS output rows) so peak
        # worker memory is bounded by the largest single key plus one
        # flush buffer, not the whole partition's output.
        _FLUSH_ROWS = 1 << 14

        def gen(batches):
            pending: list[pd.DataFrame] = []
            pending_rows = 0
            buf: list[pd.DataFrame] = []
            buf_key = None

            def flush():
                nonlocal pending_rows
                if buf:
                    pdf = (pd.concat(buf, ignore_index=True)
                           if len(buf) > 1 else buf[0])
                    res = run(pdf, presorted=True)
                    if len(res):
                        pending.append(res)
                        pending_rows += len(res)

            def drain():
                nonlocal pending_rows
                if pending:
                    out = (pd.concat(pending, ignore_index=True)
                           if len(pending) > 1 else pending[0])
                    pending.clear()
                    pending_rows = 0
                    yield out[out_cols]

            for pdf in batches:
                if not len(pdf):
                    continue
                # Null partition keys: NaN != NaN would splinter every
                # null-keyed row into its own group — normalise to None
                # so nulls group together (matching groupBy semantics).
                keys = [tuple(_norm_key(v) for v in row)
                        for row in
                        pdf[part].itertuples(index=False, name=None)]
                start = 0
                for i in range(1, len(keys) + 1):
                    if i == len(keys) or keys[i] != keys[start]:
                        chunk = pdf.iloc[start:i]
                        if buf_key is not None and keys[start] == buf_key:
                            buf.append(chunk)
                        else:
                            flush()
                            if pending_rows >= _FLUSH_ROWS:
                                yield from drain()
                            buf, buf_key = [chunk], keys[start]
                        start = i
            flush()
            yield from drain()

        return (df.repartition(*part)
                .sortWithinPartitions(*part, *order)
                .mapInPandas(gen, out_schema))
    # single global sequence: one group (bounded-size sequences only)
    return (df.withColumn("__g", F.lit(1)).groupBy("__g")
            .applyInPandas(lambda pdf: run(pdf.drop(columns="__g")), out_schema))


def fixed_windows(
    df: DataFrame,
    order_by: str | list[str],
    size: int,
    *,
    partition_by: str | list[str] | None = None,
    tumbling: bool = False,
    only_full: bool = True,
    exclude_from_window: list[str] | None = None,
) -> DataFrame:
    """Count-based sliding/tumbling windows — the fixed-size special
    case of :func:`predicate_windows` (start_when=True, end at
    ``size`` rows), compiled to native JVM window frames instead of a
    per-row Python loop: collect_list over ROWS BETWEEN CURRENT AND
    size-1 FOLLOWING, whole plan stays codegen-side.  ~10× faster and
    the path the Query DSL picks when the window clause is
    count-based.  Same output schema as predicate_windows:
    (partition keys, window, s_at, e_at, closed)."""
    from pyspark.sql.window import Window as W

    part = [partition_by] if isinstance(partition_by, str) else (partition_by or [])
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    hidden = set(exclude_from_window or [])
    value_names = [f.name for f in df.schema.fields
                   if f.name not in part and f.name not in hidden]

    base = (W.partitionBy(*part) if part else W.partitionBy()) \
        .orderBy(*[F.col(c) for c in order])
    frame = base.rowsBetween(W.currentRow, size - 1)
    out = (df
           .withColumn("s_at", (F.row_number().over(base) - 1).cast("long"))
           .withColumn("window",
                       F.collect_list(F.struct(*value_names)).over(frame)))
    if tumbling:
        out = out.filter(F.col("s_at") % size == 0)
    out = (out
           .withColumn("closed", F.size("window") == size)
           .withColumn("e_at", (F.col("s_at") + F.size("window") - 1).cast("long")))
    if only_full:
        out = out.filter(F.col("closed"))
    return out.select(*part, "window", "s_at", "e_at", "closed")
