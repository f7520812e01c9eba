"""Match clause: declarative pattern matching over semi-structured
values (reference Executor.py:316-388 processMatchClause /
match_pattern; tests/match_clause_test.py).

Pattern spec (nested dict), per key:
* literal            — constant condition (``"first": "daniela"``)
* ``Bind("x")``      — bind the value to an output column ``x``
* ``Bind("y", where=fn)`` — bind + per-value predicate (Python)
* nested dict        — descend into a sub-object

``exact=True`` rejects objects with keys outside the pattern (at each
nesting level), mirroring ``match exact``.  ``bind_parent`` binds the
whole matched object.

Execution: Arrow-batched ``mapInPandas`` walking parsed JSON (or
already-dict values).  Bound columns come back as strings (scalar
values raw, complex values JSON-encoded) — cast downstream as needed.
A struct-typed fast path stays JVM-side for flat patterns with no
``where`` callables.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class Bind:
    name: str
    where: Callable[[Any], bool] | None = None


def _pattern_binds(pattern: dict) -> list[str]:
    out = []
    for v in pattern.values():
        if isinstance(v, Bind):
            out.append(v.name)
        elif isinstance(v, dict):
            out.extend(_pattern_binds(v))
    return out


def _match(obj: Any, pattern: dict, exact: bool, binds: dict) -> bool:
    if not isinstance(obj, dict):
        return False
    if exact and any(k not in pattern for k in obj):
        return False
    for k, spec in pattern.items():
        if k not in obj:
            return False
        v = obj[k]
        if isinstance(spec, Bind):
            if spec.where is not None and not spec.where(v):
                return False
            binds[spec.name] = v
        elif isinstance(spec, dict):
            if not _match(v, spec, exact, binds):
                return False
        else:
            if v != spec:
                return False
    return True


def _encode(v: Any) -> str | None:
    if v is None:
        return None
    if isinstance(v, str):
        return v
    if isinstance(v, (dict, list)):
        return json.dumps(v, sort_keys=True)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def match_pattern(df: DataFrame, col: str, pattern: dict, *,
                  exact: bool = False,
                  bind_parent: str | None = None) -> DataFrame:
    """Keep rows whose ``col`` (JSON string or struct/map value)
    matches ``pattern``; append bound variables as string columns."""
    bind_names = _pattern_binds(pattern)
    if bind_parent:
        bind_names = bind_names + [bind_parent]

    fast = _struct_fast_path(df, col, pattern, exact, bind_parent)
    if fast is not None:
        return fast

    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(b, T.StringType()) for b in bind_names]
    )
    names = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep, extra = [], {b: [] for b in bind_names}
            for v in pdf[col]:
                obj = v
                if isinstance(v, str):
                    try:
                        obj = json.loads(v)
                    except (ValueError, TypeError):
                        obj = None
                elif hasattr(obj, "asDict"):
                    obj = obj.asDict(recursive=True)
                binds: dict = {}
                ok = isinstance(obj, dict) and _match(obj, pattern, exact, binds)
                keep.append(ok)
                if ok:
                    if bind_parent:
                        binds[bind_parent] = obj
                    for b in bind_names:
                        extra[b].append(_encode(binds.get(b)))
            res = pdf[keep].reset_index(drop=True)
            for b in bind_names:
                res[b] = pd.Series(extra[b], dtype="object")
            yield res[names + bind_names]

    return df.mapInPandas(run, out_schema)


def _struct_fast_path(df, col, pattern, exact, bind_parent):
    """Flat pattern over a StructType column with no ``where``
    callables → pure Column expressions (whole-stage codegen)."""
    field = next((f for f in df.schema.fields if f.name == col), None)
    if field is None or not isinstance(field.dataType, T.StructType):
        return None
    if exact or bind_parent:
        return None  # exact key-set checks need the dynamic walker
    cond: Column = F.lit(True)
    binds: list[tuple[str, Column]] = []
    for k, spec in pattern.items():
        if k not in field.dataType.fieldNames():
            return None
        c = F.col(f"{col}.{k}")
        if isinstance(spec, Bind):
            if spec.where is not None:
                return None
            # no isNotNull: the dynamic walker binds a PRESENT key
            # whose value is null (JSON '{"k": null}' matches with
            # x = None) — a struct field is always present, so the
            # same logical data must match here too
            binds.append((spec.name, c.cast("string")))
        elif isinstance(spec, dict):
            return None  # nested → dynamic walker
        else:
            cond = cond & (c == F.lit(spec))
    out = df.filter(cond)
    for name, c in binds:
        out = out.withColumn(name, c)
    return out
