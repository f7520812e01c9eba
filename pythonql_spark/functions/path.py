"""XPath-style path steps over semi-structured data.

Reference semantics (Grammar.md path expressions; Executor.py:47-104
PQChildPath / PQDescPath):

* child step ``data ./ k``   — values under key ``k`` of the value
  itself (if an object) or of each object inside the value (if a
  list); ``_`` matches any key.
* descendants step ``data .// k`` — values under key ``k`` at ANY
  depth (objects inside lists included); ``_`` yields every value.

Spark mapping: both steps return an ``array<string>`` column (scalar
values raw, complex values JSON-encoded, same convention as DuckDB's
``json_extract_string`` for scalars); compose with ``F.explode`` for
the reference's iteration semantics (``for x in data ./ 'k'``).

For the common flat case ``json_child`` with a key on a JSON object
is also expressible as ``get_json_object(col, '$.k')`` — prefer that
in hot paths; these functions cover the general shape (wildcards,
arrays of objects, recursive walks) as Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import json
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _encode(v: Any) -> str:
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (dict, list)):
        return json.dumps(v, sort_keys=True)
    return json.dumps(v)


def _parse(v: Any) -> Any:
    if isinstance(v, str):
        try:
            return json.loads(v)
        except (ValueError, TypeError):
            return None
    if hasattr(v, "asDict"):
        return v.asDict(recursive=True)
    return v


def _flatten(x: Any):
    """Reference helpers.py:flatten — deep-flatten nested lists."""
    if isinstance(x, list):
        for i in x:
            yield from _flatten(i)
    else:
        yield x


def _child(obj: Any, key: str | None) -> list:
    out = []
    if isinstance(obj, list):
        for i in _flatten(obj):
            if isinstance(i, dict):
                for k, v in i.items():
                    if key is None or k == key:
                        out.append(v)
    elif isinstance(obj, dict):
        for k, v in obj.items():
            if key is None or k == key:
                out.append(v)
    return out


def _desc(obj: Any, key: str | None) -> list:
    """Pre-order (document-order) descendant walk — sequence order
    matters downstream (count clause, windows), so a stack-pop
    reversal would be observably wrong."""
    out = []

    def walk(o: Any):
        if isinstance(o, list):
            for i in _flatten(o):
                walk(i)
        elif isinstance(o, dict):
            for k, v in o.items():
                if key is None or k == key:
                    out.append(v)
                walk(v)

    walk(obj)
    return out


def _make_udf(step):
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def udf(col: pd.Series, key: pd.Series) -> pd.Series:
        ks = key.iloc[0] if len(key) else None
        k = None if ks in (None, "_") else ks
        return col.map(lambda v: [_encode(x) for x in step(_parse(v), k)])
    return udf


_child_udf = None
_desc_udf = None


def _make_sql_udf(step, seq: bool):
    """SQL-registrable variant: per-row keys (the grammar allows any
    string-valued expression as the step key) and, for ``seq=True``,
    an ``array<string>`` input so chained steps (``db ./ 'a' ./ 'b'``)
    apply to the previous step's sequence — reference semantics: a
    step over a sequence is the concatenation of the step over each
    element (Executor.py PQChildPath on list values)."""
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def udf(col: pd.Series, key: pd.Series) -> pd.Series:
        out = []
        for v, ks in zip(col, key):
            k = None if ks in (None, "_") else ks
            if seq:
                obj = [] if v is None else [_parse(x) for x in v]
            else:
                obj = _parse(v)
            out.append([_encode(x) for x in step(obj, k)])
        return pd.Series(out)
    return udf


import weakref

# WeakSet, not id()s: CPython reuses addresses after GC, so a raw-id
# set could mistake a brand-new session for an already-registered one
# and pql() path queries would fail with 'undefined function'
_registered_sessions: "weakref.WeakSet" = weakref.WeakSet()


def register_path_udfs(spark) -> None:
    """Make the path steps callable from SQL text (the ``pql()``
    string front-end compiles ``E ./ k`` → ``pql_child(E, k)`` and
    ``E .// k`` → ``pql_desc(E, k)``; chained steps use the ``_seq``
    variants over the previous step's array).  Idempotent per
    session."""
    if spark in _registered_sessions:
        return
    spark.udf.register("pql_child", _make_sql_udf(_child, False))
    spark.udf.register("pql_desc", _make_sql_udf(_desc, False))
    spark.udf.register("pql_child_seq", _make_sql_udf(_child, True))
    spark.udf.register("pql_desc_seq", _make_sql_udf(_desc, True))
    _registered_sessions.add(spark)


def json_child(col: str | Column, key: str | None = "_") -> Column:
    """``col ./ key`` — array of child values (``'_'``/None = any key)."""
    global _child_udf
    if _child_udf is None:
        _child_udf = _make_udf(_child)
    c = F.col(col) if isinstance(col, str) else col
    return _child_udf(c, F.lit(key if key is not None else "_"))


def json_descendants(col: str | Column, key: str | None = "_") -> Column:
    """``col .// key`` — array of descendant values at any depth."""
    global _desc_udf
    if _desc_udf is None:
        _desc_udf = _make_udf(_desc)
    c = F.col(col) if isinstance(col, str) else col
    return _desc_udf(c, F.lit(key if key is not None else "_"))
