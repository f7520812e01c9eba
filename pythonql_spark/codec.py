"""``# coding: pythonql`` source codec — run reference-style .py
files whose query expressions are written INLINE (reference
codec/register.py:1-61 + parser/Preprocessor.py behavior).

The transform rewrites every ``[ select … ]`` expression in the
source into a call that compiles the query text through the
:func:`pythonql_spark.pql.pql` front-end against the enclosing
scope's variables, materializing a list:

    # coding: pythonql
    res = [ select (x, y)
            for x in range(1, 8)
            for y in range(1, 7)
            if x % 2 == 0 and y % 2 != 0 and x > y ]

Scope and honesty notes:

* every comprehension-shaped bracket (top-level ``for NAME in``)
  rewrites — including the reference's select-less ``[ (x, sum(y)
  as s) for … ]`` shorthand (parser/Preprocessor.py rewrites ANY
  inline query).  Nested query brackets stay verbatim inside the
  outer query text, where the pql() front-end compiles them.  The
  cost of reference parity: a *plain Python* list comprehension in a
  ``# coding: pythonql`` file is also treated as a query (exactly as
  the reference does), so its sources must be lists/ranges/
  DataFrames visible in the enclosing scope.
* ORDERING: the reference's tuple-at-a-time executor yields rows in
  nested-loop iteration order.  A distributed engine has no inherent
  row order, so without an ``order by`` the materialized list is
  returned in CANONICAL order (sorted by the output columns) — equal
  to iteration order for ascending sources (the tutorial shapes),
  documented as the deviation otherwise.  Queries with ``order by``
  keep exactly that order.
* single-column selects unwrap to bare values (reference semantics:
  ``sum([ select num for … ])`` must see numbers, not 1-tuples).
"""

from __future__ import annotations

import codecs
import encodings
import io
import re
from encodings import utf_8

from pythonql_spark import expr as X

_IMPORT = ("from pythonql_spark.codec import (__pql_list__, "
           "__pql_child__, __pql_desc__)\n")


def _mask(src: str) -> str:
    """Blank out comments and string literals (length-preserving) so
    bracket scanning never trips on them; handles ''' blocks."""
    out = []
    i, n = 0, len(src)
    while i < n:
        ch = src[i]
        if ch == "#":
            while i < n and src[i] != "\n":
                out.append(" ")
                i += 1
        elif ch in "'\"":
            q = src[i:i + 3] if src[i:i + 3] in ("'''", '"""') else ch
            out.append(" " * len(q))
            i += len(q)
            while i < n:
                if src[i] == "\\" and len(q) == 1:
                    out.append("  ")
                    i += 2
                    continue
                if src.startswith(q, i):
                    out.append(" " * len(q))
                    i += len(q)
                    break
                out.append(" " if src[i] != "\n" else "\n")
                i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _is_query_span(masked: str, s: int, t: int) -> bool:
    """Bracket content is a query iff it contains a top-level
    ``for NAME in`` (comprehension shape — reference parser/
    Preprocessor.py rewrites ANY such bracket, select-less shorthand
    included), or it starts with ``select`` and has a top-level
    ``match`` clause (match queries scan via ``as NAME in`` and have
    no ``for`` — reference tests/match_clause_test.py)."""
    content = masked[s + 1:t - 1]
    head_is_select = bool(re.match(r"\s*select\b", content))
    depth = 0
    for m in re.finditer(r"[()\[\]{}]|\bfor\s+[A-Za-z_]\w*\s+in\b"
                         r"|\bfor\s+(?:sliding|tumbling)\s+window\b"
                         r"|\bmatch\b", content):
        tok = m.group(0)
        if tok in "([{":
            depth += 1
        elif tok in ")]}":
            depth -= 1
        elif depth == 0:
            if tok == "match":
                if head_is_select:
                    return True
            else:
                # top-level `for NAME in` / `for sliding|tumbling window`
                return True
    return False


def transform_source(src: str) -> str:
    """Rewrite query-expression spans to __pql_list__ calls and
    prepend the runtime import (the reference preprocessor's shape).

    Only OUTERMOST query spans rewrite — a nested ``[ select … ]``
    stays verbatim inside the outer query text, where the pql()
    front-end compiles it (splicing inner spans with original-source
    offsets after an outer replacement would corrupt the output).
    Spans rewrite via ``repr(body)``, so bodies containing quotes of
    either kind stay valid Python."""
    masked = _mask(src)
    spans = []
    for m in re.finditer(r"\[", masked):
        if any(s < m.start() < t for s, t in spans):
            continue             # nested inside an outer query span
        before = masked[:m.start()].rstrip()
        if re.search(r"[\w)\]]$", before) and \
                not re.search(r"\b(in|if|else|and|or|not|return|yield"
                              r"|lambda|assert|while|from|import|del"
                              r"|raise|with|as|global|nonlocal|await"
                              r"|elif|is)$", before):
            continue             # subscript on a primary, not a literal
        depth, j = 1, m.end()
        while j < len(masked) and depth:
            depth += masked[j] == "["
            depth -= masked[j] == "]"
            j += 1
        if depth == 0 and _is_query_span(masked, m.start(), j):
            spans.append((m.start(), j))
    out = src
    for s, t in reversed(spans):
        body = src[s + 1:t - 1]
        out = (out[:s]
               + f"__pql_list__({body!r}, "
               f"locals(), globals())" + out[t:])
    # bare path steps OUTSIDE query brackets (the reference
    # preprocessor rewrites `./` / `.//` anywhere in the file) —
    # query bodies are repr'd string literals by now, so the masked
    # rewrite cannot touch them; pql() handles steps inside queries.
    # _mask (not strip_strings) so `# ./a/path` comments never scan
    # as steps; lenient=True so non-step `./` text is a no-op.
    from pythonql_spark.pql import _rewrite_path_steps
    rewritten = _rewrite_path_steps(out, child="__pql_child__",
                                    desc="__pql_desc__",
                                    seq_variants=False,
                                    mask_fn=_mask, lenient=True)
    changed = rewritten != out
    out = rewritten
    return _IMPORT + out if (spans or changed) else out


def _has_match_clause(text: str) -> bool:
    """True iff the query text has a TOP-LEVEL ``match`` clause —
    depth-aware like :func:`_is_query_span`, so ``re.match(...)`` in a
    projection or a variable named ``match(`` never counts (ADVICE r8:
    the old ``\\bmatch\\b`` grep json-decoded unrelated results)."""
    masked = X.strip_strings(text)
    depth = 0
    for m in re.finditer(r"[()\[\]{}]|\bmatch\b", masked):
        tok = m.group(0)
        if tok in "([{":
            depth += 1
        elif tok in ")]}":
            depth -= 1
        elif depth == 0:
            if m.start() > 0 and masked[m.start() - 1] == ".":
                continue          # attribute access (re.match)
            if masked[m.end():].lstrip().startswith("("):
                continue          # a call named match, not the clause
            return True
    return False


def __pql_list__(text: str, loc: dict, glob: dict) -> list:
    """Runtime for rewritten query expressions: compile via pql()
    against the caller's scope, materialize with the documented
    ordering, unwrap single-column selects.

    NOTE: codec-rewritten files are a FRONT-END CONVENIENCE mirroring
    the reference's list-returning executor — the result is collected
    to the driver because the reference returns Python lists and the
    canonical-order sort needs the rows.  This is not a pipeline
    surface: for real corpora use :func:`pythonql_spark.pql.pql` or
    the DSL, both of which return DataFrames."""
    from pythonql_spark.pql import pql
    from pythonql_spark.session import get_spark

    env = {**glob, **loc}
    df = pql(get_spark(), text, env=env)
    rows = df.collect()
    if not re.search(r"\border\s+by\b", X.strip_strings(text),
                     re.IGNORECASE):
        try:
            rows = sorted(rows, key=lambda r: tuple(
                (v is None, v) for v in r))
        except TypeError:
            pass   # non-orderable values (e.g. whole-journey arrays
            # with null-padded structs): keep engine order — the
            # canonical ordering is best-effort for such results
    if len(df.columns) == 1:
        vals = [r[0] for r in rows]
        if _has_match_clause(text):
            # a match bind selects the matched ELEMENT; the engine
            # carries it as a JSON string — hand the caller the dict
            # the reference returns (tests do res[0]['age'])
            import json as _json

            def _maybe(v):
                if isinstance(v, str) and v[:1] in "{[":
                    try:
                        return _json.loads(v)
                    except ValueError:
                        return v
                return v
            vals = [_maybe(v) for v in vals]
        return vals
    return rows


def __pql_child__(v, key):
    """Driver-local child step for BARE path expressions outside
    query brackets (reference preprocessor rewrites `./` anywhere in
    a pythonql-coded file; tutorial q8 asserts on `db./'region'`).
    Chained steps need no _seq variant here: the walker flattens list
    inputs, which IS the reference's step-over-a-sequence rule."""
    from pythonql_spark.functions.path import _child
    return _child(v, None if key == "_" else key)


def __pql_desc__(v, key):
    from pythonql_spark.functions.path import _desc
    return _desc(v, None if key == "_" else key)


def _decode(input, errors="strict"):
    return transform_source(bytes(input).decode("utf-8")), len(input)


class _IncrementalDecoder(utf_8.IncrementalDecoder):
    def decode(self, input, final=False):
        self.buffer += input
        if not final:
            return ""
        buff, self.buffer = self.buffer, b""
        return super().decode(
            transform_source(buff.decode("utf-8")).encode("utf-8"),
            final=True)


class _StreamReader(utf_8.StreamReader):
    def __init__(self, *args, **kwargs):
        codecs.StreamReader.__init__(self, *args, **kwargs)
        self.stream = io.StringIO(
            transform_source(self.stream.read().decode("utf-8")))


def _search(name: str):
    if name != "pythonql":
        return None
    utf8 = encodings.search_function("utf8")
    return codecs.CodecInfo(
        name="pythonql",
        encode=utf8.encode,
        decode=_decode,
        incrementalencoder=utf8.incrementalencoder,
        incrementaldecoder=_IncrementalDecoder,
        streamreader=_StreamReader,
        streamwriter=utf8.streamwriter)


codecs.register(_search)
