"""PythonQL query-expression *string* front-end.

The reference embeds queries in Python source via a codec/preprocessor
(``#coding: pythonql`` → parser/Preprocessor.py).  Here the same query
surface is accepted as a plain string — near-verbatim reference syntax
(Grammar.md query_expression) — and compiled onto the ``Query`` DSL:

    res = pql(spark, '''
        select (x, sum(y) as sum)
        for x in xs, y in ys
        where x % 2 == 0 and y % 2 != 0 and x > y
        group by x
    ''', env={"xs": range(1, 8), "ys": range(1, 7)})

Clauses: select · for (incl. ``for sliding|tumbling window``) · let ·
where/if · count · group by · order by · match [exact].

Expression translation (Python → Spark SQL): ``**`` → power, ``is
[not] None`` → IS [NOT] NULL, ``try E except D`` → try_cast-based
fallback with ``int()``/``float()`` coercions.  Window ``when``
conditions and match ``where`` conditions are evaluated as Python
(same as the reference's eval-based executor) with the declared
window/bind variables in scope.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from pythonql_spark import expr as X
from pythonql_spark.query import Query, _split_as

# NB: clause-`if` (the reference's where synonym) must not swallow the
# SQL function call `if(cond, a, b)` — the lookahead rejects `if(`.
# (A bare Python ternary `x if c else y` still needs parentheses.)
_CLAUSE_RE = re.compile(
    r"\b(select|for|let|where|if(?!\s*\()|count|group\s+by|order\s+by"
    r"|match)\b",
    re.IGNORECASE)


class TableSeq:
    """Declares a DataFrame as a window-clause sequence source for
    ``pql()``: one logical sequence per ``partition_by`` key, ordered
    within the key by ``order_by``; the window variable binds to the
    single ``value`` column (default: the one column that is neither
    a key nor an ordering column).  This is the distributed form of
    the reference's window-over-a-sequence — the string syntax stays
    verbatim, the env carries the partitioning, and the clause
    dispatches to operators.window_clause.predicate_windows (per-key
    Arrow batches, never collected to the driver)."""

    def __init__(self, df: DataFrame, order_by, partition_by=None,
                 value: str | None = None):
        self.df = df
        self.order_by = ([order_by] if isinstance(order_by, str)
                         else list(order_by))
        self.partition_by = ([partition_by]
                             if isinstance(partition_by, str)
                             else list(partition_by or []))
        if value is None:
            rest = [c for c in df.columns
                    if c not in self.partition_by
                    and c not in self.order_by]
            if len(rest) != 1:
                raise ValueError(
                    f"value column ambiguous among {rest}; pass value=")
            value = rest[0]
        self.value = value


class AttrDict(dict):
    """Row dict with attribute access, so reference-style conditions
    like ``s.y % 2 == 1`` work on window elements."""
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def _attr(v):
    return AttrDict(v) if isinstance(v, dict) else v


# ------------------------------------------------------------- tokenizing

def _top_level_spans(s: str, pattern: re.Pattern) -> list[re.Match]:
    """Matches of ``pattern`` at paren/bracket/brace depth 0."""
    masked = X.strip_strings(s)
    out, depth = [], 0
    i = 0
    while i < len(masked):
        ch = masked[i]
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif depth == 0:
            m = pattern.match(masked, i)
            if m and (i == 0 or not masked[i - 1].isalnum() and masked[i - 1] != "_"):
                out.append(m)
                i = m.end()
                continue
        i += 1
    return out


def _split_top(s: str, sep: str = ",") -> list[str]:
    masked = X.strip_strings(s)
    parts, depth, last = [], 0, 0
    for i, ch in enumerate(masked):
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(s[last:i].strip())
            last = i + 1
    parts.append(s[last:].strip())
    return [p for p in parts if p]


def _clauses(q: str) -> list[tuple[str, str]]:
    """Split the query text into (keyword, body) clauses."""
    q = q.strip()
    ms = _top_level_spans(q, _CLAUSE_RE)
    if not ms:
        raise ValueError("no query clauses found")
    out = []
    for i, m in enumerate(ms):
        kw = re.sub(r"\s+", " ", m.group(1).lower())
        end = ms[i + 1].start() if i + 1 < len(ms) else len(q)
        out.append((kw, q[m.end():end].strip().rstrip(",")))
    return out


# ---------------------------------------------------------- translation

_STEP_RE = re.compile(r"\.//|\./")


def _is_float_dot(masked: str, pos: int) -> bool:
    """Is the ``.`` at ``pos`` part of a float literal like ``1./2``?
    (digit run before the dot that is itself not an identifier tail)"""
    j = pos
    while j > 0 and masked[j - 1].isdigit():
        j -= 1
    return j < pos and (j == 0 or not (masked[j - 1].isalnum()
                                       or masked[j - 1] == "_"))


def _rewrite_path_steps(e: str) -> str:
    """Reference path steps (Grammar.md: ``expr := old_expr
    (path_step)*``; ``path_step := './' old_expr | './/' old_expr``)
    → SQL calls on the registered step UDFs:

        db ./ 'region' ./ 'region'
          → pql_child_seq(pql_child(db, 'region'), 'region')

    The left operand is the longest trailing primary (identifier /
    attribute chain, optionally ending in a balanced call or index);
    the key is ``_`` (any-key wildcard, quoted through), a string
    literal, or an identifier chain.  Chained steps dispatch to the
    ``_seq`` variants, which walk the previous step's sequence
    (reference Executor.py path semantics over list values)."""
    while True:
        masked = X.strip_strings(e)
        m = None
        for cand in _STEP_RE.finditer(masked):
            if not _is_float_dot(masked, cand.start()):
                m = cand
                break
        if m is None:
            return e
        # ---- left operand: trailing primary ------------------------
        j = m.start()
        while j > 0 and e[j - 1] in " \t\n":
            j -= 1
        end_left = j
        while j > 0:
            c = masked[j - 1]
            if c in ")]":
                depth, j = 1, j - 1
                while j > 0 and depth:
                    if masked[j - 1] in ")]":
                        depth += 1
                    elif masked[j - 1] in "([":
                        depth -= 1
                    j -= 1
            elif c.isalnum() or c in "_.":
                j -= 1
            else:
                break
        start_left = j
        left = e[start_left:end_left].strip()
        if not left:
            raise ValueError(f"path step with no left operand: {e!r}")
        # ---- key operand (skip whitespace on e, not masked — masked
        # blanks string literals, which must stop the skip) ----------
        k = m.end()
        while k < len(e) and e[k] in " \t\n":
            k += 1
        key_start = k
        if k < len(e) and e[k] in "'\"":
            quote = e[k]
            k += 1
            while k < len(e) and e[k] != quote:
                k += 2 if e[k] == "\\" else 1
            k += 1
            key = e[key_start:k]
        elif k < len(e) and masked[k] == "_" and (
                k + 1 == len(masked) or not (masked[k + 1].isalnum()
                                             or masked[k + 1] == "_")):
            k += 1
            key = "'_'"
        else:
            mk = re.match(r"[A-Za-z_]\w*(?:\.\w+)*", masked[k:])
            if not mk:
                raise ValueError(f"bad path-step key near: {e[k:k+30]!r}")
            k += mk.end()
            key = e[key_start:k]
        fn = "pql_desc" if m.group(0) == ".//" else "pql_child"
        if re.match(r"pql_(child|desc)(_seq)?\(", left):
            fn += "_seq"          # previous step's output is an array
        e = e[:start_left] + f"{fn}({left}, {key})" + e[k:]


def _translate_py(e: str) -> str:
    """Python-isms → Spark SQL (beyond expr.translate)."""
    e = _rewrite_path_steps(e)
    # try E except D — preserve any text before `try`, keep the
    # wrapped cast's own type (str(x) must stay a string, not get
    # re-cast to double), and move unbalanced trailing parens out of
    # the default so `( try f(x) except 0 )` stays balanced
    m = re.search(r"\btry\b(.*?)\bexcept\b(.*)", X.strip_strings(e),
                  re.DOTALL)
    if m:
        prefix = e[:m.start()]
        body = e[m.start(1):m.end(1)].strip()
        default = e[m.start(2):m.end(2)].strip()
        suffix = ""
        # a trailing `as alias` belongs to the whole expression, not
        # the default value (anchor on the `as` token itself — a \s+
        # prefix would eat backwards through a masked string literal)
        ma = re.search(r"\bas\s+\w+\s*$", X.strip_strings(default))
        if ma and default[:ma.start()].strip():
            suffix = " " + default[ma.start():]
            default = default[:ma.start()].strip()
        depth = 0
        for i, ch in enumerate(X.strip_strings(default)):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth < 0:
                    suffix = default[i:] + suffix
                    default = default[:i].strip()
                    break
        coerced = _coerce_casts(body)
        if coerced != body:
            # the cast functions are now try_cast (NULL on failure):
            # coalesce directly, keeping each cast's own result type
            out = f"coalesce({coerced}, {default})"
        else:
            out = f"coalesce(try_cast(({coerced}) as double), {default})"
        e = prefix + out + suffix
    # x ** k → power(x, k)
    e = re.sub(r"(\w+(?:\.\w+)*|\([^()]*\))\s*\*\*\s*(\w+(?:\.\w+)*)",
               r"power(\1, \2)", e)
    return e


def _coerce_casts(e: str) -> str:
    """int(x) / float(x) inside a ``try`` body → try_cast (a plain
    cast would raise under ANSI before the outer handler sees it)."""
    for fn, t in (("int", "bigint"), ("float", "double"), ("str", "string")):
        while True:
            m = re.search(rf"\b{fn}\s*\(", e)
            if not m:
                break
            depth, i = 1, m.end()
            while i < len(e) and depth:
                depth += e[i] == "("
                depth -= e[i] == ")"
                i += 1
            inner = e[m.end():i - 1]
            e = e[:m.start()] + f"try_cast({inner} as {t})" + e[i:]
    return e


def _tuple_ctor(body: str) -> list[str]:
    """``(a, f(b) as n)`` → select expression list; bare expr passes
    through (single-column select)."""
    body = body.strip()
    if body.startswith("(") and body.endswith(")"):
        inner = body[1:-1]
        items = _split_top(inner)
        if len(items) > 1 or re.search(r"\bas\b", X.strip_strings(inner)):
            return [_translate_py(it) for it in items]
    return [_translate_py(body)]


# -------------------------------------------------------------- sources

def _sql_type(v) -> str:
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "bigint"
    if isinstance(v, float):
        return "double"
    return "string"


def _as_df(spark: SparkSession, val: Any, var: str,
           with_pos: bool = False) -> tuple[DataFrame | None, bool]:
    """(df, scalar?).  ``with_pos`` adds a ``__pos`` input-order column
    (window sources need the sequence order the reference iterates in;
    DataFrame sources carry their own ordering columns instead)."""
    if isinstance(val, DataFrame):
        return val, False
    if isinstance(val, Query):
        return val.df(), False
    if isinstance(val, range):
        val = list(val)
    if isinstance(val, (list, tuple)) and not len(val):
        # iterating an empty sequence yields zero rows (reference
        # semantics), not an unresolved-source error
        schema = (f"__pos bigint, {var} string" if with_pos
                  else f"{var} string")
        return spark.createDataFrame([], schema), True
    if isinstance(val, (list, tuple)) and len(val):
        first = val[0]
        if isinstance(first, dict) or hasattr(first, "_fields"):
            df = spark.createDataFrame(
                [{**(v if isinstance(v, dict) else v._asdict()), "__pos": i}
                 for i, v in enumerate(val)]) if with_pos \
                else spark.createDataFrame(list(val))
            return df, False
        if isinstance(first, (list, tuple)):
            return spark.createDataFrame(list(val)), False
        t = _sql_type(first)
        if with_pos:
            return spark.createDataFrame(
                [(i, v) for i, v in enumerate(val)],
                f"__pos bigint, {var} {t}"), True
        return spark.createDataFrame([(v,) for v in val], f"{var} {t}"), True
    return None, False


# ------------------------------------------------------------- windows

_WIN_RE = re.compile(
    r"^(sliding|tumbling)\s+window\s+(\w+)\s+in\s+(.*?)"
    r"\bstart\b(.*?)\bwhen\b(.*?)(?:(\bonly\b)?\s*\bend\b(.*?)\bwhen\b(.*))?$",
    re.IGNORECASE | re.DOTALL)

_WVARS_RE = re.compile(
    r"^\s*(\w+)?\s*(?:\bat\s+(\w+))?\s*(?:\bprevious\s+(\w+))?\s*"
    r"(?:\bfollowing\s+(\w+))?\s*$", re.IGNORECASE)


def _cond_fn(cond: str, names: dict[str, str]):
    """Compile a reference window ``when`` condition to a Python
    callable over (curr, at, prev, nxt[, s_curr, s_at])."""
    code = compile(cond.strip() or "True", "<pql-when>", "eval")

    def fn(*args):
        if len(args) == 4:
            curr, at, prev, nxt = args
            sc = sa = None
        else:
            curr, at, prev, nxt, sc, sa = args
        env = {}
        for role, name in names.items():
            if not name:
                continue
            env[name] = {"curr": _attr(curr), "at": at, "prev": _attr(prev),
                         "next": _attr(nxt), "s_curr": _attr(sc), "s_at": sa}[role]
        return bool(eval(code, {"__builtins__": {}}, env))
    return fn


# --------------------------------------------------------------- match

def _parse_match_pattern(src: str) -> tuple[dict, int]:
    """Parse ``{ "key" : spec, ... }`` starting at src[0]=='{'.
    spec: string/number literal | as NAME [where cond] | nested {}."""
    from pythonql_spark.operators.match_clause import Bind
    assert src[0] == "{"
    i, pat = 1, {}
    while True:
        while i < len(src) and src[i] in " \t\n,":
            i += 1
        if src[i] == "}":
            return pat, i + 1
        m = re.match(r'"((?:[^"\\]|\\.)*)"\s*:', src[i:])
        if not m:
            raise ValueError(f"bad match pattern near: {src[i:i+40]!r}")
        key = m.group(1)
        i += m.end()
        while src[i] in " \t\n":
            i += 1
        if src[i] == "{":
            sub, used = _parse_match_pattern(src[i:])
            pat[key] = sub
            i += used
        elif src[i:].lstrip().startswith("as "):
            m2 = re.match(r"\s*as\s+(\w+)\s*(?:\bwhere\b([^,}]*))?", src[i:])
            name, cond = m2.group(1), m2.group(2)
            if cond:
                code = compile(cond.strip(), "<pql-match>", "eval")
                pat[key] = Bind(name, where=lambda v, _c=code, _n=name:
                                bool(eval(_c, {"__builtins__": {}}, {_n: v})))
            else:
                pat[key] = Bind(name)
            i += m2.end()
        else:
            m3 = re.match(r'"((?:[^"\\]|\\.)*)"|(-?\d+\.?\d*)|\b(true|false)\b',
                          src[i:])
            if not m3:
                raise ValueError(f"bad match const near: {src[i:i+40]!r}")
            if m3.group(1) is not None:
                pat[key] = m3.group(1)
            elif m3.group(2) is not None:
                v = m3.group(2)
                pat[key] = float(v) if "." in v else int(v)
            else:
                pat[key] = m3.group(3) == "true"
            i += m3.end()


# ----------------------------------------------------------------- main

def _rewrite_seq_aggs(e: str, seq_vars: set[str]) -> str:
    """Aggregate calls over window-clause variables fold the array:
    ``sum(w)`` → aggregate(w, 0, +) etc. (reference evaluates Python
    ``sum`` over the materialized window list)."""
    folds = {
        "sum": "aggregate({v}, cast(0 as double), (acc, x) -> acc + x)",
        "len": "size({v})", "count": "size({v})",
        "min": "array_min({v})", "max": "array_max({v})",
        "avg": "(aggregate({v}, cast(0 as double), (acc, x) -> acc + x) / size({v}))",
    }
    for s, t, fn, inner in sorted(X.find_agg_spans(e), reverse=True):
        if inner in seq_vars and fn in folds:
            e = e[:s] + folds[fn].format(v=inner) + e[t:]
    return e


def pql(spark: SparkSession, query: str,
        env: dict[str, Any] | None = None) -> DataFrame:
    """Compile and run a PythonQL query-expression string; returns a
    DataFrame (use .collect()/.toPandas() for materialization).

    Also accepts a BARE path expression (reference tutorial q8:
    ``db ./ 'region' ./ 'region'``) — no clauses needed; returns a
    one-column (``value``) DataFrame of the step results in document
    order."""
    env = env or {}
    masked_q = X.strip_strings(query)
    has_steps = any(not _is_float_dot(masked_q, m.start())
                    for m in _STEP_RE.finditer(masked_q))
    if has_steps:
        from pythonql_spark.functions.path import register_path_udfs
        register_path_udfs(spark)
    try:
        clauses = _clauses(query)
    except ValueError:
        if has_steps:
            return _bare_path_expr(spark, query, env)
        raise
    q = Query(spark)
    select_body: str | None = None
    seq_vars: set[str] = set()   # window vars (array columns)

    def tr(e: str) -> str:
        return _rewrite_seq_aggs(_translate_py(e), seq_vars)

    for kw, body in clauses:
        if kw == "select":
            select_body = body
        elif kw == "for":
            wm = _WIN_RE.match(body.strip())
            if wm:
                seq_vars.add(_window_clause(spark, q, wm, env))
                continue
            for item in _split_top(body):
                m = re.match(r"^\(?([\w\s,]+?)\)?\s+in\s+(.*)$", item, re.DOTALL)
                if not m:
                    raise ValueError(f"bad for clause: {item!r}")
                var, src = m.group(1).strip(), m.group(2).strip()
                val = env.get(src)
                if val is None and re.fullmatch(r"range\([\d\s,+-]*\)", src):
                    val = eval(src, {"__builtins__": {}}, {"range": range})
                df, scalar = (_as_df(spark, val, var)
                              if val is not None else (None, False))
                if df is not None:
                    if "," in var:
                        names = [v.strip() for v in var.split(",")]
                        df = df.toDF(*names)
                        q.raw_for_(df)
                    else:
                        q.for_(var, df, scalar=scalar)
                else:
                    q.for_(var, tr(src))
        elif kw == "let":
            for item in _split_top(body):
                var, e = item.split("=", 1)
                q.let_(var.strip(), tr(e.strip()))
        elif kw in ("where", "if"):
            q.where(tr(body))
        elif kw == "count":
            q.count_(body.strip())
        elif kw == "group by":
            keys = []
            for item in _split_top(body):
                e, alias = _split_as(item)
                e = tr(e)
                keys.append(f"{e} as {alias}" if alias else e)
            q.group_by(*keys)
        elif kw == "order by":
            q.order_by(*[tr(s) for s in _split_top(body)])
        elif kw == "match":
            _match_clause(spark, q, body, env)
        else:
            raise ValueError(f"unsupported clause: {kw}")

    if select_body is None:
        raise ValueError("query must have a select clause")
    q.select(*[_rewrite_seq_aggs(e, seq_vars) for e in _tuple_ctor(select_body)])
    return q.df()


def _bare_path_expr(spark: SparkSession, query: str,
                    env: dict[str, Any]) -> DataFrame:
    """``db ./ 'k' .// 'k2'`` with no query clauses: the base names an
    env value (a Python list/sequence of JSON-like values, or a
    DataFrame whose FIRST column holds JSON text); each row's step
    results explode to one ``value`` row each, preserving document
    order within a row."""
    import json

    mb = re.match(r"\s*([A-Za-z_]\w*)", X.strip_strings(query))
    if not mb:
        raise ValueError(f"bad path expression: {query!r}")
    base = mb.group(1)
    if base not in env:
        raise ValueError(f"path base {base!r} not found in env")
    val = env[base]
    if isinstance(val, DataFrame):
        df, col = val, val.columns[0]
    else:
        df = spark.createDataFrame(
            [(v if isinstance(v, str) else json.dumps(v, sort_keys=True),)
             for v in val], "__v string")
        col = "__v"
    rewritten = _rewrite_path_steps(col + query[mb.end(1):])
    from pyspark.sql import functions as F
    return df.select(F.explode(F.expr(rewritten)).alias("value"))


def _window_clause(spark, q: Query, wm: re.Match, env) -> str:
    """Standalone window clause over an env-provided sequence.
    Returns the window variable name (an array column downstream)."""
    kind, wvar, src = wm.group(1).lower(), wm.group(2), wm.group(3).strip()
    s_vars, s_when = wm.group(4), wm.group(5)
    only = bool(wm.group(6))
    e_vars, e_when = wm.group(7), wm.group(8)

    sv = _WVARS_RE.match((s_vars or "").strip())
    s_names = {"curr": sv.group(1), "at": sv.group(2),
               "prev": sv.group(3), "next": sv.group(4)}
    start_fn = _cond_fn(s_when, s_names)

    end_fn, e_names = None, {}
    if e_when is not None:
        ev = _WVARS_RE.match((e_vars or "").strip())
        e_names = {"curr": ev.group(1), "at": ev.group(2),
                   "prev": ev.group(3), "next": ev.group(4),
                   "s_curr": s_names["curr"], "s_at": s_names["at"]}
        end_fn = _cond_fn(e_when, e_names)

    if src not in env:
        raise ValueError(f"window source {src!r} not found in env")
    from pythonql_spark.operators.window_clause import (fixed_windows,
                                                        predicate_windows)
    # count-based shape (`start … when True / end at e when e - s ==
    # K`) compiles to native JVM frames — the same fast path the
    # Query DSL picks; no Python in the plan (measured 4.9s → sub-1s
    # on the events table at sf0.1)
    size = None
    if e_when is not None and s_when.strip() in ("True", "true", "1"):
        mfix = re.match(r"^\s*(\w+)\s*-\s*(\w+)\s*==\s*(\d+)\s*$",
                        e_when.strip())
        if mfix and mfix.group(1) == e_names.get("at") \
                and mfix.group(2) == s_names.get("at"):
            size = int(mfix.group(3)) + 1
    if isinstance(env[src], TableSeq):
        # distributed sequence: per-key Arrow batches on executors —
        # the scale path (the local-sequence branch below is the
        # reference's bounded driver-side contract)
        ts = env[src]
        hidden = [c for c in ts.df.columns
                  if c not in ts.partition_by and c != ts.value]
        if size is not None:
            wdf = fixed_windows(ts.df, order_by=ts.order_by, size=size,
                                partition_by=ts.partition_by or None,
                                tumbling=(kind == "tumbling"),
                                only_full=only,
                                exclude_from_window=hidden)
        else:
            wdf = predicate_windows(ts.df, order_by=ts.order_by,
                                    partition_by=ts.partition_by or None,
                                    start_when=start_fn, end_when=end_fn,
                                    tumbling=(kind == "tumbling"),
                                    only_end=only,
                                    exclude_from_window=hidden)
        single, scalar = ts.value, True
    else:
        seq, scalar = _as_df(spark, env[src], "v", with_pos=True)
        if seq is None:
            raise ValueError(f"window source {src!r} is empty or unsupported")
        if "__pos" not in seq.columns:
            # windows walk a SEQUENCE; a DataFrame has no inherent order
            # (monotonically_increasing_id depends on partition layout —
            # nondeterministic window contents after any shuffle); pass
            # a TableSeq(df, order_by=..., partition_by=...) instead
            raise ValueError(
                f"window source {src!r} is a DataFrame without a __pos "
                "order column; wrap it in pql.TableSeq (distributed, "
                "per-key) or pass a Python sequence")
        if size is not None:
            wdf = fixed_windows(seq, order_by="__pos", size=size,
                                tumbling=(kind == "tumbling"),
                                only_full=only,
                                exclude_from_window=["__pos"])
        else:
            wdf = predicate_windows(seq, order_by="__pos",
                                    start_when=start_fn, end_when=end_fn,
                                    tumbling=(kind == "tumbling"),
                                    only_end=only,
                                    exclude_from_window=["__pos"])
        value_cols = [c for c in seq.columns if c != "__pos"]
        single = value_cols[0] if len(value_cols) == 1 else None
    from pyspark.sql import functions as F
    if single and scalar:
        wdf = wdf.withColumn("window", F.expr(f"transform(window, x -> x.{single})"))
    wdf = wdf.withColumnRenamed("window", wvar)
    if s_names["curr"]:
        wdf = wdf.withColumn(s_names["curr"], F.expr(f"{wvar}[0]"))
    if s_names["at"]:
        wdf = wdf.withColumnRenamed("s_at", s_names["at"])
    if e_names.get("curr"):
        wdf = wdf.withColumn(e_names["curr"], F.expr(f"element_at({wvar}, -1)"))
    if e_names.get("at"):
        wdf = wdf.withColumnRenamed("e_at", e_names["at"])
    q.raw_for_(wdf)
    return wvar


def _match_clause(spark, q: Query, body: str, env) -> None:
    from pythonql_spark.operators.match_clause import match_pattern
    m = re.match(r"^(exact\s+)?(\{.*\})\s*(?:as\s+(\w+)\s+)?in\s+(\w+)\s*$",
                 body.strip(), re.DOTALL)
    if not m:
        raise ValueError(f"bad match clause: {body[:60]!r}")
    exact, pat_src, parent, src = (bool(m.group(1)), m.group(2),
                                   m.group(3), m.group(4))
    pattern, _ = _parse_match_pattern(pat_src.strip())
    val = env[src]
    if not isinstance(val, DataFrame):
        import json
        val = spark.createDataFrame(
            [(json.dumps(v, sort_keys=True),) for v in val],
            f"{parent or 'z'} string")
        matched = match_pattern(val, val.columns[0], pattern, exact=exact)
    else:
        # `as NAME` binds the matched parent value for DataFrame
        # sources too (it is the column name for list sources above)
        matched = match_pattern(val, val.columns[0], pattern,
                                exact=exact, bind_parent=parent)
    q.raw_for_(matched)
