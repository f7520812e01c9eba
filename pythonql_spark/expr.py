"""Expression analysis for the query compiler.

The reference analyzes clause expressions as Python ASTs
(``pythonql/Ast.py``: get_all_vars; ``pythonql/Rewriter.py``:
is_join_cond) to detect join conditions and variable usage. We do the
same over Spark-SQL expression strings: split conjunctions, find
variable references, classify equi-join conditions, and locate
aggregate-call spans so group-by can choose native partial
aggregation over collect_list.

All helpers operate on strings and never evaluate anything.
"""

from __future__ import annotations

import re

AGG_FNS = ("sum", "count", "avg", "min", "max", "len", "list", "count_distinct",
           "stddev", "variance", "first", "last", "collect_set",
           "min_by", "max_by", "any_value", "median", "mode",
           "percentile", "percentile_approx", "approx_count_distinct")

# Spark-native name for parity aliases the reference allows in clause
# expressions (Python builtins over grouped lists).
AGG_NATIVE = {"len": "count", "list": "collect_list"}


def strip_strings(e: str) -> str:
    """Blank out quoted literals (preserving length) for analysis."""
    out = []
    i, n = 0, len(e)
    while i < n:
        ch = e[i]
        if ch in ("'", '"'):
            q = ch
            out.append(" ")
            i += 1
            while i < n:
                if e[i] == "\\":
                    out.append("  ")
                    i += 2
                    continue
                if e[i] == q:
                    out.append(" ")
                    i += 1
                    break
                out.append(" ")
                i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def split_conjuncts(e: str) -> list[str]:
    """Split on top-level ``and``/``AND`` (outside parens/strings)."""
    masked = strip_strings(e)
    parts, depth, last = [], 0, 0
    pending_between = 0  # the AND of "x BETWEEN a AND b" is not a conjunction
    for m in re.finditer(r"[()\[\]]|\bbetween\b|\band\b", masked, flags=re.IGNORECASE):
        tok = m.group(0).lower()
        if tok in "([":
            depth += 1
        elif tok in ")]":
            depth -= 1
        elif tok == "between":
            if depth == 0:
                pending_between += 1
        elif depth == 0:
            if pending_between:
                pending_between -= 1
            else:
                parts.append(e[last:m.start()].strip())
                last = m.end()
    parts.append(e[last:].strip())
    return [p for p in parts if p]


def referenced_vars(e: str, candidates: set[str]) -> set[str]:
    """Which of ``candidates`` appear as bare identifiers (or with a
    ``.field`` path) in ``e``?  Quoted strings are ignored."""
    masked = strip_strings(e)
    found = set()
    for m in re.finditer(r"[A-Za-z_][A-Za-z0-9_]*", masked):
        name = m.group(0)
        if name in candidates and (m.start() == 0 or masked[m.start() - 1] != "."):
            found.add(name)
    return found


def translate(e: str) -> str:
    """Light Python → Spark-SQL surface translation so reference-style
    expressions work: ``is None``/``is not None`` → IS [NOT] NULL,
    bare ``None`` → NULL.  (``==``, ``!=``, ``and/or/not``, True/False
    are already valid Spark SQL.)"""
    masked = strip_strings(e)
    out = e
    # work right-to-left so spans stay valid
    subs = []
    for m in re.finditer(r"\bis\s+not\s+None\b", masked):
        subs.append((m.start(), m.end(), "IS NOT NULL"))
    for m in re.finditer(r"\bis\s+None\b", masked):
        subs.append((m.start(), m.end(), "IS NULL"))
    for m in re.finditer(r"\bNone\b", masked):
        if not any(s <= m.start() < t for s, t, _ in subs):
            subs.append((m.start(), m.end(), "NULL"))
    for s, t, rep in sorted(subs, reverse=True):
        out = out[:s] + rep + out[t:]
    return out


def equi_cond_sides(conjunct: str) -> tuple[str, str] | None:
    """If ``conjunct`` is a single top-level equality ``a == b`` /
    ``a = b``, return (a, b); else None.  Mirrors
    Rewriter.is_join_cond (reference Rewriter.py:19-26)."""
    masked = strip_strings(conjunct)
    depth = 0
    for m in re.finditer(r"[()\[\]]|==|!=|<=|>=|<>|[<>=]", masked):
        tok = m.group(0)
        if tok in "([":
            depth += 1
        elif tok in ")]":
            depth -= 1
        elif depth == 0:
            if tok in ("==", "="):
                left = conjunct[:m.start()].strip()
                right = conjunct[m.end():].strip()
                # make sure the right side has no further top-level comparison
                if equi_cond_sides_rhs_clean(right):
                    return (left, right) if left and right else None
                return None
            else:
                return None
    return None


def equi_cond_sides_rhs_clean(rhs: str) -> bool:
    masked = strip_strings(rhs)
    depth = 0
    for m in re.finditer(r"[()\[\]]|==|!=|<=|>=|<>|[<>=]", masked):
        tok = m.group(0)
        if tok in "([":
            depth += 1
        elif tok in ")]":
            depth -= 1
        elif depth == 0:
            return False
    return True


def find_agg_spans(e: str) -> list[tuple[int, int, str, str]]:
    """Find aggregate-call spans ``fn( inner )`` with balanced parens.

    Returns [(start, end, fn, inner)] for fn in AGG_FNS, skipping
    calls nested inside another aggregate call.
    """
    masked = strip_strings(e)
    spans = []
    for m in re.finditer(r"\b(%s)\s*\(" % "|".join(AGG_FNS), masked):
        fn = m.group(1)
        # skip if inside an already-found span
        if any(s <= m.start() < t for s, t, _, _ in spans):
            continue
        depth = 1
        i = m.end()
        while i < len(masked) and depth:
            if masked[i] in "(":
                depth += 1
            elif masked[i] == ")":
                depth -= 1
            i += 1
        if depth == 0:
            spans.append((m.start(), i, fn, e[m.end():i - 1].strip()))
    return spans
