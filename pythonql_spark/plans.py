"""Plan diagnostics: inspect and gate the optimized physical plan.

The scale properties this engine claims (filters pushed to the scan,
columns pruned, small dims broadcast, partial aggregation before the
shuffle, no cartesian products, no row-at-a-time Python in the hot
path) are all VISIBLE in the formatted physical plan — and at 100 TB
the plan is the contract: a query that silently regresses from a
broadcast join to a cartesian product is a production incident, not a
style issue.  tests/test_plans.py asserts these shapes for the bundled
queries; this module exposes the same machinery as a public API so a
deployment can gate its OWN queries in CI the same way:

    from pythonql_spark.plans import assert_plan, plan_report
    assert_plan(df, max_exchanges=2, no_python_row_udf=True)
    print(plan_report(df))        # counts dict for dashboards/logs

Everything here reads ``df.queryExecution`` metadata only — nothing is
executed, so gating is free even for a 100 TB input.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# physical-plan node spellings (Spark 3.x/4.x "formatted" explain)
_PATTERNS = {
    "exchanges": r"\bExchange\b|\bShuffleExchange\b",
    "broadcast_exchanges": r"\bBroadcastExchange\b",
    "sort_merge_joins": r"\bSortMergeJoin\b",
    "broadcast_hash_joins": r"\bBroadcastHashJoin\b",
    "shuffled_hash_joins": r"\bShuffledHashJoin\b",
    "nested_loop_joins": r"\bBroadcastNestedLoopJoin\b",
    "cartesian_products": r"\bCartesianProduct\b",
    "window_group_limits": r"\bWindowGroupLimit\b",
    "python_arrow_evals": r"\bArrowEvalPython\b|\bMapInPandas\b|"
                          r"\bFlatMapGroupsInPandas\b",
    "python_row_evals": r"\bBatchEvalPython\b",
}


def formatted_plan(df: DataFrame) -> str:
    """The ``formatted``-mode explain string (same text ``df.explain(
    "formatted")`` prints), without executing anything."""
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))


def plan_report(df: DataFrame) -> dict:
    """Counts of the plan shapes that matter at scale, plus per-scan
    pushdown detail.  Keys:

    * node counts — ``exchanges`` (every shuffle), ``broadcast_
      exchanges``, ``sort_merge_joins``, ``broadcast_hash_joins``,
      ``shuffled_hash_joins``, ``nested_loop_joins``,
      ``cartesian_products``, ``window_group_limits``,
      ``python_arrow_evals`` (Arrow-batched pandas operators — the
      acceptable Python path) and ``python_row_evals`` (row-at-a-time
      Python UDFs — the 10-100× slow path; should be 0).  Note
      ``exchanges`` counts broadcast exchanges too — subtract
      ``broadcast_exchanges`` for data shuffles only.
    * ``codegen_spans`` — WholeStageCodegen subtrees.  Under AQE the
      markers only exist once the plan is FINALIZED, i.e. after an
      action has run on this exact DataFrame; before that the count
      reads 0 (plan inspection never triggers execution here).
    * ``scans`` — one entry per file scan: relation name, the pushed
      filter list and the read schema, i.e. whether predicate pushdown
      and column pruning actually reached the reader.
    """
    plan = formatted_plan(df)
    # formatted mode renders every node TWICE — once in the tree
    # ("+- Exchange (7)") and once in the numbered details
    # ("(7) Exchange") — so counting the whole text doubles every
    # figure; count nodes in the tree section only and parse scan
    # pushdown from the details section (where PushedFilters /
    # ReadSchema actually live)
    detail_start = re.search(r"^\(\d+\) ", plan, re.MULTILINE)
    tree = plan[:detail_start.start()] if detail_start else plan
    details = plan[detail_start.start():] if detail_start else plan
    out: dict = {name: len(re.findall(pat, tree))
                 for name, pat in _PATTERNS.items()}
    # codegen markers ("*(n) Op") live on the executed plan, which AQE
    # finalizes only after an action; reading it never executes anything
    executed = df._jdf.queryExecution().executedPlan().toString()
    out["codegen_spans"] = len(set(re.findall(r"\*\((\d+)\)", executed)))
    scans = []
    for m in re.finditer(
            r"Scan (\w+) ([^\n]*)", details):
        block_start = m.start()
        block = details[block_start:block_start + 2000]
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", block)
        schema = re.search(r"ReadSchema: struct<([^>]*)>", block)
        scans.append({
            "format": m.group(1),
            "pushed_filters": ([f.strip() for f in
                                pushed.group(1).split(",") if f.strip()]
                               if pushed else []),
            "read_columns": ([c.split(":")[0] for c in
                              schema.group(1).split(",") if c]
                             if schema else []),
        })
    out["scans"] = scans
    return out


class PlanAssertionError(AssertionError):
    """An assert_plan gate failed; the message carries the offending
    counts and the full formatted plan for debugging."""


def assert_plan(df: DataFrame, *,
                max_exchanges: int | None = None,
                no_cartesian: bool = True,
                no_nested_loop: bool = False,
                no_python_row_udf: bool = True,
                require_broadcast_joins: int = 0,
                require_window_group_limit: bool = False,
                max_read_columns: int | None = None) -> dict:
    """CI gate: raise :class:`PlanAssertionError` unless the plan
    satisfies the declared shape; returns the :func:`plan_report` on
    success so callers can log it.

    * ``max_exchanges`` — upper bound on DATA shuffles (broadcast
      exchanges excluded; they ship dims, not the corpus).
    * ``no_cartesian`` / ``no_nested_loop`` — forbid the quadratic
      join fallbacks (nested-loop is legitimate for broadcast-1-row
      cross joins, so it is opt-in).
    * ``no_python_row_udf`` — forbid ``BatchEvalPython`` (row-at-a-
      time Python; Arrow-batched pandas operators stay allowed).
    * ``require_broadcast_joins`` — at least this many broadcast hash
      joins (catches a dim silently falling back to sort-merge when
      its stats drift past the broadcast threshold).
    * ``require_window_group_limit`` — a top-k-per-group query must
      keep its partial-top-k pushdown.
    * ``max_read_columns`` — column-pruning bound across every scan.
    """
    rep = plan_report(df)
    errs = []
    data_exchanges = rep["exchanges"] - rep["broadcast_exchanges"]
    if max_exchanges is not None and data_exchanges > max_exchanges:
        errs.append(f"{data_exchanges} data shuffles > "
                    f"max_exchanges={max_exchanges}")
    if no_cartesian and rep["cartesian_products"]:
        errs.append(f"{rep['cartesian_products']} CartesianProduct")
    if no_nested_loop and rep["nested_loop_joins"]:
        errs.append(f"{rep['nested_loop_joins']} BroadcastNestedLoopJoin")
    if no_python_row_udf and rep["python_row_evals"]:
        errs.append(f"{rep['python_row_evals']} row-at-a-time Python "
                    "evals (BatchEvalPython)")
    if rep["broadcast_hash_joins"] < require_broadcast_joins:
        errs.append(f"only {rep['broadcast_hash_joins']} broadcast "
                    f"joins, need >= {require_broadcast_joins}")
    if require_window_group_limit and not rep["window_group_limits"]:
        errs.append("no WindowGroupLimit (partial top-k lost)")
    if max_read_columns is not None:
        for s in rep["scans"]:
            if len(s["read_columns"]) > max_read_columns:
                errs.append(f"scan reads {len(s['read_columns'])} cols "
                            f"({s['read_columns']}) > "
                            f"max_read_columns={max_read_columns}")
    if errs:
        raise PlanAssertionError(
            "; ".join(errs) + "\n--- plan ---\n" + formatted_plan(df))
    return rep
