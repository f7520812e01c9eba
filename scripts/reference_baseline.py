"""Measure the reference engine's single-node throughput against ours
on the same queries and the same data.

The reference (pythonql/pythonql) is a tuple-at-a-time generator
pipeline that evals compiled Python expressions per row
(Executor.py:119-638).  Its parser needs `ply` (not installed), but
the Executor itself is importable, and clause objects
(algebra/operators.py) take plain Python expression strings — so we
drive PyQuery directly with hand-built clause lists, exactly what its
preprocessor would emit.  Nothing is copied; the reference runs from
/root/reference.

Three queries both engines support:
  q1_groupby — TPC-H Q1 shape: filter lineitem, group by returnflag,
               sum quantity (matches our `group_agg`-lite).
  join_agg   — customer x orders equi-join, group by segment,
               count + sum (matches our `join_equi`).
  window_agg — the reference's SIGNATURE feature: per-user predicate
               windows over the event stream (tumbling, start at every
               50th event, close after 10), total window count + value
               sum.  The reference runs its Window clause per user
               sequence (Executor.py:568-638); ours runs the same
               semantics distributed (stateful_predicate_windows batch
               dispatch — sorted-run mapInPandas).  Both totals are
               asserted equal before timing is reported.

Run: python scripts/reference_baseline.py [sf ...]   (default 0.001 0.01)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, "/root/reference")

import duckdb


def _pq(sf_dir: str, table: str) -> str:
    """DuckDB-readable parquet path: the driver testdata is one file
    per table, the scaled race events are a Spark-written DIRECTORY
    (needs the glob form)."""
    p = Path(sf_dir) / f"{table}.parquet"
    return f"{p}/*.parquet" if p.is_dir() else str(p)


def load_rows(sf_dir: str, table: str, cols: list[str]) -> list:
    """Rows as namedtuples: the reference's Ast.py predates the
    Python 3.9 subscript AST change, so dict access inside query
    expressions breaks its rewriter — attribute access parses fine."""
    from collections import namedtuple
    Row = namedtuple(f"{table}_row", cols)
    sel = ", ".join(cols)
    rows = duckdb.sql(
        f"select {sel} from '{_pq(sf_dir, table)}'").fetchall()
    return [Row(*r) for r in rows]


def run_reference(sf_dir: str) -> dict[str, float]:
    from pythonql.Executor import PyQuery
    from pythonql.algebra.operators import For, GroupBy, Select, Where

    customer = load_rows(sf_dir, "customer",
                         ["c_custkey", "c_mktsegment"])
    orders = load_rows(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    env = {"customer": customer, "orders": orders}

    out: dict[str, float] = {}
    q1 = run_reference_groupby(sf_dir)    # ONE q1 definition for the
    out["q1_groupby"] = q1["t"]           # headline AND the scaled race
    out["q1_rows"] = len(q1["vals"])

    if len(customer) * len(orders) > 50_000_000:
        # the reference executes this as a nested loop (one eval'd
        # where-predicate per customer x order pair): 160s at sf0.01
        # already, quadratic beyond — skip instead of burning hours
        out["join_agg"] = float("nan")
        return out

    t0 = time.perf_counter()
    res = PyQuery(
        [For(["c"], False, "customer"),
         For(["o"], False, "orders"),
         Where("c.c_custkey == o.o_custkey "
               "and o.o_totalprice > 100000"),
         GroupBy([("c.c_mktsegment", "seg")]),
         Select("(seg, len(o), sum([x.o_totalprice for x in o]))")],
        env, env, "list")
    out["join_agg"] = time.perf_counter() - t0
    out["join_rows"] = len(res)
    return out


def run_reference_window(sf_dir: str) -> dict[str, float]:
    """The reference's Window clause per user: one (user, values)
    tuple per user (values in (ts, value) order — built OUTSIDE the
    timed region, same as parquet loading), tumbling windows that
    start at every 50th element and close after 10 elements."""
    from collections import namedtuple

    from pythonql.Executor import PyQuery
    from pythonql.algebra.operators import For, Select, Window

    # Falsy values are filtered on BOTH sides: the reference's
    # generate_triplets (Executor.py:560 `while nxt:`) stops at the
    # first falsy lookahead element, silently truncating any sequence
    # at a 0.0/None value — 6 zero-values at sf0.1 cost it 6 windows.
    # Filtering keeps the comparison apples-to-apples without tripping
    # that reference bug.
    rows = duckdb.sql(
        f"select user_id, value from '{_pq(sf_dir, 'events')}' "
        "where value is not null and value <> 0 "
        "order by user_id, ts, value").fetchall()
    seqs: dict[int, list[float]] = {}
    for uid, v in rows:
        seqs.setdefault(uid, []).append(v)
    U = namedtuple("U", ["user", "vals"])
    env = {"user_seqs": [U(u, vs) for u, vs in sorted(seqs.items())]}

    t0 = time.perf_counter()
    res = PyQuery(
        [For(["u"], False, "user_seqs"),
         Window("w", True, False, "u.vals",
                "sa % 50 == 0", "ea - sa == 9",
                {"var": "w", "s_at": "sa", "e_at": "ea"}),
         Select("(u.user, len(w), sum(w))")],
        env, env, "list")
    # drop trailing unclosed windows (len < 10) to mirror only_end=True
    n_windows = sum(1 for r in res if r[1] == 10)
    total = sum(r[2] for r in res if r[1] == 10)
    return {"window_agg": time.perf_counter() - t0,
            "window_n": n_windows, "window_sum": round(total, 6)}


def run_ours_window(sf_dir: str) -> dict[str, float]:
    from pyspark.sql import functions as F

    from pythonql_spark import get_spark
    from pythonql_spark.sources import load_table
    from pythonql_spark.streaming.stateful import stateful_predicate_windows

    spark = get_spark("ref-baseline")
    spark.sparkContext.setLogLevel("ERROR")

    def q():
        ev = load_table(spark, sf_dir, "events").filter(
            "value is not null and value <> 0")   # mirror reference filter
        w = stateful_predicate_windows(
            ev,
            start_when=lambda c, at, p, n: at % 50 == 0,
            end_when=lambda c, at, p, n, sc, sa: at - sa == 9,
            only_end=True)
        return w.agg(F.count(F.lit(1)).alias("n"),
                     F.sum("sum_value").alias("total"))

    q().collect()                         # warm the shape
    t0 = time.perf_counter()
    row = q().collect()[0]
    return {"window_agg": time.perf_counter() - t0,
            "window_n": int(row["n"]),
            "window_sum": round(float(row["total"]), 6)}


def run_reference_path(sf_dir: str) -> dict[str, float]:
    """The reference's path-step semantics (Executor.py:47-72
    PQChildPath, the `e ./ 'k'` engine): iterate events, yield the
    'k' child of each props object.  The props JSON is parsed OUTSIDE
    the timed region (the reference operates on Python objects; ours
    parses the JSON string per row inside the timed plan — a handicap
    we take, not give)."""
    import json as _json
    from collections import namedtuple

    from pythonql.Executor import PQChildPath, PyQuery
    from pythonql.algebra.operators import For, Select

    rows = duckdb.sql(
        f"select event_id, props from '{sf_dir}/events.parquet'"
    ).fetchall()
    E = namedtuple("E", ["event_id", "props"])
    env = {"events": [E(i, _json.loads(p)) for i, p in rows],
           "PQChildPath": PQChildPath}
    t0 = time.perf_counter()
    res = PyQuery(
        [For(["e"], False, "events"),
         For(["k"], False, "PQChildPath(e.props, \"'k'\", locals())"),
         Select("(e.event_id, k)")],
        env, env, "list")
    out = {"path_agg": time.perf_counter() - t0,
           "path_n": len(res),
           "path_sum": sum(int(r[1]) for r in res)}
    return out


def run_ours_path(sf_dir: str) -> dict[str, float]:
    from pyspark.sql import functions as F

    from pythonql_spark import get_spark
    from pythonql_spark.functions import json_child
    from pythonql_spark.sources import load_table

    spark = get_spark("ref-baseline")
    spark.sparkContext.setLogLevel("ERROR")

    def q():
        ev = load_table(spark, sf_dir, "events")
        return (ev.select("event_id",
                          F.explode(json_child("props", "k")).alias("k"))
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum(F.col("k").cast("long")).alias("s")))

    q().collect()                         # warm the shape
    t0 = time.perf_counter()
    row = q().collect()[0]
    return {"path_agg": time.perf_counter() - t0,
            "path_n": int(row["n"]), "path_sum": int(row["s"])}


def run_ours(sf_dir: str) -> dict[str, float]:
    from pyspark.sql import functions as F

    from pythonql_spark import Query, get_spark
    from pythonql_spark.sources import load_table

    spark = get_spark("ref-baseline")
    spark.sparkContext.setLogLevel("ERROR")

    def j():
        return (Query(spark)
                .for_("c", load_table(spark, sf_dir, "customer"))
                .for_("o", load_table(spark, sf_dir, "orders"))
                .where("c.c_custkey == o.o_custkey "
                       "and o.o_totalprice > 100000")
                .group_by("c.c_mktsegment as seg")
                .select("seg", "count(o) as n",
                        "sum(o.o_totalprice) as total").df())

    out: dict[str, float] = {}
    q1 = run_ours_groupby(sf_dir)         # ONE q1 definition for the
    out["q1_groupby"] = q1["t"]           # headline AND the scaled race
    out["q1_rows"] = len(q1["vals"])
    j().count()                           # warm the shape
    t0 = time.perf_counter()
    n = j().count()
    out["join_agg"] = time.perf_counter() - t0
    out["join_rows"] = n
    return out


def ensure_scaled_events(mult: int) -> str:
    """A sf-dir holding events at ``mult`` × sf0.1, derived by
    replicating the driver testdata with DISTINCT user ids per
    replica (windows are per-user, so the replication changes volume
    without changing any window's shape).  Both engines read the SAME
    written file — the derivation is race input, not an oracle."""
    out_dir = Path(f"/root/repo/.scratch/race_events_x{mult}")
    path = out_dir / "events.parquet"
    # _SUCCESS, not bare existence: a killed prior run leaves a
    # partial directory that would silently shrink the race corpus
    if not (path / "_SUCCESS").exists():
        from pyspark.sql import functions as F

        from pythonql_spark import get_spark
        from pythonql_spark.sources import load_table

        spark = get_spark("ref-baseline")
        spark.sparkContext.setLogLevel("ERROR")
        ev = load_table(spark, "/root/testdata/sf0.1", "events")
        r = spark.range(mult).withColumnRenamed("id", "rep")
        scaled = ev.crossJoin(F.broadcast(r)).selectExpr(
            "event_id + rep * 100000000 as event_id",
            "user_id + rep * 1000000 as user_id",
            "ts", "event_type", "value", "props")
        scaled.repartition(32).write.mode("overwrite") \
            .parquet(str(path))
    return str(out_dir)


def ensure_scaled_lineitem(mult: int) -> str:
    """lineitem at ``mult`` × sf0.1 by straight replication (group-by
    sums scale deterministically; both engines read the SAME file)."""
    out_dir = Path(f"/root/repo/.scratch/race_lineitem_x{mult}")
    path = out_dir / "lineitem.parquet"
    if not (path / "_SUCCESS").exists():
        from pyspark.sql import functions as F

        from pythonql_spark import get_spark
        from pythonql_spark.sources import load_table

        spark = get_spark("ref-baseline")
        spark.sparkContext.setLogLevel("ERROR")
        li = load_table(spark, "/root/testdata/sf0.1", "lineitem") \
            .select("l_returnflag", "l_quantity", "l_shipdate")
        r = spark.range(mult).withColumnRenamed("id", "rep")
        (li.crossJoin(F.broadcast(r)).drop("rep")
         .repartition(32).write.mode("overwrite").parquet(str(path)))
    return str(out_dir)


def ensure_genuine_lineitem(mult: int) -> str:
    """lineitem at ``mult`` x sf0.1 as GENUINELY bigger data, not
    replication: every derived row perturbs quantity (50 new distinct
    steps) and ships a different date (30 new distinct days per
    replica), and a deterministic ~1% slice is dropped per replica so
    no two replicas are row-identical.  This answers the "replication
    ≠ bigger data" objection: distinct-value counts grow with the
    corpus the way a real TPC-H sf-up does (q1's GROUP count staying
    tiny is TPC-H's own design — 3 flags at any sf).  Both engines
    read the SAME written file; per-flag sum parity is still asserted
    before timing."""
    out_dir = Path(f"/root/repo/.scratch/race_li_genuine_x{mult}")
    path = out_dir / "lineitem.parquet"
    if not (path / "_SUCCESS").exists():
        from pyspark.sql import functions as F

        from pythonql_spark import get_spark
        from pythonql_spark.sources import load_table

        spark = get_spark("ref-baseline")
        spark.sparkContext.setLogLevel("ERROR")
        li = load_table(spark, "/root/testdata/sf0.1", "lineitem") \
            .select("l_orderkey", "l_linenumber", "l_returnflag",
                    "l_quantity", "l_shipdate")
        r = spark.range(mult).withColumnRenamed("id", "rep")
        (li.crossJoin(F.broadcast(r))
         .filter("(l_orderkey + l_linenumber + rep) % 97 != 0")
         .selectExpr(
             "l_returnflag",
             "l_quantity + ((l_orderkey + rep) % 50) * 0.01"
             " as l_quantity",
             "l_shipdate - make_interval(0, 0, 0, cast(rep % 30 as"
             " int), 0, 0, 0) as l_shipdate")
         .repartition(32).write.mode("overwrite").parquet(str(path)))
    return str(out_dir)


def ensure_genuine_events(mult: int) -> str:
    """events at ``mult`` x sf0.1 as genuinely bigger data: distinct
    user spaces per replica (as the replication race) PLUS per-replica
    value jitter (new distinct values) and a deterministic ~1% event
    drop so every replica's per-user sequences differ in LENGTH — no
    two user sequences in the corpus are copies, so the per-user
    window walk does genuinely new work everywhere."""
    out_dir = Path(f"/root/repo/.scratch/race_ev_genuine_x{mult}")
    path = out_dir / "events.parquet"
    if not (path / "_SUCCESS").exists():
        from pyspark.sql import functions as F

        from pythonql_spark import get_spark
        from pythonql_spark.sources import load_table

        spark = get_spark("ref-baseline")
        spark.sparkContext.setLogLevel("ERROR")
        ev = load_table(spark, "/root/testdata/sf0.1", "events")
        r = spark.range(mult).withColumnRenamed("id", "rep")
        (ev.crossJoin(F.broadcast(r))
         .filter("(event_id + rep) % 101 != 0")
         .selectExpr(
             "event_id + rep * 100000000 as event_id",
             "user_id + rep * 1000000 as user_id",
             "ts", "event_type",
             "value + 0.000001 * ((event_id + rep) % 1000) as value",
             "props")
         .repartition(32).write.mode("overwrite").parquet(str(path)))
    return str(out_dir)


def run_reference_groupby(sf_dir: str) -> dict:
    import datetime

    from pythonql.Executor import PyQuery
    from pythonql.algebra.operators import For, GroupBy, Select, Where

    lineitem = load_rows(sf_dir, "lineitem",
                         ["l_returnflag", "l_quantity", "l_shipdate"])
    env = {"lineitem": lineitem,
           "cutoff": datetime.datetime(1998, 9, 2)}
    t0 = time.perf_counter()
    res = PyQuery(
        [For(["l"], False, "lineitem"),
         Where("l.l_shipdate <= cutoff"),
         GroupBy([("l.l_returnflag", "rf")]),
         Select("(rf, sum([x.l_quantity for x in l]))")],
        env, env, "list")
    dt = time.perf_counter() - t0
    return {"t": dt, "vals": {r[0]: round(float(r[1]), 2)
                              for r in res}}


def run_ours_groupby(sf_dir: str) -> dict:
    from pythonql_spark import Query, get_spark
    from pythonql_spark.sources import load_table

    spark = get_spark("ref-baseline")
    spark.sparkContext.setLogLevel("ERROR")

    def q():
        return (Query(spark)
                .for_("l", load_table(spark, sf_dir, "lineitem"))
                .where("l.l_shipdate <= timestamp'1998-09-02 00:00:00'")
                .group_by("l.l_returnflag as rf")
                .select("rf", "sum(l.l_quantity) as sum_qty").df())

    q().collect()                         # warm the shape
    t0 = time.perf_counter()
    rows = q().collect()
    dt = time.perf_counter() - t0
    return {"t": dt, "vals": {r.rf: round(float(r.sum_qty), 2)
                              for r in rows}}


def main_groupby_scale(mults: list[int]) -> None:
    """The q1-shape group-by race at mult × sf0.1 lineitem — value
    parity (per-flag quantity sums) asserted before timing."""
    for mult in mults:
        sf_dir = ensure_scaled_lineitem(mult)
        ref, ours = run_reference_groupby(sf_dir), run_ours_groupby(sf_dir)
        assert ref["vals"] == ours["vals"], (ref, ours)
        print(f"sf0.1x{mult:<3d} q1_groupby  reference="
              f"{ref['t']:8.2f}s ours={ours['t']:6.2f}s"
              f"  speedup={ref['t'] / ours['t']:7.1f}x"
              f"  (equal per-flag sums)", flush=True)


def main_window_scale(mults: list[int]) -> None:
    """The window_agg race at mult × sf0.1 (reference side is linear
    there; the distributed gap should widen the way group-by's does).
    Value parity asserted before timing, as everywhere."""
    for mult in mults:
        sf_dir = ensure_scaled_events(mult)
        refw, ourw = run_reference_window(sf_dir), run_ours_window(sf_dir)
        assert (refw["window_n"], refw["window_sum"]) == \
               (ourw["window_n"], ourw["window_sum"]), (refw, ourw)
        print(f"sf0.1x{mult:<3d} window_agg  reference="
              f"{refw['window_agg']:8.2f}s ours={ourw['window_agg']:6.2f}s"
              f"  speedup={refw['window_agg'] / ourw['window_agg']:7.1f}x"
              f"  ({refw['window_n']} windows, equal sums)", flush=True)


def main_genuine_scale(mults: list[int]) -> None:
    """The group-by AND window races on GENUINELY bigger data —
    x4 ~ sf0.4, x10 ~ sf1.0 in row volume, with distinct-value
    growth a real sf-up would have (see ensure_genuine_*).  Value
    parity asserted before timing, as everywhere."""
    for mult in mults:
        li_dir = ensure_genuine_lineitem(mult)
        ref, ours = run_reference_groupby(li_dir), run_ours_groupby(li_dir)
        assert ref["vals"] == ours["vals"], (ref, ours)
        print(f"genuine~sf{mult / 10:<4.1f} q1_groupby  reference="
              f"{ref['t']:8.2f}s ours={ours['t']:6.2f}s"
              f"  speedup={ref['t'] / ours['t']:7.1f}x"
              f"  (equal per-flag sums)", flush=True)
        ev_dir = ensure_genuine_events(mult)
        refw, ourw = run_reference_window(ev_dir), run_ours_window(ev_dir)
        # counts exactly; sums with a relative tolerance — on the
        # JITTERED corpora (non-representable low-order bits by
        # construction) Python's sequential total and Spark's
        # tree-merged total can legitimately differ in the last few
        # double bits, which round(·, 6) equality would flakily trip
        import math
        assert refw["window_n"] == ourw["window_n"] and math.isclose(
            refw["window_sum"], ourw["window_sum"], rel_tol=1e-9), \
            (refw, ourw)
        print(f"genuine~sf{mult / 10:<4.1f} window_agg  reference="
              f"{refw['window_agg']:8.2f}s ours={ourw['window_agg']:6.2f}s"
              f"  speedup={refw['window_agg'] / ourw['window_agg']:7.1f}x"
              f"  ({refw['window_n']} windows, equal sums)", flush=True)


def main() -> None:
    if sys.argv[1:2] == ["--window-scale"]:
        main_window_scale([int(a) for a in sys.argv[2:]] or [4, 10])
        return
    if sys.argv[1:2] == ["--groupby-scale"]:
        main_groupby_scale([int(a) for a in sys.argv[2:]] or [4, 10])
        return
    if sys.argv[1:2] == ["--genuine-scale"]:
        main_genuine_scale([int(a) for a in sys.argv[2:]] or [4, 10])
        return
    sfs = sys.argv[1:] or ["0.001", "0.01"]
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        ref = run_reference(sf_dir)
        ours = run_ours(sf_dir)
        refw, ourw = run_reference_window(sf_dir), run_ours_window(sf_dir)
        assert (refw["window_n"], refw["window_sum"]) == \
               (ourw["window_n"], ourw["window_sum"]), (refw, ourw)
        print(f"sf{sf:>5s} window_agg  reference="
              f"{refw['window_agg']:8.2f}s ours={ourw['window_agg']:6.2f}s"
              f"  speedup={refw['window_agg'] / ourw['window_agg']:7.1f}x"
              f"  ({refw['window_n']} windows, equal sums)", flush=True)
        refp, ourp = run_reference_path(sf_dir), run_ours_path(sf_dir)
        assert (refp["path_n"], refp["path_sum"]) == \
               (ourp["path_n"], ourp["path_sum"]), (refp, ourp)
        print(f"sf{sf:>5s} path_agg    reference="
              f"{refp['path_agg']:8.2f}s ours={ourp['path_agg']:6.2f}s"
              f"  speedup={refp['path_agg'] / ourp['path_agg']:7.1f}x"
              f"  ({refp['path_n']} child values, equal sums)", flush=True)
        for q in ("q1_groupby", "join_agg"):
            r, o = ref[q], ours[q]
            if r != r:                      # NaN: skipped as intractable
                print(f"sf{sf:>5s} {q:<11s} reference= skipped "
                      f"(nested loop intractable) ours={o:6.2f}s", flush=True)
            else:
                print(f"sf{sf:>5s} {q:<11s} reference={r:8.2f}s "
                      f"ours={o:6.2f}s  speedup={r / o:7.1f}x", flush=True)


if __name__ == "__main__":
    main()
