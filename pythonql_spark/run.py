"""Command-line runner for PythonQL query files.

Parity with the reference's ``RunPYQL.py`` (RunPYQL.py:10-36:
preprocess a PythonQL program file, exec it, report parse/exec time).
Here a file holds one query expression in reference Grammar.md syntax;
the scale-factor directory's tables (region nation customer supplier
part orders lineitem events documents embeddings) are pre-bound as
query variables, and compile/execution times are reported the same
way.

Usage::

    python -m pythonql_spark.run query.pql [--sf-dir DIR] [-n ROWS]
    echo "select (o.o_orderkey as k) for o in orders" | \\
        python -m pythonql_spark.run - --sf-dir /root/testdata/sf0.001
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(
        prog="pythonql_spark.run",
        description="Run a PythonQL query file on Spark")
    ap.add_argument("file", help="query file, or - for stdin")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                    help="parquet table directory to bind as the env")
    ap.add_argument("-n", "--rows", type=int, default=20,
                    help="max result rows to print")
    args = ap.parse_args(argv)

    query = sys.stdin.read() if args.file == "-" else \
        open(args.file, encoding="utf-8").read()

    from pythonql_spark import get_spark
    from pythonql_spark.pql import pql
    from pythonql_spark.sources import load_sf

    spark = get_spark("pythonql-run")
    spark.sparkContext.setLogLevel("ERROR")
    env = load_sf(spark, args.sf_dir)

    t0 = time.time()
    df = pql(spark, query, env)
    t1 = time.time()
    df.show(args.rows, truncate=False)
    t2 = time.time()
    print("----Time: compile=%.3f(s), execution=%.3f(s)"
          % (t1 - t0, t2 - t1))


if __name__ == "__main__":
    main()
