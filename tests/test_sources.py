"""File sources: explicit-schema reads, malformed-row quarantine, and
collection sources (reference sources/*.py surface)."""

from pythonql_spark.sources import from_collection, read_files


def test_read_jsonl_quarantines_corrupt_rows(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        '{"doc_id": 2, "text": "ok"}\n'
        'THIS IS NOT JSON\n'
        '{"doc_id": {"nested": 3}, "text": "y"}\n')  # type mismatch
    schema = "doc_id long, text string, _bad string"
    df = read_files(spark, str(p), "json", schema, corrupt_col="_bad").cache()
    good = df.filter("_bad IS NULL")
    bad = df.filter("_bad IS NOT NULL")
    assert {r.doc_id for r in good.collect()} == {1, 2}
    assert bad.count() == 2  # the job survives and quarantines them


def test_read_csv_with_schema(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id,name\n1,a\n2,b\n")
    df = read_files(spark, str(p), "csv", "id long, name string",
                    header="true")
    assert sorted((r.id, r.name) for r in df.collect()) == [(1, "a"), (2, "b")]


def test_read_files_requires_schema_for_quarantine(spark, tmp_path):
    import pytest
    with pytest.raises(ValueError):
        read_files(spark, str(tmp_path), "json", corrupt_col="_bad")


def test_from_collection(spark):
    df = from_collection(spark, [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    assert df.count() == 2 and set(df.columns) == {"a", "b"}


def test_zorder_expr_interleaves(spark):
    from pythonql_spark.sources import zorder_expr
    # 2 cols, 2 bits each: (x=3,y=0) -> bits x1 x0 interleaved at even
    # positions = 0b0101 = 5; (x=0,y=3) -> odd positions = 0b1010 = 10
    e = zorder_expr(["x", "y"], {"x": (0, 4), "y": (0, 4)}, bits=2)
    df = spark.createDataFrame(
        [(3.999, 0.0), (0.0, 3.999), (3.999, 3.999)], "x double, y double")
    vals = [r[0] for r in df.selectExpr(e).collect()]
    assert vals == [5, 10, 15]


def test_write_zordered_narrows_file_ranges(spark, tables, tmp_path):
    """Every z-ordered output file must cover a SMALL rectangle of the
    2-D domain — that is what makes parquet min/max stats skip files
    for range predicates on either column."""
    from pyspark.sql import functions as F

    from pythonql_spark.sources import write_zordered
    o = tables["orders"]
    lo_c, hi_c = 0.0, 150.0
    lo_p, hi_p = 0.0, 500000.0
    out = str(tmp_path / "z")
    write_zordered(o, out, ["o_custkey", "o_totalprice"],
                   {"o_custkey": (lo_c, hi_c), "o_totalprice": (lo_p, hi_p)},
                   n_partitions=8)
    per_file = (spark.read.parquet(out)
                .groupBy(F.input_file_name().alias("f"))
                .agg((F.max("o_custkey") - F.min("o_custkey")).alias("sc"),
                     (F.max("o_totalprice") - F.min("o_totalprice")).alias("sp"))
                .agg(F.avg("sc").alias("sc"), F.avg("sp").alias("sp"),
                     F.count(F.lit(1)).alias("nf"))).first()
    assert per_file.nf >= 4
    # average file spans well under the full domain on BOTH dimensions
    assert per_file.sc < 0.75 * (hi_c - lo_c), per_file
    assert per_file.sp < 0.75 * (hi_p - lo_p), per_file
