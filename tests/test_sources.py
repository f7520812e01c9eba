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
