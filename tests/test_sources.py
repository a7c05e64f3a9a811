"""DeAL-convention source tests: CSV/TSV, % comments, blank lines, trims."""

import tempfile

from pyspark.sql import types as T

from bigdatalog_spark.sources.csv import dataframe_from_lines, read_deal_table

SCHEMA = T.StructType([
    T.StructField("a", T.IntegerType(), True),
    T.StructField("b", T.StringType(), True),
])


def test_lines_with_comments_and_blanks(spark):
    df = dataframe_from_lines(
        spark, ["1, x", "", "% comment", "2, y "], SCHEMA
    )
    assert {(r["a"], r["b"]) for r in df.collect()} == {(1, "x"), (2, "y")}


def test_csv_file_comma_sep(spark):
    with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as fh:
        fh.write("1,x\n% comment line\n\n2,y\n")
        path = fh.name
    df = read_deal_table(spark, path, SCHEMA)
    assert {(r["a"], r["b"]) for r in df.collect()} == {(1, "x"), (2, "y")}


def test_non_csv_extension_uses_tabs(spark):
    with tempfile.NamedTemporaryFile("w", suffix=".tsv", delete=False) as fh:
        fh.write("1\tx\n2\ty\n")
        path = fh.name
    df = read_deal_table(spark, path, SCHEMA)
    assert {(r["a"], r["b"]) for r in df.collect()} == {(1, "x"), (2, "y")}


def test_date_parsing(spark):
    import datetime as dt

    schema = T.StructType([
        T.StructField("id", T.IntegerType(), True),
        T.StructField("d", T.DateType(), True),
    ])
    df = dataframe_from_lines(spark, ["1, 2010-12-01"], schema)
    assert df.first()["d"] == dt.date(2010, 12, 1)
