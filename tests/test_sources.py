"""DeAL-convention source tests: CSV/TSV, % comments, blank lines, trims."""

import tempfile

from pyspark.sql import functions as F
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


# ------------------------------------------------------- multi-format sources


def test_register_parquet_file(spark, tmp_path):
    from bigdatalog_spark import BigDatalogContext

    p = str(tmp_path / "arc.parquet")
    spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "f integer, t integer"
    ).write.parquet(p)
    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({arc(F:integer, T:integer)})."
        "tc(A,B) <- arc(A,B). tc(A,B) <- tc(A,C), arc(C,B)."
    )
    ctx.register_file("arc", p)
    assert ctx.query("tc(A,B).").count() == 6


def test_register_json_file(spark, tmp_path):
    from bigdatalog_spark import BigDatalogContext

    p = str(tmp_path / "arc.json")
    # name-based format: keys must match the declared column names
    (tmp_path / "arc.json").write_text(
        '{"F": 0, "T": 1}\n{"F": 1, "T": 2}\n'
    )
    ctx = BigDatalogContext(spark)
    ctx.load_program("database({arc(F:integer, T:integer)}). out(A) <- arc(_, A).")
    ctx.register_file("arc", p)
    assert {r[0] for r in ctx.query("out(A).").collect()} == {1, 2}


def test_read_write_roundtrip_formats(spark, tmp_path):
    from bigdatalog_spark.sources.formats import read_table, write_table

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, v double"
    )
    for fmt in ("parquet", "orc", "json"):
        path = str(tmp_path / f"t_{fmt}")
        write_table(df, path, fmt)
        back = read_table(spark, path, fmt=fmt, schema=df.schema)
        assert sorted(tuple(r) for r in back.collect()) == sorted(
            tuple(r) for r in df.collect()
        )


def test_partitioned_parquet_prunes(spark, tmp_path):
    """partition_by output + a partition-key filter must prune at scan
    time (PartitionFilters in the physical plan)."""
    from bigdatalog_spark.sources.formats import read_table, write_table

    df = spark.range(100).selectExpr("id", "id % 4 AS part_key")
    path = str(tmp_path / "parts")
    write_table(df, path, "parquet", partition_by=["part_key"])
    back = read_table(spark, path).where("part_key = 2")
    assert back.count() == 25
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_write_file_size_and_clustering(spark, tmp_path):
    from bigdatalog_spark.sources.formats import read_table, write_table

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 10).alias("bucket")
    ).coalesce(1)
    path = str(tmp_path / "sized")
    write_table(
        df, path, "parquet", max_records_per_file=100, cluster_by=["id"]
    )
    import glob

    files = glob.glob(f"{path}/*.parquet")
    # 1000 rows in one task, capped at 100 rows/file -> 10 files
    assert len(files) == 10
    back = read_table(spark, path, fmt="parquet")
    assert back.count() == 1000
    assert back.agg(F.sum("id")).first()[0] == 499500


def test_ensure_min_parallelism_gate(spark):
    """Widen only when the scan is under cluster parallelism: a
    1-partition frame is repartitioned up, a well-partitioned frame
    passes through untouched (no shuffle added at scale)."""
    from bigdatalog_spark.session import ensure_min_parallelism

    par = spark.sparkContext.defaultParallelism
    one = spark.range(100).coalesce(1)
    wide = spark.range(100).repartition(par)
    assert ensure_min_parallelism(one).rdd.getNumPartitions() == par
    assert ensure_min_parallelism(wide) is wide
