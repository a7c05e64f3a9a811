"""Text-analysis operator tests over the driver testdata documents table."""

from pyspark.sql import functions as F

from bigdatalog_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    text_profile,
    token_count,
)

SF = "/root/testdata/sf0.001"


def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_token_count_matches_python(spark):
    rows = (
        docs(spark)
        .select("doc_id", "text", token_count("text").alias("n"))
        .limit(20)
        .collect()
    )
    for r in rows:
        assert r["n"] == len(r["text"].strip().split()), r


def test_fingerprint_detects_identical_text(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different doc")],
        ["doc_id", "text"],
    )
    fps = df.select("doc_id", fingerprint("text").alias("fp")).collect()
    by_id = {r["doc_id"]: r["fp"] for r in fps}
    # normalization: case + whitespace folding
    assert by_id[1] == by_id[2]
    assert by_id[1] != by_id[3]


def test_quality_score_bounds(spark):
    vals = [
        r["q"]
        for r in docs(spark).select(quality_score("text").alias("q")).collect()
    ]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_lang_id_deterministic_and_total(spark):
    out = docs(spark).select(lang_id("text").alias("lang")).distinct().collect()
    langs = {r["lang"] for r in out}
    assert langs <= {"en", "de", "fr", "es", "zh", "und"}


def test_text_profile_schema_and_rowcount(spark):
    d = docs(spark)
    prof = text_profile(d)
    assert prof.count() == d.count()
    assert set(prof.columns) == {
        "doc_id", "n_chars_computed", "n_tokens", "punct_ratio",
        "stopword_ratio", "quality", "lang_pred", "fp",
    }
