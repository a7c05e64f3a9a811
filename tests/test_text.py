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


def test_subword_token_count_runs(spark):
    from bigdatalog_spark.functions.text import subword_token_count

    df = spark.createDataFrame(
        [(1, "don't stop!"), (2, "abc123 x"), (3, ""), (4, "   ")],
        ["id", "t"],
    )
    got = {
        r["id"]: r["n"]
        for r in df.select("id", subword_token_count("t").alias("n")).collect()
    }
    # don't stop! -> don ' t stop !  = 5 runs; abc123 x -> abc 123 x = 3
    assert got == {1: 5, 2: 3, 3: 0, 4: 0}


def test_tfidf_top_terms_ranking(spark):
    from bigdatalog_spark.functions.text import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "banana cherry common"),
            (3, "cherry cherry cherry common"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(df, k=2)
    rows = {(r["doc_id"], r["rank"]): (r["term"], r["tf"]) for r in out.collect()}
    # every doc contributes exactly k rows
    assert len(rows) == 6
    # doc 1: 'apple' (tf 2, df 1) outranks everything else
    assert rows[(1, 1)] == ("apple", 2)
    # doc 3: 'cherry' tf 3 dominates; 'common' (df 3 -> lowest idf) is
    # never rank 1 anywhere
    assert rows[(3, 1)] == ("cherry", 3)
    assert all(term != "common" for (d, rk), (term, _) in rows.items() if rk == 1)


def test_winnowing_fingerprints_guarantee(spark):
    """Docs sharing a substring >= k+window-1 chars MUST share a
    fingerprint (the winnowing guarantee); disjoint docs share none;
    empty/short docs emit nothing."""
    from bigdatalog_spark.functions.text import winnowing_fingerprints

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words here instead now"),
            (3, "XX the quick brown fox jumps over the lazy dog YY"),
            (4, ""),
            (5, "ab"),
        ],
        ["doc_id", "text"],
    )
    rows = winnowing_fingerprints(df, k=5, window=4).collect()
    by = {}
    for r in rows:
        by.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by[1] & by[3]          # shared substring -> shared fingerprint
    assert not (by[1] & by[2])    # disjoint content -> disjoint fps
    assert 4 not in by and 5 not in by
