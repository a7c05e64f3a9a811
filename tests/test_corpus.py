"""Corpus-preparation operator tests: sequence packing, PII stats/redaction,
benchmark decontamination."""

from pyspark.sql import functions as F

from bigdatalog_spark.operators.corpus import (
    decontaminate,
    pack_sequences,
    pii_stats,
    redact_pii,
)


def test_pack_sequences_offsets(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, "f g h i"), (4, "j")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["start_off"], r["pack_id"])
        for r in pack_sequences(docs, budget=4).collect()
    }
    # cumulative starts: 0, 3, 5, 9 -> packs 0, 0, 1, 2
    assert out == {1: (0, 0), 2: (3, 0), 3: (5, 1), 4: (9, 2)}


def test_pack_sequences_sharded_independent(spark):
    docs = spark.createDataFrame(
        [(i, "w " * 10) for i in range(8)], ["doc_id", "text"]
    )
    out = pack_sequences(
        docs, budget=100, shard_col=(F.col("doc_id") % 2)
    ).collect()
    # each shard packs from offset 0 independently
    per_shard_starts = {}
    for r in out:
        per_shard_starts.setdefault(r["shard"], []).append(r["start_off"])
    for starts in per_shard_starts.values():
        assert min(starts) == 0


def test_pii_stats_and_redact(spark):
    docs = spark.createDataFrame(
        [
            (1, "contact me at alice@example.com or +1-555-123-4567"),
            (2, "no pii here"),
        ],
        ["doc_id", "text"],
    )
    stats = {r["doc_id"]: (r["n_emails"], r["n_phones"], r["has_pii"])
             for r in pii_stats(docs).collect()}
    assert stats[1] == (1, 1, True)
    assert stats[2] == (0, 0, False)

    red = redact_pii(docs).where(F.col("doc_id") == 1).first()["text"]
    assert "<EMAIL>" in red and "<PHONE>" in red
    assert "example.com" not in red and "4567" not in red


def test_decontaminate_flags_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps high"),
            (11, "completely unrelated words entirely"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(1, "the quick brown fox runs")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r["n_overlap"]
           for r in decontaminate(corpus, bench).collect()}
    # doc 10 shares 'the quick brown' and 'quick brown fox'; doc 11 clean
    assert out == {10: 2}


def test_chunk_documents_overlap_and_bounds(spark):
    from bigdatalog_spark.operators.corpus import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, words), (2, "a b c")], ["doc_id", "text"]
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap=2)
    rows = {(r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
            for r in out.collect()}
    # doc 1: 10 tokens, step 2 -> chunks at 0,2,4,6 -> 1+ceil(6/2)=4 chunks
    assert {k for k in rows if k[0] == 1} == {(1, i) for i in range(4)}
    assert rows[(1, 0)] == ("w0 w1 w2 w3", 4)
    assert rows[(1, 1)] == ("w2 w3 w4 w5", 4)   # 2-token overlap
    assert rows[(1, 3)] == ("w6 w7 w8 w9", 4)   # last chunk exactly ends
    # doc 2 fits one chunk, short tail kept
    assert rows[(2, 0)] == ("a b c", 3)


def test_chunk_documents_every_token_covered(spark):
    from bigdatalog_spark.operators.corpus import chunk_documents

    words = " ".join(f"t{i}" for i in range(57))
    docs = spark.createDataFrame([(1, words)], ["doc_id", "text"])
    out = chunk_documents(docs, chunk_tokens=16, overlap=4).collect()
    covered = set()
    for r in out:
        covered.update(r["chunk_text"].split(" "))
    assert covered == {f"t{i}" for i in range(57)}


def test_chunk_documents_empty_text_emits_no_chunks(spark):
    from bigdatalog_spark.operators.corpus import chunk_documents

    docs = spark.createDataFrame(
        [(1, ""), (2, "   \t  "), (3, "real doc")], ["doc_id", "text"]
    )
    rows = chunk_documents(docs, chunk_tokens=4, overlap=2).collect()
    # empty / whitespace-only docs contribute ZERO chunks (split('') would
    # otherwise phantom a ''-token); token accounting stays exact
    assert {r["doc_id"] for r in rows} == {3}
    (r,) = rows
    assert (r["chunk_text"], r["n_tokens"]) == ("real doc", 2)


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    from bigdatalog_spark.operators.corpus import chunk_documents

    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_chunk_documents_rejects_negative_overlap(spark):
    import pytest

    from bigdatalog_spark.operators.corpus import chunk_documents

    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=-2)


def test_dedup_chunks_removes_cross_doc_boilerplate(spark):
    from bigdatalog_spark.operators.corpus import dedup_chunks

    boiler = "click here to subscribe"  # 4 words = one chunk at chunk_words=4
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} alpha beta gamma delta"),
            (2, f"epsilon zeta eta theta {boiler}"),
            (3, f"iota kappa lam mu {boiler}"),
            (4, "nu xi omicron pi rho sigma tau upsilon"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["text_clean"], r["n_chunks"], r["n_removed"])
        for r in dedup_chunks(docs, chunk_words=4, max_docs=2).collect()
    }
    # boiler occurs in 3 docs > max_docs=2 -> stripped everywhere, in order
    assert out[1] == ("alpha beta gamma delta", 2, 1)
    assert out[2] == ("epsilon zeta eta theta", 2, 1)
    assert out[3] == ("iota kappa lam mu", 2, 1)
    assert out[4] == ("nu xi omicron pi rho sigma tau upsilon", 2, 0)


def test_dedup_chunks_fully_boilerplate_doc_survives_empty(spark):
    from bigdatalog_spark.operators.corpus import dedup_chunks

    docs = spark.createDataFrame(
        [(i, "spam spam spam spam") for i in range(1, 5)]
        + [(9, "unique words only here")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["text_clean"], r["n_removed"])
        for r in dedup_chunks(docs, chunk_words=4, max_docs=2).collect()
    }
    for i in range(1, 5):
        assert out[i] == ("", 1)
    assert out[9] == ("unique words only here", 0)


def test_dedup_chunks_partial_trailing_chunk_counted(spark):
    from bigdatalog_spark.operators.corpus import dedup_chunks

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "solo")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: (r["text_clean"], r["n_chunks"])
        for r in dedup_chunks(docs, chunk_words=3, max_docs=1).collect()
    }
    # 7 words at chunk_words=3 -> chunks "a b c","d e f","g"
    assert out[1] == ("a b c d e f g", 3)
    assert out[2] == ("solo", 1)


def test_dedup_chunks_null_text_gets_empty_chunk_semantics(spark):
    """NULL text must not poison n_chunks/n_removed (F.size(NULL) = -1
    would make sequence(0,-2) blow up or yield NULL counts): NULL is
    coalesced to '' -> one empty chunk, n_chunks=1, n_removed=0."""
    from pyspark.sql import types as T

    from bigdatalog_spark.operators.corpus import dedup_chunks

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    docs = spark.createDataFrame(
        [(1, None), (2, "alpha beta gamma delta")], schema
    )
    out = {
        r["doc_id"]: (r["text_clean"], r["n_chunks"], r["n_removed"])
        for r in dedup_chunks(docs, chunk_words=4, max_docs=2).collect()
    }
    assert out[1] == ("", 1, 0)
    assert out[2] == ("alpha beta gamma delta", 1, 0)
