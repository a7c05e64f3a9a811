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
