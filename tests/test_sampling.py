"""Deterministic sampling / splitting / shuffling operator tests
(operators/sampling.py) and repetition quality signals
(functions/text.py repetition_stats)."""

import math

from pyspark.sql import functions as F

from bigdatalog_spark.functions.text import repetition_stats
from bigdatalog_spark.operators.sampling import (
    deterministic_shuffle,
    hash_split,
    mixture_sample,
    mixture_upsample,
    uniform_hash,
)


def _ids(spark, n=2000):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_uniform_hash_range_and_determinism(spark):
    df = _ids(spark).select(uniform_hash("doc_id", seed=5).alias("u"))
    rows = [r["u"] for r in df.collect()]
    assert all(0.0 <= u < 1.0 for u in rows)
    # deterministic across evaluations
    again = [r["u"] for r in df.collect()]
    assert rows == again
    # roughly uniform: mean near 0.5 on 2000 samples
    assert abs(sum(rows) / len(rows) - 0.5) < 0.03


def test_uniform_hash_seed_changes_assignment(spark):
    df = _ids(spark, 500).select(
        uniform_hash("doc_id", seed=1).alias("a"),
        uniform_hash("doc_id", seed=2).alias("b"),
    )
    same = df.where(F.col("a") == F.col("b")).count()
    assert same == 0  # 32-bit hashes over 500 ids: collisions ~0


def test_hash_split_proportions_and_stability(spark):
    df = hash_split(_ids(spark), {"train": 0.8, "val": 0.1, "test": 0.1}, seed=42)
    counts = {r["split"]: r["n"] for r in
              df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    # growing the corpus never moves an existing row's split
    small = {r["doc_id"]: r["split"] for r in
             hash_split(_ids(spark, 100), {"train": 0.8, "val": 0.1, "test": 0.1},
                        seed=42).collect()}
    big = {r["doc_id"]: r["split"] for r in df.collect()}
    assert all(big[k] == v for k, v in small.items())


def test_mixture_sample_rates(spark):
    df = _ids(spark, 4000).withColumn(
        "source",
        F.when(F.col("doc_id") % 2 == 0, "keep_all").otherwise("keep_tenth"),
    )
    out = mixture_sample(
        df, {"keep_all": 1.0, "keep_tenth": 0.1}, seed=0, default_rate=0.0
    )
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["keep_all"] == 2000
    assert abs(counts.get("keep_tenth", 0) / 2000 - 0.1) < 0.03


def test_mixture_sample_default_rate_zero_drops_unknown(spark):
    df = _ids(spark, 100).withColumn("source", F.lit("unknown"))
    assert mixture_sample(df, {"named": 1.0}, default_rate=0.0).count() == 0


def test_mixture_upsample_expected_multiplicity(spark):
    df = _ids(spark, 2000).withColumn("source", F.lit("hot"))
    out = mixture_upsample(df, {"hot": 2.5}, seed=4)
    per_doc = {r["doc_id"]: r["n"] for r in
               out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert len(per_doc) == 2000  # rate >= 1: every row kept
    assert set(per_doc.values()) <= {2, 3}
    total = sum(per_doc.values())
    assert abs(total / 2000 - 2.5) < 0.1  # expected multiplicity = rate
    # epoch indices are 0..n-1 per doc
    eps = out.where(F.col("doc_id") == min(per_doc)).select("epoch").collect()
    assert sorted(r["epoch"] for r in eps) == list(range(per_doc[min(per_doc)]))


def test_mixture_upsample_fractional_only(spark):
    df = _ids(spark, 2000).withColumn("source", F.lit("cold"))
    out = mixture_upsample(df, {"cold": 0.3}, seed=4)
    n = out.count()
    assert abs(n / 2000 - 0.3) < 0.05
    assert out.select(F.max("epoch")).first()[0] == 0


def test_deterministic_shuffle_is_stable_permutation(spark):
    df = _ids(spark, 1000)
    out = deterministic_shuffle(df, seed=9, num_partitions=4)
    a = [r["doc_id"] for r in out.collect()]
    b = [r["doc_id"] for r in out.collect()]
    assert a == b
    assert sorted(a) == list(range(1000))  # a permutation, nothing lost
    assert a != sorted(a)  # and actually shuffled
    # partitions are balanced (uniform keys through the range exchange)
    sizes = [
        r["n"] for r in out.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n")).collect()
    ]
    assert len(sizes) == 4 and max(sizes) < 2 * min(sizes)


def test_repetition_stats_flags_degenerate_text(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # one token repeated
            (2, "all words here are distinct"),  # no repetition
            (3, "one"),                          # single token: no bigrams
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[1]["n_tokens"] == 4 and out[1]["n_distinct_tokens"] == 1
    assert math.isclose(out[1]["dup_token_frac"], 0.75)
    assert math.isclose(out[1]["top_bigram_frac"], 1.0)  # 'spam spam' is every bigram
    assert out[2]["dup_token_frac"] == 0.0
    assert math.isclose(out[2]["top_bigram_frac"], 0.25)  # 4 distinct bigrams
    assert out[3]["top_bigram_frac"] == 0.0  # no bigrams at all


def test_stratified_sample_exact_count_and_determinism(spark):
    from bigdatalog_spark.operators.sampling import stratified_sample

    df = _ids(spark, 900).withColumn(
        "source", F.concat(F.lit("s"), (F.col("doc_id") % 3).cast("string"))
    )
    out = stratified_sample(df, 50, seed=2)
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per == {"s0": 50, "s1": 50, "s2": 50}
    # deterministic: same seed -> same ids; different seed -> different set
    a = {r["doc_id"] for r in stratified_sample(df, 50, seed=2).collect()}
    b = {r["doc_id"] for r in stratified_sample(df, 50, seed=3).collect()}
    assert a == {r["doc_id"] for r in out.collect()}
    assert a != b


def test_stratified_sample_small_group_kept_whole(spark):
    from bigdatalog_spark.operators.sampling import stratified_sample

    df = _ids(spark, 10).withColumn("source", F.lit("tiny"))
    assert stratified_sample(df, 50).count() == 10


def test_weighted_sample_biases_toward_heavy_rows(spark):
    from bigdatalog_spark.operators.sampling import weighted_sample

    # 100 heavy rows (w=50) among 900 light rows (w=1): a 100-row sample
    # should contain far more heavy rows than the 10% a uniform draw gives
    df = _ids(spark, 1000).withColumn(
        "w", F.when(F.col("doc_id") < 100, 50.0).otherwise(1.0)
    )
    out = weighted_sample(df, 100, "w", seed=5)
    assert out.count() == 100
    heavy = out.where(F.col("doc_id") < 100).count()
    assert heavy > 40  # ~10 expected if unweighted
    # deterministic
    a = {r["doc_id"] for r in weighted_sample(df, 100, "w", seed=5).collect()}
    assert a == {r["doc_id"] for r in out.collect()}


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from bigdatalog_spark.operators.sampling import weighted_sample

    df = _ids(spark, 50).withColumn(
        "w", F.when(F.col("doc_id") < 5, -1.0)
             .when(F.col("doc_id") < 10, 0.0).otherwise(1.0)
    )
    out = {r["doc_id"] for r in weighted_sample(df, 50, "w").collect()}
    assert out == set(range(10, 50))  # w<=0 rows never sampled
