"""Deduplication operator tests: exact, n-gram Jaccard, MinHash LSH,
SimHash, embedding cosine."""

from pyspark.sql import functions as F

from bigdatalog_spark.operators.dedup import (
    embedding_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    word_shingles,
)

SF = "/root/testdata/sf0.001"


def _dupdocs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    near = "the quick brown fox jumps over the lazy dog again and again now"
    other = "completely different content about spark query engines at scale"
    return spark.createDataFrame(
        [(1, base), (2, base.upper()), (3, near), (4, other)],
        ["doc_id", "text"],
    )


def test_exact_dedup_keeps_min_id(spark):
    out = exact_dedup(_dupdocs(spark)).select("doc_id").collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [1, 3, 4]  # 2 is a case-variant of 1


def test_word_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    out = {r["shingle"] for r in word_shingles(df, n=3).collect()}
    assert out == {"a b c", "b c d"}


def test_ngram_jaccard_pairs(spark):
    pairs = ngram_jaccard_pairs(_dupdocs(spark), threshold=0.5).collect()
    got = {(r["left_id"], r["right_id"]) for r in pairs}
    # 1-2 identical after normalization (jaccard 1.0); 1-3 and 2-3 near
    assert (1, 2) in got
    assert (1, 3) in got
    assert all(p[1] != 4 and p[0] != 4 for p in got)


def test_minhash_lsh_recall_on_near_dups(spark):
    exact = {
        (r["left_id"], r["right_id"])
        for r in ngram_jaccard_pairs(_dupdocs(spark), threshold=0.8).collect()
    }
    lsh = {
        (r["left_id"], r["right_id"])
        for r in minhash_lsh_pairs(_dupdocs(spark), threshold=0.8).collect()
    }
    # verified LSH output must equal the exact pairs at this tiny scale
    assert lsh == exact
    assert (1, 2) in lsh


def test_simhash_identical_distance_zero(spark):
    pairs = simhash_pairs(_dupdocs(spark), max_hamming=3).collect()
    got = {(r["left_id"], r["right_id"]): r["hamming"] for r in pairs}
    assert got[(1, 2)] == 0  # identical after lowercase normalization


def test_simhash_portable_hash_matches_xxhash_structure(spark):
    # portable md5 hash finds the same identical-after-normalization pair
    # (hamming 0) and never pairs the unrelated doc; md5-derived values are
    # the DuckDB-reproducible path the driver oracle checks
    pairs = simhash_pairs(
        _dupdocs(spark), max_hamming=3, hash_fn="portable_md5"
    ).collect()
    got = {(r["left_id"], r["right_id"]): r["hamming"] for r in pairs}
    assert got[(1, 2)] == 0
    assert all(4 not in p for p in got)


def test_portable_hash64_matches_duckdb(spark):
    import duckdb

    from bigdatalog_spark.operators.dedup import portable_hash64

    words = ["alpha", "beta", "", "Zürich", "the quick fox"]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    got = {
        r["w"]: r["h"]
        for r in df.select("w", portable_hash64(F.col("w")).alias("h")).collect()
    }
    con = duckdb.connect()
    for w in words:
        expect = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [w]
        ).fetchone()[0]
        assert got[w] == expect, w


def test_embedding_dup_pairs_on_testdata(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pairs = embedding_dup_pairs(emb, threshold=0.9, block_col="label")
    rows = pairs.collect()
    for r in rows:
        assert r["left_id"] < r["right_id"]
        assert r["cosine"] >= 0.9


def test_embedding_self_similarity(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(5)
    dup = emb.union(emb.select((F.col("vec_id") + 1000).alias("vec_id"),
                               "embedding", "label"))
    pairs = embedding_dup_pairs(dup, threshold=0.999).collect()
    got = {(r["left_id"], r["right_id"]) for r in pairs}
    for i in range(5):
        assert (i, i + 1000) in got


def test_dedup_clusters_transitive(spark):
    # chain evidence 1~2, 2~3 must land all three in one cluster keyed by
    # min id; 4 and the pairless 5 stay singletons
    docs = spark.createDataFrame(
        [(i,) for i in range(1, 6)], ["doc_id"]
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], ["left_id", "right_id"]
    )
    from bigdatalog_spark.operators.dedup import dedup_clusters

    out = {
        (r["doc_id"], r["canonical_id"])
        for r in dedup_clusters(docs, pairs).collect()
    }
    assert out == {(1, 1), (2, 1), (3, 1), (4, 4), (5, 5)}


def test_dedup_clusters_survivors_match_pairs(spark):
    from bigdatalog_spark.operators.dedup import dedup_clusters

    docs = _dupdocs(spark)
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    clusters = dedup_clusters(docs, pairs)
    survivors = {
        r["doc_id"]
        for r in clusters.where(
            F.col("doc_id") == F.col("canonical_id")
        ).collect()
    }
    # 1,2,3 collapse (1-2 identical, 1-3 near); 4 survives alone
    assert survivors == {1, 4}


def test_qgram_fuzzy_short_branch_is_hash_join(spark):
    """The short-string fallback must plan as a hash/sort-merge join on
    the length-bucket key — a nested-loop join there is O(|shorts|·|names|)
    compare volume on corpora full of sub-q·(d+1)-char strings."""
    from bigdatalog_spark.operators.dedup import qgram_fuzzy_pairs

    names = [("ab",), ("ac",), ("abcd",), ("abcdefgh",), ("abcdefgi",)]
    df = spark.createDataFrame(names, ["name"])
    out = qgram_fuzzy_pairs(df, col="name", max_dist=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    got = {(r.left_name, r.right_name, r.dist) for r in out.collect()}
    assert ("ab", "ac", 1) in got
    assert ("ab", "abcd", 2) in got  # short-vs-long pair via length keys
    assert ("abcdefgh", "abcdefgi", 1) in got  # gram branch
