"""Similarity-search operator tests: brute-force / LSH / IVF top-k."""

import math
import random

from pyspark.sql import functions as F

from bigdatalog_spark.operators.similarity import (
    brute_force_topk,
    cosine_expr,
    ivf_topk,
    lsh_topk,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_cosine_expr_exact(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 2.0], [2.0, 4.0])], ["a", "b"]
    )
    vals = [r["c"] for r in df.select(F.round(cosine_expr(F.col("a"), F.col("b")), 6).alias("c")).collect()]
    assert vals[0] == 0.0
    assert abs(vals[1] - 1.0) < 1e-6


def test_brute_force_self_is_top1(spark):
    emb = _emb(spark)
    queries = emb.limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(emb, queries, k=3).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in out if r["rank"] == 1}
    for qid, nid in top1.items():
        assert qid == nid  # self-similarity = 1.0


def test_brute_force_matches_python(spark):
    emb = _emb(spark).limit(50)
    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    queries = emb.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    out = brute_force_topk(emb, queries, k=5).collect()

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    for qid in {r["query_id"] for r in out}:
        expected = sorted(
            ((round(cos(vecs[qid], v), 6), -i) for i, v in vecs.items()),
            reverse=True,
        )[:5]
        got = sorted(
            (r["cosine"], -r["neighbor_id"])
            for r in out if r["query_id"] == qid
        )[::-1]
        assert [e[0] for e in expected] == [g[0] for g in got]


def test_lsh_topk_scores_consistent(spark):
    emb = _emb(spark)
    rng = random.Random(7)
    planes = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(6)]
    queries = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    out = lsh_topk(emb, queries, planes, k=3).collect()
    # self lands in its own bucket → rank 1 with cosine 1.0
    top1 = {r["query_id"]: (r["neighbor_id"], r["cosine"]) for r in out if r["rank"] == 1}
    for qid, (nid, c) in top1.items():
        assert nid == qid and abs(c - 1.0) < 1e-5


def test_ivf_topk_probes_cells(spark):
    emb = _emb(spark)
    rng = random.Random(3)
    centroids = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(4)]
    queries = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    out = ivf_topk(emb, queries, centroids, k=3, nprobe=2).collect()
    top1 = {r["query_id"]: (r["neighbor_id"], r["cosine"]) for r in out if r["rank"] == 1}
    for qid, (nid, c) in top1.items():
        assert nid == qid and abs(c - 1.0) < 1e-5


def test_kmeans_centroids_separates_clusters(spark):
    from bigdatalog_spark.operators.similarity import ivf_topk, kmeans_centroids

    # two tight clusters around (0,10) and (10,0)
    rows = [(i, [0.0 + i * 0.01, 10.0]) for i in range(10)] + [
        (100 + i, [10.0, 0.0 + i * 0.01]) for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = kmeans_centroids(df, 2, iterations=4)
    assert len(cents) == 2
    # one centroid per cluster (order depends on init = smallest ids)
    a, b = sorted(cents, key=lambda c: c[0])
    assert a[0] < 1 and a[1] > 9     # near (0,10)
    assert b[0] > 9 and b[1] < 1     # near (10,0)
    # trained centroids drive ivf_topk: querying a member of cluster A
    # with nprobe=1 returns only cluster-A neighbors
    q = df.where("vec_id = 0").selectExpr("vec_id AS query_id", "embedding")
    got = ivf_topk(df, q, cents, k=5, nprobe=1).collect()
    assert all(r["neighbor_id"] < 100 for r in got)


def test_kmeans_centroids_rejects_bad_k(spark):
    import pytest

    from bigdatalog_spark.operators.similarity import kmeans_centroids

    df = spark.createDataFrame([(1, [0.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        kmeans_centroids(df, 0)
    with pytest.raises(ValueError):
        kmeans_centroids(df, 5)


def test_lsh_signature_wide_planes_match_python(spark):
    """40 planes (> the old 31-bit int cap): bit i = sign(v·planeᵢ) as a
    1L << i sum, matching the reference semantics exactly to 63 planes —
    the pow(2.0,i).cast('int') form silently overflowed at i >= 31."""
    from bigdatalog_spark.operators.similarity import hyperplane_lsh_buckets

    rng = random.Random(7)
    dim, nplanes = 8, 40
    planes = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(nplanes)]
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(20)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        r["vec_id"]: r["sig"]
        for r in df.select(
            "vec_id", hyperplane_lsh_buckets(df, planes).alias("sig")
        ).collect()
    }
    for vid, vec in rows:
        expect = sum(
            1 << i
            for i, p in enumerate(planes)
            if sum(x * y for x, y in zip(vec, p)) >= 0
        )
        assert got[vid] == expect, f"vec {vid}: {got[vid]} != {expect}"
    assert max(got.values()) > (1 << 31)  # genuinely exercises wide bits


def test_lsh_rejects_too_many_planes_and_nonfinite(spark):
    import pytest

    from bigdatalog_spark.operators.similarity import hyperplane_lsh_buckets

    df = spark.createDataFrame([(1, [0.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        hyperplane_lsh_buckets(df, [[1.0]] * 63)
    with pytest.raises(ValueError, match="finite"):
        hyperplane_lsh_buckets(df, [[float("nan")]])
