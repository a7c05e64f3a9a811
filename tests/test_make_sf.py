"""Scale-up generator (tools/make_sf.py): row counts, referential
integrity, and the similarity-realism perturbations."""

import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.001"


def test_scale_dir_counts_integrity_and_perturbation(spark):
    from tools.make_sf import scale_dir

    with tempfile.TemporaryDirectory() as out:
        scale_dir(spark, SRC, out, 3)

        def t(name):
            return spark.read.parquet(f"{out}/{name}.parquet")

        for name in ("customer", "orders", "lineitem", "events",
                     "documents", "embeddings"):
            src_n = spark.read.parquet(f"{SRC}/{name}.parquet").count()
            assert t(name).count() == 3 * src_n, name
        # dims unscaled
        assert t("region").count() == 5 and t("nation").count() == 25

        # referential integrity holds across copies
        orphans = (
            t("orders")
            .join(t("customer"), F.col("o_custkey") == F.col("c_custkey"),
                  "left_anti")
            .count()
        )
        assert orphans == 0

        # word salting: no document text repeats across copies
        dup_texts = (
            t("documents").groupBy("text").count().where(F.col("count") > 1).count()
        )
        assert dup_texts == 0

        # embeddings rotated: copy 1's vector differs from copy 0's
        emb = t("embeddings")
        n0 = spark.read.parquet(f"{SRC}/embeddings.parquet").count()
        v0 = emb.where(F.col("vec_id") == 0).first()["embedding"]
        v1 = emb.where(F.col("vec_id") == n0).first()["embedding"]
        assert sorted(v0) == sorted(v1) and list(v0) != list(v1)
