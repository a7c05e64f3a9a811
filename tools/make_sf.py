"""Scale-up generator for scale rehearsals: build sfN data as K shifted
copies of an existing driver-generated sf directory.

Usage: python tools/make_sf.py SRC_DIR OUT_DIR K

Why copies instead of fresh synthesis: the driver's generator isn't in the
repo, and the rehearsal's goal is PERFORMANCE at 10x rows with the same
distributions — K offset copies preserve every per-copy distribution and
referential-integrity relationship exactly (fact keys are offset per copy,
dimension tables region/nation stay shared).

Two columns are deterministically perturbed so similarity workloads stay
realistic instead of exploding quadratically:
* documents.text — every word gets a per-copy suffix (identical texts
  across copies would otherwise create 10-way duplicate groups, i.e.
  45x the pair volume of a real corpus at this scale);
* embeddings.embedding — dimensions are rotated by the copy index
  (identical vectors across copies would pair at cosine 1.0).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def scale_dir(spark, src: str, out: str, k: int) -> None:
    os.makedirs(out, exist_ok=True)

    def copies(df, offsets: dict):
        """Union K copies with per-copy offsets added to the id columns in
        ``offsets`` (col -> per-copy stride)."""
        parts = []
        for i in range(k):
            c = df
            for col, stride in offsets.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * stride))
            parts.append(c.withColumn("__copy", F.lit(i)))
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u.drop("__copy")

    def stride(df, col) -> int:
        return int(df.agg(F.max(col)).collect()[0][0]) + 1

    def write(df, name, parts=None):
        w = df.repartition(parts) if parts else df
        w.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(name, "done", flush=True)

    # shared dimensions — no scaling
    for name in ("region", "nation"):
        write(spark.read.parquet(f"{src}/{name}.parquet"), name)

    cust = spark.read.parquet(f"{src}/customer.parquet")
    c_stride = stride(cust, "c_custkey")
    write(copies(cust, {"c_custkey": c_stride}), "customer")

    supp = spark.read.parquet(f"{src}/supplier.parquet")
    s_stride = stride(supp, "s_suppkey")
    write(copies(supp, {"s_suppkey": s_stride}), "supplier")

    part = spark.read.parquet(f"{src}/part.parquet")
    p_stride = stride(part, "p_partkey")
    write(copies(part, {"p_partkey": p_stride}), "part")

    orders = spark.read.parquet(f"{src}/orders.parquet")
    o_stride = stride(orders, "o_orderkey")
    write(
        copies(orders, {"o_orderkey": o_stride, "o_custkey": c_stride}),
        "orders",
        parts=8,
    )

    li = spark.read.parquet(f"{src}/lineitem.parquet")
    write(
        copies(
            li,
            {
                "l_orderkey": o_stride,
                "l_partkey": p_stride,
                "l_suppkey": s_stride,
            },
        ),
        "lineitem",
        parts=16,
    )

    ev = spark.read.parquet(f"{src}/events.parquet")
    e_stride = stride(ev, "event_id")
    u_stride = stride(ev, "user_id")
    write(
        copies(ev, {"event_id": e_stride, "user_id": u_stride}),
        "events",
        parts=8,
    )

    docs = spark.read.parquet(f"{src}/documents.parquet")
    d_stride = stride(docs, "doc_id")
    scaled_docs = copies(docs, {"doc_id": d_stride})
    # per-copy word salt: copy index recovered from the offset doc_id
    copy_idx = (F.col("doc_id") / F.lit(d_stride)).cast("int")
    salted = F.array_join(
        F.transform(
            F.split(F.col("text"), r"\s+"),
            lambda w: F.concat(w, F.lit("_"), copy_idx.cast("string")),
        ),
        " ",
    )
    write(
        scaled_docs.withColumn("text", salted).withColumn(
            "n_chars", F.length("text").cast("long")
        ),
        "documents",
        parts=8,
    )

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    v_stride = stride(emb, "vec_id")
    scaled_emb = copies(emb, {"vec_id": v_stride})
    dim = len(emb.select("embedding").first()[0])
    cidx = (F.col("vec_id") / F.lit(v_stride)).cast("int")
    rot = F.concat(
        F.slice(F.col("embedding"), cidx + 1, F.lit(dim) - cidx),
        F.slice(F.col("embedding"), F.lit(1), cidx),
    )
    write(scaled_emb.withColumn("embedding", rot), "embeddings")


def main() -> None:
    src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    from bigdatalog_spark import build_session

    spark = build_session(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    scale_dir(spark, src, out, k)
    spark.stop()


if __name__ == "__main__":
    main()
