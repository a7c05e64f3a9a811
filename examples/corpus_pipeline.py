"""End-to-end training-corpus preparation pipeline.

Chains the library's corpus operators the way a pretraining data run
composes them — one declarative DataFrame plan per stage, so Catalyst
fuses/prunes across stage boundaries and every stage's scale shape
(PLANS.md) is preserved:

  quality filter → exact dedup → near-dup clusters (MinHash+LSH →
  star-contraction CC → keep canonical) → benchmark decontamination →
  deterministic split → mixture sampling → chunking → packing →
  sharded training export (one file per shard + token manifest)

Usage:
  python examples/corpus_pipeline.py [sf_dir]           # default sf0.01
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from bigdatalog_spark import build_session
from bigdatalog_spark.functions.text import quality_score
from bigdatalog_spark.operators.corpus import chunk_documents, decontaminate, pack_sequences
from bigdatalog_spark.operators.dedup import dedup_clusters, exact_dedup, minhash_lsh_pairs
from bigdatalog_spark.operators.sampling import hash_split, mixture_sample


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. quality gate (map-side expression, no shuffle)
    docs = docs.where(quality_score("text") >= 0.3)
    n1 = docs.count()

    # 2. exact dedup (one fingerprint shuffle)
    docs = exact_dedup(docs)
    n2 = docs.count()

    # 3. near-dup clustering: verified MinHash pairs → CC → canonical doc
    pairs = minhash_lsh_pairs(docs, threshold=0.8)
    clusters = dedup_clusters(docs, pairs)
    keep = clusters.where(F.col("doc_id") == F.col("canonical_id")).select("doc_id")
    docs = docs.join(keep, on="doc_id", how="left_semi")
    n3 = docs.count()

    # 4. decontamination vs a benchmark set (here: a held-out slice)
    benchmark = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    # n=8: the synthetic corpus has a ~40-word vocabulary, so 3-grams
    # collide by chance; 8-gram overlap means real copying
    flagged = decontaminate(docs, benchmark, n=8).select("doc_id")
    docs = docs.join(flagged, on="doc_id", how="left_anti")
    n4 = docs.count()

    # 5. deterministic split + mixture weighting (map-side)
    docs = hash_split(docs, {"train": 0.98, "val": 0.02})
    train = mixture_sample(
        docs.where(F.col("split") == "train"),
        {"src0": 1.0, "src1": 1.0},
        default_rate=0.5,
    )
    n5 = train.count()

    # 6. chunk + pack (map-side explode, then one shard-keyed window)
    chunks = chunk_documents(train, chunk_tokens=128, overlap=16)
    packed = pack_sequences(
        chunks.select(F.col("chunk_text").alias("text"),
                      F.monotonically_increasing_id().alias("doc_id")),
        budget=2048,
    )
    n6 = packed.count()
    n_packs = packed.select("pack_id").distinct().count()

    # 7. sharded export: deterministic layout + per-shard token manifest
    import tempfile

    from bigdatalog_spark.operators.io import shard_manifest, write_training_shards

    with tempfile.TemporaryDirectory() as out:
        write_training_shards(train, f"{out}/shards", num_shards=4)
        manifest = shard_manifest(train, num_shards=4).collect()
    n_shards = len(manifest)
    total_tokens = sum(r["n_tokens"] for r in manifest)

    print(
        f"input {n0} -> quality {n1} -> exact-dedup {n2} -> near-dedup {n3}"
        f" -> decontaminated {n4} -> train-mixture {n5}"
        f" -> {n6} chunks in {n_packs} packs"
        f" -> {n_shards} shards / {total_tokens} tokens"
        f"  ({time.time() - t0:.1f}s)"
    )


if __name__ == "__main__":
    main()
