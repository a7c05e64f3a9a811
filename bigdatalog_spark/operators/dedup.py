"""Deduplication operators for large-scale corpora.

Five families, all expressed with built-in DataFrame ops (JVM-side) so they
scale horizontally; shuffles are keyed on content hashes/buckets which
distribute uniformly by construction:

* exact            — hash-groupBy on a normalized fingerprint
* n-gram Jaccard   — exact pairwise similarity on word shingles
* MinHash + LSH    — banded minhash bucketing → candidate pairs → verify
* SimHash          — 64-bit hyperplane-ish fingerprint, near-dup by bucket
* embedding cosine — near-dup pairs by vector similarity

The `*_pairs` operators return (left_id, right_id, score) with
left_id < right_id; `dedup_*` operators return the surviving rows
(keep = min id per duplicate group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint
from ..session import ensure_min_parallelism


# --------------------------------------------------------------- exact

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id document per normalized-text fingerprint.

    One shuffle on the fingerprint (uniform by construction). At 100 TB:
    this is the canonical map-side-combinable pattern — Catalyst plans a
    partial min before the exchange.
    """
    fp = fingerprint(text_col).alias("__fp")
    keep = (
        df.select(F.col(id_col), fp)
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col))
        .drop("__fp")
    )
    return df.join(keep, on=id_col, how="left_semi")


# --------------------------------------------------------------- shingles

def _shingle_zip(df: DataFrame, text_col: str, id_col: str, n: int):
    """(base_df, zipped-shingle column): tokenize once, build n shifted
    token arrays with ONE slice each (O(tokens) per row, no per-shingle
    array slicing), and arrays_zip them so element i holds shingle i's n
    words. arrays_zip pads to the longest input, so entries whose last
    word is null are tail stubs (< n words) and get filtered by callers.
    Shuffle-free and linear — ~6× faster than a per-shingle
    slice+concat transform, and the only scalable shape at 100 TB (the
    window-lead alternative shuffles every token row)."""
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    names = [f"__t{j}" for j in range(n)]
    # shingle assembly is interpreted-HOF work: inherit at least the
    # cluster's parallelism before it (no-op on well-partitioned inputs)
    base = ensure_min_parallelism(df.select(F.col(id_col), F.col(text_col)))
    base = base.select(F.col(id_col), toks.alias(names[0]))
    for j in range(1, n):
        base = base.withColumn(
            names[j],
            F.slice(
                F.col(names[0]), j + 1, F.greatest(F.size(names[0]) - j, F.lit(0))
            ),
        )
    zipped = F.filter(
        F.arrays_zip(*names), lambda s: s[names[n - 1]].isNotNull()
    )
    return base, zipped, names


def word_shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3) -> DataFrame:
    """(id, shingle) pairs of n-word shingles over normalized text.
    Distinct per document (set semantics for Jaccard). Documents with
    fewer than n tokens produce no shingles."""
    base, zipped, names = _shingle_zip(df, text_col, id_col, n)
    sh = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[c] for c in names])
    )
    return (
        base.select(F.col(id_col), F.explode(sh).alias("shingle"))
        .where(F.length("shingle") > 0)
        .distinct()
    )


def word_shingle_hashes(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(id, 64-bit shingle hash) pairs, distinct per document. Hashing the
    n words directly (xxhash64 is variadic) skips building the joined
    shingle string, and the distinct shuffles 8-byte longs instead of
    strings — same SET CARDINALITIES as word_shingles (64-bit collisions
    are negligible), measurably cheaper at scale."""
    base, zipped, names = _shingle_zip(df, text_col, id_col, n)
    sh = F.transform(zipped, lambda s: F.xxhash64(*[s[c] for c in names]))
    return (
        base.select(F.col(id_col), F.explode(sh).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """N-gram Jaccard similarity pairs ≥ threshold.

    Plan: explode shingles → self-join on shingle (co-grouped by shingle
    hash, so common-shingle pairs co-locate) → count intersections →
    |A∪B| = |A|+|B|−|A∩B|. Only documents sharing ≥1 shingle ever pair up —
    no quadratic blow-up on disjoint corpora.

    ``max_doc_freq`` is the skew cap: a shingle appearing in more than
    this many documents (boilerplate headers, stopword runs) is dropped
    from BOTH the intersection and the per-doc set sizes before the
    self-join, i.e. Jaccard is computed exactly over the filtered shingle
    space. This is the scale guard — one boilerplate shingle shared by
    10⁶ docs would otherwise emit ~10¹² join rows in a single shuffle
    partition; capped, the join's per-key fan-out is ≤ cap², and the
    dropped shingles carry no discriminating signal anyway. ``None``
    (default) computes exact unfiltered Jaccard.

    Shingle strings are collapsed to 64-bit xxhash keys before the
    self-join: the shuffled join key is 8 bytes instead of ~8·n chars,
    and set sizes/intersections are unchanged (collisions at 2⁻⁶⁴ are
    noise next to shingling itself).
    """
    # materialize the shingle set once: it feeds three branches (both
    # self-join sides + the per-doc sizes), and only the self-join pair
    # gets a ReusedExchange — without persist the tokenize+explode+distinct
    # pipeline runs twice
    sh = word_shingle_hashes(df, text_col, id_col, n)
    if max_doc_freq is not None:
        # materialize the raw shingle stream first: the doc-frequency
        # aggregate partial-aggregates BELOW its exchange while the join's
        # probe side exchanges raw (id, shingle) rows, so Catalyst sees two
        # different exchanges and the interpreted-HOF shingling pipeline —
        # the expensive end — would run once per branch
        sh = sh.persist()
        # doc-frequency per shingle is a map-side-combinable count on the
        # same key the self-join shuffles on; the filter drops skewed keys
        # BEFORE they fan out. Sizes are computed from the filtered set so
        # the Jaccard denominator matches the filtered intersection.
        freq = sh.groupBy("shingle").agg(F.count("*").alias("__df"))
        sh = (
            sh.join(freq.where(F.col("__df") <= max_doc_freq), "shingle")
            .select(id_col, "shingle")
        )
    sh = sh.persist()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("left_id"), "shingle")
    b = sh.select(F.col(id_col).alias("right_id"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .where(F.col("left_id") < F.col("right_id"))
        .groupBy("left_id", "right_id")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("left_id"), F.col("sz").alias("lsz")), "left_id")
        .join(sizes.select(F.col(id_col).alias("right_id"), F.col("sz").alias("rsz")), "right_id")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("lsz") + F.col("rsz") - F.col("inter")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("left_id", "right_id", "jaccard")
    )
    return out


# --------------------------------------------------------------- minhash LSH

def minhash_signatures(
    sh: DataFrame, id_col: str = "doc_id", num_hashes: int = 32
) -> DataFrame:
    """One row per doc with `num_hashes` minhash values, computed as
    min(xxhash64(seed, shingle)) — all JVM-side, one shuffle."""
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    verify: bool = True,
) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs, optionally verified with exact
    Jaccard (shingle→minhash→band→bucket-join).

    With 32 hashes / 8 bands / 4 rows the S-curve passes ~50% at
    s ≈ (1/8)^(1/4) ≈ 0.59 — high recall at 0.8. Scale: the band join keys
    are (band_id, band_hash) — uniformly distributed, skew-free; candidate
    verification only touches bucketed pairs, never the full cross product.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands})"
        )
    rows_per_band = num_hashes // bands
    # hash shingle strings once; the 32 seeded minhashes then mix an 8-byte
    # long instead of re-hashing the full string per seed
    sh = word_shingle_hashes(df, text_col, id_col, n)
    # ONE aggregation computes both the signatures and (when verifying) the
    # per-doc shingle sets: separate groupBys would partial-aggregate
    # differently below their exchanges, so Catalyst can't reuse them and
    # the whole shingle scan would run twice
    sig = sh.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"mh{i}")
            for i in range(num_hashes)
        ],
        *([F.collect_set("shingle").alias("__ss")] if verify else []),
    )
    if verify:
        # column pruning strips collect_set from the band branch's partial
        # aggregate, so Catalyst sees two different exchanges and would run
        # the whole shingle scan twice; materialize the per-doc aggregate
        # once instead (num_docs rows — the small end of the pipeline)
        sig = sig.persist()
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("sig"))
        )
    buckets = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig"))
    left = buckets.select(F.col(id_col).alias("left_id"), "band", "sig")
    right = buckets.select(F.col(id_col).alias("right_id"), "band", "sig")
    cand = (
        left.join(right, on=["band", "sig"])
        .where(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id")
        .distinct()
    )
    if not verify:
        return cand
    # candidate-local verification: jaccard from per-doc shingle sets via
    # array_intersect — O(|candidates|), never recomputes the full exact
    # pair join (which would defeat LSH at scale)
    sets = sig.select(id_col, F.col("__ss").alias("ss"))
    lsets = sets.select(F.col(id_col).alias("left_id"), F.col("ss").alias("ls"))
    rsets = sets.select(F.col(id_col).alias("right_id"), F.col("ss").alias("rs"))
    inter = F.size(F.array_intersect(F.col("ls"), F.col("rs")))
    union = F.size(F.col("ls")) + F.size(F.col("rs")) - inter
    return (
        cand.join(lsets, "left_id")
        .join(rsets, "right_id")
        .withColumn("jaccard", F.round(inter / union, 6))
        .where(F.col("jaccard") >= threshold)
        .select("left_id", "right_id", "jaccard")
    )


# --------------------------------------------------------------- simhash

def _i64(x: int) -> int:
    """Wrap a Python int into signed 64-bit range (JVM long literals)."""
    x &= (1 << 64) - 1
    return x - (1 << 64) if x >= (1 << 63) else x


def portable_hash64(col) -> "F.Column":
    """Engine-portable 60-bit token hash: the first 15 hex chars of md5,
    as a non-negative long. Identical in any engine with md5 — DuckDB:
    ``('0x' || substr(md5(x), 1, 15))::BIGINT`` — which is what makes
    simhash results oracle-checkable. xxhash64 stays the scale default
    (one JVM intrinsic vs md5's digest)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 64, hash_fn: str = "xxhash64") -> DataFrame:
    """64-bit SimHash fingerprints from word tokens.

    Per token a 64-bit hash; the fingerprint's bit i is 1 iff the sum of
    (+1/−1) over tokens' bit i is positive. Expressed as an explode +
    per-bit conditional sums — stays in codegen, single shuffle on id.

    hash_fn: 'xxhash64' (default, fastest) or 'portable_md5' (60 effective
    bits, reproducible in any engine with md5 — see portable_hash64)."""
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    # NOT widened via ensure_min_parallelism: measured at sf0.1 the extra
    # text shuffle costs more than the single-task map side (the 64-sum
    # partial aggregate stays cheap relative to tokenize+hash) — bench
    # medians were ~0.6 s WORSE with the gate, unlike the shingle/chunk
    # paths where interpreted HOFs dominate
    t = df.select(F.col(id_col), F.explode(toks).alias("tok"))
    token_hash = (
        F.xxhash64("tok") if hash_fn == "xxhash64" else portable_hash64(F.col("tok"))
    )
    t = t.withColumn("h", token_hash)
    bit_aggs = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(_i64(1 << i))) != 0, 1).otherwise(-1)
        ).alias(f"s{i}")
        for i in range(bits)
    ]
    sums = t.groupBy(id_col).agg(*bit_aggs)
    fp = None
    for i in range(bits):
        bit = F.when(F.col(f"s{i}") > 0, F.lit(_i64(1 << i))).otherwise(F.lit(0))
        fp = bit if fp is None else fp.bitwiseOR(bit)
    return sums.select(F.col(id_col), fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs with Hamming distance ≤ max_hamming between SimHashes.

    Uses the standard block trick: split the 64-bit hash into
    (max_hamming+1) blocks; any pair within distance d ≤ max_hamming agrees
    on ≥1 block (pigeonhole) → join on (block_idx, block_value), then verify
    with bit_count(xor). Never quadratic — and by pigeonhole recall is
    exactly 1, so the result equals the full pairwise hamming filter (what
    the DuckDB oracle computes when hash_fn='portable_md5')."""
    nblocks = max_hamming + 1
    width = 64 // nblocks
    # materialize the fingerprint table once (num_docs × 16-byte rows —
    # the small end of the pipeline): the block self-join reads it from
    # BOTH sides, and the broadcast build side is a different exchange
    # than the probe side, so Catalyst gets no ReusedExchange and the
    # whole tokenize+hash+64-bit-vote aggregation would run twice (same
    # persist discipline as ngram_jaccard_pairs / minhash_lsh_pairs)
    s = simhash(df, text_col, id_col, hash_fn=hash_fn).persist()
    blocks = []
    for b in range(nblocks):
        shift = b * width
        w = width if b < nblocks - 1 else 64 - shift
        mask = _i64(((1 << w) - 1) << shift)
        blocks.append(
            F.struct(
                F.lit(b).alias("blk"),
                F.col("simhash").bitwiseAND(F.lit(mask)).alias("val"),
            )
        )
    bdf = s.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*blocks)).alias("b")
    ).select(id_col, "simhash", F.col("b.blk").alias("blk"), F.col("b.val").alias("val"))
    left = bdf.select(
        F.col(id_col).alias("left_id"), F.col("simhash").alias("lh"), "blk", "val"
    )
    right = bdf.select(
        F.col(id_col).alias("right_id"), F.col("simhash").alias("rh"), "blk", "val"
    )
    cand = (
        left.join(right, on=["blk", "val"])
        .where(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id", "lh", "rh")
        .distinct()
    )
    hamming = F.bit_count(F.col("lh").bitwiseXOR(F.col("rh")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("left_id", "right_id", "hamming")
    )


# --------------------------------------------------------------- embeddings

def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    block_col: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs by cosine similarity ≥ threshold.

    With ``block_col``: one applyInPandas task per block computes the
    block's full pairwise-cosine matrix with a single numpy matmul — each
    vector crosses the wire ONCE (O(n·d) Arrow traffic) instead of once
    per pair (O(n²·d)), and the n²·d multiply-adds run vectorized instead
    of through interpreted higher-order-function folds (measured ~20×).
    Blocks must fit one task; at 100 TB keep blocks bounded (finer
    blocking, LSH buckets, or the IVF route in operators/similarity.py).

    Without blocks: exact pair join baseline with pre-computed norms
    (O(n·d) norm work, not O(n²·d))."""
    if block_col is not None:
        id_type = df.schema[id_col].dataType.simpleString()
        out_schema = (
            f"left_id {id_type}, right_id {id_type}, cosine double"
        )

        def per_block(pdf):
            import numpy as np
            import pandas as pd

            pdf = pdf.sort_values(id_col)
            ids = pdf[id_col].to_numpy()
            m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            norms = np.linalg.norm(m, axis=1)
            sims = (m @ m.T) / np.outer(norms, norms)
            li, ri = np.triu_indices(len(ids), k=1)
            cos = np.round(sims[li, ri], 6)
            keep = cos >= threshold
            return pd.DataFrame(
                {
                    "left_id": ids[li][keep],
                    "right_id": ids[ri][keep],
                    "cosine": cos[keep],
                }
            )

        return (
            df.select(F.col(id_col), F.col(vec_col), F.col(block_col))
            .groupBy(block_col)
            .applyInPandas(per_block, schema=out_schema)
        )

    from .similarity import dot_expr, norm_expr

    a = df.select(
        F.col(id_col).alias("__i"),
        F.col(vec_col).alias("__v"),
        norm_expr(F.col(vec_col)).alias("__n"),
    )
    joined = a.alias("l").crossJoin(a.alias("r")).where(
        F.col("l.__i") < F.col("r.__i")
    )
    cos = dot_expr(F.col("l.__v"), F.col("r.__v")) / (
        F.col("l.__n") * F.col("r.__n")
    )
    return (
        joined.select(
            F.col("l.__i").alias("left_id"),
            F.col("r.__i").alias("right_id"),
            F.round(cos, 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


# --------------------------------------------------------------- clustering

def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    left_col: str = "left_id",
    right_col: str = "right_id",
) -> DataFrame:
    """Collapse pairwise duplicate evidence into clusters: every document
    maps to the min doc id of its duplicate group (itself when unpaired).

    Near-dup pairs are only *evidence*; a training-data pipeline needs the
    transitive closure of that evidence (A~B, B~C => one cluster {A,B,C})
    before it can pick one survivor per group. The pair graph's closure is
    computed with O(log n)-round star contraction
    (operators/graph.py connected_components_fast), not diameter-bound label
    propagation — duplicate chains in crawled corpora (boilerplate families,
    mirrored sites) routinely have long paths, and at 100 TB a
    diameter-bound loop over them is the difference between feasible and
    not. Everything is JVM-side DataFrame ops; the only shuffles are keyed
    on vertex ids.

    Returns (id_col, canonical_id). Compose: keep survivors with
    ``clusters.where(col(id_col) == col("canonical_id"))`` semi-joined back
    onto the corpus.
    """
    from .graph import connected_components_fast

    edges = pairs.select(
        F.col(left_col).alias("src"), F.col(right_col).alias("dst")
    )
    labels = connected_components_fast(edges).select(
        F.col("vertex").alias(id_col), F.col("component").alias("canonical_id")
    )
    return (
        docs.select(id_col)
        .join(labels, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("canonical_id", F.col(id_col)).alias("canonical_id"),
        )
    )


# --------------------------------------------------------- fuzzy matching

def qgram_fuzzy_pairs(
    df: DataFrame,
    col: str = "name",
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """Entity-resolution fuzzy join: DISTINCT values of ``col`` within
    Levenshtein distance ``max_dist`` of each other, as
    (left_name, right_name, dist) with left < right.

    Scale shape — never all-pairs: candidates come from a self-join on
    shared q-grams (one edit destroys at most q grams, so two strings
    within distance d share ≥ 1 intact q-gram whenever the SHORTER has at
    least q·(d+1) characters — the standard q-gram count-filter bound),
    plus a short-string fallback block (strings under that bound are
    paired against names in the |len| ≤ d window via a length-bucket
    EQUI-join — each short string explodes to its len−d…len+d keys and
    hash-joins names keyed by exact length, so the planner gets a hash
    join, never a nested-loop scan over all names). Both branches verify
    with the exact
    ``levenshtein`` expression, so recall and precision are both 1.
    Matching runs on DISTINCT values — equal-name row pairs are exact-
    dedup territory (exact_dedup), not fuzzy matching — which also kills
    the quadratic blowup a value repeated across millions of rows would
    cause."""
    names = df.select(F.col(col).alias("name")).where(
        F.col("name").isNotNull()
    ).distinct()
    L = F.length("name")
    min_guaranteed = q * (max_dist + 1)

    long_names = names.where(L >= min_guaranteed)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), L - q + 1),
            lambda i: F.col("name").substr(i, F.lit(q)),
        )
    )
    g = long_names.select("name", F.explode(grams).alias("g"))
    cand = (
        g.select(F.col("name").alias("left_name"), "g")
        .join(g.select(F.col("name").alias("right_name"), "g"), "g")
        .where(F.col("left_name") < F.col("right_name"))
        .select("left_name", "right_name")
        .distinct()
    )
    # short strings: the gram bound does not hold — block on a length-
    # bucket equi-join instead: each short string fans out to its
    # len−d…len+d keys (≤ 2d+1 rows) and hash-joins names bucketed by
    # exact length, keeping shuffle volume O(|shorts|·d + |names|)
    shorts = names.where(L < min_guaranteed)
    short_keys = shorts.select(
        F.col("name").alias("s_name"),
        F.explode(
            F.sequence(F.greatest(F.lit(1), L - max_dist), L + max_dist)
        ).alias("len_key"),
    )
    short_cand = (
        short_keys.join(
            names.select(
                F.col("name").alias("o_name"), L.alias("len_key")
            ),
            "len_key",
        )
        .where(F.col("s_name") != F.col("o_name"))
        # normalize orientation: covers both (short, long) and mirrored
        # (long, short) pairs from the short side in one pass
        .select(
            F.least("s_name", "o_name").alias("left_name"),
            F.greatest("s_name", "o_name").alias("right_name"),
        )
        .distinct()
    )
    dist = F.levenshtein("left_name", "right_name")
    return (
        cand.union(short_cand)
        .distinct()
        .withColumn("dist", dist.cast("long"))
        .where(F.col("dist") <= max_dist)
    )
