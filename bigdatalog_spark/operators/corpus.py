"""Corpus-preparation operators for training-data pipelines.

Three ops a pretraining data pipeline runs after dedup/quality filtering,
each expressed with built-in DataFrame functions (JVM-side, oracle-checkable):

* pack_sequences  — assign documents to fixed-token-budget packs
* pii_stats       — count/flag PII-looking spans (emails, phone numbers)
* decontaminate   — flag corpus documents sharing n-grams with a benchmark

All shuffles key on uniformly-distributed values (shard ids, shingle
hashes), so the plans scale horizontally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count
from ..session import ensure_min_parallelism
from .dedup import word_shingle_hashes


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col=None,
) -> DataFrame:
    """Offset packing: documents get a starting token offset by cumulative
    sum within their shard, and a pack id = start_offset // budget.

    This is the deterministic, single-window formulation (documents may
    straddle a pack boundary and are chunked downstream at tokenize time).
    Exact greedy no-split packing is inherently a sequential scan; the
    offset form is what stays parallel — one window aggregate per shard,
    no stateful pass.

    Without ``shard_col`` the window is a single global ordering — fine for
    tests, a one-partition bottleneck at scale. At 100 TB pass a shard
    expression (e.g. ``F.col("doc_id") % n_shards``): each shard packs
    independently and the window parallelizes across shards.

    Returns (id_col, shard, n_tokens, start_off, pack_id).
    """
    shard = (
        F.lit(0) if shard_col is None
        else (F.col(shard_col) if isinstance(shard_col, str) else shard_col)
    )
    base = df.select(
        F.col(id_col),
        shard.alias("shard"),
        token_count(text_col).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_off"),
    ).withColumn(
        "pack_id", (F.col("start_off") / F.lit(budget)).cast("long")
    )


# Deliberately simple, cross-engine-safe patterns (same semantics in Java
# regex and RE2/DuckDB): a real pipeline would plug a vetted PII library in
# here; the *shape* of the operator (pure column expressions, no UDF) is
# the part that matters at scale.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{3}-[0-9]{3,4}-[0-9]{4}"


def pii_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII signal: email/phone match counts and a has_pii
    flag. Pure JVM regex expressions — no UDF, fully pushdown-friendly."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.regexp_count(c, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(c, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
    ).withColumn(
        "has_pii", (F.col("n_emails") + F.col("n_phones")) > 0
    )


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace PII-looking spans with typed placeholder tokens."""
    c = F.col(text_col)
    red = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, PHONE_RE, "<PHONE>")
    return df.withColumn(text_col, red)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: for each corpus document, the number of
    distinct word n-gram shingles it shares with ANY benchmark document.

    Both sides shingle to 64-bit hashes (dedup.word_shingle_hashes), the
    benchmark side is reduced to its distinct shingle set (small — it's a
    benchmark), and the overlap is one equi-join on the hash. At 100 TB
    the benchmark shingle set broadcasts; the corpus never self-joins.

    Returns (id_col, n_overlap) for contaminated documents only — callers
    anti-join this against the corpus to drop them.
    """
    corpus_sh = word_shingle_hashes(corpus, text_col, id_col, n)
    bench_sh = (
        word_shingle_hashes(benchmark, text_col, id_col, n)
        .select("shingle")
        .distinct()
    )
    return (
        corpus_sh.join(bench_sh, on="shingle", how="inner")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )


def dedup_chunks(
    df: DataFrame,
    chunk_words: int = 4,
    max_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document duplicated-chunk removal — the MassiveText /
    RefinedWeb "remove lines duplicated across documents" rule, adapted to
    flat corpora: split each document into non-overlapping
    ``chunk_words``-word chunks, count how many DISTINCT documents each
    exact chunk occurs in, and strip every chunk that occurs in more than
    ``max_docs`` documents (boilerplate / template text), reassembling the
    surviving chunks in their original order.

    Scale shape: the chunking is a pure map-side higher-order-function
    expression (no explode until the document-frequency count); the DF
    count is one groupBy keyed on the chunk text (uniformly distributed);
    reassembly is one groupBy on the document id. The over-threshold
    chunk set is usually small (heavy hitters only), but its size GROWS
    with corpus size — common short phrases can make it large — so the
    removal anti-join carries NO explicit broadcast hint: AQE observes
    the aggregated set's true runtime size and converts to broadcast
    only when it actually fits, falling back to a shuffled join
    otherwise. No self-join anywhere — the same plan holds at 100 TB.

    Returns (id_col, text_clean, n_chunks, n_removed); documents whose
    chunks are all boilerplate survive with text_clean = ''. NULL text
    is treated as '' (one empty chunk), like io.shard_manifest.
    """
    if chunk_words < 1:
        raise ValueError("chunk_words must be >= 1")
    words = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    nchunks = F.ceil(F.size(words) / F.lit(float(chunk_words))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nchunks - 1),
        lambda i: F.array_join(
            F.slice(words, i * chunk_words + 1, chunk_words), " "
        ),
    )
    # chunk assembly is interpreted-HOF work feeding two branches; widen
    # single-file scans to cluster parallelism first (no-op at scale)
    base = ensure_min_parallelism(df.select(F.col(id_col), F.col(text_col)))
    base = base.select(F.col(id_col), chunks.alias("__chunks"))
    exploded = base.select(
        id_col, F.posexplode("__chunks").alias("cn", "chunk")
    )
    dup = (
        exploded.groupBy("chunk")
        .agg(F.count_distinct(F.col(id_col)).alias("__df"))
        .where(F.col("__df") > max_docs)
        .select("chunk")
    )
    # no broadcast hint: the heavy-hitter set's size is data-dependent
    # (grows with corpus size); let AQE pick broadcast vs shuffle from
    # the aggregate's actual runtime size
    kept = exploded.join(dup, on="chunk", how="left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("cn", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("text_clean"),
        F.count(F.lit(1)).cast("long").alias("__n_kept"),
    )
    # chunk COUNT only — computed directly from the raw text (split +
    # size + ceil, the same nchunks expression the assembly uses), not
    # from the assembled __chunks array: size(__chunks) == nchunks by
    # construction, and deriving it from base would run the interpreted
    # chunk-assembly HOF a third time just to count its output
    totals = df.select(
        F.col(id_col), nchunks.cast("long").alias("n_chunks")
    )
    return (
        totals.join(reassembled, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            "n_chunks",
            (F.col("n_chunks") - F.coalesce("__n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    tokenize-time counterpart of :func:`pack_sequences` (which only assigns
    budgets): chunk i covers tokens [i·step, i·step + chunk_tokens) with
    step = chunk_tokens − overlap, so consecutive chunks share ``overlap``
    tokens of context. The standard pre-embedding / pre-training chunker.

    Pure map-side: tokenize once, compute the chunk count arithmetically,
    explode a sequence, slice the token array per chunk — no shuffle, no
    UDF; at 100 TB this is a scan-shaped pipeline whose output is
    ~(1 + overlap/step)× the input tokens.

    Returns (id_col, chunk_id, chunk_text, n_tokens)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be in [0, chunk_tokens) — a negative "
            f"overlap would silently skip tokens between chunks"
        )
    step = chunk_tokens - overlap
    # drop empty tokens so an empty/whitespace-only document tokenizes to
    # [] (split('') yields ['']) and produces ZERO chunks rather than one
    # ''-chunk with a phantom token — downstream token accounting relies
    # on sum(n_tokens) == corpus token count
    toks = F.filter(
        F.split(
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "),
            " ",
        ),
        lambda t: t != F.lit(""),
    )
    base = df.select(F.col(id_col), toks.alias("__toks"))
    n = F.size("__toks")
    nchunks = (
        F.when(n <= 0, F.lit(0))
        .when(n <= chunk_tokens, F.lit(1))
        .otherwise(
            (F.lit(1) + F.ceil((n - chunk_tokens) / F.lit(float(step)))).cast("int")
        )
    )
    out = base.select(
        id_col,
        "__toks",
        # explode of an empty array drops the row → empty docs emit nothing
        F.explode(
            F.when(nchunks > 0, F.sequence(F.lit(0), nchunks - 1)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("chunk_id"),
    )
    piece = F.slice(
        F.col("__toks"), F.col("chunk_id") * step + 1, chunk_tokens
    )
    return out.select(
        id_col,
        "chunk_id",
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )
