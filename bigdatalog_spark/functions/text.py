"""Text-analysis operators for large-scale training-data pipelines.

All hot-path logic uses built-in pyspark.sql.functions (JVM-side,
whole-stage-codegen'd) — no Python UDFs — so every operator scales to
arbitrary partition counts with zero serialization overhead. Each function
takes/returns DataFrames or Columns and composes with any plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A small deterministic stopword set used for quality scoring / language ID.
STOPWORDS = (
    "the", "a", "of", "and", "to", "in", "is", "it", "for", "on", "with",
)

# marker words per language for the n-gram/marker language-ID heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "et", "la"),
    "es": ("el", "y", "de"),
    "zh": ("de", "le", "shi"),
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization → array<string> (lowercased)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count(col: Column | str) -> Column:
    """Whitespace token count (BPE-ish refinement: punctuation splits too)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+"))


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


# BPE-style pretokenizer classes: letter runs, digit runs, punctuation
# runs (GPT-2's pattern minus the lookahead RE2 can't express — keeps the
# count portable to DuckDB/Trino for oracles). A letter-digit boundary or
# any punctuation starts a new token, which is what makes this a closer
# proxy for subword-tokenizer budget than whitespace counting.
_SUBWORD_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def subword_token_count(col: Column | str) -> Column:
    """BPE-ish token count: number of letter/digit/punctuation runs.

    Tracks subword-tokenizer budgets far better than whitespace counting
    ("don't!" = 1 whitespace token but 4 runs: don ' t !), while staying a
    pure JVM-side regexp over the scan — the right fidelity/cost point for
    scheduling token budgets over 100 TB without running a real tokenizer."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(_SUBWORD_RE), F.lit(0)))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"[A-Za-z0-9\s]", "")
    return F.length(stripped) / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(col: Column | str, stopwords=STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords — a classic quality signal."""
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def mean_token_length(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality score from length / punctuation / stopword
    signals. Deterministic and SQL-expressible (oracle-checkable)."""
    c = F.col(col) if isinstance(col, str) else col
    len_score = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    punct_pen = F.least(punct_ratio(c) * 5.0, F.lit(1.0))
    sw = stopword_ratio(c)
    sw_score = F.least(sw * 4.0, F.lit(1.0))
    return F.round(
        0.5 * len_score + 0.3 * sw_score + 0.2 * (1.0 - punct_pen), 6
    )


def lang_id(col: Column | str) -> Column:
    """Marker-word language ID: argmax over per-language marker-token hits,
    'und' (undetermined) when no marker occurs. Deterministic tie-break by
    language code order."""
    toks = tokens(col)
    scores = []
    for code in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(w) for w in LANG_MARKERS[code]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
        scores.append((code, hits))
    # argmax with deterministic order: fold over structs (score desc, code asc)
    best = F.greatest(
        *[F.struct(s.alias("n"), F.lit(c).alias("code")) for c, s in scores]
    )
    return F.when(best["n"] > 0, best["code"]).otherwise(F.lit("und"))


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    Portable across engines (oracle: DuckDB md5())."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(normalized)


def winnowing_fingerprints(
    df: DataFrame,
    k: int = 5,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rolling-hash document fingerprints via winnowing (Schleimer, Wilkerson
    & Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD 2003 — the MOSS algorithm): hash every character k-gram of the
    normalized text, slide a window of ``window`` hashes, keep each
    window's minimum, dedupe. Two docs sharing a substring of length
    ≥ k + window − 1 are GUARANTEED to share a fingerprint — the standard
    plagiarism/near-copy detector with bounded output density (~2/(w+1)
    of the k-grams).

    Normalization (lower + strip non-[a-z0-9]) stays a JVM expression on
    the scan; the hash + window-minimum kernel runs as an Arrow-batched
    numpy ``mapInPandas``. The per-character work is the textbook case
    where Python wins: Catalyst higher-order functions evaluate
    INTERPRETED (no whole-stage codegen), so the previous pure-expression
    pipeline paid an interpreter visit per character per stage — the
    vectorized kernel (one stride-view matmul mod M for all k-gram
    hashes, one stride-view row-min for all windows) measured **87.3 s →
    6.1 s at sf10** (500 k docs, 41.5 M fingerprints) and 2× at sf0.1,
    set-identical output. The hash itself is unchanged and
    engine-portable: a polynomial in B=131 over the char codes mod
    M=2^31−1, exactly replayed by the DuckDB oracle in SQL; every term
    ≤ 255·M so int64 never overflows. Returns (id_col, fp)."""
    import numpy as np
    from pyspark.sql import types as T

    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    base = df.select(F.col(id_col), norm.alias("__norm"))
    # the Arrow kernel inherits whatever parallelism the scan produced — a
    # single small parquet file means ONE task doing all the per-character
    # work. Repartition up to the cluster's parallelism when the input is
    # under it; at real scale the input has ≥ cores partitions and this is
    # a no-op (no shuffle added).
    sc = df.sparkSession.sparkContext
    if base.rdd.getNumPartitions() < sc.defaultParallelism:
        base = base.repartition(sc.defaultParallelism)
    B, M = 131, 2147483647
    coeffs = np.array([pow(B, k - 1 - j, M) for j in range(k)], dtype=np.int64)
    out_schema = T.StructType(
        [base.schema[id_col], T.StructField("fp", T.LongType())]
    )

    def run(batches):
        import pandas as pd
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            ids, fps = [], []
            for i, s in zip(pdf[id_col], pdf["__norm"]):
                # mirror the expression semantics exactly: docs shorter
                # than k have no k-grams; fewer than `window` hashes → no
                # complete window → no fingerprints
                if s is None or len(s) < k:
                    continue
                # __norm is [a-z0-9]* by construction, so ascii is total
                codes = np.frombuffer(
                    s.encode("ascii"), dtype=np.uint8
                ).astype(np.int64)
                h = (sliding_window_view(codes, k) @ coeffs) % M
                if len(h) < window:
                    continue
                u = np.unique(sliding_window_view(h, window).min(axis=1))
                ids.append(np.full(len(u), i))
                fps.append(u)
            if ids:
                yield pd.DataFrame(
                    {id_col: np.concatenate(ids), "fp": np.concatenate(fps)}
                )

    return base.mapInPandas(run, out_schema)


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-token
    fraction and the share of token bigrams taken by the single most
    frequent bigram. High values flag boilerplate / degenerate text that
    length+stopword quality scores miss.

    Shape: every signal — including the bigram MODE — is a per-row array
    expression: sort the bigram array in-row, then one fold counts the
    longest equal-run. Zero shuffles, zero joins; the whole operator is a
    scan-shaped map pipeline (the previous explode + two keyed
    aggregations + join version cost a 2-shuffle detour for the mode and
    was ~2× slower at sf0.1). Per-row cost is O(t log t) in the doc's
    token count — JVM codegen, cheaper than exchanging the exploded
    bigram stream at any corpus size.

    Returns (id_col, n_tokens, n_distinct_tokens, dup_token_frac,
    top_bigram_frac)."""
    toks = tokens(text_col)
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
    ).select(
        F.col(id_col),
        F.size("__toks").alias("n_tokens"),
        F.size(F.array_distinct("__toks")).alias("n_distinct_tokens"),
        F.expr(
            "transform(slice(__toks, 1, greatest(size(__toks)-1, 0)),"
            " (t, i) -> concat(t, ' ', __toks[i+1]))"
        ).alias("__bigrams"),
    )
    # mode of a sorted array = longest run of equal neighbors: one fold
    # with (prev, run, best) struct state
    top_bg = F.expr(
        "aggregate(array_sort(__bigrams),"
        " struct(CAST('' AS STRING) AS prev, 0L AS run, 0L AS best),"
        " (acc, x) -> struct(x AS prev,"
        "   CASE WHEN x = acc.prev THEN acc.run + 1 ELSE 1 END AS run,"
        "   greatest(acc.best,"
        "     CASE WHEN x = acc.prev THEN acc.run + 1 ELSE 1 END) AS best),"
        " acc -> acc.best)"
    )
    return base.select(
        id_col,
        "n_tokens",
        "n_distinct_tokens",
        F.round(
            1.0
            - F.col("n_distinct_tokens")
            / F.greatest(F.col("n_tokens"), F.lit(1)),
            6,
        ).alias("dup_token_frac"),
        F.round(
            top_bg / F.greatest(F.size("__bigrams"), F.lit(1)), 6
        ).alias("top_bigram_frac"),
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k terms per document by tf·idf — the inverted-index shape.

    tf = term count in the doc; idf = ln((N+1)/(df+1)) + 1 (smoothed,
    sklearn-style); score = tf·idf, ranked per doc (score desc, term asc —
    deterministic). Every number is a per-row product of exactly two
    deterministic doubles (no float accumulation), so the result is
    engine-portable and oracle-checkable.

    Plan at scale: explode → (doc, term) count [partial+final agg] →
    term doc-frequency [map-side-combinable count on the term key the
    previous agg already produced] → join tf×idf on term (vocab is tiny
    next to the posting list — broadcasts under the gate) → per-doc top-k
    window keyed on doc_id. Three uniform-key shuffles, no skew hazard
    beyond stopword terms, which the idf weighting already demotes —
    cap-filter terms by df first if a true stopword explosion matters.

    Returns (id_col, term, tf, score, rank).
    """
    from pyspark.sql import Window

    # the (doc, term) posting list feeds BOTH the doc-frequency aggregate
    # and the scoring join — without a barrier the tokenize+explode+agg
    # pipeline (the expensive part at corpus scale) runs twice. Lazy
    # localCheckpoint instead of persist(): same reuse, but the blocks
    # are released by ContextCleaner when the caller drops the result
    # rather than pinned in the cache manager for the session lifetime.
    tf = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .where(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(docfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("__n") + 1.0) / (F.col("df") + 1.0))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "score", "rank")
    )


def _marker_hit(words):
    """Single-arg HOF lambda factory (a 2-arg lambda would be interpreted
    as the (element, index) filter form)."""
    arr = F.array(*[F.lit(w) for w in words])
    return lambda t: F.array_contains(arr, t)


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document text-analysis profile — one pass, all JVM-side.

    Built as STAGED projections sharing `__toks`/raw-ratio columns instead
    of one flat select: the flat form inlines the tokenizer and ratio
    subtrees ~7× each, and the resulting whole-stage-codegen method costs
    ~14 s of Janino compilation before the first row moves (measured at
    sf0.1 — 10× the actual scan). Catalyst's CollapseProject keeps the
    stages separate because the shared exprs are non-cheap and
    multiply-referenced; values are bit-identical to the flat form."""
    c = F.col(text_col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    codes = sorted(LANG_MARKERS)
    staged = df.select(
        F.col(id_col),
        c.alias("__text"),
        F.length(c).alias("__len"),
        tokens(text_col).alias("__toks"),
    ).select(
        F.col(id_col),
        F.col("__len").alias("n_chars_computed"),
        F.size("__toks").alias("n_tokens"),
        (
            F.length(F.regexp_replace("__text", r"[A-Za-z0-9\s]", ""))
            / F.greatest(F.col("__len"), F.lit(1))
        ).alias("__praw"),
        (
            F.size(F.filter("__toks", lambda t: F.array_contains(sw, t)))
            / F.greatest(F.size("__toks"), F.lit(1))
        ).alias("__sraw"),
        *[
            F.size(
                F.filter("__toks", _marker_hit(LANG_MARKERS[code]))
            ).alias(f"__hits_{code}")
            for code in codes
        ],
        F.least(F.col("__len") / F.lit(500.0), F.lit(1.0)).alias("__len_score"),
        F.md5(
            F.regexp_replace(F.lower(F.trim(F.col("__text"))), r"\s+", " ")
        ).alias("fp"),
    ).withColumn(
        "__best",
        F.greatest(
            *[
                F.struct(
                    F.col(f"__hits_{code}").alias("n"), F.lit(code).alias("code")
                )
                for code in codes
            ]
        ),
    )
    return staged.select(
        F.col(id_col),
        F.col("n_chars_computed"),
        F.col("n_tokens"),
        F.round("__praw", 6).alias("punct_ratio"),
        F.round("__sraw", 6).alias("stopword_ratio"),
        F.round(
            0.5 * F.col("__len_score")
            + 0.3 * F.least(F.col("__sraw") * 4.0, F.lit(1.0))
            + 0.2 * (1.0 - F.least(F.col("__praw") * 5.0, F.lit(1.0))),
            6,
        ).alias("quality"),
        F.when(F.col("__best")["n"] > 0, F.col("__best")["code"])
        .otherwise(F.lit("und"))
        .alias("lang_pred"),
        F.col("fp"),
    )
