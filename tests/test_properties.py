"""Property-based correctness: the Datalog engine vs pure-Python oracles on
random inputs (hypothesis). Golden tests pin known answers; these pin the
*algebra* — fixpoint semantics must match a naive driver-side closure for
any graph, and stratified aggregates must match Python's.

Each property runs a reduced number of examples (Spark round-trips are
~100 ms each) with a fixed seed for determinism.
"""

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings, strategies as st

from bigdatalog_spark.datalog.context import BigDatalogContext

EDGE = st.tuples(st.integers(0, 7), st.integers(0, 7))
EDGES = st.lists(EDGE, min_size=1, max_size=25, unique=True)

PROP = settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def py_closure(edges):
    tc = set(edges)
    while True:
        new = {(a, d) for (a, b) in tc for (c, d) in edges if b == c} - tc
        if not new:
            return tc
        tc |= new


def py_reachable(edges, src):
    seen, frontier = {src}, {src}
    while frontier:
        frontier = {d for (s, d) in edges if s in frontier} - seen
        seen |= frontier
    return seen


def py_sssp(edges, src):
    """weights: w = 1 + dst % 3 (same convention as the engine query)"""
    import heapq

    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append((d, 1 + d % 3))
    dist = {src: 0}
    heap = [(0, src)]
    while heap:
        dv, v = heapq.heappop(heap)
        if dv > dist.get(v, float("inf")):
            continue
        for d, w in adj.get(v, []):
            nd = dv + w
            if nd < dist.get(d, float("inf")):
                dist[d] = nd
                heapq.heappush(heap, (nd, d))
    return dist


def _tc_ctx(spark, edges):
    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({arc(S:integer, D:integer)})."
        "tc(A,B) <- arc(A,B)."
        "tc(A,B) <- tc(A,C), arc(C,B)."
    )
    ctx.register_data("arc", [f"{s},{d}" for s, d in edges])
    return ctx


@PROP
@given(edges=EDGES)
def test_tc_matches_python_closure(spark, edges):
    got = {(r[0], r[1]) for r in _tc_ctx(spark, edges).query("tc(A,B).").collect()}
    assert got == py_closure(edges)


@PROP
@given(edges=EDGES)
def test_nonlinear_tc_equals_linear_tc(spark, edges):
    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({arc(S:integer, D:integer)})."
        "tc(A,B) <- arc(A,B)."
        "tc(A,B) <- tc(A,C), tc(C,B)."
    )
    ctx.register_data("arc", [f"{s},{d}" for s, d in edges])
    got = {(r[0], r[1]) for r in ctx.query("tc(A,B).").collect()}
    assert got == py_closure(edges)


@PROP
@given(edges=EDGES)
def test_reach_matches_python_bfs(spark, edges):
    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({arc(S:integer, D:integer)})."
        "reach(X) <- X = 0."
        "reach(Y) <- reach(X), arc(X,Y)."
    )
    ctx.register_data("arc", [f"{s},{d}" for s, d in edges])
    got = {r[0] for r in ctx.query("reach(X).").collect()}
    assert got == py_reachable(edges, 0)


@PROP
@given(edges=EDGES)
def test_mmin_sssp_matches_dijkstra(spark, edges):
    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({arc(S:integer, D:integer, W:integer)})."
        "sp(X, mmin<C>) <- X = 0, C = 0."
        "sp(Y, mmin<C>) <- sp(X, C1), arc(X, Y, W), C = C1 + W."
    )
    ctx.register_data("arc", [f"{s},{d},{1 + d % 3}" for s, d in edges])
    got = {(r[0], r[1]) for r in ctx.query("sp(X,C).").collect()}
    assert got == set(py_sssp(edges, 0).items())


@PROP
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-50, 50)),
        min_size=1,
        max_size=30,
    )
)
def test_grouped_aggregates_match_python(spark, rows):
    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({t(K:integer, V:integer)})."
        "s(K, sum<V>) <- t(K, V)."
    )
    ctx.register_data("t", [f"{k},{v}" for k, v in rows])
    got = {(r[0], r[1]) for r in ctx.query("s(K,S).").collect()}
    # base relations are BAGS, as loaded (reference: loadRowRDDFromFile
    # performs no dedup, Utilities.scala:85-114) — duplicate facts count
    want = {}
    for k, v in rows:
        want[k] = want.get(k, 0) + v
    assert got == set(want.items())


@PROP
@given(
    people=st.lists(st.integers(0, 9), min_size=1, max_size=12, unique=True),
    orders=st.lists(st.integers(0, 9), min_size=0, max_size=12, unique=True),
)
def test_negation_matches_set_difference(spark, people, orders):
    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({p(X:integer), o(X:integer)})."
        "nop(X) <- p(X), ~o(X)."
    )
    ctx.register_data("p", [str(x) for x in people])
    ctx.register_data("o", [str(x) for x in orders] or ["-99"])
    got = {r[0] for r in ctx.query("nop(X).").collect()}
    assert got == set(people) - set(orders)


@PROP
@given(
    xs=st.lists(st.integers(-20, 20), min_size=1, max_size=15),
    ys=st.lists(st.integers(-20, 20), min_size=1, max_size=15),
)
def test_multi_rule_union_has_set_semantics(spark, xs, ys):
    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({a(X:integer), b(X:integer)})."
        "u(X) <- a(X)."
        "u(X) <- b(X)."
    )
    ctx.register_data("a", [str(x) for x in xs])
    ctx.register_data("b", [str(y) for y in ys])
    rows = [r[0] for r in ctx.query("u(X).").collect()]
    assert sorted(rows) == sorted(set(xs) | set(ys))  # distinct, complete


@PROP
@given(edges=EDGES)
def test_min_over_recursion_stratum(spark, edges):
    """Stratified min<> over a fixpoint result (AggregatesOverRecursion
    shape): smallest reachable vertex per source."""
    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({arc(S:integer, D:integer)})."
        "tc(A,B) <- arc(A,B)."
        "tc(A,B) <- tc(A,C), arc(C,B)."
        "m(A, min<B>) <- tc(A,B)."
    )
    ctx.register_data("arc", [f"{s},{d}" for s, d in edges])
    got = {(r[0], r[1]) for r in ctx.query("m(A,B).").collect()}
    closure = py_closure(edges)
    want = {}
    for a, b in closure:
        want[a] = min(want.get(a, b), b)
    assert got == set(want.items())


# ---------------------------------------- local vs distributed path parity

def _paths_ctxs(spark, prog, data):
    from bigdatalog_spark.datalog.context import EngineConfig

    out = []
    for cfg in (EngineConfig(), EngineConfig(decomposable_local=False)):
        ctx = BigDatalogContext(spark, cfg)
        ctx.load_program(prog)
        for name, rows in data.items():
            ctx.register_data(name, rows)
        out.append(ctx)
    return out


@PROP
@given(edges=EDGES)
def test_nonlinear_tc_local_equals_distributed(spark, edges):
    """The single-slice non-linear local loop and the distributed
    semi-naive loop must agree on ANY graph."""
    prog = (
        "database({arc(S:integer, D:integer)})."
        "tc(A,B) <- arc(A,B)."
        "tc(A,B) <- tc(A,C), tc(C,B)."
    )
    data = {"arc": [f"{s},{d}" for s, d in edges]}
    local, dist = _paths_ctxs(spark, prog, data)
    got_l = {tuple(r) for r in local.query("tc(A,B).").collect()}
    got_d = {tuple(r) for r in dist.query("tc(A,B).").collect()}
    assert got_l == got_d == py_closure(edges)


@PROP
@given(edges=EDGES)
def test_mutual_clique_driver_tier_three_way_parity(spark, edges):
    """Mutual even/odd on ANY graph: the driver tier (single-tuple seed,
    empty-exit tag for `odd`), the in-task seed-broadcast loop, and the
    distributed fixpoint must all match a Python BFS by hop parity."""
    from bigdatalog_spark.datalog.context import EngineConfig

    prog = (
        "database({arc(S:integer, D:integer)})."
        "even(X) <- X = 0."
        "odd(Y) <- even(X), arc(X,Y)."
        "even(Y) <- odd(X), arc(X,Y)."
    )
    data = {"arc": [f"{s},{d}" for s, d in edges]}
    got = []
    for cfg in (
        EngineConfig(),
        EngineConfig(driver_local=False),
        EngineConfig(decomposable_local=False),
    ):
        ctx = BigDatalogContext(spark, cfg)
        ctx.load_program(prog)
        ctx.register_data("arc", data["arc"])
        got.append({r[0] for r in ctx.query("even(X).").collect()})
    even, frontier = {0}, {0}
    odd = set()
    while frontier:
        nxt = {d for (s, d) in edges if s in frontier} - odd
        odd |= nxt
        frontier = {d for (s, d) in edges if s in nxt} - even
        even |= frontier
    assert got[0] == got[1] == got[2] == even


@PROP
@given(edges=EDGES)
def test_mcount_driver_tier_three_way_parity(spark, edges):
    """Mixed mcount clique (always single-task): driver tier vs in-task vs
    distributed vs a Python in-degree count."""
    from bigdatalog_spark.datalog.context import EngineConfig

    prog = (
        "database({arc(S:integer, D:integer)})."
        "deg(Y,mcount<X>) <- arc(X,Y)."
        "hub(Y) <- deg(Y,N), N >= 2."
        "deg(Z,mcount<W>) <- hub(Y), arc(Y,Z), W = Y + 100."
    )
    got = []
    for cfg in (
        EngineConfig(),
        EngineConfig(driver_local=False),
        EngineConfig(decomposable_local=False),
    ):
        ctx = BigDatalogContext(spark, cfg)
        ctx.load_program(prog)
        ctx.register_data("arc", [f"{s},{d}" for s, d in edges])
        got.append({tuple(r) for r in ctx.query("deg(Y,N).").collect()})
    # python fixpoint: mcount counts DISTINCT contribution tuples (group,
    # value); hub contributions live in a disjoint value space (Y + 100),
    # so crossing the ≥2 threshold cascades through real recursion
    support = {}
    for s, d in edges:
        support.setdefault(d, set()).add(s)
    while True:
        hubs = {y for y, sup in support.items() if len(sup) >= 2}
        added = False
        for y in hubs:
            for s, d in edges:
                if s == y and y + 100 not in support.setdefault(d, set()):
                    support[d].add(y + 100)
                    added = True
        if not added:
            break
    want = {(y, len(sup)) for y, sup in support.items()}
    assert got[0] == got[1] == got[2] == want


@PROP
@given(edges=EDGES)
def test_apsp_mmin_local_equals_distributed(spark, edges):
    """Non-linear monotonic (APSP) parity across evaluation paths, against
    a Floyd-Warshall oracle (weights w = 1 + dst % 3)."""
    prog = (
        "database({arc(S:integer, D:integer, W:integer)})."
        "p(X,Y,mmin<D>) <- arc(X,Y,D)."
        "p(X,Y,mmin<D>) <- p(X,Z,D1), p(Z,Y,D2), D=D1+D2."
    )
    weighted = [(s, d, 1 + d % 3) for s, d in edges]
    data = {"arc": [f"{s},{d},{w}" for s, d, w in weighted]}
    nodes = sorted({x for s, d in edges for x in (s, d)})
    INF = float("inf")
    dist = {}
    for s, d, w in weighted:
        dist[(s, d)] = min(dist.get((s, d), INF), w)
    for k in nodes:
        for i in nodes:
            for j in nodes:
                nd = dist.get((i, k), INF) + dist.get((k, j), INF)
                if nd < dist.get((i, j), INF):
                    dist[(i, j)] = nd
    want = {(a, b, v) for (a, b), v in dist.items()}
    local, distr = _paths_ctxs(spark, prog, data)
    got_l = {tuple(r) for r in local.query("p(X,Y,D).").collect()}
    got_d = {tuple(r) for r in distr.query("p(X,Y,D).").collect()}
    assert got_l == got_d == want


# ----------------------------- mcount/msum mixed fixpoint: 3-path parity
# The mixed set+monotonic-aggregate fixpoint is the most intricate engine
# code (datalog/fixpoint.py fused merge+delta); this property sweeps random
# SIGNED msum contributions through all three evaluation paths — the
# in-task pandas loop, the loop forced across the growth-bailout boundary
# into the distributed reroute, and the plain distributed fixpoint — and
# requires identical tables from each, plus agreement with a round-
# simultaneous python oracle.

SIGNED_MSUM_PROG = (
    "database({seed(X:integer), arc(X:integer, Y:integer),"
    " infl(X:integer, Y:integer, W:integer)})."
    "hop(X) <- seed(X)."
    "hop(Y) <- hop(X), arc(X,Y)."
    "wsum(Y, msum<W>) <- hop(X), infl(X,Y,W)."
    "active(Y) <- wsum(Y,S), S >= 4."
    "hop(Y) <- active(Y)."
)

INFL_T = st.tuples(
    st.integers(0, 7), st.integers(0, 11), st.integers(-6, 6)
)


def py_signed_msum(seeds, arcs, infl, thr=4):
    """Round-simultaneous oracle: per round, hop grows by arc steps and by
    groups whose DISTINCT-support msum crosses the threshold (support =
    distinct (group, weight) pairs contributed by current hops; activation
    is permanent even if later negative weights drop the sum again)."""
    hop = set(seeds)
    while True:
        support = {(y, w) for x, y, w in infl if x in hop}
        sums = {}
        for y, w in support:
            sums[y] = sums.get(y, 0) + w
        new = (
            hop
            | {d for (s, d) in arcs if s in hop}
            | {y for y, s in sums.items() if s >= thr}
        )
        if new == hop:
            return hop, sums
        hop = new


@given(
    arcs=st.lists(EDGE, min_size=0, max_size=15, unique=True),
    infl=st.lists(INFL_T, min_size=1, max_size=20, unique=True),
    seeds=st.lists(st.integers(0, 7), min_size=1, max_size=3, unique=True),
)
@PROP
def test_signed_msum_three_path_parity(spark, arcs, infl, seeds):
    from bigdatalog_spark.datalog.context import EngineConfig

    hop, sums = py_signed_msum(seeds, arcs, infl)
    data = {
        "seed": [str(s) for s in seeds],
        "arc": [f"{a},{b}" for a, b in arcs],
        "infl": [f"{x},{y},{w}" for x, y, w in infl],
    }
    results = []
    for cfg in (
        EngineConfig(),  # in-task pandas loop (seed gate admits)
        # budget of max(1·seed, 1) rows: any derivation forces the
        # in-task loop over the growth boundary -> distributed reroute
        EngineConfig(local_growth_factor=1, local_growth_floor=1),
        EngineConfig(decomposable_local=False),  # plain distributed
    ):
        ctx = BigDatalogContext(spark, cfg)
        ctx.load_program(SIGNED_MSUM_PROG)
        for name, rows in data.items():
            ctx.register_data(name, rows)
        got_hop = {r[0] for r in ctx.query("hop(A).").collect()}
        got_sums = {tuple(r) for r in ctx.query("wsum(A,S).").collect()}
        results.append((got_hop, got_sums))
    assert results[0] == results[1] == results[2]
    assert results[0][0] == hop
    assert results[0][1] == set(sums.items())


# --------------------------------------------------- n-gram Jaccard algebra

WORD = st.sampled_from(["a", "b", "c", "aa", "ab"])
DOC = st.lists(WORD, min_size=0, max_size=6)


def py_jaccard_pairs(docs, n, threshold, max_df=None):
    """Pure-Python oracle: shingle-set Jaccard over the (optionally
    df-capped) shingle space — the exact contract ngram_jaccard_pairs
    documents (cap drops hot shingles from intersection AND sizes)."""
    sets = {}
    for i, words in docs:
        sh = {tuple(words[j : j + n]) for j in range(len(words) - n + 1)}
        if sh:
            sets[i] = sh
    if max_df is not None:
        from collections import Counter

        df = Counter(s for ss in sets.values() for s in ss)
        hot = {s for s, c in df.items() if c > max_df}
        sets = {i: ss - hot for i, ss in sets.items()}
    out = set()
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sets[a] & sets[b])
            if not inter:
                continue
            j = inter / len(sets[a] | sets[b])
            if round(j, 6) >= threshold:
                out.add((a, b, round(j, 6)))
    return out


@given(docs=st.lists(DOC, min_size=2, max_size=6))
@PROP
def test_ngram_jaccard_matches_python_model(spark, docs):
    from bigdatalog_spark.operators.dedup import ngram_jaccard_pairs

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for max_df in (None, 2):
        got = {
            (r.left_id, r.right_id, r.jaccard)
            for r in ngram_jaccard_pairs(
                df, n=2, threshold=0.3, max_doc_freq=max_df
            ).collect()
        }
        want = py_jaccard_pairs(list(enumerate(docs)), 2, 0.3, max_df)
        assert got == want


# ---------------------------------------------------- dedup_chunks algebra

def py_dedup_chunks(docs, chunk_words, max_docs):
    """Pure-Python oracle for operators/corpus.dedup_chunks: split each
    doc into non-overlapping chunk_words-word chunks, drop chunks whose
    DISTINCT-doc frequency exceeds max_docs, reassemble in order."""
    from collections import Counter

    def chunks_of(text):
        words = (text or "").split(" ")
        n = -(-len(words) // chunk_words)  # ceil
        return [
            " ".join(words[i * chunk_words : (i + 1) * chunk_words])
            for i in range(n)
        ]

    per_doc = {i: chunks_of(t) for i, t in docs}
    df = Counter()
    for cs in per_doc.values():
        for c in set(cs):
            df[c] += 1
    hot = {c for c, k in df.items() if k > max_docs}
    out = {}
    for i, cs in per_doc.items():
        kept = [c for c in cs if c not in hot]
        out[i] = (" ".join(kept), len(cs), len(cs) - len(kept))
    return out


@given(
    docs=st.lists(DOC, min_size=2, max_size=6),
    chunk_words=st.integers(1, 3),
)
@PROP
def test_dedup_chunks_matches_python_model(spark, docs, chunk_words):
    from bigdatalog_spark.operators.corpus import dedup_chunks

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.text_clean, r.n_chunks, r.n_removed)
        for r in dedup_chunks(df, chunk_words=chunk_words, max_docs=1).collect()
    }
    want = py_dedup_chunks(
        [(i, " ".join(w)) for i, w in enumerate(docs)], chunk_words, 1
    )
    assert got == want


# ----------------------------------------------- simhash pigeonhole recall

def py_simhash(words, nbits=64):
    """Portable-md5 simhash reproduced in pure Python (hashlib md5 first
    15 hex chars == Spark's portable_hash64)."""
    import hashlib

    sums = [0] * nbits
    for w in words:
        h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
        for i in range(nbits):
            sums[i] += 1 if (h >> i) & 1 else -1
    fp = 0
    for i in range(nbits):
        if sums[i] > 0:
            fp |= 1 << i
    return fp


@given(docs=st.lists(st.lists(WORD, min_size=1, max_size=6),
                     min_size=2, max_size=5))
@PROP
def test_simhash_block_join_equals_full_pairwise(spark, docs):
    """The block trick's pigeonhole recall is EXACTLY 1: the bucketed
    join must return the same pair set as brute-force hamming ≤ 3 over
    fingerprints computed independently in Python."""
    from bigdatalog_spark.operators.dedup import simhash_pairs

    rows = [(i, " ".join(w)) for i, w in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.left_id, r.right_id)
        for r in simhash_pairs(df, max_hamming=3,
                               hash_fn="portable_md5").collect()
    }
    fps = {i: py_simhash(w) for i, w in enumerate(docs)}
    want = {
        (a, b)
        for a in fps for b in fps
        if a < b and bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    assert got == want


# ----------------------------------------------- q-gram fuzzy join recall

def py_lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


NAME = st.text(alphabet="abcd", min_size=1, max_size=9)


@given(names=st.lists(NAME, min_size=2, max_size=8, unique=True))
@PROP
def test_qgram_fuzzy_pairs_exact_recall(spark, names):
    """Blocking must not lose pairs: q-gram candidates + the short-string
    fallback verify to EXACTLY the brute-force levenshtein ≤ d set —
    including strings under the q·(d+1) count-filter bound."""
    from bigdatalog_spark.operators.dedup import qgram_fuzzy_pairs

    df = spark.createDataFrame([(n,) for n in names], ["name"])
    got = {
        (r.left_name, r.right_name, r.dist)
        for r in qgram_fuzzy_pairs(df, col="name", max_dist=2).collect()
    }
    want = {
        (a, b, py_lev(a, b))
        for a in names for b in names
        if a < b and py_lev(a, b) <= 2
    }
    assert got == want


# ----------------------------------------------- magic sets vs python model

SG_EDGES = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)),
    min_size=1, max_size=12, unique=True,
)


def py_sg(up, flat, down):
    """Naive fixpoint of sg(X,Y) <- flat(X,Y);
    sg(X,Y) <- up(X,X1), sg(X1,Y1), down(Y1,Y)."""
    sg = set(flat)
    while True:
        new = set()
        for (x, x1) in up:
            for (sx, sy) in sg:
                if sx != x1:
                    continue
                for (y1, y) in down:
                    if y1 == sy:
                        new.add((x, y))
        new -= sg
        if not new:
            return sg
        sg |= new


@given(up=SG_EDGES, flat=SG_EDGES, down=SG_EDGES,
       c=st.integers(0, 7), pos=st.sampled_from([0, 1]))
@PROP
def test_magic_bound_sg_matches_python_model(spark, up, flat, down, c, pos):
    """The magic-sets demand transformation (context._magic_bound_df, the
    path a bound goal on a NON-stable position takes) must equal
    filter-after-full-fixpoint for ANY graph and bound constant — pinned
    against an independent Python naive fixpoint, for both bound
    positions of the same-generation shape."""
    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({up(A:integer, B:integer), flat(A:integer, B:integer),"
        " down(A:integer, B:integer)})."
        "sg(X,Y) <- flat(X,Y)."
        "sg(X,Y) <- up(X,X1), sg(X1,Y1), down(Y1,Y)."
    )
    ctx.register_data("up", [f"{a},{b}" for a, b in up])
    ctx.register_data("flat", [f"{a},{b}" for a, b in flat])
    ctx.register_data("down", [f"{a},{b}" for a, b in down])
    goal = f"sg({c},Y)." if pos == 0 else f"sg(X,{c})."
    got = sorted(tuple(r) for r in ctx.query(goal).collect())
    full = py_sg(up, flat, down)
    want = sorted(
        (a, b) for (a, b) in full if (a == c if pos == 0 else b == c)
    )
    assert got == want


# --------------------------------------- k-core / CC distributed loops

def py_kcore(edges, k):
    """Simultaneous peeling on the undirected simple graph."""
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    while True:
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        dead = {v for v, d in deg.items() if d < k}
        if not dead:
            break
        es = {(a, b) for a, b in es if a not in dead and b not in dead}
    deg = {}
    for a, b in es:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return deg


def py_components(edges):
    """(vertex -> min vertex id of its component), undirected."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


KCORE_PROP = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(edges=st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)),
                      min_size=1, max_size=40, unique=True),
       k=st.sampled_from([2, 3]))
@KCORE_PROP
def test_kcore_distributed_matches_python_peeling(spark, edges, k):
    """k_core FORCED onto the distributed rounds (local_max_edges=0 — the
    checkpoint-per-round window-form peel loop) equals a Python
    simultaneous-peel model for any graph and k."""
    from bigdatalog_spark.operators.graph import k_core

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        (r.vertex, r.degree)
        for r in k_core(df, k=k, local_max_edges=0).collect()
    }
    assert got == set(py_kcore(edges, k).items())


@given(edges=st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)),
                      min_size=1, max_size=40, unique=True))
@KCORE_PROP
def test_cc_distributed_matches_python_union_find(spark, edges):
    """connected_components_fast FORCED onto the distributed star-
    contraction rounds equals a Python union-find min-label model."""
    from bigdatalog_spark.operators.graph import connected_components_fast

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        (r.vertex, r.component)
        for r in connected_components_fast(df, local_max_edges=0).collect()
    }
    assert got == set(py_components(edges).items())


# --------------------------------------------- winnowing numpy kernel

def py_winnow(text, k, window):
    """Reference winnowing model, straight from the SIGMOD'03 definition:
    normalize (lower + strip non-[a-z0-9]), hash every char k-gram with
    the polynomial B=131 mod M=2^31-1, take each length-`window` window's
    minimum hash, dedupe. Pure Python, no numpy."""
    import re

    t = re.sub(r"[^a-z0-9]", "", text.lower())
    if len(t) < k:
        return set()
    B, M = 131, 2147483647
    hashes = []
    for i in range(len(t) - k + 1):
        h = 0
        for ch in t[i : i + k]:
            h = (h * B + ord(ch)) % M
        hashes.append(h)
    if len(hashes) < window:
        return set()
    return {
        min(hashes[i : i + window]) for i in range(len(hashes) - window + 1)
    }


# printable ASCII plus multibyte chars exercises the normalization strip
# (accented/han/emoji all drop out) without betting on exotic-codepoint
# lowercase agreement between Python and the JVM
WINNOW_TEXT = st.text(
    alphabet="abcXYZ019 .,!-éÉ漢😀",
    min_size=0,
    max_size=40,
)

WINNOW_PROP = settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    texts=st.lists(WINNOW_TEXT, min_size=1, max_size=5),
    k=st.integers(1, 6),
    window=st.integers(1, 5),
)
@WINNOW_PROP
def test_winnowing_kernel_matches_python_model(spark, texts, k, window):
    """The Arrow/numpy winnowing kernel (stride-view matmul mod M +
    row-min) must produce the exact fingerprint set of the pure-Python
    SIGMOD'03 model for any text, k, and window — including docs shorter
    than k (no k-grams), shorter than k + window - 1 (no complete
    window), empty-after-normalization docs, and multibyte chars the
    normalization strips."""
    from bigdatalog_spark.functions.text import winnowing_fingerprints

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        (r.doc_id, r.fp)
        for r in winnowing_fingerprints(df, k=k, window=window).collect()
    }
    want = {
        (i, fp) for i, t in enumerate(texts) for fp in py_winnow(t, k, window)
    }
    assert got == want


# ------------------------------- generalized magic (non-linear / mutual)

MAGIC_GEN_PROP = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(edges=EDGES, c=st.integers(0, 7))
@MAGIC_GEN_PROP
def test_magic_bound_nonlinear_tc_matches_python_model(spark, edges, c):
    """A bound goal on NON-LINEAR TC takes the generalized adorned
    demand path (context._magic_bound_general — the transformed program
    is mutually recursive magic ⇄ guarded); its answer must equal
    filter-after-full-fixpoint for any graph and bound constant."""
    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({arc(S:integer, D:integer)})."
        "tc(A,B) <- arc(A,B)."
        "tc(A,B) <- tc(A,C), tc(C,B)."
    )
    ctx.register_data("arc", [f"{a},{b}" for a, b in edges])
    got = sorted(r[1] for r in ctx.query(f"tc({c},B).").collect())
    # the demand path must actually have fired (this shape always admits it)
    assert any(k.startswith("__magic_tc") for k in ctx._cache), sorted(
        ctx._cache
    )
    want = sorted(b for (a, b) in py_closure(edges) if a == c)
    assert got == want


def py_mutual_pq(a, b):
    """p = a ∪ (a ∘ q); q = b ∘ p — naive mutual fixpoint."""
    p, q = set(a), set()
    while True:
        np_ = {(x, y) for (x, z) in a for (z2, y) in q if z == z2} - p
        nq = {(x, y) for (x, z) in b for (z2, y) in p if z == z2} - q
        if not np_ and not nq:
            return p, q
        p |= np_
        q |= nq


@given(a=EDGES, b=EDGES, c=st.integers(0, 7))
@MAGIC_GEN_PROP
def test_magic_bound_mutual_matches_python_model(spark, a, b, c):
    """A bound goal on a MUTUAL clique (p/q alternating paths) takes the
    generalized adorned demand path, with per-predicate adornments; its
    answer must equal a naive Python mutual fixpoint filtered to the
    bound constant, for any pair of edge sets."""
    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({a(S:integer, D:integer), b(S:integer, D:integer)})."
        "p(X,Y) <- a(X,Y)."
        "p(X,Y) <- a(X,Z), q(Z,Y)."
        "q(X,Y) <- b(X,Z), p(Z,Y)."
    )
    ctx.register_data("a", [f"{x},{y}" for x, y in a])
    ctx.register_data("b", [f"{x},{y}" for x, y in b])
    got = sorted(tuple(r) for r in ctx.query(f"p({c},Y).").collect())
    assert any(k.startswith("__magic_p") for k in ctx._cache), sorted(
        ctx._cache
    )
    p_full, _ = py_mutual_pq(a, b)
    want = sorted((x, y) for (x, y) in p_full if x == c)
    assert got == want
