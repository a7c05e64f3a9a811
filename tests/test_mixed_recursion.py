"""Mixed set + monotonic-aggregate recursion (fixpoint_mixed).

Covers the generalization the reference declares but leaves unimplemented:
mcount/msum additive aggregates (AggregateSetRDD.scala:146-148 "TODO
implement MCOUNT/MSUM") and mixed/mutual monotonic cliques — the
commented-out Attend program, AggregatesInRecursionQuerySuite.scala:97-142.
Expected answers come from independent pure-Python fixpoints computed in
each test.
"""

import pytest

from bigdatalog_spark import BigDatalogContext

from .conftest import run_case

# ----------------------------------------------------------- Attend (mcount)
# attend(X) <- organizer(X).
# attend(X) <- cntfriends(X,N), N >= 3.
# cntfriends(Y, mcount<X>) <- attend(X), friend(Y,X).
# (the reference's commented-out Attend test program)

ATTEND_DB = (
    "database({organizer(Name:string), friend(Name:string, Fname:string)})."
)
ATTEND_PROG = ATTEND_DB + (
    "attend(X) <- organizer(X)."
    "attend(X) <- cntfriends(X,N), N >= 3."
    "cntfriends(Y, mcount<X>) <- attend(X), friend(Y,X)."
)

ORGANIZERS = ["a", "b", "c"]
FRIENDS = [
    ("d", "a"), ("d", "b"), ("d", "c"),
    ("e", "a"), ("e", "b"),
    ("f", "b"), ("f", "c"), ("f", "d"),
    ("g", "e"), ("g", "f"), ("g", "d"),
]


def py_attend(organizers, friends, k=3):
    """Independent oracle: bootstrap-percolation fixpoint."""
    attend = set(organizers)
    while True:
        cnt = {}
        for y, x in set(friends):
            if x in attend:
                cnt[y] = cnt.get(y, 0) + 1
        new = attend | {y for y, n in cnt.items() if n >= k}
        if new == attend:
            return attend, cnt
        attend = new


def test_attend_mcount(spark):
    attend, cnt = py_attend(ORGANIZERS, FRIENDS)
    assert attend == {"a", "b", "c", "d", "f"}  # sanity of the oracle itself
    data = {
        "organizer": ORGANIZERS,
        "friend": [f"{y},{x}" for y, x in FRIENDS],
    }
    run_case(spark, ATTEND_PROG, "attend(A).", data,
             expected=[(x,) for x in attend])
    run_case(spark, ATTEND_PROG, "cntfriends(A,N).", data,
             expected=[(y, n) for y, n in cnt.items()])


def test_attend_bound_goal(spark):
    data = {
        "organizer": ORGANIZERS,
        "friend": [f"{y},{x}" for y, x in FRIENDS],
    }
    run_case(spark, ATTEND_PROG, "attend('f').", data, expected=[("f",)])
    run_case(spark, ATTEND_PROG, "attend('g').", data, expected=[])


# ----------------------------------------------------------- viral msum
# active(X) <- seed(X).
# active(Y) <- wsum(Y,S), S >= 10.
# wsum(Y, msum<W>) <- active(X), infl(X,Y,W).

MSUM_PROG = (
    "database({seed(X:integer), infl(X:integer, Y:integer, W:integer)})."
    "active(X) <- seed(X)."
    "active(Y) <- wsum(Y,S), S >= 10."
    "wsum(Y, msum<W>) <- active(X), infl(X,Y,W)."
)

# weights distinct per (Y,W) pair: msum ranges over the DISTINCT support set
# of (group, value) tuples, the classic DeALS premise
INFL = [(1, 3, 6), (2, 3, 5), (3, 4, 9), (1, 4, 2), (2, 5, 3)]
SEEDS = [1, 2]


def py_viral(seeds, infl, threshold=10):
    active = set(seeds)
    while True:
        support = {(y, w) for x, y, w in infl if x in active}
        sums = {}
        for y, w in support:
            sums[y] = sums.get(y, 0) + w
        new = active | {y for y, s in sums.items() if s >= threshold}
        if new == active:
            return active, sums
        active = new


def test_viral_msum(spark):
    active, sums = py_viral(SEEDS, INFL)
    assert active == {1, 2, 3, 4}  # oracle sanity
    data = {
        "seed": [str(s) for s in SEEDS],
        "infl": [f"{x},{y},{w}" for x, y, w in INFL],
    }
    run_case(spark, MSUM_PROG, "active(A).", data,
             expected=[(x,) for x in active])
    run_case(spark, MSUM_PROG, "wsum(A,S).", data,
             expected=[(y, s) for y, s in sums.items()])


# ------------------------------------------- mutual monotonic (even/odd mmin)

PARITY_PROG = (
    "database({s(X:integer), arc(X:integer, Y:integer, C:integer)})."
    "deven(X, mmin<D>) <- s(X), D=0."
    "deven(Y, mmin<D>) <- dodd(X,D1), arc(X,Y,C), D=D1+C."
    "dodd(Y, mmin<D>) <- deven(X,D1), arc(X,Y,C), D=D1+C."
)

PARITY_ARCS = [
    (1, 2, 1), (2, 3, 1), (3, 4, 1), (1, 3, 4), (2, 4, 5), (4, 1, 2),
    (3, 5, 2), (5, 2, 1),
]


def py_parity_dists(sources, arcs):
    """Shortest distance to each node over even-/odd-hop walks."""
    INF = float("inf")
    dist = {(x, 0): 0 for x in sources}
    changed = True
    while changed:
        changed = False
        for (x, p), d in list(dist.items()):
            for a, b, c in arcs:
                if a != x:
                    continue
                key, nd = (b, 1 - p), d + c
                if nd < dist.get(key, INF):
                    dist[key] = nd
                    changed = True
    even = {(n, d) for (n, p), d in dist.items() if p == 0}
    odd = {(n, d) for (n, p), d in dist.items() if p == 1}
    return even, odd


def test_mutual_monotonic_parity_sssp(spark):
    even, odd = py_parity_dists([1], PARITY_ARCS)
    data = {
        "s": ["1"],
        "arc": [f"{a},{b},{c}" for a, b, c in PARITY_ARCS],
    }
    run_case(spark, PARITY_PROG, "deven(A,D).", data, expected=sorted(even))
    run_case(spark, PARITY_PROG, "dodd(A,D).", data, expected=sorted(odd))


def test_attend_mcount_distributed(spark):
    """Same Attend program forced down the distributed fixpoint_mixed path
    (local single-task mode disabled)."""
    from bigdatalog_spark.datalog.context import EngineConfig

    attend, cnt = py_attend(ORGANIZERS, FRIENDS)
    ctx = BigDatalogContext(spark, EngineConfig(decomposable_local=False))
    ctx.load_program(ATTEND_PROG)
    ctx.register_data("organizer", ORGANIZERS)
    ctx.register_data("friend", [f"{y},{x}" for y, x in FRIENDS])
    got = {tuple(r) for r in ctx.query("attend(A).").collect()}
    assert got == {(x,) for x in attend}
    got_cnt = {tuple(r) for r in ctx.query("cntfriends(A,N).").collect()}
    assert got_cnt == set(cnt.items())


def test_viral_msum_distributed(spark):
    from bigdatalog_spark.datalog.context import EngineConfig

    active, sums = py_viral(SEEDS, INFL)
    ctx = BigDatalogContext(spark, EngineConfig(decomposable_local=False))
    ctx.load_program(MSUM_PROG)
    ctx.register_data("seed", [str(s) for s in SEEDS])
    ctx.register_data("infl", [f"{x},{y},{w}" for x, y, w in INFL])
    got = {r[0] for r in ctx.query("active(A).").collect()}
    assert got == active
    got_sums = {tuple(r) for r in ctx.query("wsum(A,S).").collect()}
    assert got_sums == set(sums.items())


# ----------------------------------- signed msum: cancelling contributions
# Regression for the support-set soundness hole: contributions +5 and -5 to
# one group cancel in a single iteration (table unchanged, nd == 0). The
# support set must STILL absorb them, or a later partial re-derivation of
# (group, +5) alone slips past the exceptAll and is counted a second time.

SIGNED_PROG = (
    "database({seed(X:integer), arc(X:integer, Y:integer),"
    " infl(X:integer, Y:integer, W:integer)})."
    "hop(X) <- seed(X)."
    "hop(Y) <- hop(X), arc(X,Y)."
    "wsum(Y, msum<W>) <- hop(X), infl(X,Y,W)."
    "active(Y) <- wsum(Y,S), S >= 4."
    "hop(Y) <- active(Y)."
)

# iter1 (hop delta {1}): support (9,1) -> wsum(9)=1
# iter2 (hop delta {2}): supports (9,5) and (9,-5) CANCEL -> wsum unchanged
# iter3 (hop delta {3}): re-derives (9,5) alone -> must NOT re-count
SIGNED_DATA = {
    "seed": ["1"],
    "arc": ["1,2", "2,3"],
    "infl": ["1,9,1", "2,9,5", "2,9,-5", "3,9,5"],
}
# distinct support set for group 9 is {1, 5, -5} -> msum = 1 (< 4, no active)
SIGNED_WSUM = [(9, 1)]


def test_signed_msum_cancellation_local(spark):
    run_case(spark, SIGNED_PROG, "wsum(A,S).", SIGNED_DATA, expected=SIGNED_WSUM)
    run_case(spark, SIGNED_PROG, "active(A).", SIGNED_DATA, expected=[])


def test_signed_msum_cancellation_distributed(spark):
    from bigdatalog_spark.datalog.context import EngineConfig

    ctx = BigDatalogContext(spark, EngineConfig(decomposable_local=False))
    ctx.load_program(SIGNED_PROG)
    for name, rows in SIGNED_DATA.items():
        ctx.register_data(name, rows)
    got = sorted(tuple(r) for r in ctx.query("wsum(A,S).").collect())
    assert got == SIGNED_WSUM
    assert ctx.query("active(A).").collect() == []


# ------------------------------------------------- mcount/msum outside recursion


def test_mcount_msum_stratified(spark):
    program = (
        "database({sale(Store:string, Item:string, Amt:integer)})."
        "items(S, mcount<I>) <- sale(S, I, A)."
        "volume(S, msum<A>) <- sale(S, I, A)."
    )
    data = {"sale": ["s1,x,5", "s1,x,5", "s1,y,7", "s2,z,5", "s2,z,9"]}
    # mcount/msum over the DISTINCT support set: duplicates collapse
    run_case(spark, program, "items(S,N).", data,
             expected=[("s1", 2), ("s2", 1)])
    run_case(spark, program, "volume(S,V).", data,
             expected=[("s1", 12), ("s2", 14)])


# ------------------------------------------------------- null-key convergence


def test_monotonic_null_key_converges(spark):
    """A NULL group key must merge into its group (null-safe joins), not
    re-qualify as 'new' every iteration."""
    from bigdatalog_spark.datalog.fixpoint import (
        FixpointConfig,
        fixpoint_monotonic,
    )

    seed = spark.createDataFrame([(None, 5), ("a", 3)], "k string, v int")

    def step(all_df, delta_df):
        return delta_df  # re-derives the same contributions every iteration

    cfg = FixpointConfig(max_iterations=10)
    out = fixpoint_monotonic(seed, step, ["k"], "v", "mmin", cfg)
    assert {(r.k, r.v) for r in out.collect()} == {(None, 5), ("a", 3)}


def test_mixed_mmin_null_key_converges(spark):
    from bigdatalog_spark.datalog.fixpoint import (
        AggSpec,
        FixpointConfig,
        fixpoint_mixed,
    )

    seed = spark.createDataFrame([(None, 5), ("a", 3)], "k string, v int")

    def step(all_dfs, delta_dfs):
        return {"m": delta_dfs["m"]}

    cfg = FixpointConfig(max_iterations=10)
    out = fixpoint_mixed(
        {"m": seed}, step, {"m": AggSpec(["k"], "v", "mmin")}, cfg
    )
    assert {(r.k, r.v) for r in out["m"].collect()} == {(None, 5), ("a", 3)}


def test_mixed_additive_null_key_merges(spark):
    """mcount with a NULL key: the full-outer merge must produce ONE row for
    the null-key group, and the changed-group delta must include it."""
    from bigdatalog_spark.datalog.fixpoint import (
        AggSpec,
        FixpointConfig,
        fixpoint_mixed,
    )

    seed = spark.createDataFrame([(None, 5), ("a", 3)], "k string, v int")
    extra = spark.createDataFrame([(None, 7)], "k string, v int")

    def step(all_dfs, delta_dfs):
        # same contribution every iteration: the (null-safe) support
        # anti-join must recognize it as already counted and converge
        return {"c": extra}

    cfg = FixpointConfig(max_iterations=10)
    out = fixpoint_mixed(
        {"c": seed}, step, {"c": AggSpec(["k"], "v", "mcount")}, cfg
    )
    assert {(r.k, r.v) for r in out["c"].collect()} == {(None, 2), ("a", 1)}


# ------------------------------------------------------- semantic validation


def test_stratified_agg_in_clique_rejected(spark):
    from bigdatalog_spark.datalog.semantics import DatalogSemanticError

    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({arc(X:integer, Y:integer)})."
        "p(X) <- arc(X, _)."
        "p(X) <- q(X, N), N > 1."
        "q(Y, count<X>) <- p(X), arc(X, Y)."
    )
    with pytest.raises(DatalogSemanticError):
        ctx.query("p(A).")


def test_agg_and_plain_rules_mixed_rejected(spark):
    from bigdatalog_spark.datalog.semantics import DatalogSemanticError

    ctx = BigDatalogContext(spark)
    ctx.load_program(
        "database({arc(X:integer, Y:integer)})."
        "q(X, Y) <- arc(X, Y)."
        "q(Y, mcount<X>) <- q(X, _), arc(X, Y)."
    )
    with pytest.raises(DatalogSemanticError):
        ctx.query("q(A,B).")
