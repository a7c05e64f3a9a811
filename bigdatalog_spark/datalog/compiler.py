"""Rule → DataFrame compiler.

Re-expresses the reference's LogicalPlanGenerator
(/root/reference/datalog/src/main/scala/.../LogicalPlanGenerator.scala:63-427)
Spark-first: instead of emitting unresolved Catalyst nodes, each Datalog rule
body is compiled directly to DataFrame operations (joins from shared
variables, filters from comparisons/constants, projection from head args),
and Catalyst does predicate pushdown / join planning / codegen for free.

Canonical column naming: every IDB predicate's DataFrame has columns
``c0..c{arity-1}``; every atom occurrence gets fresh ``t{k}_{j}`` columns so
self-joins are never ambiguous.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .ast import (
    AggTerm,
    AnonVar,
    Arith,
    Atom,
    Comparison,
    Const,
    LimitSpec,
    Rule,
    SortSpec,
    Var,
)

# type-width ranking for harmonizing multi-rule unions
_NUM_RANK = {
    "tinyint": 0, "smallint": 1, "int": 2, "bigint": 3, "float": 4, "double": 5,
}


class DatalogCompileError(Exception):
    pass


def canon_cols(arity: int) -> list[str]:
    return [f"c{i}" for i in range(arity)]


@dataclass
class BodyResult:
    """Compiled rule body: a DataFrame + variable bindings + modifiers."""

    df: DataFrame
    env: dict  # var name -> column name in df
    sort: SortSpec | None = None
    limit: int | None = None


class RuleCompiler:
    """Compiles one rule body against a relation resolver.

    ``resolve(pred, occurrence_index)`` returns the DataFrame for the given
    body-atom occurrence — the fixpoint driver uses occurrence_index to swap
    in delta/all DataFrames for semi-naive variants (the reference's
    Linear/NonLinearRecursiveRelation leaves, execution/relations.scala:28-57).
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._occ = itertools.count()
        # optional (pred, positions) -> DataFrame|None hook: fixpoint loops
        # install it so a non-broadcastable static joined on known key
        # positions is swapped for a pre-shuffled + pre-sorted persisted
        # copy (the Spark analogue of the reference's once-built hashed
        # build side, ShuffleHashJoin.scala:35-88) — every iteration then
        # exchanges only the delta side
        self.static_shuffle = None

    # ------------------------------------------------------------ terms
    def _term_col(self, term, env: dict) -> Column:
        if isinstance(term, Var):
            if term.name not in env:
                raise DatalogCompileError(f"unbound variable {term.name}")
            return F.col(env[term.name])
        if isinstance(term, Const):
            return F.lit(term.value)
        if isinstance(term, Arith):
            left = self._term_col(term.left, env)
            right = self._term_col(term.right, env)
            if term.op == "+":
                return left + right
            if term.op == "-":
                return left - right
            if term.op == "*":
                return left * right
            if term.op == "/":
                return left / right
            raise DatalogCompileError(f"unknown arithmetic op {term.op!r}")
        if isinstance(term, AnonVar):
            raise DatalogCompileError("anonymous variable in expression position")
        raise DatalogCompileError(f"cannot compile term {term!r}")

    def _term_vars(self, term) -> set:
        if isinstance(term, Var):
            return {term.name}
        if isinstance(term, Arith):
            return self._term_vars(term.left) | self._term_vars(term.right)
        return set()

    def _bound(self, term, env: dict) -> bool:
        return all(v in env for v in self._term_vars(term))

    # ------------------------------------------------------------ atoms
    def _load_atom(self, atom: Atom, df: DataFrame) -> tuple[DataFrame, dict]:
        """Rename an atom's relation to fresh columns; apply constant filters
        and intra-atom repeated-variable equality; return (df, var->col)."""
        k = next(self._occ)
        src_cols = df.columns
        if len(src_cols) != atom.arity:
            raise DatalogCompileError(
                f"{atom.pred!r} arity {atom.arity} != relation width {len(src_cols)}"
            )
        names = [f"t{k}_{j}" for j in range(atom.arity)]
        out = df.select(
            *[F.col(s).alias(n) for s, n in zip(src_cols, names)]
        )
        env: dict[str, str] = {}
        conds: list[Column] = []
        for j, term in enumerate(atom.args):
            col = names[j]
            if isinstance(term, AnonVar):
                continue
            if isinstance(term, Var):
                if term.name in env:  # repeated var within the atom
                    conds.append(F.col(env[term.name]) == F.col(col))
                else:
                    env[term.name] = col
            elif isinstance(term, Const):
                conds.append(F.col(col) == F.lit(term.value))
            else:
                raise DatalogCompileError(
                    f"complex term {term} in body atom {atom.pred!r}"
                )
        for c in conds:
            out = out.filter(c)
        return out, env

    # ------------------------------------------------------------ body
    def compile_body(self, rule: Rule, resolve) -> BodyResult:
        """Compile the rule body into a single DataFrame.

        Literal processing order (reference folds joins left-to-right,
        LogicalPlanGenerator.scala:172-248; filters/negation become Filter /
        LeftAnti nodes): positive atoms in order → binding/filter
        comparisons (multi-pass until fixpoint) → negated atoms → sort/limit.
        """
        acc: DataFrame | None = None
        env: dict[str, str] = {}
        pending: list = []
        sort_spec: SortSpec | None = None
        limit_n: int | None = None
        # the first body atom, while acc is still exactly that one renamed
        # relation — a right-linear rule (static first, delta second) can
        # then swap the ACC side for the pre-shuffled static copy too
        first_atom: Atom | None = None

        occurrence = itertools.count()
        for lit in rule.body:
            if isinstance(lit, Atom) and not lit.negated:
                adf, aenv = self._load_atom(lit, resolve(lit.pred, next(occurrence)))
                if acc is None:
                    acc, env = adf, aenv
                    first_atom = lit
                else:
                    shared = [v for v in aenv if v in env]
                    if shared:
                        if self.static_shuffle is not None:
                            # join-key POSITIONS in each side's relation are
                            # now known — give the fixpoint a chance to swap
                            # in its pre-shuffled persisted copy of a large
                            # static (the hook returns None for clique
                            # preds, broadcastable statics, and non-statics)
                            if first_atom is not None:
                                apos = tuple(
                                    sorted(
                                        int(env[v].rsplit("_", 1)[1])
                                        for v in shared
                                    )
                                )
                                repl0 = self.static_shuffle(
                                    first_atom.pred, apos
                                )
                                if repl0 is not None:
                                    acc, env = self._load_atom(
                                        first_atom, repl0
                                    )
                            positions = tuple(
                                sorted(
                                    int(aenv[v].rsplit("_", 1)[1])
                                    for v in shared
                                )
                            )
                            repl = self.static_shuffle(lit.pred, positions)
                            if repl is not None:
                                adf, aenv = self._load_atom(lit, repl)
                        cond = None
                        for v in shared:
                            c = F.col(env[v]) == F.col(aenv[v])
                            cond = c if cond is None else (cond & c)
                        acc = acc.join(adf, on=cond, how="inner")
                    else:
                        acc = acc.crossJoin(adf)
                    for v, c in aenv.items():
                        env.setdefault(v, c)
                    first_atom = None
            elif isinstance(lit, SortSpec):
                sort_spec = lit
            elif isinstance(lit, LimitSpec):
                limit_n = lit.n
            else:
                pending.append(lit)

        if acc is None:
            # TUPLE operator — constant-only rule like reach(B) <- B=3.
            # (LogicalPlanGenerator.scala:410-424: single GenericInternalRow)
            acc = self.spark.range(1).select(F.lit(1).alias("_one"))

        # multi-pass over comparisons: bindings first as they become ready
        bind_counter = itertools.count()
        progress = True
        while pending and progress:
            progress = False
            remaining = []
            for lit in pending:
                if isinstance(lit, Comparison):
                    done, acc = self._apply_comparison(
                        lit, acc, env, bind_counter
                    )
                    if done:
                        progress = True
                    else:
                        remaining.append(lit)
                else:
                    remaining.append(lit)
            pending = remaining

        # negated atoms (anti-joins) — after positives/bindings so their
        # arguments are bound (NegationQuerySuite semantics)
        for lit in list(pending):
            if isinstance(lit, Atom) and lit.negated:
                acc = self._apply_negation(lit, acc, env, resolve)
                pending.remove(lit)

        # one more comparison pass (comparisons after negation in body order)
        for lit in pending:
            if isinstance(lit, Comparison):
                done, acc = self._apply_comparison(lit, acc, env, bind_counter)
                if not done:
                    raise DatalogCompileError(
                        f"cannot resolve comparison {lit} — unbound variables "
                        f"(env: {sorted(env)})"
                    )
            else:
                raise DatalogCompileError(f"unhandled body literal {lit}")

        return BodyResult(acc, env, sort_spec, limit_n)

    def _apply_comparison(
        self, lit: Comparison, acc: DataFrame, env: dict, counter
    ) -> tuple[bool, DataFrame]:
        lb, rb = self._bound(lit.left, env), self._bound(lit.right, env)
        if lit.op == "=":
            # assignment form: unbound var on one side, bound expr on other
            if isinstance(lit.left, Var) and lit.left.name not in env and rb:
                name = f"b{next(counter)}"
                acc = acc.withColumn(name, self._term_col(lit.right, env))
                env[lit.left.name] = name
                return True, acc
            if isinstance(lit.right, Var) and lit.right.name not in env and lb:
                name = f"b{next(counter)}"
                acc = acc.withColumn(name, self._term_col(lit.left, env))
                env[lit.right.name] = name
                return True, acc
        if not (lb and rb):
            return False, acc
        left = self._term_col(lit.left, env)
        right = self._term_col(lit.right, env)
        cond = {
            "=": left == right,
            "~=": left != right,
            "<": left < right,
            ">": left > right,
            "<=": left <= right,
            ">=": left >= right,
        }[lit.op]
        return True, acc.filter(cond)

    def _apply_negation(
        self, atom: Atom, acc: DataFrame, env: dict, resolve
    ) -> DataFrame:
        """~p(...) → LEFT ANTI join, the modern form of the reference's
        LeftOuter+IsNull compilation (LogicalPlanGenerator.scala:191-213)."""
        ndf, nenv = self._load_atom(atom, resolve(atom.pred, None))
        keys = [v for v in nenv if v in env]
        if not keys:
            raise DatalogCompileError(
                f"negated atom {atom} shares no bound variables with the body"
            )
        cond = None
        for v in keys:
            c = F.col(env[v]) == F.col(nenv[v])
            cond = c if cond is None else (cond & c)
        return acc.join(ndf, on=cond, how="left_anti")

    # ------------------------------------------------------------ head
    def project_head(self, rule: Rule, body: BodyResult, distinct: bool) -> DataFrame:
        """Project head args (PROJECT, LogicalPlanGenerator.scala:249-257) or
        aggregate (§2.4) onto canonical columns c0..cn."""
        df, env = body.df, body.env

        if body.sort is not None:
            orders = []
            for var, direction in body.sort.orders:
                if var not in env:
                    raise DatalogCompileError(f"sort on unbound variable {var}")
                c = F.col(env[var])
                orders.append(c.desc() if direction == "desc" else c.asc())
            df = df.orderBy(*orders)
        if body.limit is not None:
            df = df.limit(body.limit)

        agg_idx = [
            i for i, t in enumerate(rule.head.args) if isinstance(t, AggTerm)
        ]
        names = canon_cols(rule.head.arity)

        if not agg_idx:
            cols = [
                self._term_col(t, env).alias(n)
                for t, n in zip(rule.head.args, names)
            ]
            out = df.select(*cols)
            return out.distinct() if distinct else out

        # aggregate head: group by the non-agg args
        # (bag-of-derivations input — see MLM gross_profit: sum over all
        # body derivations, RecursiveQuerySuites.scala:169-173)
        key_cols = [
            self._term_col(t, env).alias(names[i])
            for i, t in enumerate(rule.head.args)
            if i not in agg_idx
        ]
        agg_cols = []
        for i in agg_idx:
            t = rule.head.args[i]
            agg_cols.append(self._agg_col(t, env).alias(names[i]))
        if key_cols:
            out = df.groupBy(*key_cols).agg(*agg_cols)
            # groupBy(alias) yields the aliased names already; reorder
            return out.select(*names)
        return df.agg(*agg_cols).select(*names)

    def pre_aggregate_projection(self, rule: Rule, body: BodyResult) -> DataFrame:
        """For monotonic cliques: project keys + raw agg-input value
        (the un-aggregated contribution stream fed to the incremental
        aggregate, AggregateSetRDD.scala:112-132)."""
        df, env = body.df, body.env
        names = canon_cols(rule.head.arity)
        cols = []
        for i, t in enumerate(rule.head.args):
            if isinstance(t, AggTerm):
                arg = F.lit(1) if isinstance(t.arg, AnonVar) else self._term_col(t.arg, env)
                cols.append(arg.alias(names[i]))
            else:
                cols.append(self._term_col(t, env).alias(names[i]))
        return df.select(*cols)

    def _agg_col(self, t: AggTerm, env: dict) -> Column:
        if isinstance(t.arg, AnonVar):
            arg = F.lit(1)
        else:
            arg = self._term_col(t.arg, env)
        func = t.func
        if func == "count":
            return F.count(arg)
        if func == "countd":
            return F.count_distinct(arg)
        if func == "sum":
            return F.sum(arg)
        if func == "avg":
            return F.avg(arg)
        if func in ("min", "mmin"):
            return F.min(arg)
        if func in ("max", "mmax"):
            return F.max(arg)
        raise DatalogCompileError(f"unsupported aggregate {func!r}")


def widen_types(dfs: list[DataFrame]) -> list[DataFrame]:
    """Cast the same-named columns of multi-rule branches to a common type
    so UNION is well-typed (reference unions resolved-attribute children,
    LogicalPlanGenerator.scala:130-171)."""
    if len(dfs) <= 1:
        return dfs
    cols = dfs[0].columns
    target: list[str] = []
    for i, name in enumerate(cols):
        types = [df.schema[i].dataType.simpleString() for df in dfs]
        t = types[0]
        for other in types[1:]:
            if other == t:
                continue
            if t in _NUM_RANK and other in _NUM_RANK:
                t = t if _NUM_RANK[t] >= _NUM_RANK[other] else other
            else:
                # string vs date etc. — fall back to string
                t = "string"
        target.append(t)
    out = []
    for df in dfs:
        casts = []
        for i, name in enumerate(cols):
            cur = df.schema[i].dataType.simpleString()
            c = F.col(name)
            casts.append(c.cast(target[i]).alias(name) if cur != target[i] else c)
        out.append(df.select(*casts))
    return out


def union_all(dfs: list[DataFrame]) -> DataFrame:
    dfs = widen_types(dfs)
    acc = dfs[0]
    for df in dfs[1:]:
        acc = acc.union(df)
    return acc
