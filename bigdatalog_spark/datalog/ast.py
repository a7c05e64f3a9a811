"""AST for the DeAL-compatible Datalog surface.

Grammar is inferred from the reference's public test corpus
(/root/reference/datalog/src/test/scala/.../NonRecursiveQuerySuites.scala,
RecursiveQuerySuites.scala, AggregatesInRecursionQuerySuite.scala) — the
DeALS front-end jar is a binary, so the observable program texts in those
suites are the spec (SURVEY.md §7.1).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# ---------------------------------------------------------------- terms

class Term:
    __slots__ = ()


@dataclass(frozen=True)
class Var(Term):
    name: str

    def __str__(self) -> str:
        return self.name


@dataclass(frozen=True)
class AnonVar(Term):
    """`_` — anonymous variable; every occurrence is distinct."""

    uid: int

    def __str__(self) -> str:
        return "_"


@dataclass(frozen=True)
class Const(Term):
    """Literal constant: int, float, str, or date-string."""

    value: object

    def __str__(self) -> str:
        return repr(self.value)


@dataclass(frozen=True)
class Arith(Term):
    """Binary arithmetic expression: +, -, *, /."""

    op: str
    left: Term
    right: Term

    def __str__(self) -> str:
        return f"({self.left} {self.op} {self.right})"


# Aggregate function names (head-only), per LogicalPlanGenerator.scala:296-311
# and BigDatalogContext.scala:60-63 (mmin/mmax registration).
STRATIFIED_AGGS = ("count", "countd", "sum", "avg", "min", "max")
MONOTONIC_AGGS = ("mmin", "mmax", "mcount", "msum")
AGG_NAMES = STRATIFIED_AGGS + MONOTONIC_AGGS


@dataclass(frozen=True)
class AggTerm(Term):
    """`agg<Var>` head argument, e.g. sum<S>, count<_>, mmin<D>."""

    func: str
    arg: Term

    def __str__(self) -> str:
        return f"{self.func}<{self.arg}>"


# ---------------------------------------------------------------- literals

@dataclass(frozen=True)
class Atom:
    """Predicate literal p(t1, ..., tn); negated=True for `~p(...)`."""

    pred: str
    args: tuple[Term, ...]
    negated: bool = False

    @property
    def arity(self) -> int:
        return len(self.args)

    def __str__(self) -> str:
        neg = "~" if self.negated else ""
        return f"{neg}{self.pred}({', '.join(map(str, self.args))})"


@dataclass(frozen=True)
class Comparison:
    """t1 op t2 where op in =, ~=, <, >, <=, >=."""

    op: str
    left: Term
    right: Term

    def __str__(self) -> str:
        return f"{self.left} {self.op} {self.right}"


@dataclass(frozen=True)
class SortSpec:
    """`sort((V1, asc|desc), ...)` pseudo-predicate (LogicalPlanGenerator.scala:387-399)."""

    orders: tuple[tuple[str, str], ...]  # (var name, 'asc'|'desc')


@dataclass(frozen=True)
class LimitSpec:
    """`limit(n)` pseudo-predicate (LogicalPlanGenerator.scala:401-409)."""

    n: int


Literal = object  # Atom | Comparison | SortSpec | LimitSpec


# ---------------------------------------------------------------- rules

@dataclass
class Rule:
    head: Atom
    body: list  # list[Literal]

    def __str__(self) -> str:
        if not self.body:
            return f"{self.head}."
        return f"{self.head} <- {', '.join(map(str, self.body))}."

    @property
    def body_atoms(self) -> list[Atom]:
        return [l for l in self.body if isinstance(l, Atom) and not l.negated]

    @property
    def negated_atoms(self) -> list[Atom]:
        return [l for l in self.body if isinstance(l, Atom) and l.negated]

    @property
    def agg_terms(self) -> list[AggTerm]:
        return [t for t in self.head.args if isinstance(t, AggTerm)]


# DeAL column types → (SURVEY.md §1.2, Utilities.scala:63-83)
DEAL_TYPES = (
    "byte", "short", "integer", "long", "float", "double", "string", "datetime",
)


@dataclass
class SchemaDecl:
    """One base-predicate declaration: name(Col:type, ...)."""

    name: str
    columns: list  # list[(colname, dealtype)]


@dataclass
class Program:
    """A parsed DeAL program: database declarations + rules."""

    schemas: dict = field(default_factory=dict)  # name -> SchemaDecl
    rules: list = field(default_factory=list)  # list[Rule]

    def rules_for(self, pred: str) -> list[Rule]:
        return [r for r in self.rules if r.head.pred == pred]

    @property
    def idb_preds(self) -> list[str]:
        seen, out = set(), []
        for r in self.rules:
            if r.head.pred not in seen:
                seen.add(r.head.pred)
                out.append(r.head.pred)
        return out


@dataclass(frozen=True)
class Goal:
    """Query form, e.g. tc(A,B). or tc(0,B)."""

    pred: str
    args: tuple[Term, ...]

    def __str__(self) -> str:
        return f"{self.pred}({', '.join(map(str, self.args))})."
