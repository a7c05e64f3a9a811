"""Semantic analysis: dependency graph, recursive cliques, stratification.

Re-creates (in Python, from observed behavior) the analysis the reference
delegates to the DeALS front end: recursive-clique identification and
evaluation-type selection (consumed at
/root/reference/datalog/src/main/scala/.../LogicalPlanGenerator.scala:78-128
— RECURSIVE_CLIQUE / MUTUAL_RECURSIVE_CLIQUE operators and
EvaluationType.SemiNaive vs MonotonicSemiNaive at :111-119).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .ast import (
    MONOTONIC_AGGS,
    STRATIFIED_AGGS,
    AggTerm,
    Atom,
    Program,
    Rule,
)


class DatalogSemanticError(Exception):
    pass


@dataclass
class Clique:
    """A recursive clique = one SCC of the IDB dependency graph.

    Mirrors RECURSIVE_CLIQUE / MUTUAL_RECURSIVE_CLIQUE
    (LogicalPlanGenerator.scala:78-128). ``monotonic`` selects the
    AggregateRecursion executor (EvaluationType.MonotonicSemiNaive).
    """

    preds: tuple[str, ...]
    exit_rules: dict = field(default_factory=dict)  # pred -> list[Rule]
    recursive_rules: dict = field(default_factory=dict)  # pred -> list[Rule]
    monotonic: bool = False  # single-pred mmin/mmax clique (AggregateRecursion)
    # clique mixing set-semantics predicates with monotonic-aggregate
    # predicates, or using the additive aggregates mcount/msum — the
    # generalization the reference declares but leaves unimplemented
    # (AggregateSetRDD.scala:146-148 "TODO implement MCOUNT/MSUM"; the
    # commented-out Attend program, AggregatesInRecursionQuerySuite.scala:97-142)
    mixed: bool = False
    agg_info: dict = field(default_factory=dict)  # agg pred -> (position, func)
    linear: bool = True  # every recursive rule has exactly 1 clique atom

    @property
    def mutual(self) -> bool:
        return len(self.preds) > 1


@dataclass
class AnalyzedProgram:
    program: Program
    # evaluation units in topological (bottom-up) order; each item is either
    # a plain predicate name (non-recursive) or a Clique
    order: list = field(default_factory=list)
    clique_of: dict = field(default_factory=dict)  # pred -> Clique


def _dependencies(rule: Rule) -> list[str]:
    out = []
    for lit in rule.body:
        if isinstance(lit, Atom):
            out.append(lit.pred)
    return out


def _tarjan_sccs(nodes: list[str], edges: dict) -> list[list[str]]:
    """Tarjan SCC; returns SCCs in reverse topological order."""
    index: dict[str, int] = {}
    low: dict[str, int] = {}
    on_stack: set[str] = set()
    stack: list[str] = []
    sccs: list[list[str]] = []
    counter = [0]

    def strongconnect(v: str) -> None:
        # iterative to survive deep rule chains
        work = [(v, iter(edges.get(v, ())))]
        index[v] = low[v] = counter[0]
        counter[0] += 1
        stack.append(v)
        on_stack.add(v)
        while work:
            node, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(edges.get(w, ()))))
                    advanced = True
                    break
                elif w in on_stack:
                    low[node] = min(low[node], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[node])
            if low[node] == index[node]:
                scc = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    scc.append(w)
                    if w == node:
                        break
                sccs.append(scc)

    for v in nodes:
        if v not in index:
            strongconnect(v)
    return sccs


def _classify_aggregate_clique(program: Program, clique: Clique) -> None:
    """Validate aggregates inside a recursive clique and pick the executor.

    Predicates whose rules carry aggregate heads must use MONOTONIC
    aggregates only (mmin/mmax/mcount/msum) with a consistent single-agg
    shape across rules; stratified aggregates inside a clique are
    unstratifiable. A single-predicate mmin/mmax clique runs the dedicated
    AggregateRecursion path (``monotonic``); anything more general — an
    additive (mcount/msum) aggregate, or a clique mixing aggregate and
    set-semantics predicates — runs the mixed executor (``mixed``,
    fixpoint.fixpoint_mixed)."""
    for pred in clique.preds:
        rules = program.rules_for(pred)
        agg_rules = [r for r in rules if r.agg_terms]
        if not agg_rules:
            continue
        if len(agg_rules) != len(rules):
            raise DatalogSemanticError(
                f"predicate {pred!r} mixes aggregate and plain rules inside "
                f"recursive clique {clique.preds}"
            )
        shapes = {
            tuple(
                (i, t.func) if isinstance(t, AggTerm) else (i, None)
                for i, t in enumerate(r.head.args)
            )
            for r in rules
        }
        if len(shapes) != 1:
            raise DatalogSemanticError(
                f"rules of aggregate predicate {pred!r} disagree on "
                f"aggregate positions: {shapes}"
            )
        shape = next(iter(shapes))
        aggs = [(i, f) for i, f in shape if f is not None]
        stratified = [f for _, f in aggs if f in STRATIFIED_AGGS]
        if stratified:
            raise DatalogSemanticError(
                f"stratified aggregate(s) {sorted(stratified)} on {pred!r} "
                f"inside recursive clique {clique.preds} — use "
                f"mmin/mmax/mcount/msum (monotonic) aggregates"
            )
        if len(aggs) != 1:
            raise DatalogSemanticError(
                f"monotonic-aggregate predicate {pred!r} must have exactly "
                f"one aggregate head argument, got {len(aggs)}"
            )
        clique.agg_info[pred] = aggs[0]

    if not clique.agg_info:
        # aggregates appeared only via preds outside the clique — plain PSN
        return
    funcs = {f for _, f in clique.agg_info.values()}
    if (
        len(clique.preds) == 1
        and len(clique.agg_info) == 1
        and funcs <= {"mmin", "mmax"}
    ):
        clique.monotonic = True
    else:
        clique.mixed = True


def analyze(program: Program) -> AnalyzedProgram:
    """Classify predicates into evaluation units and validate stratification."""
    idb = set(program.idb_preds)
    edb = set(program.schemas)

    # arity / definition checks
    for rule in program.rules:
        arities: dict[str, int] = {}
        for atom in [rule.head] + [l for l in rule.body if isinstance(l, Atom)]:
            pred = atom.pred
            if pred not in idb and pred not in edb:
                raise DatalogSemanticError(
                    f"undefined predicate {pred!r} in rule: {rule}"
                )
            declared = (
                len(program.schemas[pred].columns) if pred in edb
                else None
            )
            if declared is not None and atom.arity != declared:
                raise DatalogSemanticError(
                    f"{pred!r} used with arity {atom.arity}, declared {declared}"
                )
            if pred in arities and arities[pred] != atom.arity:
                pass  # same pred, multiple occurrences — arity equality below
            arities[pred] = atom.arity
    for pred in idb:
        rule_arities = {r.head.arity for r in program.rules_for(pred)}
        if len(rule_arities) > 1:
            raise DatalogSemanticError(
                f"predicate {pred!r} defined with multiple arities: {rule_arities}"
            )

    # IDB dependency graph (edges head -> IDB body preds)
    edges: dict[str, set[str]] = {p: set() for p in idb}
    for rule in program.rules:
        for dep in _dependencies(rule):
            if dep in idb:
                edges[rule.head.pred].add(dep)

    sccs = _tarjan_sccs(sorted(idb), {k: sorted(v) for k, v in edges.items()})

    analyzed = AnalyzedProgram(program)
    for scc in sccs:  # Tarjan emits reverse-topological = bottom-up order
        scc_set = set(scc)
        self_recursive = any(
            dep in scc_set
            for p in scc
            for dep in edges.get(p, ())
        )
        if len(scc) == 1 and not self_recursive:
            analyzed.order.append(scc[0])
            continue

        clique = Clique(preds=tuple(sorted(scc_set)))
        for pred in clique.preds:
            clique.exit_rules[pred] = []
            clique.recursive_rules[pred] = []
        agg_funcs: set[str] = set()
        for pred in clique.preds:
            for rule in program.rules_for(pred):
                clique_atoms = [
                    a for a in rule.body_atoms if a.pred in scc_set
                ]
                # negation inside the clique is unstratifiable
                for neg in rule.negated_atoms:
                    if neg.pred in scc_set:
                        raise DatalogSemanticError(
                            f"negation of {neg.pred!r} inside its own "
                            f"recursive clique (unstratifiable): {rule}"
                        )
                for t in rule.agg_terms:
                    agg_funcs.add(t.func)
                if clique_atoms:
                    clique.recursive_rules[pred].append(rule)
                    if len(clique_atoms) > 1:
                        clique.linear = False
                else:
                    clique.exit_rules[pred].append(rule)

        if agg_funcs:
            _classify_aggregate_clique(program, clique)

        analyzed.order.append(clique)
        for pred in clique.preds:
            analyzed.clique_of[pred] = clique

    # monotonic aggregates outside recursion behave as plain min/max
    return analyzed
