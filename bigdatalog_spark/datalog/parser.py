"""Tokenizer + recursive-descent parser for the DeAL-compatible surface.

Replaces the reference's binary DeALS front end (DeALS-0.6.jar, declared at
/root/reference/datalog/pom.xml:59-60). The grammar is inferred from the
reference test corpus — every construct in those suites parses here:

  database({p(Col:type, ...), ...}).
  head(args) <- lit1, ..., litn.          % rules ('%' comments to EOL)
  p(A,B).  p(0,B)                         % query goals
  literals: p(...), ~p(...), X ~= Y, X = Y + 1, sort((Z,desc)), limit(10)
  head args: vars, constants, agg<Var> (count countd sum avg min max mmin mmax)
"""

from __future__ import annotations

import re

from .ast import (
    AGG_NAMES,
    DEAL_TYPES,
    AnonVar,
    Arith,
    Atom,
    AggTerm,
    Comparison,
    Const,
    Goal,
    LimitSpec,
    Program,
    Rule,
    SchemaDecl,
    SortSpec,
    Var,
)


class DatalogParseError(Exception):
    pass


_TOKEN_RE = re.compile(
    r"""
      (?P<WS>\s+)
    | (?P<COMMENT>%[^\n]*)
    | (?P<NUMBER>-?\d+\.\d+(?:[eE][+-]?\d+)?|-?\d+)
    | (?P<STRING>'(?:[^'\\]|\\.)*')
    | (?P<IDENT>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<ARROW><-)
    | (?P<OP>~=|<=|>=|[=<>~])
    | (?P<PUNCT>[(){},.])
    | (?P<ARITH>[+\-*/])
    """,
    re.VERBOSE,
)


def tokenize(text: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise DatalogParseError(
                f"unexpected character {text[pos]!r} at offset {pos}: "
                f"...{text[max(0, pos - 30):pos + 10]!r}..."
            )
        kind = m.lastgroup
        if kind not in ("WS", "COMMENT"):
            toks.append((kind, m.group()))
        pos = m.end()
    toks.append(("EOF", ""))
    return toks


class _Parser:
    def __init__(self, text: str):
        self.toks = tokenize(text)
        self.i = 0
        self._anon = 0

    # ------------------------------------------------------------ plumbing
    @property
    def cur(self) -> tuple[str, str]:
        return self.toks[self.i]

    def peek(self, k: int = 0) -> tuple[str, str]:
        j = min(self.i + k, len(self.toks) - 1)
        return self.toks[j]

    def advance(self) -> tuple[str, str]:
        t = self.toks[self.i]
        if t[0] != "EOF":
            self.i += 1
        return t

    def expect(self, value: str) -> tuple[str, str]:
        t = self.advance()
        if t[1] != value:
            raise DatalogParseError(f"expected {value!r}, got {t[1]!r} (token {self.i})")
        return t

    def at(self, value: str) -> bool:
        return self.cur[1] == value

    def accept(self, value: str) -> bool:
        if self.at(value):
            self.advance()
            return True
        return False

    def fresh_anon(self) -> AnonVar:
        self._anon += 1
        return AnonVar(self._anon)

    # ------------------------------------------------------------ program
    # NOTE: database({...}). declarations are peeled off by regex in
    # parse_program() below (they contain ':' type annotations, which the
    # rule tokenizer has no token for); only rules reach this parser.
    def parse_program(self) -> Program:
        prog = Program()
        while self.cur[0] != "EOF":
            prog.rules.append(self._parse_rule())
        return prog

    def _parse_rule(self) -> Rule:
        head = self._parse_atom(head=True)
        body: list = []
        if self.accept("<-"):
            body.append(self._parse_literal())
            while self.accept(","):
                body.append(self._parse_literal())
        self.expect(".")
        return Rule(head, body)

    # ------------------------------------------------------------ literals
    def _parse_literal(self):
        if self.at("~") :
            self.advance()
            atom = self._parse_atom()
            return Atom(atom.pred, atom.args, negated=True)
        # sort((V, dir), ...) / limit(n) pseudo-predicates
        if self.cur[1] == "sort" and self.peek(1)[1] == "(":
            return self._parse_sort()
        if self.cur[1] == "limit" and self.peek(1)[1] == "(":
            self.advance()
            self.expect("(")
            n = self.advance()[1]
            self.expect(")")
            return LimitSpec(int(n))
        # predicate atom:  IDENT (
        if self.cur[0] == "IDENT" and self.peek(1)[1] == "(":
            # could still be a comparison whose LHS is a func call — DeAL has
            # none, so IDENT( is always an atom.
            atom = self._parse_atom()
            return atom
        # otherwise: comparison  expr OP expr
        left = self._parse_expr()
        op = self.advance()[1]
        if op not in ("=", "~=", "<", ">", "<=", ">="):
            raise DatalogParseError(f"expected comparison operator, got {op!r}")
        right = self._parse_expr()
        return Comparison(op, left, right)

    def _parse_sort(self) -> SortSpec:
        self.expect("sort")
        self.expect("(")
        orders: list[tuple[str, str]] = []
        while True:
            self.expect("(")
            var = self.advance()[1]
            self.expect(",")
            direction = self.advance()[1].lower()
            if direction not in ("asc", "desc"):
                raise DatalogParseError(f"sort direction must be asc|desc, got {direction!r}")
            self.expect(")")
            orders.append((var, direction))
            if not self.accept(","):
                break
        self.expect(")")
        return SortSpec(tuple(orders))

    # ------------------------------------------------------------ atoms/terms
    def _parse_atom(self, head: bool = False) -> Atom:
        name = self.advance()[1]
        self.expect("(")
        args: list = []
        if not self.at(")"):
            args.append(self._parse_term(head=head))
            while self.accept(","):
                args.append(self._parse_term(head=head))
        self.expect(")")
        return Atom(name, tuple(args))

    def _parse_term(self, head: bool = False):
        # aggregate term (head only): agg<V>
        if (
            head
            and self.cur[0] == "IDENT"
            and self.cur[1] in AGG_NAMES
            and self.peek(1)[1] == "<"
        ):
            func = self.advance()[1]
            self.expect("<")
            arg = self._parse_primary()
            self.expect(">")
            return AggTerm(func, arg)
        return self._parse_expr()

    # expr := mul (('+'|'-') mul)*   ; mul := primary (('*'|'/') primary)*
    def _parse_expr(self):
        node = self._parse_mul()
        while self.cur[1] in ("+", "-"):
            op = self.advance()[1]
            rhs = self._parse_mul()
            node = Arith(op, node, rhs)
        return node

    def _parse_mul(self):
        node = self._parse_primary()
        while self.cur[1] in ("*", "/"):
            op = self.advance()[1]
            rhs = self._parse_primary()
            node = Arith(op, node, rhs)
        return node

    def _parse_primary(self):
        kind, val = self.cur
        if val == "(":
            self.advance()
            node = self._parse_expr()
            self.expect(")")
            return node
        if kind == "NUMBER":
            self.advance()
            if "." in val or "e" in val or "E" in val:
                return Const(float(val))
            return Const(int(val))
        if kind == "STRING":
            self.advance()
            body = val[1:-1].replace("\\'", "'").replace("\\\\", "\\")
            return Const(body)
        if kind == "IDENT":
            self.advance()
            if val == "_":
                return self.fresh_anon()
            if val[0].isupper() or val[0] == "_":
                return Var(val)
            # lowercase identifier in term position = symbolic string constant
            # (e.g. avg_price(a, A) — NonRecursiveQuerySuites.scala:198)
            return Const(val)
        raise DatalogParseError(f"unexpected token {val!r} in term position")


# -------------------------------------------------------------- database({...})

_SCHEMA_RE = re.compile(
    r"database\s*\(\s*\{(?P<body>.*?)\}\s*\)\s*\.", re.DOTALL
)
_DECL_RE = re.compile(r"(?P<name>[A-Za-z_][A-Za-z0-9_]*)\s*\((?P<cols>[^)]*)\)")


def _strip_comments(text: str) -> str:
    # remove %-to-EOL comments, respecting quoted strings
    out: list[str] = []
    in_str = False
    i = 0
    while i < len(text):
        c = text[i]
        if c == "'" and not in_str:
            in_str = True
            out.append(c)
        elif c == "'" and in_str:
            in_str = False
            out.append(c)
        elif c == "%" and not in_str:
            while i < len(text) and text[i] != "\n":
                i += 1
            continue
        else:
            out.append(c)
        i += 1
    return "".join(out)


def parse_program(text: str) -> Program:
    """Parse a full DeAL program: database decl(s) + rules."""
    text = _strip_comments(text)
    prog = Program()

    # peel off database({...}). declarations with a regex (they contain ':'
    # type annotations which the rule tokenizer doesn't need to know about)
    def _take_schema(m: re.Match) -> str:
        for decl in _DECL_RE.finditer(m.group("body")):
            name = decl.group("name")
            cols = []
            for colspec in decl.group("cols").split(","):
                colspec = colspec.strip()
                if not colspec:
                    continue
                if ":" not in colspec:
                    raise DatalogParseError(
                        f"schema column {colspec!r} in {name!r} needs Name:type"
                    )
                cname, ctype = (s.strip() for s in colspec.split(":", 1))
                ctype = ctype.lower()
                if ctype not in DEAL_TYPES:
                    raise DatalogParseError(
                        f"unknown type {ctype!r} for {name}.{cname} "
                        f"(supported: {', '.join(DEAL_TYPES)})"
                    )
                cols.append((cname, ctype))
            prog.schemas[name] = SchemaDecl(name, cols)
        return ""

    remainder = _SCHEMA_RE.sub(_take_schema, text)
    if remainder.strip():
        p = _Parser(remainder)
        body_prog = p.parse_program()
        prog.rules.extend(body_prog.rules)
    return prog


def parse_goal(text: str) -> Goal:
    """Parse a query form like `tc(A,B).` or `tc(0,B)` (trailing dot optional)."""
    text = _strip_comments(text).strip()
    if text.endswith("."):
        text = text[:-1]
    p = _Parser(text)
    atom = p._parse_atom()
    if p.cur[0] != "EOF":
        raise DatalogParseError(f"trailing tokens after goal: {p.cur[1]!r}")
    return Goal(atom.pred, atom.args)
