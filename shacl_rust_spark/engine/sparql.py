"""sh:sparql constraint subset: SPARQL → DataFrame rewriter.

The reference executes SPARQL SELECT/ASK constraints per focus node with
pre-bound $this/$value/$shapesGraph/$currentShape/$PATH/params on an
oxigraph store (/root/reference/src/validation/constraints/sparql.rs).
This module re-expresses the supported subset SET-ORIENTED: the query's
basic graph pattern compiles into equi-joins over the `triples`
DataFrame (shapes-graph blocks join the broadcast shapes triples), with
FILTER/BIND as Column expressions — one Spark plan for ALL focus nodes,
no per-node loop.

Supported: SELECT/ASK, BGP triple patterns (vars in any slot), FILTER
(=, !=, <, >, <=, >=, &&, ||, !, arithmetic + - * /, bound,
isLiteral/isIRI/isBlank, lang, langMatches, CONCAT, COALESCE, datatype,
str, STRLEN, UCASE, LCASE, SUBSTR, REPLACE, REGEX, STRSTARTS, STRENDS,
CONTAINS, STRBEFORE, STRAFTER, ABS, ROUND, CEIL, FLOOR, IF, sameTerm,
isNumeric, IRI/URI, STRDT, STRLANG, ENCODE_FOR_URI, MD5/SHA1/SHA256,
and `expr [NOT] IN (...)`), BIND,
GRAPH $shapesGraph {}, UNION (flattened-scope approximation), FILTER
(NOT) EXISTS via shared-column (anti-)joins — standalone, AND embedded
inside boolean expressions via mark joins wherever expressions occur:
FILTER (``FILTER(... || EXISTS {...})``), BIND, HAVING, ``(expr AS
?v)`` projections, and ORDER BY keys — DISTINCT, OPTIONAL (left
join on the shared solution variables), VALUES (inline solution join;
UNDEF cells via a compatibility join), aggregates
(COUNT/SUM/MIN/MAX/AVG/SAMPLE/GROUP_CONCAT with DISTINCT)
with GROUP BY (vars and computed ``(expr [AS ?v])`` keys) + HAVING —
grouped per pre-binding run, the
reference's per-focus evaluation (see _apply_modifiers) — plus
ORDER BY / LIMIT / OFFSET sliced per run, typed
and language-tagged literals, and property paths in the predicate
position (^ / | * + ? with grouping, and negated property sets
``!(iri|^iri|...)`` as predicate-NOT-IN-filtered scans per direction
clause) evaluated spec-compliantly —
seeded from whichever endpoint is bound, sequence/alternative as
join/union combinators, Kleene closure as an iterative checkpointed
frontier fixpoint (NOTE: unlike the SHACL path resolver in paths.py,
``+`` here DOES re-emit the start node when a cycle reaches it — the
reference evaluates sh:sparql with a spec-compliant SPARQL engine, not
its SHACL path walker). A path with both endpoints unbound seeds the
closure from every graph term (the spec's semantics; the first hop
prunes non-starters, and ``?x p* ?y`` really does emit the identity
pair for every term). Paths inside GRAPH $shapesGraph blocks walk the
broadcast shapes triples through the same machinery (the predicate
accessor swaps from the Dataset's partition-pruned scan to an
equivalent filter over the shapes frame) — SHACL-SPARQL component
libraries introspect the shapes graph with paths like
``sh:property/sh:path``.

Projection supports plain variables, ``(expr AS ?v)`` with both
aggregate and scalar expressions, and ``SELECT *``.

Parity behaviors preserved from the reference:
- MINUS / SERVICE / nested SELECT ⇒ one "pre-binding" violation per
  focus (sparql.rs:30-96, 173-190);
- queries that fail to parse ⇒ violation per focus (sparql.rs:217-229);
- after evaluation, focus nodes with no violations but whose query text
  contains ``bound($this``/``bound(?this``/``UNION`` get the last-resort
  heuristic violation (sparql.rs:368-392);
- property shapes bind $value per value node (focus nodes without
  values run once with $value unbound); node-shape component validators
  bind $value to the focus node (sparql.rs:156-169);
- $PATH binds to the path's first direct predicate (sparql.rs:205-209).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schema import TERM_TYPE, term_lit
from ..shapes.ir import Hop, Shape, SparqlC
from ..term import Term, iri, literal
from .. import vocab as V

SHAPES_GRAPH_IRI = "urn:shacl:shapes-graph"  # dataset.rs:10


class SparqlParseError(ValueError):
    pass


class SparqlUnsupported(ValueError):
    pass


# --- AST ------------------------------------------------------------------
@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class TP:
    s: object
    p: object
    o: object


@dataclass(frozen=True)
class Filter:
    expr: object


@dataclass(frozen=True)
class Bind:
    expr: object
    var: Var


@dataclass(frozen=True)
class GraphBlock:
    target: object
    elems: tuple


@dataclass(frozen=True)
class UnionBlock:
    branches: tuple  # of tuples of elements


@dataclass(frozen=True)
class NotExists:
    elems: tuple
    negated: bool


@dataclass(frozen=True)
class OptionalBlock:
    elems: tuple


@dataclass(frozen=True)
class ValuesBlock:
    vars: tuple  # of Var
    rows: tuple  # of tuples of Term


# --- property-path AST (predicate position in query patterns) -------------
# Distinct from shapes.ir: query paths nest freely ((a/b)+ , ^(a|b)), and
# their Kleene semantics are the SPARQL spec's, not the reference's SHACL
# path-walker quirks.
@dataclass(frozen=True)
class PHop:
    iri: str


@dataclass(frozen=True)
class PInvH:
    iri: str


@dataclass(frozen=True)
class PNeg:
    """Negated property set !(iri|...|^iri|...) — SPARQL 1.1 §18.4:
    alt(NPS(fwd), ^NPS(inv)); a clause only exists for a non-empty set
    (so !^a matches no forward edge at all)."""
    fwd: tuple  # predicate IRIs negated in the forward direction
    inv: tuple  # predicate IRIs negated in the inverse direction


@dataclass(frozen=True)
class PSeq:
    elems: tuple


@dataclass(frozen=True)
class PAlt:
    alts: tuple


@dataclass(frozen=True)
class PStar:
    inner: object


@dataclass(frozen=True)
class PPlus:
    inner: object


@dataclass(frozen=True)
class POpt:
    inner: object


@dataclass(frozen=True)
class PathTP:
    s: object
    path: object
    o: object


def _invert_path(n):
    if isinstance(n, PHop):
        return PInvH(n.iri)
    if isinstance(n, PInvH):
        return PHop(n.iri)
    if isinstance(n, PSeq):
        return PSeq(tuple(_invert_path(e) for e in reversed(n.elems)))
    if isinstance(n, PAlt):
        return PAlt(tuple(_invert_path(a) for a in n.alts))
    if isinstance(n, PStar):
        return PStar(_invert_path(n.inner))
    if isinstance(n, PPlus):
        return PPlus(_invert_path(n.inner))
    if isinstance(n, POpt):
        return POpt(_invert_path(n.inner))
    if isinstance(n, PNeg):
        # ^(NPS(F) | ^NPS(I)) = ^NPS(F) | NPS(I)
        return PNeg(fwd=n.inv, inv=n.fwd)
    raise SparqlParseError(f"cannot invert path node {n!r}")


@dataclass(frozen=True)
class ECall:
    fn: str
    args: tuple


@dataclass(frozen=True)
class EIn:
    """``expr [NOT] IN (e1, e2, ...)`` — sugar for an =-disjunction."""
    expr: object
    items: tuple
    negated: bool


@dataclass(frozen=True)
class EExists:
    """``[NOT] EXISTS { ... }`` EMBEDDED in a boolean expression (the
    standalone FILTER (NOT) EXISTS form compiles to a semi/anti join,
    NotExists). Evaluated as a MARK JOIN: the inner pattern's match set
    left-joins a boolean flag onto the solution, which then
    participates in the surrounding &&/||/! tree as an ordinary
    column."""
    elems: tuple
    negated: bool


@dataclass(frozen=True)
class EMark:
    """Internal: a resolved EExists — references the boolean mark
    column the mark join added."""
    col: str


@dataclass(frozen=True)
class EBin:
    op: str
    a: object
    b: object


@dataclass(frozen=True)
class ENot:
    a: object


@dataclass(frozen=True)
class EAgg:
    """Aggregate call in a projection or HAVING expression. arg is None
    for COUNT(*); sep only applies to GROUP_CONCAT."""
    fn: str
    arg: object
    distinct: bool = False
    sep: str = " "


@dataclass(frozen=True)
class OrderKey:
    expr: object
    desc: bool


@dataclass(frozen=True)
class GroupExpr:
    """A computed GROUP BY key: ``GROUP BY (expr)`` or
    ``GROUP BY (expr AS ?v)`` (var is None for the anonymous form)."""
    expr: object
    var: object = None


@dataclass(frozen=True)
class SparqlQuery:
    is_select: bool
    elems: tuple
    projection: tuple = ()   # Var | (expr, Var) entries; () = SELECT *
    group_by: tuple = ()     # of Var
    having: tuple = ()       # of boolean exprs
    order_by: tuple = ()     # of OrderKey
    limit: int | None = None
    offset: int | None = None


# --- tokenizer / parser -----------------------------------------------------
_TOKEN_RE = re.compile(
    r"""\s*(?:
    (?P<comment>\#[^\n]*)
  | (?P<iri><[^<>\s]*>)
  | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<var>[?$][A-Za-z_][A-Za-z0-9_]*)
  | (?P<number>[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<pname>[A-Za-z_][A-Za-z0-9_\-]*:[A-Za-z0-9_\-.]*|:[A-Za-z0-9_\-.]*)
  | (?P<kw>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<lang>@[A-Za-z][A-Za-z0-9\-]*)
  | (?P<op>&&|\|\||!=|<=|>=|\^\^|[(){}.;,=<>!*/|^+?-])
)""",
    re.VERBOSE,
)


def _tokenize(text: str) -> list[str]:
    tokens = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip() == "":
                break
            raise SparqlParseError(f"cannot tokenize at {pos}: {text[pos:pos+20]!r}")
        pos = m.end()
        if m.lastgroup != "comment":
            tokens.append(m.group(0).strip())
    return tokens


class _Parser:
    def __init__(self, tokens: list[str], prefixes: dict[str, str]):
        self.toks = tokens
        self.i = 0
        self.prefixes = prefixes
        self.select_depth = 0

    def peek(self, k: int = 0) -> str:
        return self.toks[self.i + k] if self.i + k < len(self.toks) else ""

    def kw(self, word: str) -> bool:
        return self.peek().upper() == word

    def next(self) -> str:
        t = self.peek()
        self.i += 1
        return t

    def expect(self, t: str) -> None:
        got = self.next()
        if got.upper() != t.upper():
            raise SparqlParseError(f"expected {t!r}, got {got!r}")

    def parse_query(self) -> SparqlQuery:
        # leading PREFIX declarations inside the query text
        while self.kw("PREFIX"):
            self.next()
            pname = self.next()
            iri_tok = self.next()
            if not (pname.endswith(":") and iri_tok.startswith("<")):
                raise SparqlParseError("bad PREFIX")
            self.prefixes[pname[:-1]] = iri_tok[1:-1]
        projection: list = []
        if self.kw("SELECT"):
            self.next()
            is_select = True
            if self.kw("DISTINCT") or self.kw("REDUCED"):
                self.next()
            # projection: vars / (expr AS ?v) / *
            while not self.kw("WHERE") and self.peek() != "{":
                t = self.peek()
                if t == "(":
                    self.next()
                    expr = self.parse_expr()
                    self.expect("AS")
                    v = self.next()
                    if not v.startswith(("?", "$")):
                        raise SparqlParseError("projection AS target must be a variable")
                    self.expect(")")
                    projection.append((expr, Var(v[1:])))
                elif t.startswith(("?", "$")):
                    projection.append(Var(self.next()[1:]))
                elif t == "*":
                    self.next()
                    projection = []  # SELECT * — no explicit projection
                else:
                    raise SparqlParseError(f"bad projection token {t!r}")
        elif self.kw("ASK"):
            self.next()
            is_select = False
        else:
            raise SparqlParseError(f"expected SELECT/ASK, got {self.peek()!r}")
        if self.kw("WHERE"):
            self.next()
        elems = self.parse_group()
        group_by, having, order_by = self.parse_modifiers()
        limit = offset = None
        while self.kw("LIMIT") or self.kw("OFFSET"):
            which = self.next().upper()
            n = self.next()
            if not re.fullmatch(r"\d+", n):
                raise SparqlParseError(f"{which} expects an integer, got {n!r}")
            if which == "LIMIT":
                limit = int(n)
            else:
                offset = int(n)
        if self.peek() != "":
            raise SparqlUnsupported(
                f"trailing token {self.peek()!r} after query body"
            )
        return SparqlQuery(
            is_select, elems, tuple(projection), group_by, having, order_by,
            limit, offset,
        )

    def parse_modifiers(self) -> tuple[tuple, tuple, tuple]:
        group_by: list[Var] = []
        having: list = []
        order_by: list[OrderKey] = []
        while True:
            if self.kw("GROUP") and self.peek(1).upper() == "BY":
                self.next(), self.next()
                while True:
                    if self.peek().startswith(("?", "$")):
                        group_by.append(Var(self.next()[1:]))
                    elif self.peek() == "(":
                        # GROUP BY (expr) / (expr AS ?v)
                        self.next()
                        expr = self.parse_expr()
                        var = None
                        if self.kw("AS"):
                            self.next()
                            v = self.next()
                            if not v.startswith(("?", "$")):
                                raise SparqlParseError(
                                    "GROUP BY AS target must be a variable"
                                )
                            var = Var(v[1:])
                        self.expect(")")
                        group_by.append(GroupExpr(expr, var))
                    else:
                        break
                if not group_by:
                    raise SparqlParseError("empty GROUP BY")
            elif self.kw("HAVING"):
                self.next()
                having.append(self.parse_bracketed_expr())
            elif self.kw("ORDER") and self.peek(1).upper() == "BY":
                self.next(), self.next()
                saw = False
                while True:
                    t = self.peek().upper()
                    if t in ("", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET"):
                        break
                    if t in ("ASC", "DESC"):
                        self.next()
                        order_by.append(
                            OrderKey(self.parse_bracketed_expr(), t == "DESC")
                        )
                    else:
                        order_by.append(OrderKey(self.parse_unary(), False))
                    saw = True
                if not saw:
                    raise SparqlParseError("empty ORDER BY")
            else:
                break
        return tuple(group_by), tuple(having), tuple(order_by)

    def parse_group(self) -> tuple:
        self.expect("{")
        elems: list = []
        while True:
            t = self.peek()
            if t == "":
                raise SparqlParseError("unterminated group")
            if t == "}":
                self.next()
                break
            if t == ".":
                self.next()
                continue
            up = t.upper()
            if t == "{":
                inner = self.parse_group()
                if self.kw("UNION"):
                    branches = [inner]
                    while self.kw("UNION"):
                        self.next()
                        branches.append(self.parse_group())
                    elems.append(UnionBlock(tuple(branches)))
                else:
                    elems.extend(inner)  # flatten plain nested groups
            elif up == "FILTER":
                self.next()
                if self.kw("NOT") and self.peek(1).upper() == "EXISTS":
                    self.next(), self.next()
                    elems.append(NotExists(self.parse_group(), negated=True))
                elif self.kw("EXISTS"):
                    self.next()
                    elems.append(NotExists(self.parse_group(), negated=False))
                else:
                    elems.append(Filter(self.parse_bracketed_expr()))
            elif up == "BIND":
                self.next()
                self.expect("(")
                expr = self.parse_expr()
                self.expect("AS")
                v = self.next()
                if not v.startswith(("?", "$")):
                    raise SparqlParseError("BIND target must be a variable")
                self.expect(")")
                elems.append(Bind(expr, Var(v[1:])))
            elif up == "GRAPH":
                self.next()
                target = self.parse_term()
                elems.append(GraphBlock(target, self.parse_group()))
            elif up == "MINUS":
                raise SparqlUnsupported("MINUS is not supported for SHACL pre-binding")
            elif up == "SERVICE":
                raise SparqlUnsupported("SERVICE is not supported for SHACL pre-binding")
            elif up == "SELECT":
                raise SparqlUnsupported("Nested SELECT is not supported for SHACL pre-binding")
            elif up == "OPTIONAL":
                self.next()
                elems.append(OptionalBlock(self.parse_group()))
            elif up == "VALUES":
                self.next()
                elems.append(self.parse_values())
            else:
                elems.append(self.parse_triple_pattern())
        return tuple(elems)

    def parse_triple_pattern(self):
        s = self.parse_term()
        p = self.parse_predicate()
        o = self.parse_term()
        if isinstance(p, (Var, Term)):
            return TP(s, p, o)
        return PathTP(s, p, o)

    def parse_predicate(self):
        """Predicate position: a variable, a plain IRI (compiled as an
        equi-join TP), or a property-path expression."""
        if self.peek().startswith(("?", "$")):
            return Var(self.next()[1:])
        node = self._path_alt()
        if isinstance(node, PHop):
            return iri(node.iri)  # plain predicate: existing TP fast path
        return node

    # path := alt ('|' alt)* ; seq := elt ('/' elt)* ;
    # elt := '^'? primary ('*'|'+'|'?')? ; primary := iri | 'a' | '(' path ')'
    def _path_alt(self):
        parts = [self._path_seq()]
        while self.peek() == "|":
            self.next()
            parts.append(self._path_seq())
        return parts[0] if len(parts) == 1 else PAlt(tuple(parts))

    def _path_seq(self):
        parts = [self._path_elt()]
        while self.peek() == "/":
            self.next()
            parts.append(self._path_elt())
        return parts[0] if len(parts) == 1 else PSeq(tuple(parts))

    def _path_elt(self):
        inv = False
        if self.peek() == "^":
            self.next()
            inv = True
        prim = self._path_primary()
        if inv:
            prim = _invert_path(prim)
        while self.peek() in ("*", "+", "?"):
            prim = {"*": PStar, "+": PPlus, "?": POpt}[self.next()](prim)
        return prim

    def _path_primary(self):
        if self.peek() == "(":
            self.next()
            node = self._path_alt()
            self.expect(")")
            return node
        if self.peek() == "a":
            self.next()
            return PHop(V.RDF_TYPE)
        if self.peek() == "!":
            self.next()
            items = []
            if self.peek() == "(":
                self.next()
                items.append(self._nps_item())
                while self.peek() == "|":
                    self.next()
                    items.append(self._nps_item())
                self.expect(")")
            else:
                items.append(self._nps_item())
            return PNeg(
                fwd=tuple(i for neg, i in items if not neg),
                inv=tuple(i for neg, i in items if neg),
            )
        t = self.parse_term()
        if isinstance(t, Term) and t.is_iri:
            return PHop(t.value)
        raise SparqlParseError(f"bad path primary {t!r}")

    def _nps_item(self) -> tuple:
        """PathOneInPropertySet: iri | 'a' | '^' (iri | 'a') →
        (inverted?, predicate IRI)."""
        neg = False
        if self.peek() == "^":
            self.next()
            neg = True
        if self.peek() == "a":
            self.next()
            return (neg, V.RDF_TYPE)
        t = self.parse_term()
        if isinstance(t, Term) and t.is_iri:
            return (neg, t.value)
        raise SparqlParseError(
            f"negated property set expects an IRI, got {t!r}"
        )

    def parse_values(self) -> ValuesBlock:
        def one_term():
            if self.peek().upper() == "UNDEF":
                self.next()
                return None  # unbound cell: compatible with anything
            t = self.parse_term()
            if isinstance(t, Var):
                raise SparqlParseError("variable in VALUES data row")
            return t

        if self.peek() == "(":
            self.next()
            vars_: list[Var] = []
            while self.peek() != ")":
                v = self.next()
                if not v.startswith(("?", "$")):
                    raise SparqlParseError("VALUES variable expected")
                vars_.append(Var(v[1:]))
            self.next()
            self.expect("{")
            rows: list[tuple] = []
            while self.peek() == "(":
                self.next()
                row = []
                while self.peek() != ")":
                    row.append(one_term())
                self.next()
                if len(row) != len(vars_):
                    raise SparqlParseError("VALUES row arity mismatch")
                rows.append(tuple(row))
            self.expect("}")
        else:
            v = self.next()
            if not v.startswith(("?", "$")):
                raise SparqlParseError("VALUES variable expected")
            vars_ = [Var(v[1:])]
            self.expect("{")
            rows = []
            while self.peek() != "}":
                rows.append((one_term(),))
            self.next()
        if not rows:
            raise SparqlParseError("empty VALUES block")
        return ValuesBlock(tuple(vars_), tuple(rows))

    def parse_term(self):
        t = self.next()
        if t.startswith(("?", "$")):
            return Var(t[1:])
        if t.startswith("<"):
            return iri(t[1:-1])
        if t.startswith(('"', "'")):
            value = _unescape(t[1:-1])
            if self.peek() == "^^":
                self.next()
                dt = self.parse_term()
                if not (isinstance(dt, Term) and dt.is_iri):
                    raise SparqlParseError("datatype of a typed literal must be an IRI")
                return literal(value, dt.value)
            if self.peek().startswith("@"):
                return literal(value, lang=self.next()[1:])
            return literal(value)
        if re.match(r"^[+-]?\d", t):
            if "." in t or "e" in t.lower():
                return literal(t, V.XSD_DECIMAL if "e" not in t.lower() else V.XSD_DOUBLE)
            return literal(t, V.XSD_INTEGER)
        if t in ("true", "false"):
            return literal(t, V.XSD_BOOLEAN)
        if ":" in t:
            pfx, local = t.split(":", 1)
            if pfx not in self.prefixes:
                raise SparqlParseError(f"undeclared prefix {pfx!r}")
            return iri(self.prefixes[pfx] + local)
        raise SparqlParseError(f"cannot parse term {t!r}")

    # --- expressions -----------------------------------------------------
    def parse_bracketed_expr(self):
        self.expect("(")
        e = self.parse_expr()
        self.expect(")")
        return e

    def parse_expr(self):
        return self.parse_or()

    def parse_or(self):
        e = self.parse_and()
        while self.peek() == "||":
            self.next()
            e = EBin("||", e, self.parse_and())
        return e

    def parse_and(self):
        e = self.parse_cmp()
        while self.peek() == "&&":
            self.next()
            e = EBin("&&", e, self.parse_cmp())
        return e

    def parse_cmp(self):
        e = self.parse_add()
        if self.peek() in ("=", "!=", "<", ">", "<=", ">="):
            op = self.next()
            return EBin(op, e, self.parse_add())
        negated = False
        if self.kw("NOT") and self.peek(1).upper() == "IN":
            self.next()
            negated = True
        if self.kw("IN"):
            self.next()
            self.expect("(")
            items = []
            if self.peek() != ")":
                items.append(self.parse_expr())
                while self.peek() == ",":
                    self.next()
                    items.append(self.parse_expr())
            self.expect(")")
            return EIn(e, tuple(items), negated)
        if negated:
            raise SparqlParseError("expected IN after NOT")
        return e

    def parse_add(self):
        e = self.parse_mul()
        while self.peek() in ("+", "-"):
            e = EBin(self.next(), e, self.parse_mul())
        return e

    def parse_mul(self):
        e = self.parse_unary()
        while self.peek() in ("*", "/"):
            e = EBin(self.next(), e, self.parse_unary())
        return e

    _FNS = (
        "BOUND", "ISLITERAL", "ISIRI", "ISURI", "ISBLANK", "LANG",
        "LANGMATCHES", "CONCAT", "COALESCE", "DATATYPE", "STR",
        "STRLEN", "UCASE", "LCASE", "SUBSTR", "REPLACE", "REGEX",
        "STRSTARTS", "STRENDS", "CONTAINS", "STRBEFORE", "STRAFTER",
        "ABS", "ROUND", "CEIL", "FLOOR", "IF",
        "SAMETERM", "ISNUMERIC", "IRI", "URI", "STRDT", "STRLANG",
        "ENCODE_FOR_URI", "MD5", "SHA1", "SHA256",
    )
    _AGGS = ("COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE", "GROUP_CONCAT")

    def parse_unary(self):
        if self.peek() == "!":
            self.next()
            return ENot(self.parse_unary())
        if self.peek() == "(":
            return self.parse_bracketed_expr()
        t = self.peek()
        up = t.upper()
        if up == "EXISTS" and self.peek(1) == "{":
            self.next()
            return EExists(self.parse_group(), negated=False)
        if up == "NOT" and self.peek(1).upper() == "EXISTS":
            self.next(), self.next()
            return EExists(self.parse_group(), negated=True)
        if up in self._AGGS and self.peek(1) == "(":
            return self.parse_aggregate()
        if up in self._FNS and self.peek(1) == "(":
            self.next()
            self.expect("(")
            args = []
            if self.peek() != ")":
                args.append(self.parse_expr())
                while self.peek() == ",":
                    self.next()
                    args.append(self.parse_expr())
            self.expect(")")
            return ECall(up, tuple(args))
        return self.parse_term()

    def parse_aggregate(self) -> EAgg:
        fn = self.next().upper()
        self.expect("(")
        distinct = False
        if self.kw("DISTINCT"):
            self.next()
            distinct = True
        if self.peek() == "*":
            if fn != "COUNT":
                raise SparqlParseError(f"{fn}(*) is not valid")
            self.next()
            arg = None
        else:
            arg = self.parse_expr()
        sep = " "
        if self.peek() == ";":
            self.next()
            if not self.kw("SEPARATOR"):
                raise SparqlParseError("expected SEPARATOR in GROUP_CONCAT")
            self.next()
            self.expect("=")
            s = self.next()
            if not s.startswith(('"', "'")):
                raise SparqlParseError("SEPARATOR must be a string literal")
            sep = _unescape(s[1:-1])
        self.expect(")")
        return EAgg(fn, arg, distinct, sep)


def _unescape(s: str) -> str:
    return (
        s.replace("\\\\", "\x00")
        .replace('\\"', '"')
        .replace("\\'", "'")
        .replace("\\n", "\n")
        .replace("\\t", "\t")
        .replace("\x00", "\\")
    )


def parse_sparql(query: str, prefixes: dict[str, str]) -> SparqlQuery:
    return _Parser(_tokenize(query), dict(prefixes)).parse_query()


# --- DataFrame compilation ---------------------------------------------------
_NULL_TERM = F.lit(None).cast(TERM_TYPE)


def _vcol(name: str) -> str:
    return f"v_{name}"


class _Compiler:
    def __init__(self, vd, hop_counter: list[int]):
        self.vd = vd
        self._n = hop_counter
        # identity of the data-graph frame: property paths over it seed
        # from the Dataset's predicate-filtered accessors (partition
        # pruning); any other source (GRAPH $shapesGraph) walks its own
        # frame via an equivalent filter (_path_accessors).
        self.data_source = vd.ds.triples

    def _fresh(self) -> str:
        self._n[0] += 1
        return f"_q{self._n[0]}"

    def term_col(self, node, sol_cols: set[str]) -> Column:
        if isinstance(node, Var):
            c = _vcol(node.name)
            return F.col(c) if c in sol_cols else _NULL_TERM
        if isinstance(node, Term):
            return term_lit(node)
        raise SparqlParseError(f"not a term: {node!r}")

    def _num(self, e, sol_cols: set[str]) -> Column:
        """Expression → double column (non-numeric ⇒ null ⇒ SPARQL
        error semantics: comparisons/filters drop the row)."""
        return self.expr_term(e, sol_cols)["value"].try_cast("double")

    @staticmethod
    def _num_term(col: Column) -> Column:
        """double column → numeric literal TERM; integral values print
        without a decimal point and type as xsd:integer so they
        struct-compare equal to integer literals."""
        integral = (col == F.floor(col)) & (F.abs(col) < F.lit(1e15))
        return F.struct(
            F.lit("lit").alias("kind"),
            F.when(integral, col.cast("long").cast("string"))
            .otherwise(col.cast("string")).alias("value"),
            F.when(integral, V.XSD_INTEGER).otherwise(V.XSD_DOUBLE)
            .alias("datatype"),
            F.lit("").alias("lang"),
        )

    @staticmethod
    def _str_term(col: Column) -> Column:
        return F.struct(
            F.lit("lit").alias("kind"), col.alias("value"),
            F.lit(V.XSD_STRING).alias("datatype"), F.lit("").alias("lang"),
        )

    @staticmethod
    def _regex_pat(pat: Column, flags: Column | None) -> Column:
        if flags is None:
            return pat
        return F.when(
            flags.contains("i"), F.concat(F.lit("(?i)"), pat)
        ).otherwise(pat)

    # expression → TERM struct column
    def expr_term(self, e, sol_cols: set[str]) -> Column:
        if isinstance(e, (Var, Term)):
            return self.term_col(e, sol_cols)
        if isinstance(e, EBin) and e.op in ("+", "-", "*", "/"):
            a, b = self._num(e.a, sol_cols), self._num(e.b, sol_cols)
            out = {"+": a + b, "-": a - b, "*": a * b,
                   "/": a / F.when(b != 0, b)}[e.op]
            return self._num_term(out)
        if isinstance(e, ECall):
            if e.fn == "STRLEN":
                v = self.expr_term(e.args[0], sol_cols)
                return self._num_term(F.length(v["value"]).cast("double"))
            if e.fn in ("UCASE", "LCASE"):
                v = self.expr_term(e.args[0], sol_cols)
                fn = F.upper if e.fn == "UCASE" else F.lower
                return self._str_term(fn(v["value"]))
            if e.fn == "SUBSTR":
                v = self.expr_term(e.args[0], sol_cols)["value"]
                start = self._num(e.args[1], sol_cols).cast("int")
                if len(e.args) > 2:
                    ln = self._num(e.args[2], sol_cols).cast("int")
                    return self._str_term(F.substring(v, start, ln))
                return self._str_term(F.substring(v, start, F.lit(1 << 30)))
            if e.fn == "REPLACE":
                v = self.expr_term(e.args[0], sol_cols)["value"]
                pat = self.expr_term(e.args[1], sol_cols)["value"]
                rep = self.expr_term(e.args[2], sol_cols)["value"]
                flags = (
                    self.expr_term(e.args[3], sol_cols)["value"]
                    if len(e.args) > 3 else None
                )
                return self._str_term(
                    F.regexp_replace(v, self._regex_pat(pat, flags), rep)
                )
            if e.fn == "STRBEFORE":
                v = self.expr_term(e.args[0], sol_cols)["value"]
                sep = self.expr_term(e.args[1], sol_cols)["value"]
                found = F.instr(v, sep) > 0
                return self._str_term(
                    F.when(found, F.substring_index(v, sep, 1)).otherwise(F.lit(""))
                )
            if e.fn == "STRAFTER":
                v = self.expr_term(e.args[0], sol_cols)["value"]
                sep = self.expr_term(e.args[1], sol_cols)["value"]
                found = F.instr(v, sep) > 0
                after = F.substring(
                    v, F.instr(v, sep) + F.length(sep), F.lit(1 << 30)
                )
                return self._str_term(F.when(found, after).otherwise(F.lit("")))
            if e.fn in ("ABS", "ROUND", "CEIL", "FLOOR"):
                n = self._num(e.args[0], sol_cols)
                fn = {"ABS": F.abs, "ROUND": F.round, "CEIL": F.ceil,
                      "FLOOR": F.floor}[e.fn]
                return self._num_term(fn(n).cast("double"))
            if e.fn == "IF":
                return F.when(
                    self.expr_bool(e.args[0], sol_cols),
                    self.expr_term(e.args[1], sol_cols),
                ).otherwise(self.expr_term(e.args[2], sol_cols))
            if e.fn in ("IRI", "URI"):
                # of an IRI: identity; of a string literal: an IRI with
                # that lexical form (no base resolution — pre-bound
                # constraint queries carry absolute IRIs)
                v = self.expr_term(e.args[0], sol_cols)
                return F.struct(
                    F.lit("iri").alias("kind"), v["value"].alias("value"),
                    F.lit("").alias("datatype"), F.lit("").alias("lang"),
                )
            if e.fn == "STRDT":
                lex = self.expr_term(e.args[0], sol_cols)["value"]
                dt = self.expr_term(e.args[1], sol_cols)["value"]
                return F.struct(
                    F.lit("lit").alias("kind"), lex.alias("value"),
                    dt.alias("datatype"), F.lit("").alias("lang"),
                )
            if e.fn == "STRLANG":
                lex = self.expr_term(e.args[0], sol_cols)["value"]
                tag = F.lower(self.expr_term(e.args[1], sol_cols)["value"])
                # language-tagged literals are rdf:langString with the
                # tag lowercased at construction (term.py literal())
                return F.struct(
                    F.lit("lit").alias("kind"), lex.alias("value"),
                    F.lit(V.RDF_LANG_STRING).alias("datatype"),
                    tag.alias("lang"),
                )
            if e.fn == "ENCODE_FOR_URI":
                v = self.expr_term(e.args[0], sol_cols)["value"]
                # url_encode is form-encoding; patch its three RFC-3986
                # divergences (space→'+', '~' escaped, '*' kept)
                enc = F.url_encode(v)
                enc = F.replace(enc, F.lit("+"), F.lit("%20"))
                enc = F.replace(enc, F.lit("%7E"), F.lit("~"))
                enc = F.replace(enc, F.lit("*"), F.lit("%2A"))
                return self._str_term(enc)
            if e.fn in ("MD5", "SHA1", "SHA256"):
                v = self.expr_term(e.args[0], sol_cols)["value"]
                out = {
                    "MD5": lambda c: F.md5(c.cast("binary")),
                    "SHA1": lambda c: F.sha1(c.cast("binary")),
                    "SHA256": lambda c: F.sha2(c.cast("binary"), 256),
                }[e.fn](v)
                return self._str_term(out)
            if e.fn == "LANG":
                v = self.expr_term(e.args[0], sol_cols)
                return F.struct(
                    F.lit("lit").alias("kind"), F.coalesce(v["lang"], F.lit("")).alias("value"),
                    F.lit(V.XSD_STRING).alias("datatype"), F.lit("").alias("lang"),
                )
            if e.fn == "STR":
                v = self.expr_term(e.args[0], sol_cols)
                return F.struct(
                    F.lit("lit").alias("kind"), v["value"].alias("value"),
                    F.lit(V.XSD_STRING).alias("datatype"), F.lit("").alias("lang"),
                )
            if e.fn == "DATATYPE":
                v = self.expr_term(e.args[0], sol_cols)
                return F.struct(
                    F.lit("iri").alias("kind"), v["datatype"].alias("value"),
                    F.lit("").alias("datatype"), F.lit("").alias("lang"),
                )
            if e.fn == "CONCAT":
                parts = [self.expr_term(a, sol_cols)["value"] for a in e.args]
                return F.struct(
                    F.lit("lit").alias("kind"), F.concat(*parts).alias("value"),
                    F.lit(V.XSD_STRING).alias("datatype"), F.lit("").alias("lang"),
                )
            if e.fn == "COALESCE":
                return F.coalesce(*[self.expr_term(a, sol_cols) for a in e.args])
        # boolean-valued expression in term position
        b = self.expr_bool(e, sol_cols)
        return F.struct(
            F.lit("lit").alias("kind"),
            F.when(b, "true").otherwise("false").alias("value"),
            F.lit(V.XSD_BOOLEAN).alias("datatype"), F.lit("").alias("lang"),
        )

    # expression → boolean column (SPARQL errors ≈ null ⇒ filtered out)
    def expr_bool(self, e, sol_cols: set[str]) -> Column:
        if isinstance(e, EBin):
            if e.op == "&&":
                return self.expr_bool(e.a, sol_cols) & self.expr_bool(e.b, sol_cols)
            if e.op == "||":
                return self.expr_bool(e.a, sol_cols) | self.expr_bool(e.b, sol_cols)
            a = self.expr_term(e.a, sol_cols)
            b = self.expr_term(e.b, sol_cols)
            if e.op == "=":
                return a == b
            if e.op == "!=":
                return ~(a == b)
            from .compare import compare_terms

            op = {"<": "lt", ">": "gt", "<=": "le", ">=": "ge"}[e.op]
            return compare_terms(a, b, op)
        if isinstance(e, ENot):
            return ~self.expr_bool(e.a, sol_cols)
        if isinstance(e, EMark):
            return F.col(e.col)
        if isinstance(e, EExists):
            # every expression position (FILTER / BIND / HAVING /
            # SELECT exprs / ORDER BY keys) resolves EExists to EMark
            # via a mark-join pass before evaluation — reaching here
            # means a new position was added without one
            raise SparqlUnsupported(
                "EXISTS reached evaluation without a mark-join pass"
            )
        if isinstance(e, EIn):
            t = self.expr_term(e.expr, sol_cols)
            cond = F.lit(False)
            for item in e.items:
                cond = cond | (t == self.expr_term(item, sol_cols))
            return ~cond if e.negated else cond
        if isinstance(e, ECall):
            if e.fn == "BOUND":
                return self.expr_term(e.args[0], sol_cols).isNotNull()
            if e.fn == "SAMETERM":
                # exact term identity — precisely the TERM struct equality
                a = self.expr_term(e.args[0], sol_cols)
                b = self.expr_term(e.args[1], sol_cols)
                return a == b
            if e.fn == "ISNUMERIC":
                t = self.expr_term(e.args[0], sol_cols)
                numeric_dts = [
                    V.XSD_INTEGER, V.XSD_DECIMAL, V.XSD_DOUBLE,
                    V.XSD + "float", V.XSD + "long", V.XSD + "int",
                    V.XSD + "short", V.XSD + "byte",
                    V.XSD + "nonNegativeInteger", V.XSD + "nonPositiveInteger",
                    V.XSD + "positiveInteger", V.XSD + "negativeInteger",
                    V.XSD + "unsignedLong", V.XSD + "unsignedInt",
                    V.XSD + "unsignedShort", V.XSD + "unsignedByte",
                ]
                return (
                    (t["kind"] == "lit")
                    & t["datatype"].isin(numeric_dts)
                    & t["value"].try_cast("double").isNotNull()
                )
            if e.fn == "ISLITERAL":
                return self.expr_term(e.args[0], sol_cols)["kind"] == "lit"
            if e.fn in ("ISIRI", "ISURI"):
                return self.expr_term(e.args[0], sol_cols)["kind"] == "iri"
            if e.fn == "ISBLANK":
                return self.expr_term(e.args[0], sol_cols)["kind"] == "bnode"
            if e.fn == "LANGMATCHES":
                langc = self.expr_term(e.args[0], sol_cols)["value"]
                rng = self.expr_term(e.args[1], sol_cols)["value"]
                return (langc != "") & (
                    (rng == "*")
                    | (F.lower(langc) == F.lower(rng))
                    | F.lower(langc).startswith(F.concat(F.lower(rng), F.lit("-")))
                )
            if e.fn in ("STRSTARTS", "STRENDS", "CONTAINS"):
                v = self.expr_term(e.args[0], sol_cols)["value"]
                arg = self.expr_term(e.args[1], sol_cols)["value"]
                return {
                    "STRSTARTS": v.startswith(arg),
                    "STRENDS": v.endswith(arg),
                    "CONTAINS": v.contains(arg),
                }[e.fn]
            if e.fn == "REGEX":
                v = self.expr_term(e.args[0], sol_cols)["value"]
                pat = self.expr_term(e.args[1], sol_cols)["value"]
                flags = (
                    self.expr_term(e.args[2], sol_cols)["value"]
                    if len(e.args) > 2 else None
                )
                return F.regexp_like(v, self._regex_pat(pat, flags))
        if isinstance(e, Term) and e.is_literal and e.datatype == V.XSD_BOOLEAN:
            return F.lit(e.value == "true")
        # effective boolean value of a term expression
        t = self.expr_term(e, sol_cols)
        return (t["kind"] == "lit") & (
            ((t["datatype"] == V.XSD_BOOLEAN) & (t["value"] == "true"))
            | ((t["datatype"] != V.XSD_BOOLEAN) & (F.length(t["value"]) > 0))
        )

    # --- pattern evaluation ------------------------------------------------
    def eval_elems(self, elems, sol: DataFrame, source: DataFrame) -> DataFrame:
        for el in elems:
            sol = self.eval_elem(el, sol, source)
        return sol

    def eval_elem(self, el, sol: DataFrame, source: DataFrame) -> DataFrame:
        cols = set(sol.columns)
        if isinstance(el, TP):
            pre = self._fresh()
            t = source.select(
                F.col("s").alias(f"{pre}_s"),
                F.struct(
                    F.lit("iri").alias("kind"), F.col("p").alias("value"),
                    F.lit("").alias("datatype"), F.lit("").alias("lang"),
                ).alias(f"{pre}_p"),
                F.col("o").alias(f"{pre}_o"),
            )
            conds: list[Column] = []
            new_vars: list[tuple[str, str]] = []
            for slot, cname in ((el.s, f"{pre}_s"), (el.p, f"{pre}_p"), (el.o, f"{pre}_o")):
                if isinstance(slot, Var):
                    vc = _vcol(slot.name)
                    if vc in cols:
                        conds.append(F.col(vc) == F.col(cname))
                    elif any(v == vc for v, _ in new_vars):
                        prev = next(c for v, c in new_vars if v == vc)
                        conds.append(F.col(prev) == F.col(cname))
                    else:
                        new_vars.append((vc, cname))
                else:
                    conds.append(F.col(cname) == term_lit(slot))
            joined = (
                sol.join(t, reduce(lambda a, b: a & b, conds)) if conds else sol.crossJoin(t)
            )
            keep = [F.col(c) for c in sol.columns] + [
                F.col(c).alias(v) for v, c in new_vars
            ]
            return joined.select(*keep)
        if isinstance(el, Filter):
            ex_nodes: list[EExists] = []
            _collect_exists(el.expr, ex_nodes)
            if ex_nodes:
                # embedded [NOT] EXISTS: mark-join each subpattern's
                # match set onto the solution as a boolean column, then
                # evaluate the whole &&/||/! tree over the marks and
                # project the marks back off
                mapping: dict[int, object] = {}
                work = sol
                for ex in ex_nodes:
                    mark = f"{self._fresh()}_ex"
                    work = self._mark_exists(ex, work, source, mark)
                    m: object = EMark(mark)
                    mapping[id(ex)] = ENot(m) if ex.negated else m
                expr2 = _subst_exists(el.expr, mapping)
                return work.where(
                    self.expr_bool(expr2, set(work.columns))
                ).select(*[F.col(c) for c in sol.columns])
            return sol.where(self.expr_bool(el.expr, cols))
        if isinstance(el, Bind):
            ex_nodes = []
            _collect_exists(el.expr, ex_nodes)
            if ex_nodes:
                # BIND(... EXISTS {...} ... AS ?v): mark-join the
                # subpatterns, evaluate the expression over the marks,
                # drop the marks (same machinery as FILTER EXISTS)
                mapping: dict[int, object] = {}
                work, marks = sol, []
                for ex in ex_nodes:
                    mark = f"{self._fresh()}_ex"
                    work = self._mark_exists(ex, work, source, mark)
                    marks.append(mark)
                    m: object = EMark(mark)
                    mapping[id(ex)] = ENot(m) if ex.negated else m
                expr2 = _subst_exists(el.expr, mapping)
                return work.withColumn(
                    _vcol(el.var.name), self.expr_term(expr2, set(work.columns))
                ).drop(*marks)
            return sol.withColumn(_vcol(el.var.name), self.expr_term(el.expr, cols))
        if isinstance(el, GraphBlock):
            # The validation dataset has exactly ONE named graph — the
            # shapes graph under urn:shacl:shapes-graph (dataset.rs:10;
            # the data graph is the DEFAULT graph, which GRAPH never
            # matches). So: $shapesGraph / its IRI evaluate over the
            # shapes triples; any other IRI names a graph that does not
            # exist (zero solutions, like the reference's oxigraph
            # store); a plain variable ranges over the one named graph,
            # binding it to the shapes-graph IRI.
            tgt = el.target
            shapes_src = self.vd.ds.shapes_triples_df()
            if isinstance(tgt, Var):
                if tgt.name == "shapesGraph":
                    return self.eval_elems(el.elems, sol, shapes_src)
                out = self.eval_elems(el.elems, sol, shapes_src)
                g_term = term_lit(iri(SHAPES_GRAPH_IRI))
                vc = _vcol(tgt.name)
                # check the EVALUATED columns, not just sol's: the
                # graph variable may be pre-bound by the outer solution
                # OR bound by a pattern inside the block — both must
                # FILTER on equality with the graph IRI (overwriting a
                # pattern-derived binding would fabricate solutions)
                if vc in out.columns:
                    return out.where(F.col(vc) == g_term)
                return out.withColumn(vc, g_term)
            if isinstance(tgt, Term) and tgt.value == SHAPES_GRAPH_IRI:
                return self.eval_elems(el.elems, sol, shapes_src)
            return sol.limit(0)
        if isinstance(el, UnionBlock):
            parts = [self.eval_elems(b, sol, source) for b in el.branches]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p, allowMissingColumns=True)
            return out
        if isinstance(el, NotExists):
            inner_vars = _pattern_vars(el.elems)
            shared = [c for c in sol.columns if c.startswith("v_") and c in inner_vars]
            keys = ["focus", *shared]
            inner_sol = self.eval_elems(el.elems, sol, source)
            pre = self._fresh()
            matches = inner_sol.select(
                *[F.col(k).alias(f"{pre}_{k}") for k in keys]
            ).distinct()
            how = "left_anti" if el.negated else "left_semi"
            cond = reduce(
                lambda a, b: a & b,
                [F.col(k).eqNullSafe(F.col(f"{pre}_{k}")) for k in keys],
            )
            return sol.join(matches, cond, how)
        if isinstance(el, OptionalBlock):
            # SPARQL LeftJoin: evaluate the inner pattern from the
            # distinct projection of the shared solution variables (the
            # pre-bound scope), then left-join back — unmatched rows
            # keep their bindings with the OPTIONAL's new vars null.
            inner_vars = _pattern_vars(el.elems)
            shared = [c for c in sol.columns if c.startswith("v_") and c in inner_vars]
            base_cols = ["focus", *shared]
            base = sol.select(*base_cols).distinct()
            inner_sol = self.eval_elems(el.elems, base, source)
            new_vars = [c for c in inner_sol.columns if c not in base_cols]
            if not new_vars:
                return sol  # OPTIONAL never removes rows
            pre = self._fresh()
            right = inner_sol.select(
                *[F.col(k).alias(f"{pre}_{k}") for k in base_cols],
                *[F.col(v) for v in new_vars],
            )
            cond = reduce(
                lambda a, b: a & b,
                [F.col(k).eqNullSafe(F.col(f"{pre}_{k}")) for k in base_cols],
            )
            return sol.join(right, cond, "left").select(
                *[F.col(c) for c in sol.columns], *new_vars
            )
        if isinstance(el, ValuesBlock):
            spark = sol.sparkSession
            null_term = F.lit(None).cast(TERM_TYPE)
            branches = [
                spark.range(1).select(*[
                    (term_lit(t) if t is not None else null_term)
                    .alias(_vcol(v.name))
                    for v, t in zip(el.vars, row)
                ])
                for row in el.rows
            ]
            vals = reduce(DataFrame.unionByName, branches).distinct()
            shared = [c for c in vals.columns if c in cols]
            has_undef = any(t is None for row in el.rows for t in row)
            if not has_undef:
                if shared:
                    return sol.join(vals, shared)
                return sol.crossJoin(vals)
            # UNDEF rows: SPARQL compatibility join — an unbound cell
            # on either side is compatible with anything, the merged
            # binding is whichever side bound it. The VALUES side is a
            # literal handful of rows, so the non-equi condition plans
            # as a broadcast nested-loop join over a tiny build side.
            pre = self._fresh()
            right = vals.select(
                *[F.col(c).alias(f"{pre}_{c}") for c in vals.columns]
            )
            if shared:
                cond = reduce(
                    lambda a, b: a & b,
                    [
                        F.col(f"{pre}_{c}").isNull() | F.col(c).isNull()
                        | (F.col(f"{pre}_{c}") == F.col(c))
                        for c in shared
                    ],
                )
                joined = sol.join(right, cond)
            else:
                joined = sol.crossJoin(right)
            out = [
                F.coalesce(F.col(c), F.col(f"{pre}_{c}")).alias(c)
                if c in shared else F.col(c)
                for c in sol.columns
            ] + [
                F.col(f"{pre}_{c}").alias(c)
                for c in vals.columns if c not in shared
            ]
            return joined.select(*out)
        if isinstance(el, PathTP):
            return self.eval_path_tp(el, sol, source)
        raise SparqlParseError(f"unsupported element {el!r}")

    def _mark_exists(
        self, ex: EExists, sol: DataFrame, source: DataFrame, mark: str
    ) -> DataFrame:
        """Left-join a boolean `mark` column onto sol: true iff the
        EXISTS subpattern matches under the row's bindings (same
        shared-key machinery as the semi/anti-join NotExists)."""
        inner_vars = _pattern_vars(ex.elems)
        shared = [c for c in sol.columns
                  if c.startswith("v_") and c in inner_vars]
        keys = ["focus", *shared]
        inner_sol = self.eval_elems(ex.elems, sol, source)
        pre = self._fresh()
        matches = (
            inner_sol.select(*[F.col(k).alias(f"{pre}_{k}") for k in keys])
            .distinct()
            .withColumn(mark, F.lit(True))
        )
        cond = reduce(
            lambda a, b: a & b,
            [F.col(k).eqNullSafe(F.col(f"{pre}_{k}")) for k in keys],
        )
        return sol.join(matches, cond, "left").select(
            *[F.col(c) for c in sol.columns],
            F.coalesce(F.col(mark), F.lit(False)).alias(mark),
        )

    # --- property-path patterns ------------------------------------------
    def _path_accessors(self, source: DataFrame):
        """(pred, all_triples) for the graph a path walks. The data
        graph uses the Dataset's predicate-filtered accessor (partition
        pruning on columnar sources); any other source — the broadcast
        shapes triples of a GRAPH $shapesGraph block — gets an
        equivalent predicate filter over that frame."""
        ds = self.vd.ds
        if source is self.data_source:
            return ds.pred, ds.triples
        return (lambda p_iri: source.where(F.col("p") == p_iri)), source

    def eval_path_tp(self, el: PathTP, sol: DataFrame, source: DataFrame) -> DataFrame:
        pred, all_triples = self._path_accessors(source)
        cols = set(sol.columns)
        s, o, node = el.s, el.o, el.path

        def bound(slot) -> bool:
            return isinstance(slot, Term) or (
                isinstance(slot, Var) and _vcol(slot.name) in cols
            )

        both_unbound = False
        if not bound(s):
            if not bound(o):
                both_unbound = True
            else:
                s, o, node = o, s, _invert_path(node)
        spark = sol.sparkSession
        if both_unbound:
            # ?x path ?y with neither endpoint bound — the spec ranges x
            # over every graph term (zeroOrMore emits (t, t) for all of
            # them; hop-headed paths prune non-starters in the first
            # join). One distinct over the union of both term columns.
            t = all_triples
            seed = (
                t.select(F.col("s").alias("k"))
                .unionByName(t.select(F.col("o").alias("k")))
                .distinct()
                .select("k", F.col("k").alias("v"))
            )
        elif isinstance(s, Term):
            seed = spark.range(1).select(
                term_lit(s).alias("k"), term_lit(s).alias("v")
            )
        else:
            seed = (
                sol.select(F.col(_vcol(s.name)).alias("k"))
                .where(F.col("k").isNotNull())
                .distinct()
                .select("k", F.col("k").alias("v"))
            )
        pairs = self._apply_path(node, seed, pred, all_triples)
        pre = self._fresh()
        right = pairs.select(
            F.col("k").alias(f"{pre}_k"), F.col("v").alias(f"{pre}_v")
        )
        conds: list[Column] = []
        if isinstance(s, Var) and not both_unbound:
            conds.append(F.col(_vcol(s.name)) == F.col(f"{pre}_k"))
        if isinstance(o, Term):
            conds.append(F.col(f"{pre}_v") == term_lit(o))
        elif _vcol(o.name) in cols:
            conds.append(F.col(_vcol(o.name)) == F.col(f"{pre}_v"))
        extra = []
        if both_unbound and isinstance(o, Var) and o.name == s.name:
            # ?x path ?x — one variable, pairs restricted to k = v
            right = right.where(F.col(f"{pre}_k") == F.col(f"{pre}_v"))
            extra = [F.col(f"{pre}_k").alias(_vcol(s.name))]
        else:
            if both_unbound:
                extra.append(F.col(f"{pre}_k").alias(_vcol(s.name)))
            if isinstance(o, Var) and _vcol(o.name) not in cols:
                extra.append(F.col(f"{pre}_v").alias(_vcol(o.name)))
        joined = (
            sol.join(right, reduce(lambda a, b: a & b, conds))
            if conds else sol.crossJoin(right)
        )
        return joined.select(*[F.col(c) for c in sol.columns], *extra)

    def _apply_path(self, node, frontier: DataFrame, pred, all_triples) -> DataFrame:
        """(k, v) frontier → (k, v') pairs after one full application of
        the path node; always deduplicated on (k, v). `pred` and
        `all_triples` are the walked graph's accessors (data graph or a
        GRAPH $shapesGraph source — see _path_accessors)."""
        if isinstance(node, (PHop, PInvH)):
            inv = isinstance(node, PInvH)
            t = pred(node.iri).select(
                F.col("s").alias("_ps"), F.col("o").alias("_po")
            )
            src, dst = ("_po", "_ps") if inv else ("_ps", "_po")
            return (
                frontier.join(t, frontier["v"] == F.col(src))
                .select("k", F.col(dst).alias("v"))
                .dropDuplicates(["k", "v"])
            )
        if isinstance(node, PNeg):
            # one predicate-NOT-IN-filtered scan per direction clause;
            # the isin negation pushes to the parquet scan like pred()
            parts = []
            if node.fwd:
                t = all_triples.where(
                    ~F.col("p").isin([*node.fwd])
                ).select(F.col("s").alias("_ps"), F.col("o").alias("_po"))
                parts.append(
                    frontier.join(t, frontier["v"] == F.col("_ps"))
                    .select("k", F.col("_po").alias("v"))
                )
            if node.inv:
                t = all_triples.where(
                    ~F.col("p").isin([*node.inv])
                ).select(F.col("s").alias("_ps"), F.col("o").alias("_po"))
                parts.append(
                    frontier.join(t, frontier["v"] == F.col("_po"))
                    .select("k", F.col("_ps").alias("v"))
                )
            return reduce(DataFrame.unionByName, parts).dropDuplicates(
                ["k", "v"]
            )
        if isinstance(node, PSeq):
            cur = frontier
            for e in node.elems:
                cur = self._apply_path(e, cur, pred, all_triples)
            return cur
        if isinstance(node, PAlt):
            parts = [self._apply_path(a, frontier, pred, all_triples)
                     for a in node.alts]
            return reduce(DataFrame.unionByName, parts).dropDuplicates(["k", "v"])
        if isinstance(node, POpt):
            return (
                frontier.select("k", "v")
                .unionByName(self._apply_path(node.inner, frontier, pred,
                                              all_triples))
                .dropDuplicates(["k", "v"])
            )
        if isinstance(node, PStar):
            return (
                frontier.select("k", "v")
                .unionByName(self._path_closure(node.inner, frontier, pred,
                                                all_triples))
                .dropDuplicates(["k", "v"])
            )
        if isinstance(node, PPlus):
            return self._path_closure(node.inner, frontier, pred, all_triples)
        raise SparqlParseError(f"unknown path node {node!r}")

    def _path_closure(self, inner, start: DataFrame, pred, all_triples) -> DataFrame:
        """Spec-compliant transitive closure seeded per k: every node
        reachable in ≥ 1 step — INCLUDING the start node when a cycle
        returns to it (paths.py's SHACL walker deliberately excludes
        it; sh:sparql follows the SPARQL spec).

        Fast path: a single-predicate hop over the DATA graph with a
        small edge set serves the Dataset's memoized spec-mode closure
        pairs (dataset.py::kleene_pairs(spec=True)) as ONE broadcast
        join — the same ontology-sized-relation device the SHACL path
        walker uses, reused across every sh:sparql constraint that
        walks the same predicate. Large edge sets (the 100 TB case)
        use the iterative checkpointed frontier fixpoint; only the
        per-round `fresh` frontier is checkpointed — the accumulator
        and visited set are unions of already-materialized rounds, so
        each round costs one checkpoint job instead of three."""
        from .paths import _MAX_KLEENE_ITERS

        if isinstance(inner, (PHop, PInvH)) and all_triples is self.data_source:
            pairs = self.vd.ds.kleene_pairs_hinted(
                inner.iri, isinstance(inner, PInvH), spec=True
            )
            if pairs is not None:
                return (
                    start.join(pairs, start["v"] == pairs["start"])
                    .select("k", F.col("reached").alias("v"))
                    .dropDuplicates(["k", "v"])
                )

        expanded = (
            start.select("k", "v").dropDuplicates(["k", "v"])
            .localCheckpoint(eager=True)
        )
        frontier = expanded
        # acc unions the RAW step frames — not `fresh` — because a step
        # that cycles back to a seed pair (k, k) is absent from `fresh`
        # (the seed is in `expanded`) yet must be emitted: that is
        # exactly the spec-vs-SHACL difference this closure implements.
        # The terminal step (fresh empty) is appended for the same
        # reason. Each step hangs one join off a checkpointed frontier,
        # so the final union's lineage stays shallow without per-round
        # accumulator checkpoints.
        rounds: list[DataFrame] = []
        for i in range(_MAX_KLEENE_ITERS):
            step = self._apply_path(inner, frontier, pred, all_triples)
            rounds.append(step)
            fresh = step.join(expanded, ["k", "v"], "left_anti").localCheckpoint(
                eager=True
            )
            if fresh.isEmpty():
                break
            expanded = expanded.unionByName(fresh)
            # compact the visited set periodically so the union width
            # (and the left_anti probe plan) stays bounded on deep graphs
            if (i + 1) % 8 == 0:
                expanded = expanded.localCheckpoint(eager=True)
            frontier = fresh
        else:
            raise RuntimeError("property-path closure did not terminate")
        acc = rounds[0]
        for r in rounds[1:]:
            acc = acc.unionByName(r)
        return acc.dropDuplicates(["k", "v"])

    # --- aggregates / solution modifiers ---------------------------------
    def agg_column(self, agg: EAgg, sol_cols: set[str]) -> Column:
        """EAgg → one aggregate expression producing a TERM struct.
        COUNT/STRLEN-style integers type as xsd:integer; SUM/AVG keep
        integral formatting (``_num_term``) so struct-equality against
        integer literals behaves; MIN/MAX pick the spec's numeric-first
        ordering via min_by/max_by on a (non-numeric, num, lex) key;
        SAMPLE is pinned to the lexicographic minimum and GROUP_CONCAT
        to sorted order — the spec leaves both undefined, a
        deterministic pick keeps oracle/stream/batch twins hash-equal."""
        if agg.fn == "COUNT":
            if agg.arg is None:
                cnt = F.count(F.lit(1))
            else:
                t = self.expr_term(agg.arg, sol_cols)
                cnt = F.count_distinct(t) if agg.distinct else F.count(t)
            return F.struct(
                F.lit("lit").alias("kind"), cnt.cast("string").alias("value"),
                F.lit(V.XSD_INTEGER).alias("datatype"), F.lit("").alias("lang"),
            )
        t = self.expr_term(agg.arg, sol_cols)
        if agg.fn in ("SUM", "AVG"):
            n = t["value"].try_cast("double")
            out = (
                (F.sum_distinct(n) if agg.distinct else F.sum(n))
                if agg.fn == "SUM" else F.avg(n)
            )
            return self._num_term(out)
        if agg.fn in ("MIN", "MAX"):
            n = t["value"].try_cast("double")
            key = F.struct(
                n.isNull().cast("int"), F.coalesce(n, F.lit(0.0)), t["value"]
            )
            return F.min_by(t, key) if agg.fn == "MIN" else F.max_by(t, key)
        if agg.fn == "SAMPLE":
            return F.min_by(t, t["value"])
        if agg.fn == "GROUP_CONCAT":
            vals = (
                F.collect_set(t["value"]) if agg.distinct
                else F.collect_list(t["value"])
            )
            return self._str_term(F.array_join(F.array_sort(vals), agg.sep))
        raise SparqlUnsupported(f"aggregate {agg.fn} is not supported")

    def order_key(self, expr, sol_cols: set[str]) -> Column:
        """ORDER BY key: numbers before strings, numeric order within."""
        t = self.expr_term(expr, sol_cols)
        n = t["value"].try_cast("double")
        return F.struct(
            n.isNull().cast("int"), F.coalesce(n, F.lit(0.0)), t["value"]
        )


def _collect_aggs(e, out: dict) -> None:
    if isinstance(e, EAgg):
        out.setdefault(e, f"__agg{len(out)}")
        return
    if isinstance(e, EBin):
        _collect_aggs(e.a, out)
        _collect_aggs(e.b, out)
    elif isinstance(e, ENot):
        _collect_aggs(e.a, out)
    elif isinstance(e, EIn):
        _collect_aggs(e.expr, out)
        for item in e.items:
            _collect_aggs(item, out)
    elif isinstance(e, ECall):
        for a in e.args:
            _collect_aggs(a, out)


def _collect_exists(e, out: list) -> None:
    if isinstance(e, EExists):
        out.append(e)
        return
    if isinstance(e, EBin):
        _collect_exists(e.a, out)
        _collect_exists(e.b, out)
    elif isinstance(e, ENot):
        _collect_exists(e.a, out)
    elif isinstance(e, EIn):
        _collect_exists(e.expr, out)
        for item in e.items:
            _collect_exists(item, out)
    elif isinstance(e, ECall):
        for a in e.args:
            _collect_exists(a, out)


def _subst_exists(e, mapping: dict):
    """Replace each EExists (by identity) with its EMark / ENot(EMark)."""
    if isinstance(e, EExists):
        return mapping[id(e)]
    if isinstance(e, EBin):
        return EBin(e.op, _subst_exists(e.a, mapping),
                    _subst_exists(e.b, mapping))
    if isinstance(e, ENot):
        return ENot(_subst_exists(e.a, mapping))
    if isinstance(e, EIn):
        return EIn(
            _subst_exists(e.expr, mapping),
            tuple(_subst_exists(i, mapping) for i in e.items),
            e.negated,
        )
    if isinstance(e, ECall):
        return ECall(e.fn, tuple(_subst_exists(a, mapping) for a in e.args))
    return e


def _subst_aggs(e, mapping: dict):
    if isinstance(e, EAgg):
        return Var(mapping[e])
    if isinstance(e, EBin):
        return EBin(e.op, _subst_aggs(e.a, mapping), _subst_aggs(e.b, mapping))
    if isinstance(e, ENot):
        return ENot(_subst_aggs(e.a, mapping))
    if isinstance(e, EIn):
        return EIn(
            _subst_aggs(e.expr, mapping),
            tuple(_subst_aggs(i, mapping) for i in e.items),
            e.negated,
        )
    if isinstance(e, ECall):
        return ECall(e.fn, tuple(_subst_aggs(a, mapping) for a in e.args))
    return e


def _apply_modifiers(
    compiler: _Compiler, query: SparqlQuery, sol: DataFrame, ctx: DataFrame
) -> DataFrame:
    """GROUP BY / aggregates / HAVING / projection binds / OFFSET+LIMIT.

    The reference evaluates sh:sparql once per pre-binding ($this, and
    $value for property shapes — sparql.rs:156-169), so aggregation
    groups BY THE PRE-BINDING: the implicit group keys are every ctx
    column, with explicit GROUP BY vars subdividing within a run, and
    LIMIT/OFFSET slice per run (row_number windowed by the ctx keys).
    With no explicit GROUP BY, a run whose WHERE matched nothing still
    yields one aggregate row (COUNT = 0, SUM/AVG = 0, GROUP_CONCAT =
    "", MIN/MAX/SAMPLE unbound), restored by a left join from ctx."""
    aggs: dict[EAgg, str] = {}
    for item in query.projection:
        if isinstance(item, tuple):
            _collect_aggs(item[0], aggs)
    for h in query.having:
        _collect_aggs(h, aggs)
    if (aggs or query.group_by) and not query.is_select:
        raise SparqlUnsupported("aggregates are not supported in ASK constraints")
    mapping = dict(aggs)

    if aggs or query.group_by:
        keys = [c for c in ctx.columns if c in sol.columns]
        anon_keys: list[str] = []
        for v in query.group_by:
            if isinstance(v, GroupExpr):
                # computed grouping key: evaluated once per solution
                # row, grouped on the resulting term column; a named
                # key ((expr AS ?v)) stays projectable as ?v, an
                # anonymous one is dropped again after grouping
                vc = (_vcol(v.var.name) if v.var is not None
                      else f"{compiler._fresh()}_gk")
                if v.var is None:
                    anon_keys.append(vc)
                sol = sol.withColumn(
                    vc, compiler.expr_term(v.expr, set(sol.columns))
                )
                if vc not in keys:
                    keys.append(vc)
                continue
            vc = _vcol(v.name)
            if vc not in keys:
                if vc not in sol.columns:
                    raise SparqlParseError(f"GROUP BY of unbound variable ?{v.name}")
                keys.append(vc)
        cols = set(sol.columns)
        agg_exprs = [
            compiler.agg_column(a, cols).alias(_vcol(name))
            for a, name in aggs.items()
        ]
        grouped = (
            sol.groupBy(*keys).agg(*agg_exprs)
            if agg_exprs else sol.select(*keys).dropDuplicates(keys)
        )
        if not query.group_by:
            base = ctx.select(*[k for k in keys if k in ctx.columns]).distinct()
            grouped = base.join(grouped, keys, "left")
            for a, name in aggs.items():
                empty = None
                if a.fn == "COUNT":
                    empty = term_lit(literal("0", V.XSD_INTEGER))
                elif a.fn in ("SUM", "AVG"):
                    empty = term_lit(literal("0", V.XSD_INTEGER))
                elif a.fn == "GROUP_CONCAT":
                    empty = term_lit(literal(""))
                if empty is not None:
                    vc = _vcol(name)
                    grouped = grouped.withColumn(vc, F.coalesce(F.col(vc), empty))
        sol = grouped.drop(*anon_keys) if anon_keys else grouped

    # [NOT] EXISTS embedded in HAVING / projection expressions: resolve
    # each subpattern to a boolean mark column on the (grouped) solution
    # first — the same mark-join machinery as FILTER-embedded EXISTS —
    # then evaluate the expression trees over the marks and drop them.
    # Per SPARQL 1.1 §11.1 the subpattern sees the group's visible
    # bindings, which after aggregation are exactly sol's columns.
    having = [_subst_aggs(h, mapping) for h in query.having]
    projection = [
        (_subst_aggs(item[0], mapping), item[1]) if isinstance(item, tuple)
        else item
        for item in query.projection
    ]
    ex_nodes: list[EExists] = []
    for h in having:
        _collect_exists(h, ex_nodes)
    for item in projection:
        if isinstance(item, tuple):
            _collect_exists(item[0], ex_nodes)
    marks: list[str] = []
    if ex_nodes:
        exmap: dict[int, object] = {}
        for ex in ex_nodes:
            mark = f"{compiler._fresh()}_ex"
            sol = compiler._mark_exists(ex, sol, compiler.data_source, mark)
            marks.append(mark)
            m: object = EMark(mark)
            exmap[id(ex)] = ENot(m) if ex.negated else m
        having = [_subst_exists(h, exmap) for h in having]
        projection = [
            (_subst_exists(item[0], exmap), item[1])
            if isinstance(item, tuple) else item
            for item in projection
        ]

    for h in having:
        sol = sol.where(compiler.expr_bool(h, set(sol.columns)))
    for item in projection:
        if isinstance(item, tuple):
            expr, var = item
            sol = sol.withColumn(
                _vcol(var.name),
                compiler.expr_term(expr, set(sol.columns)),
            )
    if marks:
        sol = sol.drop(*marks)

    if query.limit is not None or query.offset is not None:
        from pyspark.sql import Window

        part = [c for c in ctx.columns if c in sol.columns]
        tie = [F.col(c) for c in sol.columns]
        # [NOT] EXISTS inside ORDER BY keys (only observable under a
        # LIMIT/OFFSET slice): the same mark-join pass as HAVING —
        # one join per subpattern onto the sliced frame, then the key
        # orders over the boolean mark ("false" < "true" matches
        # SPARQL's boolean order).
        okeys = [_subst_aggs(ok.expr, mapping) for ok in query.order_by]
        ex_nodes = []
        for k in okeys:
            _collect_exists(k, ex_nodes)
        omarks: list[str] = []
        if ex_nodes:
            exmap = {}
            for ex in ex_nodes:
                mark = f"{compiler._fresh()}_ex"
                sol = compiler._mark_exists(
                    ex, sol, compiler.data_source, mark
                )
                omarks.append(mark)
                m: object = EMark(mark)
                exmap[id(ex)] = ENot(m) if ex.negated else m
            okeys = [_subst_exists(k, exmap) for k in okeys]
        order_cols = [
            (compiler.order_key(k, set(sol.columns)).desc() if ok.desc
             else compiler.order_key(k, set(sol.columns)))
            for k, ok in zip(okeys, query.order_by)
        ]
        w = (
            Window.partitionBy(*part) if part else Window.partitionBy(F.lit(1))
        ).orderBy(*order_cols, *tie)
        lo = query.offset or 0
        cond = F.col("_rn") > lo
        if query.limit is not None:
            cond = cond & (F.col("_rn") <= lo + query.limit)
        sol = (
            sol.withColumn("_rn", F.row_number().over(w))
            .where(cond)
            .drop("_rn", *omarks)
        )
    # bare ORDER BY (no slice) cannot change a violation SET — dropped.
    return sol


def _pattern_vars(elems) -> set[str]:
    out: set[str] = set()
    for el in elems:
        if isinstance(el, TP):
            for slot in (el.s, el.p, el.o):
                if isinstance(slot, Var):
                    out.add(_vcol(slot.name))
        elif isinstance(el, (GraphBlock, NotExists, OptionalBlock)):
            out |= _pattern_vars(el.elems)
        elif isinstance(el, UnionBlock):
            for b in el.branches:
                out |= _pattern_vars(b)
        elif isinstance(el, Filter):
            out |= _expr_vars(el.expr)
        elif isinstance(el, Bind):
            out |= _expr_vars(el.expr)
            out.add(_vcol(el.var.name))
        elif isinstance(el, PathTP):
            for slot in (el.s, el.o):
                if isinstance(slot, Var):
                    out.add(_vcol(slot.name))
        elif isinstance(el, ValuesBlock):
            out |= {_vcol(v.name) for v in el.vars}
    return out


def _expr_vars(e) -> set[str]:
    if isinstance(e, Var):
        return {_vcol(e.name)}
    if isinstance(e, EBin):
        return _expr_vars(e.a) | _expr_vars(e.b)
    if isinstance(e, ENot):
        return _expr_vars(e.a)
    if isinstance(e, EIn):
        out = _expr_vars(e.expr)
        for item in e.items:
            out |= _expr_vars(item)
        return out
    if isinstance(e, EExists):
        return _pattern_vars(e.elems)
    if isinstance(e, ECall):
        out: set[str] = set()
        for a in e.args:
            out |= _expr_vars(a)
        return out
    if isinstance(e, EAgg):
        return _expr_vars(e.arg) if e.arg is not None else set()
    return set()


# --- message templates --------------------------------------------------
_TMPL_RE = re.compile(r"\{[?$]([^{}]+)\}")


def _msg_term_col(col: Column) -> Column:
    """Message rendering of a bound term: N3 display (term.py::Term.n3,
    oxigraph Display) with the reference's normalize_binding_value
    applied — IRIs lose their angle brackets, literals keep their
    quoted N-Triples form (sparql.rs:98-104)."""
    v = col.getField("value")
    esc = F.replace(v, F.lit("\\"), F.lit("\\\\"))
    esc = F.replace(esc, F.lit('"'), F.lit('\\"'))
    esc = F.replace(esc, F.lit("\n"), F.lit("\\n"))
    esc = F.replace(esc, F.lit("\r"), F.lit("\\r"))
    lang = col.getField("lang")
    dt = col.getField("datatype")
    lit_form = (
        F.when(lang != "", F.concat(F.lit('"'), esc, F.lit('"@'), lang))
        .when(
            ~dt.isin("", V.XSD_STRING),
            F.concat(F.lit('"'), esc, F.lit('"^^<'), dt, F.lit(">")),
        )
        .otherwise(F.concat(F.lit('"'), esc, F.lit('"')))
    )
    return (
        F.when(col.getField("kind") == "iri", v)
        .when(col.getField("kind") == "bnode", F.concat(F.lit("_:"), v))
        .otherwise(lit_form)
    )


def _render_template(template: str, sol_columns: set[str]) -> Column:
    """Per-solution substitution of {?var}/{$var} message templates
    (apply_message_bindings, sparql.rs:106-131): context pre-bindings
    ($this/$value/$shapesGraph/$currentShape/$PATH/params) and solution
    vars are all columns of the solution frame; a var absent from the
    query — or unbound in a given row (OPTIONAL) — keeps its
    placeholder text, exactly like the reference's replace-only-bound
    loop."""
    parts: list[Column] = []
    pos = 0
    for m in _TMPL_RE.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos:m.start()]))
        vc = _vcol(m.group(1))
        if vc in sol_columns:
            c = F.col(vc)
            parts.append(
                F.when(c.isNull(), F.lit(m.group(0))).otherwise(_msg_term_col(c))
            )
        else:
            parts.append(F.lit(m.group(0)))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    return parts[0] if len(parts) == 1 else F.concat(*parts)


# --- entry point ------------------------------------------------------------
def sparql_violations(
    vd, shape: Shape, c: SparqlC, focus_df: DataFrame, values: DataFrame
) -> list[DataFrame]:
    cc = c.component or V.SH_SPARQL_CC
    # messages verbatim when the shape declares any; per-executable
    # defaults otherwise (sparql.rs:253-254, 280-281, 178-180)
    verbatim = list(c.messages)

    def _vio(df: DataFrame, msg, value: bool = False) -> DataFrame:
        return vd.vio(df, shape, cc, msg, value=value)

    try:
        query = parse_sparql(c.query, dict(c.prefixes))
    except SparqlUnsupported as exc:
        # unsupported pre-binding construct: reference message is the
        # shape's own messages or the fixed fallback; the reason string
        # lands in `detail` there (sparql.rs:173-190) — appended here
        # since the violations schema has no detail column
        msg = verbatim or [f"SPARQL pre-binding violation: {exc}"]
        return [_vio(focus_df, msg)]
    except SparqlParseError as exc:
        return [_vio(focus_df, f"SPARQL parse error: {exc}")]

    # --- initial context -------------------------------------------------
    ctx = focus_df.select(
        "focus",
        F.col("focus").alias("v_this"),
        term_lit(iri(SHAPES_GRAPH_IRI)).alias("v_shapesGraph"),
        term_lit(shape.node).alias("v_currentShape"),
    )
    has_value = False
    if shape.path is not None:
        ctx = ctx.join(values.select("focus", F.col("v").alias("v_value")), "focus", "left")
        has_value = True
        preds = shape.path.direct_predicates()
        if preds:
            ctx = ctx.withColumn("v_PATH", term_lit(iri(preds[0])))
    elif c.component is not None:
        ctx = ctx.withColumn("v_value", F.col("focus"))
        has_value = True
    for name, term in c.params:
        ctx = ctx.withColumn(_vcol(name), term_lit(term))

    compiler = _Compiler(vd, [0])
    try:
        sol = compiler.eval_elems(query.elems, ctx, vd.ds.triples)
        sol = _apply_modifiers(compiler, query, sol, ctx)
    except (SparqlParseError, SparqlUnsupported) as exc:
        return [_vio(focus_df, f"SPARQL rewrite error: {exc}")]

    out: list[DataFrame] = []
    if query.is_select:
        # SELECT messages render per solution: {?var}/{$var} templates
        # substitute that row's bindings (render_messages_for_solution,
        # sparql.rs:122-131); the frame passed to vio keeps the full
        # solution columns so the template columns can resolve
        message = (
            [_render_template(t, set(sol.columns)) for t in verbatim]
            if verbatim
            else "SPARQL SELECT constraint violation"
        )
        if "v_value" in sol.columns:
            viol_rows = sol.withColumn("v", F.col("v_value"))
            out.append(_vio(viol_rows, message, value=True))
        else:
            out.append(_vio(sol, message))
        genuine_focus = sol.select("focus").distinct()
    else:
        # ASK messages are NOT template-substituted (sparql.rs:278-283)
        message = verbatim or "SPARQL ASK constraint violation"
        keys = ["focus"] + (["v_value"] if has_value else [])
        ok = sol.select(*[F.col(k).alias(f"_ok_{k}") for k in keys]).distinct()
        cond = reduce(
            lambda a, b: a & b,
            [F.col(k).eqNullSafe(F.col(f"_ok_{k}")) for k in keys],
        )
        failed = ctx.join(ok, cond, "left_anti")
        if has_value:
            failed = failed.select("focus", F.col("v_value").alias("v"))
            out.append(_vio(failed, message, value=True))
        else:
            out.append(_vio(failed.select("focus"), message))
        genuine_focus = failed.select("focus").distinct()

    # last-resort heuristic (sparql.rs:368-392; messages verbatim there)
    if query.is_select and any(
        tok in c.query for tok in ("bound($this", "bound(?this", "UNION")
    ):
        heur = focus_df.join(genuine_focus, "focus", "left_anti")
        out.append(_vio(heur, verbatim or "SPARQL pre-binding violation"))
    return out
