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
(=, !=, <, >, <=, >=, &&, ||, !, bound, isLiteral/isIRI/isBlank, lang,
langMatches, CONCAT, COALESCE, datatype, str), BIND, GRAPH
$shapesGraph {}, UNION (flattened-scope approximation), FILTER (NOT)
EXISTS via shared-column (anti-)joins, DISTINCT.

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
class ECall:
    fn: str
    args: tuple


@dataclass(frozen=True)
class EBin:
    op: str
    a: object
    b: object


@dataclass(frozen=True)
class ENot:
    a: object


@dataclass(frozen=True)
class SparqlQuery:
    is_select: bool
    elems: tuple


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
  | (?P<op>&&|\|\||!=|<=|>=|[(){}.;,=<>!*])
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
        if self.kw("SELECT"):
            self.next()
            is_select = True
            if self.kw("DISTINCT") or self.kw("REDUCED"):
                self.next()
            # projection: vars / (expr AS ?v) / *
            while not self.kw("WHERE") and self.peek() != "{":
                t = self.peek()
                if t == "(":
                    depth = 0
                    while True:
                        tok = self.next()
                        if tok == "(":
                            depth += 1
                        elif tok == ")":
                            depth -= 1
                            if depth == 0:
                                break
                        if self.peek() == "":
                            raise SparqlParseError("unterminated projection")
                elif t.startswith(("?", "$")) or t == "*":
                    self.next()
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
        return SparqlQuery(is_select, elems)

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
            elif up in ("VALUES", "OPTIONAL"):
                raise SparqlParseError(f"{up} not handled by the subset rewriter")
            else:
                elems.append(self.parse_triple_pattern())
        return tuple(elems)

    def parse_triple_pattern(self) -> TP:
        s = self.parse_term()
        p = self.parse_predicate()
        o = self.parse_term()
        return TP(s, p, o)

    def parse_predicate(self):
        if self.peek() == "a":
            self.next()
            return iri(V.RDF_TYPE)
        return self.parse_term()

    def parse_term(self):
        t = self.next()
        if t.startswith(("?", "$")):
            return Var(t[1:])
        if t.startswith("<"):
            return iri(t[1:-1])
        if t.startswith(('"', "'")):
            value = _unescape(t[1:-1])
            if self.peek() == "^^" or (self.peek() == "^" and self.peek(1) == "^"):
                raise SparqlParseError("typed literals in queries not supported")
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
        e = self.parse_unary()
        if self.peek() in ("=", "!=", "<", ">", "<=", ">="):
            op = self.next()
            e = EBin(op, e, self.parse_unary())
        return e

    def parse_unary(self):
        if self.peek() == "!":
            self.next()
            return ENot(self.parse_unary())
        if self.peek() == "(":
            return self.parse_bracketed_expr()
        t = self.peek()
        up = t.upper()
        if up in (
            "BOUND", "ISLITERAL", "ISIRI", "ISURI", "ISBLANK", "LANG",
            "LANGMATCHES", "CONCAT", "COALESCE", "DATATYPE", "STR",
        ) and self.peek(1) == "(":
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

    # expression → TERM struct column
    def expr_term(self, e, sol_cols: set[str]) -> Column:
        if isinstance(e, (Var, Term)):
            return self.term_col(e, sol_cols)
        if isinstance(e, ECall):
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
        if isinstance(e, ECall):
            if e.fn == "BOUND":
                return self.expr_term(e.args[0], sol_cols).isNotNull()
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
            return sol.where(self.expr_bool(el.expr, cols))
        if isinstance(el, Bind):
            return sol.withColumn(_vcol(el.var.name), self.expr_term(el.expr, cols))
        if isinstance(el, GraphBlock):
            tgt = el.target
            is_shapes = (isinstance(tgt, Var) and tgt.name == "shapesGraph") or (
                isinstance(tgt, Term) and tgt.value == SHAPES_GRAPH_IRI
            )
            if not is_shapes:
                raise SparqlParseError("GRAPH over a non-shapes graph is not supported")
            return self.eval_elems(el.elems, sol, self.vd.ds.shapes_triples_df())
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
        raise SparqlParseError(f"unsupported element {el!r}")


def _pattern_vars(elems) -> set[str]:
    out: set[str] = set()
    for el in elems:
        if isinstance(el, TP):
            for slot in (el.s, el.p, el.o):
                if isinstance(slot, Var):
                    out.add(_vcol(slot.name))
        elif isinstance(el, (GraphBlock, NotExists)):
            out |= _pattern_vars(el.elems)
        elif isinstance(el, UnionBlock):
            for b in el.branches:
                out |= _pattern_vars(b)
        elif isinstance(el, Filter):
            out |= _expr_vars(el.expr)
        elif isinstance(el, Bind):
            out |= _expr_vars(el.expr)
            out.add(_vcol(el.var.name))
    return out


def _expr_vars(e) -> set[str]:
    if isinstance(e, Var):
        return {_vcol(e.name)}
    if isinstance(e, EBin):
        return _expr_vars(e.a) | _expr_vars(e.b)
    if isinstance(e, ENot):
        return _expr_vars(e.a)
    if isinstance(e, ECall):
        out: set[str] = set()
        for a in e.args:
            out |= _expr_vars(a)
        return out
    return set()


# --- entry point ------------------------------------------------------------
def sparql_violations(
    vd, shape: Shape, c: SparqlC, focus_df: DataFrame, values: DataFrame
) -> list[DataFrame]:
    cc = c.component or V.SH_SPARQL_CC
    message = c.messages[0] if c.messages else "SPARQL constraint violation"

    def _vio(df: DataFrame, msg: str, value: bool = False) -> DataFrame:
        return vd.vio(df, shape, cc, msg, value=value)

    try:
        query = parse_sparql(c.query, dict(c.prefixes))
    except SparqlUnsupported as exc:
        return [_vio(focus_df, str(exc))]
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
    except (SparqlParseError, SparqlUnsupported) as exc:
        return [_vio(focus_df, f"SPARQL rewrite error: {exc}")]

    out: list[DataFrame] = []
    if query.is_select:
        if "v_value" in sol.columns:
            viol_rows = sol.select("focus", F.col("v_value").alias("v"))
            out.append(_vio(viol_rows, message, value=True))
        else:
            out.append(_vio(sol.select("focus"), message))
        genuine_focus = sol.select("focus").distinct()
    else:
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

    # last-resort heuristic (sparql.rs:368-392)
    if query.is_select and any(
        tok in c.query for tok in ("bound($this", "bound(?this", "UNION")
    ):
        heur = focus_df.join(genuine_focus, "focus", "left_anti")
        out.append(_vio(heur, "SPARQL pre-binding violation"))
    return out
