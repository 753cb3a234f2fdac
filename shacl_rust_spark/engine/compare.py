"""SHACL value comparison as pure Column expressions.

Reproduces the reference's ``compare_values`` exactly
(/root/reference/src/utils.rs:396-433): both terms must be literals;
if both lexical forms parse as f64 → numeric comparison; if neither
parses → byte-lexicographic string comparison; mixed → the comparison is
false (⇒ violation for range constraints). No UDFs — everything stays
inside whole-stage codegen.

Rust's ``str::parse::<f64>`` grammar is stricter than Spark's
``try_cast`` (no surrounding whitespace, no 'd/f' suffixes), so numeric
parses are gated by a regex that mirrors the Rust grammar.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Rust f64::from_str grammar: [+-]? ( inf | infinity | nan | digits[.digits?][exp] | .digits[exp] )
_RUST_F64_RE = (
    r"^[+-]?([0-9]+\.?[0-9]*([eE][+-]?[0-9]+)?"
    r"|\.[0-9]+([eE][+-]?[0-9]+)?"
    r"|[iI][nN][fF]([iI][nN][iI][tT][yY])?"
    r"|[nN][aA][nN])$"
)

_OPS = {
    "lt": lambda a, b: a < b,
    "le": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "ge": lambda a, b: a >= b,
    "eq": lambda a, b: a == b,
}


def rust_f64_parse(value: str) -> float | None:
    """Driver-side twin of the Rust parse, for constant bounds."""
    import re

    if re.match(_RUST_F64_RE, value):
        try:
            return float(value)
        except ValueError:
            return None
    return None


def num_col(lex: Column) -> Column:
    """f64-or-null for a lexical-form column, Rust-grammar gated."""
    return F.when(lex.rlike(_RUST_F64_RE), lex.cast("double"))


def compare_terms(a: Column, b: Column, op: str) -> Column:
    """compare_values(a, b, |cmp| cmp OP 0) over two TERM struct columns."""
    f = _OPS[op]
    both_lit = (a["kind"] == "lit") & (b["kind"] == "lit")
    an, bn = num_col(a["value"]), num_col(b["value"])
    numeric = an.isNotNull() & bn.isNotNull() & f(an, bn)
    stringy = an.isNull() & bn.isNull() & f(a["value"], b["value"])
    return both_lit & (numeric | stringy)


def compare_term_to_const(a: Column, bound, op: str) -> Column:
    """compare_values(a, CONST, ...) with the bound folded driver-side.

    ``bound`` is a driver-side Term. A non-literal bound can never
    compare true (utils.rs:431), so the result is constant false.
    """
    f = _OPS[op]
    if bound.kind != "lit":
        return F.lit(False)
    bound_num = rust_f64_parse(bound.value)
    is_lit = a["kind"] == "lit"
    an = num_col(a["value"])
    if bound_num is not None:
        return is_lit & an.isNotNull() & f(an, F.lit(bound_num))
    return is_lit & an.isNull() & f(a["value"], F.lit(bound.value))
