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
_NAN_RE = r"^[+-]?[nN][aA][nN]$"
_INF_RE = r"^[+-]?[iI][nN][fF]([iI][nN][iI][tT][yY])?$"

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
    """f64-or-null for a lexical-form column, Rust-grammar gated.

    The special forms Rust parses but Spark's double cast does not
    ("inf"/"infinity", "nan", signed variants) are mapped explicitly;
    everything else Rust-grammar-gated goes through the cast."""
    neg = lex.startswith("-")
    return (
        F.when(lex.rlike(_NAN_RE), F.lit(float("nan")))
        .when(lex.rlike(_INF_RE),
              F.when(neg, F.lit(float("-inf"))).otherwise(F.lit(float("inf"))))
        .when(lex.rlike(_RUST_F64_RE), lex.cast("double"))
    )


def _num_cmp(an: Column, bn: Column, op: str) -> Column:
    """Numeric branch with the reference's NaN quirk: Rust maps the
    comparison through `na < nb` / `na > nb` / else cmp=0, so any NaN
    operand falls through to cmp=0 — i.e. le/ge/eq are TRUE, lt/gt
    FALSE (utils.rs:407-415). Spark's NaN ordering (NaN greater than
    everything, NaN==NaN) would disagree, so the NaN case is explicit."""
    f = _OPS[op]
    either_nan = F.isnan(an) | F.isnan(bn)
    return F.when(either_nan, F.lit(op in ("le", "ge", "eq"))).otherwise(
        f(an, bn)
    )


def compare_terms(a: Column, b: Column, op: str) -> Column:
    """compare_values(a, b, |cmp| cmp OP 0) over two TERM struct columns."""
    f = _OPS[op]
    both_lit = (a["kind"] == "lit") & (b["kind"] == "lit")
    an, bn = num_col(a["value"]), num_col(b["value"])
    numeric = an.isNotNull() & bn.isNotNull() & _num_cmp(an, bn, op)
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
        return is_lit & an.isNotNull() & _num_cmp(an, F.lit(bound_num), op)
    return is_lit & an.isNull() & f(a["value"], F.lit(bound.value))
