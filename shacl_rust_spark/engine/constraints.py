"""The 27 SHACL constraint validators as DataFrame-plan builders.

Each function maps (focus DF, values DF) → violations DF using pure
Column expressions / joins / aggregations (no Python row UDFs), mirroring
the row-at-a-time validators under
/root/reference/src/validation/constraints/ — including their non-spec
quirks, which decide conformance parity:

- sh:class checks DIRECT rdf:type only, and literals always violate
  (class.rs:20-51);
- sh:minLength/maxLength use UTF-8 BYTE length and silently skip
  non-literals (min_length.rs:23, max_length.rs:26) → octet_length;
- invalid sh:pattern regexes disable the constraint (pattern.rs:40-42);
- sh:languageIn compares case-insensitively, missing tags violate
  (language_in.rs:24-39);
- sh:uniqueLang flags every duplicate occurrence after the first and
  ignores its boolean operand (unique_lang.rs:20-45);
- sh:equals additionally requires the OTHER path to be non-empty and
  each other-value to equal the focus node (equals.rs:47-71);
- sh:lessThan(/OrEquals) passes when the value is less than ANY
  other-path value (less_than.rs:38-45), and passes when the other path
  is empty;
- range constraints use the f64-else-string compare (see compare.py).

Nested-shape constraints (node/and/or/xone/not/qualifiedValueShape)
recurse through the validator callback — unrolled at compile time into
one lazy plan; no executor-side recursion.
"""

from __future__ import annotations

import re
from functools import reduce
from operator import or_
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..schema import term_lit
from ..shapes.ir import (
    ClassC, Constraint, DatatypeC, HasValueC, InC, LanguageInC, LogicalC,
    MaxCountC, MaxLengthC, MinCountC, MinLengthC, NodeC, NodeKindC, NotC,
    PairC, PatternC, QualifiedValueShapeC, RangeC, Shape, SparqlC, UniqueLangC,
)
from ..term import iri
from .. import vocab as V
from .compare import compare_term_to_const, compare_terms

if TYPE_CHECKING:
    from .engine import Validator

_RANGE_OP = {
    "minExclusive": ("gt", V.SH_MIN_EXCLUSIVE_CC),
    "minInclusive": ("ge", V.SH_MIN_INCLUSIVE_CC),
    "maxExclusive": ("lt", V.SH_MAX_EXCLUSIVE_CC),
    "maxInclusive": ("le", V.SH_MAX_INCLUSIVE_CC),
}

_NODE_KIND_SETS = {
    V.SH_IRI: ("iri",),
    V.SH_BLANK_NODE: ("bnode",),
    V.SH_LITERAL: ("lit",),
    V.SH_BLANK_NODE_OR_IRI: ("bnode", "iri"),
    V.SH_BLANK_NODE_OR_LITERAL: ("bnode", "lit"),
    V.SH_IRI_OR_LITERAL: ("iri", "lit"),
}


def constraint_violations(
    vd: "Validator", shape: Shape, c: Constraint, focus_df: DataFrame, values: DataFrame
) -> list[DataFrame]:
    v = F.col("v")

    if isinstance(c, ClassC):
        typed = (
            vd.ds.pred(V.RDF_TYPE)
            .where(F.col("o") == term_lit(iri(c.cls)))
            .select(F.col("s").alias("_inst"))
        )
        node_vals = values.where(v["kind"] != "lit")
        if vd.ds.small:
            not_instance = node_vals.join(
                typed, node_vals["v"] == F.col("_inst"), "left_anti"
            )
        else:
            # Table scale: anti-join on the DISTINCT value nodes first —
            # class-constrained object properties repeat the same few
            # targets enormously (head-entity skew), so the anti-join
            # probes thousands of rows instead of hundreds of millions,
            # and the join back onto the values frame is broadcastable
            # (AQE picks it up from the post-distinct size).
            bad_v = (
                node_vals.select("v").dropDuplicates(["v"])
                .join(typed, F.col("v") == F.col("_inst"), "left_anti")
                .select(F.col("v").alias("_bv"))
            )
            not_instance = node_vals.join(
                bad_v, node_vals["v"] == F.col("_bv"), "left_semi"
            )
        lit_vals = values.where(v["kind"] == "lit")
        return [
            vd.vio(not_instance, shape, V.SH_CLASS_CC, f"Value is not an instance of class <{c.cls}>", value=True),
            vd.vio(lit_vals, shape, V.SH_CLASS_CC, "Value must be a node to check class membership", value=True),
        ]

    if isinstance(c, DatatypeC):
        bad = values.where((v["kind"] != "lit") | (v["datatype"] != c.datatype))
        return [vd.vio(bad, shape, V.SH_DATATYPE_CC, f"Value does not have datatype: <{c.datatype}>", value=True)]

    if isinstance(c, NodeKindC):
        allowed = _NODE_KIND_SETS[c.kind]
        bad = values.where(~v["kind"].isin(list(allowed)))
        return [vd.vio(bad, shape, V.SH_NODE_KIND_CC, "Value does not have required node kind", value=True)]

    if isinstance(c, MinCountC):
        counts = values.groupBy("focus").agg(F.count(F.lit(1)).alias("_cnt"))
        bad = (
            focus_df.join(counts, "focus", "left")
            .where(F.coalesce(F.col("_cnt"), F.lit(0)) < c.n)
        )
        return [vd.vio(bad, shape, V.SH_MIN_COUNT_CC, f"Property has fewer than {c.n} values")]

    if isinstance(c, MaxCountC):
        bad = (
            values.groupBy("focus")
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .where(F.col("_cnt") > c.n)
        )
        return [vd.vio(bad, shape, V.SH_MAX_COUNT_CC, f"Property has more than {c.n} values")]

    if isinstance(c, RangeC):
        op, cc = _RANGE_OP[c.op]
        bad = values.where(~compare_term_to_const(v, c.bound, op))
        return [vd.vio(bad, shape, cc, f"Value out of range (sh:{c.op} {c.bound})", value=True)]

    if isinstance(c, MinLengthC):
        bad = values.where(
            (v["kind"] == "lit") & (F.octet_length(v["value"]) < c.n)
        )
        return [vd.vio(bad, shape, V.SH_MIN_LENGTH_CC, f"String length below minimum {c.n}", value=True)]

    if isinstance(c, MaxLengthC):
        bad = values.where(
            (v["kind"] == "lit") & (F.octet_length(v["value"]) > c.n)
        )
        return [vd.vio(bad, shape, V.SH_MAX_LENGTH_CC, f"String length exceeds maximum {c.n}", value=True)]

    if isinstance(c, PatternC):
        pat = c.pattern
        if c.flags:
            inline = "".join(f for f in "ims" if f in c.flags)
            pat = f"(?{inline}){pat}" if inline else pat
        try:
            re.compile(pat)
        except re.error:
            return []  # invalid regex ⇒ constraint silently passes (pattern.rs:40-42)
        bad = values.where((v["kind"] == "lit") & ~v["value"].rlike(pat))
        return [vd.vio(bad, shape, V.SH_PATTERN_CC, f"Value does not match pattern: {c.pattern}", value=True)]

    if isinstance(c, LanguageInC):
        langs = [l.lower() for l in c.langs]
        bad = values.where(
            (v["kind"] == "lit")
            & ((v["lang"] == "") | ~F.lower(v["lang"]).isin(langs))
        )
        return [vd.vio(bad, shape, V.SH_LANGUAGE_IN_CC, "Language not in allowed list", value=True)]

    if isinstance(c, UniqueLangC):
        w = Window.partitionBy("focus", v["lang"]).orderBy(v["value"], v["datatype"])
        tagged = values.where(v["lang"] != "").withColumn(
            "_rn", F.row_number().over(w)
        )
        bad = tagged.where(F.col("_rn") > 1).drop("_rn")
        return [vd.vio(bad, shape, V.SH_UNIQUE_LANG_CC, "Duplicate language tag", value=True)]

    if isinstance(c, PairC):
        return _pair_violations(vd, shape, c, focus_df, values)

    if isinstance(c, HasValueC):
        matched = values.where(v == term_lit(c.term)).select("focus").distinct()
        bad = focus_df.join(matched, "focus", "left_anti")
        return [vd.vio(bad, shape, V.SH_HAS_VALUE_CC, f"Required value {c.term} is not present")]

    if isinstance(c, InC):
        cond = reduce(or_, [v == term_lit(t) for t in c.allowed])
        bad = values.where(~cond)
        return [vd.vio(bad, shape, V.SH_IN_CC, "Value is not in the allowed list", value=True)]

    if isinstance(c, NodeC):
        lit_bad = values.where(v["kind"] == "lit")
        node_vals = values.where(v["kind"] != "lit")
        bad_nodes = vd.nonconforming(
            c.shape, node_vals.select(F.col("v").alias("focus")).distinct(),
            respect_deactivated=True,
        ).select(F.col("focus").alias("v"))
        bad = node_vals.join(bad_nodes, "v", "left_semi")
        return [
            vd.vio(bad, shape, V.SH_NODE_CC, "Value does not conform to sh:node constraint", value=True),
            vd.vio(lit_bad, shape, V.SH_NODE_CC, "Value is not a node (is a literal)", value=True),
        ]

    if isinstance(c, QualifiedValueShapeC):
        if c.disjoint:
            return []  # handled by the parent shape walker (validation/mod.rs:226-352)
        return qualified_count_violations(vd, shape, c, focus_df, values, siblings=None)

    if isinstance(c, LogicalC):
        return _logical_violations(vd, shape, c, values)

    if isinstance(c, NotC):
        terms = values.select(F.col("v").alias("focus")).distinct()
        bad = vd.nonconforming(c.shape, terms, respect_deactivated=False)
        conforming = terms.join(bad, "focus", "left_anti").select(
            F.col("focus").alias("v")
        )
        viol = values.join(conforming, "v", "left_semi")
        return [vd.vio(viol, shape, V.SH_NOT_CC, "Value conforms to shape in sh:not", value=True)]

    if isinstance(c, SparqlC):
        from .sparql import sparql_violations

        return sparql_violations(vd, shape, c, focus_df, values)

    raise TypeError(f"unknown constraint {c!r}")


def _pair_violations(
    vd: "Validator", shape: Shape, c: PairC, focus_df: DataFrame, values: DataFrame
) -> list[DataFrame]:
    """sh:equals / sh:disjoint / sh:lessThan / sh:lessThanOrEquals.

    Literal focus nodes are skipped entirely (the reference's
    term_to_named_or_blank early return).
    """
    from .paths import resolve_path

    node_focus = focus_df.where(F.col("focus.kind") != "lit")
    other = resolve_path(vd.ds, c.other, node_focus)
    out: list[DataFrame] = []

    if c.op == "equals":
        if shape.path is not None:
            vals = values.join(node_focus, "focus", "left_semi")
            a_not_b = vals.join(other, ["focus", "v"], "left_anti").select("focus")
            b_not_a = other.join(vals, ["focus", "v"], "left_anti").select("focus")
            bad = a_not_b.unionByName(b_not_a).distinct()
            out.append(vd.vio(bad, shape, V.SH_EQUALS_CC, "Values do not equal values of sh:equals path"))
        nonempty = other.select("focus").distinct()
        empty_bad = node_focus.join(nonempty, "focus", "left_anti")
        out.append(vd.vio(empty_bad, shape, V.SH_EQUALS_CC, "sh:equals path has no values"))
        neq = other.where(~(F.col("v") == F.col("focus")))
        out.append(vd.vio(neq, shape, V.SH_EQUALS_CC, "Focus node does not equal value of sh:equals path", value=True))
        return out

    if c.op == "disjoint":
        check = values if shape.path is not None else node_focus.select(
            "focus", F.col("focus").alias("v")
        )
        bad = check.join(other, ["focus", "v"], "left_semi")
        return [vd.vio(bad, shape, V.SH_DISJOINT_CC, "Value appears in both properties (not disjoint)", value=True)]

    # lessThan / lessThanOrEquals: ANY-semantics (less_than.rs:38-45);
    # no other-values ⇒ pass (inner join drops those focus nodes).
    op = "lt" if c.op == "lessThan" else "le"
    cc = V.SH_LESS_THAN_CC if c.op == "lessThan" else V.SH_LESS_THAN_OR_EQUALS_CC
    check = values if shape.path is not None else node_focus.select(
        "focus", F.col("focus").alias("v")
    )
    other_r = other.select("focus", F.col("v").alias("_ov"))
    joined = check.join(other_r, "focus")
    flag = compare_terms(F.col("v"), F.col("_ov"), op).cast("int")
    agg = joined.groupBy("focus", "v").agg(F.max(flag).alias("_ok"))
    bad = agg.where(F.col("_ok") == 0)
    return [vd.vio(bad, shape, cc, f"Value is not {c.op} values of the other path", value=True)]


def _logical_violations(
    vd: "Validator", shape: Shape, c: LogicalC, values: DataFrame
) -> list[DataFrame]:
    """sh:and / sh:or / sh:xone — nested conformance via validate_focus_node
    (deactivated is NOT consulted for these, matching sh_and.rs etc.)."""
    terms = values.select(F.col("v").alias("focus")).distinct()
    bad_sets = [
        vd.nonconforming(s, terms, respect_deactivated=False) for s in c.shapes
    ]

    if c.op == "and":
        bad = reduce(DataFrame.unionByName, bad_sets).distinct()
        viol = values.join(bad.select(F.col("focus").alias("v")), "v", "left_semi")
        return [vd.vio(viol, shape, V.SH_AND_CC, "Value does not conform to all shapes in sh:and", value=True)]

    if c.op == "or":
        bad_all = bad_sets[0]
        for b in bad_sets[1:]:
            bad_all = bad_all.join(b, "focus", "left_semi")
        viol = values.join(
            bad_all.select(F.col("focus").alias("v")), "v", "left_semi"
        )
        return [vd.vio(viol, shape, V.SH_OR_CC, "Value does not conform to any shape in sh:or", value=True)]

    # xone: exactly one branch must conform
    conf_sets = [terms.join(b, "focus", "left_anti") for b in bad_sets]
    conf_union = reduce(DataFrame.unionByName, conf_sets)
    counts = conf_union.groupBy("focus").agg(F.count(F.lit(1)).alias("_conf"))
    joined = terms.join(counts, "focus", "left")
    bad = joined.where(F.coalesce(F.col("_conf"), F.lit(0)) != 1)
    viol = values.join(bad.select(F.col("focus").alias("v")), "v", "left_semi")
    return [vd.vio(viol, shape, V.SH_XONE_CC, "Value does not conform to exactly one shape in sh:xone", value=True)]


def qualified_count_violations(
    vd: "Validator",
    shape: Shape,
    c: QualifiedValueShapeC,
    focus_df: DataFrame,
    values: DataFrame,
    siblings: list[Shape] | None,
) -> list[DataFrame]:
    """sh:qualifiedValueShape count checks.

    Non-disjoint: qualified_value_shape.rs:20-66. Disjoint (siblings
    given): a value counts only if it conforms to this qvs shape and to
    NO sibling property shape's qvs shape (validation/mod.rs:283-305).
    Only IRI/bnode values can conform (validate_node takes nodes only).
    """
    node_vals = values.where(F.col("v.kind") != "lit")
    terms = node_vals.select(F.col("v").alias("focus")).distinct()
    bad = vd.nonconforming(c.shape, terms, respect_deactivated=True)
    conforming_terms = terms.join(bad, "focus", "left_anti")
    if siblings:
        for sib in siblings:
            sib_bad = vd.nonconforming(sib, conforming_terms, respect_deactivated=True)
            # conforms to sibling ⇒ excluded from the qualified count
            conforming_terms = conforming_terms.join(sib_bad, "focus", "left_semi")
    conf_pairs = node_vals.join(
        conforming_terms.select(F.col("focus").alias("v")), "v", "left_semi"
    )
    counts = conf_pairs.groupBy("focus").agg(F.count(F.lit(1)).alias("_qcnt"))
    joined = focus_df.join(counts, "focus", "left").withColumn(
        "_qcnt", F.coalesce(F.col("_qcnt"), F.lit(0))
    )
    out: list[DataFrame] = []
    if c.min_count is not None:
        out.append(vd.vio(
            joined.where(F.col("_qcnt") < c.min_count), shape,
            V.SH_QUALIFIED_MIN_COUNT_CC,
            f"Fewer than {c.min_count} values conform to the qualified shape",
        ))
    if c.max_count is not None:
        out.append(vd.vio(
            joined.where(F.col("_qcnt") > c.max_count), shape,
            V.SH_QUALIFIED_MAX_COUNT_CC,
            f"More than {c.max_count} values conform to the qualified shape",
        ))
    return out
