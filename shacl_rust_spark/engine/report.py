"""Validation-report serialization: RDF graph / JSON / text.

Set-oriented mirrors of the reference's ValidationReport sinks
(/root/reference/src/validation/report.rs): `to_graph` emits the
sh:ValidationReport / sh:ValidationResult vocabulary (report.rs:100-217)
as a triples DataFrame — one row-parallel projection per emitted
predicate, unioned, so a billion-violation report serializes without
driver materialization. JSON (report.rs:288-317) and the text rendering
(report.rs:327-390) collect — they are human-facing sinks for small
reports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import TRIPLES_TYPE
from .. import vocab as V

_REPORT_BNODE = "report"


def _iri_struct(value) -> F.Column:
    return F.struct(
        F.lit("iri").alias("kind"), value.alias("value"),
        F.lit("").alias("datatype"), F.lit("").alias("lang"),
    )


def _bnode_struct(value) -> F.Column:
    return F.struct(
        F.lit("bnode").alias("kind"), value.alias("value"),
        F.lit("").alias("datatype"), F.lit("").alias("lang"),
    )


def _lit_struct(value, datatype: str) -> F.Column:
    return F.struct(
        F.lit("lit").alias("kind"), value.alias("value"),
        F.lit(datatype).alias("datatype"), F.lit("").alias("lang"),
    )


def report_graph_df(violations: DataFrame, conforms: bool) -> DataFrame:
    """sh:ValidationReport triples (report.rs:100-217). Result bnode ids
    are content hashes + a per-duplicate index (bnode labels are
    arbitrary; these are deterministic and shuffle-safe)."""
    spark = violations.sparkSession
    report_subj = _bnode_struct(F.lit(_REPORT_BNODE))

    head = spark.createDataFrame(
        [
            (("bnode", _REPORT_BNODE, "", ""), V.RDF_TYPE,
             ("iri", V.SH + "ValidationReport", "", "")),
            (("bnode", _REPORT_BNODE, "", ""), V.SH + "conforms",
             ("lit", "true" if conforms else "false", V.XSD_BOOLEAN, "")),
        ],
        TRIPLES_TYPE,
    )

    v = violations.withColumn(
        "_rid",
        F.concat(
            F.lit("r"),
            F.md5(F.concat_ws(
                "\x01", F.to_json(F.struct(*violations.columns)),
            )),
            F.lit("-"),
            (F.monotonically_increasing_id() % 1_000_000_000).cast("string"),
        ),
    )
    rs = _bnode_struct(F.col("_rid"))

    def t(p: str, o_col) -> DataFrame:
        return v.select(rs.alias("s"), F.lit(p).alias("p"), o_col.alias("o"))

    parts = [
        v.select(report_subj.alias("s"), F.lit(V.SH + "detail").alias("p"),
                 rs.alias("o")),
        t(V.RDF_TYPE, _iri_struct(F.lit(V.SH + "ValidationResult"))),
        t(V.SH + "focusNode", F.col("focus")),
        t(V.SH + "resultSeverity", _iri_struct(F.col("severity"))),
        # source_shape column holds the shape node's n3 form: _:x or <iri>
        t(
            V.SH + "sourceShape",
            F.when(
                F.col("source_shape").startswith("_:"),
                _bnode_struct(F.expr("substring(source_shape, 3)")),
            ).otherwise(
                _iri_struct(F.regexp_extract("source_shape", "^<(.*)>$", 1))
            ),
        ),
        t(V.SH + "sourceConstraintComponent", _iri_struct(F.col("component"))),
        v.where(F.col("value").isNotNull()).select(
            rs.alias("s"), F.lit(V.SH + "value").alias("p"), F.col("value").alias("o")
        ),
        # resultPath only for single-IRI paths, bare IRI (report.rs:177-185)
        v.where(F.col("path").rlike("^<[^>]+>$")).select(
            rs.alias("s"), F.lit(V.SH + "resultPath").alias("p"),
            _iri_struct(F.regexp_extract("path", "^<(.*)>$", 1)).alias("o"),
        ),
        v.where(F.col("message").isNotNull()).select(
            rs.alias("s"), F.lit(V.SH + "resultMessage").alias("p"),
            _lit_struct(F.col("message"), V.XSD_STRING).alias("o"),
        ),
    ]
    out = head
    for p in parts:
        out = out.unionByName(p)
    return out


def report_json(violations_rows: list, conforms: bool) -> dict:
    """Nested JSON report (report.rs:219-224, 288-317)."""
    results = []
    for r in violations_rows:
        obj = {
            "focusNode": _term_str(r.focus),
            "sourceShape": r.source_shape,
            "severity": r.severity,
            "sourceConstraintComponent": r.component,
        }
        if r.path is not None:
            obj["resultPath"] = r.path
        if r.value is not None:
            obj["value"] = _term_str(r.value)
        if r.message:
            obj["messages"] = r.message.split("; ")
        results.append(obj)
    return {"conforms": conforms, "results": results}


def report_text(violations_rows: list, conforms: bool) -> str:
    """Text rendering (report.rs:327-390)."""
    lines = ["", "=" * 80, "SHACL Validation Report", "=" * 80]
    if conforms:
        lines.append("\n✓ Data conforms to all shapes")
        return "\n".join(lines)
    lines.append("\n✗ Data does NOT conform to all shapes")
    lines.append(f"Violations: {len(violations_rows)}")
    by_sev = {}
    for r in violations_rows:
        by_sev[r.severity] = by_sev.get(r.severity, 0) + 1
    for label, sev in (("Violations", V.SH + "Violation"),
                       ("Warnings", V.SH + "Warning"),
                       ("Info", V.SH + "Info")):
        if by_sev.get(sev):
            lines.append(f"  - {label}: {by_sev[sev]}")
    lines += ["", "-" * 80, "Validation Results:", "-" * 80]
    for idx, r in enumerate(violations_rows):
        lines.append(f"\n[{idx + 1}] Severity: <{r.severity}>")
        lines.append(f"  Focus Node: {_term_str(r.focus)}")
        lines.append(f"  Source Shape: {r.source_shape}")
        lines.append(f"  Constraint: <{r.component}>")
        if r.path is not None:
            lines.append(f"  Result Path: {r.path}")
        if r.value is not None:
            lines.append(f"  Value: {_term_str(r.value)}")
        if r.message:
            lines.append(f"  Message: {r.message}")
    return "\n".join(lines)


def _term_str(t) -> str:
    from ..term import Term

    return Term(*t).n3()
