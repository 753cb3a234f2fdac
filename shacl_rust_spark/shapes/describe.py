"""Human-readable / JSON renderings of the parsed shape IR.

Driver-side mirrors of the reference's shape introspection surface:
the `parse` CLI output modes ShapesPretty / ShapesCompact /
print_shapes_json (crates/shacl-cli/src/main.rs:150-252) and the `info`
command's ShapesInfo summary (src/core/shape.rs:311-377), built on the
Display impls for Shape / Constraint / Target / ClosedConstraint
(src/core/shape.rs:210-308, src/core/constraints.rs:303-431,
src/core/target.rs:107-117). Pure driver-side string building — no
Spark session is needed to inspect shapes.

Rendering quirk kept for parity: the reference writes the shape node
inside its own angle brackets on top of oxigraph's NamedNode Display
(`write!(f, " <{}>", self.node)`, shape.rs:218), so IRI-identified
shapes print as `NodeShape <<http://…>>`.
"""

from __future__ import annotations

import re

from .ir import (
    ClassC,
    Closed,
    Constraint,
    DatatypeC,
    HasValueC,
    InC,
    LanguageInC,
    LogicalC,
    MaxCountC,
    MaxLengthC,
    MinCountC,
    MinLengthC,
    NodeC,
    NodeKindC,
    NotC,
    PairC,
    PatternC,
    QualifiedValueShapeC,
    RangeC,
    Shape,
    SparqlC,
    Target,
    UniqueLangC,
)

_TARGET_PRED = {
    "node": "sh:targetNode",
    "class": "sh:targetClass",
    "subjectsOf": "sh:targetSubjectsOf",
    "objectsOf": "sh:targetObjectsOf",
    "advanced": "sh:target",
}


def target_str(t: Target) -> str:
    return f"{_TARGET_PRED.get(t.kind, 'sh:target')} {t.term.n3()}"


def _shape_name(s: Shape) -> str:
    # Shape::get_name (shape.rs:151-157): name when present, else the
    # node's display form
    return s.name if s.name is not None else s.node.n3()


def _indent(text: str, pad: str) -> list[str]:
    return [f"{pad}{line}" for line in text.splitlines()]


def constraint_str(c: Constraint) -> str:
    """Constraint Display (constraints.rs:303-431)."""
    if isinstance(c, ClassC):
        return f"sh:class <{c.cls}>"
    if isinstance(c, DatatypeC):
        return f"sh:datatype <{c.datatype}>"
    if isinstance(c, NodeKindC):
        return f"sh:nodeKind <{c.kind}>"
    if isinstance(c, MinCountC):
        return f"sh:minCount {c.n}"
    if isinstance(c, MaxCountC):
        return f"sh:maxCount {c.n}"
    if isinstance(c, RangeC):
        return f"sh:{c.op} {c.bound.n3()}"
    if isinstance(c, MinLengthC):
        return f"sh:minLength {c.n}"
    if isinstance(c, MaxLengthC):
        return f"sh:maxLength {c.n}"
    if isinstance(c, PatternC):
        out = f'sh:pattern "{c.pattern}"'
        if c.flags is not None:
            out += f" flags: {c.flags}"
        return out
    if isinstance(c, LanguageInC):
        return "sh:languageIn (" + " ".join(c.langs) + ")"
    if isinstance(c, UniqueLangC):
        return f"sh:uniqueLang {'true' if c.flag else 'false'}"
    if isinstance(c, PairC):
        return f"sh:{c.op} {c.other.display()}"
    if isinstance(c, HasValueC):
        return f"sh:hasValue {c.term.n3()}"
    if isinstance(c, InC):
        return "sh:in (" + ", ".join(t.n3() for t in c.allowed) + ")"
    if isinstance(c, NodeC):
        return "sh:node {\n" + "\n".join(_indent(shape_str(c.shape), "  ")) + "\n}"
    if isinstance(c, QualifiedValueShapeC):
        out = (
            "sh:qualifiedValueShape {\n"
            + "\n".join(_indent(shape_str(c.shape), "  "))
            + "\n}"
        )
        if c.min_count is not None:
            out += f" min: {c.min_count}"
        if c.max_count is not None:
            out += f" max: {c.max_count}"
        if c.disjoint:
            out += " disjoint: true"
        return out
    if isinstance(c, LogicalC):
        lines = [f"sh:{c.op} ["]
        lines += [f"  Inline({_shape_name(s)})" for s in c.shapes]
        return "\n".join(lines) + "\n]"
    if isinstance(c, NotC):
        return "sh:not {\n" + "\n".join(_indent(shape_str(c.shape), "  ")) + "\n}"
    if isinstance(c, SparqlC):
        out = "sh:sparql"
        if c.component is not None:
            out += f" component: <{c.component}>"
        q = re.sub(r"\s+", " ", c.query).strip()
        out += f" [{q}]"
        if c.messages:
            out += f" messages: {len(c.messages)}"
        return out
    return repr(c)


def closed_str(c: Closed) -> str:
    """ClosedConstraint Display (shape.rs:294-308)."""
    out = "Closed Constraint"
    if c.ignored_properties:
        out += " (ignoring: " + ", ".join(
            f"<{p}>" for p in c.ignored_properties
        ) + ")"
    return out


def shape_str(s: Shape) -> str:
    """Shape Display (shape.rs:210-281)."""
    head = "PropertyShape" if s.is_property_shape else "NodeShape"
    head += f" <{s.node.n3()}>"
    if s.name is not None:
        head += f" ({s.name})"
    if s.deactivated:
        head += " [DEACTIVATED]"
    lines = [head]
    if s.parent is not None:
        lines.append(f"  Parent Shape: {s.parent.n3()}")
    if s.path is not None:
        lines.append(f"  Path: {s.path.display()}")
    if s.description is not None:
        lines.append(f"  Description: {s.description}")
    lines.append(f"  Severity: <{s.severity}>")
    if s.targets:
        lines.append("  Targets:")
        lines += [f"    - {target_str(t)}" for t in s.targets]
    if s.messages:
        lines.append("  Messages:")
        lines += [f"    - {m}" for m in s.messages]
    if s.closed is not None:
        lines.append(f"  {closed_str(s.closed)}")
    if s.constraints:
        lines.append("  Constraints:")
        for c in s.constraints:
            lines += _indent(constraint_str(c), "    ")
    if s.property_shapes:
        lines.append("  Property Shapes:")
        for i, ps in enumerate(s.property_shapes):
            lines.append(f"    [{i}]")
            lines += _indent(shape_str(ps), "      ")
    return "\n".join(lines)


def shapes_pretty(shapes: list[Shape]) -> str:
    """ShapesPretty (main.rs:184-199)."""
    lines = ["", "=" * 80, f"Parsed {len(shapes)} SHACL Shape(s)", "=" * 80, ""]
    for i, s in enumerate(shapes):
        lines.append(f"Shape #{i + 1}:")
        lines.append(shape_str(s))
        lines.append("")
    return "\n".join(lines)


def shapes_compact(shapes: list[Shape]) -> str:
    """ShapesCompact (main.rs:201-218)."""
    lines = [f"Parsed {len(shapes)} shape(s):"]
    for i, s in enumerate(shapes):
        lines.append(
            f"  {i + 1}. {s.node.n3()} - {len(s.targets)} target(s), "
            f"{len(s.constraints)} constraint(s)"
        )
    return "\n".join(lines)


def shapes_json(shapes: list[Shape]) -> dict:
    """print_shapes_json (main.rs:220-252) — same keys."""
    return {
        "shapes": [
            {
                "node": s.node.n3(),
                "name": s.name,
                "targets": [target_str(t) for t in s.targets],
                "deactivated": s.deactivated,
                "severity": f"<{s.severity}>",
                "messages": list(s.messages),
                "constraints": [constraint_str(c) for c in s.constraints],
                "closed": closed_str(s.closed) if s.closed is not None else None,
            }
            for s in shapes
        ],
        "count": len(shapes),
    }


def shapes_info(shapes: list[Shape], graph_len: int, detailed: bool) -> str:
    """ShapesInfo Display (shape.rs:311-377)."""
    lines = ["", "=" * 80, "SHACL Shapes Information", "=" * 80]
    lines.append(f"Total shapes: {len(shapes)}")
    lines.append(f"Total triples in shapes graph: {graph_len}")
    active = sum(1 for s in shapes if not s.deactivated)
    lines += [
        "",
        "Shape Status:",
        f"  Active: {active}",
        f"  Deactivated: {len(shapes) - active}",
        "",
        "Constraints:",
        f"  Total targets: {sum(len(s.targets) for s in shapes)}",
        f"  Total constraints: {sum(len(s.constraints) for s in shapes)}",
    ]
    if detailed:
        lines += ["", "-" * 80, "Detailed Shape Information:", "-" * 80]
        for i, s in enumerate(shapes):
            lines.append(f"\nShape #{i + 1}: {s.node.n3()}")
            lines.append(
                f"  Status: {'DEACTIVATED' if s.deactivated else 'ACTIVE'}"
            )
            lines.append(f"  Severity: <{s.severity}>")
            lines.append(f"  Targets: {len(s.targets)}")
            lines += [f"    - {target_str(t)}" for t in s.targets]
            lines.append(f"  Constraints: {len(s.constraints)}")
            for c in s.constraints:
                cs = constraint_str(c).splitlines()
                lines.append(f"    - {cs[0]}")
                lines += [f"      {ln}" for ln in cs[1:]]
            if s.closed is not None:
                lines.append(f"  Closed: {closed_str(s.closed)}")
            if s.messages:
                lines.append(f"  Messages: {len(s.messages)}")
                lines += [f"    - {m}" for m in s.messages]
    lines += ["", "=" * 80]
    return "\n".join(lines)
