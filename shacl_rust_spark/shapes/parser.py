"""Shapes compiler: driver-side RDF graph → Shape IR.

Faithful re-expression of the reference's shape parser
(/root/reference/src/parser/mod.rs, parser/target.rs, parser/path.rs,
parser/constraints/*.rs), including its quirks:

- shape discovery = typed sh:NodeShape/PropertyShape/Shape OR bearing any
  sh:target* predicate (parser/mod.rs:65-88);
- a shape with sh:path parses as a property shape; severity defaults to
  sh:Violation, nested property shapes inherit the parent's severity
  (parser/mod.rs:169,297);
- shape name comes from sh:name OR rdfs:label (parser/mod.rs:118-121);
- sh:closed is only parsed on node shapes, and sh:ignoredProperties is
  only honored when the list head is an IRI — a blank-node list head is
  treated as empty (parser/mod.rs:224-227);
- sh:uniqueLang is kept even when false (the validator never reads the
  boolean, validation/constraints/unique_lang.rs);
- nested shapes (sh:node/and/or/xone/not/qualifiedValueShape) are parsed
  recursively via parse_shape with the referencing shape as parent.
"""

from __future__ import annotations

from ..rdf.graph import Graph
from ..term import Term
from .. import vocab as V
from .ir import (
    Alternative, ClassC, Closed, Constraint, DatatypeC, HasValueC, Hop, InC,
    Inverse, LanguageInC, LogicalC, MaxCountC, MaxLengthC, MinCountC,
    MinLengthC, NodeC, NodeKindC, NotC, OneOrMore, PairC, Path, PathElem,
    PatternC, QualifiedValueShapeC, RangeC, Shape, SparqlC, Target,
    UniqueLangC, ZeroOrMore, ZeroOrOne,
)


class ShapeParseError(ValueError):
    pass


_MAX_NESTING = 64  # recursion guard; the reference would stack-overflow on cycles


def parse_shapes(graph: Graph) -> list[Shape]:
    """parser/mod.rs:27-62 — find shape nodes, parse each, skip failures."""
    shapes: list[Shape] = []
    visited: set[Term] = set()
    for node in find_shape_nodes(graph):
        if node in visited:
            continue
        visited.add(node)
        try:
            shapes.append(parse_shape(graph, node, None, 0))
        except ShapeParseError:
            continue  # reference logs a warning and skips
    return shapes


def find_shape_nodes(graph: Graph) -> list[Term]:
    """parser/mod.rs:65-88."""
    nodes: list[Term] = []
    seen: set[Term] = set()

    def _add(t: Term) -> None:
        if t.is_node and t not in seen:
            seen.add(t)
            nodes.append(t)

    for shape_type in (V.SH_NODE_SHAPE, V.SH_PROPERTY_SHAPE, V.SH_SHAPE):
        for s in graph.subjects(V.RDF_TYPE, Term("iri", shape_type)):
            _add(s)
    for pred in (
        V.SH_TARGET_CLASS, V.SH_TARGET_NODE, V.SH_TARGET_SUBJECTS_OF,
        V.SH_TARGET_OBJECTS_OF, V.SH_TARGET,
    ):
        for t in graph.triples_for_predicate(pred):
            _add(t.s)
    return nodes


def parse_shape(graph: Graph, node: Term, parent: Term | None, depth: int) -> Shape:
    if depth > _MAX_NESTING:
        raise ShapeParseError(f"shape nesting too deep at {node}")
    path_obj = graph.object(node, V.SH_PATH)
    if path_obj is not None:
        return _parse_top_level_property_shape(graph, node, path_obj, parent, depth)
    severity = _parse_severity(graph, node, V.SH_VIOLATION)
    return _parse_node_shape(graph, node, severity, True, parent, depth)


def _parse_severity(graph: Graph, node: Term, default: str) -> str:
    o = graph.object(node, V.SH_SEVERITY)
    if o is not None and o.is_iri:
        return o.value
    return default


def _apply_common(graph: Graph, node: Term, parent: Term | None, shape: Shape) -> Shape:
    name = graph.get_string_value(node, V.SH_NAME) or graph.get_string_value(node, V.RDFS_LABEL)
    if name is not None:
        shape.name = name
    desc = graph.get_string_value(node, V.SH_DESCRIPTION)
    if desc is not None:
        shape.description = desc
    deact = graph.get_boolean_value(node, V.SH_DEACTIVATED)
    if deact is not None:
        shape.deactivated = deact
    shape.messages = graph.get_all_string_values(node, V.SH_MESSAGE)
    if parent is not None:
        shape.parent = parent
    return shape


def _parse_nested_property_shapes(
    graph: Graph, node: Term, parent_severity: str, parent: Term | None, depth: int
) -> list[Shape]:
    out: list[Shape] = []
    for obj in graph.objects(node, V.SH_PROPERTY):
        if not obj.is_node:
            continue
        try:
            out.append(_parse_property_shape(graph, obj, parent_severity, parent, depth + 1))
        except ShapeParseError:
            continue
    return out


def _parse_top_level_property_shape(
    graph: Graph, node: Term, path_obj: Term, parent: Term | None, depth: int
) -> Shape:
    path = parse_path(graph, path_obj)
    severity = _parse_severity(graph, node, V.SH_VIOLATION)
    shape = Shape(node=node, path=path, severity=severity)
    shape = _apply_common(graph, node, parent, shape)
    shape.targets = parse_targets(graph, node)
    shape.constraints = _parse_all_constraints(graph, node, True, depth)
    shape.property_shapes = _parse_nested_property_shapes(graph, node, severity, node, depth)
    if shape.property_shapes:
        shape.parent = node
    return shape


def _parse_node_shape(
    graph: Graph, node: Term, severity: str, include_targets: bool,
    parent: Term | None, depth: int,
) -> Shape:
    shape = Shape(node=node, severity=severity)
    shape = _apply_common(graph, node, parent, shape)
    if include_targets:
        shape.targets = parse_targets(graph, node)
    shape.closed = _parse_closed(graph, node)
    shape.property_shapes = _parse_nested_property_shapes(graph, node, severity, node, depth)
    if shape.property_shapes:
        shape.parent = node
    shape.constraints = _parse_all_constraints(graph, node, False, depth)
    return shape


def _parse_property_shape(
    graph: Graph, node: Term, parent_severity: str, parent: Term | None, depth: int
) -> Shape:
    path_obj = graph.object(node, V.SH_PATH)
    if path_obj is None:
        raise ShapeParseError("Property shape must have sh:path")
    path = parse_path(graph, path_obj)
    severity = _parse_severity(graph, node, parent_severity)
    shape = Shape(node=node, path=path, severity=severity)
    shape.constraints = _parse_all_constraints(graph, node, True, depth)
    shape = _apply_common(graph, node, parent, shape)
    shape.property_shapes = _parse_nested_property_shapes(graph, node, severity, node, depth)
    return shape


def _parse_closed(graph: Graph, node: Term) -> Closed | None:
    """parser/mod.rs:216-241 — blank-node ignoredProperties list → empty."""
    if graph.get_boolean_value(node, V.SH_CLOSED) is not True:
        return None
    ignored: tuple[str, ...] = ()
    list_node = graph.object(node, V.SH_IGNORED_PROPERTIES)
    if list_node is not None and list_node.is_iri:
        ignored = tuple(
            t.value for t in graph.parse_rdf_list(list_node) if t.is_iri
        )
    return Closed(ignored_properties=ignored)


# --- targets (parser/target.rs:11-60) -----------------------------------
def parse_targets(graph: Graph, node: Term) -> list[Target]:
    targets: list[Target] = []
    is_class = any(
        o.is_iri and o.value == V.RDFS_CLASS for o in graph.objects(node, V.RDF_TYPE)
    )
    if is_class:
        targets.append(Target("class", node))
    for o in graph.objects(node, V.SH_TARGET_CLASS):
        if o.is_node:
            targets.append(Target("class", o))
    for o in graph.objects(node, V.SH_TARGET_NODE):
        targets.append(Target("node", o))
    for o in graph.objects(node, V.SH_TARGET_SUBJECTS_OF):
        if o.is_iri:
            targets.append(Target("subjectsOf", o))
    for o in graph.objects(node, V.SH_TARGET_OBJECTS_OF):
        if o.is_iri:
            targets.append(Target("objectsOf", o))
    for o in graph.objects(node, V.SH_TARGET):
        if o.is_node:
            targets.append(Target("advanced", o))
    return targets


# --- paths (parser/path.rs:13-136) ---------------------------------------
def parse_path(graph: Graph, path_term: Term) -> Path:
    if path_term.is_iri:
        return Path((Hop(path_term.value),))
    if path_term.is_bnode:
        if graph.object(path_term, V.RDF_FIRST) is not None:
            elems: list[PathElem] = []
            for item in graph.parse_rdf_list(path_term):
                if item.is_iri:
                    elems.append(Hop(item.value))
                elif item.is_bnode:
                    elems.append(_parse_path_element(graph, item))
                else:
                    raise ShapeParseError("Invalid path element in sequence")
            return Path(tuple(elems))
        return Path((_parse_path_element(graph, path_term),))
    raise ShapeParseError("Invalid path: must be IRI or blank node")


def _parse_path_element(graph: Graph, node: Term) -> PathElem:
    inv = graph.object(node, V.SH_INVERSE_PATH)
    if inv is not None and inv.is_iri:
        return Inverse(inv.value)

    alt = graph.object(node, V.SH_ALTERNATIVE_PATH)
    if alt is not None:
        if not alt.is_node:
            raise ShapeParseError("Invalid alternative path")
        alts: list[PathElem] = []
        for item in graph.parse_rdf_list(alt):
            if item.is_iri:
                alts.append(Hop(item.value))
            elif item.is_bnode:
                alts.append(_parse_path_element(graph, item))
        return Alternative(tuple(alts))

    for pred, ctor in (
        (V.SH_ZERO_OR_MORE_PATH, ZeroOrMore),
        (V.SH_ONE_OR_MORE_PATH, OneOrMore),
        (V.SH_ZERO_OR_ONE_PATH, ZeroOrOne),
    ):
        obj = graph.object(node, pred)
        if obj is not None:
            if obj.is_iri:
                return ctor(Hop(obj.value))
            if obj.is_bnode:
                return ctor(_parse_path_element(graph, obj))
            raise ShapeParseError(f"Invalid path in {pred}")

    raise ShapeParseError("Could not parse path element")


# --- constraints (parser/constraints/*.rs, order = parser/mod.rs:321-362) --
def _parse_all_constraints(
    graph: Graph, node: Term, is_property_shape: bool, depth: int
) -> list[Constraint]:
    cs: list[Constraint] = []

    for o in graph.objects(node, V.SH_CLASS):
        if o.is_iri:
            cs.append(ClassC(o.value))

    dt = graph.object(node, V.SH_DATATYPE)
    if dt is not None and dt.is_iri:
        cs.append(DatatypeC(dt.value))

    nk = graph.object(node, V.SH_NODE_KIND)
    if nk is not None and nk.is_iri and nk.value in (
        V.SH_IRI, V.SH_BLANK_NODE, V.SH_LITERAL, V.SH_BLANK_NODE_OR_IRI,
        V.SH_BLANK_NODE_OR_LITERAL, V.SH_IRI_OR_LITERAL,
    ):
        cs.append(NodeKindC(nk.value))

    v = graph.get_integer_value(node, V.SH_MIN_COUNT)
    if v is not None:
        cs.append(MinCountC(v))
    v = graph.get_integer_value(node, V.SH_MAX_COUNT)
    if v is not None:
        cs.append(MaxCountC(v))
    v = graph.get_integer_value(node, V.SH_MIN_LENGTH)
    if v is not None:
        cs.append(MinLengthC(v))
    v = graph.get_integer_value(node, V.SH_MAX_LENGTH)
    if v is not None:
        cs.append(MaxLengthC(v))

    pat = graph.get_string_value(node, V.SH_PATTERN)
    if pat is not None:
        cs.append(PatternC(pat, graph.get_string_value(node, V.SH_FLAGS)))

    for pred, op in (
        (V.SH_MIN_INCLUSIVE, "minInclusive"),
        (V.SH_MAX_INCLUSIVE, "maxInclusive"),
        (V.SH_MIN_EXCLUSIVE, "minExclusive"),
        (V.SH_MAX_EXCLUSIVE, "maxExclusive"),
    ):
        o = graph.object(node, pred)
        if o is not None:
            cs.append(RangeC(op, o))

    li = graph.object(node, V.SH_LANGUAGE_IN)
    if li is not None and li.is_node:
        langs = tuple(
            t.value for t in graph.parse_rdf_list(li) if t.is_literal
        )
        if langs:
            cs.append(LanguageInC(langs))

    ul = graph.get_boolean_value(node, V.SH_UNIQUE_LANG)
    if ul is not None:
        cs.append(UniqueLangC(ul))

    for pred, op in (
        (V.SH_EQUALS, "equals"),
        (V.SH_DISJOINT, "disjoint"),
        (V.SH_LESS_THAN, "lessThan"),
        (V.SH_LESS_THAN_OR_EQUALS, "lessThanOrEquals"),
    ):
        for o in graph.objects(node, pred):
            cs.append(PairC(op, parse_path(graph, o)))

    for o in graph.objects(node, V.SH_HAS_VALUE):
        cs.append(HasValueC(o))

    in_node = graph.object(node, V.SH_IN)
    if in_node is not None and in_node.is_node:
        allowed = tuple(graph.parse_rdf_list(in_node))
        if allowed:
            cs.append(InC(allowed))

    for o in graph.objects(node, V.SH_NODE):
        if o.is_node:
            try:
                cs.append(NodeC(parse_shape(graph, o, node, depth + 1)))
            except ShapeParseError:
                continue

    qvs_obj = graph.object(node, V.SH_QUALIFIED_VALUE_SHAPE)
    if qvs_obj is not None and qvs_obj.is_node:
        try:
            qshape = parse_shape(graph, qvs_obj, node, depth + 1)
            cs.append(QualifiedValueShapeC(
                shape=qshape,
                min_count=graph.get_integer_value(node, V.SH_QUALIFIED_MIN_COUNT),
                max_count=graph.get_integer_value(node, V.SH_QUALIFIED_MAX_COUNT),
                disjoint=graph.get_boolean_value(
                    node, V.SH_QUALIFIED_VALUE_SHAPES_DISJOINT
                ) or False,
            ))
        except ShapeParseError:
            pass

    for pred, op in ((V.SH_AND, "and"), (V.SH_OR, "or"), (V.SH_XONE, "xone")):
        for o in graph.objects(node, pred):
            if not o.is_node:
                continue
            subshapes: list[Shape] = []
            for ref in graph.parse_rdf_list(o):
                if not ref.is_node:
                    continue
                try:
                    subshapes.append(parse_shape(graph, ref, node, depth + 1))
                except ShapeParseError:
                    continue
            if subshapes:
                cs.append(LogicalC(op, tuple(subshapes)))

    for o in graph.objects(node, V.SH_NOT):
        if o.is_node:
            try:
                cs.append(NotC(parse_shape(graph, o, node, depth + 1)))
            except ShapeParseError:
                continue

    cs.extend(_parse_sparql_constraints(graph, node, is_property_shape))
    return cs


def _parse_shacl_prefixes(graph: Graph, executable: Term) -> list[tuple[str, str]]:
    """utils.rs:287-324 — sh:prefixes/sh:declare."""
    out: list[tuple[str, str]] = []
    for pnode in graph.objects(executable, V.SH_PREFIXES):
        if not pnode.is_node:
            continue
        for decl in graph.objects(pnode, V.SH_DECLARE):
            if not decl.is_node:
                continue
            pfx = graph.object(decl, V.SH_PREFIX)
            ns = graph.object(decl, V.SH_NAMESPACE)
            if pfx is not None and pfx.is_literal and ns is not None and ns.is_literal:
                out.append((pfx.value, ns.value))
    return out


def _parse_executable(graph: Graph, node: Term) -> tuple[str, bool] | None:
    sel = graph.object(node, V.SH_SELECT)
    if sel is not None and sel.is_literal:
        return sel.value, True
    ask = graph.object(node, V.SH_ASK)
    if ask is not None and ask.is_literal:
        return ask.value, False
    return None


def _local_name(iri_str: str) -> str | None:
    """utils.rs:280-285."""
    import re as _re

    last = _re.split(r"[#/]", iri_str)[-1]
    return last or None


def _is_subclass_of(graph: Graph, node: Term, cls: Term) -> bool:
    visited: set[Term] = set()
    stack = [node]
    while stack:
        cur = stack.pop()
        if cur == cls:
            return True
        if cur in visited:
            continue
        visited.add(cur)
        stack.extend(
            o for o in graph.objects(cur, V.RDFS_SUBCLASS_OF) if o.is_node
        )
    return False


def _parse_sparql_constraints(
    graph: Graph, node: Term, is_property_shape: bool
) -> list[Constraint]:
    """parser/constraints/sparql.rs:177-189 — direct sh:sparql executables
    plus component-based validators (sh:ConstraintComponent + sh:parameter
    + sh:validator / sh:nodeValidator / sh:propertyValidator)."""
    cs: list[Constraint] = []
    seen: set[Term] = set()
    for exe in graph.objects(node, V.SH_SPARQL):
        if not exe.is_node or exe in seen:
            continue
        seen.add(exe)
        parsed = _parse_executable(graph, exe)
        if parsed is None:
            continue
        query, is_select = parsed
        cs.append(SparqlC(
            query, is_select,
            tuple(graph.get_all_string_values(exe, V.SH_MESSAGE)),
            tuple(_parse_shacl_prefixes(graph, exe)),
        ))
    if node not in seen:
        parsed = _parse_executable(graph, node)
        if parsed is not None:
            query, is_select = parsed
            cs.append(SparqlC(
                query, is_select,
                tuple(graph.get_all_string_values(node, V.SH_MESSAGE)),
                tuple(_parse_shacl_prefixes(graph, node)),
            ))

    # --- component-based constraints --------------------------------
    validator_preds = [V.SH + "validator"]
    validator_preds.append(
        V.SH + ("propertyValidator" if is_property_shape else "nodeValidator")
    )
    cc_term = Term("iri", V.SH + "ConstraintComponent")
    components: list[Term] = []
    comp_seen: set[Term] = set()
    for t in graph.triples_for_predicate(V.SH + "parameter"):
        if t.s not in comp_seen:
            comp_seen.add(t.s)
            components.append(t.s)
    for component in components:
        if not any(
            o.is_node and (o == cc_term or _is_subclass_of(graph, o, cc_term))
            for o in graph.objects(component, V.RDF_TYPE)
        ):
            continue
        bindings: list[tuple[str, Term]] = []
        ok = True
        for param in graph.objects(component, V.SH + "parameter"):
            if not param.is_node:
                ok = False
                break
            ppath = graph.object(param, V.SH_PATH)
            if ppath is None or not ppath.is_iri:
                ok = False
                break
            var_name = _local_name(ppath.value)
            if var_name is None:
                ok = False
                break
            optional = graph.get_boolean_value(param, V.SH + "optional") or False
            vals = graph.objects(node, ppath.value)
            if vals:
                bindings.append((var_name, vals[0]))
            elif not optional:
                ok = False
                break
        if not ok:
            continue
        for pred in validator_preds:
            for vterm in graph.objects(component, pred):
                if not vterm.is_node:
                    continue
                parsed = _parse_executable(graph, vterm)
                if parsed is None:
                    continue
                query, is_select = parsed
                cs.append(SparqlC(
                    query, is_select,
                    tuple(graph.get_all_string_values(vterm, V.SH_MESSAGE)),
                    tuple(_parse_shacl_prefixes(graph, vterm)),
                    component=component.value if component.is_iri else component.n3(),
                    params=tuple(bindings),
                ))
    return cs
