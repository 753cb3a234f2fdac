"""Shape intermediate representation — the engine's compiled plan.

Mirrors the reference's shape tree (/root/reference/src/core/shape.rs:31-66,
src/core/constraints.rs:135-225, src/core/path.rs:7-14) as plain Python
dataclasses produced driver-side. Nested shapes (sh:node / sh:and / sh:or /
sh:xone / sh:not / sh:qualifiedValueShape) hold full sub-Shape trees that
the Spark engine unrolls at compile time.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..term import Term


# --- paths (src/core/path.rs:7-14) -------------------------------------
@dataclass(frozen=True)
class PathElem:
    pass


@dataclass(frozen=True)
class Hop(PathElem):
    iri: str


@dataclass(frozen=True)
class Inverse(PathElem):
    iri: str


@dataclass(frozen=True)
class ZeroOrMore(PathElem):
    inner: PathElem


@dataclass(frozen=True)
class OneOrMore(PathElem):
    inner: PathElem


@dataclass(frozen=True)
class ZeroOrOne(PathElem):
    inner: PathElem


@dataclass(frozen=True)
class Alternative(PathElem):
    alts: tuple[PathElem, ...]


@dataclass(frozen=True)
class Path:
    elements: tuple[PathElem, ...]

    def display(self) -> str:
        return " / ".join(_elem_str(e) for e in self.elements)

    def direct_predicates(self) -> list[str]:
        """Direct IRI predicates for sh:closed (utils.rs:362-393).

        Inverse and Kleene elements are NOT counted; alternatives
        contribute their direct-IRI members only.
        """
        preds: list[str] = []
        for e in self.elements:
            if isinstance(e, Hop):
                preds.append(e.iri)
            elif isinstance(e, Alternative):
                preds.extend(a.iri for a in e.alts if isinstance(a, Hop))
        return preds


def _elem_str(e: PathElem) -> str:
    if isinstance(e, Hop):
        return f"<{e.iri}>"
    if isinstance(e, Inverse):
        return f"^<{e.iri}>"
    if isinstance(e, ZeroOrMore):
        return f"({_elem_str(e.inner)}*)"
    if isinstance(e, OneOrMore):
        return f"({_elem_str(e.inner)}+)"
    if isinstance(e, ZeroOrOne):
        return f"({_elem_str(e.inner)}?)"
    if isinstance(e, Alternative):
        return "(" + " | ".join(_elem_str(a) for a in e.alts) + ")"
    return "?"


# --- targets (src/core/target.rs:39-45) --------------------------------
@dataclass(frozen=True)
class Target:
    kind: str  # 'node' | 'class' | 'subjectsOf' | 'objectsOf' | 'advanced'
    term: Term


# --- constraints (src/core/constraints.rs:135-225) ----------------------
@dataclass(frozen=True)
class Constraint:
    pass


@dataclass(frozen=True)
class ClassC(Constraint):
    cls: str


@dataclass(frozen=True)
class DatatypeC(Constraint):
    datatype: str


@dataclass(frozen=True)
class NodeKindC(Constraint):
    kind: str  # the sh:* nodeKind IRI


@dataclass(frozen=True)
class MinCountC(Constraint):
    n: int


@dataclass(frozen=True)
class MaxCountC(Constraint):
    n: int


@dataclass(frozen=True)
class RangeC(Constraint):
    op: str  # 'minExclusive' | 'minInclusive' | 'maxExclusive' | 'maxInclusive'
    bound: Term


@dataclass(frozen=True)
class MinLengthC(Constraint):
    n: int


@dataclass(frozen=True)
class MaxLengthC(Constraint):
    n: int


@dataclass(frozen=True)
class PatternC(Constraint):
    pattern: str
    flags: str | None


@dataclass(frozen=True)
class LanguageInC(Constraint):
    langs: tuple[str, ...]


@dataclass(frozen=True)
class UniqueLangC(Constraint):
    # NB the reference validates duplicates regardless of the boolean
    # (unique_lang.rs never reads it) — kept for parity.
    flag: bool


@dataclass(frozen=True)
class PairC(Constraint):
    """equals / disjoint / lessThan / lessThanOrEquals — other-path compare."""

    op: str  # 'equals' | 'disjoint' | 'lessThan' | 'lessThanOrEquals'
    other: Path


@dataclass(frozen=True)
class HasValueC(Constraint):
    term: Term


@dataclass(frozen=True)
class InC(Constraint):
    allowed: tuple[Term, ...]


@dataclass(frozen=True)
class NodeC(Constraint):
    shape: "Shape"


@dataclass(frozen=True)
class QualifiedValueShapeC(Constraint):
    shape: "Shape"
    min_count: int | None
    max_count: int | None
    disjoint: bool


@dataclass(frozen=True)
class LogicalC(Constraint):
    op: str  # 'and' | 'or' | 'xone'
    shapes: tuple["Shape", ...]


@dataclass(frozen=True)
class NotC(Constraint):
    shape: "Shape"


@dataclass(frozen=True)
class SparqlC(Constraint):
    query: str
    is_select: bool
    messages: tuple[str, ...]
    prefixes: tuple[tuple[str, str], ...]
    component: str | None = None  # sh:ConstraintComponent IRI when validator-based
    params: tuple[tuple[str, Term], ...] = ()  # pre-bound $parameters


@dataclass(frozen=True)
class Closed:
    ignored_properties: tuple[str, ...]


@dataclass
class Shape:
    node: Term  # shape's own node (IRI or bnode)
    path: Path | None = None  # None => node shape
    targets: list[Target] = field(default_factory=list)
    constraints: list[Constraint] = field(default_factory=list)
    property_shapes: list["Shape"] = field(default_factory=list)
    closed: Closed | None = None
    severity: str = ""  # sh:Violation default applied by parser
    deactivated: bool = False
    name: str | None = None
    description: str | None = None
    messages: list[str] = field(default_factory=list)
    parent: Term | None = None

    @property
    def is_property_shape(self) -> bool:
        return self.path is not None

    def __hash__(self) -> int:  # identity hash: shapes are tree nodes
        return id(self)
