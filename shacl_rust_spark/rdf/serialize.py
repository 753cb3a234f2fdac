"""Graph → text serializers (N-Triples / N-Quads / Turtle / TriG).

Mirrors the reference's serialize_graph_to_string surface
(/root/reference/src/rdf.rs:59-81): any graph serializes back to text,
with the `sh:` prefix always registered for Turtle output (the
reference's serializer is built with .with_prefix("sh", SHACL)).
"""

from __future__ import annotations

import re

from ..term import Term
from .. import vocab
from .graph import Graph

DEFAULT_PREFIXES = {
    "sh": "http://www.w3.org/ns/shacl#",  # rdf.rs:64-66
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}

# conservative PN_LOCAL subset: compaction only when the local part is
# unambiguous without escaping
_SAFE_LOCAL = re.compile(r"^[A-Za-z0-9_][A-Za-z0-9_\-]*$")


def to_ntriples(graph: Graph) -> str:
    return "".join(
        f"{t.s.n3()} <{t.p}> {t.o.n3()} .\n" for t in sorted_triples(graph)
    )


def to_nquads(graph: Graph) -> str:
    # single default graph: N-Quads degenerates to N-Triples lines
    return to_ntriples(graph)


def sorted_triples(graph: Graph):
    return sorted(graph, key=lambda t: (t.s.n3(), t.p, t.o.n3()))


class TurtleSerializer:
    def __init__(self, prefixes: dict[str, str] | None = None):
        self.prefixes = dict(DEFAULT_PREFIXES)
        if prefixes:
            self.prefixes.update(prefixes)
        # longest namespace wins when namespaces nest
        self._by_len = sorted(
            self.prefixes.items(), key=lambda kv: -len(kv[1])
        )

    def _compact(self, iri_value: str) -> str | None:
        for pfx, ns in self._by_len:
            if iri_value.startswith(ns):
                local = iri_value[len(ns):]
                if local == "" or _SAFE_LOCAL.match(local):
                    return f"{pfx}:{local}"
        return None

    def term(self, t: Term) -> str:
        if t.is_iri:
            c = self._compact(t.value)
            return c if c is not None else f"<{t.value}>"
        if t.is_literal and t.datatype and t.datatype != vocab.XSD_STRING and not t.lang:
            dt = self._compact(t.datatype)
            if dt is not None:
                esc = (
                    t.value.replace("\\", "\\\\")
                    .replace('"', '\\"')
                    .replace("\n", "\\n")
                    .replace("\r", "\\r")
                )
                return f'"{esc}"^^{dt}'
        return t.n3()

    def pred(self, p: str) -> str:
        if p == vocab.RDF_TYPE:
            return "a"
        c = self._compact(p)
        return c if c is not None else f"<{p}>"

    def serialize(self, graph: Graph) -> str:
        used: set[str] = set()
        body_parts: list[str] = []
        # group triples by subject, predicates joined with ';', objects ','
        by_subject: dict[str, tuple[Term, dict[str, list[Term]]]] = {}
        for t in sorted_triples(graph):
            key = t.s.n3()
            if key not in by_subject:
                by_subject[key] = (t.s, {})
            by_subject[key][1].setdefault(t.p, []).append(t.o)
        for _, (s, po) in sorted(by_subject.items()):
            lines = []
            for p, objs in sorted(po.items()):
                rendered = ", ".join(self.term(o) for o in objs)
                lines.append(f"{self.pred(p)} {rendered}")
            subj = self.term(s)
            body = f"{subj} " + " ;\n    ".join(lines) + " .\n"
            body_parts.append(body)
        body_text = "\n".join(body_parts)
        for pfx, ns in self.prefixes.items():
            if f"{pfx}:" in body_text:
                used.add(pfx)
        header = "".join(
            f"@prefix {pfx}: <{self.prefixes[pfx]}> .\n" for pfx in sorted(used)
        )
        return header + ("\n" if header else "") + body_text


def to_turtle(graph: Graph, prefixes: dict[str, str] | None = None) -> str:
    return TurtleSerializer(prefixes).serialize(graph)


def to_trig(graph: Graph, prefixes: dict[str, str] | None = None) -> str:
    # single default graph: valid TriG is just the Turtle document
    return to_turtle(graph, prefixes)


def serialize_graph(graph: Graph, fmt: str,
                    prefixes: dict[str, str] | None = None) -> str:
    from .formats import normalize_format

    f = normalize_format(fmt)
    if f == "nt":
        return to_ntriples(graph)
    if f == "nq":
        return to_nquads(graph)
    if f == "ttl":
        return to_turtle(graph, prefixes)
    if f == "trig":
        return to_trig(graph, prefixes)
    raise ValueError(
        f"Unsupported serialization format: {fmt!r}. "
        "Supported: ttl (turtle), nt (n-triples), nq (n-quads), trig"
    )
