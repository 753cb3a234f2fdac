"""Driver-side indexed triple set.

The shapes graph (and tiny conformance fixtures) stay on the driver as a
plain Python structure — the analog of the reference's in-memory
oxigraph ``Graph`` (/root/reference/src/rdf.rs:21-57). The data graph at
scale lives in a Spark DataFrame instead (see schema.py); this class is
only used where the reference semantics demand driver-side walking:
shape parsing, RDF lists, manifests.
"""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Iterable, Iterator

from ..term import Term, Triple
from .. import vocab


class Graph:
    def __init__(self, triples: Iterable[Triple] = ()):  # set semantics
        self._triples: list[Triple] = []
        self._seen: set[Triple] = set()
        self._by_sp: dict[tuple[Term, str], list[Term]] = defaultdict(list)
        self._by_p: dict[str, list[Triple]] = defaultdict(list)
        self._by_po: dict[tuple[str, Term], list[Term]] = defaultdict(list)
        self._by_s: dict[Term, list[Triple]] = defaultdict(list)
        for t in triples:
            self.add(t)

    def add(self, t: Triple) -> None:
        if t in self._seen:
            return
        self._seen.add(t)
        self._triples.append(t)
        self._by_sp[(t.s, t.p)].append(t.o)
        self._by_p[t.p].append(t)
        self._by_po[(t.p, t.o)].append(t.s)
        self._by_s[t.s].append(t)

    def __len__(self) -> int:
        return len(self._triples)

    def __iter__(self) -> Iterator[Triple]:
        return iter(self._triples)

    def __contains__(self, t: Triple) -> bool:
        return t in self._seen

    def triples(self) -> list[Triple]:
        return list(self._triples)

    def objects(self, s: Term, p: str) -> list[Term]:
        return self._by_sp.get((s, p), [])

    def object(self, s: Term, p: str) -> Term | None:
        objs = self._by_sp.get((s, p))
        return objs[0] if objs else None

    def subjects(self, p: str, o: Term) -> list[Term]:
        return self._by_po.get((p, o), [])

    def triples_for_predicate(self, p: str) -> list[Triple]:
        return self._by_p.get(p, [])

    def triples_for_subject(self, s: Term) -> list[Triple]:
        return self._by_s.get(s, [])

    def union(self, other: "Graph") -> "Graph":
        g = Graph(self._triples)
        for t in other:
            g.add(t)
        return g

    # --- reference utils.rs analogs -----------------------------------
    def parse_rdf_list(self, node: Term) -> list[Term]:
        """Walk an rdf:first/rdf:rest list (utils.rs:149-186)."""
        out: list[Term] = []
        current = node
        seen: set[Term] = set()
        while True:
            if current.is_iri and current.value == vocab.RDF_NIL:
                break
            if current in seen:  # defensive against cyclic lists
                break
            seen.add(current)
            first = self.object(current, vocab.RDF_FIRST)
            if first is not None:
                out.append(first)
            rest = self.object(current, vocab.RDF_REST)
            if rest is None or rest.is_literal:
                break
            current = rest
        return out

    def get_string_value(self, s: Term, p: str) -> str | None:
        """First literal-or-IRI object as string (utils.rs:215-227)."""
        o = self.object(s, p)
        if o is None:
            return None
        if o.is_literal:
            return o.value
        if o.is_iri:
            return f"<{o.value}>"  # NamedNode Display includes brackets
        return None

    def get_all_string_values(self, s: Term, p: str) -> list[str]:
        return [o.value for o in self.objects(s, p) if o.is_literal]

    def get_boolean_value(self, s: Term, p: str) -> bool | None:
        o = self.object(s, p)
        if o is not None and o.is_literal and o.value in ("true", "false"):
            return o.value == "true"
        return None

    def get_integer_value(self, s: Term, p: str) -> int | None:
        o = self.object(s, p)
        if o is not None and o.is_literal:
            try:
                return int(o.value)
            except ValueError:
                return None
        return None
