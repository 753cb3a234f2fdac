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


# XML 1.0 NCName subset shared by the RDF/XML property-element splitter
_NCNAME = re.compile(r"^[A-Za-z_][A-Za-z0-9_.\-]*$")


def _split_qname(iri_value: str) -> tuple[str, str]:
    """Split a predicate/type IRI into (namespace, NCName local part) at
    the last '#' or '/' (or ':' for URNs). RDF/XML structurally requires
    predicates to be QNames; an IRI whose tail is not an NCName cannot
    be written (same failure mode as any spec-conforming serializer)."""
    for sep in ("#", "/", ":"):
        idx = iri_value.rfind(sep)
        if idx >= 0:
            ns, local = iri_value[: idx + 1], iri_value[idx + 1:]
            if _NCNAME.match(local):
                return ns, local
    raise ValueError(
        f"cannot serialize IRI {iri_value!r} as an RDF/XML QName"
    )


def _xml_escape(text: str, attr: bool = False) -> str:
    out = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    if attr:
        out = out.replace('"', "&quot;")
    return out


def to_rdfxml(graph: Graph) -> str:
    """Graph → RDF/XML (the reference's `rdf` output format — oxigraph
    RdfFormat::from_extension("rdf") → RdfXml, rdf.rs:59-81). One
    rdf:Description per subject with rdf:about / rdf:nodeID, property
    elements with rdf:resource / rdf:nodeID / rdf:datatype / xml:lang.
    Deterministic: subjects and predicates emit in sorted order and
    namespace prefixes are assigned in first-use order."""
    ns_prefix: dict[str, str] = {
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#": "rdf",
        "http://www.w3.org/ns/shacl#": "sh",  # rdf.rs:64-66 with_prefix
    }

    def prefix_for(ns: str) -> str:
        if ns not in ns_prefix:
            ns_prefix[ns] = f"ns{sum(p.startswith('ns') for p in ns_prefix.values()) + 1}"
        return ns_prefix[ns]

    by_subject: dict[str, tuple[Term, list]] = {}
    for t in sorted_triples(graph):
        by_subject.setdefault(t.s.n3(), (t.s, []))[1].append(t)

    body: list[str] = []
    for _, (s, triples) in sorted(by_subject.items()):
        sattr = (
            f'rdf:nodeID="{_xml_escape(s.value, attr=True)}"'
            if s.is_bnode
            else f'rdf:about="{_xml_escape(s.value, attr=True)}"'
        )
        lines = [f"  <rdf:Description {sattr}>"]
        for t in triples:
            ns, local = _split_qname(t.p)
            tag = f"{prefix_for(ns)}:{local}"
            o = t.o
            if o.is_iri:
                lines.append(
                    f'    <{tag} rdf:resource="{_xml_escape(o.value, attr=True)}"/>'
                )
            elif o.is_bnode:
                lines.append(
                    f'    <{tag} rdf:nodeID="{_xml_escape(o.value, attr=True)}"/>'
                )
            else:
                attrs = ""
                if o.lang:
                    attrs = f' xml:lang="{_xml_escape(o.lang, attr=True)}"'
                elif o.datatype and o.datatype != vocab.XSD_STRING:
                    attrs = (
                        f' rdf:datatype="{_xml_escape(o.datatype, attr=True)}"'
                    )
                lines.append(
                    f"    <{tag}{attrs}>{_xml_escape(o.value)}</{tag}>"
                )
        lines.append("  </rdf:Description>")
        body.append("\n".join(lines))

    ns_attrs = "".join(
        f'\n         xmlns:{pfx}="{_xml_escape(ns, attr=True)}"'
        for ns, pfx in sorted(ns_prefix.items(), key=lambda kv: kv[1])
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        f"<rdf:RDF{ns_attrs}>\n" + "\n".join(body) + "\n</rdf:RDF>\n"
    )


def _jsonld_object(o: Term):
    if o.is_iri:
        return {"@id": o.value}
    if o.is_bnode:
        return {"@id": f"_:{o.value}"}
    val: dict = {"@value": o.value}
    if o.lang:
        val["@language"] = o.lang
    elif o.datatype and o.datatype != vocab.XSD_STRING:
        val["@type"] = o.datatype
    return val


def to_jsonld(graph: Graph) -> str:
    """Graph → JSON-LD expanded form (the reference's `jsonld` output,
    oxigraph RdfFormat::JsonLd): a top-level array of node objects with
    absolute-IRI keys, rdf:type folded into @type, literals as value
    objects. Round-trips through parse_jsonld; deterministic order."""
    import json as _json

    by_subject: dict[str, tuple[Term, dict[str, list[Term]]]] = {}
    for t in sorted_triples(graph):
        key = t.s.n3()
        if key not in by_subject:
            by_subject[key] = (t.s, {})
        by_subject[key][1].setdefault(t.p, []).append(t.o)

    nodes = []
    for _, (s, po) in sorted(by_subject.items()):
        node: dict = {
            "@id": f"_:{s.value}" if s.is_bnode else s.value
        }
        # only IRI types fold into @type; a (rare) bnode-valued rdf:type
        # stays a plain predicate entry so the document round-trips
        types = [o for o in po.get(vocab.RDF_TYPE, []) if o.is_iri]
        if types:
            node["@type"] = [o.value for o in types]
            rest = [o for o in po[vocab.RDF_TYPE] if not o.is_iri]
            if rest:
                po[vocab.RDF_TYPE] = rest
            else:
                po.pop(vocab.RDF_TYPE)
        for p, objs in sorted(po.items()):
            node[p] = [_jsonld_object(o) for o in objs]
        nodes.append(node)
    return _json.dumps(nodes, indent=2, sort_keys=False) + "\n"


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
    if f == "rdf":
        return to_rdfxml(graph)
    if f == "jsonld":
        return to_jsonld(graph)
    raise ValueError(
        f"Unsupported serialization format: {fmt!r}. "
        "Supported: ttl (turtle), nt (n-triples), nq (n-quads), trig, "
        "rdf (rdfxml/xml), jsonld (json-ld)"
    )


def ntriples_lines(df, s: str = "s", p: str = "p", o: str = "o",
                   o_is_iri: str = "o_is_iri"):
    """Column-level N-Triples export for TABLE-backed triples — the
    at-scale twin of :func:`to_ntriples` (which renders a driver-side
    Graph): one codegen'd projection turns a (s, p, o, o_is_iri)
    DataFrame into wire-format lines, so a 10^12-triple emission
    serializes as a parallel scan-project-write with no Python and no
    driver materialization. Escaping matches Term.n3 exactly
    (term.py:46 — ``\\`` then ``"`` then LF then CR; the N-Triples
    STRING_LITERAL_QUOTE charter, which leaves TAB literal), so the
    driver path and the table path emit byte-identical lines for the
    same triple. Subjects/predicates are IRIs by construction in the
    table lane (the pipeline's emission schema); ``o_is_iri`` picks
    the object rendering.

    Returns a one-column DataFrame ``line`` ready for ``.write.text``.
    """
    from pyspark.sql import functions as F

    def esc(col):
        out = F.col(col)
        for frm, to in (("\\", "\\\\"), ('"', '\\"'),
                        ("\n", "\\n"), ("\r", "\\r")):
            out = F.replace(out, F.lit(frm), F.lit(to))
        return out

    obj = F.when(
        F.col(o_is_iri), F.concat(F.lit("<"), F.col(o), F.lit(">"))
    ).otherwise(F.concat(F.lit('"'), esc(o), F.lit('"')))
    return df.select(
        F.concat(
            F.lit("<"), F.col(s), F.lit("> <"), F.col(p), F.lit("> "),
            obj, F.lit(" ."),
        ).alias("line")
    )


def ntriples_lines_terms(df):
    """TERM-struct twin of :func:`ntriples_lines` for TRIPLES_TYPE
    tables (schema.py — (s struct, p string, o struct)): renders the
    full Term.n3 surface per row — IRIs, bnodes, plain / lang-tagged /
    datatyped literals — as one codegen'd projection (CLI `export`
    reads the pipeline's parquet sink through this; the driver-side
    to_ntriples stays the small-graph path and the byte-format
    contract both implementations share). Lines are NOT sorted (the
    driver path sorts; a 10^12-row export orders by partition layout
    — N-Triples is order-insensitive)."""
    from pyspark.sql import functions as F

    def esc(col):
        out = col
        for frm, to in (("\\", "\\\\"), ('"', '\\"'),
                        ("\n", "\\n"), ("\r", "\\r")):
            out = F.replace(out, F.lit(frm), F.lit(to))
        return out

    def term(col):
        lit_body = F.concat(F.lit('"'), esc(col["value"]), F.lit('"'))
        lit_full = (
            F.when(col["lang"] != "",
                   F.concat(lit_body, F.lit("@"), col["lang"]))
            .when(
                (col["datatype"] != "")
                & (col["datatype"]
                   != "http://www.w3.org/2001/XMLSchema#string"),
                F.concat(lit_body, F.lit("^^<"), col["datatype"],
                         F.lit(">")))
            .otherwise(lit_body)
        )
        return (
            F.when(col["kind"] == "iri",
                   F.concat(F.lit("<"), col["value"], F.lit(">")))
            .when(col["kind"] == "bnode",
                  F.concat(F.lit("_:"), col["value"]))
            .otherwise(lit_full)
        )

    return df.select(
        F.concat(
            term(F.col("s")), F.lit(" <"), F.col("p"), F.lit("> "),
            term(F.col("o")), F.lit(" ."),
        ).alias("line")
    )
