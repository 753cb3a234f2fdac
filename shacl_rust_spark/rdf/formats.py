"""RDF format registry: alias normalization + parse dispatch.

Mirrors the reference's normalize_rdf_format + RdfFormat::from_extension
surface (/root/reference/src/rdf.rs:10-19,39-57): formats are named by
file extension, with the same aliases; unsupported names raise with the
same "Supported: ..." hint. Quad formats (nq/trig) collapse into a
single Graph exactly like the reference's Triple::from(quad)."""

from __future__ import annotations

import os

from .graph import Graph
from .turtle import TurtleParser

# rdf.rs:10-19
_ALIASES = {
    "turtle": "ttl",
    "ntriples": "nt",
    "n-triples": "nt",
    "nquads": "nq",
    "n-quads": "nq",
    "xml": "rdf",
    "rdfxml": "rdf",
    "rdf-xml": "rdf",
    "json-ld": "jsonld",
}

SUPPORTED = ("ttl", "nt", "nq", "rdf", "jsonld", "trig")

_SUPPORTED_HINT = (
    "Supported: ttl (turtle), nt (n-triples), nq (n-quads), "
    "rdf (rdfxml/xml), jsonld (json-ld), trig"
)


class RdfFormatError(ValueError):
    pass


def normalize_format(fmt: str) -> str:
    f = fmt.strip().lower()
    return _ALIASES.get(f, f)


def parse_rdf(
    text: str, fmt: str = "ttl", base_iri: str = "http://example.org"
) -> Graph:
    """Parse RDF text in any supported format into a driver-side Graph
    (the analog of read_graph_from_string, rdf.rs:21-28)."""
    f = normalize_format(fmt)
    if f == "ttl" or f == "nt":
        # N-Triples is a syntactic subset of Turtle
        return TurtleParser(text, base_iri).parse()
    if f == "nq":
        return TurtleParser(text, base_iri, quads=True).parse()
    if f == "trig":
        return TurtleParser(text, base_iri, trig=True).parse()
    if f == "jsonld":
        from .jsonld import parse_jsonld

        return parse_jsonld(text, base_iri)
    if f == "rdf":
        from .rdfxml import parse_rdfxml

        return parse_rdfxml(text, base_iri)
    raise RdfFormatError(
        f"Unsupported file extension: '{fmt}'. {_SUPPORTED_HINT}"
    )


def format_from_path(path: str) -> str:
    ext = os.path.splitext(path)[1].lstrip(".")
    return normalize_format(ext) if ext else "ttl"


def parse_rdf_file(path: str, fmt: str | None = None) -> Graph:
    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    f = normalize_format(fmt) if fmt else format_from_path(path)
    return parse_rdf(text, f, base_iri=f"file://{path}")
