"""RDF term model (driver side).

Columnar mirror of the reference's oxigraph term model
(/root/reference/src/rdf.rs, SURVEY.md §1.1): a term is
(kind, value, datatype, lang) where kind ∈ {'iri','bnode','lit'}.
``datatype``/``lang`` are empty strings (never None) when absent so that
Spark struct equality / group-by keys behave exactly like set equality
of RDF terms. Plain literals carry xsd:string, language-tagged literals
carry rdf:langString — matching oxigraph's RDF 1.1 normalization.
"""

from __future__ import annotations

from typing import NamedTuple

from . import vocab

KIND_IRI = "iri"
KIND_BNODE = "bnode"
KIND_LIT = "lit"


class Term(NamedTuple):
    kind: str
    value: str
    datatype: str = ""
    lang: str = ""

    @property
    def is_iri(self) -> bool:
        return self.kind == KIND_IRI

    @property
    def is_bnode(self) -> bool:
        return self.kind == KIND_BNODE

    @property
    def is_literal(self) -> bool:
        return self.kind == KIND_LIT

    @property
    def is_node(self) -> bool:
        """IRI or blank node (oxigraph NamedOrBlankNode)."""
        return self.kind != KIND_LIT

    def n3(self) -> str:
        """N-Triples-style rendering (stable join/debug key)."""
        if self.kind == KIND_IRI:
            return f"<{self.value}>"
        if self.kind == KIND_BNODE:
            return f"_:{self.value}"
        esc = (
            self.value.replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
            .replace("\r", "\\r")
        )
        if self.lang:
            return f'"{esc}"@{self.lang}'
        if self.datatype and self.datatype != vocab.XSD_STRING:
            return f'"{esc}"^^<{self.datatype}>'
        return f'"{esc}"'

    def __str__(self) -> str:  # display form used in messages
        return self.n3()


def iri(value: str) -> Term:
    return Term(KIND_IRI, value)


def bnode(value: str) -> Term:
    return Term(KIND_BNODE, value)


def literal(value: str, datatype: str = "", lang: str = "") -> Term:
    if lang:
        # RDF 1.1: the value space of language tags is lowercase; the
        # reference's model does the same (oxigraph
        # Literal::new_language_tagged_literal lowercases on construction)
        return Term(KIND_LIT, value, vocab.RDF_LANG_STRING, lang.lower())
    return Term(KIND_LIT, value, datatype or vocab.XSD_STRING, "")


class Triple(NamedTuple):
    s: Term
    p: str  # predicate IRI string (predicates are always IRIs)
    o: Term
