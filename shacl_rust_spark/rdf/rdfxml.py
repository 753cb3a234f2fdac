"""Driver-side RDF/XML parser (subset) over xml.etree.ElementTree.

The reference accepts `rdf`/`xml`/`rdfxml` through oxigraph
(/root/reference/src/rdf.rs:10-19); this covers the core RDF/XML
grammar from the public spec: rdf:RDF roots, node elements
(rdf:Description or typed elements) with rdf:about / rdf:ID /
rdf:nodeID, property elements with rdf:resource / rdf:nodeID /
rdf:datatype / xml:lang / literal text content / nested node elements /
rdf:parseType="Resource" and "Collection", rdf:li container items
(expanded to rdf:_1, rdf:_2, ...), and property attributes on node
elements. rdf:parseType="Literal" (XML literals) is not supported.
"""

from __future__ import annotations

import itertools
import xml.etree.ElementTree as ET
from urllib.parse import urljoin

from ..term import Term, Triple, bnode, iri, literal
from .. import vocab
from .graph import Graph

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XML_NS = "http://www.w3.org/XML/1998/namespace"

_R = lambda local: f"{{{RDF_NS}}}{local}"  # noqa: E731
_SYNTAX_ATTRS = {
    _R("about"), _R("ID"), _R("nodeID"), _R("resource"),
    _R("datatype"), _R("parseType"), f"{{{XML_NS}}}lang", f"{{{XML_NS}}}base",
}


class RdfXmlParseError(ValueError):
    pass


def _split(tag: str) -> str:
    """'{ns}local' → 'nslocal' (the predicate/type IRI)."""
    if not tag.startswith("{"):
        raise RdfXmlParseError(f"unqualified element name {tag!r}")
    ns, local = tag[1:].split("}", 1)
    return ns + local


class RdfXmlParser:
    def __init__(self, text: str, base_iri: str = "http://example.org"):
        self.text = text
        self.base = base_iri
        self.graph = Graph()
        self._bnode_ids = itertools.count()
        self._bnode_labels: dict[str, Term] = {}

    def _fresh_bnode(self) -> Term:
        return bnode(f"xb{next(self._bnode_ids)}")

    def _labeled_bnode(self, label: str) -> Term:
        if label not in self._bnode_labels:
            self._bnode_labels[label] = bnode(label)
        return self._bnode_labels[label]

    def parse(self) -> Graph:
        try:
            root = ET.fromstring(self.text)
        except ET.ParseError as exc:
            raise RdfXmlParseError(f"invalid XML: {exc}") from exc
        if root.tag == _R("RDF"):
            for child in root:
                self._node_element(child, self.base)
        else:
            self._node_element(root, self.base)
        return self.graph

    # --- node elements ---------------------------------------------------
    def _node_element(self, el: ET.Element, base: str) -> Term:
        base = el.get(f"{{{XML_NS}}}base", base)
        about = el.get(_R("about"))
        frag = el.get(_R("ID"))
        node_id = el.get(_R("nodeID"))
        if about is not None:
            subj = iri(urljoin(base, about))
        elif frag is not None:
            subj = iri(urljoin(base, f"#{frag}"))
        elif node_id is not None:
            subj = self._labeled_bnode(node_id)
        else:
            subj = self._fresh_bnode()
        if el.tag != _R("Description"):
            self.graph.add(Triple(subj, vocab.RDF_TYPE, iri(_split(el.tag))))
        lang = el.get(f"{{{XML_NS}}}lang", "")
        # property attributes on the node element
        for attr, value in el.attrib.items():
            if attr in _SYNTAX_ATTRS or attr.startswith(f"{{{XML_NS}}}"):
                continue
            if attr == _R("type"):
                self.graph.add(
                    Triple(subj, vocab.RDF_TYPE, iri(urljoin(base, value)))
                )
                continue
            if attr.startswith(f"{{{RDF_NS}}}"):
                raise RdfXmlParseError(f"unsupported rdf: attribute {attr!r}")
            self.graph.add(
                Triple(subj, _split(attr),
                       literal(value, lang=lang) if lang else literal(value))
            )
        li_counter = itertools.count(1)
        for child in el:
            self._property_element(subj, child, base, lang, li_counter)
        return subj

    # --- property elements ----------------------------------------------
    def _property_element(
        self, subj: Term, el: ET.Element, base: str, lang: str, li_counter
    ) -> None:
        base = el.get(f"{{{XML_NS}}}base", base)
        lang = el.get(f"{{{XML_NS}}}lang", lang)
        if el.tag == _R("li"):
            pred = f"{RDF_NS}_{next(li_counter)}"
        else:
            pred = _split(el.tag)
        parse_type = el.get(_R("parseType"))
        resource = el.get(_R("resource"))
        node_id = el.get(_R("nodeID"))
        datatype = el.get(_R("datatype"))

        if parse_type == "Resource":
            inner = self._fresh_bnode()
            self.graph.add(Triple(subj, pred, inner))
            inner_li = itertools.count(1)
            for child in el:
                self._property_element(inner, child, base, lang, inner_li)
            return
        if parse_type == "Collection":
            items = [self._node_element(c, base) for c in el]
            if not items:
                self.graph.add(Triple(subj, pred, iri(vocab.RDF_NIL)))
                return
            head = self._fresh_bnode()
            self.graph.add(Triple(subj, pred, head))
            cur = head
            for idx, item in enumerate(items):
                self.graph.add(Triple(cur, vocab.RDF_FIRST, item))
                if idx + 1 < len(items):
                    nxt = self._fresh_bnode()
                    self.graph.add(Triple(cur, vocab.RDF_REST, nxt))
                    cur = nxt
                else:
                    self.graph.add(Triple(cur, vocab.RDF_REST, iri(vocab.RDF_NIL)))
            return
        if parse_type is not None:
            raise RdfXmlParseError(f"unsupported rdf:parseType {parse_type!r}")
        if resource is not None:
            self.graph.add(Triple(subj, pred, iri(urljoin(base, resource))))
            return
        if node_id is not None:
            self.graph.add(Triple(subj, pred, self._labeled_bnode(node_id)))
            return
        children = list(el)
        if children:
            if len(children) != 1:
                raise RdfXmlParseError(
                    f"property element {pred} must hold one node element"
                )
            obj = self._node_element(children[0], base)
            self.graph.add(Triple(subj, pred, obj))
            return
        text = el.text or ""
        if datatype is not None:
            self.graph.add(Triple(subj, pred, literal(text, datatype)))
        elif lang:
            self.graph.add(Triple(subj, pred, literal(text, lang=lang)))
        else:
            self.graph.add(Triple(subj, pred, literal(text)))


def parse_rdfxml(text: str, base_iri: str = "http://example.org") -> Graph:
    return RdfXmlParser(text, base_iri).parse()
