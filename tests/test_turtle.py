"""Turtle parser unit tests."""

from shacl_rust_spark.rdf import parse_turtle
from shacl_rust_spark.term import Term
from shacl_rust_spark import vocab as V


def _g(text, base="http://example.org"):
    return parse_turtle(text, base)


def test_basic_triples_and_prefixes():
    g = _g("""
    @prefix ex: <http://example.org/> .
    ex:Alice a ex:Person ; ex:age 30 ; ex:name "Alice" .
    """)
    assert len(g) == 3
    alice = Term("iri", "http://example.org/Alice")
    assert g.object(alice, V.RDF_TYPE) == Term("iri", "http://example.org/Person")
    assert g.object(alice, "http://example.org/age") == Term("lit", "30", V.XSD_INTEGER)
    assert g.object(alice, "http://example.org/name") == Term("lit", "Alice", V.XSD_STRING)


def test_literals():
    g = _g("""
    @prefix ex: <http://example.org/> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    ex:x ex:a "hi"@en ; ex:b "5"^^xsd:decimal ; ex:c 2.5 ; ex:d 1e3 ;
         ex:e true ; ex:f '''long
string''' ; ex:g "esc\\"q\\nn" .
    """)
    x = Term("iri", "http://example.org/x")
    e = "http://example.org/"
    assert g.object(x, e + "a") == Term("lit", "hi", V.RDF_LANG_STRING, "en")
    assert g.object(x, e + "b") == Term("lit", "5", V.XSD_DECIMAL)
    assert g.object(x, e + "c") == Term("lit", "2.5", V.XSD_DECIMAL)
    assert g.object(x, e + "d") == Term("lit", "1e3", V.XSD_DOUBLE)
    assert g.object(x, e + "e") == Term("lit", "true", V.XSD_BOOLEAN)
    assert g.object(x, e + "f").value == "long\nstring"
    assert g.object(x, e + "g").value == 'esc"q\nn'


def test_collections_and_bnodes():
    g = _g("""
    @prefix ex: <http://example.org/> .
    ex:s ex:list ( ex:a ex:b ) ; ex:bn [ ex:p ex:o ] .
    """)
    s = Term("iri", "http://example.org/s")
    head = g.object(s, "http://example.org/list")
    items = g.parse_rdf_list(head)
    assert [t.value for t in items] == [
        "http://example.org/a", "http://example.org/b",
    ]
    bn = g.object(s, "http://example.org/bn")
    assert bn.is_bnode
    assert g.object(bn, "http://example.org/p") == Term("iri", "http://example.org/o")


def test_relative_iri_resolution():
    g = _g("<> <p:a> <x> .", base="file:///dir/f.ttl")
    t = list(g)[0]
    assert t.s.value == "file:///dir/f.ttl"
    assert t.o.value == "file:///dir/x"


def test_lang_tag_lowercased():
    g = _g('<u:s> <u:p> "v"@EN-us .')
    assert list(g)[0].o.lang == "en-us"
