"""Format-matrix tests: the same graph expressed in every wire format
the reference accepts (/root/reference/src/rdf.rs:10-19 aliases) parses
to the identical triple set, and every serializer round-trips.
"""

import pytest

from shacl_rust_spark.rdf import (
    RdfFormatError, normalize_format, parse_rdf, serialize_graph,
    to_ntriples, to_turtle,
)
from shacl_rust_spark.term import iri, literal

EX = "http://example.org/"

TTL = """
@prefix ex: <http://example.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
ex:alice a ex:Person ;
  ex:name "Alice" ;
  ex:age "30"^^xsd:integer ;
  ex:bio "hi"@en ;
  ex:knows ex:bob .
ex:bob a ex:Person .
"""

NT = """
<http://example.org/alice> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://example.org/Person> .
<http://example.org/alice> <http://example.org/name> "Alice" .
<http://example.org/alice> <http://example.org/age> "30"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://example.org/alice> <http://example.org/bio> "hi"@en .
<http://example.org/alice> <http://example.org/knows> <http://example.org/bob> .
<http://example.org/bob> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://example.org/Person> .
"""

NQ = NT.replace(" .\n", " <http://example.org/g1> .\n")

TRIG = """
@prefix ex: <http://example.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
GRAPH ex:g1 {
  ex:alice a ex:Person ;
    ex:name "Alice" ;
    ex:age "30"^^xsd:integer ;
    ex:bio "hi"@en ;
    ex:knows ex:bob .
}
ex:g2 {
  ex:bob a ex:Person .
}
"""

JSONLD = """
{
  "@context": {
    "ex": "http://example.org/",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "name": "http://example.org/name",
    "knows": {"@id": "http://example.org/knows", "@type": "@id"},
    "age": {"@id": "http://example.org/age", "@type": "xsd:integer"}
  },
  "@graph": [
    {
      "@id": "ex:alice",
      "@type": "ex:Person",
      "name": "Alice",
      "age": "30",
      "http://example.org/bio": {"@value": "hi", "@language": "en"},
      "knows": "ex:bob"
    },
    {"@id": "ex:bob", "@type": "ex:Person"}
  ]
}
"""

RDFXML = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="http://example.org/">
  <ex:Person rdf:about="http://example.org/alice">
    <ex:name>Alice</ex:name>
    <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">30</ex:age>
    <ex:bio xml:lang="en">hi</ex:bio>
    <ex:knows rdf:resource="http://example.org/bob"/>
  </ex:Person>
  <ex:Person rdf:about="http://example.org/bob"/>
</rdf:RDF>
"""


def canon(graph):
    return sorted((t.s.n3(), t.p, t.o.n3()) for t in graph)


BASELINE = canon(parse_rdf(TTL, "ttl"))


@pytest.mark.parametrize("fmt,text", [
    ("turtle", TTL), ("ttl", TTL),
    ("nt", NT), ("ntriples", NT), ("n-triples", NT),
    ("nq", NQ), ("nquads", NQ), ("n-quads", NQ),
    ("trig", TRIG),
    ("jsonld", JSONLD), ("json-ld", JSONLD),
    ("rdf", RDFXML), ("xml", RDFXML), ("rdfxml", RDFXML), ("rdf-xml", RDFXML),
])
def test_every_format_parses_to_same_graph(fmt, text):
    assert canon(parse_rdf(text, fmt)) == BASELINE


def test_unsupported_format_raises_with_hint():
    with pytest.raises(RdfFormatError, match="Supported: ttl"):
        parse_rdf(TTL, "docx")


def test_normalize_aliases():
    # rdf.rs:10-19
    assert normalize_format("Turtle") == "ttl"
    assert normalize_format("N-Triples") == "nt"
    assert normalize_format("nquads") == "nq"
    assert normalize_format("RDF-XML") == "rdf"
    assert normalize_format("json-ld") == "jsonld"


@pytest.mark.parametrize("fmt", ["ttl", "nt", "nq", "trig", "rdf", "jsonld"])
def test_serialize_roundtrip(fmt):
    g = parse_rdf(TTL, "ttl")
    text = serialize_graph(g, fmt)
    assert canon(parse_rdf(text, fmt)) == BASELINE


def test_turtle_serializer_compacts_prefixes():
    g = parse_rdf(
        "<http://a/s> <http://www.w3.org/ns/shacl#conforms> "
        '"true"^^<http://www.w3.org/2001/XMLSchema#boolean> .',
        "nt",
    )
    text = to_turtle(g)
    assert "sh:conforms" in text            # rdf.rs:64-66 sh prefix
    assert "@prefix sh:" in text
    assert "xsd:boolean" in text


def test_ntriples_output_is_line_per_triple():
    g = parse_rdf(TTL, "ttl")
    lines = [ln for ln in to_ntriples(g).splitlines() if ln]
    assert len(lines) == len(BASELINE)
    assert all(ln.endswith(" .") for ln in lines)


def test_jsonld_list_and_nested_nodes():
    doc = """
    {
      "@context": {"ex": "http://example.org/"},
      "@id": "ex:s",
      "ex:items": {"@list": [1, 2]},
      "ex:child": {"ex:name": "kid"}
    }
    """
    g = parse_rdf(doc, "jsonld")
    trips = canon(g)
    firsts = [t for t in trips
              if t[1] == "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"]
    assert len(firsts) == 2
    assert any(t[2] == '"kid"' for t in trips)


def test_rdfxml_parse_type_resource_and_li():
    doc = """<?xml version="1.0"?>
    <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:ex="http://example.org/">
      <rdf:Description rdf:about="http://example.org/s">
        <ex:addr rdf:parseType="Resource">
          <ex:city>Paris</ex:city>
        </ex:addr>
        <ex:bag>
          <rdf:Description>
            <rdf:li>one</rdf:li>
            <rdf:li>two</rdf:li>
          </rdf:Description>
        </ex:bag>
      </rdf:Description>
    </rdf:RDF>
    """
    trips = canon(parse_rdf(doc, "rdf"))
    assert any(t[1] == "http://example.org/city" and t[2] == '"Paris"'
               for t in trips)
    assert any(t[1].endswith("#_1") and t[2] == '"one"' for t in trips)
    assert any(t[1].endswith("#_2") and t[2] == '"two"' for t in trips)
