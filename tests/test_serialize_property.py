"""Property test: random graphs survive a serialize→parse round trip in
every wire format the engine emits (the reference serializes any graph
through oxigraph's writers, src/rdf.rs:59-81 — round-trip fidelity is
the parity bar, not byte-for-byte output).

Term generation covers the adversarial corners: quotes, backslashes,
newlines/tabs, non-ASCII, language tags, typed literals, blank nodes in
subject and object position. RDF/XML structurally restricts predicate
IRIs to QName-splittable tails and literal values to XML-legal
characters, so the generator stays inside that envelope (the serializer
raises on the rest by design).
"""

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from shacl_rust_spark.rdf import parse_rdf, serialize_graph
from shacl_rust_spark.rdf.graph import Graph
from shacl_rust_spark.term import Triple, bnode, iri, literal
from shacl_rust_spark import vocab

_local = st.text(
    alphabet=string.ascii_letters + string.digits + "_", min_size=1,
    max_size=8,
).filter(lambda s: s[0].isalpha() or s[0] == "_")

_iri = _local.map(lambda l: f"http://example.org/ns#{l}")

_bnode_label = st.text(
    alphabet=string.ascii_letters + string.digits, min_size=1, max_size=6,
).filter(lambda s: s[0].isalpha())

# XML 1.0 legal, no surrogates; includes the escaping-sensitive chars
_lit_text = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("L", "N", "P", "S", "Zs"),
        include_characters='"\\\n\t<>&\'',
    ),
    max_size=20,
)

_lang = st.sampled_from(["", "en", "en-US", "de", "fr-CH"])
_dt = st.sampled_from([
    "", vocab.XSD_STRING, vocab.XSD + "integer", vocab.XSD + "decimal",
    vocab.XSD + "boolean", vocab.XSD + "dateTime",
])


@st.composite
def _term(draw, allow_literal=True):
    kind = draw(st.integers(0, 2 if allow_literal else 1))
    if kind == 0:
        return iri(draw(_iri))
    if kind == 1:
        return bnode(draw(_bnode_label))
    lang = draw(_lang)
    if lang:
        return literal(draw(_lit_text), lang=lang)
    return literal(draw(_lit_text), datatype=draw(_dt))


_graph = st.lists(
    st.builds(
        Triple,
        _term(allow_literal=False),
        _iri,
        _term(),
    ),
    max_size=25,
).map(Graph)


def canon(g: Graph) -> set:
    return {(t.s.n3(), t.p, t.o.n3()) for t in g}


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_graph, st.sampled_from(["ttl", "nt", "nq", "trig", "rdf", "jsonld"]))
def test_serialize_parse_roundtrip(g, fmt):
    text = serialize_graph(g, fmt)
    assert canon(parse_rdf(text, fmt)) == canon(g)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(_graph)
def test_table_lane_ntriples_matches_driver_bytes(spark, g):
    """The codegen'd TRIPLES_TYPE serializer
    (rdf/serialize.ntriples_lines_terms — the CLI export lane) emits
    byte-for-byte the driver serializer's Term.n3 lines for ARBITRARY
    generated terms: every kind, lang tags, datatypes, and the full
    escaping corner set (quotes, backslashes, newlines, tabs,
    non-ASCII). Unordered multiset compare — the table lane does not
    sort by contract."""
    from collections import Counter

    from shacl_rust_spark.rdf.serialize import (
        ntriples_lines_terms, to_ntriples,
    )
    from shacl_rust_spark.schema import graph_to_df

    want = Counter(ln for ln in to_ntriples(g).splitlines() if ln)
    if not len(g):
        return
    got = Counter(
        r.line for r in ntriples_lines_terms(
            graph_to_df(spark, g)).collect()
    )
    assert got == want
