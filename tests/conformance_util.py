"""Manifest walker for the reference's conformance corpus.

Python mirror of /root/reference/tests/conformance.rs:120-345 — walks
manifest.ttl files (mf:include / mf:entries), collects sht:Validate
cases with mf:status sht:approved, resolves dataGraph/shapesGraph file
references, and records the expected outcome (conforms boolean or
sht:Failure).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from shacl_rust_spark.rdf import parse_turtle_file
from shacl_rust_spark.rdf.graph import Graph
from shacl_rust_spark.term import Term
from shacl_rust_spark import vocab as V

MF_MANIFEST = V.MF + "Manifest"
MF_INCLUDE = V.MF + "include"
MF_ENTRIES = V.MF + "entries"
MF_ACTION = V.MF + "action"
MF_RESULT = V.MF + "result"
MF_STATUS = V.MF + "status"
SHT_VALIDATE = V.SHT + "Validate"
SHT_APPROVED = V.SHT + "approved"
SHT_FAILURE = V.SHT + "Failure"
SHT_DATA_GRAPH = V.SHT + "dataGraph"
SHT_SHAPES_GRAPH = V.SHT + "shapesGraph"

# Vendored copy of the reference's conformance corpus (test fixtures from
# /root/reference/tests/resources) so the suite is self-contained.
ROOT_MANIFEST = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "resources", "manifest.ttl"
)


@dataclass
class TestCase:
    uri: str
    label: str | None
    data_graph_file: str
    shapes_graph_file: str
    expected_conforms: bool | None  # None => sht:Failure expected


def _resolve_graph_file(base_file: str, ref: Term) -> str | None:
    """conformance.rs:121-160."""
    if not ref.is_iri:
        return None
    uri = ref.value
    if uri.startswith("file://"):
        path = uri[len("file://"):]
        if os.path.exists(path):
            return path
    if uri == "":
        return base_file
    base_dir = os.path.dirname(base_file)
    rel = os.path.join(base_dir, uri)
    if os.path.exists(rel):
        return rel
    candidate = os.path.join(base_dir, uri.rsplit("/", 1)[-1])
    if os.path.exists(candidate):
        return candidate
    return None


def _parse_test_case(graph: Graph, test_node: Term, base_file: str) -> TestCase | None:
    if not test_node.is_node:
        return None
    types = graph.objects(test_node, V.RDF_TYPE)
    if not any(t.is_iri and t.value == SHT_VALIDATE for t in types):
        return None
    statuses = graph.objects(test_node, MF_STATUS)
    if not any(t.is_iri and t.value == SHT_APPROVED for t in statuses):
        return None
    label_t = graph.object(test_node, V.RDFS_LABEL)
    label = label_t.value if label_t is not None and label_t.is_literal else None
    action = graph.object(test_node, MF_ACTION)
    if action is None or not action.is_bnode:
        return None
    data_ref = graph.object(action, SHT_DATA_GRAPH)
    shapes_ref = graph.object(action, SHT_SHAPES_GRAPH)
    if data_ref is None or shapes_ref is None:
        return None
    data_file = _resolve_graph_file(base_file, data_ref)
    shapes_file = _resolve_graph_file(base_file, shapes_ref)
    if data_file is None or shapes_file is None:
        return None
    result = graph.object(test_node, MF_RESULT)
    if result is None:
        return None
    if result.is_iri and result.value == SHT_FAILURE:
        expected: bool | None = None
    elif result.is_bnode:
        rtypes = graph.objects(result, V.RDF_TYPE)
        if not any(t.is_iri and t.value == V.SH_VALIDATION_REPORT for t in rtypes):
            return None
        conf = graph.object(result, V.SH_CONFORMS)
        if conf is None or not conf.is_literal:
            return None
        expected = conf.value == "true"
    else:
        return None
    return TestCase(
        uri=test_node.n3(),
        label=label,
        data_graph_file=data_file,
        shapes_graph_file=shapes_file,
        expected_conforms=expected,
    )


def load_test_cases(manifest_file: str = ROOT_MANIFEST) -> list[TestCase]:
    cases: list[TestCase] = []
    visited: set[str] = set()
    _collect(manifest_file, cases, visited)
    return cases


def _collect(manifest_file: str, cases: list[TestCase], visited: set[str]) -> None:
    path = os.path.abspath(manifest_file)
    if path in visited:
        return
    visited.add(path)
    try:
        graph = parse_turtle_file(path)
    except Exception:
        return
    manifest_type = Term("iri", MF_MANIFEST)
    for mnode in graph.subjects(V.RDF_TYPE, manifest_type):
        for inc in graph.objects(mnode, MF_INCLUDE):
            f = _resolve_graph_file(path, inc)
            if f is not None and os.path.exists(f):
                _collect(f, cases, visited)
        for entries in graph.objects(mnode, MF_ENTRIES):
            if not entries.is_bnode:
                continue
            for entry in graph.parse_rdf_list(entries):
                tc = _parse_test_case(graph, entry, path)
                if tc is not None:
                    cases.append(tc)
