"""JSON-lines tool server — the MCP front-end analog
(/root/reference/crates/shacl-mcp/src/main.rs: four tools with the
same names, argument names, and result payloads)."""

import json

import pytest

from shacl_rust_spark.server import ToolServer

DATA = """
@prefix ex: <http://example.org/> .
ex:a a ex:T ; ex:p "x" .
"""
SHAPES = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:S a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:p ; sh:minCount 2 ] .
"""


@pytest.fixture(scope="module")
def server(spark):
    return ToolServer(spark=spark)


def test_validate_graphs_conforms(server):
    res = server.handle_request({
        "id": 1, "tool": "validate_graphs_conforms",
        "args": {"data_graph": DATA, "shapes_graph": SHAPES},
    })
    assert res["ok"] and json.loads(res["result"]) == {"conforms": False}


def test_validate_graphs_json_and_rdf(server):
    res = server.handle_request({
        "id": 2, "tool": "validate_graphs",
        "args": {"data_graph": DATA, "shapes_graph": SHAPES,
                 "output_format": "json"},
    })
    rep = json.loads(res["result"])
    assert rep["conforms"] is False and len(rep["results"]) == 1

    res = server.handle_request({
        "id": 3, "tool": "validate_graphs",
        "args": {"data_graph": DATA, "shapes_graph": SHAPES,
                 "output_format": "ttl"},
    })
    assert res["ok"] and "sh:ValidationReport" in res["result"]

    res = server.handle_request({
        "id": 4, "tool": "validate_graphs",
        "args": {"data_graph": DATA, "shapes_graph": SHAPES,
                 "output_format": "bogus"},
    })
    assert not res["ok"] and "Unsupported output format" in res["error"]


def test_lint_and_parse_tools(server):
    ok = server.handle_request({
        "id": 5, "tool": "lint_graph",
        "args": {"graph": "<http://e/a> <http://e/p> <http://e/o> .",
                 "format": "nt"},
    })
    assert ok["ok"] and json.loads(ok["result"]) == {"valid": True}

    bad = server.handle_request({
        "id": 6, "tool": "lint_graph", "args": {"graph": "@prefix oops"},
    })
    assert not bad["ok"] and bad["error"].startswith("Graph syntax error:")

    info = server.handle_request({
        "id": 7, "tool": "parse_shapes_graph",
        "args": {"shapes_graph": SHAPES},
    })
    assert info["ok"] and "Total shapes: 1" in info["result"]
    assert "Detailed Shape Information:" in info["result"]


def test_protocol_errors_and_serve(server):
    unknown = server.handle_request({"id": 8, "tool": "nope"})
    assert not unknown["ok"] and "Unknown tool" in unknown["error"]

    missing = server.handle_request({"id": 9, "tool": "lint_graph",
                                     "args": {"wrong": 1}})
    assert not missing["ok"] and "Bad arguments" in missing["error"]

    out: list[str] = []
    server.serve(
        ["not json", "", json.dumps({
            "id": 10, "tool": "lint_graph",
            "args": {"graph": "<http://e/a> <http://e/p> <http://e/o> .",
                     "format": "nt"}})],
        out.append,
    )
    first, second = (json.loads(line) for line in out)
    assert first["ok"] is False and "Bad request JSON" in first["error"]
    assert second["ok"] is True and second["id"] == 10
