"""CLI parse/info subcommands and the lint string endpoints.

Mirrors the reference's non-validate surfaces: `shacl-validator parse`
(crates/shacl-cli/src/main.rs:110-116,150-252), `shacl-validator info`
(main.rs:139-145; ShapesInfo at src/core/shape.rs:311-377), and the
WASM lint endpoints (crates/shacl-wasm/src/lib.rs:79-94). All
driver-side — no Spark fixture needed.
"""

import json

import pytest

from shacl_rust_spark.cli import main as cli_main
from shacl_rust_spark.engine import lint_data_text, lint_shapes_text
from shacl_rust_spark.rdf.turtle import TurtleParseError

SHAPES_TTL = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:PersonShape a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:name "Person shape" ;
  sh:message "person must be valid" ;
  sh:closed true ; sh:ignoredProperties ( ex:meta ) ;
  sh:property [ sh:path ex:age ; sh:minCount 1 ; sh:minInclusive 0 ;
                sh:pattern "^[0-9]+$" ; sh:flags "i" ] .
ex:Deact a sh:NodeShape ; sh:deactivated true ;
  sh:targetNode ex:nobody ;
  sh:in ( ex:a "x" ) .
"""


@pytest.fixture(scope="module")
def shapes_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "shapes.ttl"
    p.write_text(SHAPES_TTL)
    return str(p)


def test_parse_json(shapes_file, capsys):
    assert cli_main(["parse", shapes_file, "--output", "json"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["count"] == 2
    by_node = {s["node"]: s for s in out["shapes"]}
    person = by_node["<http://example.org/PersonShape>"]
    assert person["name"] == "Person shape"
    assert person["targets"] == [
        "sh:targetClass <http://example.org/Person>"
    ]
    # reference quirk: a Turtle-list ignoredProperties is a bnode head,
    # which parse treats as empty (parser/mod.rs:224-228)
    assert person["closed"] == "Closed Constraint"
    assert person["messages"] == ["person must be valid"]
    deact = by_node["<http://example.org/Deact>"]
    assert deact["deactivated"] is True
    assert any(c.startswith("sh:in (") for c in deact["constraints"])


def test_parse_pretty_and_compact(shapes_file, capsys):
    assert cli_main(["parse", shapes_file]) == 0
    pretty = capsys.readouterr().out
    assert "Parsed 2 SHACL Shape(s)" in pretty
    assert "NodeShape <<http://example.org/PersonShape>> (Person shape)" in pretty
    assert "[DEACTIVATED]" in pretty
    assert "PropertyShape" in pretty  # nested property shape rendered
    assert "sh:minCount 1" in pretty
    assert 'sh:pattern "^[0-9]+$" flags: i' in pretty

    assert cli_main(["parse", shapes_file, "-o", "compact"]) == 0
    compact = capsys.readouterr().out
    assert "Parsed 2 shape(s):" in compact
    assert "- 1 target(s), 0 constraint(s)" in compact  # PersonShape

    assert cli_main(["parse", shapes_file, "-o", "nope"]) == 2


def test_info(shapes_file, capsys):
    assert cli_main(["info", shapes_file]) == 0
    out = capsys.readouterr().out
    assert "SHACL Shapes Information" in out
    assert "Total shapes: 2" in out
    assert "Active: 1" in out
    assert "Deactivated: 1" in out

    assert cli_main(["info", shapes_file, "--detailed"]) == 0
    out = capsys.readouterr().out
    assert "Detailed Shape Information:" in out
    assert "Status: DEACTIVATED" in out
    assert "- sh:targetNode <http://example.org/nobody>" in out


def test_lint_endpoints():
    lint_data_text("<http://e/a> <http://e/p> <http://e/b> .", "nt")
    lint_shapes_text(SHAPES_TTL)
    with pytest.raises(TurtleParseError):
        lint_data_text("@prefix broken", "ttl")
    with pytest.raises(TurtleParseError):
        lint_shapes_text("not turtle at all ;;;", "ttl")


DATA_FOR_INDUCE = """
@prefix ex: <http://example.org/> .
ex:a ex:name "Alice" .
ex:b ex:name "Bob" .
ex:a ex:knows ex:b .
ex:a ex:knows ex:c .
ex:b ex:knows ex:a .
ex:a ex:status "active"@en .
ex:b ex:status "inactive"@en .
"""


def test_induce_emits_conservative_shapes(tmp_path, capsys):
    data = tmp_path / "data.ttl"
    data.write_text(DATA_FOR_INDUCE)
    out = tmp_path / "shapes.ttl"
    rc = cli_main(["induce", str(data), "-o", str(out)])
    assert rc == 0
    ttl = out.read_text()
    # name is functional -> maxCount 1; knows is multi-valued + all-IRI
    assert 'sh:maxCount "1"' in ttl
    assert "sh:nodeKind sh:IRI" in ttl
    # lang-tagged literal enum survives exactly
    assert '"active"@en' in ttl
    # the induced shapes parse back through the real parser
    from shacl_rust_spark.rdf import parse_rdf_file
    from shacl_rust_spark.shapes.parser import parse_shapes

    shapes = parse_shapes(parse_rdf_file(str(out), None))
    assert len(shapes) == 3


def test_induce_roundtrip_conforms(tmp_path, capsys):
    """Induced shapes are conservative by construction: validating the
    SOURCE data against them always conforms."""
    data = tmp_path / "data.ttl"
    data.write_text(DATA_FOR_INDUCE)
    out = tmp_path / "shapes.ttl"
    assert cli_main(["induce", str(data), "-o", str(out)]) == 0
    rc = cli_main(["validate", str(out), str(data), "--quiet"])
    capsys.readouterr()
    assert rc == 0
