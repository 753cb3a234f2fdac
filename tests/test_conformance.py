"""Conformance suite: conforms-boolean parity with the reference
(/root/reference/tests/conformance.rs) over its own test corpus."""

from __future__ import annotations

import pytest

from shacl_rust_spark.engine import validate_graphs
from shacl_rust_spark.rdf import parse_turtle_file

from .conformance_util import load_test_cases

CASES = load_test_cases()


def _case_id(case) -> str:
    f = case.data_graph_file
    return f.split("resources/")[-1].replace("/", "_").removesuffix(".ttl")


@pytest.mark.parametrize("case", CASES, ids=_case_id)
def test_conformance(spark, case):
    try:
        data = parse_turtle_file(case.data_graph_file)
        shapes = parse_turtle_file(case.shapes_graph_file)
        report = validate_graphs(spark, data, shapes)
        conforms = report.conforms
    except Exception as exc:  # noqa: BLE001 — sht:Failure passes on errors
        if case.expected_conforms is None:
            return
        raise AssertionError(f"unexpected error: {exc}") from exc
    if case.expected_conforms is None:
        # sht:Failure also passes when validation reports non-conformance
        # (conformance.rs:499-515)
        assert not conforms, "expected failure, got conforms=true"
    else:
        assert conforms == case.expected_conforms, (
            f"expected conforms={case.expected_conforms}, got {conforms}"
        )


def test_corpus_size():
    assert len(CASES) >= 100, f"manifest walker found only {len(CASES)} cases"
