"""Conformance suite: conforms-boolean parity with the reference
(/root/reference/tests/conformance.rs) over its own test corpus.

The 121 manifest cases run CONCURRENTLY on the shared SparkSession
(Spark job submission is thread-safe; the scheduler interleaves the
per-case jobs) — per-case Spark fixed costs dominate at fixture scale,
so an 8-way pool cuts suite wall-clock ~6×. Set CONFORMANCE_SEQ=1 for
the sequential parametrized mode when debugging a single case:

    CONFORMANCE_SEQ=1 python -m pytest \
        'tests/test_conformance.py::test_conformance_case[core_node_and-001]'
"""

from __future__ import annotations

import os
import traceback
from concurrent.futures import ThreadPoolExecutor

import pytest

from shacl_rust_spark.engine import validate_graphs
from shacl_rust_spark.rdf import parse_turtle_file

from .conformance_util import load_test_cases

CASES = load_test_cases()
SEQUENTIAL = os.environ.get("CONFORMANCE_SEQ") == "1"


def _case_id(case) -> str:
    f = case.data_graph_file
    return f.split("resources/")[-1].replace("/", "_").removesuffix(".ttl")


def _run_case(spark, case) -> str | None:
    """Returns an error description, or None if the case passes."""
    try:
        data = parse_turtle_file(case.data_graph_file)
        shapes = parse_turtle_file(case.shapes_graph_file)
        report = validate_graphs(spark, data, shapes)
        conforms = report.conforms
    except Exception:  # noqa: BLE001 — sht:Failure passes on errors
        if case.expected_conforms is None:
            return None
        return f"unexpected error:\n{traceback.format_exc()}"
    if case.expected_conforms is None:
        # sht:Failure also passes when validation reports non-conformance
        # (conformance.rs:499-515)
        if conforms:
            return "expected failure, got conforms=true"
        return None
    if conforms != case.expected_conforms:
        return f"expected conforms={case.expected_conforms}, got {conforms}"
    return None


@pytest.mark.skipif(SEQUENTIAL, reason="sequential mode")
def test_conformance_corpus(spark):
    with ThreadPoolExecutor(max_workers=8) as pool:
        errors = list(pool.map(lambda c: (_case_id(c), _run_case(spark, c)), CASES))
    failures = [f"{cid}: {err}" for cid, err in errors if err is not None]
    assert not failures, (
        f"{len(failures)}/{len(CASES)} conformance cases failed:\n"
        + "\n".join(failures)
    )


@pytest.mark.skipif(not SEQUENTIAL, reason="set CONFORMANCE_SEQ=1 to enable")
@pytest.mark.parametrize("case", CASES, ids=_case_id)
def test_conformance_case(spark, case):
    err = _run_case(spark, case)
    assert err is None, err


def test_corpus_size():
    assert len(CASES) >= 100, f"manifest walker found only {len(CASES)} cases"
