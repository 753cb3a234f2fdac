"""Target resolution unit tests — mirrors /root/reference/tests/target.rs."""

import pytest

from shacl_rust_spark.engine.dataset import Dataset
from shacl_rust_spark.engine.targets import resolve_target
from shacl_rust_spark.rdf import parse_turtle
from shacl_rust_spark.shapes.ir import Target
from shacl_rust_spark.term import Term, iri, literal

EX = "http://example.org/"

GRAPH = f"""
@prefix ex: <{EX}> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
ex:Student rdfs:subClassOf ex:Person .
ex:Alice a ex:Person .
ex:Bob a ex:Student .
ex:Carol ex:worksAt ex:CompanyX .
ex:Dave ex:manages ex:Carol .
ex:manages rdfs:subPropertyOf ex:worksAt .
ex:Eve ex:worksAt "home" .
"""


@pytest.fixture(scope="module")
def ds(spark):
    return Dataset.from_graphs(spark, parse_turtle(GRAPH), parse_turtle(""))


def _vals(df):
    return {Term(*r.focus).value for r in df.collect()}


def test_target_node(ds):
    got = _vals(resolve_target(ds, Target("node", literal("42"))))
    assert got == {"42"}


def test_target_class_with_subclass_closure(ds):
    got = _vals(resolve_target(ds, Target("class", iri(EX + "Person"))))
    assert got == {EX + "Alice", EX + "Bob"}


def test_target_subjects_of_with_subproperty(ds):
    got = _vals(resolve_target(ds, Target("subjectsOf", iri(EX + "worksAt"))))
    assert got == {EX + "Carol", EX + "Dave", EX + "Eve"}


def test_target_objects_of_excludes_literals(ds):
    got = _vals(resolve_target(ds, Target("objectsOf", iri(EX + "worksAt"))))
    assert got == {EX + "CompanyX", EX + "Carol"}


def test_advanced_target_resolves_empty(ds):
    got = _vals(resolve_target(ds, Target("advanced", iri(EX + "t"))))
    assert got == set()
