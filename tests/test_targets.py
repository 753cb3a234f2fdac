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


def test_fused_table_scale_plan_matches_small_plan(spark):
    """Target-path fusion + distinct-value class check (ds.small=False)
    must produce exactly the violations of the reference-shaped small
    plan (engine/engine.py::_fusion_hint)."""
    from shacl_rust_spark.engine.dataset import Dataset
    from shacl_rust_spark.engine.engine import validate_dataset
    from shacl_rust_spark.rdf.turtle import parse_turtle
    from shacl_rust_spark.schema import graph_to_df

    shapes = parse_turtle("""
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:p ;
      sh:property [ sh:path ex:p ; sh:nodeKind sh:IRI ;
                    sh:class ex:T ; sh:maxCount 1 ; sh:minCount 1 ] .
    """)
    data = parse_turtle("""
    @prefix ex: <http://example.org/> .
    @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
    ex:a ex:p ex:b . ex:a ex:p ex:d .
    ex:b rdf:type ex:T .
    ex:c ex:p "lit" .
    ex:c ex:p ex:b .
    """)

    def run(small):
        ds = Dataset(spark, graph_to_df(spark, data), shapes, small=small)
        return sorted(
            (r.focus.value, r.component, r.value.value if r.value else None)
            for r in validate_dataset(ds).violations.collect()
        )

    small_plan, fused_plan = run(True), run(False)
    assert small_plan == fused_plan
    assert len(fused_plan) == 5


def test_fused_plan_duplicate_triples_set_semantics(spark):
    """A table-backed triples frame with duplicate (s,p,o) rows must not
    inflate fused min/max counts: with the default
    distinct_triples=False the validator dedups the fused pairs; the
    dup'd frame yields exactly the violations of the clean frame."""
    from shacl_rust_spark.engine.dataset import Dataset
    from shacl_rust_spark.engine.engine import validate_dataset
    from shacl_rust_spark.rdf.turtle import parse_turtle
    from shacl_rust_spark.schema import graph_to_df

    shapes = parse_turtle("""
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://example.org/> .
    ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:p ;
      sh:property [ sh:path ex:p ; sh:maxCount 1 ] .
    """)
    data = parse_turtle("""
    @prefix ex: <http://example.org/> .
    ex:a ex:p ex:b .
    ex:c ex:p ex:d . ex:c ex:p ex:e .
    """)

    def run(df):
        ds = Dataset(spark, df, shapes)  # distinct_triples defaults False
        return sorted(
            (r.focus.value, r.component)
            for r in validate_dataset(ds).violations.collect()
        )

    clean = graph_to_df(spark, data)
    duped = clean.unionByName(clean)  # every triple twice
    assert run(duped) == run(clean)
    # ex:a has ONE distinct value — duplicated rows must not trip maxCount
    assert run(duped) == [(
        "http://example.org/c",
        "http://www.w3.org/ns/shacl#MaxCountConstraintComponent",
    )]
