"""SHACL shape induction over the typed triples table — the authoring
inverse of the validator (engine/): instead of checking data against
declared shapes, derive candidate shapes FROM the data, then hand them
straight back to `validate`. The reference has no counterpart (it only
consumes shapes); this closes the loop a shapes author actually works
in: profile → draft → tighten → validate.

Induced shapes are CONSERVATIVE by construction — every suggestion is
an invariant the profiled data already satisfies (sh:minCount =
observed per-subject minimum, sh:maxCount only when the observed
maximum is 1, sh:nodeKind sh:IRI only when every object is an IRI,
sh:in only when the object domain is small) — so validating the source
data against its own induced shapes ALWAYS conforms
(tests/test_cli_inspect.py::test_induce_roundtrip_conforms pins this).

Spark side: the profile is two groupBys over the typed frame (one
shuffle on (p, s) for per-subject cardinalities, a predicate-keyed
rollup for the rest — same plan shape as ops/ontology.induce_shapes,
which is the string-table twin of this module); sh:in object domains
collect at most `in_threshold` terms per qualifying predicate
(bounded driver state)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..rdf.graph import Graph
from ..term import Term, Triple, bnode, iri, literal
from ..vocab import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    SH,
)

_IN_PREFIX = "urn:induced:shape:"


def profile_typed(triples: DataFrame, in_threshold: int = 10) -> DataFrame:
    """Per-predicate constraint profile over a TRIPLES_TYPE frame —
    exact term kinds (no lexical heuristics): (p, n_subjects,
    n_triples, min_card, max_card, n_iri_objects, n_distinct_objects,
    suggest_max_count, nodekind_iri, suggest_in)."""
    per_subj = triples.groupBy("p", "s").agg(
        F.count(F.lit(1)).alias("_card"))
    card = per_subj.groupBy("p").agg(
        F.count(F.lit(1)).alias("n_subjects"),
        F.sum("_card").alias("n_triples"),
        F.min("_card").alias("min_card"),
        F.max("_card").alias("max_card"),
    )
    objs = triples.groupBy("p").agg(
        F.sum(F.when(F.col("o.kind") == "iri", 1).otherwise(0))
        .cast("long").alias("n_iri_objects"),
        F.count_distinct("o").alias("n_distinct_objects"),
    )
    return (
        card.join(objs, "p")
        .withColumn("suggest_max_count",
                    (F.col("max_card") == 1).cast("int"))
        .withColumn("nodekind_iri",
                    (F.col("n_iri_objects")
                     == F.col("n_triples")).cast("int"))
        .withColumn("suggest_in",
                    (F.col("n_distinct_objects")
                     <= in_threshold).cast("int"))
    )


def _term(row) -> Term:
    return Term(row.kind, row.value, row.datatype, row.lang)


def induce_shapes_graph(
    triples: DataFrame, in_threshold: int = 10,
) -> Graph:
    """Build the induced shapes graph: one sh:NodeShape per predicate
    (sh:targetSubjectsOf p) with one property shape carrying the
    data-derived constraints. Deterministic shape IRIs
    (urn:induced:shape:<i> by predicate order) and deterministic
    sh:in list order (kind, value, datatype, lang) so the output is
    rerun-stable."""
    rows = sorted(profile_typed(triples, in_threshold).collect(),
                  key=lambda r: r.p)
    in_preds = [r.p for r in rows if r.suggest_in]
    in_objects: dict[str, list[Term]] = {}
    if in_preds:
        obj_rows = (
            triples.where(F.col("p").isin(in_preds))
            .select("p", "o").distinct().collect()
        )
        for r in obj_rows:
            in_objects.setdefault(r.p, []).append(_term(r.o))
        for p in in_objects:
            in_objects[p].sort()

    g = Graph()
    xsd_int = "http://www.w3.org/2001/XMLSchema#integer"
    for i, r in enumerate(rows):
        shape = iri(f"{_IN_PREFIX}{i}")
        prop = bnode(f"induced_prop_{i}")
        g.add(Triple(shape, RDF_TYPE, iri(SH + "NodeShape")))
        g.add(Triple(shape, SH + "targetSubjectsOf", iri(r.p)))
        g.add(Triple(shape, SH + "property", prop))
        g.add(Triple(prop, SH + "path", iri(r.p)))
        g.add(Triple(prop, SH + "minCount",
                     literal(str(r.min_card), datatype=xsd_int)))
        if r.suggest_max_count:
            g.add(Triple(prop, SH + "maxCount",
                         literal("1", datatype=xsd_int)))
        if r.nodekind_iri:
            g.add(Triple(prop, SH + "nodeKind", iri(SH + "IRI")))
        if r.suggest_in:
            terms = in_objects.get(r.p, [])
            head: Term = iri(RDF_NIL)
            for j in range(len(terms) - 1, -1, -1):
                cell = bnode(f"induced_in_{i}_{j}")
                g.add(Triple(cell, RDF_FIRST, terms[j]))
                g.add(Triple(cell, RDF_REST, head))
                head = cell
            g.add(Triple(prop, SH + "in", head))
    return g
