"""Driver-gate SHACL queries: each runs the REAL validator engine over
triples unpivoted from the star-schema tables (tabular.py) and projects
violations to a flat, oracle-comparable schema (strings/longs only — no
floating-point columns, so the DuckDB value-hash can never drift).

Each function here has a matching ANSI-SQL twin in __spark_entry__.py's
oracle_sql(); the pair is the correctness gate for the §2 operator it
exercises. Reference parity citations are on the shapes, e.g. sh:minCount
semantics ← /root/reference/src/validation/constraints/min_count.rs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .engine.dataset import Dataset
from .engine.engine import validate_dataset
from .rdf.turtle import parse_turtle
from . import tabular as T

PREFIXES = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
"""


def _validate(spark: SparkSession, triples: DataFrame, shapes_ttl: str) -> DataFrame:
    # tabular.py builders derive each (s, p, o) from one source row of a
    # primary-key table (no joins that could fan out), so the triples
    # frame is a set — assert it and skip the defensive fused-pair dedup
    ds = Dataset(
        spark, triples, parse_turtle(PREFIXES + shapes_ttl),
        distinct_triples=True,
    )
    return validate_dataset(ds).violations


def _focus_only(v: DataFrame) -> DataFrame:
    return v.select(F.col("focus.value").alias("focus"))


# --- counting constraints -------------------------------------------------

def shacl_min_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with fewer than 5 orders (inverse-path minCount;
    min_count.rs:19-31 — zero-order focus nodes must still violate)."""
    shapes = """
    ex:CustOrders a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:property [ sh:path [ sh:inversePath ex:customer ] ; sh:minCount 5 ] .
    """
    t = T.customer_triples(spark, sf_dir).unionByName(T.order_triples(spark, sf_dir))
    return _focus_only(_validate(spark, t, shapes))


def shacl_max_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations referenced by more than 50 customers (max_count.rs:19-31)."""
    shapes = """
    ex:NationPopularity a sh:NodeShape ;
      sh:targetClass ex:Nation ;
      sh:property [ sh:path [ sh:inversePath ex:nation ] ; sh:maxCount 50 ] .
    """
    t = T.customer_triples(spark, sf_dir).unionByName(T.nation_triples(spark, sf_dir))
    return _focus_only(_validate(spark, t, shapes))


# --- value constraints ----------------------------------------------------

def shacl_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose ex:nation value has no DIRECT rdf:type ex:Nation
    (nations in region 0 are untyped by construction; class.rs:20-51)."""
    shapes = """
    ex:CustNation a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:property [ sh:path ex:nation ; sh:class ex:Nation ] .
    """
    t = T.customer_triples(spark, sf_dir).unionByName(T.nation_triples(spark, sf_dir))
    v = _validate(spark, t, shapes)
    return v.select(
        F.col("focus.value").alias("focus"), F.col("value.value").alias("bad_nation")
    )


def shacl_min_inclusive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with negative account balance (f64-else-string compare,
    utils.rs:396-433 → engine/compare.py)."""
    shapes = """
    ex:Balance a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:property [ sh:path ex:acctbal ; sh:minInclusive 0 ] .
    """
    return _focus_only(_validate(spark, T.customer_triples(spark, sf_dir), shapes))


def shacl_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer names NOT ending in an even digit (pattern.rs:12-61)."""
    shapes = """
    ex:NamePattern a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:property [ sh:path ex:name ; sh:pattern "^Customer#[0-9]*[02468]$" ] .
    """
    return _focus_only(_validate(spark, T.customer_triples(spark, sf_dir), shapes))


def shacl_max_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market segments longer than 8 BYTES (min_length.rs byte-length
    quirk → octet_length)."""
    shapes = """
    ex:SegLen a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:property [ sh:path ex:mktsegment ; sh:maxLength 8 ] .
    """
    v = _validate(spark, T.customer_triples(spark, sf_dir), shapes)
    return v.select(
        F.col("focus.value").alias("focus"), F.col("value.value").alias("segment")
    )


def shacl_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segments outside the allowed list (sh_in.rs:20-34)."""
    shapes = """
    ex:SegIn a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:property [ sh:path ex:mktsegment ;
                    sh:in ( "BUILDING" "AUTOMOBILE" "MACHINERY" ) ] .
    """
    v = _validate(spark, T.customer_triples(spark, sf_dir), shapes)
    return v.select(
        F.col("focus.value").alias("focus"), F.col("value.value").alias("segment")
    )


def shacl_has_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose status set lacks 'O' (has_value.rs:19-28)."""
    shapes = """
    ex:OpenOrder a sh:NodeShape ;
      sh:targetClass ex:Order ;
      sh:property [ sh:path ex:status ; sh:hasValue "O" ] .
    """
    return _focus_only(_validate(spark, T.order_triples(spark, sf_dir), shapes))


def shacl_unique_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate language tags per source, one violation per occurrence
    after the first-seen (unique_lang.rs:20-45; order = literal value)."""
    shapes = """
    ex:SrcLang a sh:NodeShape ;
      sh:targetClass ex:Source ;
      sh:property [ sh:path ex:text ; sh:uniqueLang true ] .
    """
    v = _validate(spark, T.document_lang_triples(spark, sf_dir), shapes)
    return v.select(
        F.col("focus.value").alias("focus"), F.col("value.lang").alias("lang")
    )


def shacl_closed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undeclared ex:clerk triples on every 10th order
    (validation/mod.rs:354-398)."""
    shapes = """
    ex:OrderClosed a sh:NodeShape ;
      sh:targetClass ex:Order ;
      sh:closed true ;
      sh:property [ sh:path rdf:type ] ;
      sh:property [ sh:path ex:customer ] ;
      sh:property [ sh:path ex:status ] ;
      sh:property [ sh:path ex:totalprice ] .
    """
    # NB: sh:ignoredProperties with a Turtle list is a BLANK node head,
    # which the reference treats as empty (parser/mod.rs:224-228 quirk);
    # rdf:type is therefore allowed via an explicit property path.
    v = _validate(spark, T.order_triples(spark, sf_dir), shapes)
    return v.select(
        F.col("focus.value").alias("focus"), F.col("value.value").alias("clerk")
    )


def shacl_less_than(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems where discount is NOT < tax (ANY-semantics,
    less_than.rs:38-45; single-valued here so plain <)."""
    shapes = """
    ex:LineCmp a sh:NodeShape ;
      sh:targetClass ex:Line ;
      sh:property [ sh:path ex:discount ; sh:lessThan ex:tax ] .
    """
    return _focus_only(
        _validate(spark, T.lineitem_pair_triples(spark, sf_dir), shapes)
    )


def shacl_logical_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers that neither have non-negative balance nor are in the
    BUILDING segment (sh_or.rs:20-57)."""
    shapes = """
    ex:OrShape a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:or ( [ sh:property [ sh:path ex:acctbal ; sh:minInclusive 0 ] ]
              [ sh:property [ sh:path ex:mktsegment ; sh:hasValue "BUILDING" ] ] ) .
    """
    return _focus_only(_validate(spark, T.customer_triples(spark, sf_dir), shapes))


def shacl_qualified_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with fewer than 3 orders of totalprice ≥ 250000
    (qualified_value_shape.rs:20-66)."""
    shapes = """
    ex:BigSpender a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:property [
        sh:path [ sh:inversePath ex:customer ] ;
        sh:qualifiedValueShape [
          sh:property [ sh:path ex:totalprice ; sh:minInclusive 250000 ] ] ;
        sh:qualifiedMinCount 3 ] .
    """
    t = T.customer_triples(spark, sf_dir).unionByName(T.order_triples(spark, sf_dir))
    return _focus_only(_validate(spark, t, shapes))


def shacl_path_kleene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations that cannot reach ex:world via ex:partOf+ (only odd-keyed
    regions link to world; Kleene fixpoint, path.rs:156-172)."""
    shapes = """
    ex:WorldReach a sh:NodeShape ;
      sh:targetClass ex:Nation ;
      sh:property [ sh:path [ sh:oneOrMorePath ex:partOf ] ;
                    sh:hasValue ex:world ] .
    """
    return _focus_only(_validate(spark, T.nation_triples(spark, sf_dir), shapes))


def shacl_path_kleene_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleene closure through the DISTRIBUTED checkpointed-frontier
    fixpoint (paths.py:_kleene_closure loop): the ex:next edge set
    (tabular.chain_triples) exceeds Dataset._MAX_KLEENE_EDGES at
    sf ≥ 0.01, so kleene_pairs returns None and the scale path runs —
    the memoized broadcast fast path (shacl_path_kleene) never fires.
    Violations: chain heads reaching more than 4 nodes via ex:next+
    (per-order lineitem chains longer than 4; path.rs:141-171 BFS
    semantics, start node excluded)."""
    shapes = """
    ex:ChainShape a sh:NodeShape ;
      sh:targetClass ex:Head ;
      sh:property [ sh:path [ sh:oneOrMorePath ex:next ] ; sh:maxCount 4 ] .
    """
    return _focus_only(_validate(spark, T.chain_triples(spark, sf_dir), shapes))


def shacl_report_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Report assembly over the full graph + a combined shape set:
    violation counts per constraint component (report.rs:80-97)."""
    shapes = """
    ex:CustShape a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:property [ sh:path ex:acctbal ; sh:minInclusive 0 ] ;
      sh:property [ sh:path ex:mktsegment ; sh:maxLength 8 ] ;
      sh:property [ sh:path ex:nation ; sh:class ex:Nation ] .
    ex:OrderShape a sh:NodeShape ;
      sh:targetClass ex:Order ;
      sh:property [ sh:path ex:status ; sh:hasValue "O" ] .
    """
    t = T.customer_triples(spark, sf_dir).unionByName(
        T.order_triples(spark, sf_dir)
    ).unionByName(T.nation_triples(spark, sf_dir))
    v = _validate(spark, t, shapes)
    return (
        v.groupBy(F.col("component"))
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )


# === batch 2: remaining SURVEY §2 operator coverage =======================

def shacl_sparql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:sparql SELECT constraint through the set-oriented rewriter
    (engine/sparql.py; reference sparql.rs:133-397): one violation per
    solution row."""
    shapes = '''
    ex:SparqlShape a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:sparql [
        sh:select """
          SELECT $this ?v WHERE {
            $this <http://example.org/acctbal> ?v .
            FILTER (?v < 0)
          }
        """ ] .
    '''
    return _focus_only(_validate(spark, T.customer_triples(spark, sf_dir), shapes))


def shacl_sparql_optional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:sparql with OPTIONAL + !bound (engine/sparql.py LeftJoin
    rewrite): customers with no clerk-bearing order — the OPTIONAL
    block's vars stay null for them, so the filter keeps the row."""
    shapes = '''
    ex:OptShape a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:sparql [
        sh:select """
          SELECT $this WHERE {
            $this <http://example.org/name> ?nm .
            OPTIONAL {
              ?o <http://example.org/customer> $this .
              ?o <http://example.org/clerk> ?c .
            }
            FILTER(!bound(?c))
          }
        """ ] .
    '''
    t = T.customer_triples(spark, sf_dir).unionByName(T.order_triples(spark, sf_dir))
    return _focus_only(_validate(spark, t, shapes))


def shacl_sparql_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:sparql with a oneOrMore property path in the query (spec
    Kleene semantics, engine/sparql.py _path_closure): nations whose
    region carries the planted partOf edge reach ex:world."""
    shapes = '''
    ex:PathShape a sh:NodeShape ;
      sh:targetClass ex:Nation ;
      sh:sparql [
        sh:select """
          SELECT $this WHERE {
            $this (<http://example.org/partOf>)+ <http://example.org/world> .
          }
        """ ] .
    '''
    return _focus_only(_validate(spark, T.nation_triples(spark, sf_dir), shapes))


def shacl_sparql_nps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:sparql with a negated property set (SPARQL 1.1 §18.4; the
    reference runs these through oxigraph's full path evaluator,
    sparql.rs:217-232; engine/sparql.py PNeg = predicate-NOT-IN-filtered
    scan). A nation's only non-(rdf:type|ex:name) edge is ex:partOf, so
    !(a|ex:name) reaches its region; nations whose region's name starts
    with "A" violate."""
    shapes = '''
    ex:NpsShape a sh:NodeShape ;
      sh:targetClass ex:Nation ;
      sh:sparql [
        sh:select """
          SELECT $this WHERE {
            $this !(a|<http://example.org/name>) ?r .
            ?r <http://example.org/name> ?rn .
            FILTER(STRSTARTS(?rn, "A"))
          }
        """ ] .
    '''
    return _focus_only(_validate(spark, T.nation_triples(spark, sf_dir), shapes))


def shacl_sparql_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:sparql with aggregation + HAVING through the set-oriented
    rewriter: customers whose open-order ("O") count is at least 5,
    plus the COUNT itself projected out. Exercises the per-pre-binding
    GROUP BY semantics (reference evaluates once per focus,
    sparql.rs:156-169) and the COUNT path of _apply_modifiers."""
    shapes = '''
    ex:AggShape a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:sparql [
        sh:select """
          SELECT $this (COUNT(?o) AS ?n) WHERE {
            ?o <http://example.org/customer> $this .
            ?o <http://example.org/status> "O" .
          }
          HAVING (COUNT(?o) >= 5)
        """ ;
      ] .
    '''
    t = T.customer_triples(spark, sf_dir).unionByName(
        T.order_triples(spark, sf_dir)
    )
    return _focus_only(_validate(spark, t, shapes))


def shacl_sparql_message(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:sparql message templates: {?var}/{$var} substitute per
    solution (apply_message_bindings, sparql.rs:106-131) — IRIs lose
    their angle brackets, literals keep their quoted N3 form, unknown
    vars keep the placeholder text."""
    shapes = '''
    ex:MsgShape a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:sparql [
        sh:message "segment {?seg} of {$this} flagged ({?nope})" ;
        sh:select """
          SELECT $this ?seg WHERE {
            $this <http://example.org/mktsegment> ?seg .
            FILTER (?seg = "BUILDING")
          }
        """ ] .
    '''
    v = _validate(spark, T.customer_triples(spark, sf_dir), shapes)
    return v.select(F.col("focus.value").alias("focus"), "message")


def shacl_sparql_shapes_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:sparql with a property path inside GRAPH $shapesGraph — the
    component-library introspection idiom the reference evaluates via
    oxigraph's full dataset support (sparql.rs:217-232, shapes graph
    registered under urn:shacl:shapes-graph per dataset.rs:10): walk
    sh:property/sh:path over the SHAPES graph to enumerate the shape's
    declared predicates, then flag focus nodes missing any of them in
    the DATA graph (FILTER NOT EXISTS). Focus = subjects of ex:partOf
    (all nations + odd-keyed regions); ex:motto is declared but absent
    everywhere, rdf:type is absent for region-0 nations."""
    shapes = '''
    ex:DeclShape a sh:NodeShape ;
      sh:targetSubjectsOf ex:partOf ;
      sh:property [ sh:path rdf:type ] ;
      sh:property [ sh:path ex:name ] ;
      sh:property [ sh:path ex:motto ] ;
      sh:sparql [
        sh:message "missing {?prop}" ;
        sh:select """
          PREFIX sh: <http://www.w3.org/ns/shacl#>
          SELECT $this ?prop WHERE {
            GRAPH $shapesGraph { $currentShape sh:property/sh:path ?prop . }
            FILTER NOT EXISTS { $this ?prop ?v . }
          }
        """ ] .
    '''
    v = _validate(spark, T.nation_triples(spark, sf_dir), shapes)
    return v.where(F.col("component").contains("SPARQLConstraintComponent")) \
        .select(F.col("focus.value").alias("focus"), "message")


def shacl_sparql_exists_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:sparql with [NOT] EXISTS beyond FILTER: correlated inside
    HAVING over the grouped per-focus run, and projected as a
    ``(EXISTS {...} AS ?var)`` xsd:boolean observable through the
    message template. The reference evaluates these positions via
    oxigraph's full SPARQL engine (sparql.rs:217-232); the rewriter
    resolves each subpattern to a boolean mark column first
    (_apply_modifiers), so the expression tree evaluates over marks.

    Flags customers with >= 4 finished ("F") orders whose market
    segment is not MACHINERY; the message carries the order count and
    whether the segment is BUILDING."""
    shapes = '''
    ex:ExistsAggShape a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:sparql [
        sh:message "n={?n} building={?bldg}" ;
        sh:select """
          SELECT $this (COUNT(?o) AS ?n)
                 (EXISTS { $this <http://example.org/mktsegment> "BUILDING" } AS ?bldg)
          WHERE {
            ?o <http://example.org/customer> $this .
            ?o <http://example.org/status> "F" .
          }
          HAVING (COUNT(?o) >= 4 &&
                  NOT EXISTS { $this <http://example.org/mktsegment> "MACHINERY" })
        """ ] .
    '''
    t = T.customer_triples(spark, sf_dir).unionByName(
        T.order_triples(spark, sf_dir)
    )
    v = _validate(spark, t, shapes)
    return v.select(F.col("focus.value").alias("focus"), "message")


def shacl_equals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:equals with the reference's aggressive extra checks
    (equals.rs:20-76): set-difference violation per focus PLUS one
    violation per other-path value that does not equal the focus node."""
    shapes = """
    ex:LineEq a sh:NodeShape ;
      sh:targetClass ex:Line ;
      sh:property [ sh:path ex:discount ; sh:equals ex:tax ] .
    """
    v = _validate(spark, T.lineitem_pair_triples(spark, sf_dir), shapes)
    return v.select(F.col("focus.value").alias("focus"), "message")


def shacl_disjoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:disjoint (disjoint.rs:20-53): violation per value shared with
    the other path (mktsegment2 == mktsegment iff custkey % 3 == 0)."""
    shapes = """
    ex:SegDisjoint a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:property [ sh:path ex:mktsegment ; sh:disjoint ex:mktsegment2 ] .
    """
    v = _validate(spark, T.customer_triples(spark, sf_dir), shapes)
    return v.select(
        F.col("focus.value").alias("focus"), F.col("value.value").alias("segment")
    )


def shacl_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:not (sh_not.rs): violation when the value CONFORMS."""
    shapes = """
    ex:NotBuilding a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:not [ sh:property [ sh:path ex:mktsegment ; sh:hasValue "BUILDING" ] ] .
    """
    return _focus_only(_validate(spark, T.customer_triples(spark, sf_dir), shapes))


def shacl_xone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:xone (sh_xone.rs): violation unless EXACTLY one branch holds
    (rich: acctbal ≥ 5000, building-segment)."""
    shapes = """
    ex:XoneShape a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:xone ( [ sh:property [ sh:path ex:acctbal ; sh:minInclusive 5000 ] ]
                [ sh:property [ sh:path ex:mktsegment ; sh:hasValue "BUILDING" ] ] ) .
    """
    return _focus_only(_validate(spark, T.customer_triples(spark, sf_dir), shapes))


def shacl_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:and (sh_and.rs): violation when ANY branch fails."""
    shapes = """
    ex:AndShape a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:and ( [ sh:property [ sh:path ex:acctbal ; sh:minInclusive 0 ] ]
               [ sh:property [ sh:path ex:name ;
                               sh:pattern "^Customer#[0-9]*[02468]$" ] ] ) .
    """
    return _focus_only(_validate(spark, T.customer_triples(spark, sf_dir), shapes))


def shacl_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:node (sh_node.rs): nation value must conform to a nested node
    shape requiring a Region-typed ex:partOf (region 2 is untyped)."""
    shapes = """
    ex:CustNationNode a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:property [ sh:path ex:nation ;
        sh:node [ sh:property [ sh:path ex:partOf ; sh:class ex:Region ] ] ] .
    """
    t = T.customer_triples(spark, sf_dir).unionByName(T.nation_triples(spark, sf_dir))
    v = _validate(spark, t, shapes)
    return v.select(
        F.col("focus.value").alias("focus"), F.col("value.value").alias("bad_nation")
    )


def shacl_node_kind(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:nodeKind (node_kind.rs): literal names violate sh:IRI."""
    shapes = """
    ex:NameIri a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:property [ sh:path ex:name ; sh:nodeKind sh:IRI ] .
    """
    return _focus_only(_validate(spark, T.customer_triples(spark, sf_dir), shapes))


def shacl_min_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:minLength byte semantics (min_length.rs:23)."""
    shapes = """
    ex:SegMinLen a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:property [ sh:path ex:mktsegment ; sh:minLength 9 ] .
    """
    v = _validate(spark, T.customer_triples(spark, sf_dir), shapes)
    return v.select(
        F.col("focus.value").alias("focus"), F.col("value.value").alias("segment")
    )


def shacl_language_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:languageIn, case-insensitive (language_in.rs:24-25)."""
    shapes = """
    ex:TextLang a sh:NodeShape ;
      sh:targetClass ex:Source ;
      sh:property [ sh:path ex:text ; sh:languageIn ( "en" "DE" ) ] .
    """
    v = _validate(spark, T.document_lang_triples(spark, sf_dir), shapes)
    return v.select(
        F.col("focus.value").alias("focus"), F.col("value.lang").alias("lang")
    )


def shacl_less_than_or_equals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:lessThanOrEquals, ANY-semantics (less_than_or_equals.rs:44)."""
    shapes = """
    ex:LineLe a sh:NodeShape ;
      sh:targetClass ex:Line ;
      sh:property [ sh:path ex:discount ; sh:lessThanOrEquals ex:tax ] .
    """
    return _focus_only(
        _validate(spark, T.lineitem_pair_triples(spark, sf_dir), shapes)
    )


def shacl_max_exclusive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:maxExclusive (max_exclusive.rs): acctbal must be < 9900."""
    shapes = """
    ex:BalCap a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:property [ sh:path ex:acctbal ; sh:maxExclusive 9900 ] .
    """
    return _focus_only(_validate(spark, T.customer_triples(spark, sf_dir), shapes))


def shacl_min_exclusive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:minExclusive (min_exclusive.rs): acctbal must be > 0, so a
    zero balance violates (the strict bound distinguishes this from
    shacl_min_inclusive)."""
    shapes = """
    ex:BalPositive a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:property [ sh:path ex:acctbal ; sh:minExclusive 0 ] .
    """
    return _focus_only(_validate(spark, T.customer_triples(spark, sf_dir), shapes))


def shacl_max_inclusive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:maxInclusive (max_inclusive.rs): acctbal must be <= 5000."""
    shapes = """
    ex:BalCeiling a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:property [ sh:path ex:acctbal ; sh:maxInclusive 5000 ] .
    """
    return _focus_only(_validate(spark, T.customer_triples(spark, sf_dir), shapes))


def shacl_target_subjects_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:targetSubjectsOf (target.rs:75-85): clerk-bearing orders whose
    status is not 'O'."""
    shapes = """
    ex:ClerkOrders a sh:NodeShape ;
      sh:targetSubjectsOf ex:clerk ;
      sh:property [ sh:path ex:status ; sh:hasValue "O" ] .
    """
    return _focus_only(_validate(spark, T.order_triples(spark, sf_dir), shapes))


def shacl_target_objects_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:targetObjectsOf (target.rs:86-101): customers referenced by
    any order, with negative balance."""
    shapes = """
    ex:OrderedBy a sh:NodeShape ;
      sh:targetObjectsOf ex:customer ;
      sh:property [ sh:path ex:acctbal ; sh:minInclusive 0 ] .
    """
    t = T.customer_triples(spark, sf_dir).unionByName(T.order_triples(spark, sf_dir))
    return _focus_only(_validate(spark, t, shapes))


def shacl_target_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:targetNode (target.rs:58-62): a single pinned focus node."""
    shapes = """
    ex:Pinned a sh:NodeShape ;
      sh:targetNode <http://example.org/cust/1> ;
      sh:property [ sh:path ex:acctbal ; sh:maxCount 0 ] .
    """
    return _focus_only(_validate(spark, T.customer_triples(spark, sf_dir), shapes))


def shacl_path_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence path customer→nation→region (path.rs:95-102) + sh:class
    on the 2-hop value (region 2 untyped)."""
    shapes = """
    ex:CustRegion a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:property [ sh:path ( ex:nation ex:partOf ) ; sh:class ex:Region ] .
    """
    t = T.customer_triples(spark, sf_dir).unionByName(T.nation_triples(spark, sf_dir))
    v = _validate(spark, t, shapes)
    return v.select(
        F.col("focus.value").alias("focus"), F.col("value.value").alias("bad_region")
    )


def shacl_path_alternative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alternative path (path.rs:180-185): mktsegment|name values must be
    all-uppercase — every name value violates."""
    shapes = """
    ex:AltPath a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:property [ sh:path [ sh:alternativePath ( ex:mktsegment ex:name ) ] ;
                    sh:pattern "^[A-Z]+$" ] .
    """
    v = _validate(spark, T.customer_triples(spark, sf_dir), shapes)
    return v.select(
        F.col("focus.value").alias("focus"), F.col("value.value").alias("value")
    )


def shacl_path_zero_or_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zeroOrOnePath (path.rs:173-179): nation ∪ one partOf hop must be
    Nation-typed — the region value always violates."""
    shapes = """
    ex:ZooShape a sh:NodeShape ;
      sh:targetClass ex:Nation ;
      sh:property [ sh:path [ sh:zeroOrOnePath ex:partOf ] ; sh:class ex:Nation ] .
    """
    v = _validate(spark, T.nation_triples(spark, sf_dir), shapes)
    return v.select(
        F.col("focus.value").alias("focus"), F.col("value.value").alias("value")
    )


def shacl_severity_message(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:severity + sh:message metadata propagation (parser/mod.rs:
    98-141,169): Warning severity and custom message on every row."""
    shapes = """
    ex:BalWarn a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:severity sh:Warning ;
      sh:property [ sh:path ex:acctbal ; sh:minInclusive 0 ;
                    sh:message "negative balance" ] .
    """
    # severity inherits from the parent node shape (parser/mod.rs:297);
    # sh:message attaches on the shape OWNING the constraint
    # (build_validation_result uses self.message, validation/mod.rs:661)
    v = _validate(spark, T.customer_triples(spark, sf_dir), shapes)
    return v.select(
        F.col("focus.value").alias("focus"),
        F.col("severity"),
        F.col("message"),
    )


def shacl_datatype(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sh:datatype (datatype.rs:20-45): exact datatype IRI match — every
    7th customer's balance is typed xsd:string instead of xsd:double."""
    shapes = """
    ex:BalType a sh:NodeShape ;
      sh:targetClass ex:Customer ;
      sh:property [ sh:path ex:acctbal ; sh:datatype xsd:double ] .
    """
    return _focus_only(_validate(spark, T.customer_triples(spark, sf_dir), shapes))
