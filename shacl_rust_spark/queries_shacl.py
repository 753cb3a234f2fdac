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
    ds = Dataset(spark, triples, parse_turtle(PREFIXES + shapes_ttl))
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
