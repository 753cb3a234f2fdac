"""RDFS entailment materialization over raw (s, p, o) triple tables.

KG-construction pipelines materialize the RDFS closure once at emit
time so every downstream consumer (SHACL validation included — the
engine's targetClass subclass closure, engine/dataset.py:91-135, is the
rdfs9/11 special case) reads plain triples instead of re-deriving
hierarchy walks. This module implements the five core entailment rules
over DataFrames:

- rdfs5  (subPropertyOf transitivity)
- rdfs7  (property inheritance: x p y ∧ p ⊑ q ⇒ x q y)
- rdfs2  (domain: p domain C ∧ x p y ⇒ x type C)
- rdfs3  (range:  p range C ∧ x p y ⇒ y type C)
- rdfs11 (subClassOf transitivity)
- rdfs9  (class inheritance: x type C ∧ C ⊑ D ⇒ x type D)

evaluated in their natural stratification (property closure → inferred
facts → domain/range types → class closure → inherited types) — each
rule feeds only later strata, so one pass is the fixpoint; no loop over
rules is needed.

Scale shape: the SCHEMA side (subClassOf/subPropertyOf/domain/range
edges) is ontology-sized — thousands of rows against 10^12 facts — so
every rule is a BROADCAST join against the fact table; the only
shuffles are the final dedups. The two transitive closures run on the
schema edges alone (iterative doubling, ⌈log₂ depth⌉ rounds,
checkpointed), never on instance data, and are capped like the other
bounded-verify closures (engine/dataset.py cap policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDFS = "http://www.w3.org/2000/01/rdf-schema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
SUB_CLASS_OF = RDFS + "subClassOf"
SUB_PROPERTY_OF = RDFS + "subPropertyOf"
DOMAIN = RDFS + "domain"
RANGE = RDFS + "range"


def _pairs_closure(edges: DataFrame, max_pairs: int = 2_000_000) -> DataFrame:
    """Transitive closure of (child, parent) edges by iterative
    doubling — ontology hierarchies are shallow (depth < 30), so this
    converges in < 5 rounds; capped because closure is pair-quadratic
    on pathological inputs."""
    reach = edges.dropDuplicates(["child", "parent"]).where(
        F.col("child").isNotNull() & F.col("parent").isNotNull()
    ).localCheckpoint(eager=True)
    n = reach.count()
    while True:
        grown = (
            reach.alias("a")
            .join(reach.alias("b"),
                  F.col("a.parent") == F.col("b.child"))
            .select(F.col("a.child").alias("child"),
                    F.col("b.parent").alias("parent"))
            .unionByName(reach)
            .dropDuplicates(["child", "parent"])
            .localCheckpoint(eager=True)
        )
        m = grown.count()
        if m > max_pairs:
            raise ValueError(
                f"schema closure exceeded max_pairs={max_pairs}"
            )
        if m == n:
            return grown
        reach, n = grown, m


def rdfs_closure(
    triples: DataFrame,
    *,
    type_iri: str = RDF_TYPE,
    sco_iri: str = SUB_CLASS_OF,
    spo_iri: str = SUB_PROPERTY_OF,
    domain_iri: str = DOMAIN,
    range_iri: str = RANGE,
    max_pairs: int = 2_000_000,
) -> DataFrame:
    """(s, p, o) → the RDFS entailment closure (input ∪ everything the
    six rules derive), deduplicated. Reflexive rdfs9/11 pairs (C ⊑ C)
    are NOT emitted — only strict derivations, matching what a
    materializing reasoner adds to the store."""
    t = triples.select(
        F.col("s").cast("string").alias("s"),
        F.col("p").cast("string").alias("p"),
        F.col("o").cast("string").alias("o"),
    ).localCheckpoint(eager=True)

    def schema_pairs(pred: str) -> DataFrame:
        return t.where(F.col("p") == pred).select(
            F.col("s").alias("child"), F.col("o").alias("parent"))

    spo = _pairs_closure(schema_pairs(spo_iri), max_pairs)
    sco = _pairs_closure(schema_pairs(sco_iri), max_pairs)
    # rdfs5 / rdfs11: the closure pairs themselves, as triples
    spo_triples = spo.select(
        F.col("child").alias("s"), F.lit(spo_iri).alias("p"),
        F.col("parent").alias("o"))
    sco_triples = sco.select(
        F.col("child").alias("s"), F.lit(sco_iri).alias("p"),
        F.col("parent").alias("o"))

    schema_preds = (type_iri, sco_iri, spo_iri, domain_iri, range_iri)
    facts = t.where(~F.col("p").isin(*schema_preds))
    # rdfs7: broadcast the (property, super-property) closure
    inherited = facts.join(
        F.broadcast(spo), facts["p"] == spo["child"]
    ).select("s", F.col("parent").alias("p"), "o")
    facts_all = facts.unionByName(inherited).dropDuplicates(
        ["s", "p", "o"]).localCheckpoint(eager=True)

    dom = t.where(F.col("p") == domain_iri).select(
        F.col("s").alias("d_p"), F.col("o").alias("d_c"))
    rng = t.where(F.col("p") == range_iri).select(
        F.col("s").alias("r_p"), F.col("o").alias("r_c"))
    # rdfs2 / rdfs3 over the rdfs7-saturated fact set
    dom_types = facts_all.join(
        F.broadcast(dom), facts_all["p"] == dom["d_p"]
    ).select("s", F.lit(type_iri).alias("p"), F.col("d_c").alias("o"))
    rng_types = facts_all.join(
        F.broadcast(rng), facts_all["p"] == rng["r_p"]
    ).select(F.col("o").alias("s"), F.lit(type_iri).alias("p"),
             F.col("r_c").alias("o"))

    types = (
        t.where(F.col("p") == type_iri)
        .unionByName(dom_types).unionByName(rng_types)
        .dropDuplicates(["s", "p", "o"]).localCheckpoint(eager=True)
    )
    # rdfs9: broadcast the class closure against the saturated types
    super_types = types.join(
        F.broadcast(sco), types["o"] == sco["child"]
    ).select("s", "p", F.col("parent").alias("o"))

    return (
        t.unionByName(facts_all).unionByName(spo_triples)
        .unionByName(sco_triples).unionByName(types)
        .unionByName(super_types)
        .dropDuplicates(["s", "p", "o"])
    )


def induce_shapes(
    triples: DataFrame, in_threshold: int = 10,
) -> DataFrame:
    """SHACL shape INDUCTION — profile an (s, p, o) triple table into
    the per-predicate constraint suggestions a shapes author starts
    from (the inverse of the validator: instead of checking data
    against declared shapes, derive candidate shapes FROM the data).
    One row per predicate:

    - n_subjects / n_triples, min_card / max_card — per-subject
      cardinality profile; max_card == 1 suggests ``sh:maxCount 1``
      (emitted as suggested_max_count, else -1: never suggest a
      bound the data already violates)
    - n_iri_objects vs n_triples — all-IRI objects suggest
      ``sh:nodeKind sh:IRI`` (nodekind_iri 1/0); mixed object kinds
      suggest nothing
    - n_distinct_objects ≤ `in_threshold` suggests an ``sh:in``
      enumeration (suggest_in 1/0)

    All-integer output (the same no-float policy as every oracle-
    gated op). Plan: ONE shuffle on (p, s) computes the per-subject
    cardinalities (map-side partial count), then a predicate-
    cardinality rollup (tiny key space) takes min/max/sums; the
    object-kind and distinct-object profile aggregates in the same
    rollup via two-phase count_distinct. No self-joins, no windows —
    the whole induction is two groupBys, linear in the triple
    count."""
    per_subj = triples.groupBy("p", "s").agg(
        F.count(F.lit(1)).alias("_card"),
    )
    card = per_subj.groupBy("p").agg(
        F.count(F.lit(1)).alias("n_subjects"),
        F.sum("_card").alias("n_triples"),
        F.min("_card").alias("min_card"),
        F.max("_card").alias("max_card"),
    )
    objs = triples.groupBy("p").agg(
        F.sum(F.when(F.col("o").startswith("http"), 1).otherwise(0))
        .cast("long").alias("n_iri_objects"),
        F.count_distinct("o").alias("n_distinct_objects"),
    )
    return (
        card.join(objs, "p")
        .select(
            "p", "n_subjects", "n_triples", "min_card", "max_card",
            "n_iri_objects", "n_distinct_objects",
            F.when(F.col("max_card") == 1, F.lit(1).cast("long"))
            .otherwise(F.lit(-1).cast("long"))
            .alias("suggested_max_count"),
            F.when(F.col("n_iri_objects") == F.col("n_triples"),
                   F.lit(1)).otherwise(F.lit(0))
            .cast("long").alias("nodekind_iri"),
            F.when(F.col("n_distinct_objects") <= in_threshold,
                   F.lit(1)).otherwise(F.lit(0))
            .cast("long").alias("suggest_in"),
        )
    )


def ifp_sameas(
    triples: DataFrame,
    ifp_preds: list[str],
    max_bucket: int | None = None,
) -> DataFrame:
    """owl:InverseFunctionalProperty entity resolution: two subjects
    asserting the SAME value for an inverse-functional predicate
    (foaf:mbox, foaf:homepage, schema:isbn …) denote the same entity —
    the highest-precision sameAs generator a web-scale KG has, and the
    one the candidate-edge stage runs before fuzzy matchers.

    triples(s, p, o) × ifp_preds → (a, b, via_p, via_o): one row per
    unordered subject pair (a < b) and per (predicate, value) witness
    that links them, deduped against multi-asserted claims. A pair
    co-witnessed by two different IFPs appears twice (distinct via_p) —
    downstream CC consumes the union; the per-witness rows are the
    provenance the reference keeps for lineage.

    Plan shape: filter to the (tiny) IFP predicate set in the scan
    (predicate pushdown), dedup (s, p, o), then ONE self-join keyed on
    (p, o) — the value buckets. Skew guard: ``max_bucket`` drops value
    buckets with more subjects than the cap (a shared-mailbox /
    parked-domain value links everything to everything — quadratic in
    the bucket AND semantically worthless); the drop trades recall on
    degenerate values exactly like the LSH stop-bucket policy
    (ops/dedup.py MAX_BUCKET), and None (the verify path) keeps all.
    """
    claims = (
        triples.where(F.col("p").isin(list(ifp_preds)))
        .select("s", "p", "o")
        .where(F.col("s").isNotNull() & F.col("o").isNotNull())
        .dropDuplicates(["s", "p", "o"])
    )
    if max_bucket is not None:
        sizes = claims.groupBy("p", "o").agg(
            F.count(F.lit(1)).alias("_bucket_n")
        )
        claims = (
            claims.join(sizes, ["p", "o"])
            .where(F.col("_bucket_n") <= max_bucket)
            .drop("_bucket_n")
        )
    left = claims.select(
        F.col("p").alias("via_p"), F.col("o").alias("via_o"),
        F.col("s").alias("a"),
    )
    right = claims.select(
        F.col("p").alias("via_p"), F.col("o").alias("via_o"),
        F.col("s").alias("b"),
    )
    return (
        left.join(right, ["via_p", "via_o"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "via_p", "via_o")
    )


def skolemize(
    triples: DataFrame,
    base: str = "http://example.org/.well-known/genid/",
) -> DataFrame:
    """Deterministic blank-node skolemization (RDF 1.1 §3.5) for
    TABLE-backed triples: every ``_:label`` subject/object is replaced
    by ``base + md5(label)`` so downstream joins, dedup, and cross-run
    diffs treat bnodes as stable IRIs — the device that makes a
    10^12-triple emission with bnodes resumable (a re-run re-derives
    the SAME skolem IRI, where fresh bnode ids would double every
    node). Content-independent label hashing is the right scope here
    because the table lane's bnode labels are already deterministic
    (parser-assigned per source document); one codegen'd projection,
    no shuffle, no Python.

    Returns the same (s, p, o, o_is_iri) shape: a skolemized object
    BECOMES an IRI (o_is_iri flips true) — the RDF-spec behavior.
    """
    def sk(col):
        return F.concat(
            F.lit(base), F.md5(F.substring(col, 3, 1 << 20))
        )

    s_is_b = F.col("s").startswith("_:")
    o_is_b = (~F.col("o_is_iri")) & F.col("o").startswith("_:")
    return triples.select(
        F.when(s_is_b, sk(F.col("s"))).otherwise(F.col("s")).alias("s"),
        F.col("p"),
        F.when(o_is_b, sk(F.col("o"))).otherwise(F.col("o")).alias("o"),
        (F.col("o_is_iri") | o_is_b).alias("o_is_iri"),
    )


def disjoint_violations(
    types: DataFrame, axioms: DataFrame
) -> DataFrame:
    """owl:disjointWith audit — the KG-QA check that runs beside SHACL
    validation at emit time: an entity typed in BOTH classes of a
    disjointness axiom is inconsistent (usually an entity-resolution
    over-merge, the canonical CC failure mode). types(s, cls) ×
    axioms(c1, c2) → (s, c1, c2) with the axiom pair canonicalized
    (least/greatest) so a symmetric assertion of the same axiom
    counts once; duplicate type assertions dedup first.

    Plan shape: the axiom table is ontology-sized → both class hops
    are BROADCAST joins against the (already narrow) type table; the
    only shuffle is the final dedup. Self-disjoint axioms (c1 = c2)
    are dropped — owl:disjointWith is irreflexive for satisfiable
    ontologies, and keeping them would flag every instance."""
    ax = (
        axioms.select(
            F.least("c1", "c2").alias("c1"),
            F.greatest("c1", "c2").alias("c2"),
        )
        .where(F.col("c1") != F.col("c2"))
        .dropDuplicates(["c1", "c2"])
    )
    t = types.select("s", "cls").dropDuplicates(["s", "cls"])
    return (
        t.alias("t1")
        .join(F.broadcast(ax), F.col("t1.cls") == F.col("c1"))
        .join(
            t.alias("t2"),
            (F.col("t1.s") == F.col("t2.s"))
            & (F.col("t2.cls") == F.col("c2")),
        )
        .select(F.col("t1.s").alias("s"), "c1", "c2")
        .dropDuplicates(["s", "c1", "c2"])
    )


# xsd datatype lexical gates, most-specific-first (the emit-stage
# typing pass tries them in order; anchored regexes, engine-portable)
_DATATYPE_RULES: tuple = (
    ("http://www.w3.org/2001/XMLSchema#boolean", r"^(true|false)$"),
    ("http://www.w3.org/2001/XMLSchema#integer", r"^[+-]?[0-9]+$"),
    ("http://www.w3.org/2001/XMLSchema#decimal",
     r"^[+-]?[0-9]*\.[0-9]+$"),
    ("http://www.w3.org/2001/XMLSchema#date",
     r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"),
    ("http://www.w3.org/2001/XMLSchema#dateTime",
     r"^[0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2}Z?$"),
)


def infer_literal_datatype(col) -> "F.Column":
    """Column expression mapping a literal's LEXICAL form to the xsd
    datatype a typed emission would stamp on it — the KG-construction
    typing pass that turns scraped strings into typed literals before
    SHACL sh:datatype validation sees them. Anchored regex gates,
    most-specific first (boolean before integer is irrelevant;
    integer before decimal is not), xsd:string as the fallthrough —
    deterministic and engine-portable (plain character classes, no
    locale, no engine date parser, which two engines would disagree
    on for exotic inputs). Pure codegen: no shuffle, no Python."""
    expr = F.lit("http://www.w3.org/2001/XMLSchema#string")
    for dt, pat in reversed(_DATATYPE_RULES):
        expr = F.when(col.rlike(pat), F.lit(dt)).otherwise(expr)
    return expr


def acronym_candidates(
    entities: DataFrame, mentions: DataFrame
) -> DataFrame:
    """Acronym-alias candidate generation for entity linking: an
    all-caps-ish short mention ("WHO") blocks against the dictionary
    entry whose NAME's word-initials spell it ("World Health
    Organization") — the alias lane the surface-form and fuzzy
    matchers both miss. entities(entity_id, name) ×
    mentions(mention_id, surface) → (mention_id, surface, entity_id,
    acronym), case-insensitive equality on the derived acronym.

    Plan shape: the acronym is derived MAP-SIDE on the (small)
    dictionary with transform/array_join (no Python), then the join
    keys on lower(acronym) — dictionary-sized build side, broadcast
    against the mention stream at scale. Multi-entity acronym
    collisions ("ACL") emit one row per colliding entity: this is a
    CANDIDATE generator, the context disambiguator
    (fuse.disambiguate_by_context) picks."""
    acro = F.array_join(
        F.transform(F.split(F.col("name"), " "),
                    lambda w: w.substr(1, 1)),
        "",
    )
    dic = entities.select(
        "entity_id", "name", F.lower(acro).alias("_k"),
        acro.alias("acronym"),
    )
    m = mentions.select(
        "mention_id", "surface", F.lower(F.col("surface")).alias("_k")
    )
    return m.join(F.broadcast(dic), "_k").select(
        "mention_id", "surface", "entity_id", "acronym"
    )


def align_predicates(
    left: DataFrame, right: DataFrame, min_shared: int = 2
) -> DataFrame:
    """Instance-based schema alignment (the PARIS/ontology-matching
    evidence rule): two crawled sources describe the same entities
    with DIFFERENT predicate vocabularies; predicates that assert the
    same (subject, object) pairs are alignment candidates. left/right
    are (s, p, o) triple tables → (p_left, p_right, n_shared,
    n_left, n_right): the shared-statement count plus each
    predicate's distinct-statement extension size — the exact-integer
    ingredients of every overlap coefficient (Jaccard = shared /
    (n_l + n_r − shared); the division is consumer arithmetic, the
    num/den charter).

    Plan shape: ONE equi-join on (s, o) — the evidence key — between
    the deduped statement tables, then a predicate-pair aggregate
    (vocabulary-squared bounded, i.e. tiny); extension sizes are
    per-predicate pre-aggregates joined in at pair cardinality.
    ``min_shared`` drops single-coincidence pairs."""
    ls = left.select("s", "p", "o").dropDuplicates(["s", "p", "o"])
    rs = right.select("s", "p", "o").dropDuplicates(["s", "p", "o"])
    shared = (
        ls.select("s", F.col("p").alias("p_left"), "o")
        .join(rs.select("s", F.col("p").alias("p_right"), "o"),
              ["s", "o"])
        .groupBy("p_left", "p_right")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    nl = ls.groupBy(F.col("p").alias("p_left")).agg(
        F.count(F.lit(1)).alias("n_left"))
    nr = rs.groupBy(F.col("p").alias("p_right")).agg(
        F.count(F.lit(1)).alias("n_right"))
    return (
        shared.join(F.broadcast(nl), "p_left")
        .join(F.broadcast(nr), "p_right")
        .select("p_left", "p_right", "n_shared", "n_left", "n_right")
    )


def key_discovery(triples: DataFrame) -> DataFrame:
    """Quasi-key discovery over a (s, p, o) frame (SAKey/ROCKER-lite):
    per predicate the integer evidence for 'o identifies s' —
    n_statements (distinct (s,o) pairs), n_distinct_o, n_shared_o
    (object values asserted for ≥ 2 distinct subjects = key
    violations). A predicate with n_shared_o = 0 is a discovered
    inverse-functional key; near-keys (small n_shared_o) are the
    candidates a sameAs-inference pipeline promotes after review —
    the DISCOVERY half of which ifp_sameas is the APPLICATION half.
    keyness = 1 − n_shared_o/n_distinct_o is consumer arithmetic.

    Plan: dropDuplicates on (s,p,o) (assertion multiplicity is not
    evidence of keyness), one (p,o) aggregate for per-value subject
    counts, one per-p fold — all narrow keys, vocabulary-of-
    predicates-sized output."""
    t = triples.select("s", "p", "o").dropDuplicates(["s", "p", "o"])
    po = t.groupBy("p", "o").agg(
        F.count_distinct("s").alias("n_subj"))
    return (
        po.groupBy("p")
        .agg(
            F.sum("n_subj").cast("bigint").alias("n_statements"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_o"),
            F.sum(F.when(F.col("n_subj") >= 2, 1).otherwise(0))
            .cast("bigint").alias("n_shared_o"),
        )
    )
