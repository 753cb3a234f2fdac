"""sh:sparql rewriter extensions: OPTIONAL, VALUES, property paths,
typed/lang literals.

The reference evaluates sh:sparql with a full spec-compliant SPARQL
engine (/root/reference/src/validation/constraints/sparql.rs:217-232);
these pin the subset rewriter's newer constructs to the same semantics,
including the spot where the spec diverges from the reference's SHACL
path walker: a ``+`` path DOES re-emit its start node through a cycle.
"""

from shacl_rust_spark.engine import validate_strings

DATA = """
@prefix ex: <http://example.org/> .
ex:a a ex:T ; ex:p ex:v1 .
ex:b a ex:T ; ex:p ex:v2 .
ex:v1 ex:q "present" .
ex:n1 a ex:N ; ex:next ex:n2 .
ex:n2 ex:next ex:n1 .
ex:n3 a ex:N ; ex:next ex:n4 .
ex:c a ex:C ; ex:val 3 ; ex:tag "x"@en .
ex:d a ex:C ; ex:val 9 ; ex:tag "x"@de .
"""

PRE = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
"""


def _run(spark, shapes):
    rep = validate_strings(spark, DATA, shapes)
    return sorted(r.asDict()["focus"]["value"] for r in rep.results())


def test_optional_unbound_filter(spark):
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this <http://example.org/p> ?v .
          OPTIONAL { ?v <http://example.org/q> ?w }
          FILTER(!bound(?w))
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/b"]


def test_optional_never_removes_rows(spark):
    # OPTIONAL whose inner pattern matches nothing keeps every solution
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this <http://example.org/p> ?v .
          OPTIONAL { ?v <http://example.org/nope> ?w }
        }''' ] .
    """
    assert _run(spark, shapes) == [
        "http://example.org/a", "http://example.org/b",
    ]


def test_sequence_path(spark):
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this <http://example.org/p>/<http://example.org/q> ?w .
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/a"]


def test_kleene_path_reemits_start_on_cycle(spark):
    # SPARQL-spec semantics: n1 ->next n2 ->next n1 means n1 next+ n1
    # holds. (The SHACL path walker in paths.py deliberately never
    # re-emits the start node — that quirk must NOT leak in here.)
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:N ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this <http://example.org/next>+ $this .
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/n1"]


def test_inverse_path_unbound_subject(spark):
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          ?x (^<http://example.org/p>) $this .
          FILTER NOT EXISTS { ?x <http://example.org/q> ?y }
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/b"]


def test_alternative_and_zero_or_one_path(spark):
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this (<http://example.org/p>|<http://example.org/missing>)?
                <http://example.org/v1> .
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/a"]


def test_path_both_endpoints_unbound(spark):
    # pairs from the whole graph, tied to $this only by FILTER
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetNode ex:a ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          ?x <http://example.org/p>+ ?y .
          FILTER(?x = $this)
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/a"]


def test_path_both_unbound_zero_or_more_identity(spark):
    # ?x nope* ?y emits the identity pair for EVERY graph term, so the
    # filter matches any target — pins the all-terms seeding
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetNode ex:v2 ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          ?x <http://example.org/nope>* ?y .
          FILTER(?x = $this && ?y = $this)
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/v2"]


def test_path_both_unbound_same_var_cycle(spark):
    # ?x next+ ?x: only the n1/n2 cycle members satisfy it
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:N ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          ?x <http://example.org/next>+ ?x .
          FILTER(?x = $this)
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/n1"]


def test_negated_property_set_forward(spark):
    # !(rdf:type) from a T matches its remaining ex:p edge; negating
    # both leaves nothing (SPARQL 1.1 §18.4 NPS over forward triples)
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE { $this !(a) ?v }''' ] .
    """
    assert _run(spark, shapes) == [
        "http://example.org/a", "http://example.org/b",
    ]
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE { $this !(a|<http://example.org/p>) ?v }''' ] .
    """
    assert _run(spark, shapes) == []


def test_negated_property_set_pure_inverse(spark):
    # !(^p) has NO forward clause: v1's outgoing ex:q edge must not
    # leak in; the only edge into v1 is via p, which is negated
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetNode ex:v1 ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE { $this !(^<http://example.org/p>) ?x }''' ] .
    """
    assert _run(spark, shapes) == []
    # negating a predicate that is NOT the incoming one does match
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetNode ex:v1 ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this !(<http://example.org/q>|^<http://example.org/nope>) ?x
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/v1"]


def test_negated_property_set_in_sequence(spark):
    # !(a)/q : a's non-type edge lands on v1 which has a q edge; b's
    # lands on v2 which does not
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this !(a)/<http://example.org/q> ?w
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/a"]


def test_values_inline(spark):
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:C ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this <http://example.org/val> ?v .
          VALUES ?v { 3 }
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/c"]


def test_typed_literal_filter(spark):
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:C ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this <http://example.org/val> ?v .
          FILTER(?v > "5"^^<http://www.w3.org/2001/XMLSchema#integer>)
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/d"]


def test_lang_tagged_literal_equality(spark):
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:C ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this <http://example.org/tag> "x"@en .
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/c"]


def test_path_both_endpoints_unbound_is_violation_per_focus(spark):
    # a both-unbound path disconnected from $this is now EVALUATED
    # (previously an unsupported-construct fallback): next+ has 5 pairs
    # ((n1,n2),(n1,n1),(n2,n1),(n2,n2),(n3,n4)), each cross-joins every
    # pre-binding run, and — like the reference, which builds one
    # ValidationResult per query solution — each solution row is its
    # own violation: 5 per focus
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:C ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          ?x <http://example.org/next>+ ?y .
        }''' ] .
    """
    assert _run(spark, shapes) == (
        ["http://example.org/c"] * 5 + ["http://example.org/d"] * 5
    )


# --- aggregates / solution modifiers (round 2) ----------------------------
AGG_DATA = """
@prefix ex: <http://example.org/> .
ex:a a ex:T ; ex:score 5, 10, 20 ; ex:name "apple" .
ex:b a ex:T ; ex:score 1, 2 ; ex:name "Banana" .
ex:c a ex:T ; ex:score 100 ; ex:name "cherry" .
ex:e a ex:T ; ex:name "empty" .
"""


def _run_agg(spark, select):
    shapes = PRE + f"""
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''{select}''' ] .
    """
    rep = validate_strings(spark, AGG_DATA, shapes)
    return sorted(
        r.asDict()["focus"]["value"].rsplit("/", 1)[1] for r in rep.results()
    )


def test_agg_count_having_includes_empty_run(spark):
    # reference runs the query once per focus: a focus with NO matches
    # still aggregates (COUNT = 0) — e violates alongside b and c
    got = _run_agg(spark, """
      SELECT $this (COUNT(?s) AS ?n)
      WHERE { $this <http://example.org/score> ?s }
      HAVING (COUNT(?s) < 3)""")
    assert got == ["b", "c", "e"]


def test_agg_sum_avg(spark):
    assert _run_agg(spark, """
      SELECT $this WHERE { $this <http://example.org/score> ?s }
      HAVING (SUM(?s) > 30)""") == ["a", "c"]
    assert _run_agg(spark, """
      SELECT $this WHERE { $this <http://example.org/score> ?s }
      HAVING (AVG(?s) < 5 && COUNT(?s) > 0)""") == ["b"]


def test_agg_min_max_integer_formatting(spark):
    # MIN result struct-compares equal to an integer literal (no "1.0")
    assert _run_agg(spark, """
      SELECT $this WHERE { $this <http://example.org/score> ?s }
      HAVING (MIN(?s) = 1)""") == ["b"]
    assert _run_agg(spark, """
      SELECT $this WHERE { $this <http://example.org/score> ?s }
      HAVING (MAX(?s) >= 20)""") == ["a", "c"]


def test_agg_group_concat_sorted(spark):
    got = _run_agg(spark, """
      SELECT $this WHERE { $this <http://example.org/score> ?s }
      HAVING (GROUP_CONCAT(?s; SEPARATOR=",") = "10,20,5")""")
    assert got == ["a"]


def test_limit_slices_per_focus_run(spark):
    # LIMIT 1 keeps ONE solution per pre-binding run (per focus), not
    # one global row — every focus with scores still violates once
    got = _run_agg(spark, """
      SELECT $this ?s WHERE { $this <http://example.org/score> ?s }
      ORDER BY DESC(?s) LIMIT 1""")
    assert got == ["a", "b", "c"]


def test_arithmetic_and_builtins(spark):
    assert _run_agg(spark, """
      SELECT $this ?s WHERE { $this <http://example.org/score> ?s .
        FILTER(?s * 2 - 1 >= 199) }""") == ["c"]
    assert _run_agg(spark, """
      SELECT $this WHERE { $this <http://example.org/name> ?n .
        FILTER(CONTAINS(LCASE(?n), "an")) }""") == ["b"]
    assert _run_agg(spark, """
      SELECT $this WHERE { $this <http://example.org/name> ?n .
        FILTER(REGEX(?n, "^ba", "i") || STRSTARTS(?n, "che")) }
      """) == ["b", "c"]
    assert _run_agg(spark, """
      SELECT $this WHERE { $this <http://example.org/name> ?n .
        FILTER(STRAFTER(?n, "an") = "ana" && STRLEN(?n) = 6) }""") == ["b"]


def test_group_by_explicit_var(spark):
    # GROUP BY subdivides within the pre-binding run; empty runs vanish
    # (spec: zero groups for an empty solution set with GROUP BY)
    got = _run_agg(spark, """
      SELECT $this ?s WHERE { $this <http://example.org/score> ?s }
      GROUP BY ?s HAVING (COUNT(?s) = 1)""")
    assert got == ["a", "a", "a", "b", "b", "c"]


def test_trailing_garbage_is_violation_not_silent(spark):
    # un-parsed trailing tokens must NOT be silently dropped
    got = _run_agg(spark, """
      SELECT $this WHERE { $this <http://example.org/score> ?s }
      BINDINGS ?x { }""")
    assert got == ["a", "b", "c", "e"]  # one rewrite-error violation per focus


def _run_msgs(spark, shapes):
    rep = validate_strings(spark, DATA, shapes)
    return sorted(
        (r.asDict()["focus"]["value"], r.asDict()["message"])
        for r in rep.results()
    )


def test_message_template_substitution(spark):
    # {?var}/{$var} substitute per solution: IRIs lose <>, literals keep
    # their quoted N3 form, unknown vars keep the placeholder
    # (apply_message_bindings, sparql.rs:106-131)
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:C ;
      sh:sparql [
        sh:message "val {?v} on {$this} ({?nope} stays)" ;
        sh:select '''
          SELECT $this ?v WHERE {
            $this <http://example.org/val> ?v . FILTER(?v > 5)
          }''' ] .
    """
    assert _run_msgs(spark, shapes) == [(
        "http://example.org/d",
        'val "9"^^<http://www.w3.org/2001/XMLSchema#integer> on '
        "http://example.org/d ({?nope} stays)",
    )]


def test_message_template_lang_literal_and_optional_unbound(spark):
    # lang literal renders as "x"@de; a var unbound IN THAT ROW (via
    # OPTIONAL) keeps its placeholder, exactly like the reference's
    # replace-only-bound-vars loop
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:C ;
      sh:sparql [
        sh:message "tag {?t} next {?w}" ;
        sh:select '''
          SELECT $this ?t WHERE {
            $this <http://example.org/tag> ?t .
            OPTIONAL { $this <http://example.org/next> ?w }
            FILTER(?t = "x"@de)
          }''' ] .
    """
    assert _run_msgs(spark, shapes) == [
        ("http://example.org/d", 'tag "x"@de next {?w}'),
    ]


def test_message_defaults_select_vs_ask(spark):
    # no sh:message ⇒ per-executable defaults (sparql.rs:253-254,280-281)
    sel = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:C ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE { $this <http://example.org/val> ?v .
          FILTER(?v > 5) }''' ] .
    """
    ask = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:C ;
      sh:sparql [ sh:ask '''
        ASK { $this <http://example.org/val> ?v . FILTER(?v < 5) }''' ] .
    """
    assert _run_msgs(spark, sel) == [
        ("http://example.org/d", "SPARQL SELECT constraint violation"),
    ]
    assert _run_msgs(spark, ask) == [
        ("http://example.org/d", "SPARQL ASK constraint violation"),
    ]


def test_message_ask_verbatim_no_substitution(spark):
    # ASK messages are cloned verbatim — no template substitution
    # (sparql.rs:278-283)
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:C ;
      sh:sparql [
        sh:message "bad {$this}" ;
        sh:ask '''ASK { $this <http://example.org/val> ?v . FILTER(?v < 5) }''' ] .
    """
    assert _run_msgs(spark, shapes) == [
        ("http://example.org/d", "bad {$this}"),
    ]


# --- property paths over GRAPH $shapesGraph (round 3) ----------------------
# The reference registers the shapes graph as a named graph
# (urn:shacl:shapes-graph, dataset.rs:10) in oxigraph, so paths inside
# GRAPH $shapesGraph evaluate like any other — these pin the rewriter's
# source-threaded path machinery to the same behavior.

def test_shapes_graph_sequence_path_introspection(spark):
    # sh:property/sh:path over the SHAPES graph enumerates the shape's
    # declared predicates; focus nodes missing one in the DATA graph
    # violate (the component-library idiom)
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:property [ sh:path ex:p ] ;
      sh:property [ sh:path ex:missing ] ;
      sh:sparql [ sh:select '''
        PREFIX sh: <http://www.w3.org/ns/shacl#>
        SELECT $this ?prop WHERE {
          GRAPH $shapesGraph { $currentShape sh:property/sh:path ?prop . }
          FILTER NOT EXISTS { $this ?prop ?v . }
        }''' ] .
    """
    # a and b both carry ex:p but not ex:missing — one violation each
    assert _run(spark, shapes) == [
        "http://example.org/a", "http://example.org/b",
    ]


def test_shapes_graph_star_path(spark):
    # Kleene closure over shapes-graph triples: chain S ->chain S2
    # ->chain S3 gives 3 reachable nodes (incl. the start) per focus
    shapes = PRE + """
    ex:S ex:chain ex:S2 . ex:S2 ex:chain ex:S3 .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''
        PREFIX ex: <http://example.org/>
        SELECT $this ?x WHERE {
          GRAPH $shapesGraph { $currentShape ex:chain* ?x . }
        }''' ] .
    """
    assert _run(spark, shapes) == (
        ["http://example.org/a"] * 3 + ["http://example.org/b"] * 3
    )


def test_shapes_graph_inverse_and_alternative_path(spark):
    # (^chain|chain) from S over the shapes graph: Other ->chain S and
    # S ->chain S2 give exactly two solutions per focus
    shapes = PRE + """
    ex:Other ex:chain ex:S . ex:S ex:chain ex:S2 .
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''
        PREFIX ex: <http://example.org/>
        SELECT $this ?x WHERE {
          GRAPH $shapesGraph { $currentShape (^ex:chain|ex:chain) ?x . }
        }''' ] .
    """
    assert _run(spark, shapes) == (
        ["http://example.org/a"] * 2 + ["http://example.org/b"] * 2
    )


def test_shapes_graph_path_does_not_touch_data_graph(spark):
    # ex:p exists in the DATA graph only — a shapes-graph path over it
    # must find nothing (and vice versa the data path is unaffected)
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''
        PREFIX ex: <http://example.org/>
        SELECT $this WHERE {
          GRAPH $shapesGraph { $currentShape ex:p+ ?x . }
        }''' ] .
    """
    assert _run(spark, shapes) == []


def test_scalar_expr_projection_message(spark):
    # SELECT (expr AS ?v) with a non-aggregate expression, rendered
    # through the message template per solution
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:C ;
      sh:sparql [
        sh:message "doubled {?m}" ;
        sh:select '''
        SELECT $this (STR(?v * 2) AS ?m) WHERE {
          $this <http://example.org/val> ?v . FILTER(?v >= 9)
        }''' ] .
    """
    assert _run_msgs(spark, shapes) == [
        ("http://example.org/d", 'doubled "18"'),
    ]


def test_graph_other_iri_is_empty_not_error(spark):
    # the dataset's only named graph is urn:shacl:shapes-graph
    # (dataset.rs:10): GRAPH over any other IRI matches NOTHING — it is
    # an empty pattern, not an unsupported construct (oxigraph parity)
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          GRAPH <http://example.org/no-such-graph> { ?s ?p ?o . }
        }''' ] .
    """
    assert _run(spark, shapes) == []


def test_graph_explicit_shapes_iri(spark):
    # the shapes graph is addressable by its IRI, not only $shapesGraph
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''
        PREFIX sh: <http://www.w3.org/ns/shacl#>
        SELECT $this WHERE {
          GRAPH <urn:shacl:shapes-graph> {
            $currentShape a sh:NodeShape .
          }
        }''' ] .
    """
    assert _run(spark, shapes) == [
        "http://example.org/a", "http://example.org/b",
    ]


def test_graph_variable_ranges_over_named_graphs(spark):
    # GRAPH ?g ranges over the dataset's named graphs = exactly the
    # shapes graph; ?g binds to its IRI and is usable in a FILTER
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [
        sh:message "in {?g}" ;
        sh:select '''
        PREFIX sh: <http://www.w3.org/ns/shacl#>
        SELECT $this ?g WHERE {
          GRAPH ?g { $currentShape a sh:NodeShape . }
          FILTER(?g = <urn:shacl:shapes-graph>)
        }''' ] .
    """
    rep = validate_strings(spark, DATA, shapes)
    rows = sorted((r.asDict()["focus"]["value"], r.asDict()["message"])
                  for r in rep.results())
    assert rows == [
        ("http://example.org/a", "in urn:shacl:shapes-graph"),
        ("http://example.org/b", "in urn:shacl:shapes-graph"),
    ]


# --- builtin width (round 3): IN, sameTerm, isNumeric, constructors --------

def test_filter_in_and_not_in(spark):
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:C ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this <http://example.org/val> ?v .
          FILTER(?v IN (3, 7, 11))
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/c"]
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:C ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this <http://example.org/val> ?v .
          FILTER(?v NOT IN (3))
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/d"]


def test_sameterm_vs_equality_on_lang_tags(spark):
    # sameTerm is exact term identity: "x"@en and "x"@de differ
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:C ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this <http://example.org/tag> ?t .
          FILTER(SAMETERM(?t, "x"@en))
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/c"]


def test_isnumeric(spark):
    # vals are xsd:integer literals; tags are langString → not numeric
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:C ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this <http://example.org/tag> ?t .
          FILTER(ISNUMERIC(?t))
        }''' ] .
    """
    assert _run(spark, shapes) == []
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:C ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this <http://example.org/val> ?v .
          FILTER(ISNUMERIC(?v) && ?v > 5)
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/d"]


def test_iri_constructor_and_strdt_strlang(spark):
    # IRI(CONCAT(...)) builds a term equal to a real IRI; STRDT/STRLANG
    # construct typed / language-tagged literals that compare exactly
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this <http://example.org/p> ?v .
          FILTER(?v = IRI(CONCAT("http://example.org/", "v1")))
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/a"]
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:C ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this <http://example.org/val> ?v .
          FILTER(?v = STRDT("3", <http://www.w3.org/2001/XMLSchema#integer>))
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/c"]
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:C ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this <http://example.org/tag> ?t .
          FILTER(SAMETERM(?t, STRLANG("x", "EN")))
        }''' ] .
    """
    # STRLANG lowercases the tag like literal construction does
    assert _run(spark, shapes) == ["http://example.org/c"]


def test_encode_for_uri_and_hashes(spark):
    import hashlib

    md5x = hashlib.md5(b"x").hexdigest()
    sha256x = hashlib.sha256(b"x").hexdigest()
    shapes = PRE + f"""
    ex:S a sh:NodeShape ; sh:targetClass ex:C ;
      sh:sparql [
        sh:message "e={{?e}} m={{?m}} s={{?s}}" ;
        sh:select '''
        SELECT $this (ENCODE_FOR_URI("a b~c*") AS ?e)
                     (MD5("x") AS ?m) (SHA256("x") AS ?s)
        WHERE {{
          $this <http://example.org/tag> ?t . FILTER(lang(?t) = "en")
        }}''' ] .
    """
    rep = validate_strings(spark, DATA, shapes)
    rows = [(r.asDict()["focus"]["value"], r.asDict()["message"])
            for r in rep.results()]
    assert rows == [(
        "http://example.org/c",
        f'e="a%20b~c%2A" m="{md5x}" s="{sha256x}"',
    )]


# --- EXISTS embedded in boolean FILTER expressions (round 3) ---------------

def test_exists_in_disjunction(spark):
    # a passes via EXISTS (v1 has a q edge), b passes nothing
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this <http://example.org/p> ?v .
          FILTER(?v = <http://example.org/never>
                 || EXISTS { ?v <http://example.org/q> ?w })
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/a"]


def test_negated_exists_in_conjunction(spark):
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this <http://example.org/p> ?v .
          FILTER(!EXISTS { ?v <http://example.org/q> ?w }
                 && isIRI(?v))
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/b"]


def test_not_exists_or_exists_two_marks(spark):
    # two independent subpatterns in one boolean tree: every T matches
    # exactly one branch, so both a and b violate
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this <http://example.org/p> ?v .
          FILTER(NOT EXISTS { ?v <http://example.org/q> ?w }
                 || EXISTS { ?v <http://example.org/q> "present" })
        }''' ] .
    """
    assert _run(spark, shapes) == [
        "http://example.org/a", "http://example.org/b",
    ]


def test_exists_sees_current_bindings(spark):
    # the inner pattern is correlated on ?v (the row's binding), not
    # just on $this — v2 has no q edge so only a's row matches
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''
        SELECT $this ?v WHERE {
          $this <http://example.org/p> ?v .
          FILTER(EXISTS { ?v <http://example.org/q> ?w } || false)
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/a"]


def test_graph_variable_bound_inside_block_filters_not_overwrites(spark):
    # review finding: when the graph variable is ALSO bound by a
    # pattern inside the block, the binding must be FILTERED against
    # the graph IRI, not overwritten — sh:property objects are bnodes,
    # never urn:shacl:shapes-graph, so this query has ZERO solutions
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:property [ sh:path ex:p ] ;
      sh:sparql [ sh:select '''
        PREFIX sh: <http://www.w3.org/ns/shacl#>
        SELECT $this WHERE {
          GRAPH ?g { $currentShape sh:property ?g . }
        }''' ] .
    """
    assert _run(spark, shapes) == []


# --- EXISTS beyond FILTER: BIND / HAVING / projection (round 3) -------------

def test_exists_in_bind(spark):
    # BIND(EXISTS{...} AS ?has) materializes the mark as an
    # xsd:boolean term usable by later FILTERs
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this <http://example.org/p> ?v .
          BIND(EXISTS { ?v <http://example.org/q> ?w } AS ?has)
          FILTER(?has)
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/a"]


def test_not_exists_in_bind_expression(spark):
    # the mark composes inside a larger boolean expression in BIND
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this <http://example.org/p> ?v .
          BIND((NOT EXISTS { ?v <http://example.org/q> ?w }
                && isIRI(?v)) AS ?lonely)
          FILTER(?lonely)
        }''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/b"]


def test_exists_in_projection(spark):
    # SELECT (EXISTS{...} AS ?has): projected as an xsd:boolean term,
    # observable through the message template
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [
        sh:message "has={?has}" ;
        sh:select '''
        SELECT $this (EXISTS { ?v <http://example.org/q> ?w } AS ?has)
        WHERE {
          $this <http://example.org/p> ?v .
        }''' ] .
    """
    rep = validate_strings(spark, DATA, shapes)
    rows = sorted(
        (r.asDict()["focus"]["value"], r.asDict()["message"])
        for r in rep.results()
    )
    assert [(f, "true" in m and "false" not in m) for f, m in rows] == [
        ("http://example.org/a", True),
        ("http://example.org/b", False),
    ]


def test_exists_in_having(spark):
    # HAVING(EXISTS{...}) over grouped solutions: the subpattern is
    # correlated on the group key ($this); only a's group survives
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''
        SELECT $this (COUNT(?v) AS ?n) WHERE {
          $this <http://example.org/p> ?v .
        }
        GROUP BY $this
        HAVING(EXISTS { $this <http://example.org/p>/<http://example.org/q> ?w }
               || COUNT(?v) > 5)
        ''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/a"]


def test_not_exists_in_having(spark):
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''
        SELECT $this (COUNT(?v) AS ?n) WHERE {
          $this <http://example.org/p> ?v .
        }
        GROUP BY $this
        HAVING(NOT EXISTS { $this <http://example.org/p>/<http://example.org/q> ?w })
        ''' ] .
    """
    assert _run(spark, shapes) == ["http://example.org/b"]


# --- EXISTS in ORDER BY keys (round 3, closes the last position) -----------

ORDER_EX_DATA = """
@prefix ex: <http://example.org/> .
ex:a a ex:T ; ex:p "hit" ; ex:p "miss" .
ex:z ex:q "hit" .
"""


def _run_order_ex(spark, data, select):
    shapes = PRE + f"""
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [
        sh:message "v={{?v}}" ;
        sh:select '''{select}''' ] .
    """
    rep = validate_strings(spark, data, shapes)
    return sorted(
        (r.asDict()["focus"]["value"], r.asDict()["message"])
        for r in rep.results()
    )


def test_exists_in_order_by_desc(spark):
    # DESC(EXISTS{...}) under LIMIT: "true" sorts first, so the sliced
    # row is the one whose ?v has a matching q-edge
    got = _run_order_ex(spark, ORDER_EX_DATA, """
        SELECT $this ?v WHERE { $this <http://example.org/p> ?v }
        ORDER BY DESC(EXISTS { ?z <http://example.org/q> ?v })
        LIMIT 1""")
    assert got == [("http://example.org/a", 'v="hit"')]


def test_exists_in_order_by_asc(spark):
    # ascending boolean order: false < true, so the non-matching row
    # wins the slice
    got = _run_order_ex(spark, ORDER_EX_DATA, """
        SELECT $this ?v WHERE { $this <http://example.org/p> ?v }
        ORDER BY EXISTS { ?z <http://example.org/q> ?v }
        LIMIT 1""")
    assert got == [("http://example.org/a", 'v="miss"')]


def test_exists_order_key_with_secondary_key(spark):
    # the mark orders the groups, the plain key breaks ties within one
    data = """
    @prefix ex: <http://example.org/> .
    ex:a a ex:T ; ex:p "b1" ; ex:p "a2" ; ex:p "a1" .
    ex:z ex:q "a1" ; ex:q "a2" .
    """
    got = _run_order_ex(spark, data, """
        SELECT $this ?v WHERE { $this <http://example.org/p> ?v }
        ORDER BY DESC(NOT EXISTS { ?z <http://example.org/q> ?v }) ?v
        LIMIT 1""")
    assert got == [("http://example.org/a", 'v="b1"')]


# --- UNDEF in VALUES + computed GROUP BY keys (round 3) --------------------

def test_values_undef_matches_anything(spark):
    # row 1 binds ?v, row 2 leaves it UNDEF — the UNDEF row is
    # compatible with every solution, so a gets both tags and b one
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [
        sh:message "m={?m}" ;
        sh:select '''
        SELECT $this ?m WHERE {
          $this <http://example.org/p> ?v .
          VALUES (?v ?m) {
            (<http://example.org/v1> "one")
            (UNDEF "any")
          }
        }''' ] .
    """
    rep = validate_strings(spark, DATA, shapes)
    rows = sorted(
        (r.asDict()["focus"]["value"], r.asDict()["message"])
        for r in rep.results()
    )
    assert rows == [
        ("http://example.org/a", 'm="any"'),
        ("http://example.org/a", 'm="one"'),
        ("http://example.org/b", 'm="any"'),
    ]


def test_values_undef_leaves_var_unbound(spark):
    # the UNDEF row binds nothing: !bound(?m) keeps exactly that row,
    # so every focus still appears exactly once
    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:T ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this <http://example.org/p> ?v .
          VALUES ?m { "tagged" UNDEF }
          FILTER(!bound(?m))
        }''' ] .
    """
    assert _run(spark, shapes) == [
        "http://example.org/a", "http://example.org/b",
    ]


def test_group_by_named_expr_key(spark):
    # GROUP BY a computed boolean bucket: a's scores split 5 | 10,20
    # and b's 1,2 land in one bucket — only groups of >=2 survive
    got = _run_agg(spark, """
      SELECT $this ?bucket (COUNT(?s) AS ?n)
      WHERE { $this <http://example.org/score> ?s }
      GROUP BY $this ((?s > 6) AS ?bucket)
      HAVING (COUNT(?s) >= 2)""")
    assert got == ["a", "b"]


def test_group_by_anonymous_expr_key(spark):
    # same partitioning with no AS: the internal key column must group
    # correctly and not leak into the result
    got = _run_agg(spark, """
      SELECT $this (COUNT(?s) AS ?n)
      WHERE { $this <http://example.org/score> ?s }
      GROUP BY $this ((?s > 6))
      HAVING (COUNT(?s) >= 2)""")
    assert got == ["a", "b"]


def test_kleene_cycle_semantics_fast_and_distributed_paths_agree(
    spark, monkeypatch
):
    """The p+ closure has two executions: the memoized driver BFS served
    as one broadcast join (dataset.py::kleene_pairs(spec=True)) and the
    checkpointed distributed frontier fixpoint for edge sets past the
    driver cap. Both must re-emit the start node through a cycle (the
    spec-vs-SHACL divergence), and both must agree on a graph mixing a
    2-cycle, a self-loop, and an open chain."""
    from shacl_rust_spark.engine import dataset as ds_mod

    shapes = PRE + """
    ex:S a sh:NodeShape ; sh:targetClass ex:N ;
      sh:sparql [ sh:select '''
        SELECT $this WHERE {
          $this <http://example.org/next>+ $this .
        }''' ] .
    """
    fast = _run(spark, shapes)
    # force the distributed fixpoint: a zero edge cap makes
    # kleene_pairs return None for every predicate
    monkeypatch.setattr(ds_mod.Dataset, "_MAX_KLEENE_EDGES", 0)
    slow = _run(spark, shapes)
    assert fast == slow == ["http://example.org/n1"]


def test_kleene_pairs_spec_mode_reemits_start(spark):
    """dataset.kleene_pairs: spec=True (SPARQL ALP) emits (a, a) for a
    cycle a->b->a and (s, s) for a self-loop; spec=False (the reference
    SHACL walker, path.rs:141-171) emits neither. The two modes memoize
    under distinct keys."""
    from shacl_rust_spark.engine.dataset import Dataset
    from shacl_rust_spark.rdf.turtle import parse_turtle

    data = """
    @prefix ex: <http://example.org/> .
    ex:a ex:next ex:b . ex:b ex:next ex:a .
    ex:s ex:next ex:s .
    ex:x ex:next ex:y .
    """
    ds = Dataset.from_graphs(spark, parse_turtle(data), parse_turtle(""))
    p = "http://example.org/next"

    def pairs(spec):
        df = ds.kleene_pairs(p, False, spec=spec)
        assert df is not None
        return sorted(
            (r.start.value, r.reached.value) for r in df.collect()
        )

    spec = pairs(True)
    shacl = pairs(False)
    ex = "http://example.org/"
    assert (f"{ex}a", f"{ex}a") in spec
    assert (f"{ex}s", f"{ex}s") in spec
    assert (f"{ex}a", f"{ex}a") not in shacl
    assert (f"{ex}s", f"{ex}s") not in shacl
    # shared non-cycle rows agree
    assert (f"{ex}x", f"{ex}y") in spec and (f"{ex}x", f"{ex}y") in shacl
