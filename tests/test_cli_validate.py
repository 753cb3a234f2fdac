"""CLI `validate` surface parity with the reference binary
(crates/shacl-cli/src/main.rs:44-77, 273-385): positional
SHAPES_FILE DATA_FILE... spelling, the RdfFormat::from_extension
output-format registry (main.rs:350-366), -v info lines / --quiet
(main.rs:17-20, 74), --output file sink, and the conforms exit code
(main.rs:379-382).
"""

import pytest

from shacl_rust_spark.cli import main as cli_main
from shacl_rust_spark.rdf import parse_rdf
from shacl_rust_spark.vocab import SH

SHAPES_TTL = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:PersonShape a sh:NodeShape ; sh:targetClass ex:Person ;
  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
"""

BAD_TTL = """
@prefix ex: <http://example.org/> .
ex:bob a ex:Person .
"""

GOOD_TTL = """
@prefix ex: <http://example.org/> .
ex:ann a ex:Person ; ex:name "Ann" .
"""


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_validate")
    paths = {}
    for name, text in [("shapes.ttl", SHAPES_TTL), ("bad.ttl", BAD_TTL),
                       ("good.ttl", GOOD_TTL)]:
        p = d / name
        p.write_text(text)
        paths[name] = str(p)
    paths["dir"] = str(d)
    return paths


def test_positional_spelling_nonconforming_exit_1(spark, files, capsys):
    rc = cli_main(["validate", files["shapes.ttl"], files["bad.ttl"],
                   "--cpus", "4"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "MinCountConstraintComponent" in out or "fewer than" in out


def test_conforming_exit_0(spark, files, capsys):
    rc = cli_main(["validate", files["shapes.ttl"], files["good.ttl"],
                   "--cpus", "4"])
    assert rc == 0
    assert "conform" in capsys.readouterr().out.lower()


def test_multiple_data_files_union(spark, files, capsys):
    rc = cli_main(["validate", files["shapes.ttl"], files["good.ttl"],
                   files["bad.ttl"], "--cpus", "4"])
    capsys.readouterr()
    assert rc == 1  # bob still has no name


@pytest.mark.parametrize("fmt", ["ttl", "nt", "nq", "rdf", "jsonld", "trig"])
def test_output_format_registry_emits_parseable_report(
        spark, files, capsys, fmt):
    rc = cli_main(["validate", files["shapes.ttl"], files["bad.ttl"],
                   "--output-format", fmt, "--cpus", "4"])
    out = capsys.readouterr().out
    assert rc == 1
    g = parse_rdf(out, fmt)
    preds = {t.p for t in g}
    assert SH + "conforms" in preds
    assert SH + "focusNode" in preds


def test_unknown_output_format_errors_like_reference(spark, files, capsys):
    # main.rs:353-358 — yaml appears in the reference's own supported
    # list yet from_extension rejects it; we reproduce both halves
    rc = cli_main(["validate", files["shapes.ttl"], files["bad.ttl"],
                   "--output-format", "yaml", "--cpus", "4"])
    err = capsys.readouterr().err
    assert rc == 1
    assert "Unsupported output format" in err


def test_verbose_info_lines_and_quiet(spark, files, capsys):
    cli_main(["-v", "validate", files["shapes.ttl"], files["good.ttl"],
              "--cpus", "4"])
    err = capsys.readouterr().err
    assert "loaded with" in err
    cli_main(["-v", "validate", files["shapes.ttl"], files["good.ttl"],
              "--quiet", "--cpus", "4"])
    assert "loaded with" not in capsys.readouterr().err


def test_quite_visible_alias(spark, files, capsys):
    # main.rs:74 visible_alias = "quite"
    rc = cli_main(["validate", files["shapes.ttl"], files["good.ttl"],
                   "--quite", "--cpus", "4"])
    capsys.readouterr()
    assert rc == 0


def test_output_file_sink(spark, files, capsys, tmp_path):
    out_path = tmp_path / "report.ttl"
    rc = cli_main(["validate", files["shapes.ttl"], files["bad.ttl"],
                   "--output", str(out_path), "--output-format", "ttl",
                   "--cpus", "4"])
    capsys.readouterr()
    assert rc == 1
    g = parse_rdf(out_path.read_text(), "ttl")
    assert SH + "conforms" in {t.p for t in g}


def test_flag_spelling_still_works(spark, files, capsys):
    rc = cli_main(["validate", "--shapes", files["shapes.ttl"],
                   "--data", files["good.ttl"], "--cpus", "4"])
    capsys.readouterr()
    assert rc == 0


@pytest.fixture(scope="module")
def triples_parquet(spark, files, tmp_path_factory):
    from shacl_rust_spark.rdf import parse_rdf_file
    from shacl_rust_spark.schema import graph_to_df

    out = str(tmp_path_factory.mktemp("cli_validate_pq") / "triples")
    g = parse_rdf_file(files["bad.ttl"]).union(
        parse_rdf_file(files["good.ttl"]))
    graph_to_df(spark, g).write.partitionBy("p").parquet(out)
    return out


def test_data_parquet_table_backed_validation(
        spark, files, triples_parquet, capsys):
    rc = cli_main(["validate", files["shapes.ttl"],
                   "--data-parquet", triples_parquet, "--cpus", "4"])
    out = capsys.readouterr().out
    assert rc == 1  # bob (from bad.ttl) still lacks ex:name
    assert "MinCountConstraintComponent" in out or "fewer than" in out


def test_data_parquet_unions_with_parsed_files(
        spark, files, triples_parquet, tmp_path, capsys):
    # a parsed file supplying bob's missing name flips the verdict
    fix = tmp_path / "fix.ttl"
    fix.write_text('@prefix ex: <http://example.org/> .\n'
                   'ex:bob ex:name "Bob" .\n')
    rc = cli_main(["validate", files["shapes.ttl"], str(fix),
                   "--data-parquet", triples_parquet, "--cpus", "4"])
    capsys.readouterr()
    assert rc == 0


FUSED_SHAPES_TTL = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
ex:SubjShape a sh:NodeShape ; sh:targetSubjectsOf ex:p ;
  sh:property [ sh:path ex:p ; sh:minCount 2 ; sh:maxCount 2 ] ;
  sh:property [ sh:path ex:p ;
    sh:qualifiedValueShape [ sh:nodeKind sh:IRI ] ;
    sh:qualifiedMinCount 2 ] .
"""

DUP_DATA_TTL = """
@prefix ex: <http://example.org/> .
ex:a ex:p ex:v1 , ex:v2 .
ex:b ex:p ex:v1 .
ex:c ex:p ex:v1 , ex:v2 , ex:v3 .
"""


def test_data_parquet_duplicate_rows_keep_set_semantics(
        spark, tmp_path, capsys):
    """A parquet triples table with every (s,p,o) row TRIPLICATED must
    validate exactly like the set-semantics graph (VERDICT r2 #1): the
    shapes use sh:targetSubjectsOf so the fused target-path plan is the
    one exercised, and min/max/qualified counts must not inflate.
    Reference graphs are sets by construction (src/rdf.rs Graph =
    HashSet), so the reference-equal answer is the deduplicated one."""
    import json as _json

    from shacl_rust_spark.rdf import parse_rdf
    from shacl_rust_spark.schema import graph_to_df

    d = tmp_path
    shapes_p = d / "fused_shapes.ttl"
    shapes_p.write_text(FUSED_SHAPES_TTL)
    clean_p = d / "dupdata.ttl"
    clean_p.write_text(DUP_DATA_TTL)

    df = graph_to_df(spark, parse_rdf(DUP_DATA_TTL, "ttl"))
    dup = df.unionByName(df).unionByName(df)
    pq = str(d / "dup_triples")
    dup.write.partitionBy("p").parquet(pq)
    assert spark.read.parquet(pq).count() == 3 * df.count()

    def report(args):
        rc = cli_main(["validate", *args, "--output-format", "json",
                       "--cpus", "4"])
        out = _json.loads(capsys.readouterr().out)
        rows = sorted(
            (r["focusNode"], r["sourceConstraintComponent"])
            for r in out["results"]
        )
        return rc, rows

    rc_pq, rows_pq = report([str(shapes_p), "--data-parquet", pq])
    rc_ttl, rows_ttl = report([str(shapes_p), str(clean_p)])
    assert rc_pq == rc_ttl == 1
    assert rows_pq == rows_ttl
    # the expected set-semantics answer: ex:b violates minCount and
    # qualifiedMinCount; ex:c violates maxCount; ex:a conforms
    focus_comps = {(f.strip("<>").rsplit("/", 1)[-1], c.rsplit("#", 1)[-1])
                   for f, c in rows_pq}
    assert focus_comps == {
        ("b", "MinCountConstraintComponent"),
        ("b", "QualifiedMinCountConstraintComponent"),
        ("c", "MaxCountConstraintComponent"),
    }


def test_data_parquet_rejects_wrong_schema(spark, files, tmp_path, capsys):
    bad = str(tmp_path / "not_triples")
    spark.range(3).write.parquet(bad)
    rc = cli_main(["validate", files["shapes.ttl"],
                   "--data-parquet", bad, "--cpus", "4"])
    err = capsys.readouterr().err
    assert rc == 2
    assert "not a triples table" in err


def test_export_roundtrips_through_driver_serializer(spark, tmp_path,
                                                     capsys):
    """CLI export over a TRIPLES_TYPE parquet table emits byte-for-byte
    the driver serializer's to_ntriples lines (unordered)."""
    from shacl_rust_spark.cli import main
    from shacl_rust_spark.rdf.graph import Graph
    from shacl_rust_spark.rdf.serialize import to_ntriples
    from shacl_rust_spark.schema import graph_to_df
    from shacl_rust_spark.term import Triple, bnode, iri, literal

    g = Graph()
    for t in [
        Triple(iri("http://x/s"), "http://x/p", iri("http://x/o")),
        Triple(bnode("b0"), "http://x/p", literal('we said "hi"\n')),
        Triple(iri("http://x/s"), "http://x/q",
               literal("chat", lang="en")),
        Triple(iri("http://x/s"), "http://x/r",
               literal("5", datatype="http://www.w3.org/2001/"
                            "XMLSchema#integer")),
    ]:
        g.add(t)
    path = str(tmp_path / "triples.parquet")
    graph_to_df(spark, g).write.parquet(path)

    out_dir = str(tmp_path / "out_nt")
    assert main(["export", "--data-parquet", path, "-o", out_dir,
                 "--cpus", "2"]) == 0
    got = sorted(
        ln for r in spark.read.text(out_dir).collect()
        if (ln := r.value.strip())
    )
    want = sorted(ln for ln in to_ntriples(g).splitlines() if ln)
    assert got == want

    # stdout streaming path
    assert main(["export", "--data-parquet", path, "--cpus", "2"]) == 0
    streamed = sorted(
        ln for ln in capsys.readouterr().out.splitlines() if ln.strip()
    )
    assert streamed == want

    # schema rejection
    bad = str(tmp_path / "bad.parquet")
    spark.range(3).write.parquet(bad)
    assert main(["export", "--data-parquet", bad, "-o", out_dir,
                 "--cpus", "2"]) == 1
