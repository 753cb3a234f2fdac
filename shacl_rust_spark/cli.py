"""CLI validator — the analog of `shacl-validator validate`
(/root/reference/crates/shacl-cli/src/main.rs:95-148, 273-385).

    python -m shacl_rust_spark.cli validate \
        --data a.ttl [--data b.jsonld ...] --shapes shapes.ttl \
        [--data-format ttl|nt|nq|rdf|jsonld|trig] [--shapes-format ...] \
        [--output-format text|json|rdf|ttl|nt] [--cpus 8]

Multiple --data files are parsed and unioned into one graph
(main.rs:286-320; graph = SET of triples, so the union dedups). Input
format defaults to each file's extension (rdf.rs RdfFormat::from_extension
semantics) and can be forced with --data-format / --shapes-format.
--output-format rdf emits the report graph as N-Triples (back-compat
alias of nt); ttl emits Turtle with prefix compaction (rdf.rs:59-81).
Exit code 1 when the data does not conform (main.rs:379-382).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="shacl-validator")
    sub = ap.add_subparsers(dest="command", required=True)
    val = sub.add_parser("validate")
    val.add_argument("--data", action="append", required=True)
    val.add_argument("--shapes", required=True)
    val.add_argument("--data-format", default=None,
                     help="force input format for every --data file "
                          "(default: per-file extension)")
    val.add_argument("--shapes-format", default=None)
    val.add_argument("--output-format", default="text",
                     choices=["text", "json", "rdf", "ttl", "nt"])
    val.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from .engine.engine import validate_graphs
    from .rdf import parse_rdf_file
    from .rdf.graph import Graph

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("shacl-validator")
        .config("spark.sql.shuffle.partitions", str(max(args.cpus, 8)))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    data = Graph()
    for path in args.data:
        data = data.union(parse_rdf_file(path, args.data_format))
    shapes = parse_rdf_file(args.shapes, args.shapes_format)

    report = validate_graphs(spark, data, shapes)

    if args.output_format == "text":
        print(report.to_text())
    elif args.output_format == "json":
        print(json.dumps(report.to_json(), indent=2))
    else:
        from .rdf import serialize_graph
        from .schema import df_to_triples

        g = Graph(df_to_triples(report.to_graph_df()))
        fmt = "nt" if args.output_format == "rdf" else args.output_format
        print(serialize_graph(g, fmt), end="")

    return 0 if report.conforms else 1


if __name__ == "__main__":
    sys.exit(main())
