"""CLI — the analog of the reference's `shacl-validator` binary
(/root/reference/crates/shacl-cli/src/main.rs).

    python -m shacl_rust_spark.cli validate \
        --data a.ttl [--data b.jsonld ...] --shapes shapes.ttl \
        [--data-format ttl|nt|nq|rdf|jsonld|trig] [--shapes-format ...] \
        [--output-format text|json|rdf|ttl|nt] [--output report.ttl] \
        [--cpus 8]
    python -m shacl_rust_spark.cli parse SHAPES_FILE \
        [--format ttl|...] [--output pretty|json|compact]
    python -m shacl_rust_spark.cli info SHAPES_FILE \
        [--format ttl|...] [--detailed]

`validate` (main.rs:118-137, 273-385): multiple --data files are parsed
and unioned into one graph (main.rs:286-320; graph = SET of triples, so
the union dedups). Input format defaults to each file's extension
(rdf.rs RdfFormat::from_extension semantics) and can be forced with
--data-format / --shapes-format. --output-format rdf emits the report
graph as N-Triples (back-compat alias of nt); ttl emits Turtle with
prefix compaction (rdf.rs:59-81). --output writes the report to a file
instead of stdout (main.rs:66-68, 340-366). Exit code 1 when the data
does not conform (main.rs:379-382).

`parse` (main.rs:110-116, 150-252) and `info` (main.rs:139-145,
255-268) inspect the shapes graph driver-side — no Spark session is
started for either.
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_command(args) -> int:
    from .rdf import parse_rdf_file
    from .shapes.describe import shapes_compact, shapes_json, shapes_pretty
    from .shapes.parser import parse_shapes

    graph = parse_rdf_file(args.shapes_file, args.format)
    shapes = parse_shapes(graph)
    if args.output == "pretty":
        print(shapes_pretty(shapes))
    elif args.output == "json":
        print(json.dumps(shapes_json(shapes), indent=2))
    elif args.output == "compact":
        print(shapes_compact(shapes))
    else:
        print(
            f"Unknown output format: {args.output}. "
            "Use 'pretty', 'json', or 'compact'",
            file=sys.stderr,
        )
        return 2
    return 0


def _info_command(args) -> int:
    from .rdf import parse_rdf_file
    from .shapes.describe import shapes_info
    from .shapes.parser import parse_shapes

    graph = parse_rdf_file(args.shapes_file, args.format)
    shapes = parse_shapes(graph)
    print(shapes_info(shapes, len(graph), args.detailed))
    return 0


def _validate_command(args) -> int:
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
        rendered = report.to_text()
    elif args.output_format == "json":
        rendered = json.dumps(report.to_json(), indent=2)
    else:
        from .rdf import serialize_graph
        from .schema import df_to_triples

        g = Graph(df_to_triples(report.to_graph_df()))
        fmt = "nt" if args.output_format == "rdf" else args.output_format
        rendered = serialize_graph(g, fmt)

    if args.output:
        with open(args.output, "w") as f:
            f.write(rendered if rendered.endswith("\n") else rendered + "\n")
    elif args.output_format in ("text", "json"):
        print(rendered)
    else:
        print(rendered, end="")

    return 0 if report.conforms else 1


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
    val.add_argument("--output", default=None,
                     help="write the report to this file instead of stdout")
    val.add_argument("--cpus", type=int, default=8)

    par = sub.add_parser("parse")
    par.add_argument("shapes_file")
    par.add_argument("--format", "-f", default=None)
    par.add_argument("--output", "-o", default="pretty",
                     help="pretty | json | compact")

    inf = sub.add_parser("info")
    inf.add_argument("shapes_file")
    inf.add_argument("--format", "-f", default=None)
    inf.add_argument("--detailed", "-d", action="store_true")

    args = ap.parse_args(argv)
    if args.command == "parse":
        return _parse_command(args)
    if args.command == "info":
        return _info_command(args)
    return _validate_command(args)


if __name__ == "__main__":
    sys.exit(main())
