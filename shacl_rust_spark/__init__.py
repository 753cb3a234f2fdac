"""shacl_rust_spark — PySpark-native KG construction + SHACL validation.

A from-scratch Spark-first engine with the query capabilities of the
reference validator `ensaremirerol/shacl-rust` (see SURVEY.md): the data
graph is a (large, partitioned) triples DataFrame; shapes compile on the
driver into set-oriented DataFrame plans (targets → path joins →
constraint predicates/aggregations → violations DataFrame).
"""

__version__ = "0.1.0"

# Convenience re-exports mirroring the reference's public surface
# (reference src/lib.rs:9-19 re-exports Shape/Target/Path IR,
# parse_shapes, validate, and the report types at crate root).
from .engine import (  # noqa: E402
    Dataset,
    Report,
    Validator,
    validate_dataset,
    validate_graphs,
    validate_strings,
)
from .rdf import Graph, TurtleParseError, parse_turtle, serialize_graph  # noqa: E402
from .rdf.formats import parse_rdf, parse_rdf_file  # noqa: E402
from .shapes import Path, Shape, Target, parse_shapes  # noqa: E402
from .shapes.parser import ShapeParseError  # noqa: E402

__all__ = [
    "Dataset",
    "Graph",
    "Path",
    "Report",
    "Shape",
    "ShapeParseError",
    "Target",
    "TurtleParseError",
    "Validator",
    "parse_rdf",
    "parse_rdf_file",
    "parse_shapes",
    "parse_turtle",
    "serialize_graph",
    "validate_dataset",
    "validate_graphs",
    "validate_strings",
    "__version__",
]
