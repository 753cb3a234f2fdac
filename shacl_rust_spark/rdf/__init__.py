from .formats import (
    RdfFormatError, format_from_path, normalize_format, parse_rdf,
    parse_rdf_file,
)
from .graph import Graph
from .jsonld import JsonLdParseError, parse_jsonld
from .rdfxml import RdfXmlParseError, parse_rdfxml
from .serialize import (
    serialize_graph, to_jsonld, to_ntriples, to_nquads, to_rdfxml,
    to_trig, to_turtle,
)
from .turtle import TurtleParseError, parse_turtle, parse_turtle_file

__all__ = [
    "Graph",
    "JsonLdParseError",
    "RdfFormatError",
    "RdfXmlParseError",
    "TurtleParseError",
    "format_from_path",
    "normalize_format",
    "parse_jsonld",
    "parse_rdf",
    "parse_rdf_file",
    "parse_rdfxml",
    "parse_turtle",
    "parse_turtle_file",
    "serialize_graph",
    "to_jsonld",
    "to_rdfxml",
    "to_ntriples",
    "to_nquads",
    "to_trig",
    "to_turtle",
]
