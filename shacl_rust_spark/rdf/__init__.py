from .graph import Graph
from .turtle import TurtleParseError, parse_turtle, parse_turtle_file

__all__ = ["Graph", "TurtleParseError", "parse_turtle", "parse_turtle_file"]
