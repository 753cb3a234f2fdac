from .ir import Path, Shape, Target
from .parser import parse_shapes

__all__ = ["Path", "Shape", "Target", "parse_shapes"]
