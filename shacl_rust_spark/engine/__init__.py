from .dataset import Dataset
from .engine import (
    Report,
    Validator,
    lint_data_text,
    lint_shapes_text,
    validate_dataset,
    validate_graphs,
    validate_strings,
)

__all__ = [
    "Dataset",
    "Report",
    "Validator",
    "lint_data_text",
    "lint_shapes_text",
    "validate_dataset",
    "validate_graphs",
    "validate_strings",
]
