from .dataset import Dataset
from .engine import Report, Validator, validate_dataset, validate_graphs, validate_strings

__all__ = [
    "Dataset",
    "Report",
    "Validator",
    "validate_dataset",
    "validate_graphs",
    "validate_strings",
]
