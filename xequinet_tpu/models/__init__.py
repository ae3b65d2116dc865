from .model import (
    BlockStack,
    init_params,
    make_apply_forward,
    resolve_model,
)
from .output import resolve_output
from .properties import compute_edge_data, make_forward

__all__ = [
    "resolve_model",
    "resolve_output",
    "BlockStack",
    "init_params",
    "make_apply_forward",
    "make_forward",
    "compute_edge_data",
]
