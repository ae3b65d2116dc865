from .irreps import Irrep, Irreps, MulIrrep, cat_flat, split_flat
from .o3ops import (
    equivariant_dot,
    equivariant_layer_norm,
    invariant,
    scalar_gate,
    scalar_indices,
)
from .scatter import gather_nodes, segment_mean, segment_sum
from .spherical import spherical_harmonics
from .tensor_product import Instruction, TensorProduct, get_feasible_tp
from .wigner import irrep_inner_coeff, wigner_3j

__all__ = [
    "Irrep",
    "Irreps",
    "MulIrrep",
    "split_flat",
    "cat_flat",
    "invariant",
    "equivariant_dot",
    "equivariant_layer_norm",
    "scalar_gate",
    "scalar_indices",
    "segment_sum",
    "segment_mean",
    "gather_nodes",
    "spherical_harmonics",
    "TensorProduct",
    "Instruction",
    "get_feasible_tp",
    "wigner_3j",
    "irrep_inner_coeff",
]
