"""Equivariant layers with parameters: O3Linear, Gate, EquivariantLayerNorm,
and the weighted TensorProduct module.

TPU-native counterpart of /root/reference/xequinet/nn/o3layer.py plus the
e3nn ``o3.Linear`` / ``o3.TensorProduct`` modules it instantiates.
"""

from __future__ import annotations

from typing import Optional, Union

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.irreps import Irreps
from ..ops.o3ops import equivariant_layer_norm, invariant, scalar_gate
from ..ops.tensor_product import TensorProduct
from .basic import resolve_activation


class O3Linear(nn.Module):
    """Equivariant linear layer: mixes multiplicities within each (l, p).

    Semantics of e3nn ``o3.Linear(irreps_in, irreps_out, biases=...)``
    (used at reference nn/xpainn.py:186-187, nn/output.py:215-217 etc.):
    weights init ~ N(0,1), forward scaled by 1/sqrt(fan_in); biases only
    on even scalar outputs.
    """

    irreps_in: Irreps
    irreps_out: Irreps
    biases: bool = False
    # bf16 phase 2: run the multiplicity-mixing einsums on the MXU in this
    # dtype (params stay f32; accumulation f32 via preferred_element_type)
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_block: bool = False):
        """Apply the layer, or with ``return_block`` just build and
        return ``(w_block, b_lane)`` so a caller can batch several
        equivariant linears sharing one input into a single matmul
        (XPainnUpdate fuses U and V this way).  Parameters are created
        identically in both modes."""
        irreps_in = Irreps(self.irreps_in)
        irreps_out = Irreps(self.irreps_out)
        sl_in = irreps_in.slices()
        sl_out = irreps_out.slices()
        cdtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else None

        # Round-4: assemble ONE block-diagonal [dim_in, dim_out] weight from
        # the per-path parameters (layout unchanged — checkpoints
        # interoperate) and run a single MXU matmul instead of a per-irrep
        # einsum/concat chain.  The kron-with-identity zeros are free MXU
        # lanes; the matmul is tiny next to the fusion-boundary cost the
        # old form paid (tools/remainder_breakdown.py).
        w_block = jnp.zeros((irreps_in.dim, irreps_out.dim), dtype=jnp.float32)
        b_lane = None
        for i_out, (mul_out, ir_out) in enumerate(irreps_out):
            paths = [
                (i_in, mi) for i_in, mi in enumerate(irreps_in) if mi.ir == ir_out
            ]
            fan_in = sum(mi.mul for _, mi in paths)
            norm = 1.0 / np.sqrt(max(fan_in, 1))
            eye_m = np.eye(ir_out.dim, dtype=np.float32)
            for i_in, mi in paths:
                w = self.param(
                    f"w{i_out}_{i_in}",
                    nn.initializers.normal(stddev=1.0),
                    (mi.mul, mul_out),
                )
                # kron(w, I_m): [mul_in*m, mul_out*m]
                blk = (w[:, None, :, None] * eye_m[None, :, None, :]).reshape(
                    mi.mul * ir_out.dim, mul_out * ir_out.dim
                )
                w_block = w_block.at[sl_in[i_in], sl_out[i_out]].add(blk * norm)
            if self.biases and ir_out.l == 0 and ir_out.p == 1:
                b = self.param(f"b{i_out}", nn.initializers.zeros, (mul_out,))
                if b_lane is None:
                    b_lane = jnp.zeros((irreps_out.dim,), dtype=jnp.float32)
                b_lane = b_lane.at[sl_out[i_out]].set(b)

        if return_block:
            return w_block, b_lane
        if cdtype is not None:
            y = jnp.dot(
                x.astype(cdtype), w_block.astype(cdtype),
                preferred_element_type=jnp.float32,
            )
        else:
            y = jnp.dot(x, w_block, precision=lax.Precision.HIGHEST)
        if b_lane is not None:
            y = y + b_lane
        return y


class Gate(nn.Module):
    """Invariant -> activation -> channel-wise gate
    (reference nn/o3layer.py:47-75)."""

    irreps: Irreps
    activation: str = "silu"
    refine: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        irreps = Irreps(self.irreps).simplify()
        x_inv = invariant(x, irreps)
        if self.refine:
            act = resolve_activation(self.activation, devide_x=True)
            h = nn.Dense(irreps.num_irreps, bias_init=nn.initializers.zeros)(x_inv)
            h = act(h)
            gates = nn.Dense(irreps.num_irreps, bias_init=nn.initializers.zeros)(h)
        else:
            act = resolve_activation(self.activation, devide_x=True)
            gates = act(x_inv)
        return scalar_gate(x, gates, irreps)


class EquivariantLayerNorm(nn.Module):
    """Equivariant LayerNorm (reference nn/o3layer.py:112-171)."""

    irreps: Irreps
    affine: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        irreps = Irreps(self.irreps)
        num_scalar = sum(mul for mul, ir in irreps if ir.l == 0 and ir.p == 1)
        if self.affine:
            weight = self.param(
                "weight", nn.initializers.ones, (irreps.num_irreps,)
            )
            bias = self.param("bias", nn.initializers.zeros, (max(num_scalar, 1),))
        else:
            weight = jnp.ones((irreps.num_irreps,))
            bias = jnp.zeros((max(num_scalar, 1),))
        return equivariant_layer_norm(x, irreps, weight, bias, self.eps)


class TensorProductModule(nn.Module):
    """Weighted tensor product with internal shared weights
    (e3nn ``o3.TensorProduct(..., internal_weights=True)``, used by
    SelfMixTP at reference nn/xe3net.py:141-150)."""

    tp: TensorProduct  # compiled, static

    @nn.compact
    def __call__(
        self, x1: jnp.ndarray, x2: jnp.ndarray, weights: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        if weights is None and self.tp.weight_numel > 0:
            weights = self.param(
                "weight",
                nn.initializers.normal(stddev=1.0),
                (self.tp.weight_numel,),
            )
        return self.tp.apply(x1, x2, weights)
