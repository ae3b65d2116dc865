"""Higher-order tensor machinery: SelfMixTP, Sph2Cart, CartTensorOut.

TPU-native counterpart of /root/reference/xequinet/nn/xe3net.py (SelfMixTP,
Sph2Cart) and nn/output.py:375-465 (CartTensorOut).  The broken
``LTCEmbeding`` of the reference (xe3net.py:51,86-87 references undefined
attributes) is intentionally not replicated (SURVEY.md §2.1).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from .. import keys
from ..ops.cartesian import reduced_tensor_basis
from ..ops.irreps import Irrep, Irreps
from ..ops.scatter import segment_sum
from ..ops.tensor_product import TensorProduct, get_feasible_tp
from .basic import ScalarMLP
from .o3layer import EquivariantLayerNorm, O3Linear, TensorProductModule

Array = jnp.ndarray
DataDict = Dict[str, Array]


def selfmix_irreps(irreps_in: Irreps, hidden_channel: int):
    """The hidden/mix/output irreps of SelfMixTP
    (reference nn/xe3net.py:117-141)."""
    irreps_in = Irreps(irreps_in)
    lmax = irreps_in.lmax
    irreps_hid = Irreps([(hidden_channel, mi.ir) for mi in irreps_in])
    mix = [(hidden_channel, Irrep(0, 1))]
    for l in range(2, 2 * lmax):
        mix.append((hidden_channel, Irrep(l, -1)))
        mix.append((hidden_channel, Irrep(l, 1)))
    mix.append((hidden_channel, Irrep(2 * lmax, 1)))
    irreps_mix = Irreps(mix)
    irreps_out, instructions = get_feasible_tp(irreps_hid, irreps_hid, irreps_mix, "uuu")
    return irreps_hid, irreps_out, instructions


class SelfMixTP(nn.Module):
    """Expand node features to higher l (incl. odd parities) via a gated
    uuu self tensor product (reference nn/xe3net.py:102-162)."""

    irreps_in: Irreps
    hidden_channel: int = 32
    layer_norm: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        irreps_in = Irreps(self.irreps_in)
        irreps_hid, irreps_out, instructions = selfmix_irreps(
            irreps_in, self.hidden_channel
        )
        x_u = O3Linear(irreps_in, irreps_hid)(x)
        x_v = O3Linear(irreps_in, irreps_hid)(x)
        tp = TensorProduct(irreps_hid, irreps_hid, irreps_out, instructions)
        x_mix = TensorProductModule(tp=tp)(x_u, x_v)
        if self.layer_norm:
            x_mix = EquivariantLayerNorm(irreps=irreps_out)(x_mix)
        return x_mix

    @staticmethod
    def irreps_out_of(irreps_in: Irreps, hidden_channel: int) -> Irreps:
        return selfmix_irreps(irreps_in, hidden_channel)[1]


class Sph2Cart(nn.Module):
    """Spherical -> Cartesian change of basis
    (reference nn/xe3net.py:165-192); axes in the irrep basis."""

    formula: str

    def setup(self) -> None:
        self.rtp_irreps, self._Q = reduced_tensor_basis(self.formula)
        self._n = len(self.formula.split("=")[0].replace("-", ""))

    def __call__(self, x_sph: Array) -> Array:
        Q = jnp.asarray(self._Q, dtype=x_sph.dtype)
        cart = jnp.einsum(
            "...d,dc->...c", x_sph, Q, precision=lax.Precision.HIGHEST
        )
        return cart.reshape(x_sph.shape[:-1] + (3,) * self._n)


class CartTensorOut(nn.Module):
    """Rank-n Cartesian tensor head via SelfMixTP -> weighted uuw TP ->
    Sph2Cart (reference nn/output.py:375-465)."""

    node_dim: int = 128
    node_irreps: Irreps = Irreps("128x0e+64x1o+32x2e")
    hidden_dim: int = 64
    hidden_channels: int = 32
    order: int = 2
    symmetry: str = "ij"
    activation: str = "silu"
    reduce_op: Optional[str] = "sum"
    layer_norm: bool = True
    isotropic: bool = False
    output_field: str = keys.CARTESIAN_TENSOR

    @nn.compact
    def __call__(self, data: DataDict) -> DataDict:
        if self.order != 2 and self.isotropic:
            raise ValueError("Isotropic output is only supported for order 2.")
        node_irreps = Irreps(self.node_irreps)
        batch = data[keys.BATCH]
        node_scalar = data[keys.NODE_INVARIANT]
        node_equi = data[keys.NODE_EQUIVARIANT]
        node_mask = data[keys.NODE_MASK]
        n_graphs = data[keys.GRAPH_MASK].shape[0]

        mixed_irreps = SelfMixTP.irreps_out_of(node_irreps, self.hidden_channels)
        tp_in = SelfMixTP(
            irreps_in=node_irreps,
            hidden_channel=self.hidden_channels,
            layer_norm=self.layer_norm,
        )(node_equi)

        rtp_irreps, _ = reduced_tensor_basis(self.symmetry)
        sph_irreps, instructions = get_feasible_tp(
            mixed_irreps, mixed_irreps, rtp_irreps, "uuw"
        )
        tp = TensorProduct(mixed_irreps, mixed_irreps, sph_irreps, instructions)
        tp_weight = ScalarMLP(
            hidden_dim=self.hidden_dim,
            out_dim=tp.weight_numel,
            activation=self.activation,
        )(node_scalar)
        out_equi = tp.apply(tp_in, tp_in, tp_weight)
        if sph_irreps != rtp_irreps:
            out_equi = O3Linear(sph_irreps, rtp_irreps)(out_equi)

        out_cart = Sph2Cart(formula=self.symmetry)(out_equi)
        if self.reduce_op is not None:
            flat = out_cart.reshape(out_cart.shape[0], -1)
            if self.reduce_op == "sum":
                red = segment_sum(flat, batch, n_graphs, node_mask, indices_are_sorted=True)
            elif self.reduce_op == "mean":
                tot = segment_sum(flat, batch, n_graphs, node_mask, indices_are_sorted=True)
                cnt = segment_sum(
                    jnp.ones(flat.shape[:1], flat.dtype), batch, n_graphs, node_mask
                )
                red = tot / jnp.maximum(cnt, 1.0)[:, None]
            else:
                raise NotImplementedError(self.reduce_op)
            out_cart = red.reshape((n_graphs,) + out_cart.shape[1:])

        if self.isotropic:
            cart_tensor = jnp.trace(out_cart, axis1=-2, axis2=-1) / 3.0
        else:
            # [y,z,x] -> [x,y,z] on every Cartesian axis
            # (reference nn/output.py:459-461)
            for axis in range(1, out_cart.ndim):
                out_cart = jnp.roll(out_cart, shift=1, axis=axis)
            cart_tensor = out_cart
        data[self.output_field] = cart_tensor
        return data
