"""SO3krates: Euclidean attention message passing (Nat Commun 2024, 15,
6539), as adapted by the reference.

TPU-native counterpart of /root/reference/xequinet/nn/so3krates.py.  The
reference version is unregistered and contains two latent bugs we fix
rather than replicate (SURVEY.md §2.1): EquiFilter is fed node *scalars*
where its Invariant/Dot expect irreps features (so3krates.py:177 vs 56-58)
— here the filter consumes the equivariant state as the paper intends —
and InteractionBlock's ``node_dim + self.node_irreps`` concat dim
(so3krates.py:81) is the irrep count.
"""

from __future__ import annotations

import math
from typing import Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .. import keys
from ..ops.irreps import Irreps
from ..ops.o3ops import equivariant_dot, scalar_gate
from ..ops.scatter import segment_sum
from .basic import resolve_activation
from .o3layer import EquivariantLayerNorm

Array = jnp.ndarray
DataDict = Dict[str, Array]


class EquiFilter(nn.Module):
    """Per-edge filter: MLP(rbf) + MLP(invariants of x_j - x_i)
    (reference so3krates.py:14-62)."""

    node_dim: int
    node_irreps: Irreps
    activation: str = "silu"

    @nn.compact
    def __call__(
        self,
        x_equi: Array,
        rbf: Array,
        center_idx: Array,
        neighbor_idx: Array,
    ) -> Array:
        irreps = Irreps(self.node_irreps)
        act = resolve_activation(self.activation)
        x_i = jnp.take(x_equi, center_idx, axis=0)
        x_j = jnp.take(x_equi, neighbor_idx, axis=0)
        x_ij = x_j - x_i
        inv = equivariant_dot(x_ij, x_ij, irreps)
        w_l = nn.Dense(self.node_dim)(act(nn.Dense(self.node_dim)(inv)))
        w_r = nn.Dense(self.node_dim)(act(nn.Dense(self.node_dim)(rbf)))
        return w_l + w_r


class EuclideanAttention(nn.Module):
    """Multi-head per-edge attention with invariant and equivariant
    branches (reference so3krates.py:108-205; also exported under the
    reference's 'EculideanAttention' spelling)."""

    node_irreps: Irreps
    node_dim: int = 120
    num_heads: int = 4
    num_basis: int = 20
    activation: str = "silu"
    layer_norm: bool = True

    @nn.compact
    def __call__(self, data: DataDict) -> DataDict:
        irreps = Irreps(self.node_irreps)
        l_max = irreps.lmax
        d = self.node_dim
        assert d % self.num_heads == 0
        assert d % (l_max + 1) == 0
        attn_dim_scalar = d // self.num_heads
        attn_dim_equi = d // (l_max + 1)
        num_irreps = irreps.num_irreps
        scale_scalar = 1.0 / math.sqrt(d)
        scale_equi = 1.0 / math.sqrt(num_irreps)

        node_scalar = data[keys.NODE_INVARIANT]
        node_equi = data[keys.NODE_EQUIVARIANT]
        if self.layer_norm:
            node_scalar = nn.LayerNorm(epsilon=1e-5)(node_scalar)
            node_equi = EquivariantLayerNorm(irreps=irreps)(node_equi)
        rbf = data[keys.RADIAL_BASIS_FUNCTION]
        fcut = data[keys.ENVELOPE_FUNCTION]
        rsh = data[keys.SPHERICAL_HARMONICS]
        edge_index = data[keys.EDGE_INDEX]
        center_idx = edge_index[keys.CENTER_IDX]
        neighbor_idx = edge_index[keys.NEIGHBOR_IDX]
        edge_mask = data[keys.EDGE_MASK]
        n_nodes = node_scalar.shape[0]
        n_edges = center_idx.shape[0]

        q_inv = nn.Dense(d, use_bias=False)(node_scalar)
        k_inv = nn.Dense(d, use_bias=False)(node_scalar)
        v_inv = nn.Dense(d, use_bias=False)(node_scalar)
        q_sph = nn.Dense(d, use_bias=False)(node_scalar)
        k_sph = nn.Dense(d, use_bias=False)(node_scalar)
        v_sph = nn.Dense(num_irreps, use_bias=False)(node_scalar)

        w_ij = EquiFilter(
            node_dim=d, node_irreps=irreps, activation=self.activation
        )(node_equi, rbf, center_idx, neighbor_idx)
        w_ij = w_ij * fcut

        # invariant branch
        query_scalar = (jnp.take(q_inv, center_idx, axis=0) * w_ij).reshape(
            n_edges, self.num_heads, attn_dim_scalar
        )
        key_scalar = jnp.take(k_inv, neighbor_idx, axis=0).reshape(
            n_edges, self.num_heads, attn_dim_scalar
        )
        value_scalar = jnp.take(v_inv, neighbor_idx, axis=0).reshape(
            n_edges, self.num_heads, attn_dim_scalar
        )
        attn_scalar = (query_scalar * key_scalar).sum(-1, keepdims=True) * scale_scalar
        msg_scalar = (attn_scalar * value_scalar).reshape(n_edges, d)

        # equivariant branch
        query_equi = (jnp.take(q_sph, center_idx, axis=0) * w_ij).reshape(
            n_edges, l_max + 1, attn_dim_equi
        )
        key_equi = jnp.take(k_sph, neighbor_idx, axis=0).reshape(
            n_edges, l_max + 1, attn_dim_equi
        )
        value_equi = jnp.take(v_sph, neighbor_idx, axis=0)
        attn_equi = (query_equi * key_equi).sum(-1) * scale_equi  # [E, l_max+1]
        # broadcast each per-l attention over that l's multiplicities
        repeat_scheme = np.asarray([mi.mul for mi in irreps])
        attn_equi = jnp.repeat(
            attn_equi, repeat_scheme, axis=1, total_repeat_length=num_irreps
        )
        attn_gate = attn_equi * value_equi
        msg_equi = scalar_gate(rsh, attn_gate, irreps) * fcut[..., :1]

        data[keys.NODE_INVARIANT] = data[keys.NODE_INVARIANT] + segment_sum(
            msg_scalar, center_idx, n_nodes, edge_mask,
            indices_are_sorted=True, scope="edges",
        )
        data[keys.NODE_EQUIVARIANT] = data[keys.NODE_EQUIVARIANT] + segment_sum(
            msg_equi, center_idx, n_nodes, edge_mask,
            indices_are_sorted=True, scope="edges",
        )
        return data


# reference spelling kept for config compatibility
EculideanAttention = EuclideanAttention


class InteractionBlock(nn.Module):
    """Local mixing of scalar and equivariant channels
    (reference so3krates.py:65-105)."""

    node_irreps: Irreps
    node_dim: int = 128
    activation: str = "silu"
    layer_norm: bool = True

    @nn.compact
    def __call__(self, data: DataDict) -> DataDict:
        irreps = Irreps(self.node_irreps)
        num_irreps = irreps.num_irreps
        act = resolve_activation(self.activation)

        node_scalar = data[keys.NODE_INVARIANT]
        node_equi = data[keys.NODE_EQUIVARIANT]
        if self.layer_norm:
            node_scalar = nn.LayerNorm(epsilon=1e-5)(node_scalar)
            node_equi = EquivariantLayerNorm(irreps=irreps)(node_equi)

        equi_inv = equivariant_dot(node_equi, node_equi, irreps)
        cat = jnp.concatenate([node_scalar, equi_inv], axis=-1)
        concat_dim = self.node_dim + num_irreps
        mix = nn.Dense(concat_dim)(act(nn.Dense(concat_dim)(cat)))
        d_scalar = mix[..., : self.node_dim]
        x_gate = mix[..., self.node_dim :]
        d_equi = scalar_gate(node_equi, x_gate, irreps)

        data[keys.NODE_INVARIANT] = data[keys.NODE_INVARIANT] + d_scalar
        data[keys.NODE_EQUIVARIANT] = data[keys.NODE_EQUIVARIANT] + d_equi
        return data
