"""PaiNN baseline: vector-feature (l=1 only) message passing, no CG algebra.

TPU-native counterpart of /root/reference/xequinet/nn/painn.py.  The
equivariant state is a plain [N, 3, D] vector field; spherical harmonics
are just the unit edge vectors, matching the original PaiNN formulation.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from .. import keys
from ..ops.scatter import segment_sum
from .basic import AtomEmbedding, resolve_activation
from .rbf import resolve_cutoff, resolve_rbf

Array = jnp.ndarray
DataDict = Dict[str, Array]


class PainnEmbedding(nn.Module):
    """Embedding + rbf/cutoff + unit edge vectors
    (reference nn/painn.py:14-64)."""

    node_dim: int = 128
    num_basis: int = 20
    embed_basis: str = "one-hot"
    aux_basis: str = "aux56"
    rbf_kernel: str = "bessel"
    cutoff: float = 5.0
    cutoff_fn: str = "cosine"

    @nn.compact
    def __call__(self, data: DataDict) -> DataDict:
        atomic_numbers = data[keys.ATOMIC_NUMBERS]
        vectors = data[keys.EDGE_VECTOR]
        distances = data[keys.EDGE_LENGTH][..., None]

        embed_table = None
        if self.embed_basis != "one-hot":
            from ..utils.qc import get_embedding_table

            embed_table = get_embedding_table(self.embed_basis, self.aux_basis)
        node_invariant = AtomEmbedding(
            node_dim=self.node_dim, embed_table=embed_table
        )(atomic_numbers)
        data[keys.NODE_INVARIANT] = node_invariant

        data[keys.RADIAL_BASIS_FUNCTION] = resolve_rbf(
            self.rbf_kernel, self.num_basis, self.cutoff
        )(distances)
        data[keys.ENVELOPE_FUNCTION] = resolve_cutoff(self.cutoff_fn, self.cutoff)(
            distances
        )
        # unit vectors with padding-safe division
        safe = jnp.maximum(distances, 1e-9)
        data[keys.SPHERICAL_HARMONICS] = jnp.where(
            data[keys.EDGE_MASK][:, None], vectors / safe, 0.0
        )
        data[keys.NODE_EQUIVARIANT] = jnp.zeros(
            (node_invariant.shape[0], 3, self.node_dim), dtype=node_invariant.dtype
        )
        return data


class PainnMessage(nn.Module):
    """Message block (reference nn/painn.py:67-121)."""

    node_dim: int = 128
    num_basis: int = 20
    activation: str = "silu"

    @nn.compact
    def __call__(self, data: DataDict) -> DataDict:
        act = resolve_activation(self.activation)
        node_scalar = data[keys.NODE_INVARIANT]
        node_equi = data[keys.NODE_EQUIVARIANT]  # [N, 3, D]
        rbf = data[keys.RADIAL_BASIS_FUNCTION]
        fcut = data[keys.ENVELOPE_FUNCTION]
        uvec = data[keys.SPHERICAL_HARMONICS]  # [E, 3]
        edge_index = data[keys.EDGE_INDEX]
        center_idx = edge_index[keys.CENTER_IDX]
        neighbor_idx = edge_index[keys.NEIGHBOR_IDX]
        edge_mask = data[keys.EDGE_MASK]
        n_nodes = node_scalar.shape[0]
        d = self.node_dim

        h = act(nn.Dense(d)(node_scalar))
        scalar_out = nn.Dense(3 * d)(h)
        filter_weight = nn.Dense(3 * d)(rbf) * fcut
        filter_out = jnp.take(scalar_out, neighbor_idx, axis=0) * filter_weight

        message_scalar = filter_out[..., :d]
        gate_edge_vector = filter_out[..., d : 2 * d]
        gate_state_vector = filter_out[..., 2 * d :]

        message_vector = jnp.take(node_equi, neighbor_idx, axis=0) * gate_state_vector[
            :, None, :
        ] + gate_edge_vector[:, None, :] * uvec[:, :, None]

        data[keys.NODE_INVARIANT] = data[keys.NODE_INVARIANT] + segment_sum(
            message_scalar, center_idx, n_nodes, edge_mask,
            indices_are_sorted=True, scope="edges",
        )
        data[keys.NODE_EQUIVARIANT] = data[keys.NODE_EQUIVARIANT] + segment_sum(
            message_vector, center_idx, n_nodes, edge_mask,
            indices_are_sorted=True, scope="edges",
        )
        return data


class PainnUpdate(nn.Module):
    """Update block (reference nn/painn.py:124-170)."""

    node_dim: int = 128
    activation: str = "silu"

    @nn.compact
    def __call__(self, data: DataDict) -> DataDict:
        act = resolve_activation(self.activation)
        node_scalar = data[keys.NODE_INVARIANT]
        node_equi = data[keys.NODE_EQUIVARIANT]
        d = self.node_dim

        u_vec = nn.Dense(d, use_bias=False)(node_equi)
        v_vec = nn.Dense(d, use_bias=False)(node_equi)

        v_norm = jnp.linalg.norm(v_vec + 1e-12, axis=1)
        mlp_in = jnp.concatenate([node_scalar, v_norm], axis=-1)
        mlp_out = nn.Dense(3 * d)(act(nn.Dense(d)(mlp_in)))

        a_ss = mlp_out[..., :d]
        a_vv = mlp_out[..., d : 2 * d]
        a_sv = mlp_out[..., 2 * d :]

        d_vec = a_vv[:, None, :] * u_vec
        inner = jnp.sum(u_vec * v_vec, axis=1)
        d_scalar = a_sv * inner + a_ss

        data[keys.NODE_INVARIANT] = node_scalar + d_scalar
        data[keys.NODE_EQUIVARIANT] = node_equi + d_vec
        return data
