"""Charge / spin conditioning via graph-attention embeddings.

TPU-native counterpart of /root/reference/xequinet/nn/electronic.py.
Whether conditioning is active is a *static* model property (the flax
module is only added to the stack when charge/spin keys are configured),
unlike the reference's runtime key check — XLA requires static graphs.
"""

from __future__ import annotations

import math
from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from .. import keys
from ..ops.scatter import segment_sum
from .basic import ResidualLayer

Array = jnp.ndarray
DataDict = Dict[str, Array]


class ChargeEmbedding(nn.Module):
    """Per-graph net charge -> (q+, q-) features -> softplus attention over
    the graph's atoms -> residual added to node scalars
    (reference nn/electronic.py:13-51)."""

    node_dim: int = 128
    activation: str = "silu"

    @nn.compact
    def __call__(self, data: DataDict) -> DataDict:
        if keys.TOTAL_CHARGE not in data:
            return data
        batch = data[keys.BATCH]
        node_scalar = data[keys.NODE_INVARIANT]
        node_mask = data[keys.NODE_MASK]
        charge = data[keys.TOTAL_CHARGE].astype(node_scalar.dtype)  # [G]

        charge_pm = nn.relu(jnp.stack([charge, -charge], axis=-1))  # [G, 2]
        charge_norm = jnp.maximum(charge_pm, 1.0)

        query = nn.Dense(self.node_dim)(node_scalar)  # [N, D]
        key_g = nn.Dense(self.node_dim, use_bias=False)(charge_pm / charge_norm)
        value_g = nn.Dense(self.node_dim, use_bias=False)(charge_pm)
        key = jnp.take(key_g, batch, axis=0)
        value = jnp.take(value_g, batch, axis=0)

        dot = jnp.sum(query * key, axis=-1, keepdims=True)
        attn = nn.softplus(dot / math.sqrt(self.node_dim))
        # the normalizer counts every REAL atom exactly once; under halo
        # decomposition it is the psum of the per-shard owned-row sums
        # (scope="graphs").  The per-row numerator stays UNmasked so halo
        # window rows carry the same embedding as their owning shard's
        # rows (they are deterministic functions of the row state).
        attn_masked = jnp.where(node_mask[:, None], attn, 0.0)
        n_graphs = data[keys.GRAPH_MASK].shape[0]
        attn_sum = jnp.take(
            segment_sum(
                attn_masked, batch, n_graphs, indices_are_sorted=True,
                scope="graphs",
            ),
            batch, axis=0,
        )
        embed = ResidualLayer(
            node_dim=self.node_dim, n_layers=2, activation=self.activation
        )((attn * value) / jnp.maximum(attn_sum, 1e-9))
        data[keys.NODE_INVARIANT] = node_scalar + embed
        return data


class SpinEmbedding(nn.Module):
    """Same attention mechanism keyed on the (positive) spin value
    (reference nn/electronic.py:54-90)."""

    node_dim: int = 128
    activation: str = "silu"

    @nn.compact
    def __call__(self, data: DataDict) -> DataDict:
        if keys.TOTAL_SPIN not in data:
            return data
        batch = data[keys.BATCH]
        node_scalar = data[keys.NODE_INVARIANT]
        node_mask = data[keys.NODE_MASK]
        spin = data[keys.TOTAL_SPIN].astype(node_scalar.dtype)[:, None]  # [G,1]
        spin_norm = jnp.maximum(spin, 1.0)

        query = nn.Dense(self.node_dim)(node_scalar)
        key = jnp.take(nn.Dense(self.node_dim, use_bias=False)(spin / spin_norm), batch, axis=0)
        value = jnp.take(nn.Dense(self.node_dim, use_bias=False)(spin), batch, axis=0)

        dot = jnp.sum(query * key, axis=-1, keepdims=True)
        attn = nn.softplus(dot / math.sqrt(self.node_dim))
        # see ChargeEmbedding: global normalizer (psum under halo),
        # unmasked per-row numerator for halo-window consistency
        attn_masked = jnp.where(node_mask[:, None], attn, 0.0)
        n_graphs = data[keys.GRAPH_MASK].shape[0]
        attn_sum = jnp.take(
            segment_sum(
                attn_masked, batch, n_graphs, indices_are_sorted=True,
                scope="graphs",
            ),
            batch, axis=0,
        )
        embed = ResidualLayer(
            node_dim=self.node_dim, n_layers=2, activation=self.activation
        )((attn * value) / jnp.maximum(attn_sum, 1e-9))
        data[keys.NODE_INVARIANT] = node_scalar + embed
        return data
