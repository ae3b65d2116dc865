"""Shared building blocks: activations, MLPs, residual layers, embeddings.

TPU-native counterpart of /root/reference/xequinet/nn/basic.py (the
autodiff property machinery lives in models/properties.py instead, since
forces/virial come from ``jax.grad`` of a pure energy function rather
than autograd on a taped graph).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


def resolve_activation(activation: str, devide_x: bool = False) -> Callable:
    """Activation factory (reference nn/basic.py:241-262).

    ``devide_x=True`` returns f(x)/x for gates (silu -> sigmoid, etc.),
    including the reference's 'devide' spelling for config parity.
    """
    activation = activation.lower()
    activation_div_x = {"silu": "sigmoid", "relu": "identity", "leakyrelu": "identity"}
    if devide_x and activation in activation_div_x:
        activation = activation_div_x[activation]
    table = {
        "relu": nn.relu,
        "leakyrelu": lambda x: nn.leaky_relu(x, negative_slope=0.01),
        "softplus": nn.softplus,
        "sigmoid": nn.sigmoid,
        "silu": nn.silu,
        "tanh": jnp.tanh,
        "identity": lambda x: x,
    }
    if activation not in table:
        raise NotImplementedError(f"Unsupported activation function {activation}")
    return table[activation]


class ScalarMLP(nn.Module):
    """Linear -> act -> Linear (the ubiquitous 2-layer MLP of the reference,
    e.g. nn/xpainn.py:111-115)."""

    hidden_dim: int
    out_dim: int
    activation: str = "silu"
    final_bias_init: float = 0.0
    final_weight_scale: float = 1.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = resolve_activation(self.activation)
        h = nn.Dense(self.hidden_dim, use_bias=self.use_bias)(x)
        h = act(h)
        kernel_init = nn.initializers.variance_scaling(
            self.final_weight_scale**2, "fan_in", "truncated_normal"
        )
        out = nn.Dense(
            self.out_dim,
            use_bias=self.use_bias,
            kernel_init=kernel_init,
            bias_init=nn.initializers.constant(self.final_bias_init),
        )(h)
        return out


class ResidualLayer(nn.Module):
    """Residual MLP scaled by 1/sqrt(2) (reference nn/basic.py:11-31)."""

    node_dim: int
    n_layers: int = 2
    activation: str = "silu"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = resolve_activation(self.activation)
        h = x
        for _ in range(self.n_layers):
            h = nn.Dense(self.node_dim, use_bias=False)(h)
            h = act(h)
        return (x + h) * (1.0 / math.sqrt(2.0))


class AtomEmbedding(nn.Module):
    """Atomic-number embedding: one-hot table or a fixed per-element feature
    table followed by a Dense (reference nn/xpainn.py:40-48 and
    nn/basic.py:34-57 Int2c1eEmbedding).

    ``embed_table``: optional [n_elements, embed_dim] fixed (non-trainable)
    feature table, e.g. xTB-basis projections; when None, a trainable
    embedding over 100 elements with padding row 0 fixed at zero.
    """

    node_dim: int
    embed_table: Optional[tuple] = None  # static tuple-of-tuples or None

    @nn.compact
    def __call__(self, atomic_numbers: jnp.ndarray) -> jnp.ndarray:
        if self.embed_table is None:
            table = self.param(
                "embedding",
                nn.initializers.normal(stddev=1.0),
                (100, self.node_dim),
            )
            # row 0 is the padding element and must stay zero (params may
            # arrive as numpy after checkpoint restore — normalize first)
            table = jnp.asarray(table).at[0].set(0.0)
            return jnp.take(table, atomic_numbers, axis=0)
        fixed = jnp.asarray(self.embed_table, dtype=jnp.float32)
        feats = jnp.take(fixed, atomic_numbers, axis=0)
        return nn.Dense(
            self.node_dim, bias_init=nn.initializers.zeros
        )(feats)
