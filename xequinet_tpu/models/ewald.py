"""Ewald message passing: long-range interactions at O(N·k)
(Kosmala et al., Ewald-MP).

TPU-native counterpart of /root/reference/xequinet/nn/ewald.py.  The
k-grids are trace-time numpy constants; structure factors are masked
segment sums over atoms — dense [N, K, D] work that maps directly onto
the MXU.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .. import keys
from ..ops.scatter import segment_sum
from .basic import ResidualLayer, resolve_activation

Array = jnp.ndarray
DataDict = Dict[str, Array]


def get_k_index_product_set(num_k_x: int, num_k_y: int, num_k_z: int) -> np.ndarray:
    """Half-box of integer k-lattice indices around the origin
    (reference ewald.py:13-25)."""
    kx = np.arange(-num_k_x, num_k_x + 1)
    ky = np.arange(-num_k_y, num_k_y + 1)
    kz = np.arange(-num_k_z, num_k_z + 1)
    prod = np.stack(np.meshgrid(kx, ky, kz, indexing="ij"), axis=-1).reshape(-1, 3)
    return prod[prod.shape[0] // 2 + 1 :].astype(np.float64)


def _gaussian_rbf(d: np.ndarray, num_basis: int, cutoff: float) -> np.ndarray:
    mean = np.linspace(0.0, cutoff, num_basis)[None, :]
    std = 1.0 + 1e-5
    coeff = 1.0 / (std * math.sqrt(2 * math.pi))
    return coeff * np.exp(-0.5 * ((d - mean) / std) ** 2)


def _poly_envelope(d: np.ndarray, cutoff: float, p: int = 5) -> np.ndarray:
    x = d / cutoff
    val = (
        1.0
        - 0.5 * (p + 1) * (p + 2) * x**p
        + p * (p + 2) * x ** (p + 1)
        - 0.5 * p * (p + 1) * x ** (p + 2)
    )
    return np.where(d < cutoff, val, 0.0)


def get_k_voxel_grid(
    k_cutoff: float,
    delta_k: float,
    num_k_basis: int,
    k_offset: Optional[float] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """k-voxel grid inside the cutoff sphere + Gaussian-RBF x polynomial
    envelope weights of |k| (reference ewald.py:28-57)."""
    num_k = int(k_cutoff / delta_k)
    idx = get_k_index_product_set(num_k, num_k, num_k)
    k_grid = idx * delta_k
    k_grid = k_grid[np.square(k_grid).sum(-1) < k_cutoff**2]
    if k_offset is None:
        k_offset = 0.1 if num_k_basis <= 48 else 0.25
    d = np.linalg.norm(k_grid, axis=-1, keepdims=True)
    rbf = _gaussian_rbf(d, num_k_basis, k_cutoff + k_offset)
    env = _poly_envelope(d, k_cutoff + k_offset)
    return k_grid, rbf * env


class EwaldInitialPBC(nn.Module):
    """k-grid from the reciprocal cell + learned down-projection over
    k-points (reference ewald.py:60-95)."""

    num_k_points: Tuple[int, int, int] = (3, 3, 3)
    projection_dim: int = 8

    @nn.compact
    def __call__(self, data: DataDict) -> DataDict:
        k_index = jnp.asarray(
            get_k_index_product_set(*self.num_k_points), dtype=jnp.float32
        )
        n_k = k_index.shape[0]
        # padding graphs carry a zero cell; substitute identity before the
        # inverse so no NaN enters the (masked-out) rows' gradient paths
        graph_mask = data[keys.GRAPH_MASK]
        cell = jnp.where(
            graph_mask[:, None, None],
            data[keys.CELL],
            jnp.eye(3, dtype=data[keys.CELL].dtype),
        )
        k_cell = 2 * jnp.pi * jnp.linalg.inv(cell)  # [G, 3, 3]
        k_grid = jnp.einsum("ki,gij->gkj", k_index, k_cell)
        batch = data[keys.BATCH]
        k_per_atom = jnp.take(k_grid, batch, axis=0)  # [N, K, 3]
        pos = data[keys.POSITIONS]
        data[keys.K_DOT_R] = jnp.einsum("aki,ai->ak", k_per_atom, pos)
        data[keys.SINC_DAMPING] = jnp.ones((pos.shape[0], 1), dtype=pos.dtype)
        down = self.param(
            "down_projection",
            nn.initializers.xavier_uniform(),
            (n_k, self.projection_dim),
        )
        data[keys.DOWN_PROJECTION] = down
        return data


class EwaldInitialNonPBC(nn.Module):
    """Fixed k-voxel grid + sinc damping; requires structures in their SVD
    principal frame (SVDFrameTransform) (reference ewald.py:98-138)."""

    k_cutoff: float = 0.4
    delta_k: float = 0.2
    num_k_basis: int = 20
    k_offset: Optional[float] = None
    projection_dim: int = 8
    eps: float = 1e-5

    @nn.compact
    def __call__(self, data: DataDict) -> DataDict:
        k_grid_np, k_rbf_np = get_k_voxel_grid(
            self.k_cutoff, self.delta_k, self.num_k_basis, self.k_offset
        )
        k_grid = jnp.asarray(k_grid_np, dtype=jnp.float32)
        k_rbf = jnp.asarray(k_rbf_np, dtype=jnp.float32)
        pos = data[keys.POSITIONS]
        data[keys.K_DOT_R] = jnp.einsum("ki,ai->ak", k_grid, pos)
        data[keys.SINC_DAMPING] = jnp.prod(
            jnp.sinc(0.5 * self.delta_k * pos + self.eps), axis=-1, keepdims=True
        )
        data[keys.DOWN_PROJECTION] = nn.Dense(
            self.projection_dim, use_bias=False
        )(k_rbf)
        return data


class EwaldBlock(nn.Module):
    """Structure factors -> learned k-filter -> back-scatter -> residual
    update (reference ewald.py:141-212)."""

    node_dim: int = 128
    projection_dim: int = 8
    activation: str = "silu"
    layer_norm: bool = True
    num_residuals: int = 3

    @nn.compact
    def __call__(self, data: DataDict) -> DataDict:
        node_scalar = data[keys.NODE_INVARIANT]
        k_dot_r = data[keys.K_DOT_R]  # [N, K]
        sinc = data[keys.SINC_DAMPING]  # [N, 1] or scalar-like
        batch = data[keys.BATCH]
        node_mask = data[keys.NODE_MASK]
        n_graphs = data[keys.GRAPH_MASK].shape[0]

        node_res = ResidualLayer(
            node_dim=self.node_dim, n_layers=2, activation=self.activation
        )(node_scalar)
        if self.layer_norm:
            node_res = nn.LayerNorm(epsilon=1e-5)(node_res)

        real = (jnp.cos(k_dot_r) * sinc)[..., None]  # [N, K, 1]
        imag = (jnp.sin(k_dot_r) * sinc)[..., None]
        # the structure factors are plain sums over the system's atoms
        # (reference ewald.py:160-182): under halo decomposition each
        # shard sums its OWNED rows (node_mask) and the psum over the gp
        # axis (scope="graphs") reconstructs the exact global factor —
        # [K, D] bytes of comm per shard, independent of system size.
        # For PBC k-vectors on the reciprocal lattice, halo-image rows
        # satisfy k.(r + L) = k.r + 2pi*n, so the back-scattered message
        # on a halo row equals its owner's exactly.
        sf_real = segment_sum(real * node_res[:, None, :], batch, n_graphs, node_mask
        , indices_are_sorted=True, scope="graphs")  # [G, K, D]
        sf_imag = segment_sum(imag * node_res[:, None, :], batch, n_graphs, node_mask
        , indices_are_sorted=True, scope="graphs")

        up = nn.Dense(
            self.node_dim,
            use_bias=False,
            kernel_init=nn.initializers.variance_scaling(
                1e-4, "fan_in", "truncated_normal"
            ),  # ~0.01x init like reference ewald.py:160-163
        )
        kfilter = up(data[keys.DOWN_PROJECTION])[None]  # [1, K, D]
        filt_real = jnp.take(kfilter * sf_real, batch, axis=0)  # [N, K, D]
        filt_imag = jnp.take(kfilter * sf_imag, batch, axis=0)
        ewald_msg = jnp.sum(filt_real * real + filt_imag * imag, axis=1)

        act = resolve_activation(self.activation)
        h = act(nn.Dense(self.node_dim, use_bias=False)(ewald_msg))
        for _ in range(self.num_residuals):
            h = ResidualLayer(
                node_dim=self.node_dim, n_layers=2, activation=self.activation
            )(h)
        data[keys.NODE_INVARIANT] = node_scalar + h
        return data
