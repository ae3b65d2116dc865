"""Fast parameter-free O(3) primitives for the hot path.

These are the TPU-friendly specializations of the generic tensor product
for the three ops that dominate XPaiNN's inner loop (reference:
nn/o3layer.py Invariant/EquivariantDot, and the
``o3.ElementwiseTensorProduct(node_irreps, Nx0e)`` gating in
nn/xpainn.py:119-121,150-153).

Round-4 redesign: the per-irrep Python loops (slice -> reshape ->
reduce -> concatenate) compiled into dozens of small HBM-bound XLA ops
per block — 36.7 ms of the flagship train step was the update blocks
alone (tools/remainder_breakdown.py).  Every op is now expressed
through two constant structure matrices per irreps layout,

    G [num_irreps, dim]   gate broadcast: lane j of irrep u -> G[u, j] = 1
    S [dim,  num_irreps]  inner-product reduction: S[j, u] = c_l(u)

so gating is ``x * (s @ G)``, the per-irrep inner product is
``(x1 * x2) @ S`` and the LayerNorm RMS rides the same S — single
MXU matmuls XLA fuses with the surrounding elementwise work, instead of
per-irrep slicing.  In f32 the structure matmuls run precision=HIGHEST
(TPU default would silently round the values to bf16).
"""

from __future__ import annotations

import functools
from typing import Union

import jax.numpy as jnp
import numpy as np
from jax import lax

from .irreps import Irreps
from .wigner import irrep_inner_coeff


@functools.lru_cache(maxsize=None)
def _structure(irreps: Irreps):
    """(G [num_irreps, dim], S [dim, num_irreps], scalar lane info).

    scalar info = (mask [dim] f32 of even-scalar lanes, idx [num_scalar]
    int lane positions, gate positions of scalar irreps [num_scalar]).
    """
    dim, ni = irreps.dim, irreps.num_irreps
    g = np.zeros((ni, dim), dtype=np.float32)
    s = np.zeros((dim, ni), dtype=np.float32)
    scalar_mask = np.zeros((dim,), dtype=np.float32)
    scalar_idx = []
    scalar_gates = []
    gate = 0
    lane = 0
    for mul, ir in irreps:
        c = irrep_inner_coeff(ir.l)
        for _ in range(mul):
            g[gate, lane : lane + ir.dim] = 1.0
            s[lane : lane + ir.dim, gate] = c
            if ir.l == 0 and ir.p == 1:
                scalar_mask[lane] = 1.0
                scalar_idx.append(lane)
                scalar_gates.append(gate)
            gate += 1
            lane += ir.dim
    return g, s, (scalar_mask, np.asarray(scalar_idx, dtype=np.int32),
                  np.asarray(scalar_gates, dtype=np.int32))


def _mm(a: jnp.ndarray, m: np.ndarray) -> jnp.ndarray:
    """a @ m with f32 inputs protected from the TPU's default bf16
    truncation; bf16 inputs keep the fast single-pass MXU path."""
    prec = None if a.dtype == jnp.bfloat16 else lax.Precision.HIGHEST
    return jnp.dot(a, jnp.asarray(m, a.dtype), precision=prec)


def scalar_gate(
    x: jnp.ndarray, s: jnp.ndarray, irreps: Union[str, Irreps]
) -> jnp.ndarray:
    """Channel-wise scalar gating: equivalent to e3nn
    ``ElementwiseTensorProduct(irreps, f"{num_irreps}x0e")(x, s)``.

    With component normalization the CG factor sqrt(2l+1) cancels the
    w3j(l,0,l) = 1/sqrt(2l+1), so this is exactly a broadcast multiply.

    x: [..., irreps.dim];  s: [..., irreps.num_irreps]  ->  [..., irreps.dim]
    """
    g, _, _ = _structure(Irreps(irreps))
    return x * _mm(s, g)


def equivariant_dot(
    x1: jnp.ndarray, x2: jnp.ndarray, irreps: Union[str, Irreps]
) -> jnp.ndarray:
    """Per-irrep inner product, e3nn-normalized.

    Equivalent to the uuu TensorProduct of reference nn/o3layer.py:78-109:
    out_u = c_l * sum_m x1[u,m] x2[u,m] with c_l = w3j(l,l,0)[m,m,0].

    Returns [..., irreps.num_irreps].
    """
    _, s, _ = _structure(Irreps(irreps))
    return _mm(x1 * x2, s)


def invariant(
    x: jnp.ndarray,
    irreps: Union[str, Irreps],
    squared: bool = False,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Modulus of each irrep (reference nn/o3layer.py:11-44).

    out_u = sqrt(c_l * ||x_u||^2 + eps^2) - eps  (or the squared form).
    """
    sq = equivariant_dot(x, x, irreps)
    if squared:
        return sq
    return jnp.sqrt(sq + eps * eps) - eps


def scalar_indices(irreps: Union[str, Irreps]) -> np.ndarray:
    """Flat indices of the even scalar (0e) channels, as in
    reference nn/o3layer.py:119-127."""
    _, _, (mask, idx, _) = _structure(Irreps(irreps))
    return idx


def equivariant_layer_norm(
    x: jnp.ndarray,
    irreps: Union[str, Irreps],
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Equivariant LayerNorm (reference nn/o3layer.py:112-171).

    Mean-centers the even-scalar channels, divides everything by the RMS of
    the per-irrep squared invariants, then applies a per-irrep affine
    weight and a bias on the scalar channels.

    weight: [num_irreps]; bias: [num_scalars].
    """
    irreps = Irreps(irreps)
    g, s, (scalar_mask, scalar_idx, scalar_gates) = _structure(irreps)
    num_scalar = len(scalar_idx)

    if num_scalar > 0:
        # mean over the scalar lanes, subtracted from the scalar lanes only
        mean = _mm(x, scalar_mask[:, None] / num_scalar)  # [..., 1]
        x = x - mean * scalar_mask
    inv_sq = _mm(x * x, s)  # [..., num_irreps]
    inv_rms = jax_rsqrt(jnp.mean(inv_sq, axis=-1, keepdims=True) + eps)

    w_lane = _mm(weight, g)  # [dim]
    out = x * inv_rms * w_lane
    if num_scalar > 0:
        b_lane = jnp.zeros((x.shape[-1],), dtype=out.dtype)
        b_lane = b_lane.at[scalar_idx].set(bias[:num_scalar].astype(out.dtype))
        out = out + b_lane
    return out


def jax_rsqrt(x: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / jnp.sqrt(x)
