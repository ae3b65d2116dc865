"""Fast parameter-free O(3) primitives for the hot path.

These are the TPU-friendly specializations of the generic tensor product
for the three ops that dominate XPaiNN's inner loop (reference:
nn/o3layer.py Invariant/EquivariantDot, and the
``o3.ElementwiseTensorProduct(node_irreps, Nx0e)`` gating in
nn/xpainn.py:119-121,150-153).  Each is a handful of reshapes and
elementwise multiplies / small reductions — pure VPU work that XLA fuses
into the surrounding matmuls.
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp
import numpy as np

from .irreps import Irreps, split_flat
from .wigner import irrep_inner_coeff


def scalar_gate(
    x: jnp.ndarray, s: jnp.ndarray, irreps: Union[str, Irreps]
) -> jnp.ndarray:
    """Channel-wise scalar gating: equivalent to e3nn
    ``ElementwiseTensorProduct(irreps, f"{num_irreps}x0e")(x, s)``.

    With component normalization the CG factor sqrt(2l+1) cancels the
    w3j(l,0,l) = 1/sqrt(2l+1), so this is exactly a broadcast multiply.

    x: [..., irreps.dim];  s: [..., irreps.num_irreps]  ->  [..., irreps.dim]
    """
    irreps = Irreps(irreps)
    out = []
    off_x = 0
    off_s = 0
    for mul, ir in irreps:
        d = mul * ir.dim
        xc = x[..., off_x : off_x + d].reshape(x.shape[:-1] + (mul, ir.dim))
        sc = s[..., off_s : off_s + mul]
        out.append((xc * sc[..., None]).reshape(x.shape[:-1] + (d,)))
        off_x += d
        off_s += mul
    return jnp.concatenate(out, axis=-1)


def equivariant_dot(
    x1: jnp.ndarray, x2: jnp.ndarray, irreps: Union[str, Irreps]
) -> jnp.ndarray:
    """Per-irrep inner product, e3nn-normalized.

    Equivalent to the uuu TensorProduct of reference nn/o3layer.py:78-109:
    out_u = c_l * sum_m x1[u,m] x2[u,m] with c_l = w3j(l,l,0)[m,m,0].

    Returns [..., irreps.num_irreps].
    """
    irreps = Irreps(irreps)
    out = []
    for (mul, ir), c1, c2 in zip(irreps, split_flat(x1, irreps), split_flat(x2, irreps)):
        c = irrep_inner_coeff(ir.l)
        out.append(jnp.sum(c1 * c2, axis=-1) * c)
    return jnp.concatenate(out, axis=-1)


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
    irreps = Irreps(irreps)
    idx = []
    off = 0
    for mul, ir in irreps:
        if ir.l == 0 and ir.p == 1:
            idx.extend(range(off, off + mul))
        off += mul * ir.dim
    return np.asarray(idx, dtype=np.int32)


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
    num_scalar = sum(mul for mul, ir in irreps if ir.l == 0 and ir.p == 1)
    chunks = split_flat(x, irreps)

    # subtract the mean over scalar channels from the scalar channels
    if num_scalar > 0:
        scalars = jnp.concatenate(
            [
                c[..., :, 0]
                for c, (mul, ir) in zip(chunks, irreps)
                if ir.l == 0 and ir.p == 1
            ],
            axis=-1,
        )
        mean = jnp.mean(scalars, axis=-1, keepdims=True)
        chunks = [
            c - mean[..., None] if (ir.l == 0 and ir.p == 1) else c
            for c, (mul, ir) in zip(chunks, irreps)
        ]

    # RMS over all irreps of the squared invariants
    inv_sq = []
    for c, (mul, ir) in zip(chunks, irreps):
        coeff = irrep_inner_coeff(ir.l)
        inv_sq.append(jnp.sum(c * c, axis=-1) * coeff)
    inv_sq = jnp.concatenate(inv_sq, axis=-1)  # [..., num_irreps]
    inv_rms = jax_rsqrt(jnp.mean(inv_sq, axis=-1, keepdims=True) + eps)

    out = []
    off_w = 0
    off_b = 0
    for c, (mul, ir) in zip(chunks, irreps):
        w = weight[off_w : off_w + mul]
        c = c * inv_rms[..., None] * w[..., None]
        if ir.l == 0 and ir.p == 1:
            b = bias[off_b : off_b + mul]
            c = c + b[..., None]
            off_b += mul
        off_w += mul
        out.append(c.reshape(c.shape[:-2] + (mul * ir.dim,)))
    return jnp.concatenate(out, axis=-1)


def jax_rsqrt(x: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / jnp.sqrt(x)
