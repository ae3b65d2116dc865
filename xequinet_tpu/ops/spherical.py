"""Real spherical harmonics in the e3nn convention, built recursively.

The reference uses ``e3nn.o3.SphericalHarmonics(node_irreps, normalize=True,
normalization="component")`` on edge vectors permuted [x,y,z] -> [y,z,x]
(reference: xequinet/nn/xpainn.py:49-75).  Here the harmonics are generated
at trace time from our own Wigner-3j tables (ops/wigner.py), which makes
them consistent-by-construction with every tensor product in the stack:

    Y_0 = 1,   Y_1(u) = u,   Y_l ∝ w3j(l-1, 1, l) · (Y_{l-1} ⊗ u)

with the per-degree scale fixed so that Y_l at the pole u = (0,1,0) equals
the unit vector on the m=0 component (the e3nn 'norm' convention); the
'component' convention multiplies degree l by sqrt(2l+1).

Inputs must already be in the irrep basis: callers permute geometric
(x,y,z) vectors to (y,z,x), exactly like the reference does.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Union

import jax.numpy as jnp
from jax import lax
import numpy as np

from .irreps import Irreps
from .wigner import wigner_3j


@lru_cache(maxsize=None)
def _sh_scale(l: int) -> float:
    """Normalization factor applied to the raw recursion output at degree l
    so that ||Y_l|| = 1 on the unit sphere with Y_l[m=0] = +1 at the pole."""
    if l <= 1:
        return 1.0
    u = np.zeros(3)
    u[1] = 1.0  # the pole in the irrep basis
    y = u.copy()
    factor = 1.0
    for ll in range(2, l + 1):
        w = wigner_3j(ll - 1, 1, ll)
        y_raw = np.einsum("abm,a,b->m", w, y, u)
        factor = 1.0 / y_raw[ll]  # pin the m=0 component to +1 at the pole
        y = y_raw * factor
    return float(factor)


def spherical_harmonics(
    irreps: Union[str, Irreps],
    vectors: jnp.ndarray,
    normalize: bool = True,
    normalization: str = "component",
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Real spherical harmonics of ``vectors`` for every irrep in ``irreps``.

    Args:
        irreps: output irreps; each (mul, l) chunk gets the degree-l
            harmonics tiled ``mul`` times (matching e3nn semantics used at
            reference nn/xpainn.py:49-51 where node_irreps has mul > 1).
        vectors: [..., 3] array in the irrep basis (geometric (y,z,x)).
        normalize: normalize input vectors to unit length first (guarded
            against zero-length padding edges).
        normalization: 'component' (each degree scaled by sqrt(2l+1)),
            'norm' (unit norm per degree) or 'integral'.
    Returns:
        [..., irreps.dim] array.
    """
    irreps = Irreps(irreps)
    lmax = irreps.lmax
    for mul, ir in irreps:
        if ir.p != (-1) ** ir.l:
            raise ValueError(
                f"irrep {ir} has parity incompatible with spherical harmonics"
            )

    if normalize:
        norm2 = jnp.sum(vectors * vectors, axis=-1, keepdims=True)
        # zero vectors (padding edges) map to zero harmonics for l>=1
        inv = jnp.where(norm2 > eps, 1.0 / jnp.sqrt(jnp.maximum(norm2, eps)), 0.0)
        u = vectors * inv
    else:
        u = vectors

    ys = {0: jnp.ones(u.shape[:-1] + (1,), dtype=u.dtype), 1: u}
    for l in range(2, lmax + 1):
        w = jnp.asarray(wigner_3j(l - 1, 1, l), dtype=u.dtype)
        y_raw = jnp.einsum("...a,...b,abm->...m", ys[l - 1], u, w, precision=lax.Precision.HIGHEST)
        ys[l] = y_raw * _sh_scale(l)

    def _scale(l: int) -> float:
        if normalization == "component":
            return float(np.sqrt(2 * l + 1))
        if normalization == "norm":
            return 1.0
        if normalization == "integral":
            return float(np.sqrt((2 * l + 1) / (4 * np.pi)))
        raise ValueError(f"unknown normalization {normalization}")

    chunks = []
    for mul, ir in irreps:
        y = ys[ir.l] * _scale(ir.l)
        if mul > 1:
            y = jnp.broadcast_to(
                y[..., None, :], y.shape[:-1] + (mul, ir.dim)
            ).reshape(y.shape[:-1] + (mul * ir.dim,))
        chunks.append(y)
    return jnp.concatenate(chunks, axis=-1)
