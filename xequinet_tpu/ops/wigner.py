"""Wigner-3j / Clebsch-Gordan tables and rotation matrices in the real
spherical-harmonics basis.

Own implementation (the reference relies on e3nn's ``o3.wigner_3j``; see
the TensorProducts in /root/reference/xequinet/nn/o3layer.py and
nn/matlayer.py).  Construction:

* real so(3) generators obtained by conjugating the complex su(2)
  generators with the standard complex->real change of basis,
* the 3j tensor for (l1,l2,l3) is computed as the (1-dimensional) null
  space of the infinitesimal-invariance operator
  ``G ⊗ I ⊗ I + I ⊗ G ⊗ I + I ⊗ I ⊗ G`` — exact up to SVD precision and
  free of phase-convention pitfalls,
* normalized to unit Frobenius norm with the first non-zero entry made
  positive (matching e3nn's ``wigner_3j(1,1,0) = +δ/√3``).

Everything is numpy float64 at trace time and cached; jit graphs only see
the resulting constant tables.  The l=1 irrep basis corresponds to the
(y, z, x) ordering of geometric axes (the e3nn convention the reference
works in: nn/xpainn.py:70-74 permutes [x,y,z] -> [y,z,x]).
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Tuple

import numpy as np


@lru_cache(maxsize=None)
def change_basis_real_to_complex(l: int) -> np.ndarray:
    """Unitary Q with the e3nn phase convention ((-i)^l) relating the real
    and complex spherical-harmonics bases; rows index real m, columns
    complex m (both ordered -l..l)."""
    q = np.zeros((2 * l + 1, 2 * l + 1), dtype=np.complex128)
    inv_s2 = 1.0 / math.sqrt(2.0)
    for m in range(-l, 0):
        q[l + m, l + abs(m)] = inv_s2
        q[l + m, l - abs(m)] = -1j * inv_s2
    q[l, l] = 1.0
    for m in range(1, l + 1):
        q[l + m, l + abs(m)] = (-1) ** m * inv_s2
        q[l + m, l - abs(m)] = 1j * (-1) ** m * inv_s2
    return (-1j) ** l * q


def _su2_generators(l: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    m = np.arange(-l, l + 1, dtype=np.float64)
    lp = np.zeros((2 * l + 1, 2 * l + 1), dtype=np.complex128)
    lm = np.zeros((2 * l + 1, 2 * l + 1), dtype=np.complex128)
    for i, mm in enumerate(m[:-1]):
        lp[i + 1, i] = math.sqrt(l * (l + 1) - mm * (mm + 1))
    for i, mm in enumerate(m[1:], start=1):
        lm[i - 1, i] = math.sqrt(l * (l + 1) - mm * (mm - 1))
    jz = np.diag(m).astype(np.complex128)
    jx = 0.5 * (lp + lm)
    jy = -0.5j * (lp - lm)
    return jx, jy, jz


@lru_cache(maxsize=None)
def so3_generators(l: int) -> Tuple[np.ndarray, ...]:
    """Real antisymmetric generators (A_1, A_2, A_3) of degree l.

    ``expm(sum_k theta_k A_k)`` is the real Wigner-D.  Axis k is the k-th
    component of the l=1 irrep basis.
    """
    Q = change_basis_real_to_complex(l)
    gens = []
    for J in _su2_generators(l):
        A = np.conj(Q.T) @ (1j * J) @ Q
        if np.abs(A.imag).max() > 1e-9:
            raise RuntimeError(f"so3 generator for l={l} not real")
        gens.append(np.ascontiguousarray(A.real))
    return tuple(gens)


@lru_cache(maxsize=None)
def wigner_3j(l1: int, l2: int, l3: int) -> np.ndarray:
    """Real-basis Wigner-3j tensor, shape (2l1+1, 2l2+1, 2l3+1).

    Invariant under simultaneous rotation of all three indices; unit
    Frobenius norm; zero when the triangle rule fails.
    """
    d1, d2, d3 = 2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1
    if not (abs(l1 - l2) <= l3 <= l1 + l2):
        return np.zeros((d1, d2, d3))
    g1 = so3_generators(l1)
    g2 = so3_generators(l2)
    g3 = so3_generators(l3)
    I1, I2, I3 = np.eye(d1), np.eye(d2), np.eye(d3)
    rows = []
    for k in range(3):
        op = (
            np.einsum("ij,kl,mn->ikmjln", g1[k], I2, I3)
            + np.einsum("ij,kl,mn->ikmjln", I1, g2[k], I3)
            + np.einsum("ij,kl,mn->ikmjln", I1, I2, g3[k])
        ).reshape(d1 * d2 * d3, d1 * d2 * d3)
        rows.append(op)
    M = np.concatenate(rows, axis=0)
    # 1-dimensional null space (SO(3) CG multiplicity is 1)
    _, s, vt = np.linalg.svd(M)
    null_dim = int(np.sum(s < 1e-8 * s[0])) + (d1 * d2 * d3 - len(s) if False else 0)
    # rows >= cols here, so s has d1*d2*d3 entries
    if s[-1] > 1e-8 * s[0]:
        raise RuntimeError(f"no invariant tensor found for ({l1},{l2},{l3})")
    if len(s) >= 2 and s[-2] < 1e-8 * s[0]:
        raise RuntimeError(f"multiplicity > 1 for ({l1},{l2},{l3})?")
    C = vt[-1].reshape(d1, d2, d3)
    # canonical sign: first entry with significant magnitude is positive
    flat = C.ravel()
    idx = np.argmax(np.abs(flat) > 1e-8)
    if flat[idx] < 0:
        C = -C
    C = C / np.linalg.norm(C)
    return C


@lru_cache(maxsize=None)
def irrep_inner_coeff(l: int) -> float:
    """c_l with ``w3j(l,l,0)[m,m',0] = c_l * delta_{mm'}`` (= 1/sqrt(2l+1)).

    Used by the Invariant / EquivariantDot fast paths
    (reference: nn/o3layer.py:11-109 builds uuu TensorProducts for this).
    """
    w = wigner_3j(l, l, 0)
    return float(w[0, 0, 0])


# ---------------------------------------------------------------------------
# Wigner D matrices (tests / Sph2Cart construction).
# ---------------------------------------------------------------------------


def wigner_D(l: int, R_irrep: np.ndarray) -> np.ndarray:
    """Real Wigner-D matrix for a rotation given in the l=1 irrep basis.

    Pass ``geometric_rotation_to_irrep_basis(R_xyz)`` for a geometric
    rotation matrix.
    """
    from scipy.linalg import expm, logm

    A = logm(R_irrep)
    gens1 = so3_generators(1)
    coeffs = [float(np.sum(A * G) / np.sum(G * G)) for G in gens1]
    gens = so3_generators(l)
    M = sum(c * G for c, G in zip(coeffs, gens))
    D = expm(M)
    if np.iscomplexobj(D) and np.abs(np.asarray(D).imag).max() > 1e-9:
        raise RuntimeError("wigner_D not real")
    return np.real(D)


_P_YZX = np.array(
    [[0.0, 1.0, 0.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]]
)  # maps (x,y,z) -> (y,z,x)


def geometric_rotation_to_irrep_basis(R_xyz: np.ndarray) -> np.ndarray:
    """Convert a geometric (x,y,z) rotation matrix to the l=1 irrep basis."""
    return _P_YZX @ R_xyz @ _P_YZX.T
