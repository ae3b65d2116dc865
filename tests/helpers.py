"""Shared test utilities: rotations, Wigner-D application to irreps arrays."""

from __future__ import annotations

import numpy as np

from xequinet_tpu.ops.irreps import Irreps
from xequinet_tpu.ops.wigner import (
    geometric_rotation_to_irrep_basis,
    wigner_D,
)


def random_rotation(rng: np.random.Generator) -> np.ndarray:
    """Random geometric (x,y,z) rotation matrix via QR."""
    A = rng.normal(size=(3, 3))
    Q, R = np.linalg.qr(A)
    Q = Q * np.sign(np.diag(R))
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    return Q


def irreps_D(irreps, R_xyz: np.ndarray, parity: bool = False) -> np.ndarray:
    """Block-diagonal representation matrix acting on a flat irreps array.

    R_xyz is a geometric rotation; optionally composed with inversion
    (parity=True), under which irrep (l, p) picks up a factor p.
    """
    irreps = Irreps(irreps)
    R_irrep = geometric_rotation_to_irrep_basis(R_xyz)
    blocks = []
    for mul, ir in irreps:
        D = wigner_D(ir.l, R_irrep)
        if parity:
            D = ir.p * D
        for _ in range(mul):
            blocks.append(D)
    n = sum(b.shape[0] for b in blocks)
    out = np.zeros((n, n))
    off = 0
    for b in blocks:
        d = b.shape[0]
        out[off : off + d, off : off + d] = b
        off += d
    return out


def rotate_flat(x: np.ndarray, irreps, R_xyz: np.ndarray, parity=False) -> np.ndarray:
    D = irreps_D(irreps, R_xyz, parity)
    return x @ D.T
