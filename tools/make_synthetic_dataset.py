"""Generate a physically-structured synthetic dataset for accuracy studies.

No QM package ships in this environment, so the labels come from an
explicit many-body empirical PES (not random numbers): species-dependent
Morse pairs (Lorentz-Berthelot-style mixing over per-element well depths
/ radii) plus an Axilrod-Teller-Muto triple-dipole 3-body term.  Energies
are evaluated in JAX and forces are the exact analytic gradient, so the
labels are consistent (F = -dE/dR holds to machine precision) and the
function is smooth, short-ranged and genuinely many-body — the properties
a message-passing force field needs to learn.

Configurations are Boltzmann-like samples: random packed clusters relaxed
for a few steepest-descent steps on the same PES, then thermally
perturbed.  Output is an XDB dataset directory (info.json + split.json
contract, reference data/lmdb_data.py:88-172) consumable by `xeq train`.

Usage:  python tools/make_synthetic_dataset.py <dst_dir> [--n 3000]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

# per-element Morse parameters (eV / Angstrom), loosely tracking covalent
# trends for H, C, N, O (+ F, P, S with --elements extended)
ELEMENTS = np.array([1, 6, 7, 8], dtype=np.int32)
ELEMENT_P = [0.4, 0.3, 0.15, 0.15]
D_E = {1: 0.8, 6: 1.6, 7: 1.4, 8: 1.2,
       9: 1.0, 15: 1.5, 16: 1.3}  # well depth, eV
R_E = {1: 0.9, 6: 1.5, 7: 1.4, 8: 1.3,
       9: 1.2, 15: 1.9, 16: 1.8}  # equilibrium radius, Angstrom
A_E = {1: 2.2, 6: 1.8, 7: 1.9, 8: 2.0,
       9: 2.3, 15: 1.6, 16: 1.7}  # stiffness, 1/Angstrom
C9 = 0.25  # ATM 3-body strength, eV * Angstrom^9
R_CUT = 5.0


def use_extended_elements():
    """Widen the element set to H,C,N,O,F,P,S (the round-5 flagship
    convergence study's richer chemistry)."""
    global ELEMENTS, ELEMENT_P
    ELEMENTS = np.array([1, 6, 7, 8, 9, 15, 16], dtype=np.int32)
    ELEMENT_P = [0.34, 0.26, 0.12, 0.12, 0.06, 0.04, 0.06]


def _tables():
    zmax = int(ELEMENTS.max()) + 1
    d = np.zeros(zmax)
    r = np.zeros(zmax)
    a = np.zeros(zmax)
    for z in ELEMENTS:
        d[z], r[z], a[z] = D_E[int(z)], R_E[int(z)], A_E[int(z)]
    return d, r, a


def make_energy_fn():
    import jax
    import jax.numpy as jnp

    d_t, r_t, a_t = (jnp.asarray(t) for t in _tables())

    def energy(pos, z):
        n = pos.shape[0]
        diff = pos[:, None, :] - pos[None, :, :]
        r2 = jnp.sum(diff * diff, axis=-1)
        iu = jnp.triu_indices(n, k=1)
        rij = jnp.sqrt(r2[iu] + 1e-12)
        # Lorentz-Berthelot mixing
        dd = jnp.sqrt(d_t[z][:, None] * d_t[z][None, :])[iu]
        rr = 0.5 * (r_t[z][:, None] + r_t[z][None, :])[iu]
        aa = 0.5 * (a_t[z][:, None] + a_t[z][None, :])[iu]
        # smooth cutoff (cosine) so the PES is strictly short-ranged
        fc = jnp.where(
            rij < R_CUT, 0.5 * (jnp.cos(jnp.pi * rij / R_CUT) + 1.0), 0.0
        )
        x = jnp.exp(-aa * (rij - rr))
        e_pair = jnp.sum(dd * (x * x - 2.0 * x) * fc)
        # Axilrod-Teller-Muto triple-dipole (3-body)
        r_safe = jnp.sqrt(r2 + jnp.eye(n))
        inv = jnp.where(jnp.eye(n, dtype=bool), 0.0, 1.0 / r_safe)
        cosp = jnp.einsum("ijk,ilk->ijl", diff, diff) * (
            inv[:, :, None] * inv[:, None, :]
        )
        atm = (
            1.0
            + cosp * jnp.transpose(cosp, (1, 2, 0)) * jnp.transpose(cosp, (2, 0, 1))
        ) * (inv[:, :, None] * inv[None, :, :] * inv[:, None, :]) ** 3
        # each unordered triple appears 6 times in the full tensor
        e_three = C9 * jnp.sum(atm) / 6.0
        return e_pair + e_three

    return jax.jit(jax.value_and_grad(energy))


def random_cluster(rng, n):
    z = rng.choice(ELEMENTS, size=n, p=ELEMENT_P).astype(np.int32)
    # sequential insertion with a minimum-distance constraint
    pos = [np.zeros(3)]
    while len(pos) < n:
        cand = rng.normal(scale=0.75 * n ** (1 / 3), size=3)
        dmin = min(np.linalg.norm(cand - p) for p in pos)
        if 0.75 < dmin < 4.0:
            pos.append(cand)
    return z, np.asarray(pos)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dst")
    ap.add_argument("--n", type=int, default=3000)
    ap.add_argument("--atoms", type=int, nargs=2, default=(8, 20))
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--elements", choices=["hcno", "extended"],
                    default="hcno")
    args = ap.parse_args()
    if args.elements == "extended":
        use_extended_elements()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from xequinet_tpu.data.datapoint import Datapoint
    from xequinet_tpu.data.store import create_dataset

    efn = make_energy_fn()
    rng = np.random.default_rng(args.seed)
    dps = []
    while len(dps) < args.n:
        n = int(rng.integers(args.atoms[0], args.atoms[1] + 1))
        z, pos = random_cluster(rng, n)
        zj = np.asarray(z)
        # a few steepest-descent steps to pull out of the repulsive wall
        for _ in range(8):
            e, g = efn(pos, zj)
            gn = np.linalg.norm(np.asarray(g), axis=-1, keepdims=True)
            pos = pos - 0.05 * np.asarray(g) / np.maximum(gn, 1.0)
        # thermal perturbation (~300-1500 K displacement scale)
        pos = pos + rng.normal(scale=rng.uniform(0.03, 0.12), size=pos.shape)
        e, g = efn(pos, zj)
        e, g = float(e), np.asarray(g)
        if not np.isfinite(e) or not np.all(np.isfinite(g)):
            continue
        if np.abs(g).max() > 50.0:  # reject pathological overlaps
            continue
        dps.append(
            Datapoint(z, pos, energy=e, forces=-g)
        )
        if len(dps) % 500 == 0:
            print(f"{len(dps)}/{args.n}", flush=True)

    idx = rng.permutation(len(dps))
    n_tr = int(0.8 * len(dps))
    n_va = int(0.1 * len(dps))
    split = {
        "train": idx[:n_tr].tolist(),
        "valid": idx[n_tr : n_tr + n_va].tolist(),
        "test": idx[n_tr + n_va :].tolist(),
    }
    create_dataset(
        args.dst, dps,
        units={"energy": "eV", "pos": "Angstrom", "forces": "eV/Angstrom"},
        split=split,
    )
    print(f"wrote {len(dps)} structures to {args.dst}")


if __name__ == "__main__":
    main()


def sample_structure(rng, n_atoms=24, relax_steps=40):
    """One relaxed cluster on the true PES (for MD studies)."""
    from xequinet_tpu.data.datapoint import Datapoint

    efn = make_energy_fn()
    z, pos = random_cluster(rng, n_atoms)
    zj = np.asarray(z)
    for _ in range(relax_steps):
        e, g = efn(pos, zj)
        gn = np.linalg.norm(np.asarray(g), axis=-1, keepdims=True)
        pos = pos - 0.05 * np.asarray(g) / np.maximum(gn, 1.0)
    return Datapoint(z, pos)
