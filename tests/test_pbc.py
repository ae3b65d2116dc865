"""PBC tests: neighbor list vs brute force, wrap invariance, virial vs
finite-difference strain (the strain-trick checks of SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from xequinet_tpu import keys
from xequinet_tpu.data.batching import collate
from xequinet_tpu.data.datapoint import Datapoint
from xequinet_tpu.models.model import init_params, make_apply_forward, resolve_model
from xequinet_tpu.ops.radius_graph import radius_graph_pbc_np, wrap_positions

KW = dict(
    node_dim=16,
    node_irreps="16x0e+8x1o+4x2e",
    embed_basis="one-hot",
    num_basis=8,
    cutoff=3.0,
    action_blocks=2,
    output_modes=["energy"],
)


def brute_force_pbc_edges(pos, cell, pbc, cutoff, max_rep=3):
    """O(N^2 * images) reference neighbor search."""
    n = len(pos)
    edges = set()
    reps = [range(-max_rep, max_rep + 1) if p else [0] for p in pbc]
    for ox in reps[0]:
        for oy in reps[1]:
            for oz in reps[2]:
                off = np.array([ox, oy, oz])
                shift = off @ cell
                for i in range(n):
                    for j in range(n):
                        # vec = pos[i] - pos[j] - O @ cell, |vec| < cutoff
                        v = pos[i] - (pos[j] + shift)
                        d = np.linalg.norm(v)
                        if d < cutoff and not (i == j and (off == 0).all()):
                            edges.add((i, j, ox, oy, oz))
    return edges


@pytest.mark.parametrize("seed", [0, 1])
def test_pbc_neighbor_list_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    cell = np.diag([4.0, 5.0, 6.0]) + rng.normal(size=(3, 3)) * 0.3
    pos = rng.uniform(0, 1, size=(6, 3)) @ cell + rng.normal(size=(6, 3))
    pbc = np.array([True, True, True])
    cutoff = 3.0

    ei, offs = radius_graph_pbc_np(pos, cell, pbc, cutoff)
    got = {
        (int(ei[0, k]), int(ei[1, k]), int(offs[k, 0]), int(offs[k, 1]), int(offs[k, 2]))
        for k in range(ei.shape[1])
    }
    want = brute_force_pbc_edges(pos, cell, pbc, cutoff)
    assert got == want

    # every edge's vector really is below the cutoff against ORIGINAL pos
    for k in range(ei.shape[1]):
        v = pos[ei[0, k]] - pos[ei[1, k]] - offs[k] @ cell
        assert np.linalg.norm(v) < cutoff + 1e-9


def test_pbc_partial_periodicity():
    rng = np.random.default_rng(2)
    cell = np.diag([3.5, 4.0, 30.0])
    pos = rng.uniform(0, 1, size=(5, 3)) @ cell * np.array([1, 1, 0.1])
    pbc = np.array([True, True, False])
    ei, offs = radius_graph_pbc_np(pos, cell, pbc, 3.0)
    assert (offs[:, 2] == 0).all()
    want = brute_force_pbc_edges(pos, cell, pbc, 3.0)
    got = {
        (int(ei[0, k]), int(ei[1, k]), *map(int, offs[k]))
        for k in range(ei.shape[1])
    }
    assert got == want


def make_crystal(rng, n=6):
    cell = np.diag([4.0, 4.5, 5.0]) + rng.normal(size=(3, 3)) * 0.2
    pos = rng.uniform(0, 1, size=(n, 3)) @ cell
    z = rng.integers(1, 9, size=n).astype(np.int32)
    ei, offs = radius_graph_pbc_np(pos, cell, np.ones(3, bool), 3.0)
    return Datapoint(
        atomic_numbers=z, pos=pos, cell=cell, pbc=np.ones(3, bool),
        edge_index=ei, cell_offsets=offs,
    )


@pytest.fixture(scope="module")
def pbc_model():
    module, extra, _ = resolve_model("xpainn", **KW)
    rng = np.random.default_rng(5)
    dp = make_crystal(rng)
    batch = collate([dp])
    params = init_params(module, batch)
    fwd = make_apply_forward(module, extra)
    return params, fwd


def batch_of(dp):
    return {k: jnp.asarray(v) for k, v in collate([dp]).items()}


def test_pbc_energy_invariant_under_wrapping(pbc_model, rng):
    """Translating an atom by a lattice vector (with the neighbor list
    rebuilt) must not change the energy."""
    params, fwd = pbc_model
    dp = make_crystal(rng)
    e0 = float(fwd(params, batch_of(dp), False, False)[keys.TOTAL_ENERGY][0])

    pos2 = dp.pos.copy()
    pos2[0] += dp.cell[0] + 2 * dp.cell[2]
    ei, offs = radius_graph_pbc_np(pos2, dp.cell, dp.pbc, 3.0)
    dp2 = Datapoint(dp.atomic_numbers, pos2, cell=dp.cell, pbc=dp.pbc,
                    edge_index=ei, cell_offsets=offs)
    e1 = float(fwd(params, batch_of(dp2), False, False)[keys.TOTAL_ENERGY][0])
    np.testing.assert_allclose(e1, e0, rtol=1e-5, atol=1e-5)


def test_virial_matches_strain_finite_difference(pbc_model, rng):
    """virial = -dE/dstrain: compare to central differences of the energy
    under explicit symmetric strain of positions AND cell
    (the strain trick, reference nn/basic.py:93-107)."""
    params, fwd = pbc_model
    dp = make_crystal(rng)
    out = fwd(params, batch_of(dp), False, True)
    virial = np.asarray(out[keys.VIRIAL])[0]
    assert np.isfinite(virial).all()

    eps = 1e-3
    for (a, b) in [(0, 0), (1, 1), (0, 1)]:
        def energy_at(e_ab):
            strain = np.zeros((3, 3))
            strain[a, b] = e_ab
            symm = 0.5 * (strain + strain.T)
            pos_s = dp.pos + dp.pos @ symm
            cell_s = dp.cell + dp.cell @ symm
            ei, offs = radius_graph_pbc_np(pos_s, cell_s, dp.pbc, 3.0)
            dps = Datapoint(dp.atomic_numbers, pos_s, cell=cell_s, pbc=dp.pbc,
                            edge_index=ei, cell_offsets=offs)
            return float(fwd(params, batch_of(dps), False, False)[keys.TOTAL_ENERGY][0])

        fd = -(energy_at(eps) - energy_at(-eps)) / (2 * eps)
        # the 0.5 symmetrization in the FD strain matches the 0.5 in the
        # autodiff path, so the FD equals the (symmetric) virial entry
        np.testing.assert_allclose(fd, virial[a, b], rtol=3e-2, atol=3e-3)


def test_wrap_positions_roundtrip(rng):
    cell = np.diag([3.0, 4.0, 5.0]) + rng.normal(size=(3, 3)) * 0.1
    pos = rng.normal(size=(7, 3)) * 6
    wrapped, shifts = wrap_positions(pos, cell, np.ones(3, bool))
    np.testing.assert_allclose(wrapped + shifts @ cell, pos, atol=1e-10)
    frac = wrapped @ np.linalg.inv(cell)
    assert (frac > -1e-9).all() and (frac < 1 + 1e-9).all()
