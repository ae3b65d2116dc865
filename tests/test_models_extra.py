"""Tests for SO3krates, XPaiNN-Ewald, output heads, transforms."""

import jax.numpy as jnp
import numpy as np
import pytest

from xequinet_tpu import keys
from xequinet_tpu.data.batching import collate
from xequinet_tpu.data.datapoint import Datapoint
from xequinet_tpu.data.transforms import (
    DeltaTransform,
    NeighborTransform,
    SVDFrameTransform,
    UnitTransform,
    build_transform_pipeline,
)
from xequinet_tpu.models.model import init_params, make_apply_forward, resolve_model
from xequinet_tpu.ops.radius_graph import radius_graph_np, radius_graph_pbc_np

from .helpers import random_rotation


def make_molecule(rng, n=7, cutoff=5.0, labels=False):
    z = rng.integers(1, 9, size=n).astype(np.int32)
    pos = rng.normal(size=(n, 3)) * 1.5
    ei, _ = radius_graph_np(pos, cutoff)
    kw = {}
    if labels:
        kw = dict(
            energy=float(rng.normal()),
            forces=rng.normal(size=(n, 3)),
            dipole=rng.normal(size=3),
            charge=0,
            spin=0,
        )
    return Datapoint(atomic_numbers=z, pos=pos, edge_index=ei, **kw)


def batch_of(dps, **caps):
    return {k: jnp.asarray(v) for k, v in collate(dps, **caps).items()}


def _build(name, **kw):
    module, extra, _ = resolve_model(name, **kw)
    return module, extra


# ---------------------------------------------------------------------------
# SO3krates
# ---------------------------------------------------------------------------
def test_so3krates_runs_and_equivariant(rng):
    module, extra = _build(
        "so3krates",
        node_dim=24,
        node_channel=8,
        max_l=2,
        num_heads=4,
        embed_basis="one-hot",
        num_basis=8,
        action_blocks=2,
        output_modes=["energy"],
    )
    dp = make_molecule(rng)
    params = init_params(module, collate([dp]))
    fwd = make_apply_forward(module, extra)
    out = fwd(params, batch_of([dp]), True, False)
    assert np.isfinite(np.asarray(out[keys.FORCES])).all()

    R = random_rotation(rng)
    dp_rot = Datapoint(dp.atomic_numbers, dp.pos @ R.T, edge_index=dp.edge_index)
    out_rot = fwd(params, batch_of([dp_rot]), True, False)
    np.testing.assert_allclose(
        np.asarray(out_rot[keys.TOTAL_ENERGY])[0],
        np.asarray(out[keys.TOTAL_ENERGY])[0],
        rtol=5e-4, atol=5e-4,
    )
    f = np.asarray(out[keys.FORCES])[: dp.num_atoms]
    f_rot = np.asarray(out_rot[keys.FORCES])[: dp.num_atoms]
    np.testing.assert_allclose(f_rot, f @ R.T, rtol=2e-3, atol=5e-4)


# ---------------------------------------------------------------------------
# Ewald
# ---------------------------------------------------------------------------
def make_crystal(rng, n=6, cutoff=3.0):
    cell = np.diag([4.0, 4.5, 5.0]) + rng.normal(size=(3, 3)) * 0.2
    pos = rng.uniform(0, 1, size=(n, 3)) @ cell
    z = rng.integers(1, 9, size=n).astype(np.int32)
    ei, offs = radius_graph_pbc_np(pos, cell, np.ones(3, bool), cutoff)
    return Datapoint(z, pos, cell=cell, pbc=np.ones(3, bool),
                     edge_index=ei, cell_offsets=offs)


def test_xpainn_ewald_pbc(rng):
    module, extra = _build(
        "xpainn-ewald",
        node_dim=16,
        node_irreps="16x0e+8x1o+4x2e",
        embed_basis="one-hot",
        num_basis=8,
        cutoff=3.0,
        action_blocks=1,
        ewald_blocks=1,
        use_pbc=True,
        num_k_points=[2, 2, 2],
        output_modes=["energy"],
    )
    dp = make_crystal(rng)
    params = init_params(module, collate([dp]))
    fwd = make_apply_forward(module, extra)
    out = fwd(params, batch_of([dp]), True, True)
    assert np.isfinite(np.asarray(out[keys.TOTAL_ENERGY])[0])
    assert np.isfinite(np.asarray(out[keys.FORCES])).all()
    assert np.isfinite(np.asarray(out[keys.VIRIAL])[0]).all()

    # energy invariant under lattice translation of one atom
    pos2 = dp.pos.copy()
    pos2[0] += dp.cell[1]
    ei, offs = radius_graph_pbc_np(pos2, dp.cell, dp.pbc, 3.0)
    dp2 = Datapoint(dp.atomic_numbers, pos2, cell=dp.cell, pbc=dp.pbc,
                    edge_index=ei, cell_offsets=offs)
    e0 = float(out[keys.TOTAL_ENERGY][0])
    e1 = float(fwd(params, batch_of([dp2]), False, False)[keys.TOTAL_ENERGY][0])
    # invariance is exact analytically (k.a = 2 pi m); the tolerance covers
    # f32 rounding of the large k.r phases
    np.testing.assert_allclose(e1, e0, rtol=1e-3, atol=2e-3)


def test_xpainn_ewald_nonpbc_runs(rng):
    module, extra = _build(
        "xpainn-ewald",
        node_dim=16,
        node_irreps="16x0e+8x1o+4x2e",
        embed_basis="one-hot",
        num_basis=8,
        action_blocks=1,
        ewald_blocks=1,
        use_pbc=False,
        k_cutoff=0.4,
        delta_k=0.2,
        num_k_basis=8,
        output_modes=["energy"],
    )
    dp = make_molecule(rng)
    params = init_params(module, collate([dp]))
    fwd = make_apply_forward(module, extra)
    out = fwd(params, batch_of([dp]), True, False)
    assert np.isfinite(np.asarray(out[keys.FORCES])).all()


# ---------------------------------------------------------------------------
# Output heads
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def multihead():
    module, extra, _ = resolve_model(
        "xpainn",
        node_dim=16,
        node_irreps="16x0e+8x1o+4x2e",
        embed_basis="one-hot",
        num_basis=8,
        action_blocks=1,
        charge_embed=True,
        spin_embed=True,
        output_modes=["energy", "charges", "dipole", "polar", "spatial"],
    )
    rng = np.random.default_rng(42)
    dp = make_molecule(rng, labels=True)
    params = init_params(module, collate([dp]))
    fwd = make_apply_forward(module, extra)
    return params, fwd


def test_charge_conservation(multihead, rng):
    params, fwd = multihead
    dp = make_molecule(rng, labels=True)
    dp.charge = 2
    out = fwd(params, batch_of([dp]), False, False)
    q = np.asarray(out[keys.ATOMIC_CHARGES])[: dp.num_atoms]
    np.testing.assert_allclose(q.sum(), 2.0, atol=1e-4)


def test_dipole_equivariance(multihead, rng):
    params, fwd = multihead
    dp = make_molecule(rng, labels=True)
    R = random_rotation(rng)
    out = fwd(params, batch_of([dp]), False, False)
    dp_rot = Datapoint(
        dp.atomic_numbers, dp.pos @ R.T, edge_index=dp.edge_index,
        charge=dp.charge, spin=dp.spin,
    )
    out_rot = fwd(params, batch_of([dp_rot]), False, False)
    d = np.asarray(out[keys.DIPOLE])[0]
    d_rot = np.asarray(out_rot[keys.DIPOLE])[0]
    np.testing.assert_allclose(d_rot, R @ d, rtol=2e-3, atol=1e-4)


def test_polar_equivariance_and_symmetry(multihead, rng):
    params, fwd = multihead
    dp = make_molecule(rng, labels=True)
    R = random_rotation(rng)
    out = fwd(params, batch_of([dp]), False, False)
    alpha = np.asarray(out[keys.POLARIZABILITY])[0]
    np.testing.assert_allclose(alpha, alpha.T, atol=1e-5)
    dp_rot = Datapoint(
        dp.atomic_numbers, dp.pos @ R.T, edge_index=dp.edge_index,
        charge=dp.charge, spin=dp.spin,
    )
    alpha_rot = np.asarray(
        fwd(params, batch_of([dp_rot]), False, False)[keys.POLARIZABILITY]
    )[0]
    np.testing.assert_allclose(alpha_rot, R @ alpha @ R.T, rtol=5e-3, atol=5e-4)


def test_cartesian_tensor_head(rng):
    module, extra, _ = resolve_model(
        "xpainn",
        node_dim=16,
        node_irreps="16x0e+8x1o+4x2e",
        embed_basis="one-hot",
        num_basis=8,
        action_blocks=1,
        output_modes=["cartesian"],
        hidden_channels=4,
        symmetry="ij",
        order=2,
    )
    dp = make_molecule(rng)
    params = init_params(module, collate([dp]))
    fwd = make_apply_forward(module, extra)
    out = fwd(params, batch_of([dp]), False, False)
    T = np.asarray(out[keys.CARTESIAN_TENSOR])[0]
    assert T.shape == (3, 3) and np.isfinite(T).all()
    # equivariance: T(Rx) = R T R^T
    R = random_rotation(rng)
    dp_rot = Datapoint(dp.atomic_numbers, dp.pos @ R.T, edge_index=dp.edge_index)
    T_rot = np.asarray(
        fwd(params, batch_of([dp_rot]), False, False)[keys.CARTESIAN_TENSOR]
    )[0]
    np.testing.assert_allclose(T_rot, R @ T @ R.T, rtol=5e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# Transforms
# ---------------------------------------------------------------------------
def test_unit_transform():
    from xequinet_tpu.utils.qc import set_default_units

    set_default_units({keys.TOTAL_ENERGY: "eV", keys.POSITIONS: "Angstrom"})
    dp = Datapoint(
        np.array([1, 1]), np.array([[0.0, 0, 0], [0, 0, 1.0]]),
        energy=1.0, forces=np.ones((2, 3)),
    )
    t = UnitTransform({keys.TOTAL_ENERGY: "Hartree", keys.POSITIONS: "Angstrom"})
    dp = t(dp)
    np.testing.assert_allclose(dp.energy, 27.211386, rtol=1e-5)
    # restore defaults for other tests
    set_default_units({keys.TOTAL_ENERGY: "eV"})


def test_delta_transform():
    dp = Datapoint(
        np.array([1, 1]), np.zeros((2, 3)),
        energy=5.0, base_energy=3.0,
        forces=np.ones((2, 3)), base_forces=0.5 * np.ones((2, 3)),
    )
    t = DeltaTransform(["base_energy", "base_forces"])
    dp = t(dp)
    np.testing.assert_allclose(dp.energy, 2.0)
    np.testing.assert_allclose(dp.forces, 0.5 * np.ones((2, 3)))


def test_svd_frame_transform(rng):
    pos = rng.normal(size=(5, 3))
    f = rng.normal(size=(5, 3))
    d = rng.normal(size=3)
    dp = Datapoint(np.ones(5, dtype=int), pos, forces=f, dipole=d)
    R = random_rotation(rng)
    dp_rot = Datapoint(np.ones(5, dtype=int), pos @ R.T, forces=f @ R.T, dipole=R @ d)
    t = SVDFrameTransform(vector_targets=[keys.DIPOLE], atomic_vector_targets=[keys.FORCES])
    a, b = t(dp), t(dp_rot)
    # SVD frame is unique up to axis sign flips; compare |components|
    np.testing.assert_allclose(np.abs(a.pos), np.abs(b.pos), atol=1e-6)
    np.testing.assert_allclose(np.abs(a.forces), np.abs(b.forces), atol=1e-6)
    np.testing.assert_allclose(np.abs(a.dipole), np.abs(b.dipole), atol=1e-6)


def test_neighbor_transform_pipeline(rng):
    dp = Datapoint(
        rng.integers(1, 9, 5).astype(np.int32), rng.normal(size=(5, 3)) * 1.5
    )
    pipe = build_transform_pipeline(cutoff=5.0)
    dp = pipe(dp)
    assert dp.edge_index is not None and dp.num_edges > 0
