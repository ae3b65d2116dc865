"""End-to-end XPaiNN tests: energy invariance, force equivariance,
finite-difference forces, permutation and padding invariance
(SURVEY.md §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xequinet_tpu import keys
from xequinet_tpu.data.batching import collate
from xequinet_tpu.data.datapoint import Datapoint
from xequinet_tpu.models.model import resolve_model
from xequinet_tpu.models.properties import make_forward
from xequinet_tpu.ops.radius_graph import radius_graph_np

from .helpers import random_rotation

KW = dict(
    node_dim=16,
    node_irreps="16x0e+8x1o+4x2e",
    embed_basis="one-hot",
    num_basis=8,
    cutoff=5.0,
    action_blocks=2,
    output_modes=["energy"],
)


def make_molecule(rng, n=6, cutoff=5.0):
    z = rng.integers(1, 9, size=n).astype(np.int32)
    pos = rng.normal(size=(n, 3)) * 1.5
    ei, _ = radius_graph_np(pos, cutoff)
    return Datapoint(atomic_numbers=z, pos=pos, edge_index=ei)


def batch_of(dps, **caps):
    raw = collate(dps, **caps)
    return {k: jnp.asarray(v) for k, v in raw.items()}


@pytest.fixture(scope="module")
def model_and_params():
    module, extra, cutoff = resolve_model("xpainn", **KW)
    rng = np.random.default_rng(7)
    dp = make_molecule(rng)
    data = batch_of([dp])
    from xequinet_tpu.models.properties import compute_edge_data

    init_data = compute_edge_data(dict(data))
    params = module.init(jax.random.PRNGKey(0), init_data)["params"]
    fwd = make_forward(lambda d: module.apply({"params": params}, d), extra)
    return module, params, fwd


def test_forward_shapes(model_and_params, rng):
    _, _, fwd = model_and_params
    dps = [make_molecule(rng, n=5), make_molecule(rng, n=7)]
    data = batch_of(dps)
    out = fwd(data, compute_forces=True, compute_virial=False)
    G = int(data[keys.GRAPH_MASK].shape[0])
    assert out[keys.TOTAL_ENERGY].shape == (G,)
    assert out[keys.FORCES].shape == data[keys.POSITIONS].shape
    assert np.isfinite(np.asarray(out[keys.TOTAL_ENERGY])[:2]).all()
    assert np.isfinite(np.asarray(out[keys.FORCES])).all()


def test_energy_rotation_invariance_force_equivariance(model_and_params, rng):
    _, _, fwd = model_and_params
    dp = make_molecule(rng, n=8)
    R = random_rotation(rng)
    dp_rot = Datapoint(
        atomic_numbers=dp.atomic_numbers,
        pos=dp.pos @ R.T,
        edge_index=dp.edge_index,
    )
    out = fwd(batch_of([dp]), compute_forces=True)
    out_rot = fwd(batch_of([dp_rot]), compute_forces=True)
    e, e_rot = np.asarray(out[keys.TOTAL_ENERGY])[0], np.asarray(
        out_rot[keys.TOTAL_ENERGY]
    )[0]
    np.testing.assert_allclose(e_rot, e, rtol=2e-4, atol=1e-4)
    f = np.asarray(out[keys.FORCES])[: dp.num_atoms]
    f_rot = np.asarray(out_rot[keys.FORCES])[: dp.num_atoms]
    np.testing.assert_allclose(f_rot, f @ R.T, rtol=1e-3, atol=2e-4)


def test_energy_translation_invariance(model_and_params, rng):
    _, _, fwd = model_and_params
    dp = make_molecule(rng, n=8)
    dp_t = Datapoint(
        atomic_numbers=dp.atomic_numbers,
        pos=dp.pos + np.array([1.7, -2.3, 0.9]),
        edge_index=dp.edge_index,
    )
    e = np.asarray(fwd(batch_of([dp]), False)[keys.TOTAL_ENERGY])[0]
    e_t = np.asarray(fwd(batch_of([dp_t]), False)[keys.TOTAL_ENERGY])[0]
    np.testing.assert_allclose(e_t, e, rtol=1e-5, atol=1e-5)


def test_forces_match_finite_differences(model_and_params, rng):
    _, _, fwd = model_and_params
    dp = make_molecule(rng, n=5)
    data = batch_of([dp])
    out = fwd(data, compute_forces=True)
    forces = np.asarray(out[keys.FORCES])[: dp.num_atoms]

    eps = 3e-3
    for atom, axis in [(0, 0), (2, 1), (4, 2)]:
        pp = dp.pos.copy()
        pp[atom, axis] += eps
        pm = dp.pos.copy()
        pm[atom, axis] -= eps
        ep = np.asarray(
            fwd(
                batch_of([Datapoint(dp.atomic_numbers, pp, edge_index=dp.edge_index)]),
                False,
            )[keys.TOTAL_ENERGY]
        )[0]
        em = np.asarray(
            fwd(
                batch_of([Datapoint(dp.atomic_numbers, pm, edge_index=dp.edge_index)]),
                False,
            )[keys.TOTAL_ENERGY]
        )[0]
        fd = -(ep - em) / (2 * eps)
        np.testing.assert_allclose(forces[atom, axis], fd, rtol=2e-2, atol=2e-3)


def test_permutation_invariance(model_and_params, rng):
    _, _, fwd = model_and_params
    dp = make_molecule(rng, n=7)
    perm = rng.permutation(dp.num_atoms)
    inv = np.argsort(perm)
    ei_p = inv[dp.edge_index]  # relabel nodes
    dp_p = Datapoint(dp.atomic_numbers[perm], dp.pos[perm], edge_index=ei_p)
    e = np.asarray(fwd(batch_of([dp]), False)[keys.TOTAL_ENERGY])[0]
    e_p = np.asarray(fwd(batch_of([dp_p]), False)[keys.TOTAL_ENERGY])[0]
    np.testing.assert_allclose(e_p, e, rtol=1e-5, atol=1e-5)


def test_padding_invariance(model_and_params, rng):
    """Same molecule, different padding capacities -> identical energy."""
    _, _, fwd = model_and_params
    dp = make_molecule(rng, n=6)
    e1 = np.asarray(
        fwd(batch_of([dp], n_nodes=8, n_edges=64), False)[keys.TOTAL_ENERGY]
    )[0]
    e2 = np.asarray(
        fwd(batch_of([dp], n_nodes=32, n_edges=128, n_graphs=4), False)[
            keys.TOTAL_ENERGY
        ]
    )[0]
    np.testing.assert_allclose(e1, e2, rtol=1e-5, atol=1e-6)


def test_batching_equals_individual(model_and_params, rng):
    _, _, fwd = model_and_params
    dps = [make_molecule(rng, n=5), make_molecule(rng, n=9)]
    batched = fwd(batch_of(dps), compute_forces=True)
    e_b = np.asarray(batched[keys.TOTAL_ENERGY])[:2]
    for i, dp in enumerate(dps):
        single = fwd(batch_of([dp]), compute_forces=True)
        np.testing.assert_allclose(
            np.asarray(single[keys.TOTAL_ENERGY])[0], e_b[i], rtol=1e-4, atol=1e-5
        )


def test_jit_and_grad_compose(model_and_params, rng):
    """Double backward: grad of force-matching loss must be computable
    (SURVEY.md §7.3 hard part #3)."""
    module, params, _ = model_and_params
    from xequinet_tpu.models.properties import make_forward

    dp = make_molecule(rng, n=6)
    data = batch_of([dp])
    target_f = jnp.zeros_like(data[keys.POSITIONS])

    def loss_fn(p):
        fwd = make_forward(lambda d: module.apply({"params": p}, d))
        out = fwd(data, compute_forces=True)
        return jnp.sum((out[keys.FORCES] - target_f) ** 2) + jnp.sum(
            out[keys.TOTAL_ENERGY] ** 2
        )

    g = jax.jit(jax.grad(loss_fn))(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    assert any(float(jnp.abs(x).sum()) > 0 for x in flat)


def test_painn_model_runs_and_is_invariant(rng):
    """PaiNN family: forward + forces, energy rotation invariance."""
    module, extra, _ = resolve_model(
        "painn",
        node_dim=16,
        embed_basis="one-hot",
        num_basis=8,
        action_blocks=2,
        output_modes=["energy"],
    )
    dp = make_molecule(rng, n=7)
    data = batch_of([dp])
    from xequinet_tpu.models.model import init_params, make_apply_forward

    params = init_params(module, collate([dp]))
    fwd2 = make_apply_forward(module, extra)
    out = fwd2(params, data, True, False)
    assert np.isfinite(np.asarray(out[keys.FORCES])).all()

    R = random_rotation(rng)
    dp_rot = Datapoint(dp.atomic_numbers, dp.pos @ R.T, edge_index=dp.edge_index)
    out_rot = fwd2(params, batch_of([dp_rot]), True, False)
    np.testing.assert_allclose(
        np.asarray(out_rot[keys.TOTAL_ENERGY])[0],
        np.asarray(out[keys.TOTAL_ENERGY])[0],
        rtol=1e-4, atol=1e-4,
    )
    f = np.asarray(out[keys.FORCES])[: dp.num_atoms]
    f_rot = np.asarray(out_rot[keys.FORCES])[: dp.num_atoms]
    np.testing.assert_allclose(f_rot, f @ R.T, rtol=1e-3, atol=2e-4)


def test_remat_matches_no_remat(rng):
    """Rematerialized blocks must be numerically identical."""
    from xequinet_tpu.models.model import init_params, make_apply_forward

    kw = dict(KW)
    dp = make_molecule(rng, n=6)
    data = batch_of([dp])
    m1, e1, _ = resolve_model("xpainn", **kw)
    params = init_params(m1, collate([dp]))
    m2, e2, _ = resolve_model("xpainn", **kw, remat=True)
    f1 = make_apply_forward(m1, e1)
    f2 = make_apply_forward(m2, e2)
    out1 = f1(params, data, True, False)
    out2 = f2(params, data, True, False)
    np.testing.assert_allclose(
        np.asarray(out1[keys.TOTAL_ENERGY]), np.asarray(out2[keys.TOTAL_ENERGY]),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out1[keys.FORCES]), np.asarray(out2[keys.FORCES]),
        rtol=1e-5, atol=1e-6,
    )


def test_bf16_compute_close_to_f32(rng):
    """bf16 message pipeline: energies/forces within ~1% of f32."""
    from xequinet_tpu.models.model import init_params, make_apply_forward

    dp = make_molecule(rng, n=8)
    data = batch_of([dp])
    m32, e32, _ = resolve_model("xpainn", **KW)
    params = init_params(m32, collate([dp]))
    m16, e16, _ = resolve_model("xpainn", **KW, compute_dtype="bfloat16")
    out32 = make_apply_forward(m32, e32)(params, data, True, False)
    out16 = make_apply_forward(m16, e16)(params, data, True, False)
    e_a = float(out32[keys.TOTAL_ENERGY][0])
    e_b = float(out16[keys.TOTAL_ENERGY][0])
    assert abs(e_a - e_b) / max(abs(e_a), 1e-6) < 0.02, (e_a, e_b)
    f_a = np.asarray(out32[keys.FORCES])[: dp.num_atoms]
    f_b = np.asarray(out16[keys.FORCES])[: dp.num_atoms]
    denom = max(np.abs(f_a).max(), 1e-6)
    assert np.abs(f_a - f_b).max() / denom < 0.05, np.abs(f_a - f_b).max() / denom
