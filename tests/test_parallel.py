"""Distributed tests on the virtual 8-device CPU mesh: grad-psum DP must
match single-device training (SURVEY.md §4, the gloo-analogue check)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xequinet_tpu import keys
from xequinet_tpu.data.batching import collate
from xequinet_tpu.data.datapoint import Datapoint
from xequinet_tpu.models.model import init_params, make_apply_forward, resolve_model
from xequinet_tpu.ops.radius_graph import radius_graph_np
from xequinet_tpu.parallel.data_parallel import (
    device_put_sharded_batch,
    make_dp_train_step,
    replicate,
    stack_device_batches,
)
from xequinet_tpu.parallel.mesh import make_mesh
from xequinet_tpu.training.loss import ErrorMetric, WeightedLoss
from xequinet_tpu.training.lr_schedule import resolve_lr_schedule, resolve_optimizer
from xequinet_tpu.training.trainer import make_step_core

N_DEV = 8


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= N_DEV
    rng = np.random.default_rng(3)
    dps = []
    for _ in range(2):
        n = 6
        z = rng.integers(1, 5, n).astype(np.int32)
        pos = rng.normal(size=(n, 3)) * 1.4
        ei, _ = radius_graph_np(pos, 5.0)
        dps.append(
            Datapoint(z, pos, edge_index=ei, energy=float(rng.normal()),
                      forces=rng.normal(size=(n, 3)))
        )
    batch = collate(dps)
    module, extra, _ = resolve_model(
        "xpainn",
        node_dim=16,
        node_irreps="16x0e+8x1o+4x2e",
        embed_basis="one-hot",
        num_basis=8,
        action_blocks=2,
        output_modes=["energy"],
    )
    params = init_params(module, batch)
    apply_forward = make_apply_forward(module, extra)

    lossfn = WeightedLoss("l2", **{keys.TOTAL_ENERGY: 1.0, keys.FORCES: 1.0})
    metric = ErrorMetric(keys.TOTAL_ENERGY, keys.FORCES)
    optimizer = resolve_optimizer(
        "adamw", resolve_lr_schedule("cosine_annealing", 1e-3, 100)
    )
    core = make_step_core(
        apply_forward, lossfn, optimizer, True, False, None, None, metric
    )
    return module, params, optimizer, core, batch


def test_dp_step_matches_single_device(setup):
    """Identical replica batches -> pmean(grads) == single grads, so the
    updated parameters must match bit-for-bit (up to f32 reduction order)."""
    _, params, optimizer, core, batch = setup

    one = jnp.asarray(1.0)

    # single device
    state0 = (params, optimizer.init(params), None)
    (p_single, _, _), loss_single, m_single = jax.jit(core)(
        state0, {k: jnp.asarray(v) for k, v in batch.items()}, one
    )

    # 8-device DP with the same batch on every replica
    mesh = make_mesh(N_DEV)
    dp_step = make_dp_train_step(core, mesh)
    state = replicate((params, optimizer.init(params), None), mesh)
    stacked = stack_device_batches([batch] * N_DEV)
    sharded = device_put_sharded_batch(stacked, mesh)
    (p_dp, _, _), loss_dp, m_dp = dp_step(state, sharded, one)

    np.testing.assert_allclose(
        float(loss_dp), float(loss_single), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(p_single), jax.tree_util.tree_leaves(p_dp)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    # metric counts are psum'd: 8x the single-device count
    for prop in m_single:
        np.testing.assert_allclose(
            np.asarray(m_dp[prop][2]), 8 * np.asarray(m_single[prop][2])
        )


def test_dp_different_batches_runs(setup):
    """Different per-replica batches: one step runs and yields finite loss."""
    _, params, optimizer, core, batch = setup
    rng = np.random.default_rng(11)
    mesh = make_mesh(N_DEV)
    dp_step = make_dp_train_step(core, mesh)
    state = replicate((params, optimizer.init(params), None), mesh)

    batches = []
    for _ in range(N_DEV):
        dps = []
        for _ in range(2):
            n = 6
            z = rng.integers(1, 5, n).astype(np.int32)
            pos = rng.normal(size=(n, 3)) * 1.4
            ei, _ = radius_graph_np(pos, 5.0)
            dps.append(
                Datapoint(z, pos, edge_index=ei, energy=float(rng.normal()),
                          forces=rng.normal(size=(n, 3)))
            )
        caps = dict(n_nodes=batch[keys.POSITIONS].shape[0],
                    n_edges=batch[keys.EDGE_MASK].shape[0],
                    n_graphs=batch[keys.GRAPH_MASK].shape[0])
        batches.append(collate(dps, **caps))
    sharded = device_put_sharded_batch(stack_device_batches(batches), mesh)
    (p, _, _), loss, _ = dp_step(state, sharded, jnp.asarray(1.0))
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(p))


def test_weak_scaling_collective_bytes():
    """O(halo*D) vs O(N*D) scaling, asserted from the compiler's own
    output (VERDICT round-2 item 4): per mesh size, the halo path's
    collective bytes grow ~linearly in n_shards (each shard exchanges
    two halo windows per aggregation), while GSPMD edge sharding
    all-reduces full node arrays — at 8 devices the gap must be large."""
    import jax
    import jax.numpy as jnp

    from tools.measure_comm_volume import collective_bytes
    from xequinet_tpu.data.batching import collate
    from xequinet_tpu.data.datapoint import Datapoint
    from xequinet_tpu.models.model import init_params, resolve_model
    from xequinet_tpu.ops.radius_graph import radius_graph_np
    from xequinet_tpu.parallel.halo import halo_partition, make_halo_forward
    from xequinet_tpu.parallel.mesh import GP_AXIS, make_mesh

    rng = np.random.default_rng(0)
    n = 512
    x = np.cumsum(rng.uniform(0.25, 0.5, size=n))
    pos = np.column_stack([x, rng.normal(size=(n, 2)) * 2.0])
    z = rng.integers(1, 9, size=n).astype(np.int32)
    ei, _ = radius_graph_np(pos, 5.0)
    ei = ei[:, np.argsort(ei[0], kind="stable")]

    kw = dict(node_dim=32, node_irreps="32x0e+16x1o", embed_basis="one-hot",
              num_basis=8, action_blocks=2, output_modes=["energy"])
    module, extra, _ = resolve_model("xpainn", **kw)
    params = init_params(module, collate([Datapoint(z, pos, edge_index=ei)]))
    apply_bound = lambda d: module.apply({"params": params}, d)

    feat_dim = 32 + (32 + 16 * 3)  # scalar + equivariant channels
    bytes_at = {}
    for s in (2, 8):
        mesh = make_mesh(s, axis_names=(GP_AXIS,))
        stacked, geom = halo_partition(z, pos, ei, s, halo=32)
        fwd = make_halo_forward(apply_bound, mesh, geom, GP_AXIS)
        lowered = jax.jit(
            lambda b: fwd(b, compute_forces=True)
        ).lower({k: jnp.asarray(v) for k, v in stacked.items()})
        bytes_at[s] = collective_bytes(lowered.compile().as_text())["total"]
        # O(n_shards * halo * D): generous constant covers fwd+bwd
        # refreshes over all blocks plus the position window exchange
        per_agg = 2 * geom["halo"] * feat_dim * 4
        assert bytes_at[s] < 40 * s * per_agg, (
            f"halo bytes {bytes_at[s]} not O(S*halo*D) at S={s}"
        )
        # and NOT O(n_nodes * D) per aggregation per shard
        assert bytes_at[s] < 0.5 * s * 6 * n * feat_dim * 4

    # near-linear growth in mesh size (windows fixed, one per shard)
    assert bytes_at[8] <= 5.5 * bytes_at[2]
