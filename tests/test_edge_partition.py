"""Edge-partitioned forward must reproduce the single-device result
exactly (8-device CPU mesh): energies, forces, virial."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xequinet_tpu import keys
from xequinet_tpu.data.batching import collate
from xequinet_tpu.data.datapoint import Datapoint
from xequinet_tpu.models.model import init_params, make_apply_forward, resolve_model
from xequinet_tpu.ops.radius_graph import radius_graph_np, radius_graph_pbc_np
from xequinet_tpu.parallel.edge_partition import (
    make_edge_parallel_forward,
    shard_batch,
)
from xequinet_tpu.parallel.mesh import GP_AXIS, make_mesh

N_DEV = 8


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    # one "large" periodic supercell
    cell = np.diag([6.0, 6.5, 7.0])
    pos = rng.uniform(0, 1, size=(24, 3)) @ cell
    z = rng.integers(1, 9, 24).astype(np.int32)
    ei, offs = radius_graph_pbc_np(pos, cell, np.ones(3, bool), 3.0)
    dp = Datapoint(z, pos, cell=cell, pbc=np.ones(3, bool),
                   edge_index=ei, cell_offsets=offs)
    batch = collate([dp])
    module, extra, _ = resolve_model(
        "xpainn",
        node_dim=16,
        node_irreps="16x0e+8x1o+4x2e",
        embed_basis="one-hot",
        num_basis=8,
        cutoff=3.0,
        action_blocks=2,
        output_modes=["energy"],
    )
    params = init_params(module, batch)
    fwd_single = make_apply_forward(module, extra)
    return module, extra, params, fwd_single, batch, dp


def test_edge_parallel_matches_single_device(setup):
    module, extra, params, fwd_single, batch, dp = setup
    ref = fwd_single(
        params, {k: jnp.asarray(v) for k, v in batch.items()}, True, True
    )

    mesh = make_mesh(N_DEV, axis_names=(GP_AXIS,))
    apply_fn = lambda d: module.apply({"params": params}, d)
    fwd_ep = make_edge_parallel_forward(apply_fn, mesh)
    out = fwd_ep(shard_batch(batch, mesh), True, True)

    np.testing.assert_allclose(
        np.asarray(out[keys.TOTAL_ENERGY])[0],
        np.asarray(ref[keys.TOTAL_ENERGY])[0],
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out[keys.FORCES])[: dp.num_atoms],
        np.asarray(ref[keys.FORCES])[: dp.num_atoms],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out[keys.VIRIAL])[0],
        np.asarray(ref[keys.VIRIAL])[0],
        rtol=1e-4, atol=1e-4,
    )


def test_edge_parallel_nonpbc(setup):
    module, extra, params, fwd_single, _, _ = setup
    rng = np.random.default_rng(3)
    pos = rng.normal(size=(20, 3)) * 2.5
    z = rng.integers(1, 9, 20).astype(np.int32)
    ei, _ = radius_graph_np(pos, 3.0)
    dp = Datapoint(z, pos, edge_index=ei)
    batch = collate([dp])
    ref = fwd_single(
        params, {k: jnp.asarray(v) for k, v in batch.items()}, True, False
    )
    mesh = make_mesh(N_DEV, axis_names=(GP_AXIS,))
    apply_fn = lambda d: module.apply({"params": params}, d)
    fwd_ep = make_edge_parallel_forward(apply_fn, mesh)
    out = fwd_ep(shard_batch(batch, mesh), True, False)
    np.testing.assert_allclose(
        np.asarray(out[keys.TOTAL_ENERGY])[0],
        np.asarray(ref[keys.TOTAL_ENERGY])[0],
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out[keys.FORCES])[:20],
        np.asarray(ref[keys.FORCES])[:20],
        rtol=1e-4, atol=1e-5,
    )
