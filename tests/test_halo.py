"""Halo-exchange domain decomposition (parallel/halo): exactness of
energy and forces vs the single-device forward on the 8-device CPU mesh,
plus the comm-volume accounting vs the GSPMD edge-sharding path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xequinet_tpu import keys
from xequinet_tpu.data.batching import collate
from xequinet_tpu.data.datapoint import Datapoint
from xequinet_tpu.models.model import (
    init_params,
    make_apply_forward,
    resolve_model,
)
from xequinet_tpu.ops.radius_graph import radius_graph_np
from xequinet_tpu.parallel.halo import (
    comm_bytes_per_block,
    halo_partition,
    make_halo_forward,
)
from xequinet_tpu.parallel.mesh import GP_AXIS, make_mesh


def _chain_system(rng, n=180, cutoff=5.0):
    """A spatially sorted quasi-1D system: nodes ordered along x so edge
    index reach is bounded (the cell-list ordering contract)."""
    x = np.cumsum(rng.uniform(0.8, 1.6, size=n))
    yz = rng.normal(size=(n, 2)) * 1.2
    pos = np.column_stack([x, yz])
    z = rng.integers(1, 9, size=n).astype(np.int32)
    ei, _ = radius_graph_np(pos, cutoff)
    order = np.argsort(ei[0], kind="stable")
    return z, pos, ei[:, order]


@pytest.fixture(scope="module")
def model_and_params():
    kw = dict(node_dim=16, node_irreps="16x0e+8x1o", embed_basis="one-hot",
              num_basis=8, action_blocks=2, output_modes=["energy"])
    module, extra, _ = resolve_model("xpainn", **kw)
    rng = np.random.default_rng(0)
    z, pos, ei = _chain_system(rng, n=40)
    batch = collate([Datapoint(z, pos, edge_index=ei)])
    params = init_params(module, batch)
    return module, extra, params


def test_halo_matches_single_device(model_and_params, rng):
    module, extra, params = model_and_params
    z, pos, ei = _chain_system(rng, n=180)

    # single-device reference
    batch = collate([Datapoint(z, pos, edge_index=ei)])
    fwd = make_apply_forward(module, extra)
    b = {k: jnp.asarray(v) for k, v in batch.items()}
    ref = fwd(params, b, True, False)
    e_ref = float(np.asarray(ref[keys.TOTAL_ENERGY])[0])
    f_ref = np.asarray(ref[keys.FORCES])[: len(z)]

    mesh = make_mesh(8, axis_names=(GP_AXIS,))
    stacked, geom = halo_partition(z, pos, ei, 8, halo=24)
    apply_bound = lambda d: module.apply({"params": params}, d)
    halo_fwd = make_halo_forward(apply_bound, mesh, geom, GP_AXIS)
    e, f = halo_fwd(stacked, compute_forces=True)

    np.testing.assert_allclose(float(e), e_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(f)[: len(z)], f_ref, rtol=1e-4, atol=1e-5
    )


def test_halo_energy_only(model_and_params, rng):
    module, extra, params = model_and_params
    z, pos, ei = _chain_system(rng, n=96)
    batch = collate([Datapoint(z, pos, edge_index=ei)])
    fwd = make_apply_forward(module, extra)
    b = {k: jnp.asarray(v) for k, v in batch.items()}
    e_ref = float(np.asarray(fwd(params, b, False, False)[keys.TOTAL_ENERGY])[0])

    mesh = make_mesh(4, axis_names=(GP_AXIS,))
    stacked, geom = halo_partition(z, pos, ei, 4, halo=24)
    halo_fwd = make_halo_forward(lambda d: module.apply({"params": params}, d), mesh, geom, GP_AXIS)
    e, f = halo_fwd(stacked, compute_forces=False)
    assert f is None
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-5, atol=1e-5)


def test_halo_partition_validates_reach(rng):
    z = np.ones(64, dtype=np.int32)
    pos = rng.normal(size=(64, 3))
    # an edge from node 0 to node 63 exceeds any 8-row halo
    ei = np.array([[0, 63], [63, 0]], dtype=np.int32)
    with pytest.raises(ValueError):
        halo_partition(z, pos, ei, 8, halo=8)


def test_comm_accounting():
    geom = {"n_local": 128, "halo": 24, "window": 176}
    v = comm_bytes_per_block(geom, feat_dim=512, n_nodes=1024)
    assert v["halo_exchange"] == 2 * 24 * 512 * 4
    assert v["gspmd_allreduce"] == 1024 * 512 * 4
    assert v["halo_exchange"] * 10 < v["gspmd_allreduce"]


def test_halo_balanced_matches_single_device(model_and_params, rng):
    """Edge-balanced partition (balance_edges=True): exact vs single
    device on a density-skewed system, with a smaller per-shard edge
    capacity than the equal-node split (SURVEY.md 7.3 hard part 5)."""
    module, extra, params = model_and_params
    # density skew: tight spacing in the first third, sparse after
    gaps = np.concatenate([
        rng.uniform(0.35, 0.6, size=60), rng.uniform(1.2, 1.8, size=120)
    ])
    x = np.cumsum(gaps)
    pos = np.column_stack([x, rng.normal(size=(180, 2)) * 1.2])
    z = rng.integers(1, 9, size=180).astype(np.int32)
    ei, _ = radius_graph_np(pos, 5.0)
    ei = ei[:, np.argsort(ei[0], kind="stable")]

    batch = collate([Datapoint(z, pos, edge_index=ei)])
    fwd = make_apply_forward(module, extra)
    b = {k: jnp.asarray(v) for k, v in batch.items()}
    ref = fwd(params, b, True, False)
    e_ref = float(np.asarray(ref[keys.TOTAL_ENERGY])[0])
    f_ref = np.asarray(ref[keys.FORCES])[: len(z)]

    # per-shard edge counts are halo-independent, so each partition uses
    # the halo its own geometry admits (halo <= n_local, and balancing
    # inserts boundary padding that widens cross-boundary index reach)
    mesh = make_mesh(8, axis_names=(GP_AXIS,))
    stacked_eq, _ = halo_partition(z, pos, ei, 8, halo=24)
    stacked_bal, geom = halo_partition(z, pos, ei, 8, halo=40,
                                       balance_edges=True)
    # balanced split must cut the padded edge capacity on skewed density
    assert stacked_bal[keys.EDGE_MASK].shape[1] < stacked_eq[
        keys.EDGE_MASK
    ].shape[1]
    # ... and per-shard real-edge counts must be near-uniform
    per_shard = stacked_bal[keys.EDGE_MASK].sum(axis=1)
    assert per_shard.max() - per_shard.min() <= per_shard.max() * 0.5 + 64

    apply_bound = lambda d: module.apply({"params": params}, d)
    halo_fwd = make_halo_forward(apply_bound, mesh, geom, GP_AXIS)
    e, f = halo_fwd(stacked_bal, compute_forces=True)
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-5, atol=1e-5)

    # forces come back in padded-global order; strip per-shard padding
    nl = geom["n_local"]
    nm = stacked_bal[keys.NODE_MASK][:, geom["halo"] : geom["halo"] + nl]
    f_real = np.asarray(f).reshape(8 * nl, 3)[nm.reshape(-1)]
    np.testing.assert_allclose(f_real, f_ref, rtol=1e-4, atol=1e-5)


def test_halo_train_step_matches_single_device(model_and_params, rng):
    """One optimizer step on a halo-decomposed large system == the same
    step computed on a single device over the whole system: identical
    loss and identical updated parameters (SURVEY.md §5.7 — training,
    not just inference, over the domain decomposition)."""
    import optax

    from xequinet_tpu.models.properties import compute_edge_data
    from xequinet_tpu.parallel.halo import make_halo_train_step

    module, extra, params = model_and_params
    z, pos, ei = _chain_system(rng, n=160)
    n = len(z)
    e_label = float(rng.normal()) * 5.0
    f_label = rng.normal(size=(n, 3)).astype(np.float32)

    # --- single-device reference loss/grads over the whole system ---
    batch = collate([Datapoint(z, pos, edge_index=ei)])
    data0 = {k: jnp.asarray(v) for k, v in batch.items()}
    wE, wF = 1.0, 10.0

    def ref_loss(p):
        def energy_of(pp):
            d = dict(data0)
            d[keys.POSITIONS] = pp
            d = compute_edge_data(d, None)
            out = module.apply({"params": p}, d)
            return jnp.sum(
                jnp.where(d[keys.GRAPH_MASK], out[keys.TOTAL_ENERGY], 0.0)
            )

        e, g = jax.value_and_grad(energy_of)(data0[keys.POSITIONS])
        forces = -g
        nm = data0[keys.NODE_MASK]
        sq = jnp.where(
            nm[:, None], (forces[: nm.shape[0]] - jnp.asarray(
                np.pad(f_label, ((0, nm.shape[0] - n), (0, 0)))
            )) ** 2, 0.0,
        )
        return wE * (e - e_label) ** 2 + wF * jnp.sum(sq) / (3.0 * n)

    optimizer = optax.sgd(1e-4)
    loss_ref, grads_ref = jax.value_and_grad(
        lambda p: ref_loss(p)
    )(params)
    upd_ref, _ = optimizer.update(grads_ref, optimizer.init(params), params)
    params_ref = optax.apply_updates(params, upd_ref)

    # --- halo train step over the 8-device mesh ---
    mesh = make_mesh(8, axis_names=(GP_AXIS,))
    stacked, geom = halo_partition(z, pos, ei, 8, halo=16)
    nl, h = geom["n_local"], geom["halo"]
    f_stacked = np.zeros((8, nl, 3), dtype=np.float32)
    f_pad = np.zeros((8 * nl, 3), dtype=np.float32)
    f_pad[:n] = f_label
    f_stacked[:] = f_pad.reshape(8, nl, 3)

    step = make_halo_train_step(
        lambda p, d: module.apply({"params": p}, d), mesh, geom,
        optimizer, energy_weight=wE, forces_weight=wF,
    )
    state = (params, optimizer.init(params))
    (params_new, _), loss = step(
        state, stacked, jnp.asarray(e_label), jnp.asarray(f_stacked)
    )

    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_new),
        jax.tree_util.tree_leaves(params_ref),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7
        )


def test_halo_calculator_matches_calculator(tmp_path, rng):
    """HaloCalculator (one large system over the 8-device mesh) ==
    the single-device Calculator: energies and forces, across two
    geometries reusing one compiled program — the multi-chip MD force
    provider (beyond the reference: its MD system must fit one GPU)."""
    from xequinet_tpu.interface.calculator import Calculator
    from xequinet_tpu.models.model import resolve_model
    from xequinet_tpu.parallel.halo import HaloCalculator
    from xequinet_tpu.training.trainer import save_checkpoint
    from xequinet_tpu.utils.config import ModelConfig, config_to_dict

    kw = dict(node_dim=16, node_irreps="16x0e+8x1o", embed_basis="one-hot",
              num_basis=8, cutoff=5.0, action_blocks=2,
              output_modes=["energy"])
    module, extra, _ = resolve_model("xpainn", **kw)
    n = 200
    x = np.cumsum(rng.uniform(0.8, 1.6, size=n))
    pos = np.column_stack([x, rng.normal(size=(n, 2)) * 1.2])
    shuffle = rng.permutation(n)  # input NOT spatially sorted
    pos = pos[shuffle]
    z = rng.integers(1, 9, size=n).astype(np.int32)

    from xequinet_tpu.models.model import init_params
    from xequinet_tpu.ops.radius_graph import radius_graph_np

    ei, _ = radius_graph_np(pos, 5.0)
    params = init_params(module, collate([Datapoint(z, pos, edge_index=ei)]))
    ckpt = str(tmp_path / "halo.ckpt")
    save_checkpoint(ckpt, params,
                    config_to_dict(ModelConfig(model_name="xpainn",
                                               model_kwargs=kw)))

    ref = Calculator(ckpt)
    hc = HaloCalculator(ckpt, n_shards=8)
    for step in range(2):
        p = pos + step * 0.02 * rng.normal(size=pos.shape)
        r0 = ref.calculate(z, p)
        r1 = hc.calculate(z, p)
        np.testing.assert_allclose(
            r1[keys.TOTAL_ENERGY], r0[keys.TOTAL_ENERGY],
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            r1[keys.FORCES], r0[keys.FORCES], rtol=1e-4, atol=1e-5
        )
    assert len(hc._fwd_cache) == 1, "moving geometry must reuse one program"


def test_halo_calculator_pbc_matches_calculator(tmp_path, rng):
    """Periodic supercell over the mesh (VERDICT round-2 item 10: the
    BASELINE.md config-5 workload): HaloCalculator == single-device
    Calculator on a crystal with wrap edges on EVERY axis — the boundary
    exchange closes cyclically with the lattice shift, residual images
    ride CELL_OFFSETS.  Two geometries reuse one compiled program."""
    from xequinet_tpu.interface.calculator import Calculator
    from xequinet_tpu.models.model import init_params, resolve_model
    from xequinet_tpu.ops.radius_graph import radius_graph_np
    from xequinet_tpu.parallel.halo import HaloCalculator
    from xequinet_tpu.training.trainer import save_checkpoint
    from xequinet_tpu.utils.config import ModelConfig, config_to_dict

    kw = dict(node_dim=16, node_irreps="16x0e+8x1o", embed_basis="one-hot",
              num_basis=8, cutoff=5.0, action_blocks=2,
              output_modes=["energy"])
    module, extra, _ = resolve_model("xpainn", **kw)
    n = 256
    lx = n * 1.1
    cell = np.diag([lx, 11.5, 11.5])
    x = (np.arange(n) * 1.1 + rng.normal(size=n) * 0.05) % lx
    pos = np.column_stack([x, rng.uniform(0, 11.5, size=(n, 2))])
    shuffle = rng.permutation(n)  # input NOT spatially sorted
    pos = pos[shuffle]
    z = rng.integers(1, 9, size=n).astype(np.int32)
    pbc = np.array([True, True, True])

    ei, _ = radius_graph_np(pos, 5.0)
    params = init_params(module, collate([Datapoint(z, pos, edge_index=ei)]))
    ckpt = str(tmp_path / "halo_pbc.ckpt")
    save_checkpoint(ckpt, params,
                    config_to_dict(ModelConfig(model_name="xpainn",
                                               model_kwargs=kw)))

    ref = Calculator(ckpt, max_edges=16384)
    hc = HaloCalculator(ckpt, n_shards=4)
    for step in range(2):
        p = pos + step * 0.02 * rng.normal(size=pos.shape)
        r0 = ref.calculate(z, p, cell=cell, pbc=pbc)
        r1 = hc.calculate(z, p, cell=cell, pbc=pbc)
        np.testing.assert_allclose(
            r1[keys.TOTAL_ENERGY], r0[keys.TOTAL_ENERGY],
            rtol=1e-5, atol=1e-4,
        )
        f_scale = np.abs(r0[keys.FORCES]).max()
        assert np.abs(
            r1[keys.FORCES] - r0[keys.FORCES]
        ).max() < 1e-3 * f_scale + 1e-4
    assert len(hc._fwd_cache) == 1, "moving geometry must reuse one program"


def test_run_md_halo_matches_single_device(tmp_path, rng):
    """`xeq md` with halo_devices=8: a short NVE trajectory of one large
    system over the mesh equals the single-device trajectory."""
    from xequinet_tpu.data.fmt_conversion import read_xyz, write_xyz
    from xequinet_tpu.models.model import init_params, resolve_model
    from xequinet_tpu.run.dynamics import run_md
    from xequinet_tpu.training.trainer import save_checkpoint
    from xequinet_tpu.utils.config import (
        MDConfig, ModelConfig, config_to_dict,
    )

    kw = dict(node_dim=16, node_irreps="16x0e+8x1o", embed_basis="one-hot",
              num_basis=8, cutoff=5.0, action_blocks=1,
              output_modes=["energy"])
    module, extra, _ = resolve_model("xpainn", **kw)
    n = 120
    x = np.cumsum(rng.uniform(0.9, 1.5, size=n))
    pos = np.column_stack([x, rng.normal(size=(n, 2)) * 1.0])
    z = rng.integers(1, 5, size=n).astype(np.int32)
    ei, _ = radius_graph_np(pos, 5.0)
    params = init_params(module, collate([Datapoint(z, pos, edge_index=ei)]))
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, params,
                    config_to_dict(ModelConfig(model_name="xpainn",
                                               model_kwargs=kw)))
    xyz = tmp_path / "in.xyz"
    write_xyz(str(xyz), [Datapoint(z, pos)])

    def md(tag, halo_devices):
        cfg = MDConfig(
            ensembles=[{"name": "nve", "timestep": 0.5, "steps": 4,
                        "log_interval": 2}],
            input_file=str(xyz), model_file=ckpt,
            logfile=str(tmp_path / f"{tag}.log"),
            xyz_traj=str(tmp_path / f"{tag}.xyz"),
            seed=5, init_temperature=30.0, halo_devices=halo_devices,
        )
        run_md(cfg)
        return read_xyz(str(tmp_path / f"{tag}.xyz"))

    ref = md("single", 0)
    halo = md("halo", 8)
    assert len(ref) == len(halo) >= 2
    np.testing.assert_allclose(
        halo[-1].pos, ref[-1].pos, rtol=1e-4, atol=1e-5
    )


def test_halo_dp_train_step_matches_single_device(model_and_params, rng):
    """2-D dp x halo (parallel/halo.make_halo_dp_train_step): one
    optimizer step over a BATCH of 2 large systems, each decomposed over
    4 shards (mesh (2, 4)), equals the single-device step on the
    dp-mean loss — identical loss and updated parameters."""
    import optax

    from xequinet_tpu.models.properties import compute_edge_data
    from xequinet_tpu.parallel.halo import (
        make_halo_dp_train_step, stack_halo_systems,
    )

    module, extra, params = model_and_params
    n = 96
    systems = [_chain_system(rng, n=n) for _ in range(2)]
    e_labels = [float(rng.normal()) * 5.0 for _ in range(2)]
    f_labels = [rng.normal(size=(n, 3)).astype(np.float32)
                for _ in range(2)]
    wE, wF = 1.0, 10.0

    # --- single-device reference: dp-mean of the per-system losses ---
    def one_ref_loss(p, z, pos, ei, e_label, f_label):
        batch = collate([Datapoint(z, pos, edge_index=ei)])
        data0 = {k: jnp.asarray(v) for k, v in batch.items()}

        def energy_of(pp):
            d = dict(data0)
            d[keys.POSITIONS] = pp
            d = compute_edge_data(d, None)
            out = module.apply({"params": p}, d)
            return jnp.sum(
                jnp.where(d[keys.GRAPH_MASK], out[keys.TOTAL_ENERGY], 0.0)
            )

        e, g = jax.value_and_grad(energy_of)(data0[keys.POSITIONS])
        forces = -g
        nm = data0[keys.NODE_MASK]
        sq = jnp.where(
            nm[:, None],
            (forces[: nm.shape[0]] - jnp.asarray(
                np.pad(f_label, ((0, nm.shape[0] - n), (0, 0)))
            )) ** 2,
            0.0,
        )
        return wE * (e - e_label) ** 2 + wF * jnp.sum(sq) / (3.0 * n)

    def ref_loss(p):
        return sum(
            one_ref_loss(p, z, pos, ei, el, fl)
            for (z, pos, ei), el, fl in zip(systems, e_labels, f_labels)
        ) / 2.0

    optimizer = optax.sgd(1e-4)
    loss_ref, grads_ref = jax.value_and_grad(ref_loss)(params)
    upd_ref, _ = optimizer.update(grads_ref, optimizer.init(params), params)
    params_ref = optax.apply_updates(params, upd_ref)

    # --- dp x halo over a (2, 4) mesh ---
    n_shards = 4
    e_cap = max(
        int(np.ceil(len(ei[0]) / n_shards) * 2) for _, _, ei in systems
    )
    parts = [
        halo_partition(z, pos, ei, n_shards, halo=16, edge_cap=e_cap)
        for z, pos, ei in systems
    ]
    stacked, geom = stack_halo_systems(
        [p[0] for p in parts], [p[1] for p in parts]
    )
    nl = geom["n_local"]
    f_stacked = np.zeros((2, n_shards, nl, 3), dtype=np.float32)
    for d, fl in enumerate(f_labels):
        f_pad = np.zeros((n_shards * nl, 3), dtype=np.float32)
        f_pad[:n] = fl
        f_stacked[d] = f_pad.reshape(n_shards, nl, 3)

    mesh = make_mesh(8, axis_names=("dp", GP_AXIS), shape=(2, 4))
    step = make_halo_dp_train_step(
        lambda p, d: module.apply({"params": p}, d), mesh, geom,
        optimizer, energy_weight=wE, forces_weight=wF,
    )
    state = (params, optimizer.init(params))
    (params_new, _), loss = step(
        state, stacked, np.asarray(e_labels, dtype=np.float32),
        jnp.asarray(f_stacked),
    )

    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_new),
        jax.tree_util.tree_leaves(params_ref),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7
        )
