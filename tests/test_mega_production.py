"""Production wiring of the mega message kernels (round 2):

1. DataLoader(kernel_layout=...) emits ONE static batch shape across a
   whole epoch (fixed slot capacity) — densities differ per batch, the
   compiled program must not.
2. Slot-capacity padding is gradient-exact: the backward kernels never
   return uninitialized memory for uncovered tail slots (regression for
   the NaN-freq bug found while wiring run_train).
3. `run_train` with ``model_kwargs.use_pallas_scatter="mega"`` trains to
   the SAME validation metrics as the XLA path (end-to-end driver
   equivalence on the reference `xeq train` contract,
   /root/reference/xequinet/run/train.py:74-190).
"""

import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from xequinet_tpu import keys
from xequinet_tpu.data.batching import collate, kernel_slot_cap
from xequinet_tpu.data.datapoint import Datapoint
from xequinet_tpu.data.dataset import DataLoader, InMemoryDataset
from xequinet_tpu.data.store import create_dataset
from xequinet_tpu.models.model import (
    init_params,
    make_apply_forward,
    resolve_model,
)
from xequinet_tpu.ops.radius_graph import radius_graph_np
from xequinet_tpu.training.loss import WeightedLoss

LAYOUT = {"block_nodes": 8, "chunk": 8, "pad_nodes": 16, "max_chunks": 16}
KW = dict(node_dim=16, node_irreps="16x0e+8x1o", embed_basis="one-hot",
          num_basis=8, action_blocks=1, output_modes=["energy"])


def _mols(rng, n_mols):
    dps = []
    for _ in range(n_mols):
        n = int(rng.integers(4, 9))
        pos = rng.normal(size=(n, 3)) * 1.5
        ei, _ = radius_graph_np(pos, 5.0)
        z = rng.integers(1, 5, size=n).astype(np.int32)
        dps.append(
            Datapoint(z, pos, edge_index=ei,
                      energy=float(np.sum(pos**2) * 0.01),
                      forces=(-0.02 * pos))
        )
    return dps


def _crystals(rng, n_cryst, cutoff=3.0):
    """Small periodic cells (n_atoms <= pad_nodes, so each graph's PBC
    edges stay inside its contiguous index range and the kernel window
    constraint holds without any spatial sort)."""
    from xequinet_tpu.ops.radius_graph import radius_graph_pbc_np

    dps = []
    for _ in range(n_cryst):
        n = int(rng.integers(4, 9))
        cell = np.diag([4.0, 4.5, 5.0]) + rng.normal(size=(3, 3)) * 0.2
        pos = rng.uniform(0, 1, size=(n, 3)) @ cell
        z = rng.integers(1, 5, size=n).astype(np.int32)
        ei, offs = radius_graph_pbc_np(pos, cell, np.ones(3, bool), cutoff)
        dps.append(
            Datapoint(z, pos, cell=cell, pbc=np.ones(3, bool),
                      edge_index=ei, cell_offsets=offs,
                      energy=float(np.sum(pos**2) * 0.01),
                      forces=(-0.02 * pos),
                      virial=rng.normal(size=(3, 3)))
        )
    return dps


def test_mega_pbc_virial_matches_xla(rng):
    """PBC crystals through the mega kernels: energy, forces AND the
    strain-trick virial must match the XLA path, including the
    second-order gradients of a force+stress loss (the production
    crystal-training configuration; reference nn/basic.py:93-107)."""
    dps = _crystals(rng, 6)
    b = collate(dps, kernel_layout=LAYOUT)
    mk = lambda mode: resolve_model(
        "xpainn", **KW,
        **({"use_pallas_scatter": mode, "pallas_layout": (8, 8, 16, 16)}
           if mode else {}),
    )
    m_x, e_x, _ = mk(None)
    m_m, e_m, _ = mk("mega")
    params = init_params(m_x, b)
    fwd_x = make_apply_forward(m_x, e_x)
    fwd_m = make_apply_forward(m_m, e_m)
    lossfn = WeightedLoss(
        "l2", **{keys.TOTAL_ENERGY: 1.0, keys.FORCES: 10.0, keys.VIRIAL: 1.0}
    )
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    with pltpu.force_tpu_interpret_mode():
        out_m = jax.jit(lambda p, d: fwd_m(p, d, True, True))(params, batch)
        g_m = jax.jit(
            jax.grad(lambda p, d: lossfn(fwd_m(p, d, True, True), d)[0])
        )(params, batch)
    out_x = jax.jit(lambda p, d: fwd_x(p, d, True, True))(params, batch)
    g_x = jax.jit(
        jax.grad(lambda p, d: lossfn(fwd_x(p, d, True, True), d)[0])
    )(params, batch)

    for key in (keys.TOTAL_ENERGY, keys.FORCES, keys.VIRIAL):
        np.testing.assert_allclose(
            np.asarray(out_m[key]), np.asarray(out_x[key]),
            rtol=1e-4, atol=1e-5, err_msg=key,
        )
    for a, b2 in zip(jax.tree_util.tree_leaves(g_m),
                     jax.tree_util.tree_leaves(g_x)):
        a, b2 = np.asarray(a), np.asarray(b2)
        assert np.isfinite(a).all()
        np.testing.assert_allclose(a, b2, rtol=5e-4, atol=1e-5)


def test_loader_fixed_slot_shapes(rng):
    ds = InMemoryDataset(_mols(rng, 24))
    loader = DataLoader(ds, batch_size=6, shuffle=True, kernel_layout=LAYOUT)
    assert loader.kernel_layout["slot_cap"] == kernel_slot_cap(
        loader.caps["n_nodes"], loader.caps["n_edges"], LAYOUT
    )
    shapes = set()
    n_batches = 0
    for b in loader:
        shapes.add(tuple((k, v.shape) for k, v in sorted(b.items())))
        n_batches += 1
    assert n_batches >= 3
    assert len(shapes) == 1, "slot_cap must make every batch one program"


def test_slot_cap_gradients_are_exact(rng):
    """Capacity-padded tail slots must contribute exactly zero gradient
    (regression: the backward kernels previously returned uninitialized
    memory for slots past the covered chunk ranges)."""
    dps = _mols(rng, 6)
    lossfn = WeightedLoss("l2", **{keys.TOTAL_ENERGY: 1.0, keys.FORCES: 10.0})
    module, extra, _ = resolve_model(
        "xpainn", **KW, use_pallas_scatter="mega",
        pallas_layout=(8, 8, 16, 16),
    )
    fwd = make_apply_forward(module, extra)

    b_plain = collate(dps, kernel_layout=LAYOUT)
    lay2 = dict(LAYOUT)
    lay2["slot_cap"] = b_plain[keys.EDGE_MASK].shape[0] + 5 * LAYOUT["chunk"]
    b_cap = collate(dps, kernel_layout=lay2)
    assert b_cap[keys.EDGE_MASK].shape[0] > b_plain[keys.EDGE_MASK].shape[0]

    with pltpu.force_tpu_interpret_mode():
        params = init_params(module, b_plain)

        def loss_of(p, batch):
            out = fwd(p, batch, True, False)
            return lossfn(out, batch)[0]

        # jit (one traced program) rather than eager value_and_grad: eager
        # per-primitive dispatch + the interpreter's io_callbacks share the
        # CPU client's thread pool and can deadlock on small hosts when the
        # suite has other pools alive (observed: 43 min idle in futex).
        g_of = jax.jit(jax.value_and_grad(loss_of))
        l1, g1 = g_of(params, {k: jnp.asarray(v) for k, v in b_plain.items()})
        l2, g2 = g_of(params, {k: jnp.asarray(v) for k, v in b_cap.items()})

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    for a, b in zip(flat1, flat2):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all() and np.isfinite(b).all()
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_run_train_mega_matches_xla(tmp_path, rng):
    """`xeq train` with the mega kernels == the XLA path, through the
    production driver (datasets on disk, transforms, loader, trainer)."""
    from xequinet_tpu.run.train import run_train
    from xequinet_tpu.utils.config import XequiConfig

    dps = _mols(rng, 24)
    db = os.path.join(str(tmp_path), "db")
    create_dataset(
        db, dps,
        units={keys.TOTAL_ENERGY: "eV", keys.POSITIONS: "Angstrom"},
        split={"train": list(range(16)), "valid": list(range(16, 24))},
    )

    def train(tag, mega):
        cfg = XequiConfig()
        cfg.data.db_path = db
        cfg.data.cutoff = 5.0
        cfg.data.targets = [keys.TOTAL_ENERGY, keys.FORCES]
        cfg.data.batch_size = 6
        cfg.data.valid_batch_size = 6
        cfg.model.model_name = "xpainn"
        cfg.model.model_kwargs = dict(KW)
        if mega:
            cfg.model.model_kwargs.update(
                use_pallas_scatter="mega", pallas_layout=(8, 8, 16, 16)
            )
        cfg.trainer.max_epochs = 2
        cfg.trainer.warmup_epochs = 0
        cfg.trainer.lossfn = "l2"
        cfg.trainer.losses_weight = {keys.TOTAL_ENERGY: 1.0, keys.FORCES: 10.0}
        cfg.trainer.save_dir = os.path.join(str(tmp_path), tag)
        os.makedirs(cfg.trainer.save_dir, exist_ok=True)
        cfg.trainer.dp_devices = 1
        with pltpu.force_tpu_interpret_mode():
            tr = run_train(cfg)
            return tr.validate()

    m_mega = train("mega", True)
    m_xla = train("xla", False)
    for prop in m_xla:
        assert np.isfinite(m_mega[prop]["mae"])
        np.testing.assert_allclose(
            m_mega[prop]["mae"], m_xla[prop]["mae"], rtol=2e-3, atol=1e-5
        )


def test_calculator_mega_matches_xla(tmp_path, rng):
    """Calculator(pallas="mega") == the default Calculator on a large
    non-PBC chain (the MD production loop's kernel path), including the
    spatial sort + unsort of per-atom outputs."""
    from xequinet_tpu.models.model import resolve_model as _rm
    from xequinet_tpu.interface.calculator import Calculator
    from xequinet_tpu.training.trainer import save_checkpoint
    from xequinet_tpu.utils.config import ModelConfig, config_to_dict

    kw = dict(node_dim=16, node_irreps="16x0e+8x1o", embed_basis="one-hot",
              num_basis=8, cutoff=5.0, action_blocks=1,
              output_modes=["energy"])
    module, extra, _ = _rm("xpainn", **kw)
    # quasi-1D chain, deliberately NOT sorted along its axis: the mega
    # path must sort and unsort internally
    n = 700
    x = np.cumsum(rng.uniform(0.9, 1.5, size=n))
    pos = np.column_stack([x, rng.normal(size=(n, 2)) * 1.0])
    shuffle = rng.permutation(n)
    pos = pos[shuffle]
    z = rng.integers(1, 5, size=n).astype(np.int32)
    ei, _ = radius_graph_np(pos, 5.0)
    params = init_params(module, collate([Datapoint(z, pos, edge_index=ei)]))
    ckpt = str(tmp_path / "mega.ckpt")
    save_checkpoint(ckpt, params,
                    config_to_dict(ModelConfig(model_name="xpainn",
                                               model_kwargs=kw)))

    caps = dict(max_atoms=1024, max_edges=8192)
    calc_x = Calculator(ckpt, **caps)
    calc_m = Calculator(ckpt, pallas="mega", **caps)
    with pltpu.force_tpu_interpret_mode():
        rx = calc_x.calculate(z, pos)
        rm = calc_m.calculate(z, pos)
        # the kernel path must actually have been taken
        assert any(k[0] == "mega" for k in calc_m._jitted)
        # second geometry (same shapes): exercises the cached program
        pos2 = pos + rng.normal(size=pos.shape) * 0.01
        rx2 = calc_x.calculate(z, pos2)
        rm2 = calc_m.calculate(z, pos2)
        assert len([k for k in calc_m._jitted if k[0] == "mega"]) == 1

    for a, b in ((rx, rm), (rx2, rm2)):
        np.testing.assert_allclose(
            a[keys.TOTAL_ENERGY], b[keys.TOTAL_ENERGY], rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            a[keys.FORCES], b[keys.FORCES], rtol=1e-3, atol=2e-4
        )


def test_run_train_mega_on_dp_mesh(tmp_path, rng):
    """The production multi-chip config: dp mesh x mega kernels. The
    ReplicaBatcher stacks fixed-slot-capacity micro-batches and the
    shard_map train step runs the kernels per device."""
    import jax as _jax

    if _jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")

    from xequinet_tpu.run.train import run_train
    from xequinet_tpu.utils.config import XequiConfig

    dps = _mols(rng, 32)
    db = os.path.join(str(tmp_path), "db")
    create_dataset(
        db, dps,
        units={keys.TOTAL_ENERGY: "eV", keys.POSITIONS: "Angstrom"},
        split={"train": list(range(24)), "valid": list(range(24, 32))},
    )
    cfg = XequiConfig()
    cfg.data.db_path = db
    cfg.data.cutoff = 5.0
    cfg.data.targets = [keys.TOTAL_ENERGY, keys.FORCES]
    cfg.data.batch_size = 8
    cfg.data.valid_batch_size = 8
    cfg.model.model_name = "xpainn"
    cfg.model.model_kwargs = dict(
        KW, use_pallas_scatter="mega", pallas_layout=(8, 8, 16, 16)
    )
    cfg.trainer.max_epochs = 1
    cfg.trainer.warmup_epochs = 0
    cfg.trainer.lossfn = "l2"
    cfg.trainer.losses_weight = {keys.TOTAL_ENERGY: 1.0, keys.FORCES: 10.0}
    cfg.trainer.save_dir = str(tmp_path / "dp")
    os.makedirs(cfg.trainer.save_dir, exist_ok=True)
    cfg.trainer.dp_devices = 2
    with pltpu.force_tpu_interpret_mode():
        tr = run_train(cfg)
        m = tr.validate()
    assert tr.mesh is not None and tr.mesh.size == 2
    assert all(np.isfinite(v["mae"]) for v in m.values())


def test_loader_drops_kernel_window_violators(rng):
    """A molecule wider than pad_nodes cannot satisfy the block-window
    contract — the loader must DROP it (drop_oversized semantics), not
    crash mid-epoch in prepare_v2."""
    dps = _mols(rng, 12)
    # one 40-atom molecule > pad_nodes=16
    pos = rng.normal(size=(40, 3)) * 3.0
    ei, _ = radius_graph_np(pos, 5.0)
    dps.append(Datapoint(rng.integers(1, 5, size=40).astype(np.int32),
                         pos, edge_index=ei,
                         energy=0.0, forces=np.zeros((40, 3))))
    caps = {"n_nodes": 64, "n_edges": 2048, "n_graphs": 7}
    loader = DataLoader(InMemoryDataset(dps), batch_size=6,
                        capacities=caps, kernel_layout=LAYOUT)
    n_structs = sum(int(b[keys.GRAPH_MASK].sum()) for b in loader)
    assert loader.n_dropped == 1
    assert n_structs == 12


def test_loader_prefetch_is_transparent(rng):
    """prefetch=2 yields exactly the batches the synchronous loader
    yields (same shuffle order), and propagates producer errors."""
    ds = InMemoryDataset(_mols(rng, 24))
    a = DataLoader(ds, batch_size=6, shuffle=True, seed=3)
    b = DataLoader(ds, batch_size=6, shuffle=True, seed=3, prefetch=2)
    a.set_epoch(1)
    b.set_epoch(1)
    batches_a = list(a)
    batches_b = list(b)
    assert len(batches_a) == len(batches_b)
    for ba, bb in zip(batches_a, batches_b):
        assert set(ba) == set(bb)
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])

    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(DataLoader(Broken(), batch_size=2, prefetch=2,
                        capacities={"n_nodes": 8, "n_edges": 8,
                                    "n_graphs": 3}))


def test_empty_batch_keeps_kernel_layout(rng):
    """dp padding batches (ReplicaBatcher's final partial group) must keep
    the slot-layout metadata: a zeroed ``k_nchunks`` violates the kernel's
    every-block-covers->=1-chunk invariant (index maps would compute block
    offset -1 -> OOB prefetch).  With the template layout preserved, the
    empty batch must still contribute exactly zero loss and gradient."""
    from xequinet_tpu.parallel.data_parallel import empty_batch_like

    b = collate(_mols(rng, 6), kernel_layout=LAYOUT)
    empty = empty_batch_like(b)
    # layout metadata preserved, everything else zeroed
    for k in (keys.K_SRC2, keys.K_DST2, keys.K_CHUNK_BASE, keys.K_NCHUNKS,
              keys.K_WSTARTS):
        np.testing.assert_array_equal(empty[k], b[k])
    assert (empty[keys.K_NCHUNKS] >= 1).all()
    assert not empty[keys.NODE_MASK].any()
    assert not empty[keys.GRAPH_MASK].any()

    module, extra, _ = resolve_model(
        "xpainn", **KW, use_pallas_scatter="mega",
        pallas_layout=(8, 8, 16, 16),
    )
    m_xla, _, _ = resolve_model("xpainn", **KW)
    params = init_params(m_xla, b)  # same tree; init outside interpret mode
    fwd = make_apply_forward(module, extra)
    lossfn = WeightedLoss("l2", **{keys.TOTAL_ENERGY: 1.0, keys.FORCES: 10.0})
    eb = {k: jnp.asarray(v) for k, v in empty.items()}
    with pltpu.force_tpu_interpret_mode():
        loss, grads = jax.jit(
            jax.value_and_grad(lambda p, d: lossfn(fwd(p, d, True, False), d)[0])
        )(params, eb)
    assert np.isfinite(float(loss)) and float(loss) == 0.0
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()
        np.testing.assert_array_equal(np.asarray(g), 0.0)
