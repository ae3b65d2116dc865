"""XMatNet (models/xmatnet.py): end-to-end QC-matrix model family.

Beyond the reference: /root/reference/xequinet/nn/matlayer.py ships the
QHNet blocks but never registers a model.  Here the full family exists —
equivariance of the predicted operator blocks, host-side assembly via
MatToolkit, and trainability (teacher-student regression) are tested.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xequinet_tpu import keys
from xequinet_tpu.data.batching import collate
from xequinet_tpu.data.datapoint import Datapoint
from xequinet_tpu.models.model import (
    init_params,
    make_apply_forward,
    resolve_model,
)
from xequinet_tpu.ops.irreps import Irreps
from xequinet_tpu.ops.radius_graph import radius_graph_np
from xequinet_tpu.utils.mat_toolkit import MatToolkit

from .helpers import irreps_D, random_rotation, rotate_flat

BASIS = {"H": [0], "O": [0, 0, 1]}  # sto-3g-like shells
KW = dict(
    node_dim=16, node_irreps="8x0e+4x1o+2x2e", hidden_irreps="8x0e+8x1o+8x2e",
    embed_basis="one-hot", num_basis=8, action_blocks=1, n_mat_layers=1,
    target_basis=BASIS, elements=["H", "O"], cutoff=5.0,
)


def _water_like(rng, n_mol=1):
    dps = []
    for _ in range(n_mol):
        pos = np.array([[0.0, 0.76, -0.48], [0.0, 0.0, 0.1],
                        [0.0, -0.76, -0.48]]) + rng.normal(size=(3, 3)) * 0.05
        z = np.array([1, 8, 1], dtype=np.int32)
        ei, _ = radius_graph_np(pos, 5.0)
        dps.append(Datapoint(z, pos, edge_index=ei))
    return dps


def _predict_blocks(module, params, dp):
    from xequinet_tpu.models.properties import compute_edge_data

    batch = collate([dp])
    data = compute_edge_data({k: jnp.asarray(v) for k, v in batch.items()})
    out = module.apply({"params": params}, data)
    n = dp.num_atoms
    ne = dp.num_edges
    return (
        np.asarray(out[keys.NODE_MAT_BLOCKS])[:n],
        np.asarray(out[keys.EDGE_MAT_BLOCKS])[:ne],
        batch,
    )


def test_xmatnet_blocks_are_covariant(rng):
    """Predicted node/edge blocks transform as D M D^T under rotation
    (the operator covariance of the assembled matrix)."""
    module, extra, _ = resolve_model("xmatnet", **KW)
    assert set(extra) == {keys.NODE_MAT_BLOCKS, keys.EDGE_MAT_BLOCKS}
    dp = _water_like(rng)[0]
    params = init_params(module, collate([dp]))

    nb, eb, _ = _predict_blocks(module, params, dp)
    R = random_rotation(rng)
    dp_rot = Datapoint(dp.atomic_numbers, dp.pos @ R.T,
                       edge_index=dp.edge_index)
    nb_r, eb_r, _ = _predict_blocks(module, params, dp_rot)

    tk = MatToolkit(BASIS, ["H", "O"])
    D = irreps_D(tk.get_basis_irreps(), R)
    np.testing.assert_allclose(
        nb_r, np.einsum("ab,nbc,dc->nad", D, nb, D), rtol=5e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        eb_r, np.einsum("ab,nbc,dc->nad", D, eb, D), rtol=5e-3, atol=5e-4
    )


def test_xmatnet_assembles_full_matrix(rng):
    """Blocks assemble into a well-formed full AO matrix whose diagonal
    blocks are symmetric; round-trips through the toolkit layout."""
    module, _, _ = resolve_model("xmatnet", **KW)
    dp = _water_like(rng)[0]
    params = init_params(module, collate([dp]))
    nb, eb, _ = _predict_blocks(module, params, dp)

    tk = MatToolkit(BASIS, ["H", "O"])
    M = tk.assemble_blocks(dp.atomic_numbers, nb, eb, dp.edge_index)
    n_orb = 1 + 5 + 1
    assert M.shape == (n_orb, n_orb)
    assert np.isfinite(M).all()
    # diagonal atomic blocks symmetric by construction (MatOut
    # symmetrizes): the O-atom 5x5 block must equal its transpose
    np.testing.assert_allclose(M[1:6, 1:6], M[1:6, 1:6].T, atol=1e-6)
    nb2, eb2 = tk.get_padded_blocks(dp.atomic_numbers, M, dp.edge_index)
    node_mask, edge_mask = tk.get_mask(dp.atomic_numbers, dp.edge_index)
    np.testing.assert_allclose(
        nb2[node_mask.astype(bool)], nb[node_mask.astype(bool)], atol=1e-6
    )
    np.testing.assert_allclose(
        eb2[edge_mask.astype(bool)], eb[edge_mask.astype(bool)], atol=1e-6
    )


def test_xmatnet_learns_matrix_targets(rng):
    """Teacher-student: a student xmatnet regresses the matrix blocks of
    a frozen random teacher over perturbed geometries — the end-to-end
    training path (WeightedLoss over NODE/EDGE_MAT_BLOCKS with
    node/edge masks, jitted train step)."""
    from xequinet_tpu.training.loss import ErrorMetric, WeightedLoss
    from xequinet_tpu.training.lr_schedule import (
        resolve_lr_schedule,
        resolve_optimizer,
    )
    from xequinet_tpu.training.trainer import make_train_step

    module, extra, _ = resolve_model("xmatnet", **KW)
    dps = _water_like(rng, n_mol=16)
    probe = collate(dps[:4], 16, 32, 5)
    teacher = init_params(module, probe, seed=7)
    fwd = make_apply_forward(module, extra)

    batches = []
    for i in range(0, 16, 4):
        b = collate(dps[i : i + 4], 16, 32, 5)
        data = {k: jnp.asarray(v) for k, v in b.items()}
        out = fwd(teacher, data, False, False)
        b[keys.NODE_MAT_BLOCKS] = np.asarray(out[keys.NODE_MAT_BLOCKS])
        b[keys.EDGE_MAT_BLOCKS] = np.asarray(out[keys.EDGE_MAT_BLOCKS])
        batches.append(b)

    lossfn = WeightedLoss(
        "matloss",
        **{keys.NODE_MAT_BLOCKS: 1.0, keys.EDGE_MAT_BLOCKS: 1.0},
    )
    metric = ErrorMetric(keys.NODE_MAT_BLOCKS, keys.EDGE_MAT_BLOCKS)
    schedule = resolve_lr_schedule("cosine_annealing", 5e-3, 400,
                                   warmup_steps=0)
    optimizer = resolve_optimizer("adam", schedule)
    step = make_train_step(fwd, lossfn, optimizer, False, False, 10.0,
                           0.0, metric)

    params = init_params(module, probe, seed=0)
    state = (params, optimizer.init(params),
             jax.tree_util.tree_map(jnp.copy, params))
    first = None
    for epoch in range(25):
        for b in batches:
            state, loss, _ = step(
                state, {k: jnp.asarray(v) for k, v in b.items()},
                jnp.asarray(1.0),
            )
            if first is None:
                first = float(loss)
    last = float(loss)
    assert np.isfinite(last)
    assert last < first / 3.0, (first, last)


def test_matrix_labels_ride_collate_and_store(tmp_path, rng):
    """Datapoint.extras matrix blocks survive the XDB store round-trip
    and collate into padded node/edge-level batch keys (with the edge
    center-sort applied), enabling dataset-driven matrix training."""
    from xequinet_tpu.data.dataset import DataLoader
    from xequinet_tpu.data.store import XDBDataset, create_dataset

    tk = MatToolkit(BASIS, ["H", "O"])
    dps = []
    for dp in _water_like(rng, n_mol=6):
        n_orb = 7
        M = rng.normal(size=(n_orb, n_orb))
        M = 0.5 * (M + M.T)
        nb, eb = tk.get_padded_blocks(dp.atomic_numbers, M, dp.edge_index)
        dp.extras[keys.NODE_MAT_BLOCKS] = nb.astype(np.float32)
        dp.extras[keys.EDGE_MAT_BLOCKS] = eb.astype(np.float32)
        dps.append(dp)

    db = str(tmp_path / "matdb")
    create_dataset(db, dps, units={},
                   split={"train": list(range(6)), "valid": []})
    ds = XDBDataset(db, split="train")
    loader = DataLoader(ds, batch_size=3, shuffle=False)
    batches = list(loader)
    assert all(keys.NODE_MAT_BLOCKS in b for b in batches)
    b0 = batches[0]
    dim = tk.get_basis_irreps().dim
    assert b0[keys.NODE_MAT_BLOCKS].shape[1:] == (dim, dim)
    assert b0[keys.EDGE_MAT_BLOCKS].shape[1:] == (dim, dim)
    # first structure's diagonal blocks land unchanged at rows 0..2
    np.testing.assert_allclose(
        b0[keys.NODE_MAT_BLOCKS][:3], dps[0].extras[keys.NODE_MAT_BLOCKS],
        atol=1e-6,
    )
    # padding rows are zero
    nm = b0[keys.NODE_MASK]
    assert (b0[keys.NODE_MAT_BLOCKS][~nm] == 0).all()


def test_run_train_xmatnet_end_to_end(tmp_path, rng):
    """`xeq train` on an XDB matrix dataset: the production driver trains
    xmatnet on stored NODE/EDGE_MAT_BLOCKS labels (NeighborTransform must
    NOT rebuild the stored edge set the labels are bound to)."""
    from xequinet_tpu.data.store import create_dataset
    from xequinet_tpu.run.train import run_train
    from xequinet_tpu.utils.config import XequiConfig

    tk = MatToolkit(BASIS, ["H", "O"])
    module, extra, _ = resolve_model("xmatnet", **KW)
    teacher = init_params(module, collate(_water_like(rng)), seed=7)
    fwd = make_apply_forward(module, extra)

    dps = []
    for dp in _water_like(rng, n_mol=20):
        b = collate([dp])
        out = fwd(teacher, {k: jnp.asarray(v) for k, v in b.items()},
                  False, False)
        n, ne = dp.num_atoms, dp.num_edges
        dp.extras[keys.NODE_MAT_BLOCKS] = np.asarray(
            out[keys.NODE_MAT_BLOCKS]
        )[:n].astype(np.float32)
        dp.extras[keys.EDGE_MAT_BLOCKS] = np.asarray(
            out[keys.EDGE_MAT_BLOCKS]
        )[:ne].astype(np.float32)
        dps.append(dp)

    db = str(tmp_path / "matdb")
    create_dataset(db, dps, units={},
                   split={"train": list(range(16)),
                          "valid": list(range(16, 20))})
    cfg = XequiConfig()
    cfg.data.db_path = db
    cfg.data.cutoff = 5.0
    cfg.data.targets = [keys.NODE_MAT_BLOCKS, keys.EDGE_MAT_BLOCKS]
    cfg.data.batch_size = 4
    cfg.data.valid_batch_size = 4
    cfg.data.node_shift = False
    cfg.data.node_scale = False
    cfg.model.model_name = "xmatnet"
    cfg.model.model_kwargs = dict(KW)
    cfg.trainer.max_epochs = 8
    cfg.trainer.warmup_epochs = 0
    cfg.trainer.max_lr = 5e-3
    cfg.trainer.lossfn = "matloss"
    cfg.trainer.losses_weight = {keys.NODE_MAT_BLOCKS: 1.0,
                                 keys.EDGE_MAT_BLOCKS: 1.0}
    cfg.trainer.save_dir = str(tmp_path / "run")
    import os as _os

    _os.makedirs(cfg.trainer.save_dir, exist_ok=True)
    cfg.trainer.dp_devices = 1
    tr = run_train(cfg)
    first = tr.history[0] if hasattr(tr, "history") else None
    m = tr.validate()
    mae = {k: v["mae"] for k, v in m.items()}
    assert all(np.isfinite(v) for v in mae.values())
    # teacher-student on smooth targets: must beat the zero-prediction
    # baseline clearly after 8 epochs
    base = float(np.abs(np.concatenate([
        dp.extras[keys.NODE_MAT_BLOCKS].ravel() for dp in dps[16:]
    ])).mean())
    assert mae[keys.NODE_MAT_BLOCKS] < base, (mae, base)


def test_run_test_xmatnet(tmp_path, rng):
    """`xeq test` evaluates a matrix checkpoint (block MAE/RMSE over
    node/edge masks) straight from the embedded config."""
    from xequinet_tpu.data.store import create_dataset
    from xequinet_tpu.run.test import run_test
    from xequinet_tpu.training.trainer import save_checkpoint
    from xequinet_tpu.utils.config import (
        ModelConfig, XequiConfig, config_to_dict,
    )

    module, extra, _ = resolve_model("xmatnet", **KW)
    params = init_params(module, collate(_water_like(rng)), seed=7)
    fwd = make_apply_forward(module, extra)
    dps = []
    for dp in _water_like(rng, n_mol=8):
        b = collate([dp])
        out = fwd(params, {k: jnp.asarray(v) for k, v in b.items()},
                  False, False)
        dp.extras[keys.NODE_MAT_BLOCKS] = np.asarray(
            out[keys.NODE_MAT_BLOCKS]
        )[: dp.num_atoms].astype(np.float32)
        dp.extras[keys.EDGE_MAT_BLOCKS] = np.asarray(
            out[keys.EDGE_MAT_BLOCKS]
        )[: dp.num_edges].astype(np.float32)
        dps.append(dp)
    db = str(tmp_path / "matdb")
    create_dataset(db, dps, units={},
                   split={"train": [0], "valid": [1],
                          "test": list(range(2, 8))})
    ckpt = str(tmp_path / "mat.ckpt")
    save_checkpoint(ckpt, params,
                    config_to_dict(ModelConfig(model_name="xmatnet",
                                               model_kwargs=KW)))
    cfg = XequiConfig()
    cfg.data.db_path = db
    cfg.data.cutoff = 5.0
    cfg.data.targets = [keys.NODE_MAT_BLOCKS, keys.EDGE_MAT_BLOCKS]
    cfg.data.valid_batch_size = 4
    res = run_test(cfg, ckpt)
    # the checkpoint generated the labels: errors must be ~zero
    assert res[keys.NODE_MAT_BLOCKS]["mae"] < 1e-6
    assert res[keys.EDGE_MAT_BLOCKS]["mae"] < 1e-6


def test_export_matrix_mode(tmp_path, rng):
    """`xeq export --mode matrix`: the StableHLO artifact reproduces the
    in-process block prediction and the manifest carries the basis."""
    import json

    from xequinet_tpu.interface.export import export_model, load_exported
    from xequinet_tpu.training.trainer import save_checkpoint
    from xequinet_tpu.utils.config import ModelConfig, config_to_dict

    module, extra, _ = resolve_model("xmatnet", **KW)
    dp = _water_like(rng)[0]
    params = init_params(module, collate([dp]))
    ckpt = str(tmp_path / "mat.ckpt")
    save_checkpoint(ckpt, params,
                    config_to_dict(ModelConfig(model_name="xmatnet",
                                               model_kwargs=KW)))
    out_dir = str(tmp_path / "export")
    export_model(ckpt, out_dir, max_atoms=8, max_edges=16,
                 output_mode="matrix", compute_virial=False)
    manifest = json.loads((tmp_path / "export" / "manifest.json").read_text())
    assert manifest["output_mode"] == "matrix"
    assert manifest["target_basis"] == BASIS

    exported, _mani = load_exported(out_dir)
    fn = exported.call
    n, ne = 8, 16
    pos = np.zeros((n, 3), np.float32)
    pos[:3] = dp.pos
    zz = np.zeros(n, np.int32)
    zz[:3] = dp.atomic_numbers
    ei = np.full((2, ne), n - 1, np.int32)
    ei[:, : dp.num_edges] = dp.edge_index
    em = np.arange(ne) < dp.num_edges
    nb, eb = fn(pos, zz, ei, em, np.array([0], np.int32))

    nb_ref, eb_ref, _ = _predict_blocks(module, params, dp)
    np.testing.assert_allclose(np.asarray(nb)[:3], nb_ref, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(eb)[: dp.num_edges], eb_ref,
                               rtol=1e-5, atol=1e-6)


def test_matrix_labels_survive_kernel_layout(rng):
    """Edge-level matrix labels follow the mega-kernel slot re-layout
    (review regression: they previously stayed in the old edge order
    while EDGE_INDEX moved to slot order)."""
    from xequinet_tpu.data.batching import kernel_slot_cap

    tk = MatToolkit(BASIS, ["H", "O"])
    dps = []
    for dp in _water_like(rng, n_mol=4):
        n_orb = 7
        M = rng.normal(size=(n_orb, n_orb))
        nb, eb = tk.get_padded_blocks(dp.atomic_numbers, M, dp.edge_index)
        dp.extras[keys.NODE_MAT_BLOCKS] = nb.astype(np.float32)
        dp.extras[keys.EDGE_MAT_BLOCKS] = eb.astype(np.float32)
        dps.append(dp)

    layout = {"block_nodes": 8, "chunk": 8, "pad_nodes": 16,
              "max_chunks": 16}
    layout["slot_cap"] = kernel_slot_cap(16, 64, layout)
    plain = collate(dps, 16, 64, 5)
    slotted = collate(dps, 16, 64, 5, kernel_layout=layout)

    # labels must sit at the SAME slots as their edges in both layouts
    def label_of_edge(batch):
        em = batch[keys.EDGE_MASK]
        ei = batch[keys.EDGE_INDEX][:, em]
        lbl = batch[keys.EDGE_MAT_BLOCKS][em]
        order = np.lexsort((ei[1], ei[0]))
        return ei[:, order], lbl[order]

    ei_a, lb_a = label_of_edge(plain)
    ei_b, lb_b = label_of_edge(slotted)
    np.testing.assert_array_equal(ei_a, ei_b)
    np.testing.assert_allclose(lb_a, lb_b, atol=1e-7)
    # node labels padded to the block-aligned node capacity
    assert (
        slotted[keys.NODE_MAT_BLOCKS].shape[0]
        == slotted[keys.NODE_MASK].shape[0]
    )


def test_prefetch_abandoned_iterator_stops_producer(rng):
    """Abandoning a prefetched iterator (take one batch, drop it) must
    stop the producer thread instead of leaking it blocked on the queue."""
    import threading

    from xequinet_tpu.data.dataset import DataLoader, InMemoryDataset

    dps = _water_like(rng, n_mol=40)
    for dp in dps:
        dp.energy = 0.0
        dp.forces = np.zeros((dp.num_atoms, 3))
    loader = DataLoader(InMemoryDataset(dps), batch_size=4, prefetch=2)
    n0 = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # GeneratorExit -> finally -> stop + drain + join
    import time

    deadline = time.time() + 6.0
    while threading.active_count() > n0 and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n0, "producer thread leaked"
