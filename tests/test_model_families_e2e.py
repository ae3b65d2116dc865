"""painn and so3krates through the PRODUCTION drivers (VERDICT round-2
item 7): run_train on the dp mesh, run_test from the checkpoint, and the
Calculator MD surface.  Registered != production-proven — these pin the
whole path (loaders, trainer, checkpoint round-trip, jit task cache) for
the non-flagship families (reference nn/model.py:261-307, 179-258)."""

import glob

import numpy as np
import pytest

from xequinet_tpu import keys
from xequinet_tpu.data.datapoint import Datapoint
from xequinet_tpu.data.store import create_dataset
from xequinet_tpu.ops.radius_graph import radius_graph_np
from xequinet_tpu.run.train import run_train
from xequinet_tpu.utils.config import XequiConfig

MODEL_KWARGS = {
    "painn": dict(
        node_dim=16, embed_basis="one-hot", num_basis=8,
        action_blocks=2, cutoff=5.0, output_modes=["energy"],
    ),
    "so3krates": dict(
        node_dim=24, node_channel=4, max_l=2, num_heads=2,
        embed_basis="one-hot", num_basis=8, action_blocks=2,
        cutoff=5.0, output_modes=["energy"],
    ),
}


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    rng = np.random.default_rng(21)
    dps = []
    for _ in range(24):
        n = int(rng.integers(4, 8))
        z = rng.integers(1, 9, size=n).astype(np.int32)
        pos = rng.normal(size=(n, 3)) * 1.4
        ei, _ = radius_graph_np(pos, 5.0)
        dps.append(Datapoint(z, pos, edge_index=ei,
                             energy=float(rng.normal()),
                             forces=rng.normal(size=(n, 3)).astype(np.float32)))
    path = tmp_path_factory.mktemp("fam") / "db"
    create_dataset(
        path, dps, units={keys.TOTAL_ENERGY: "eV"},
        split={"train": list(range(16)), "valid": list(range(16, 20)),
               "test": list(range(20, 24))},
    )
    return str(path)


@pytest.mark.parametrize("family", ["painn", "so3krates"])
def test_family_train_test_calculate(family, db, tmp_path_factory):
    tmp = tmp_path_factory.mktemp(family)
    cfg = XequiConfig()
    cfg.model.model_name = family
    cfg.model.model_kwargs = dict(MODEL_KWARGS[family])
    cfg.data.db_path = db
    cfg.data.targets = [keys.TOTAL_ENERGY, keys.FORCES]
    cfg.data.batch_size = 8
    cfg.data.valid_batch_size = 4
    # so3krates additionally proves out the dp mesh (VERDICT item 7);
    # painn runs single-device to keep both paths covered
    cfg.trainer.dp_devices = 8 if family == "so3krates" else 1
    cfg.trainer.max_epochs = 2
    cfg.trainer.warmup_epochs = 0
    cfg.trainer.seed = 0
    cfg.trainer.save_dir = str(tmp / "run")
    cfg.trainer.run_name = family
    cfg.trainer.ema_decay = 0.99
    trainer = run_train(cfg)
    import jax

    leaves = jax.tree_util.tree_leaves(jax.device_get(trainer.params))
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)

    ckpts = sorted(glob.glob(str(tmp / "run" / "*.ckpt")))
    assert ckpts, "training wrote no checkpoints"
    ckpt = [c for c in ckpts if c.endswith("_last.ckpt")] or ckpts
    ckpt = ckpt[0]

    # run_test: checkpoint rebuild + metric tables over the test split
    from xequinet_tpu.run.test import run_test

    results = run_test(cfg, ckpt)
    assert keys.TOTAL_ENERGY in results
    assert np.isfinite(results[keys.TOTAL_ENERGY]["mae"])
    assert np.isfinite(results[keys.FORCES]["mae"])

    # Calculator MD surface: energy/forces on a fresh structure, twice
    # (jit cache reuse), plus translation invariance
    from xequinet_tpu.interface.calculator import Calculator

    rng = np.random.default_rng(3)
    z = rng.integers(1, 9, size=7).astype(np.int32)
    pos = rng.normal(size=(7, 3)) * 1.3
    calc = Calculator(ckpt)
    r1 = calc.calculate(z, pos)
    assert np.isfinite(r1[keys.TOTAL_ENERGY])
    assert np.isfinite(r1[keys.FORCES]).all()
    r2 = calc.calculate(z, pos + 5.0)  # rigid translation
    np.testing.assert_allclose(
        r2[keys.TOTAL_ENERGY], r1[keys.TOTAL_ENERGY], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(r2[keys.FORCES], r1[keys.FORCES],
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# xpainn-ewald through the production drivers (VERDICT round-3 item 5)
# ---------------------------------------------------------------------------
EWALD_NONPBC_KW = dict(
    node_dim=16, node_irreps="16x0e+8x1o", embed_basis="one-hot",
    num_basis=8, action_blocks=1, cutoff=5.0, output_modes=["energy"],
    use_pbc=False, k_cutoff=0.6, delta_k=0.3, num_k_basis=6,
    projection_dim=4, ewald_blocks=1,
)
EWALD_PBC_KW = dict(
    node_dim=16, node_irreps="16x0e+8x1o", embed_basis="one-hot",
    num_basis=8, action_blocks=1, cutoff=5.0, output_modes=["energy"],
    use_pbc=True, num_k_points=[3, 3, 3], projection_dim=4,
    ewald_blocks=1,
)


def test_xpainn_ewald_nonpbc_e2e(db, tmp_path_factory):
    """run_train (with the SVDFrameTransform the non-PBC Ewald grid
    requires) -> run_test -> Calculator (reference nn/model.py:125-176,
    nn/ewald.py:98-138)."""
    tmp = tmp_path_factory.mktemp("ewald_free")
    cfg = XequiConfig()
    cfg.model.model_name = "xpainn-ewald"
    cfg.model.model_kwargs = dict(EWALD_NONPBC_KW)
    cfg.data.db_path = db
    cfg.data.targets = [keys.TOTAL_ENERGY, keys.FORCES]
    cfg.data.batch_size = 8
    cfg.data.valid_batch_size = 4
    cfg.trainer.dp_devices = 1
    cfg.trainer.max_epochs = 2
    cfg.trainer.warmup_epochs = 0
    cfg.trainer.seed = 0
    cfg.trainer.save_dir = str(tmp / "run")
    cfg.trainer.run_name = "ewald"
    trainer = run_train(cfg)
    import jax

    leaves = jax.tree_util.tree_leaves(jax.device_get(trainer.params))
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    # the SVD-frame transform must be engaged on this path
    from xequinet_tpu.data.transforms import SVDFrameTransform
    from xequinet_tpu.run.train import build_datasets

    train_set, _, _ = build_datasets(cfg)
    assert any(
        isinstance(t, SVDFrameTransform)
        for t in train_set.transform.transforms
    )

    ckpt = sorted(glob.glob(str(tmp / "run" / "*_last.ckpt")))[0]
    from xequinet_tpu.run.test import run_test

    results = run_test(cfg, ckpt)
    assert np.isfinite(results[keys.TOTAL_ENERGY]["mae"])
    assert np.isfinite(results[keys.FORCES]["mae"])

    from xequinet_tpu.interface.calculator import Calculator

    rng = np.random.default_rng(5)
    z = rng.integers(1, 9, size=7).astype(np.int32)
    pos = rng.normal(size=(7, 3)) * 1.3
    calc = Calculator(ckpt)
    r1 = calc.calculate(z, pos)
    assert np.isfinite(r1[keys.TOTAL_ENERGY])
    assert np.isfinite(r1[keys.FORCES]).all()
    # the non-PBC Ewald grid is fixed in space with position-dependent
    # sinc damping (reference ewald.py:125-133), so raw inference is
    # frame-sensitive — BY DESIGN structures are canonicalized by the
    # SVD frame first.  Two arbitrarily rotated/translated copies must
    # agree after SVDFrameTransform:
    from xequinet_tpu.data.transforms import SVDFrameTransform

    tr = SVDFrameTransform()

    def framed_energy(p):
        d = tr(Datapoint(z, p))
        return calc.calculate(z, d.pos)[keys.TOTAL_ENERGY]

    e_a = framed_energy(pos)
    theta = 0.7
    rot = np.array([
        [np.cos(theta), -np.sin(theta), 0],
        [np.sin(theta), np.cos(theta), 0],
        [0, 0, 1.0],
    ])
    e_b = framed_energy(pos @ rot.T + 3.0)
    np.testing.assert_allclose(e_b, e_a, rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def crystal_db(tmp_path_factory):
    rng = np.random.default_rng(11)
    from xequinet_tpu.ops.radius_graph import radius_graph_pbc_np

    dps = []
    for _ in range(16):
        n = int(rng.integers(4, 8))
        cell = np.diag(rng.uniform(4.0, 5.5, size=3))
        pos = rng.uniform(0, 1, size=(n, 3)) @ cell
        pbc = np.array([True, True, True])
        z = rng.integers(1, 9, size=n).astype(np.int32)
        dps.append(Datapoint(
            z, pos, cell=cell, pbc=pbc,
            energy=float(rng.normal()),
            forces=rng.normal(size=(n, 3)).astype(np.float32),
            virial=rng.normal(size=(3, 3)).astype(np.float32),
        ))
    path = tmp_path_factory.mktemp("ewaldpbc") / "db"
    create_dataset(
        path, dps, units={keys.TOTAL_ENERGY: "eV"},
        split={"train": list(range(10)), "valid": [10, 11, 12],
               "test": [13, 14, 15]},
    )
    return str(path)


def test_xpainn_ewald_pbc_stress_e2e(crystal_db, tmp_path_factory):
    """Periodic crystals with VIRIAL labels through run_train (stress in
    the loss via the strain trick) -> run_test -> Calculator with stress
    (reference nn/ewald.py:60-95,141-212)."""
    tmp = tmp_path_factory.mktemp("ewald_pbc")
    cfg = XequiConfig()
    cfg.model.model_name = "xpainn-ewald"
    cfg.model.model_kwargs = dict(EWALD_PBC_KW)
    cfg.data.db_path = crystal_db
    cfg.data.targets = [keys.TOTAL_ENERGY, keys.FORCES, keys.VIRIAL]
    cfg.data.batch_size = 5
    cfg.data.valid_batch_size = 3
    cfg.trainer.dp_devices = 1
    cfg.trainer.max_epochs = 2
    cfg.trainer.warmup_epochs = 0
    cfg.trainer.seed = 0
    cfg.trainer.save_dir = str(tmp / "run")
    cfg.trainer.run_name = "ewaldpbc"
    cfg.trainer.losses_weight = {
        keys.TOTAL_ENERGY: 1.0, keys.FORCES: 10.0, keys.VIRIAL: 0.5,
    }
    trainer = run_train(cfg)
    import jax

    leaves = jax.tree_util.tree_leaves(jax.device_get(trainer.params))
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)

    ckpt = sorted(glob.glob(str(tmp / "run" / "*_last.ckpt")))[0]
    from xequinet_tpu.run.test import run_test

    results = run_test(cfg, ckpt)
    assert np.isfinite(results[keys.TOTAL_ENERGY]["mae"])
    assert np.isfinite(results[keys.FORCES]["mae"])
    assert np.isfinite(results[keys.VIRIAL]["mae"])

    from xequinet_tpu.interface.calculator import Calculator

    rng = np.random.default_rng(9)
    n = 6
    cell = np.diag([5.0, 5.2, 4.8])
    pos = rng.uniform(0, 1, size=(n, 3)) @ cell
    z = rng.integers(1, 9, size=n).astype(np.int32)
    calc = Calculator(ckpt, compute_virial=True)
    r = calc.calculate(z, pos, cell=cell, pbc=np.array([True] * 3))
    assert np.isfinite(r[keys.TOTAL_ENERGY])
    assert np.isfinite(r[keys.FORCES]).all()
    assert np.isfinite(r[keys.VIRIAL]).all()
    # lattice-translation invariance of the periodic Ewald energy
    r2 = calc.calculate(z, pos + cell[0], cell=cell,
                        pbc=np.array([True] * 3))
    np.testing.assert_allclose(
        r2[keys.TOTAL_ENERGY], r[keys.TOTAL_ENERGY], rtol=1e-4, atol=1e-4
    )
