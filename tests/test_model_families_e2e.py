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
