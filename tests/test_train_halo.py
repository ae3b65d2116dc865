"""Config-reachable halo training (VERDICT round-3 item 3): an `xeq
train`-style config with ``trainer.gp_devices`` runs spatial-
decomposition training through the production ``run_train`` dispatch on
the 8-CPU mesh — dp x gp 2-D mesh and gp-only, free and periodic
datasets — writing checkpoints the Calculator can consume."""

import os

import numpy as np
import pytest
import yaml

from xequinet_tpu import keys
from xequinet_tpu.data.datapoint import Datapoint
from xequinet_tpu.data.store import create_dataset
from xequinet_tpu.ops.radius_graph import radius_graph_np
from xequinet_tpu.run.train import run_train
from xequinet_tpu.utils.config import load_config


def _chain_system(rng, n, jitter=0.1):
    xs = np.cumsum(rng.uniform(0.9, 1.5, size=n))
    pos = np.column_stack([xs, rng.normal(size=(n, 2)) * 1.1])
    z = rng.integers(1, 9, size=n).astype(np.int32)
    return z, pos


def _make_db(path, rng, n_sys, n_atoms, periodic=False):
    dps = []
    for _ in range(n_sys):
        z, pos = _chain_system(rng, n_atoms)
        kw = {}
        if periodic:
            lx = float(pos[:, 0].max() + 1.2)
            kw["cell"] = np.diag([lx, 14.0, 14.0])
            kw["pbc"] = np.array([True, False, False])
            pos = pos.copy()
            pos[:, 0] %= lx
            pos[:, 1:] += 7.0  # center inside the aperiodic box
        dps.append(Datapoint(
            z, pos, energy=float(rng.normal()) * 3.0,
            forces=rng.normal(size=(n_atoms, 3)).astype(np.float32) * 0.1,
            **kw,
        ))
    n_train = n_sys - 2
    create_dataset(
        path, dps, units={keys.TOTAL_ENERGY: "eV"},
        split={"train": list(range(n_train)),
               "valid": [n_train, n_train + 1], "test": []},
    )


def _write_yaml(path, db_path, save_dir, dp, gp, epochs=2):
    cfg = {
        "model": {
            "model_name": "xpainn",
            "model_kwargs": {
                "node_dim": 16, "node_irreps": "16x0e+8x1o+4x2e",
                "embed_basis": "one-hot", "num_basis": 8,
                "action_blocks": 1, "cutoff": 5.0,
                "output_modes": ["energy"],
            },
        },
        "data": {
            "db_path": str(db_path),
            "targets": ["energy", "forces"],
            "cutoff": 5.0,
        },
        "trainer": {
            # the persistent compile cache may hold entries AOT-compiled
            # on a host with different CPU features (SIGILL on load) —
            # tests always compile fresh
            "compile_cache": False,
            "dp_devices": dp, "gp_devices": gp,
            "max_epochs": epochs, "warmup_epochs": 0,
            "max_lr": 1e-3, "seed": 0, "save_dir": str(save_dir),
            "run_name": "halo",
            "losses_weight": {"energy": 1.0, "forces": 10.0},
        },
    }
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)


@pytest.mark.parametrize("dp,gp,periodic", [(2, 4, False), (1, 8, True)])
def test_halo_train_config_path(tmp_path, rng, dp, gp, periodic):
    db = tmp_path / "db"
    _make_db(db, rng, n_sys=2 * dp + 2, n_atoms=40 * gp, periodic=periodic)
    ycfg = tmp_path / "train.yaml"
    _write_yaml(ycfg, db, tmp_path / "run", dp, gp)
    config = load_config(str(ycfg))
    state = run_train(config)
    params = state[0]
    import jax

    leaves = jax.tree_util.tree_leaves(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    last = tmp_path / "run" / "halo_last.ckpt"
    best = tmp_path / "run" / "halo_best.ckpt"
    assert last.exists() and best.exists()

    # the checkpoint is consumable by the production Calculator
    from xequinet_tpu.interface.calculator import Calculator

    calc = Calculator(str(last), use_ema=False)
    z, pos = _chain_system(rng, 12)
    out = calc.calculate(z, pos)
    assert np.isfinite(out[keys.TOTAL_ENERGY])
    assert np.isfinite(out[keys.FORCES]).all()


def test_halo_train_rejects_v2_kernel(tmp_path, rng):
    """Only the mega kernels are halo-aware; the v2 scatter kernel's
    equivariant aggregate bypasses the boundary refresh, so halo
    training rejects it loudly."""
    db = tmp_path / "db"
    _make_db(db, rng, n_sys=4, n_atoms=64)
    ycfg = tmp_path / "train.yaml"
    _write_yaml(ycfg, db, tmp_path / "run", 1, 8)
    config = load_config(str(ycfg))
    config.model.model_kwargs["use_pallas_scatter"] = "v2"
    with pytest.raises(ValueError, match="mega"):
        run_train(config)


def test_halo_train_rejects_mixed_dataset(tmp_path, rng):
    """VERDICT r4 item 8 (loud contract, docs/config.md): a dataset
    mixing periodic and free systems cannot halo-train — the
    exchange-ring topology is part of the compiled program — and must
    fail at startup with a clear message, not mid-epoch."""
    db = tmp_path / "db"
    dps = []
    for k in range(4):
        z, pos = _chain_system(rng, 48)
        kw = {}
        if k % 2 == 0:
            lx = float(pos[:, 0].max() + 1.2)
            kw = {"cell": np.diag([lx, 14.0, 14.0]),
                  "pbc": np.array([True, False, False])}
            pos = pos.copy()
            pos[:, 0] %= lx
            pos[:, 1:] += 7.0
        dps.append(Datapoint(
            z, pos, energy=0.0,
            forces=np.zeros((48, 3), np.float32), **kw,
        ))
    create_dataset(
        db, dps, units={keys.TOTAL_ENERGY: "eV"},
        split={"train": [0, 1], "valid": [2, 3], "test": []},
    )
    ycfg = tmp_path / "train.yaml"
    _write_yaml(ycfg, db, tmp_path / "run", 1, 4)
    config = load_config(str(ycfg))
    with pytest.raises(ValueError, match="homogeneous dataset"):
        run_train(config)


@pytest.mark.parametrize("periodic", [False, True])
def test_halo_train_mega_config_path(tmp_path, rng, periodic):
    """Config-path halo training WITH the mega Pallas kernels
    (use_pallas_scatter='mega', VERDICT round-4 item 1): the dp x gp
    mesh runs the fused edge pipeline per shard; the checkpoint embeds
    the derived pallas_layout and feeds both Calculators."""
    from jax.experimental.pallas import tpu as pltpu

    db = tmp_path / "db"
    gp = 4
    _make_db(db, rng, n_sys=4, n_atoms=40 * gp, periodic=periodic)
    ycfg = tmp_path / "train.yaml"
    _write_yaml(ycfg, db, tmp_path / "run", 1, gp)
    config = load_config(str(ycfg))
    config.model.model_kwargs["use_pallas_scatter"] = "mega"
    config.model.model_kwargs["pallas_layout"] = (24, 8, 0, 0)
    with pltpu.force_tpu_interpret_mode():
        state = run_train(config)
    params = state[0]
    import jax

    leaves = jax.tree_util.tree_leaves(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    # the saved model config carries the derived kernel layout
    assert config.model.model_kwargs["pallas_layout"][2] > 0

    from xequinet_tpu.parallel.halo import HaloCalculator

    hc = HaloCalculator(
        str(tmp_path / "run" / "halo_last.ckpt"), n_shards=gp,
        use_ema=False, pallas="mega", pallas_layout=(24, 8),
    )
    z, pos = _chain_system(rng, 40 * gp)
    with pltpu.force_tpu_interpret_mode():
        out = hc.calculate(z, pos)
    assert np.isfinite(out[keys.TOTAL_ENERGY])
    assert np.isfinite(out[keys.FORCES]).all()
