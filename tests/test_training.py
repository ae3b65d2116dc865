"""Training-stack tests: loss/metric math, schedules, and an end-to-end
synthetic regression that must actually learn."""

import numpy as np
import pytest

import jax.numpy as jnp

from xequinet_tpu import keys
from xequinet_tpu.data.batching import collate
from xequinet_tpu.data.datapoint import Datapoint
from xequinet_tpu.data.dataset import DataLoader, InMemoryDataset, calculate_stats
from xequinet_tpu.models.model import init_params, make_apply_forward, resolve_model
from xequinet_tpu.ops.radius_graph import radius_graph_np
from xequinet_tpu.training.loss import ErrorMetric, MetricAccumulator, WeightedLoss
from xequinet_tpu.utils.config import XequiConfig, load_config


def pair_energy_forces(pos):
    """Smooth, bounded synthetic potential: Gaussian pair repulsion."""
    diff = pos[:, None] - pos[None, :]
    r2 = (diff**2).sum(-1)
    off = 1 - np.eye(len(pos))
    g = np.exp(-0.5 * r2) * off
    e = 0.5 * np.sum(g)
    # force_i = -dE/dpos_i = sum_j g_ij * (pos_i - pos_j)
    f = (g[:, :, None] * diff).sum(axis=1)
    return e, f


def make_dataset(n_samples=40, n_atoms=6, seed=0):
    rng = np.random.default_rng(seed)
    dps = []
    for _ in range(n_samples):
        z = rng.integers(1, 5, size=n_atoms).astype(np.int32)
        pos = rng.normal(size=(n_atoms, 3)) * 1.2
        # keep atoms apart to bound the potential
        pos = pos * 1.3
        e, f = pair_energy_forces(pos)
        ei, _ = radius_graph_np(pos, 5.0)
        dps.append(
            Datapoint(atomic_numbers=z, pos=pos, edge_index=ei, energy=e, forces=f)
        )
    return InMemoryDataset(dps)


def test_weighted_loss_masking():
    """Padding rows must not change the loss."""
    rng = np.random.default_rng(0)
    dp = Datapoint(
        atomic_numbers=rng.integers(1, 5, 4),
        pos=rng.normal(size=(4, 3)),
        edge_index=radius_graph_np(rng.normal(size=(4, 3)), 5.0)[0],
        energy=1.5,
        forces=rng.normal(size=(4, 3)),
    )
    lossfn = WeightedLoss("l2", **{keys.TOTAL_ENERGY: 1.0, keys.FORCES: 1.0})
    small = {k: jnp.asarray(v) for k, v in collate([dp], 8, 32).items()}
    big = {k: jnp.asarray(v) for k, v in collate([dp], 32, 128, 5).items()}
    # fake predictions: zeros
    res_small = {
        keys.TOTAL_ENERGY: jnp.zeros_like(small[keys.TOTAL_ENERGY]),
        keys.FORCES: jnp.zeros_like(small[keys.FORCES]),
    }
    res_big = {
        keys.TOTAL_ENERGY: jnp.zeros_like(big[keys.TOTAL_ENERGY]),
        keys.FORCES: jnp.zeros_like(big[keys.FORCES]),
    }
    l1, _ = lossfn(res_small, small)
    l2, _ = lossfn(res_big, big)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_error_metric_derived_props():
    m = ErrorMetric(keys.TOTAL_ENERGY)
    assert keys.ENERGY_PER_ATOM in m.properties


def test_dataloader_packing():
    ds = make_dataset(17)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=1)
    seen = 0
    shapes = set()
    for batch in loader:
        seen += int(batch[keys.GRAPH_MASK].sum())
        shapes.add(batch[keys.POSITIONS].shape)
    assert seen == 17
    assert len(shapes) == 1, "loader must emit a single static shape"


def test_calculate_stats():
    ds = make_dataset(10)
    stats = calculate_stats(ds, [keys.TOTAL_ENERGY])
    assert np.isfinite(stats["node_shift"]) and stats["node_scale"] > 0


def test_config_roundtrip(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text(
        "model:\n  model_name: xpainn\n  model_kwargs:\n    node_dim: 32\n"
        "trainer:\n  max_epochs: 2\n  lossfn: l2\n"
        "data:\n  targets: [energy, forces]\n  batch_size: 8\n"
    )
    cfg = load_config(str(y))
    assert cfg.model.model_kwargs["node_dim"] == 32
    assert cfg.trainer.max_epochs == 2
    assert cfg.data.targets == ["energy", "forces"]
    with pytest.raises(KeyError):
        y.write_text("trainer:\n  nonexistent_key: 3\n")
        load_config(str(y))


@pytest.mark.slow
def test_synthetic_training_learns(tmp_path):
    """Full loop: the model must fit a synthetic potential
    (loss decreases by >3x over a few epochs)."""
    from xequinet_tpu.training.trainer import Trainer

    ds = make_dataset(32)
    cfg = XequiConfig()
    cfg.model.model_kwargs = dict(
        node_dim=32,
        node_irreps="32x0e+16x1o+8x2e",
        embed_basis="one-hot",
        num_basis=8,
        action_blocks=2,
        output_modes=["energy"],
    )
    cfg.data.targets = [keys.TOTAL_ENERGY, keys.FORCES]
    cfg.trainer.max_epochs = 20
    cfg.trainer.warmup_epochs = 1
    cfg.trainer.max_lr = 2e-3
    cfg.trainer.lossfn = "l2"
    cfg.trainer.losses_weight = {keys.TOTAL_ENERGY: 1.0, keys.FORCES: 10.0}
    cfg.trainer.save_dir = str(tmp_path)
    cfg.trainer.best_k = 2
    cfg.trainer.ema_decay = 0.95
    cfg.trainer.log_steps = 1000

    module, extra, _ = resolve_model("xpainn", **cfg.model.model_kwargs)
    loader = DataLoader(ds, batch_size=8, shuffle=True)
    vloader = DataLoader(ds, batch_size=8, capacities=loader.caps)
    sample = next(iter(loader))
    params = init_params(module, sample)
    apply_forward = make_apply_forward(module, extra)

    trainer = Trainer(
        config=cfg,
        apply_forward=apply_forward,
        params=params,
        train_loader=loader,
        valid_loader=vloader,
        steps_per_epoch=len(loader),
    )
    first = trainer.validate()
    first_mae = trainer.weighted_mae(first)
    trainer.start()
    final = trainer.validate()
    final_mae = trainer.weighted_mae(final)
    assert final_mae < first_mae / 3.0, (first_mae, final_mae)

    # checkpoints exist and are loadable with embedded config
    import glob

    ckpts = glob.glob(str(tmp_path / "*_last.ckpt"))
    assert ckpts
    from xequinet_tpu.training.trainer import load_checkpoint, restore_params

    blob = load_checkpoint(ckpts[0])
    assert blob["config"]["model_name"] == "xpainn"
    params2 = restore_params(params, blob["model"])
    out = apply_forward(params2, {k: jnp.asarray(v) for k, v in sample.items()}, False, False)
    assert np.isfinite(np.asarray(out[keys.TOTAL_ENERGY])).all()


def test_preemption_checkpoint(tmp_path):
    """SIGTERM during training writes a resumable last checkpoint."""
    import signal
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(f"""
        import os, signal, threading
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        import numpy as np
        import sys
        sys.path.insert(0, {str(tmp_path.parent.parent / '..')!r})
        sys.path.insert(0, "/root/repo")
        from xequinet_tpu import keys
        from xequinet_tpu.data import Datapoint, create_dataset
        from xequinet_tpu.run.train import run_train
        from xequinet_tpu.utils.config import XequiConfig

        rng = np.random.default_rng(0)
        dps = []
        for _ in range(16):
            pos = rng.normal(size=(5, 3)) * 1.5
            dps.append(Datapoint(rng.integers(1, 5, 5).astype(np.int32), pos,
                                 energy=float(rng.normal()),
                                 forces=rng.normal(size=(5, 3))))
        create_dataset({str(tmp_path / 'db')!r}, dps, units={{}})
        cfg = XequiConfig()
        cfg.model.model_kwargs = dict(node_dim=16, node_irreps="16x0e+8x1o+4x2e",
            embed_basis="one-hot", num_basis=8, action_blocks=1,
            output_modes=["energy"])
        cfg.data.db_path = {str(tmp_path / 'db')!r}
        cfg.data.targets = [keys.TOTAL_ENERGY, keys.FORCES]
        cfg.data.batch_size = 4
        cfg.trainer.max_epochs = 10000
        cfg.trainer.warmup_epochs = 1
        cfg.trainer.save_dir = {str(tmp_path)!r}
        cfg.trainer.log_steps = 100000

        # SIGTERM ourselves once the Trainer exists (the handler installs at
        # Trainer construction; signaling on a fixed timer can beat slow
        # imports under load and hit the default action instead)
        import time
        log = os.path.join({str(tmp_path)!r}, "loss.log")
        def _arm():
            deadline = time.time() + 180
            while time.time() < deadline:
                try:
                    if "parameters" in open(log).read():
                        break
                except OSError:
                    pass
                time.sleep(0.5)
            time.sleep(5.0)
            os.kill(os.getpid(), signal.SIGTERM)
        threading.Thread(target=_arm, daemon=True).start()
        run_train(cfg)
    """)
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=240,
    )
    assert proc.returncode == 128 + signal.SIGTERM, proc.stderr[-2000:]
    ckpt = tmp_path / "xequinet_last.ckpt"
    assert ckpt.exists(), proc.stderr[-2000:]
    from xequinet_tpu.training.trainer import load_checkpoint

    blob = load_checkpoint(str(ckpt))
    assert "model" in blob and "opt_state" in blob
