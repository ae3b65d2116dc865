"""The production train driver on a dp mesh must reproduce single-device
training exactly (VERDICT round-1 item 2): same data, same seed, one
epoch — run_train with dp_devices=8 and dp_devices=1 must land on the
same parameters (pmean of equal-count replica losses == global-batch
loss, so gradients and optimizer updates match up to f32 reduction
order)."""

import jax
import numpy as np
import pytest

from xequinet_tpu import keys
from xequinet_tpu.data.datapoint import Datapoint
from xequinet_tpu.data.store import create_dataset
from xequinet_tpu.ops.radius_graph import radius_graph_np
from xequinet_tpu.run.train import run_train
from xequinet_tpu.utils.config import XequiConfig

N_DEV = 8
N_MOLS = 16
N_ATOMS = 5  # uniform size -> equal loss counts per replica


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    rng = np.random.default_rng(7)
    dps = []
    for _ in range(N_MOLS + N_DEV):
        z = rng.integers(1, 9, size=N_ATOMS).astype(np.int32)
        pos = rng.normal(size=(N_ATOMS, 3)) * 1.4
        ei, _ = radius_graph_np(pos, 5.0)
        dps.append(
            Datapoint(z, pos, edge_index=ei, energy=float(rng.normal()),
                      forces=rng.normal(size=(N_ATOMS, 3)).astype(np.float32))
        )
    path = tmp_path_factory.mktemp("dpdb") / "db"
    create_dataset(
        path, dps, units={keys.TOTAL_ENERGY: "eV"},
        split={"train": list(range(N_MOLS)),
               "valid": list(range(N_MOLS, N_MOLS + N_DEV)),
               "test": []},
    )
    return str(path)


def _config(db_path: str, save_dir: str, dp_devices: int) -> XequiConfig:
    config = XequiConfig()
    config.model.model_name = "xpainn"
    config.model.model_kwargs = dict(
        node_dim=16, node_irreps="16x0e+8x1o+4x2e", embed_basis="one-hot",
        num_basis=8, action_blocks=1, cutoff=5.0, output_modes=["energy"],
    )
    config.data.db_path = db_path
    config.data.targets = [keys.TOTAL_ENERGY, keys.FORCES]
    config.data.batch_size = N_MOLS  # global; divided over replicas
    config.data.valid_batch_size = N_DEV
    config.trainer.dp_devices = dp_devices
    config.trainer.max_epochs = 1
    config.trainer.warmup_epochs = 0
    config.trainer.log_steps = 100
    config.trainer.seed = 0
    config.trainer.grad_clip = 5.0
    config.trainer.ema_decay = 0.99
    config.trainer.save_dir = save_dir
    return config


def test_run_train_dp_matches_single_device(db, tmp_path):
    assert len(jax.devices()) >= N_DEV
    t1 = run_train(_config(db, str(tmp_path / "r1"), dp_devices=1))
    t8 = run_train(_config(db, str(tmp_path / "r8"), dp_devices=N_DEV))

    p1 = jax.tree_util.tree_leaves(jax.device_get(t1.params))
    p8 = jax.tree_util.tree_leaves(jax.device_get(t8.params))
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

    # the dp trainer wrote a loadable checkpoint from replicated arrays
    import os

    assert os.path.exists(tmp_path / "r8" / "xequinet_last.ckpt")


def test_replica_batcher_pads_partial_group(db):
    from xequinet_tpu.data.dataset import DataLoader
    from xequinet_tpu.data.store import XDBDataset
    from xequinet_tpu.data.transforms import build_transform_pipeline

    ds = XDBDataset(db, split="train",
                    transform=build_transform_pipeline(cutoff=5.0))
    loader = DataLoader(ds, 2)
    n_micro = sum(1 for _ in loader)
    rb_n = 3  # does not divide n_micro evenly for this dataset
    from xequinet_tpu.parallel.data_parallel import ReplicaBatcher

    rb = ReplicaBatcher(loader, rb_n)
    groups = list(rb)
    assert all(g[keys.POSITIONS].shape[0] == rb_n for g in groups)
    # padded replicas are fully masked
    last = groups[-1]
    n_pad = rb_n * len(groups) - n_micro
    if n_pad:
        assert not last[keys.NODE_MASK][-1].any()
        assert not last[keys.GRAPH_MASK][-1].any()


def test_process_shard_partitions_dataset(db):
    """Per-host sharding (the DistributedSampler equivalent): two shard
    loaders see disjoint halves whose energies union to the full set."""
    from xequinet_tpu.data.dataset import DataLoader
    from xequinet_tpu.data.store import XDBDataset
    from xequinet_tpu.data.transforms import build_transform_pipeline

    ds = XDBDataset(db, split="train",
                    transform=build_transform_pipeline(cutoff=5.0))

    def energies(shard):
        dl = DataLoader(ds, 4, shuffle=True, seed=1, process_shard=shard)
        out = []
        for b in dl:
            out.extend(
                np.asarray(b[keys.TOTAL_ENERGY])[
                    np.asarray(b[keys.GRAPH_MASK])
                ].tolist()
            )
        return out

    full = sorted(energies(None))
    s0, s1 = energies((0, 2)), energies((1, 2))
    assert len(s0) + len(s1) == len(full)
    assert sorted(s0 + s1) == pytest.approx(full)


def test_dp_devices_overrequest_falls_back(db, tmp_path, monkeypatch):
    """Requesting more dp devices than exist must clamp (with a warning),
    not desynchronize the loader stacking from the trainer's step choice
    (regression: a silently-truncated size-1 mesh made run_train wrap
    loaders in ReplicaBatcher while Trainer took the single-device step,
    crashing in compute_edge_data with stacked shapes)."""
    import warnings as _w

    import xequinet_tpu.run.train as rt

    monkeypatch.setattr(rt.jax, "device_count", lambda: 1)
    cfg = _config(db, str(tmp_path / "clamp"), dp_devices=N_DEV)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        trainer = run_train(cfg)
    assert any("dp_devices" in str(r.message) for r in rec)
    assert trainer.mesh is None
    leaves = jax.tree_util.tree_leaves(jax.device_get(trainer.params))
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)


def test_replica_batcher_multihost_lockstep(db):
    """Capacity packing makes micro-batch counts content-dependent, so
    process-sharded hosts can disagree on steps-per-epoch; in multi-host
    mode an exhausted host must keep yielding fully-empty groups until
    ALL processes are done (otherwise the surviving hosts hang in the
    step's collectives).  Simulate the 'other host still has data' side
    of the allgather."""
    from xequinet_tpu.data.dataset import DataLoader
    from xequinet_tpu.data.store import XDBDataset
    from xequinet_tpu.data.transforms import build_transform_pipeline
    from xequinet_tpu.parallel.data_parallel import ReplicaBatcher

    ds = XDBDataset(db, split="train",
                    transform=build_transform_pipeline(cutoff=5.0))
    loader = DataLoader(ds, 2)
    rb = ReplicaBatcher(loader, 2, sync_processes=True)
    n_local = sum(1 for _ in ReplicaBatcher(loader, 2))
    n_other = n_local + 3  # the other host packs 3 more groups

    calls = []

    def fake_allgather(flag):
        calls.append(bool(flag[0]))
        other_active = len(calls) <= n_other
        return np.asarray([bool(flag[0]), other_active])

    rb._allgather = fake_allgather
    groups = list(rb)
    # exactly max(local, other) steps — lockstep with the slower host
    assert len(groups) == n_other
    assert len(calls) == n_other + 1  # +1 final all-done round
    # the trailing groups are fully masked (zero loss/metric/grad)
    for g in groups[n_local:]:
        assert not g[keys.NODE_MASK].any()
        assert not g[keys.GRAPH_MASK].any()
    # real groups arrive unchanged and first
    assert groups[0][keys.NODE_MASK].any()
