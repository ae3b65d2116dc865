"""Round-3 fixes: persistent compilation cache, device-side neighbor
overflow detection in the Calculator, and the multi-host fatal-flag
lockstep protocol (VERDICT round-2 item 5 + ADVICE round-2 findings)."""

import os

import numpy as np
import pytest

from xequinet_tpu import keys
from xequinet_tpu.data.batching import collate
from xequinet_tpu.data.datapoint import Datapoint
from xequinet_tpu.models.model import init_params, resolve_model
from xequinet_tpu.ops.radius_graph import radius_graph_np
from xequinet_tpu.training.trainer import save_checkpoint
from xequinet_tpu.utils.config import ModelConfig, config_to_dict


@pytest.fixture(scope="module")
def mini_ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("r3")
    kw = dict(node_dim=16, node_irreps="16x0e+8x1o+4x2e",
              embed_basis="one-hot", num_basis=8, cutoff=5.0,
              action_blocks=1, output_modes=["energy"])
    module, extra, _ = resolve_model("xpainn", **kw)
    rng = np.random.default_rng(0)
    z = rng.integers(1, 5, 6).astype(np.int32)
    pos = rng.normal(size=(6, 3)) * 1.5
    ei, _ = radius_graph_np(pos, 5.0)
    params = init_params(module, collate([Datapoint(z, pos, edge_index=ei)]))
    ckpt = str(tmp / "mini.ckpt")
    save_checkpoint(ckpt, params,
                    config_to_dict(ModelConfig(model_name="xpainn",
                                               model_kwargs=kw)))
    return ckpt


# ---------------------------------------------------------------------------
# persistent compilation cache
# ---------------------------------------------------------------------------
def test_compilation_cache_writes_entries(tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp

    from xequinet_tpu.utils import compile_cache as cc

    monkeypatch.delenv(cc._ENV, raising=False)
    monkeypatch.setattr(cc, "_ENABLED_DIR", None)
    d = str(tmp_path / "xla_cache")
    assert cc.enable_compilation_cache(d, min_compile_secs=0.0) == d

    @jax.jit
    def f(x):
        return jnp.sin(x) @ jnp.ones((8, 8), x.dtype)

    f(jnp.ones((4, 8))).block_until_ready()
    assert os.listdir(d), "no cache entries written"
    # idempotent re-enable returns the same dir without error
    assert cc.enable_compilation_cache(d) == d


def test_compilation_cache_env_disable(tmp_path, monkeypatch):
    from xequinet_tpu.utils import compile_cache as cc

    monkeypatch.setenv(cc._ENV, "0")
    monkeypatch.setattr(cc, "_ENABLED_DIR", None)
    assert cc.enable_compilation_cache(str(tmp_path / "x")) is None
    assert cc.enable_compilation_cache(False) is None


# ---------------------------------------------------------------------------
# Calculator: device-side neighbor overflow is detected, never truncated
# ---------------------------------------------------------------------------
def test_calculator_detects_device_side_edge_overflow(mini_ckpt, monkeypatch):
    """The non-PBC path sizes e_cap from a HOST probe but rebuilds the
    list on DEVICE; if the device build finds more edges (f32 cutoff-
    boundary rounding, or a stale probe), the old code truncated
    silently.  Simulate a severe host undercount and check the result
    still matches the full-capacity reference."""
    from xequinet_tpu.interface import calculator as calc_mod
    from xequinet_tpu.interface.calculator import Calculator
    from xequinet_tpu.ops import radius_graph as rg

    rng = np.random.default_rng(3)
    n = 24
    z = rng.integers(1, 5, n).astype(np.int32)
    pos = rng.normal(size=(n, 3)) * 1.6  # dense: well over 64 edges

    ref = Calculator(mini_ckpt).calculate(z, pos)

    true_probe = rg.radius_graph_np

    def lying_probe(p, cutoff):
        ei, offs = true_probe(p, cutoff)
        return ei[:, :4], offs[:4] if offs is not None else offs

    monkeypatch.setattr(rg, "radius_graph_np", lying_probe)
    calc = Calculator(mini_ckpt, max_atoms=32, max_edges=None)
    # force a tiny initial e_cap via the (now lying) host probe
    monkeypatch.setattr(
        calc, "_capacities", lambda n_atoms: (32, 64)
    )
    res = calc.calculate(z, pos)
    np.testing.assert_allclose(
        res[keys.TOTAL_ENERGY], ref[keys.TOTAL_ENERGY], rtol=1e-5
    )
    np.testing.assert_allclose(res[keys.FORCES], ref[keys.FORCES],
                               rtol=1e-4, atol=1e-5)

    # user-pinned capacity: refuse instead of growing
    calc_pinned = Calculator(mini_ckpt, max_edges=64)
    with pytest.raises(ValueError, match="edge overflow"):
        calc_pinned.calculate(z, pos)


# ---------------------------------------------------------------------------
# ReplicaBatcher: fatal flag reaches the peers instead of deadlocking them
# ---------------------------------------------------------------------------
class _EmptyLoader:
    caps = {}

    def __iter__(self):
        return iter(())

    def __len__(self):
        return 0

    def set_epoch(self, epoch):
        pass


class _OneBatchLoader:
    caps = {}

    def __iter__(self):
        yield {keys.NODE_MASK: np.ones(3, bool)}

    def __len__(self):
        return 1

    def set_epoch(self, epoch):
        pass


def test_replica_batcher_fatal_flag_broadcast():
    """A host with zero batches must BROADCAST fatal before raising so
    peers break out of the lockstep collectives instead of hanging."""
    from xequinet_tpu.parallel.data_parallel import ReplicaBatcher

    rb = ReplicaBatcher(_EmptyLoader(), 1, sync_processes=True)
    sent = []

    def fake_allgather(flag):
        sent.append(int(flag[0]))
        return np.asarray([int(flag[0]), ReplicaBatcher._HAS_DATA])

    rb._allgather = fake_allgather
    with pytest.raises(RuntimeError, match="no batches"):
        list(rb)
    # the fatal flag went out BEFORE the raise — peers can observe it
    assert sent == [ReplicaBatcher._FATAL]


def test_replica_batcher_peer_fatal_raises_here_too():
    """The receiving side of the fatal flag: a healthy host seeing a
    peer's fatal flag raises instead of waiting in step collectives."""
    from xequinet_tpu.parallel.data_parallel import ReplicaBatcher

    rb = ReplicaBatcher(_OneBatchLoader(), 1, sync_processes=True)
    rb._allgather = lambda flag: np.asarray(
        [int(flag[0]), ReplicaBatcher._FATAL]
    )
    with pytest.raises(RuntimeError, match="no batches"):
        list(rb)


def test_replica_batcher_synced_len_is_max_over_hosts(monkeypatch):
    """LR pacing: __len__ must report the lockstep step count (max over
    hosts), computed once at construction, with no collectives later."""
    from jax.experimental import multihost_utils

    from xequinet_tpu.parallel.data_parallel import ReplicaBatcher

    calls = []

    def ctor_allgather(arr):
        calls.append(np.asarray(arr).copy())
        return np.asarray([int(arr[0]), 5])  # the other host packs 5

    monkeypatch.setattr(multihost_utils, "process_allgather", ctor_allgather)
    rb = ReplicaBatcher(_OneBatchLoader(), 1, sync_processes=True)
    assert calls, "construction must sync the length estimate"
    assert len(rb) == 5
    n_calls = len(calls)
    _ = len(rb)
    assert len(calls) == n_calls  # __len__ itself is collective-free
