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


# ---------------------------------------------------------------------------
# PySCF / geomeTRIC adapters (mocked engine; real pyscf is optional)
# ---------------------------------------------------------------------------
class _FakeMole:
    """Duck-typed PySCF Mole: elements, Bohr coords, charge, spin."""

    def __init__(self, elements, coords_bohr, charge=0, spin=0):
        self.elements = elements
        self._coords = np.asarray(coords_bohr, dtype=float)
        self.charge = charge
        self.spin = spin

    def atom_coords(self):
        return self._coords


def test_datapoint_from_pyscf_units_and_fields():
    from xequinet_tpu.data.fmt_conversion import datapoint_from_pyscf
    from xequinet_tpu.utils.qc import unit_conversion

    coords_bohr = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 2.0]])
    mole = _FakeMole(["O", "H"], coords_bohr, charge=-1, spin=1)
    dp = datapoint_from_pyscf(mole)
    assert dp.atomic_numbers.tolist() == [8, 1]
    b2a = unit_conversion("Bohr", "Angstrom")
    np.testing.assert_allclose(dp.pos, coords_bohr * b2a, rtol=1e-12)
    assert dp.charge == -1 and dp.spin == 1


def test_xequi_method_units(mini_ckpt):
    """energy in Hartree, gradient in a.u. == -forces(eV/A) converted."""
    from xequinet_tpu.interface.calculator import Calculator
    from xequinet_tpu.run.dynamics import ForceField
    from xequinet_tpu.run.geometry import xequi_method
    from xequinet_tpu.utils.qc import unit_conversion

    rng = np.random.default_rng(0)
    z = np.array([8, 1, 1], dtype=np.int32)
    pos_ang = rng.normal(size=(3, 3)) * 0.8
    ff = ForceField(Calculator(mini_ckpt), z)
    e_ev, f_ev = ff(pos_ang)

    mole = _FakeMole(
        ["O", "H", "H"], pos_ang / unit_conversion("Bohr", "Angstrom")
    )
    e_ha, grad_au = xequi_method(mole, ff)
    np.testing.assert_allclose(
        e_ha, e_ev * unit_conversion("eV", "Hartree"), rtol=1e-6
    )
    np.testing.assert_allclose(
        grad_au, -f_ev * unit_conversion("eV/Angstrom", "au"), rtol=1e-5,
        atol=1e-8,
    )


def _install_fake_pyscf(monkeypatch, kernel_log):
    """A minimal pyscf+geomeTRIC stand-in exercising the delegation
    wiring: gto.M builds a _FakeMole, as_pyscf_method packages the
    callback, geometric_solver.kernel calls it and 'optimizes' by
    shifting positions."""
    import sys
    import types

    from xequinet_tpu.utils.qc import ELEMENTS_LIST, unit_conversion

    a2b = 1.0 / unit_conversion("Bohr", "Angstrom")

    pyscf = types.ModuleType("pyscf")
    gto = types.ModuleType("pyscf.gto")
    geomopt = types.ModuleType("pyscf.geomopt")
    geometric_solver = types.ModuleType("pyscf.geomopt.geometric_solver")
    geometric = types.ModuleType("geometric")

    def M(atom, basis, charge=0, spin=0, unit="Angstrom"):
        assert unit == "Angstrom"
        elements = [sym for sym, _ in atom]
        coords_ang = np.array([c for _, c in atom], dtype=float)
        return _FakeMole(elements, coords_ang * a2b, charge, spin)

    gto.M = M

    class _FakeMethod:
        def __init__(self, mole, fn):
            self.mole = mole
            self.fn = fn

    def as_pyscf_method(mole, fn):
        return _FakeMethod(mole, fn)

    def kernel(method, constraints=None, maxsteps=100, **kw):
        kernel_log.append(
            {"constraints": constraints, "maxsteps": maxsteps, **kw}
        )
        e0, g0 = method.fn(method.mole)  # the shim must be callable
        assert np.isfinite(e0) and np.isfinite(g0).all()
        new = _FakeMole(
            method.mole.elements,
            method.mole.atom_coords() + 0.05,
            method.mole.charge,
            method.mole.spin,
        )
        return True, new

    geomopt.as_pyscf_method = as_pyscf_method
    geometric_solver.kernel = kernel
    geomopt.geometric_solver = geometric_solver
    pyscf.gto = gto
    pyscf.geomopt = geomopt
    for name, mod in [
        ("pyscf", pyscf), ("pyscf.gto", gto), ("pyscf.geomopt", geomopt),
        ("pyscf.geomopt.geometric_solver", geometric_solver),
        ("geometric", geometric),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)


def test_run_opt_auto_delegates_to_geometric(mini_ckpt, tmp_path, monkeypatch):
    """A $set constraint file needs geomeTRIC: run_opt must delegate
    (passing the file through to kernel) instead of raising."""
    from xequinet_tpu.data.datapoint import Datapoint
    from xequinet_tpu.data.fmt_conversion import write_xyz
    from xequinet_tpu.run.geometry import run_opt

    kernel_log = []
    _install_fake_pyscf(monkeypatch, kernel_log)

    rng = np.random.default_rng(1)
    z = np.array([8, 1, 1], dtype=np.int32)
    pos = rng.normal(size=(3, 3)) * 0.8
    inp = str(tmp_path / "w.xyz")
    write_xyz(inp, [Datapoint(z, pos)])
    con = tmp_path / "cons.txt"
    con.write_text("$set\ndistance 1 2 0.96\n")

    results = run_opt(mini_ckpt, inp, max_steps=7, constraints=str(con))
    assert len(kernel_log) == 1
    assert kernel_log[0]["constraints"] == str(con)
    assert kernel_log[0]["maxsteps"] == 7
    # the 'optimized' geometry is the fake kernel's shifted one
    np.testing.assert_allclose(results[0]["positions"], pos + 0.05 * 0.529177210903,
                               rtol=0, atol=1e-6)
    assert results[0]["converged"]


def test_run_opt_native_engine_still_raises(mini_ckpt, tmp_path, monkeypatch):
    from xequinet_tpu.data.datapoint import Datapoint
    from xequinet_tpu.data.fmt_conversion import write_xyz
    from xequinet_tpu.run.geometry import run_opt

    _install_fake_pyscf(monkeypatch, [])
    rng = np.random.default_rng(1)
    inp = str(tmp_path / "w.xyz")
    write_xyz(inp, [Datapoint(np.array([1, 1], dtype=np.int32),
                              rng.normal(size=(2, 3)))])
    con = tmp_path / "cons.txt"
    con.write_text("$scan\ndistance 1 2 0.8 1.2 5\n")
    with pytest.raises(NotImplementedError):
        run_opt(mini_ckpt, inp, constraints=str(con), engine="native")


# ---------------------------------------------------------------------------
# direct LMDB reading: tolerant unpickler + record extraction
# ---------------------------------------------------------------------------
def _fake_pyg_pickle(monkeypatch, payload):
    """Pickle an object whose classes claim to live in torch_geometric.*,
    then drop the fake modules so unpickling MUST go through the
    TolerantUnpickler stubs (the real-environment situation: records were
    written with PyG installed, we read them without it)."""
    import pickle as _pickle
    import sys
    import types

    tg = types.ModuleType("torch_geometric")
    tgd = types.ModuleType("torch_geometric.data")

    # created via type() so the qualname is module-level (picklable)
    BaseStorage = type("BaseStorage", (), {"__module__": "torch_geometric.data"})
    Data = type("Data", (), {"__module__": "torch_geometric.data"})
    tgd.BaseStorage = BaseStorage
    tgd.Data = Data
    tg.data = tgd
    monkeypatch.setitem(sys.modules, "torch_geometric", tg)
    monkeypatch.setitem(sys.modules, "torch_geometric.data", tgd)

    store = BaseStorage()
    store._mapping = payload
    rec = Data()
    rec._store = store
    blob = _pickle.dumps(rec)
    monkeypatch.delitem(sys.modules, "torch_geometric")
    monkeypatch.delitem(sys.modules, "torch_geometric.data")
    return blob


def test_tolerant_unpickler_reads_pyg_records(monkeypatch):
    import torch

    from xequinet_tpu.data.lmdb_reader import (
        record_to_datapoint,
        tolerant_loads,
    )

    rng = np.random.default_rng(0)
    pos = rng.normal(size=(4, 3)).astype(np.float32)
    payload = {
        "atomic_numbers": torch.tensor([6, 1, 1, 8]),
        "pos": torch.tensor(pos),
        "energy": torch.tensor([-7.25]),
        "forces": torch.tensor(rng.normal(size=(4, 3)).astype(np.float32)),
        "charge": torch.tensor([0]),
        "spin": torch.tensor([0]),
        "cell": torch.eye(3).unsqueeze(0) * 9.0,
        "pbc": torch.tensor([[True, True, True]]),
        "virial": torch.zeros(1, 3, 3),
    }
    blob = _fake_pyg_pickle(monkeypatch, payload)

    # torch_geometric must NOT be importable now
    with pytest.raises(ImportError):
        import torch_geometric  # noqa: F401

    dp = record_to_datapoint(tolerant_loads(blob))
    assert dp.atomic_numbers.tolist() == [6, 1, 1, 8]
    np.testing.assert_allclose(dp.pos, pos, rtol=1e-6)
    assert dp.energy == pytest.approx(-7.25)
    assert dp.cell.shape == (3, 3) and dp.cell[0, 0] == pytest.approx(9.0)
    assert dp.pbc.all()
    assert dp.virial.shape == (3, 3)
    assert dp.charge == 0 and dp.spin == 0


def test_xdbdataset_missing_backend_message(tmp_path):
    from xequinet_tpu.data.store import XDBDataset

    (tmp_path / "info.json").write_text("{}")
    with pytest.raises(FileNotFoundError, match="data.xdb or data.lmdb"):
        XDBDataset(tmp_path)


def test_lmdb_dataset_in_place(tmp_path, monkeypatch):
    """End-to-end: write a reference-format LMDB, read it through
    XDBDataset without conversion.  Written with the real lmdb package
    when present, else with the pure-Python writer (data/lmdb_pure.py) —
    either way the file is the on-disk LMDB format and the read side is
    the production XDBDataset path."""
    from xequinet_tpu.data.store import XDBDataset

    payloads = []
    for i in range(3):
        rng = np.random.default_rng(i)
        import torch

        payloads.append({
            "atomic_numbers": torch.tensor([1, 1]),
            "pos": torch.tensor(rng.normal(size=(2, 3)).astype(np.float32)),
            "energy": torch.tensor([float(i)]),
        })
    blobs = {
        int(i).to_bytes(8, "little"): _fake_pyg_pickle(monkeypatch, p)
        for i, p in enumerate(payloads)
    }
    try:
        import lmdb

        env = lmdb.open(str(tmp_path / "data.lmdb"), subdir=False,
                        map_size=2**30)
        with env.begin(write=True) as txn:
            for k, blob in blobs.items():
                txn.put(k, blob)
        env.close()
    except ImportError:
        from xequinet_tpu.data.lmdb_pure import write_lmdb

        write_lmdb(tmp_path / "data.lmdb", blobs)
    (tmp_path / "info.json").write_text('{"units": {}}')
    ds = XDBDataset(tmp_path, split="train")
    assert len(ds) == 3
    assert ds[1].energy == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# bf16 mitigation: late-epoch f32 switch
# ---------------------------------------------------------------------------
def test_f32_finetune_switch(tmp_path):
    """trainer.f32_finetune_epochs: the last K epochs re-jit with float32
    compute dtypes and checkpoints saved after the switch embed f32, so
    test/inference run the fine-tuned precision."""
    import pickle

    from xequinet_tpu.data.store import create_dataset
    from xequinet_tpu.run.train import run_train
    from xequinet_tpu.utils.config import XequiConfig

    rng = np.random.default_rng(11)
    dps = []
    for _ in range(8):
        z = rng.integers(1, 5, 5).astype(np.int32)
        pos = rng.normal(size=(5, 3)) * 1.4
        ei, _ = radius_graph_np(pos, 5.0)
        dps.append(Datapoint(z, pos, edge_index=ei,
                             energy=float(rng.normal()),
                             forces=rng.normal(size=(5, 3)).astype(np.float32)))
    db = create_dataset(
        tmp_path / "db", dps, units={keys.TOTAL_ENERGY: "eV"},
        split={"train": list(range(6)), "valid": [6, 7], "test": []},
    )
    cfg = XequiConfig()
    cfg.model.model_name = "xpainn"
    cfg.model.model_kwargs = dict(
        node_dim=8, node_irreps="8x0e+4x1o", embed_basis="one-hot",
        num_basis=4, action_blocks=1, cutoff=5.0, output_modes=["energy"],
        compute_dtype="bfloat16", update_compute_dtype="bfloat16",
    )
    cfg.data.db_path = str(db)
    cfg.data.targets = [keys.TOTAL_ENERGY, keys.FORCES]
    cfg.data.batch_size = 4
    cfg.data.valid_batch_size = 2
    cfg.trainer.dp_devices = 1
    cfg.trainer.max_epochs = 2
    cfg.trainer.warmup_epochs = 0
    # switch at epoch 0: the CPU backend cannot dispatch bf16 matmuls,
    # so the test covers the rebuild/embedding mechanics (the bf16
    # epochs themselves run on TPU; see PERF.md accuracy study)
    cfg.trainer.f32_finetune_epochs = 2
    cfg.trainer.save_dir = str(tmp_path / "run")
    cfg.trainer.seed = 0
    trainer = run_train(cfg)
    assert trainer._f32_switched
    # the config now embeds f32 compute dtypes
    assert trainer.config.model.model_kwargs["compute_dtype"] == "float32"
    # ... and so does the saved checkpoint
    import glob

    ckpts = glob.glob(str(tmp_path / "run" / "*_last.ckpt")) or glob.glob(
        str(tmp_path / "run" / "*.ckpt")
    )
    assert ckpts
    blob = pickle.load(open(ckpts[0], "rb"))
    mk = blob["config"]["model_kwargs"]
    assert mk["compute_dtype"] == "float32"
    assert mk["update_compute_dtype"] == "float32"


# ---------------------------------------------------------------------------
# jit output projection: the MD hot loop must fetch ONLY user-facing
# outputs (fetching the full blackboard dict through a tunneled TPU
# backend cost ~25 s/call — PERF.md round-3; a regression here is
# invisible on CPU except through these key sets)
# ---------------------------------------------------------------------------
def test_calculator_jit_outputs_are_projected(mini_ckpt):
    from xequinet_tpu.interface.calculator import Calculator

    rng = np.random.default_rng(3)
    z = rng.integers(1, 5, 12).astype(np.int32)
    pos = rng.normal(size=(12, 3)) * 2.0

    # free path
    calc = Calculator(mini_ckpt)
    calc.calculate(z, pos)
    # PBC path
    cell = np.eye(3) * 12.0
    calc_p = Calculator(mini_ckpt, compute_virial=True)
    calc_p.calculate(z, pos % 12.0, cell=cell,
                     pbc=np.array([True] * 3))

    res = calc.calculate(z, pos)
    assert set(res) <= keys.OUTPUT_PROPERTIES
    res_p = calc_p.calculate(z, pos % 12.0, cell=cell,
                             pbc=np.array([True] * 3))
    assert set(res_p) <= keys.OUTPUT_PROPERTIES


def test_inference_engine_outputs_are_projected(mini_ckpt):
    from xequinet_tpu.run.inference import InferenceEngine

    rng = np.random.default_rng(4)
    z = rng.integers(1, 5, 9).astype(np.int32)
    pos = rng.normal(size=(9, 3)) * 2.0
    eng = InferenceEngine(mini_ckpt)
    (res,) = eng.predict([Datapoint(z, pos)])
    assert set(res) <= keys.OUTPUT_PROPERTIES
    assert keys.TOTAL_ENERGY in res and keys.FORCES in res


# ---------------------------------------------------------------------------
# Verlet skin neighbor-list reuse (interface/calculator.py skin path)
# ---------------------------------------------------------------------------
def _pbc_system(rng, n=40, lx=22.0):
    cell = np.diag([lx, 11.0, 11.0])
    pos = np.column_stack([
        rng.uniform(0, lx, n), rng.uniform(0, 11.0, size=(n, 2))
    ])
    z = rng.integers(1, 5, n).astype(np.int32)
    return z, pos, cell, np.array([True, True, True])


def test_skin_calculator_matches_plain_pbc(mini_ckpt):
    """skin>0 must give the same energy/forces/virial as skin=0 across
    an MD-like perturbation series, while rebuilding the neighbor list
    only when an atom drifts skin/2."""
    from xequinet_tpu.interface.calculator import Calculator

    rng = np.random.default_rng(7)
    z, pos, cell, pbc = _pbc_system(rng)
    ref = Calculator(mini_ckpt, compute_virial=True)
    fast = Calculator(mini_ckpt, compute_virial=True, skin=0.6)

    rebuilds_seen = []
    for step in range(6):
        r0 = ref.calculate(z, pos, cell=cell, pbc=pbc)
        r1 = fast.calculate(z, pos, cell=cell, pbc=pbc)
        fs = np.abs(r0[keys.FORCES]).max()
        assert abs(
            r1[keys.TOTAL_ENERGY] - r0[keys.TOTAL_ENERGY]
        ) < 1e-4 * max(abs(r0[keys.TOTAL_ENERGY]), 1.0)
        assert np.abs(
            r1[keys.FORCES] - r0[keys.FORCES]
        ).max() < 1e-3 * fs + 1e-5
        vs = np.abs(r0[keys.VIRIAL]).max()
        assert np.abs(
            r1[keys.VIRIAL] - r0[keys.VIRIAL]
        ).max() < 1e-3 * vs + 1e-4
        rebuilds_seen.append(fast.n_rebuilds)
        # small MD-like drift: stays within skin/2 for several steps
        pos = pos + rng.normal(size=pos.shape) * 0.03
    # first call built; the following small-drift calls reused the list
    assert rebuilds_seen[0] == 1
    assert fast.n_rebuilds < 6

    # a large jump (e.g. a PBC wrap) must force a rebuild
    before = fast.n_rebuilds
    pos_jump = pos.copy()
    pos_jump[0, 0] += 5.0
    fast.calculate(z, pos_jump, cell=cell, pbc=pbc)
    assert fast.n_rebuilds == before + 1

    # an NPT cell move must force a rebuild
    before = fast.n_rebuilds
    fast.calculate(z, pos_jump, cell=cell * 1.01, pbc=pbc)
    assert fast.n_rebuilds == before + 1


def test_skin_calculator_free_mega_interpret(mini_ckpt):
    """skin>0 through the mega path (free system, interpret mode):
    list reuse keeps results equal to the plain Calculator."""
    from jax.experimental.pallas import tpu as pltpu

    from xequinet_tpu.interface.calculator import Calculator

    rng = np.random.default_rng(8)
    n = 1200
    x = np.arange(n) * 1.1 + rng.normal(size=n) * 0.05
    pos = np.column_stack([x, rng.uniform(0, 8.0, size=(n, 2))])
    z = rng.integers(1, 5, n).astype(np.int32)

    caps = dict(max_atoms=2048, max_edges=16384)
    ref = Calculator(mini_ckpt, **caps)
    fast = Calculator(mini_ckpt, pallas="mega", skin=0.6, **caps)

    for step in range(3):
        r0 = ref.calculate(z, pos)
        with pltpu.force_tpu_interpret_mode():
            r1 = fast.calculate(z, pos)
        assert fast._skin_state is not None
        assert fast._skin_state["kind"] == "mega"
        fs = np.abs(r0[keys.FORCES]).max()
        assert abs(
            r1[keys.TOTAL_ENERGY] - r0[keys.TOTAL_ENERGY]
        ) < 1e-4 * max(abs(r0[keys.TOTAL_ENERGY]), 1.0)
        assert np.abs(
            r1[keys.FORCES] - r0[keys.FORCES]
        ).max() < 1e-3 * fs + 1e-5
        pos = pos + rng.normal(size=pos.shape) * 0.03
    assert fast.n_rebuilds == 1  # the two drift steps reused the list
