"""End-to-end pipeline tests: store round-trip, xyz parsing, train driver,
inference engine, geometry optimization, MD (all CPU; SURVEY.md §4
round-trip checks)."""

import json
import os

import numpy as np
import pytest

from xequinet_tpu import keys
from xequinet_tpu.data.datapoint import Datapoint
from xequinet_tpu.data.fmt_conversion import read_xyz, write_xyz
from xequinet_tpu.data.store import XDBDataset, XDBReader, XDBWriter, create_dataset
from xequinet_tpu.ops.radius_graph import radius_graph_np
from xequinet_tpu.utils.config import XequiConfig


def pair_energy_forces(pos):
    diff = pos[:, None] - pos[None, :]
    r2 = (diff**2).sum(-1)
    off = 1 - np.eye(len(pos))
    g = np.exp(-0.5 * r2) * off
    return 0.5 * g.sum(), (g[:, :, None] * diff).sum(1)


def random_dp(rng, n=6, labels=True, edges=False):
    z = rng.integers(1, 5, n).astype(np.int32)
    pos = rng.normal(size=(n, 3)) * 1.5
    kw = {}
    if labels:
        e, f = pair_energy_forces(pos)
        kw = dict(energy=e, forces=f, charge=0, spin=0)
    if edges:
        kw["edge_index"] = radius_graph_np(pos, 5.0)[0]
    return Datapoint(z, pos, **kw)


# ---------------------------------------------------------------------------
# Store
# ---------------------------------------------------------------------------
def test_xdb_roundtrip(tmp_path, rng):
    dps = [random_dp(rng, n=rng.integers(3, 9)) for _ in range(7)]
    f = tmp_path / "t.xdb"
    with XDBWriter(f) as w:
        for dp in dps:
            w.append(dp)
    r = XDBReader(f)
    assert len(r) == 7
    for i, dp in enumerate(dps):
        got = r[i]
        np.testing.assert_array_equal(got.atomic_numbers, dp.atomic_numbers)
        np.testing.assert_allclose(got.pos, dp.pos)
        np.testing.assert_allclose(got.energy, dp.energy)
        np.testing.assert_allclose(got.forces, dp.forces)
        assert got.charge == 0 and got.spin == 0
    r.close()


def test_create_dataset_and_splits(tmp_path, rng):
    dps = [random_dp(rng) for _ in range(20)]
    db = create_dataset(tmp_path / "db", dps, units={keys.TOTAL_ENERGY: "eV"})
    info = json.loads((db / "info.json").read_text())
    assert info["num_records"] == 20
    train = XDBDataset(db, split="train")
    valid = XDBDataset(db, split="valid")
    assert len(train) == 16 and len(valid) == 2
    assert train.units == {keys.TOTAL_ENERGY: "eV"}
    dp = train[0]
    assert dp.num_atoms == 6


# ---------------------------------------------------------------------------
# xyz I/O
# ---------------------------------------------------------------------------
def test_xyz_roundtrip(tmp_path, rng):
    dps = [random_dp(rng, n=4), random_dp(rng, n=5)]
    dps[0].cell = np.diag([9.0, 9.0, 9.0])
    dps[0].pbc = np.ones(3, bool)
    f = tmp_path / "t.xyz"
    write_xyz(f, dps, forces=[dp.forces for dp in dps],
              energies=[dp.energy for dp in dps])
    back = read_xyz(f)
    assert len(back) == 2
    np.testing.assert_allclose(back[0].pos, dps[0].pos, atol=1e-6)
    np.testing.assert_allclose(back[0].cell, dps[0].cell, atol=1e-6)
    np.testing.assert_allclose(back[1].forces, dps[1].forces, atol=1e-6)
    np.testing.assert_allclose(back[0].energy, dps[0].energy, rtol=1e-8)
    np.testing.assert_array_equal(back[1].atomic_numbers, dps[1].atomic_numbers)


def test_xyz_charge_multiplicity():
    import io

    text = "3\ncharge=-1 multiplicity=2\nO 0 0 0\nH 0 0 1\nH 0 1 0\n"
    dp = read_xyz(io.StringIO(text))[0]
    assert dp.charge == -1 and dp.spin == 1
    assert dp.atomic_numbers.tolist() == [8, 1, 1]


# ---------------------------------------------------------------------------
# Full train -> test -> infer -> opt -> md workflow
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    """Train a tiny model on the synthetic potential via the run driver."""
    from xequinet_tpu.run.train import run_train

    tmp = tmp_path_factory.mktemp("flow")
    rng = np.random.default_rng(0)
    dps = [random_dp(rng) for _ in range(24)]
    create_dataset(tmp / "db", dps, units={})

    cfg = XequiConfig()
    cfg.model.model_name = "xpainn"
    cfg.model.model_kwargs = dict(
        node_dim=16, node_irreps="16x0e+8x1o+4x2e", embed_basis="one-hot",
        num_basis=8, cutoff=5.0, action_blocks=1, output_modes=["energy"],
    )
    cfg.data.db_path = str(tmp / "db")
    cfg.data.targets = [keys.TOTAL_ENERGY, keys.FORCES]
    cfg.data.batch_size = 8
    cfg.data.valid_batch_size = 8
    cfg.trainer.max_epochs = 3
    cfg.trainer.warmup_epochs = 1
    cfg.trainer.max_lr = 1e-3
    cfg.trainer.lossfn = "l2"
    cfg.trainer.losses_weight = {keys.TOTAL_ENERGY: 1.0, keys.FORCES: 5.0}
    cfg.trainer.save_dir = str(tmp)
    cfg.trainer.log_steps = 1000
    trainer = run_train(cfg)
    ckpt = os.path.join(str(tmp), "xequinet_last.ckpt")
    assert os.path.exists(ckpt)
    return ckpt, cfg, tmp


def test_run_train_and_test(trained_ckpt):
    from xequinet_tpu.run.test import run_test

    ckpt, cfg, tmp = trained_ckpt
    results = run_test(cfg, ckpt)
    assert keys.TOTAL_ENERGY in results
    assert np.isfinite(results[keys.TOTAL_ENERGY]["mae"])


def test_inference_engine(trained_ckpt, rng):
    from xequinet_tpu.run.inference import InferenceEngine

    ckpt, _, _ = trained_ckpt
    engine = InferenceEngine(ckpt)
    dps = [random_dp(rng, labels=False) for _ in range(3)]
    results = engine.predict(dps, compute_forces=True)
    assert len(results) == 3
    for r, dp in zip(results, dps):
        assert np.isfinite(r[keys.TOTAL_ENERGY])
        assert r[keys.FORCES].shape == (dp.num_atoms, 3)


def test_run_infer_cli_path(trained_ckpt, tmp_path, rng):
    from xequinet_tpu.run.inference import run_infer

    ckpt, _, _ = trained_ckpt
    dps = [random_dp(rng, labels=False) for _ in range(2)]
    xyz = tmp_path / "in.xyz"
    write_xyz(xyz, dps)
    out = run_infer(ckpt, str(xyz), output_file=str(tmp_path / "out.pkl"))
    assert len(out) == 2
    assert (tmp_path / "out.pkl").exists()


def test_calculator_consistency(trained_ckpt, rng):
    """Calculator (device neighbor rebuild) must match the batch path."""
    from xequinet_tpu.interface.calculator import Calculator
    from xequinet_tpu.run.inference import InferenceEngine

    ckpt, _, _ = trained_ckpt
    calc = Calculator(ckpt)
    engine = InferenceEngine(ckpt)
    dp = random_dp(rng, labels=False)
    res_c = calc.calculate(dp.atomic_numbers, dp.pos)
    res_e = engine.predict([dp], compute_forces=True)[0]
    np.testing.assert_allclose(
        res_c[keys.TOTAL_ENERGY], float(res_e[keys.TOTAL_ENERGY]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        res_c[keys.FORCES], res_e[keys.FORCES], rtol=1e-3, atol=1e-4
    )


def test_geometry_optimization(trained_ckpt, tmp_path, rng):
    from xequinet_tpu.run.geometry import run_opt

    ckpt, _, _ = trained_ckpt
    dp = random_dp(rng, labels=False)
    xyz = tmp_path / "g.xyz"
    write_xyz(xyz, [dp])
    results = run_opt(
        ckpt, str(xyz), output_file=str(tmp_path / "opt.xyz"),
        max_steps=20, fmax=10.0, freq=True,
    )
    assert len(results) == 1
    assert np.isfinite(results[0]["energy"])
    assert "thermo" in results[0]
    assert (tmp_path / "opt.xyz").exists()


def test_md_short_run(trained_ckpt, tmp_path, rng):
    from xequinet_tpu.run.dynamics import run_md
    from xequinet_tpu.utils.config import MDConfig

    ckpt, _, _ = trained_ckpt
    dp = random_dp(rng, labels=False)
    xyz = tmp_path / "md_in.xyz"
    write_xyz(xyz, [dp])
    cfg = MDConfig(
        ensembles=[
            {"name": "langevin", "timestep": 0.5, "steps": 5,
             "temperature": 300.0, "log_interval": 5},
            {"name": "nve", "timestep": 0.5, "steps": 5, "log_interval": 5},
        ],
        input_file=str(xyz),
        model_file=ckpt,
        logfile=str(tmp_path / "md.log"),
        xyz_traj=str(tmp_path / "traj.xyz"),
        seed=1,
    )
    state = run_md(cfg)
    assert state.step == 10
    assert np.isfinite(state.pos).all() and np.isfinite(state.vel).all()
    assert (tmp_path / "traj.xyz").exists()


def test_export_roundtrip(trained_ckpt, tmp_path, rng):
    from xequinet_tpu.interface.export import export_model, load_exported

    ckpt, _, _ = trained_ckpt
    out = export_model(
        ckpt, str(tmp_path / "export"), max_atoms=16, max_edges=128,
        compute_virial=False,
    )
    exported, manifest = load_exported(out)
    assert manifest["max_atoms"] == 16
    # call the deserialized module
    import jax
    import jax.numpy as jnp

    dp = random_dp(rng, labels=False, edges=True)
    n, e_cap = 16, 128
    pos = np.zeros((n, 3), np.float32)
    pos[: dp.num_atoms] = dp.pos
    z = np.zeros(n, np.int32)
    z[: dp.num_atoms] = dp.atomic_numbers
    ei = np.zeros((2, e_cap), np.int32)
    ne = dp.num_edges
    ei[:, :ne] = dp.edge_index
    em = np.arange(e_cap) < ne
    energy, forces = exported.call(
        jnp.asarray(pos), jnp.asarray(z), jnp.asarray(ei), jnp.asarray(em),
        jnp.zeros(1, jnp.int32),
    )
    assert np.isfinite(float(energy))
    assert np.isfinite(np.asarray(forces)).all()


def test_calculator_pbc_path(trained_ckpt, rng):
    """Calculator with a periodic cell: energy/forces/virial finite and
    consistent with the batch pipeline."""
    from xequinet_tpu.interface.calculator import Calculator
    from xequinet_tpu.ops.radius_graph import radius_graph_pbc_np

    ckpt, _, _ = trained_ckpt
    calc = Calculator(ckpt, compute_virial=True)
    cell = np.diag([6.0, 6.5, 7.0])
    pos = rng.uniform(0, 1, size=(6, 3)) @ cell
    z = rng.integers(1, 5, 6).astype(np.int32)
    res = calc.calculate(z, pos, cell=cell, pbc=np.ones(3, bool))
    assert np.isfinite(res[keys.TOTAL_ENERGY])
    assert np.isfinite(res[keys.FORCES]).all()
    assert np.isfinite(res[keys.VIRIAL]).all()

    # consistency vs explicit batch path
    from xequinet_tpu.data.batching import collate
    from xequinet_tpu.run.inference import InferenceEngine

    ei, offs = radius_graph_pbc_np(pos, cell, np.ones(3, bool), calc.cutoff)
    dp = Datapoint(z, pos, cell=cell, pbc=np.ones(3, bool),
                   edge_index=ei, cell_offsets=offs)
    engine = InferenceEngine(ckpt)
    r2 = engine.predict([dp], compute_forces=True)[0]
    np.testing.assert_allclose(
        res[keys.TOTAL_ENERGY], float(r2[keys.TOTAL_ENERGY]), rtol=1e-4, atol=1e-4
    )


def test_export_unit_styles(trained_ckpt, tmp_path, rng):
    """'real' unit style folds kcal/mol conversion into the export."""
    from xequinet_tpu.interface.export import export_model, load_exported
    from xequinet_tpu.utils.qc import unit_conversion

    ckpt, _, _ = trained_ckpt
    out_m = export_model(ckpt, str(tmp_path / "m"), max_atoms=16, max_edges=128,
                         unit_style="metal", compute_virial=False)
    out_r = export_model(ckpt, str(tmp_path / "r"), max_atoms=16, max_edges=128,
                         unit_style="real", compute_virial=False)
    em, _ = load_exported(out_m)
    er, _ = load_exported(out_r)
    dp = random_dp(rng, labels=False, edges=True)
    import jax.numpy as jnp

    pos = np.zeros((16, 3), np.float32); pos[: dp.num_atoms] = dp.pos
    z = np.zeros(16, np.int32); z[: dp.num_atoms] = dp.atomic_numbers
    ei = np.zeros((2, 128), np.int32); ei[:, : dp.num_edges] = dp.edge_index
    msk = np.arange(128) < dp.num_edges
    args = (jnp.asarray(pos), jnp.asarray(z), jnp.asarray(ei), jnp.asarray(msk),
            jnp.zeros(1, jnp.int32))
    e_metal, _ = em.call(*args)
    e_real, _ = er.call(*args)
    factor = unit_conversion("eV", "kcal/mol")
    np.testing.assert_allclose(
        float(e_real), float(e_metal) * factor, rtol=1e-4
    )


def test_loader_drops_oversized(rng):
    """Graphs exceeding capacities are dropped and counted."""
    from xequinet_tpu.data.dataset import DataLoader, InMemoryDataset

    big = random_dp(rng, n=30, edges=True)
    small = [random_dp(rng, n=4, edges=True) for _ in range(4)]
    ds = InMemoryDataset(small + [big])
    loader = DataLoader(
        ds, batch_size=4,
        capacities={"n_nodes": 16, "n_edges": 64, "n_graphs": 5},
    )
    seen = sum(int(b[keys.GRAPH_MASK].sum()) for b in loader)
    assert seen == 4
    assert loader.n_dropped == 1


def test_cli_dispatch(trained_ckpt, tmp_path, rng, capsys):
    """xeq CLI: help works; infer subcommand runs end to end."""
    from xequinet_tpu.cli import main

    with pytest.raises(SystemExit) as exc:
        main(["--help"])
    assert exc.value.code == 0

    ckpt, _, _ = trained_ckpt
    dps = [random_dp(rng, labels=False)]
    xyz = tmp_path / "cli.xyz"
    write_xyz(xyz, dps)
    rc = main(["infer", "-c", ckpt, "-in", str(xyz), "--forces"])
    assert rc == 0


def test_export_dipole_mode(tmp_path, rng):
    """Dipole deployment export (the XPaiNNDipole analogue)."""
    from xequinet_tpu.data.batching import collate
    from xequinet_tpu.interface.export import export_model, load_exported
    from xequinet_tpu.models.model import init_params, resolve_model
    from xequinet_tpu.training.trainer import save_checkpoint
    from xequinet_tpu.utils.config import ModelConfig, config_to_dict

    kw = dict(node_dim=16, node_irreps="16x0e+8x1o+4x2e", embed_basis="one-hot",
              num_basis=8, action_blocks=1,
              output_modes=["energy", "charges", "dipole"])
    module, extra, _ = resolve_model("xpainn", **kw)
    dp = random_dp(rng, labels=False, edges=True)
    params = init_params(module, collate([dp]))
    ckpt = tmp_path / "d.ckpt"
    save_checkpoint(str(ckpt), params,
                    config_to_dict(ModelConfig(model_name="xpainn",
                                               model_kwargs=kw)))
    out = export_model(str(ckpt), str(tmp_path / "exp"), max_atoms=16,
                       max_edges=128, output_mode="dipole")
    exported, manifest = load_exported(out)
    assert manifest["output_mode"] == "dipole"
    import jax.numpy as jnp

    pos = np.zeros((16, 3), np.float32); pos[: dp.num_atoms] = dp.pos
    z = np.zeros(16, np.int32); z[: dp.num_atoms] = dp.atomic_numbers
    ei = np.zeros((2, 128), np.int32); ei[:, : dp.num_edges] = dp.edge_index
    msk = np.arange(128) < dp.num_edges
    q, mu = exported.call(jnp.asarray(pos), jnp.asarray(z), jnp.asarray(ei),
                          jnp.asarray(msk), jnp.zeros(1, jnp.int32))
    assert np.isfinite(np.asarray(q)).all()
    assert np.asarray(mu).shape == (3,) and np.isfinite(np.asarray(mu)).all()
    # charge conservation survives the export
    np.testing.assert_allclose(np.asarray(q)[: dp.num_atoms].sum(), 0.0, atol=1e-4)
