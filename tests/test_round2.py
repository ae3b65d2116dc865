"""Round-2 feature tests: jit-able PBC neighbor builder, analytic Hessian,
constrained optimization + shermo export, NPT live-cell trajectories,
anisotropic NPT, self-contained (in-graph neighbor list) deployment export,
charged exports (VERDICT.md round-1 items 3-6 + ADVICE fixes)."""

import os

import numpy as np
import pytest

from xequinet_tpu import keys
from xequinet_tpu.data.batching import collate
from xequinet_tpu.data.datapoint import Datapoint
from xequinet_tpu.data.fmt_conversion import write_xyz, read_xyz
from xequinet_tpu.models.model import init_params, resolve_model
from xequinet_tpu.ops.radius_graph import (
    radius_graph_np,
    radius_graph_pbc_fixed,
    radius_graph_pbc_np,
)
from xequinet_tpu.training.trainer import save_checkpoint
from xequinet_tpu.utils.config import ModelConfig, config_to_dict


@pytest.fixture(scope="module")
def mini_ckpt(tmp_path_factory):
    """Untrained but fully functional checkpoint (energy head, cutoff 5)."""
    tmp = tmp_path_factory.mktemp("r2")
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
# jit-able PBC neighbor builder (export/GMX path)
# ---------------------------------------------------------------------------
def _edge_set(ei, offs):
    return {
        (int(c), int(n), int(o[0]), int(o[1]), int(o[2]))
        for c, n, o in zip(ei[0], ei[1], np.asarray(offs).round().astype(int))
    }


@pytest.mark.parametrize("pbc", [(True, True, True), (True, False, True)])
def test_radius_graph_pbc_fixed_matches_host(rng, pbc):
    import jax

    cell = np.array([[6.0, 0.4, 0.0], [0.0, 6.5, 0.3], [0.2, 0.0, 7.0]])
    pbc = np.array(pbc)
    pos = rng.uniform(0, 1, size=(8, 3)) @ cell
    cutoff = 4.5
    ei_h, offs_h = radius_graph_pbc_np(pos, cell, pbc, cutoff)

    fn = jax.jit(
        lambda p, c, b: radius_graph_pbc_fixed(p, c, b, cutoff, 512, max_reps=1)
    )
    ei_d, mask, offs_d, n_found, needed = fn(
        pos.astype(np.float32), cell.astype(np.float32), pbc
    )
    assert (np.asarray(needed) <= 1).all()
    ei_d = np.asarray(ei_d)[:, np.asarray(mask)]
    offs_d = np.asarray(offs_d)[np.asarray(mask)]
    assert int(n_found) == ei_h.shape[1]
    assert _edge_set(ei_d, offs_d) == _edge_set(ei_h, offs_h)
    # centers sorted (fast scatter invariant)
    assert (np.diff(np.asarray(ei_d)[0]) >= 0).all()


def test_radius_graph_pbc_fixed_reports_reps_overflow(rng):
    """Cells thinner than the cutoff need images beyond the static grid;
    the builder cannot generate them, so it must SAY so (needed_reps) —
    the gmx consumer's validation channel."""
    cell = np.eye(3, dtype=np.float32) * 2.0  # plane distance 2 A
    pos = (rng.uniform(0, 1, size=(4, 3)) @ cell).astype(np.float32)
    _, _, _, _, needed = radius_graph_pbc_fixed(
        pos, cell, np.ones(3, bool), 4.5, 256, max_reps=1,
    )
    assert (np.asarray(needed) == 3).all()  # ceil(4.5 / 2) > max_reps


def test_radius_graph_pbc_fixed_nonpbc_limit(rng):
    pos = rng.normal(size=(7, 3)) * 2.0
    ei_h, _ = radius_graph_np(pos, 3.0)
    ei_d, mask, offs_d, n_found, needed = radius_graph_pbc_fixed(
        pos.astype(np.float32), np.eye(3, dtype=np.float32),
        np.zeros(3, bool), 3.0, 128, max_reps=1,
    )
    ei_d = np.asarray(ei_d)[:, np.asarray(mask)]
    assert int(n_found) == ei_h.shape[1]
    assert _edge_set(ei_d, np.zeros((ei_d.shape[1], 3))) == _edge_set(
        ei_h, np.zeros((ei_h.shape[1], 3))
    )


# ---------------------------------------------------------------------------
# Analytic Hessian (VERDICT item 3)
# ---------------------------------------------------------------------------
def test_analytic_hessian_matches_numerical(mini_ckpt, rng):
    from xequinet_tpu.interface.calculator import Calculator
    from xequinet_tpu.run.dynamics import ForceField
    from xequinet_tpu.run.geometry import analytic_hessian, numerical_hessian

    calc = Calculator(mini_ckpt)
    z = rng.integers(1, 5, 5).astype(np.int32)
    pos = rng.normal(size=(5, 3)) * 1.5
    ff = ForceField(calc, z)
    H_a = analytic_hessian(ff, pos)
    H_n = numerical_hessian(ff, pos, eps=1e-3)
    assert H_a.shape == (15, 15)
    np.testing.assert_allclose(H_a, H_a.T, atol=1e-8)
    np.testing.assert_allclose(H_a, H_n, atol=5e-3, rtol=1e-2)


def test_analytic_hessian_rejects_delta(mini_ckpt, rng):
    from xequinet_tpu.interface.calculator import Calculator
    from xequinet_tpu.run.dynamics import ForceField
    from xequinet_tpu.run.geometry import analytic_hessian

    ff = ForceField(Calculator(mini_ckpt), np.array([1, 1]))
    ff.extra_calcs.append(lambda p: (0.0, np.zeros_like(p)))
    with pytest.raises(ValueError):
        analytic_hessian(ff, np.zeros((2, 3)))


# ---------------------------------------------------------------------------
# Constrained optimization + shermo (VERDICT item 4)
# ---------------------------------------------------------------------------
def test_parse_constraints(tmp_path):
    from xequinet_tpu.run.geometry import parse_constraints

    f = tmp_path / "cons.txt"
    f.write_text("# freeze the first two and the 5th atom\n"
                 "$freeze\nxyz 1-2, 5\n")
    frozen = parse_constraints(str(f), 6)
    assert frozen.tolist() == [True, True, False, False, True, False]

    f2 = tmp_path / "bad.txt"
    f2.write_text("$freeze\ndistance 1 2\n")
    with pytest.raises(NotImplementedError):
        parse_constraints(str(f2), 6)


def test_opt_with_constraints_and_shermo(mini_ckpt, tmp_path, rng):
    from xequinet_tpu.run.geometry import run_opt

    z = rng.integers(1, 5, 4).astype(np.int32)
    pos = rng.normal(size=(4, 3)) * 1.5
    xyz = tmp_path / "c.xyz"
    write_xyz(xyz, [Datapoint(z, pos)])
    cons = tmp_path / "cons.txt"
    cons.write_text("$freeze\natoms 1,2\n")
    results = run_opt(
        mini_ckpt, str(xyz), max_steps=8, fmax=10.0, freq=True,
        constraints=str(cons), shermo=True, save_hessian=True,
    )
    # frozen atoms did not move
    np.testing.assert_allclose(results[0]["positions"][:2], pos[:2], atol=1e-10)
    stem = str(xyz).rsplit(".", 1)[0]
    shm = stem + "_freq.shm"
    assert os.path.exists(shm)
    text = open(shm).read()
    assert "*E" in text and "*wavenum" in text and "*atoms" in text
    assert "*elevel" in text
    # one coordinate line per atom
    atoms_block = text.split("*atoms\n")[1].split("*elevel")[0]
    assert len(atoms_block.strip().splitlines()) == 4
    assert os.path.exists(stem + "_h.txt")
    H = np.loadtxt(stem + "_h.txt")
    assert H.shape == (12, 12)


def test_opt_no_opt_mode(mini_ckpt, tmp_path, rng):
    from xequinet_tpu.run.geometry import run_opt

    z = rng.integers(1, 5, 3).astype(np.int32)
    pos = rng.normal(size=(3, 3)) * 1.5
    xyz = tmp_path / "n.xyz"
    write_xyz(xyz, [Datapoint(z, pos)])
    results = run_opt(mini_ckpt, str(xyz), no_opt=True, freq=True)
    np.testing.assert_allclose(results[0]["positions"], pos, atol=1e-6)
    assert "frequencies_cm1" in results[0]


# ---------------------------------------------------------------------------
# NPT live-cell trajectory + anisotropic NPT (VERDICT item 5)
# ---------------------------------------------------------------------------
def _pbc_md_config(ckpt, tmp_path, rng, ensembles):
    from xequinet_tpu.utils.config import MDConfig

    cell = np.diag([7.0, 7.0, 7.0])
    pos = rng.uniform(1.0, 6.0, size=(6, 3))
    z = rng.integers(1, 5, 6).astype(np.int32)
    dp = Datapoint(z, pos, cell=cell, pbc=np.ones(3, bool))
    xyz = tmp_path / "npt_in.xyz"
    write_xyz(xyz, [dp])
    return MDConfig(
        ensembles=ensembles,
        input_file=str(xyz),
        model_file=ckpt,
        logfile=str(tmp_path / "npt.log"),
        xyz_traj=str(tmp_path / "npt_traj.xyz"),
        seed=3,
        init_temperature=50.0,
    ), cell


def test_npt_trajectory_writes_live_cell(mini_ckpt, tmp_path, rng):
    from xequinet_tpu.run.dynamics import run_md

    cfg, cell0 = _pbc_md_config(
        mini_ckpt, tmp_path, rng,
        [{"name": "nptberendsen", "timestep": 0.5, "steps": 10,
          "temperature": 50.0, "pressure_gpa": 20.0, "taup_fs": 50.0,
          "log_interval": 5}],
    )
    run_md(cfg)
    frames = read_xyz(cfg.xyz_traj)
    assert len(frames) >= 2
    # compressive target pressure: the written cell must SHRINK over the
    # trajectory (the round-1 bug froze the initial cell into every frame)
    v0 = abs(np.linalg.det(frames[0].cell))
    v_last = abs(np.linalg.det(frames[-1].cell))
    assert v_last < v0 < abs(np.linalg.det(cell0)) * 1.0001
    # isotropic: cell stays diagonal-proportional
    d_last = np.diag(frames[-1].cell)
    d0 = np.diag(cell0)
    np.testing.assert_allclose(d_last[0] / d0[0], d_last[1] / d0[1], rtol=1e-6)


def test_npt_neighbor_list_tracks_compression(mini_ckpt, rng):
    """Under 20% linear compression the Calculator's per-call neighbor
    rebuild must keep matching the host brute-force builder."""
    from xequinet_tpu.interface.calculator import Calculator

    calc = Calculator(mini_ckpt, compute_virial=True)
    cell = np.diag([7.0, 7.0, 7.0])
    pos = rng.uniform(0, 1, size=(6, 3)) @ cell
    z = rng.integers(1, 5, 6).astype(np.int32)
    counts = []
    for scale in (1.0, 0.9, 0.8):
        res = calc.calculate(z, pos * scale, cell=cell * scale,
                             pbc=np.ones(3, bool))
        assert np.isfinite(res[keys.TOTAL_ENERGY])
        ei, _ = radius_graph_pbc_np(pos * scale, cell * scale,
                                    np.ones(3, bool), calc.cutoff)
        counts.append(ei.shape[1])
    # compression strictly increases neighbor counts for this cutoff
    assert counts[2] > counts[0]


def test_npt_aniso_runs(mini_ckpt, tmp_path, rng):
    from xequinet_tpu.run.dynamics import run_md

    cfg, cell0 = _pbc_md_config(
        mini_ckpt, tmp_path, rng,
        [{"name": "npt-aniso", "timestep": 0.5, "steps": 6,
          "temperature": 50.0, "pressure_gpa": 10.0, "taup_fs": 50.0,
          "log_interval": 3}],
    )
    state = run_md(cfg)
    assert np.isfinite(state.pos).all()
    frames = read_xyz(cfg.xyz_traj)
    assert abs(np.linalg.det(frames[-1].cell)) < abs(np.linalg.det(cell0))


def test_md_fire_stage(mini_ckpt, tmp_path, rng):
    """Optimizer stage in an MD chain (reference lets any ase.optimize
    class be a stage)."""
    from xequinet_tpu.run.dynamics import run_md
    from xequinet_tpu.utils.config import MDConfig

    z = rng.integers(1, 5, 4).astype(np.int32)
    pos = rng.normal(size=(4, 3)) * 1.5
    xyz = tmp_path / "f.xyz"
    write_xyz(xyz, [Datapoint(z, pos)])
    cfg = MDConfig(
        ensembles=[
            {"name": "fire", "timestep": 0.5, "steps": 15, "fmax": 50.0,
             "log_interval": 50},
            {"name": "nve", "timestep": 0.5, "steps": 3, "log_interval": 3},
        ],
        input_file=str(xyz), model_file=mini_ckpt,
        logfile=str(tmp_path / "f.log"), seed=1,
    )
    state = run_md(cfg)
    assert np.isfinite(state.pos).all()


# ---------------------------------------------------------------------------
# Self-contained (in-graph NL) + periodic + charged exports (VERDICT item 6)
# ---------------------------------------------------------------------------
def test_export_gmx_selfcontained(mini_ckpt, tmp_path, rng):
    """GMX-analogue export builds its neighbor list in-graph; outputs must
    match the Calculator on the same periodic structure."""
    import jax.numpy as jnp

    from xequinet_tpu.interface.calculator import Calculator
    from xequinet_tpu.interface.export import export_model, load_exported
    from xequinet_tpu.utils.qc import unit_conversion

    out = export_model(mini_ckpt, str(tmp_path / "gmx"), max_atoms=8,
                       max_edges=1024, output_mode="gmx", max_reps=1)
    exported, manifest = load_exported(out)
    assert manifest["output_mode"] == "gmx"
    assert manifest["periodic"] is True
    # manifest cutoff is in deployment units: nm
    assert np.isclose(manifest[keys.CUTOFF_RADIUS], 0.5)

    cell = np.diag([6.0, 6.5, 7.0])
    pos = rng.uniform(0, 1, size=(6, 3)) @ cell
    z6 = rng.integers(1, 5, 6).astype(np.int32)
    pos_pad = np.zeros((8, 3), np.float32)
    pos_pad[:6] = pos * 0.1  # Angstrom -> nm
    z = np.zeros(8, np.int32)
    z[:6] = z6
    e_kj, f_kj, n_found, needed = exported.call(
        jnp.asarray(pos_pad), jnp.asarray(z),
        jnp.asarray((cell * 0.1).astype(np.float32)),
        jnp.ones(3, bool), jnp.zeros(1, jnp.int32),
    )
    assert int(n_found) <= 1024
    assert int(np.asarray(needed).max()) <= manifest["max_reps"]

    calc = Calculator(mini_ckpt)
    ref = calc.calculate(z6, pos, cell=cell, pbc=np.ones(3, bool))
    e_conv = unit_conversion("eV", "kJ/mol")
    np.testing.assert_allclose(float(e_kj), ref[keys.TOTAL_ENERGY] * e_conv,
                               rtol=1e-4)
    # eV/Angstrom -> kJ/mol/nm multiplies by 10 (per-nm force is larger)
    np.testing.assert_allclose(np.asarray(f_kj)[:6],
                               ref[keys.FORCES] * e_conv * 10.0,
                               rtol=1e-3, atol=1e-2)


def test_export_periodic_energy_mode(mini_ckpt, tmp_path, rng):
    """energy-mode export with cell + cell_offsets inputs matches the
    Calculator on a periodic structure."""
    import jax.numpy as jnp

    from xequinet_tpu.interface.calculator import Calculator
    from xequinet_tpu.interface.export import export_model, load_exported

    out = export_model(mini_ckpt, str(tmp_path / "pbc"), max_atoms=8,
                       max_edges=1024, periodic=True, compute_virial=True)
    exported, manifest = load_exported(out)
    assert manifest["periodic"] is True

    cell = np.diag([6.0, 6.5, 7.0])
    pos = rng.uniform(0, 1, size=(6, 3)) @ cell
    z6 = rng.integers(1, 5, 6).astype(np.int32)
    calc = Calculator(mini_ckpt, compute_virial=True)
    ei, offs = radius_graph_pbc_np(pos, cell, np.ones(3, bool), calc.cutoff)
    ne = ei.shape[1]
    assert ne <= 1024
    pos_pad = np.zeros((8, 3), np.float32); pos_pad[:6] = pos
    z = np.zeros(8, np.int32); z[:6] = z6
    ei_pad = np.zeros((2, 1024), np.int32); ei_pad[:, :ne] = ei
    offs_pad = np.zeros((1024, 3), np.float32); offs_pad[:ne] = offs
    mask = np.arange(1024) < ne
    e, f, v = exported.call(
        jnp.asarray(pos_pad), jnp.asarray(z), jnp.asarray(ei_pad),
        jnp.asarray(mask), jnp.asarray(offs_pad),
        jnp.asarray(cell.astype(np.float32)), jnp.zeros(1, jnp.int32),
    )
    ref = calc.calculate(z6, pos, cell=cell, pbc=np.ones(3, bool))
    np.testing.assert_allclose(float(e), ref[keys.TOTAL_ENERGY], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(f)[:6], ref[keys.FORCES],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v), ref[keys.VIRIAL],
                               rtol=1e-3, atol=1e-4)


def test_export_charge_wired(tmp_path, rng):
    """total_charge input must reach the charge head: exported atomic
    charges conserve to the REQUESTED net charge (ADVICE round-1 high)."""
    import jax.numpy as jnp

    from xequinet_tpu.interface.export import export_model, load_exported

    kw = dict(node_dim=16, node_irreps="16x0e+8x1o+4x2e",
              embed_basis="one-hot", num_basis=8, cutoff=5.0,
              action_blocks=1, output_modes=["energy", "charges", "dipole"])
    module, extra, _ = resolve_model("xpainn", **kw)
    z = rng.integers(1, 5, 5).astype(np.int32)
    pos = rng.normal(size=(5, 3)) * 1.5
    ei, _ = radius_graph_np(pos, 5.0)
    params = init_params(module, collate([Datapoint(z, pos, edge_index=ei)]))
    ckpt = str(tmp_path / "q.ckpt")
    save_checkpoint(ckpt, params,
                    config_to_dict(ModelConfig(model_name="xpainn",
                                               model_kwargs=kw)))

    out = export_model(ckpt, str(tmp_path / "qe"), max_atoms=8,
                       max_edges=128, output_mode="dipole")
    exported, _ = load_exported(out)
    pos_pad = np.zeros((8, 3), np.float32); pos_pad[:5] = pos
    zp = np.zeros(8, np.int32); zp[:5] = z
    ne = ei.shape[1]
    ei_pad = np.zeros((2, 128), np.int32); ei_pad[:, :ne] = ei
    mask = np.arange(128) < ne
    args = (jnp.asarray(pos_pad), jnp.asarray(zp), jnp.asarray(ei_pad),
            jnp.asarray(mask))
    q0, _ = exported.call(*args, jnp.asarray([0], jnp.int32))
    q1, _ = exported.call(*args, jnp.asarray([1], jnp.int32))
    np.testing.assert_allclose(np.asarray(q0)[:5].sum(), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(q1)[:5].sum(), 1.0, atol=1e-4)

    # net_charge bakes the constant: input is ignored
    out2 = export_model(ckpt, str(tmp_path / "qb"), max_atoms=8,
                        max_edges=128, output_mode="dipole", net_charge=-1)
    exported2, m2 = load_exported(out2)
    assert m2["net_charge"] == -1
    qa, _ = exported2.call(*args, jnp.asarray([0], jnp.int32))
    qb, _ = exported2.call(*args, jnp.asarray([7], jnp.int32))
    np.testing.assert_allclose(np.asarray(qa)[:5].sum(), -1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(qa), np.asarray(qb), atol=1e-6)


# ---------------------------------------------------------------------------
# Preemption / resume fixes (ADVICE round-1)
# ---------------------------------------------------------------------------
def test_resume_restores_stopper(tmp_path, rng):
    from xequinet_tpu.training.trainer import EarlyStopping, MultiEarlyStopping

    es = EarlyStopping(patience=5)
    for m in (1.0, 0.9, 0.95, 0.97):
        es.step(m)
    blob_stoppings = {"energy": vars(es)}
    fresh = MultiEarlyStopping({"energy": {"patience": 5}}, "and")
    # simulate Trainer._resume rehydration
    for prop, st in blob_stoppings.items():
        tgt = fresh.stoppings[prop]
        tgt.best = st.get("best", tgt.best)
        tgt.num_bad = st.get("num_bad", tgt.num_bad)
    assert fresh.stoppings["energy"].best == 0.9
    assert fresh.stoppings["energy"].num_bad == 2


def test_read_structures_and_opt_params(mini_ckpt, tmp_path, rng):
    """`--format` reads via the built-in extxyz path (ASE formats delegate
    to ase.io when installed) and `--opt-params` JSON reaches scipy
    L-BFGS-B (reference main.py --format / --opt-params)."""
    import json

    from xequinet_tpu.data.fmt_conversion import read_structures, write_xyz
    from xequinet_tpu.run.geometry import run_opt

    z = np.array([1, 8, 1], dtype=np.int32)
    pos = np.array([[0.0, 0.76, -0.48], [0.0, 0.0, 0.1],
                    [0.0, -0.76, -0.48]])
    xyz = tmp_path / "w.xyz"
    write_xyz(str(xyz), [Datapoint(z, pos)])

    dps = read_structures(str(xyz))  # extension-based
    assert len(dps) == 1 and dps[0].num_atoms == 3
    dps = read_structures(str(xyz), "extxyz")  # explicit built-in format
    assert len(dps) == 1
    with pytest.raises(Exception):  # ASE formats need ase installed
        read_structures(str(xyz), "vasp")

    params_file = tmp_path / "optp.json"
    params_file.write_text(json.dumps({"maxls": 5}))
    res = run_opt(
        mini_ckpt, str(xyz), max_steps=3, input_format="xyz",
        opt_params=str(params_file),
    )
    assert len(res) == 1 and np.isfinite(res[0]["energy"])


def test_calculator_grows_edge_capacity_on_dense_system(mini_ckpt, rng):
    """A cluster denser than the default 40-edges/atom bucket must NOT be
    silently truncated: the default-capacity Calculator grows the bucket
    (recompile) and must agree exactly with one sized generously up
    front; a user-pinned max_edges refuses instead."""
    from xequinet_tpu.interface.calculator import Calculator
    from xequinet_tpu.ops.radius_graph import radius_graph_np

    n = 70
    pos = rng.normal(size=(n, 3)) * 1.2  # ~all-pairs within cutoff 5
    z = rng.integers(1, 5, n).astype(np.int32)
    ne = radius_graph_np(pos, 5.0)[0].shape[1]
    assert ne > n * 40  # the scenario: denser than the default bucket

    res = Calculator(mini_ckpt).calculate(z, pos)
    ref = Calculator(mini_ckpt, max_edges=8192).calculate(z, pos)
    np.testing.assert_allclose(res[keys.TOTAL_ENERGY],
                               ref[keys.TOTAL_ENERGY], rtol=1e-6)
    np.testing.assert_allclose(res[keys.FORCES], ref[keys.FORCES],
                               rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match="edge overflow"):
        Calculator(mini_ckpt, max_edges=1024).calculate(z, pos)
