"""Converged-accuracy + NVE energy-conservation demonstration
(VERDICT round-3 item 2).

Trains XPaiNN on the synthetic many-body PES (exact analytic force
labels, tools/make_synthetic_dataset.py) through the production
`run_train` driver to a fixed >=300-epoch budget, records the
validation force-MAE curve, evaluates the held-out test split with
`run_test`, then runs `run_md` NVE from the trained checkpoint and
measures total-energy drift — the canonical end-to-end validation of a
force-field stack (reference users get it implicitly via the published
JCTC model, /root/reference/README.md:43-57).

Usage:
    python tools/make_synthetic_dataset.py /tmp/synth_ds3k --n 3000
    python tools/convergence_study.py /tmp/synth_ds3k [--epochs 300]

Writes <out>/convergence.json: the MAE curve, final test metrics, and
the NVE drift in meV/atom/ps.  Exits non-zero if the drift exceeds
--drift-bound (default 1 meV/atom/ps).
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from xequinet_tpu import keys  # noqa: E402
from xequinet_tpu.utils.config import MDConfig, XequiConfig  # noqa: E402


def make_config(db_path: str, save_dir: str, epochs: int,
                node_dim: int = 64, irreps: str = None,
                num_basis: int = 16, compute_dtype: str = "float32",
                f32_finetune_epochs: int = 0, mega: bool = False,
                batch_size: int = 64,
                run_name: str = "converge") -> XequiConfig:
    cfg = XequiConfig()
    cfg.model.model_name = "xpainn"
    cfg.model.model_kwargs = dict(
        node_dim=node_dim,
        node_irreps=irreps or (
            f"{node_dim}x0e+{node_dim // 2}x1o+{node_dim // 4}x2e"
        ),
        embed_basis="one-hot",
        num_basis=num_basis,
        action_blocks=3,
        output_modes=["energy"],
        remat=False,
        compute_dtype=compute_dtype,
        update_compute_dtype=compute_dtype,
    )
    if mega:
        cfg.model.model_kwargs["use_pallas_scatter"] = "mega"
        cfg.model.model_kwargs["pallas_layout"] = (512, 512, 32, 64)
    cfg.data.db_path = db_path
    cfg.data.cutoff = 5.0
    cfg.data.targets = [keys.TOTAL_ENERGY, keys.FORCES]
    cfg.data.batch_size = batch_size
    cfg.data.valid_batch_size = 2 * batch_size
    cfg.data.node_shift = True
    cfg.trainer.run_name = run_name
    cfg.trainer.save_dir = save_dir
    cfg.trainer.max_epochs = epochs
    cfg.trainer.warmup_epochs = 5
    cfg.trainer.max_lr = 1e-3
    cfg.trainer.lossfn = "l2"
    cfg.trainer.losses_weight = {keys.TOTAL_ENERGY: 1.0, keys.FORCES: 25.0}
    cfg.trainer.ema_decay = 0.999
    cfg.trainer.seed = 42
    cfg.trainer.log_epochs = 1
    cfg.trainer.best_k = 3
    cfg.trainer.f32_finetune_epochs = f32_finetune_epochs
    return cfg


def parse_curve(logfile: Path):
    """Validation force-MAE per epoch from the trainer log: the metric
    table row 'forces  <MAE>  <RMSE>  <count>' precedes the
    '== epoch N done' line."""
    curve = []
    done_re = re.compile(r"== epoch\s+(\d+)\s+done")
    pending = None
    for line in logfile.read_text().splitlines():
        if re.search(r"\bforces\b", line):
            nums = re.findall(r"(\d+\.\d+(?:e[+-]?\d+)?)", line)
            if nums:
                pending = float(nums[0])
        m = done_re.search(line)
        if m and pending is not None:
            curve.append((int(m.group(1)), pending))
            pending = None
    return curve


def nve_drift(ckpt: str, out_dir: Path, steps: int, timestep_fs: float,
              temperature: float, rng: np.random.Generator):
    """NVE total-energy drift (meV/atom/ps) of a cluster on the trained
    model, through the production run_md driver."""
    from tools.make_synthetic_dataset import sample_structure

    from xequinet_tpu.data.fmt_conversion import write_xyz
    from xequinet_tpu.run.dynamics import (
        FS_PER_TIME_UNIT, ForceField, MDState, VelocityVerlet,
        maxwell_boltzmann,
    )
    from xequinet_tpu.interface.calculator import Calculator
    from xequinet_tpu.utils.qc import ATOM_MASS

    from xequinet_tpu.run.dynamics import FIREStage, Langevin

    dp = sample_structure(rng, n_atoms=24)
    # exact-f32 MXU dots: the TPU default (single-pass bf16) adds ~1e-3
    # relative force noise, which is NON-conservative and shows up
    # directly as NVE drift (measured: 80 meV/atom/ps at default
    # precision vs the f32 figure reported in PERF.md)
    calc = Calculator(ckpt, use_ema=True, matmul_precision="float32")
    ff = ForceField(calc, dp.atomic_numbers)
    masses = ATOM_MASS[dp.atomic_numbers]

    # standard protocol: relax on the MODEL PES (the generator's crude
    # true-PES descent leaves several eV of strain — MB init on top of
    # that instantly boils the cluster into the model's extrapolation
    # region), then thermalize with Langevin, THEN measure NVE
    state = MDState(dp.pos.copy(), np.zeros_like(dp.pos), masses)
    fire = FIREStage(ff, timestep_fs, fmax=0.05)
    for _ in range(800):
        state = fire.step(state, rng)
        if fire.converged:
            break
    state = MDState(state.pos, maxwell_boltzmann(masses, temperature, rng),
                    masses)
    lang = Langevin(ff, timestep_fs, temperature, friction_fs=0.02)
    for _ in range(600):
        state = lang.step(state, rng)
    state = MDState(state.pos, state.vel, masses)
    integ = VelocityVerlet(ff, timestep_fs)
    e0_pot, _ = ff(state.pos)
    e0 = e0_pot + state.kinetic_energy()
    etot = []
    for i in range(steps):
        state = integ.step(state, rng)
        if (i + 1) % 20 == 0:
            e_pot, _ = ff(state.pos)
            etot.append(e_pot + state.kinetic_energy())
    etot = np.asarray(etot)
    t_ps = (np.arange(1, len(etot) + 1) * 20 * timestep_fs) / 1000.0
    # linear drift fit (robust to bounded oscillation)
    slope = np.polyfit(t_ps, etot - e0, 1)[0]  # eV/ps
    n_atoms = len(dp.atomic_numbers)
    return {
        "n_atoms": n_atoms,
        "steps": steps,
        "timestep_fs": timestep_fs,
        "t_ps": float(t_ps[-1]),
        "max_abs_dev_meV_per_atom": float(
            np.abs(etot - e0).max() / n_atoms * 1e3
        ),
        "drift_meV_per_atom_per_ps": float(abs(slope) / n_atoms * 1e3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("db_path")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--out", default="/tmp/converge_study")
    ap.add_argument("--md-steps", type=int, default=4000)
    ap.add_argument("--timestep", type=float, default=0.5)
    ap.add_argument("--temperature", type=float, default=300.0)
    ap.add_argument("--drift-bound", type=float, default=1.0,
                    help="meV/atom/ps")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--node-dim", type=int, default=64)
    ap.add_argument("--irreps", default=None)
    ap.add_argument("--num-basis", type=int, default=16)
    ap.add_argument("--compute-dtype", default="float32")
    ap.add_argument("--f32-finetune-epochs", type=int, default=0)
    ap.add_argument("--mega", action="store_true")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--run-name", default="converge")
    ap.add_argument("--skip-md", action="store_true")
    args = ap.parse_args()

    from xequinet_tpu.run.test import run_test
    from xequinet_tpu.run.train import run_train

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    cfg = make_config(
        args.db_path, str(out), args.epochs,
        node_dim=args.node_dim, irreps=args.irreps,
        num_basis=args.num_basis, compute_dtype=args.compute_dtype,
        f32_finetune_epochs=args.f32_finetune_epochs, mega=args.mega,
        batch_size=args.batch_size, run_name=args.run_name,
    )
    ckpt = str(out / f"{args.run_name}_last.ckpt")
    if not args.skip_train:
        print(f"=== training {args.epochs} epochs ===", flush=True)
        run_train(cfg)
    metrics = run_test(cfg, ckpt_file=ckpt, use_ema=True)
    print("test metrics:", json.dumps(metrics, default=float), flush=True)

    curve = parse_curve(out / cfg.trainer.log_file)
    drift = None
    if not args.skip_md:
        rng = np.random.default_rng(7)
        drift = nve_drift(ckpt, out, args.md_steps, args.timestep,
                          args.temperature, rng)
        print("NVE:", json.dumps(drift), flush=True)

    report = {"epochs": args.epochs, "run_name": args.run_name,
              "model": dict(cfg.model.model_kwargs), "test": metrics,
              "valid_force_mae_curve": curve[-50:], "nve": drift}
    (out / "convergence.json").write_text(
        json.dumps(report, default=float, indent=1)
    )
    if drift is None:
        return 0
    if drift["drift_meV_per_atom_per_ps"] > args.drift_bound:
        print(f"FAIL: NVE drift {drift['drift_meV_per_atom_per_ps']:.3f} "
              f"> bound {args.drift_bound}")
        return 1
    print("NVE drift within bound")
    return 0


if __name__ == "__main__":
    sys.exit(main())
