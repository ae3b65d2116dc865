"""bf16 phase-2 accuracy study (VERDICT round-1 item 8).

Trains the same XPaiNN configuration twice on the synthetic many-body
PES dataset (tools/make_synthetic_dataset.py) through the production
`run_train` driver — once f32, once with the bf16 message pipeline +
bf16 update blocks — then evaluates energy/force MAE on the held-out
test split with the production `run_test` driver.  Results go into
PERF.md's accuracy table.

Usage:
    python tools/make_synthetic_dataset.py /tmp/synth_ds3k --n 3000
    python tools/bf16_accuracy_study.py /tmp/synth_ds3k [--epochs 60]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from xequinet_tpu import keys  # noqa: E402
from xequinet_tpu.utils.config import XequiConfig  # noqa: E402


def make_config(db_path: str, save_dir: str, dtype_mode: str,
                epochs: int, tiny: bool = False) -> XequiConfig:
    cfg = XequiConfig()
    cfg.model.model_name = "xpainn"
    cfg.model.model_kwargs = dict(
        node_dim=16 if tiny else 64,
        node_irreps="16x0e+8x1o" if tiny else "64x0e+32x1o+16x2e",
        embed_basis="one-hot",
        num_basis=8 if tiny else 16,
        action_blocks=1 if tiny else 3,
        output_modes=["energy"],
        remat=False,
    )
    if dtype_mode == "bf16msg":
        # bf16 message pipeline only; update blocks (the deep residual
        # chain where rounding accumulates) stay f32
        cfg.model.model_kwargs.update(compute_dtype="bfloat16")
    elif dtype_mode.startswith("bf16"):
        cfg.model.model_kwargs.update(
            compute_dtype="bfloat16", update_compute_dtype="bfloat16"
        )
    if dtype_mode == "bf16_f32ft":
        # bf16 mitigation (VERDICT r2 item 6): spend the last 20% of the
        # budget in f32 — the trainer re-jits with f32 compute dtypes and
        # embeds f32 in the checkpoint (trainer.f32_finetune_epochs)
        cfg.trainer.f32_finetune_epochs = max(1, epochs // 5)
    cfg.data.db_path = db_path
    cfg.data.cutoff = 5.0
    cfg.data.targets = [keys.TOTAL_ENERGY, keys.FORCES]
    cfg.data.batch_size = 64
    cfg.data.valid_batch_size = 128
    cfg.data.node_shift = True  # per-element energy shift from train stats
    cfg.trainer.run_name = f"bf16study-{dtype_mode}"
    cfg.trainer.save_dir = save_dir
    cfg.trainer.max_epochs = epochs
    cfg.trainer.warmup_epochs = 3
    cfg.trainer.max_lr = 1e-3
    cfg.trainer.lossfn = "l2"
    cfg.trainer.losses_weight = {keys.TOTAL_ENERGY: 1.0, keys.FORCES: 25.0}
    cfg.trainer.ema_decay = 0.995
    cfg.trainer.seed = 42
    cfg.trainer.log_epochs = 5
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("db_path")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--out", default="/tmp/bf16_study")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--modes", default="f32,bf16",
                    help="comma list of f32 / bf16 / bf16_f32ft")
    args = ap.parse_args()

    from xequinet_tpu.run.test import run_test
    from xequinet_tpu.run.train import run_train

    results = {}
    for mode in args.modes.split(","):
        save_dir = str(Path(args.out) / mode)
        Path(save_dir).mkdir(parents=True, exist_ok=True)
        cfg = make_config(args.db_path, save_dir, mode, args.epochs, tiny=args.tiny)
        print(f"=== training {mode} ===", flush=True)
        run_train(cfg)
        ckpt = str(Path(save_dir) / f"{cfg.trainer.run_name}_last.ckpt")
        metrics = run_test(cfg, ckpt_file=ckpt, use_ema=True)
        results[mode] = metrics
        print(mode, json.dumps(metrics, default=float), flush=True)

    print("\n=== summary (test split) ===")
    for mode, m in results.items():
        print(mode, json.dumps(m, default=float))
    out = Path(args.out) / "results.json"
    out.write_text(json.dumps(results, default=float, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
