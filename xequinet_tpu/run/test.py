"""`xeq test`: evaluate a checkpoint on the test split.

TPU-native counterpart of /root/reference/xequinet/run/test.py (minus its
fancy-index verbose-writer bugs, SURVEY.md §2.1).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import keys
from ..data.dataset import DataLoader
from ..models.model import init_params, make_apply_forward, resolve_model
from ..training.loss import ErrorMetric, MetricAccumulator
from ..training.trainer import load_checkpoint, restore_params
from ..utils.config import XequiConfig, load_config
from ..utils.logger import ZeroLogger
from ..utils.qc import set_default_units
from .train import build_datasets


def load_model_from_checkpoint(ckpt_file: str, use_ema: bool = True):
    """Rebuild model + params from the embedded config
    (the reference's load_model contract, nn/model.py:321-351)."""
    blob = load_checkpoint(ckpt_file)
    model_config = blob["config"]
    if model_config.get("default_units"):
        set_default_units(model_config["default_units"])
    module, extra, cutoff = resolve_model(
        model_config["model_name"], **model_config["model_kwargs"]
    )
    return module, extra, cutoff, blob, model_config


def run_test(
    config: XequiConfig,
    ckpt_file: str,
    use_ema: bool = True,
    verbose: bool = False,
    results_file: Optional[str] = None,
    logger=None,
) -> dict:
    logger = logger or ZeroLogger()
    module, extra, _cutoff, blob, _mc = load_model_from_checkpoint(ckpt_file)
    config.model.model_name = _mc["model_name"]
    config.model.model_kwargs = _mc["model_kwargs"]

    _train, _valid, test_set = build_datasets(config)
    # checkpoints trained with the mega kernels need the slot layout in
    # every batch (fixed slot capacity -> one compiled program)
    from ..data.batching import kernel_layout_from_model_kwargs

    kernel_layout = kernel_layout_from_model_kwargs(_mc["model_kwargs"])
    loader = DataLoader(
        test_set, config.data.valid_batch_size, kernel_layout=kernel_layout
    )
    sample = next(iter(loader))
    params = init_params(module, sample)
    key = "ema_model" if (use_ema and "ema_model" in blob) else "model"
    params = restore_params(params, blob[key])
    apply_forward = make_apply_forward(module, extra)

    targets = list(config.data.targets)
    compute_forces = keys.FORCES in targets
    compute_virial = keys.VIRIAL in targets or keys.STRESS in targets
    metric = ErrorMetric(*targets)

    @jax.jit
    def eval_step(p, batch):
        out = apply_forward(p, batch, compute_forces, compute_virial)
        return metric(out, batch)

    acc = MetricAccumulator()
    dump = [] if (verbose or results_file) else None
    # hoisted: a fresh jax.jit wrapper per batch would retrace/recompile
    # the forward for EVERY batch of the verbose dump
    fwd_step = jax.jit(
        lambda p, b: {
            k: v
            for k, v in apply_forward(
                p, b, compute_forces, compute_virial
            ).items()
            if k in keys.OUTPUT_PROPERTIES
        }
    )
    for raw in loader:
        batch = {k: jnp.asarray(v) for k, v in raw.items()}
        acc.update(jax.device_get(eval_step(params, batch)))
        if dump is not None:
            # per-structure predictions (reference run/test.py verbose dump,
            # minus its fancy-index bugs)
            out = jax.device_get(fwd_step(params, batch))
            gm = np.asarray(raw[keys.GRAPH_MASK])
            ptr = np.asarray(raw[keys.BATCH_PTR])
            for g in range(int(gm.sum())):
                entry = {}
                if keys.TOTAL_ENERGY in out:
                    entry[keys.TOTAL_ENERGY] = float(
                        np.asarray(out[keys.TOTAL_ENERGY])[g]
                    )
                    entry["target_" + keys.TOTAL_ENERGY] = float(
                        np.asarray(raw[keys.TOTAL_ENERGY])[g]
                    )
                if keys.FORCES in out:
                    entry[keys.FORCES] = np.asarray(out[keys.FORCES])[
                        ptr[g] : ptr[g + 1]
                    ]
                dump.append(entry)
                if verbose:
                    logger.info(
                        f"structure {len(dump) - 1}: "
                        + " ".join(f"{k}={v}" for k, v in entry.items()
                                   if np.isscalar(v))
                    )
    results = acc.compute()
    if results_file and dump is not None:
        import pickle

        with open(results_file, "wb") as f:
            pickle.dump(dump, f)
        logger.info(f"per-structure results written to {results_file}")

    from tabulate import tabulate

    rows = [
        [prop, f"{r['mae']:.6f}", f"{r['rmse']:.6f}", r["count"]]
        for prop, r in sorted(results.items())
    ]
    logger.info(
        "test results\n"
        + tabulate(rows, headers=["property", "MAE", "RMSE", "count"], tablefmt="plain")
    )
    return results


def run_test_from_args(args) -> None:
    config = load_config(args.config)
    run_test(
        config,
        args.ckpt,
        use_ema=not getattr(args, "no_ema", False),
        verbose=getattr(args, "verbose", False),
        results_file=getattr(args, "results", None),
    )
