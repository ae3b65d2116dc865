"""`xeq train`: the end-to-end training driver.

TPU-native counterpart of /root/reference/xequinet/run/train.py: config ->
units -> dataset+transforms -> stats -> model -> Trainer.  Data parallelism
uses all local devices via the mesh helpers (replacing torchrun/DDP,
SURVEY.md §2.3); single-device runs skip the mesh entirely.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import keys
from ..data.dataset import DataLoader, calculate_stats, compute_capacities
from ..data.store import XDBDataset
from ..data.transforms import build_transform_pipeline
from ..models.model import init_params, make_apply_forward, resolve_model
from ..training.trainer import Trainer
from ..utils.config import XequiConfig, load_config
from ..utils.logger import ZeroLogger
from ..utils.qc import set_default_units


def build_datasets(config: XequiConfig):
    dc = config.data
    # dataset units from info.json are converted to the model units
    probe = XDBDataset(dc.db_path, split="train", split_name=dc.split)
    transform = build_transform_pipeline(
        data_units=probe.units,
        base_targets=dc.base_targets,
        svd_frame=bool(
            config.model.model_kwargs.get("use_pbc") is False
            and config.model.model_name.endswith("ewald")
        ),
        vector_targets=[keys.DIPOLE] if keys.DIPOLE in dc.targets else [],
        atomic_vector_targets=[keys.FORCES] if keys.FORCES in dc.targets else [],
        cutoff=dc.cutoff,
    )
    mk = lambda split: XDBDataset(
        dc.db_path,
        split=split,
        split_name=dc.split,
        transform=transform,
        max_num_samples=dc.max_num_samples,
    )
    return mk("train"), mk("valid"), mk("test")


def run_train(config: XequiConfig, logger=None) -> Trainer:
    tc, dc, mc = config.trainer, config.data, config.model
    logger = logger or ZeroLogger(os.path.join(tc.save_dir, tc.log_file))
    if tc.seed is not None:
        np.random.seed(tc.seed)

    if mc.default_units:
        set_default_units(mc.default_units)

    train_set, valid_set, _ = build_datasets(config)
    logger.info(f"datasets: train={len(train_set)} valid={len(valid_set)}")

    caps = None
    if dc.max_nodes and dc.max_edges:
        caps = {
            "n_nodes": dc.max_nodes,
            "n_edges": dc.max_edges,
            "n_graphs": dc.batch_size + 1,
        }
    train_loader = DataLoader(
        train_set,
        dc.batch_size,
        capacities=caps,
        shuffle=True,
        seed=tc.seed or 0,
    )
    valid_loader = DataLoader(
        valid_set, dc.valid_batch_size, capacities=train_loader.caps
    )
    logger.info(f"padded capacities: {train_loader.caps}")

    # node shift/scale from training statistics (reference run/train.py:136-150)
    model_kwargs = dict(mc.model_kwargs)
    if dc.node_shift is True or dc.node_scale is True:
        stats = calculate_stats(train_set, dc.targets)
        if dc.node_shift is True:
            model_kwargs["node_shift"] = stats["node_shift"]
        if dc.node_scale is True:
            model_kwargs["node_scale"] = stats["node_scale"]
        logger.info(f"energy stats: {stats}")
    else:
        if not isinstance(dc.node_shift, bool):
            model_kwargs["node_shift"] = float(dc.node_shift)
        if not isinstance(dc.node_scale, bool):
            model_kwargs["node_scale"] = float(dc.node_scale)
    config.model.model_kwargs = model_kwargs

    module, extra, _cutoff = resolve_model(mc.model_name, **model_kwargs)
    sample = next(iter(train_loader))
    params = init_params(module, sample, seed=tc.seed or 0)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    logger.info(f"model {mc.model_name}: {n_params / 1e6:.3f}M parameters")

    apply_forward = make_apply_forward(module, extra)
    trainer = Trainer(
        config=config,
        apply_forward=apply_forward,
        params=params,
        train_loader=train_loader,
        valid_loader=valid_loader,
        steps_per_epoch=len(train_loader),
        logger=logger,
    )
    trainer.start()
    return trainer


def run_train_from_args(args) -> None:
    config = load_config(args.config)
    if getattr(args, "ckpt", None):
        config.trainer.ckpt_file = args.ckpt
    if getattr(args, "resume", False):
        config.trainer.resume = True
    run_train(config)
