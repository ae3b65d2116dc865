"""`xeq train`: the end-to-end training driver.

TPU-native counterpart of /root/reference/xequinet/run/train.py: config ->
units -> dataset+transforms -> stats -> model -> Trainer.

Parallelism: with more than one device (and ``trainer.dp_devices`` != 1)
the driver builds a dp mesh over the devices, wraps the loaders in a
ReplicaBatcher (per-device micro-batch stacking) and hands the mesh to
the Trainer, whose train/eval steps then run under shard_map with grad
pmean / metric psum — the torchrun+DDP+DistributedSampler path of the
reference (run/train.py:74-190) as one SPMD program.  Multi-host runs
additionally initialize the JAX distributed runtime
(``JAX_COORDINATOR_ADDRESS``) and give each host a disjoint shard of the
dataset; only process 0 writes checkpoints/logs.
"""

from __future__ import annotations

import os
import warnings
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


def _resolve_mesh(tc):
    """Mesh over the dp devices, or None for single-device training.
    ``dp_devices``: 0 = all local devices, 1 = force single-device,
    N = first N devices."""
    from ..parallel.mesh import make_mesh, maybe_init_distributed

    maybe_init_distributed()
    n = tc.dp_devices if tc.dp_devices > 0 else jax.device_count()
    avail = jax.device_count()
    if n > avail:
        # make_mesh would silently truncate to the available devices; a
        # size-1 mesh then desynchronizes from Trainer (which treats
        # size<=1 as single-device) while the loaders still stack
        # replica batches — clamp here instead.
        warnings.warn(
            f"dp_devices={n} requested but only {avail} device(s) "
            f"present; training on {avail}."
        )
        n = avail
    if n <= 1:
        return None
    return make_mesh(n)


def run_train(config: XequiConfig, logger=None) -> Trainer:
    tc, dc, mc = config.trainer, config.data, config.model
    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache(tc.compile_cache)
    mesh = _resolve_mesh(tc)
    logger = logger or ZeroLogger(os.path.join(tc.save_dir, tc.log_file))
    if tc.seed is not None:
        np.random.seed(tc.seed)

    if mc.default_units:
        set_default_units(mc.default_units)

    train_set, valid_set, _ = build_datasets(config)
    logger.info(f"datasets: train={len(train_set)} valid={len(valid_set)}")

    n_replicas = mesh.size if mesh is not None else 1
    n_local = (
        n_replicas // jax.process_count() if mesh is not None else 1
    )
    # global batch divided over replicas (reference run/train.py:100-129)
    local_bs = max(1, dc.batch_size // n_replicas)
    local_valid_bs = max(1, dc.valid_batch_size // n_replicas)
    shard = (
        (jax.process_index(), jax.process_count())
        if jax.process_count() > 1
        else None
    )

    caps = None
    if dc.max_nodes and dc.max_edges:
        caps = {
            "n_nodes": dc.max_nodes,
            "n_edges": dc.max_edges,
            "n_graphs": local_bs + 1,
        }
    # Pallas mega kernels (model_kwargs.use_pallas_scatter="mega"): the
    # loaders emit the block-aligned slot layout with a FIXED slot
    # capacity, so every batch of the bucket compiles to one program
    # (PERF.md: 926k edges/s vs 671k XLA on the flagship step)
    from ..data.batching import kernel_layout_from_model_kwargs

    kernel_layout = kernel_layout_from_model_kwargs(mc.model_kwargs)
    train_loader = DataLoader(
        train_set,
        local_bs,
        capacities=caps,
        shuffle=True,
        seed=tc.seed or 0,
        process_shard=shard,
        kernel_layout=kernel_layout,
        prefetch=2,  # overlap host collate with the device step
    )
    valid_loader = DataLoader(
        valid_set, local_valid_bs, capacities=train_loader.caps,
        process_shard=shard, kernel_layout=kernel_layout,
    )
    logger.info(f"padded capacities: {train_loader.caps}")
    if mesh is not None:
        from ..parallel.data_parallel import ReplicaBatcher

        logger.info(
            f"data parallel: {n_replicas} devices over "
            f"{jax.process_count()} process(es), "
            f"local batch {local_bs} (global {dc.batch_size})"
        )
        # each process stacks one micro-batch per *local* device
        train_loader = ReplicaBatcher(train_loader, n_local)
        valid_loader = ReplicaBatcher(valid_loader, n_local)

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
    if mesh is not None:  # stacked [D, ...]: init from one micro-batch
        sample = {k: v[0] for k, v in sample.items()}
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
        mesh=mesh,
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
