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


def run_halo_train(config: XequiConfig, logger=None):
    """Config-driven spatial-decomposition training (`trainer.gp_devices`):
    every structure in the dataset is ONE large system halo-decomposed
    over a gp mesh axis; with ``dp_devices`` > 1 a batch of systems
    trains over a (dp, gp) 2-D mesh in a single shard_map program
    (parallel/halo.make_halo_dp_train_step).  The analogous MD knob is
    the md config's ``halo_devices``.  The reference cannot train
    systems beyond one GPU (its only parallelism is molecule-batch DDP,
    reference run/train.py:167-190).

    All systems share one compiled geometry: n_local from the largest
    system, halo/edge capacities sized over the whole dataset (+margin),
    so every epoch reuses a single program.  With
    ``model_kwargs.use_pallas_scatter = "mega"`` each shard runs the
    fused one-hot MXU edge pipeline over its sorted window
    (parallel/halo.apply_halo_kernel_layout; slot/chunk capacities are
    sized over the dataset and the derived ``pallas_layout`` is written
    back into the checkpointed model config).  Ewald models and
    charge/spin embeddings train under halo too — their graph-global
    sums psum-decompose over the gp axis (models/ewald.py,
    models/electronic.py).
    """
    from ..parallel.halo import (
        GP_AXIS,
        make_halo_dp_train_step,
        make_halo_loss_fn,
        make_halo_train_step,
        prepare_halo_system,
        scatter_labels_to_shards,
        stack_halo_systems,
    )
    from ..parallel.mesh import make_mesh, maybe_init_distributed
    from ..training.lr_schedule import resolve_lr_schedule, resolve_optimizer
    from ..training.trainer import save_checkpoint
    from ..utils.compile_cache import enable_compilation_cache
    from ..utils.config import config_to_dict

    tc, dc, mc = config.trainer, config.data, config.model
    enable_compilation_cache(tc.compile_cache)
    maybe_init_distributed()
    logger = logger or ZeroLogger(os.path.join(tc.save_dir, tc.log_file))
    if tc.seed is not None:
        np.random.seed(tc.seed)
    if mc.default_units:
        set_default_units(mc.default_units)

    gp = int(tc.gp_devices)
    avail = jax.device_count()
    dp = tc.dp_devices if tc.dp_devices > 0 else max(1, avail // gp)
    if dp * gp > avail:
        raise ValueError(
            f"gp_devices={gp} x dp_devices={dp} > {avail} devices"
        )
    ups = mc.model_kwargs.get("use_pallas_scatter")
    use_mega = ups in ("mega", "mega-xb")
    if ups and not use_mega:
        raise ValueError(
            "halo training runs the mega kernels "
            "(use_pallas_scatter='mega'/'mega-xb') or the XLA message "
            "path; the v2 kernel is not halo-aware"
        )
    if dp > 1:
        mesh = make_mesh(dp * gp, axis_names=("dp", GP_AXIS), shape=(dp, gp))
    else:
        mesh = make_mesh(gp, axis_names=(GP_AXIS,))
    logger.info(f"halo training mesh: dp={dp} x gp={gp}")

    # datasets WITHOUT the neighbor transform: the halo pipeline builds
    # its own sorted graph per system
    probe = XDBDataset(dc.db_path, split="train", split_name=dc.split)
    transform = build_transform_pipeline(
        data_units=probe.units, base_targets=dc.base_targets, cutoff=None,
        svd_frame=bool(
            mc.model_kwargs.get("use_pbc") is False
            and mc.model_name.endswith("ewald")
        ),
        vector_targets=[keys.DIPOLE] if keys.DIPOLE in dc.targets else [],
        atomic_vector_targets=(
            [keys.FORCES] if keys.FORCES in dc.targets else []
        ),
    )
    train_set = XDBDataset(dc.db_path, split="train", split_name=dc.split,
                           transform=transform,
                           max_num_samples=dc.max_num_samples)
    valid_set = XDBDataset(dc.db_path, split="valid", split_name=dc.split,
                           transform=transform,
                           max_num_samples=dc.max_num_samples)
    logger.info(f"datasets: train={len(train_set)} valid={len(valid_set)}")

    # loud contract, validated BEFORE any partitioning (docs/config.md):
    # the exchange-ring topology (wrapping vs open boundary ppermute) is
    # part of the one compiled program all systems share
    periodic_flags = {
        bool(ds[i].has_cell and np.any(ds[i].pbc))
        for ds in (train_set, valid_set)
        for i in range(len(ds))
    }
    if len(periodic_flags) > 1:
        raise ValueError(
            "halo training requires a homogeneous dataset (all periodic "
            "or all free systems): the exchange-ring topology is part of "
            "the compiled program — split the dataset into a periodic "
            "and a free run, or train molecule-batched with dp_devices "
            "(docs/config.md)"
        )

    # ---- one uniform geometry over the whole dataset --------------------
    from ..parallel.halo import _ceil_to

    def sized(ds):
        return max(len(ds[i].atomic_numbers) for i in range(len(ds)))

    n_max = max(sized(train_set), sized(valid_set))
    nl_exact = _ceil_to((n_max + gp - 1) // gp, 8)
    halo0 = tc.halo_width or None
    cap = None
    preps = {}
    # cache partitions for small datasets (the supercell-training case);
    # past this many systems, re-partition per use instead of holding
    # every padded partition in host memory
    cache_cap = max(64, 8 * dp)
    # mega kernels under halo (apply_halo_kernel_layout): bn/chunk from
    # the user layout, clamped so the kernel window fits the shard window
    # (bn <= n_local); pad_nodes IS the halo width, max_chunks/slot_cap
    # sized over the dataset like halo0/cap
    if use_mega:
        from ..parallel.halo import apply_halo_kernel_layout

        u_bn, u_chunk = tuple(
            mc.model_kwargs.get("pallas_layout", (256, 1024, 32, 8))
        )[:2]
        k_bn = min(int(u_bn), nl_exact)
        k_chunk = int(u_chunk)
    mega_state = {"slot_cap": None, "max_chunks": None}

    def prep(ds, i):
        nonlocal halo0, cap
        dpnt = ds[i]
        key = (id(ds), i)
        if key not in preps:
            stacked, geom, perm, wshift, halo0, cap = prepare_halo_system(
                dpnt.atomic_numbers, dpnt.pos, dc.cutoff, gp,
                cell=dpnt.cell if dpnt.has_cell else None,
                pbc=dpnt.pbc if dpnt.has_cell else None,
                halo=None, edge_cap=None, margin=tc.halo_margin,
                nl_exact=nl_exact, min_halo=halo0, min_edge_cap=cap,
            )
            sig = [halo0, cap]
            if dpnt.charge is not None:
                stacked[keys.TOTAL_CHARGE] = np.full(
                    (gp, 1), dpnt.charge, np.int32
                )
            if dpnt.spin is not None:
                stacked[keys.TOTAL_SPIN] = np.full(
                    (gp, 1), dpnt.spin, np.int32
                )
            if use_mega:
                stacked, sc, mxc = apply_halo_kernel_layout(
                    stacked, geom,
                    {"block_nodes": k_bn, "chunk": k_chunk},
                    min_slot_cap=mega_state["slot_cap"],
                    min_max_chunks=mega_state["max_chunks"],
                )
                mega_state["slot_cap"], mega_state["max_chunks"] = sc, mxc
                sig += [sc, mxc]
            f_arr = (
                np.asarray(dpnt.forces, np.float32)
                if dpnt.forces is not None
                else np.zeros((len(dpnt.atomic_numbers), 3), np.float32)
            )
            f_sorted = f_arr[perm]
            preps[key] = (
                stacked, geom,
                np.float32(dpnt.energy),
                scatter_labels_to_shards(stacked, geom, f_sorted),
                np.zeros(3, np.float32) if wshift is None
                else np.asarray(wshift, np.float32),
                tuple(sig),
            )
            if len(preps) > cache_cap:
                preps.pop(next(k for k in preps if k != key))
        return preps[key]

    # sizing passes: run every system so halo0/cap (and, with mega, the
    # slot/chunk capacities, which depend on the final halo geometry)
    # reach their maxima; re-prepare any system built with smaller
    # capacities until every cached partition shares one signature
    for attempt in range(4):
        for ds in (train_set, valid_set):
            for i in range(len(ds)):
                prep(ds, i)
        final_sig = (halo0, cap) + (
            (mega_state["slot_cap"], mega_state["max_chunks"])
            if use_mega
            else ()
        )
        stale = [k for k in preps if preps[k][5] != final_sig]
        if not stale:
            break
        for k in stale:
            del preps[k]
    else:
        raise AssertionError("halo geometry sizing did not converge")
    geom0 = next(iter(preps.values()))[1]
    logger.info(
        f"halo geometry: n_local={geom0['n_local']} halo={halo0} "
        f"edge_cap={cap}"
        + (
            f" kernel(bn={k_bn} chunk={k_chunk} "
            f"slots={mega_state['slot_cap']} "
            f"max_chunks={mega_state['max_chunks']})"
            if use_mega
            else ""
        )
    )

    periodics = {g[1].get("periodic", False) for g in preps.values()}
    if len(periodics) > 1:
        raise ValueError(
            "halo training requires a homogeneous dataset (all periodic "
            "or all free systems): the exchange-ring topology is part of "
            "the compiled program"
        )

    # ---- model / optimizer ----------------------------------------------
    model_kwargs = dict(mc.model_kwargs)
    if use_mega:
        # the kernels' static layout must match the host slot layout; the
        # override is written back so checkpoints embed it (Calculator /
        # HaloCalculator rebuild the same program)
        model_kwargs["pallas_layout"] = (
            k_bn, k_chunk, halo0, mega_state["max_chunks"]
        )
        mc.model_kwargs = model_kwargs
    module, extra, _cutoff = resolve_model(mc.model_name, **model_kwargs)
    from ..data.batching import collate
    from ..data.datapoint import Datapoint
    from ..ops.radius_graph import radius_graph_np

    d0 = train_set[0]
    m = min(len(d0.atomic_numbers), 16)
    ei_p, _ = radius_graph_np(np.asarray(d0.pos)[:m], dc.cutoff)
    # PBC-Ewald models read CELL unconditionally at init
    # (models/ewald.py EwaldInitialPBC): probe with an inert cell
    probe_cell = {}
    if (
        mc.model_name.endswith("ewald")
        and model_kwargs.get("use_pbc") is not False
    ):
        probe_cell = {"cell": np.eye(3) * 100.0,
                      "pbc": np.array([True] * 3)}
    probe = collate([Datapoint(d0.atomic_numbers[:m], d0.pos[:m],
                               edge_index=ei_p, **probe_cell)])
    # charge/spin-embedded models only create those parameters when the
    # keys are present in the init batch
    if model_kwargs.get("charge_embed"):
        probe[keys.TOTAL_CHARGE] = np.zeros(
            probe[keys.GRAPH_MASK].shape[0], np.int32
        )
    if model_kwargs.get("spin_embed"):
        probe[keys.TOTAL_SPIN] = np.zeros(
            probe[keys.GRAPH_MASK].shape[0], np.int32
        )
    params = init_params(module, probe, seed=tc.seed or 0)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    logger.info(f"model {mc.model_name}: {n_params / 1e6:.3f}M parameters")

    n_train = len(train_set)
    steps_per_epoch = max(1, n_train // dp)
    schedule = resolve_lr_schedule(
        tc.lr_scheduler, tc.max_lr, tc.max_epochs * steps_per_epoch,
        warmup_scheduler=tc.warmup_scheduler or "linear",
        warmup_steps=tc.warmup_epochs * steps_per_epoch,
        **(tc.lr_scheduler_kwargs or {}),
    )
    optimizer = resolve_optimizer(tc.optimizer, schedule,
                                  **(tc.optimizer_kwargs or {}))
    w = dict(tc.losses_weight or {})
    w_e = float(w.get(keys.TOTAL_ENERGY, w.get("energy", 1.0)))
    w_f = float(w.get(keys.FORCES, w.get("forces", 10.0)))
    apply_bound = lambda p, d: module.apply({"params": p}, d)
    if dp > 1:
        step = make_halo_dp_train_step(
            apply_bound, mesh, dict(geom0), optimizer,
            energy_weight=w_e, forces_weight=w_f,
        )
    else:
        step = make_halo_train_step(
            apply_bound, mesh, dict(geom0), optimizer,
            energy_weight=w_e, forces_weight=w_f,
        )
    eval_loss = make_halo_loss_fn(
        apply_bound, mesh, dict(geom0),
        energy_weight=w_e, forces_weight=w_f,
    )

    def valid_loss(params):
        tot = 0.0
        for i in range(len(valid_set)):
            stacked, geom, e_lbl, f_lbl, wshift = prep(valid_set, i)[:5]
            tot += float(np.asarray(jax.device_get(
                eval_loss(params, stacked, e_lbl, f_lbl, wshift)
            )).ravel()[0])
        return tot / max(len(valid_set), 1)

    state = (params, optimizer.init(params))
    rng = np.random.default_rng(tc.seed or 0)
    best = float("inf")
    os.makedirs(tc.save_dir, exist_ok=True)
    last_loss = None
    for epoch in range(tc.max_epochs):
        order = rng.permutation(n_train)
        for s in range(steps_per_epoch):
            idx = order[s * dp : (s + 1) * dp]
            if len(idx) < dp:
                break
            items = [prep(train_set, int(i)) for i in idx]
            if dp > 1:
                stacked, _ = stack_halo_systems(
                    [it[0] for it in items], [it[1] for it in items]
                )
                e_lbls = np.asarray([it[2] for it in items], np.float32)
                f_lbls = np.stack([it[3] for it in items])
                wshifts = np.stack([it[4] for it in items])
                state, loss = step(state, stacked, e_lbls, f_lbls, wshifts)
            else:
                stacked, geom, e_lbl, f_lbl, wshift = items[0][:5]
                state, loss = step(
                    state, stacked, jnp.asarray(e_lbl), jnp.asarray(f_lbl),
                    wshift,
                )
            last_loss = float(np.asarray(jax.device_get(loss)).ravel()[0])
        vl = valid_loss(state[0])
        logger.info(
            f"epoch {epoch + 1}/{tc.max_epochs}: train loss "
            f"{last_loss:.6f}  valid loss {vl:.6f}"
        )
        if jax.process_index() == 0:
            mconf = config_to_dict(mc)
            save_checkpoint(
                os.path.join(tc.save_dir, f"{tc.run_name}_last.ckpt"),
                state[0], mconf,
            )
            if vl < best:
                best = vl
                save_checkpoint(
                    os.path.join(tc.save_dir, f"{tc.run_name}_best.ckpt"),
                    state[0], mconf,
                )
    return state


def run_train(config: XequiConfig, logger=None) -> Trainer:
    tc, dc, mc = config.trainer, config.data, config.model
    if tc.gp_devices and tc.gp_devices > 1:
        return run_halo_train(config, logger)
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
