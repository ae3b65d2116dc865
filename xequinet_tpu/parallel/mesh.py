"""Device mesh helpers.

The TPU-native replacement for the reference's torchrun/DDP process
topology (reference run/train.py:74-77): a ``jax.sharding.Mesh`` over all
(or a subset of) devices, with named axes:

  dp — data parallel (grad psum ≙ DDP all-reduce)
  gp — graph/edge partition (the sequence-parallel analogue for large
       periodic supercells, SURVEY.md §5.7; used by parallel/edge_partition)
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DP_AXIS = "dp"
GP_AXIS = "gp"

_distributed_initialized = False


def maybe_init_distributed() -> bool:
    """Initialize the multi-process JAX runtime when launched as one
    process per host (the torchrun/dist.init_process_group analogue,
    reference run/train.py:74-77).

    Triggered by ``JAX_COORDINATOR_ADDRESS`` (+ optional
    ``JAX_PROCESS_ID`` / ``JAX_NUM_PROCESSES``) in the environment; on
    TPU pods the launcher usually provides everything and a bare
    ``jax.distributed.initialize()`` suffices.  Idempotent; returns True
    when running multi-process."""
    global _distributed_initialized
    if _distributed_initialized:
        return jax.process_count() > 1
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None:
        return False
    kwargs = {"coordinator_address": addr}
    if "JAX_NUM_PROCESSES" in os.environ:
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if "JAX_PROCESS_ID" in os.environ:
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    # CPU multi-process clusters (the reference's gloo fallback,
    # run/train.py:75) need the gloo cross-process collectives; on TPU
    # the flag is unused.  Must be set before backend initialization.
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
    jax.distributed.initialize(**kwargs)
    _distributed_initialized = True
    return jax.process_count() > 1


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = (DP_AXIS,),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"make_mesh: {n_devices} devices requested but only "
            f"{len(devices)} present"
        )
    devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)
