"""Device mesh helpers.

The TPU-native replacement for the reference's torchrun/DDP process
topology (reference run/train.py:74-77): a ``jax.sharding.Mesh`` over all
(or a subset of) devices, with named axes:

  dp — data parallel (grad psum ≙ DDP all-reduce)
  gp — graph/edge partition (the sequence-parallel analogue for large
       periodic supercells, SURVEY.md §5.7; used by parallel/edge_partition)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DP_AXIS = "dp"
GP_AXIS = "gp"


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = (DP_AXIS,),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)
