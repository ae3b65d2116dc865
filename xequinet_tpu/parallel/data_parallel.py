"""Data-parallel training over a device mesh.

Replaces the reference's DistributedDataParallel + DistributedSampler
pair (reference run/train.py:100-190, SURVEY.md §2.3): each device gets
its own padded micro-batch (stacked on a leading device axis), the
train step runs under ``shard_map``, and gradients / losses / metric
sums are ``pmean``/``psum``-ed over the ICI mesh axis — the explicit,
compiler-visible form of DDP's bucketed all-reduce.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from .mesh import DP_AXIS

Array = jnp.ndarray
DataDict = Dict[str, Array]


def stack_device_batches(batches: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack D per-device padded batches (identical shapes) on a leading
    device axis — the host-side sharded input pipeline (the
    DistributedSampler equivalent)."""
    out = {}
    for k in batches[0]:
        out[k] = np.stack([b[k] for b in batches])
    return out


def make_dp_train_step(
    step_core: Callable,
    mesh: Mesh,
    axis: str = DP_AXIS,
):
    """Wrap a per-replica train-step core into a shard_map over the mesh.

    ``step_core(state, batch, lr_scale, grad_reduce, metric_reduce)`` must
    call the provided reductions on grads/metrics (see
    training.trainer.make_train_step's dp hooks).
    """

    def grad_reduce(tree):
        return jax.tree_util.tree_map(lambda g: jax.lax.pmean(g, axis), tree)

    def metric_reduce(tree):
        return jax.tree_util.tree_map(lambda m: jax.lax.psum(m, axis), tree)

    replicated = P()
    sharded = P(axis)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(replicated, sharded, replicated),
        out_specs=(replicated, replicated, replicated),
        check_vma=False,
    )
    def dp_step(state, batch, lr_scale):
        # strip the per-device leading axis added by stack_device_batches
        local = {k: v[0] for k, v in batch.items()}
        return step_core(state, local, lr_scale, grad_reduce, metric_reduce)

    return jax.jit(dp_step, donate_argnums=(0,))


def make_dp_eval_step(eval_core: Callable, mesh: Mesh, axis: str = DP_AXIS):
    def metric_reduce(tree):
        return jax.tree_util.tree_map(lambda m: jax.lax.psum(m, axis), tree)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    def dp_eval(params, batch):
        local = {k: v[0] for k, v in batch.items()}
        return metric_reduce(eval_core(params, local))

    return jax.jit(dp_eval)


def device_put_sharded_batch(batch: Dict[str, np.ndarray], mesh: Mesh, axis: str = DP_AXIS):
    """Place a stacked batch so its leading axis is sharded over the mesh.

    Single-host: one device_put per array.  Multi-host (jax.distributed
    initialized, mesh spanning processes): each process passes only its
    *local* slice of the leading axis — the host-sharded input pipeline —
    and the global array is assembled without any cross-host transfer
    (``jax.make_array_from_process_local_data``)."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(sharding, v)
            for k, v in batch.items()
        }
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def empty_batch_like(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """A fully-masked batch with the same static shapes: all node/edge/
    graph masks False, counts zero, values zero.  Used to pad the last
    replica group so every dp step sees a full [D, ...] stack (losses and
    metric sums on it are exactly zero; its gradient contribution is zero,
    which slightly down-weights the final partial step — the same order of
    distortion as DDP's sample-repeating DistributedSampler padding).

    The Pallas slot-layout metadata (K_*) must be COPIED, not zeroed: the
    mega kernel's index maps assume every destination block covers >= 1
    chunk (batching.prepare guarantees it), and a zeroed ``k_nchunks``
    makes them compute ``chunk_base + min(c, -1)`` — an out-of-bounds
    block prefetch.  With the template layout kept, the zeroed node/graph
    masks still null every loss/metric/gradient contribution."""
    from .. import keys

    layout_keys = (
        keys.K_SRC2, keys.K_DST2, keys.K_CHUNK_BASE, keys.K_NCHUNKS,
        keys.K_WSTARTS,
    )
    return {
        k: (v.copy() if k in layout_keys else np.zeros_like(v))
        for k, v in batch.items()
    }


class ReplicaBatcher:
    """Group a padded-micro-batch loader into stacked [D, ...] dp batches.

    The DistributedSampler+DataLoader pair of the reference
    (run/train.py:100-129) re-designed for SPMD: the underlying loader
    yields identically-shaped padded micro-batches; every ``n_replicas``
    of them are stacked on a leading device axis.  A final partial group
    is padded with fully-masked empty batches (count-weighted metrics stay
    exact; see empty_batch_like for the gradient note).

    Multi-host lockstep: greedy capacity packing makes the number of
    micro-batches CONTENT-dependent, so process-sharded hosts generally
    disagree on steps-per-epoch — one host would exit the epoch loop
    while the others block forever inside the step's collectives (the
    reference pads its DistributedSampler to sidestep exactly this).
    When the JAX distributed runtime spans processes, every yield round
    allgathers a one-byte "still have data" flag; exhausted hosts keep
    yielding fully-empty groups (zero loss/metric/grad contribution)
    until all processes are done, so every host executes the same number
    of SPMD steps.
    """

    def __init__(self, loader, n_replicas: int,
                 sync_processes: Optional[bool] = None) -> None:
        self.loader = loader
        self.n_replicas = n_replicas
        self.caps = loader.caps
        self.sync_processes = (
            jax.process_count() > 1
            if sync_processes is None
            else sync_processes
        )
        # injectable for single-process tests: [local_flag] -> flags of
        # all processes
        from jax.experimental import multihost_utils

        self._allgather = multihost_utils.process_allgather
        # sync the steps-per-epoch estimate ONCE, eagerly: exhausted hosts
        # pad with empty groups up to the slowest host, so the true count
        # is the max over hosts' (content-dependent) packing estimates.
        # Doing it here — not in __len__ — keeps collectives out of
        # implicit protocol paths (list() calls __len__ via length_hint,
        # which would desync the yield-round allgathers across hosts).
        self._synced_len: Optional[int] = None
        if self.sync_processes:
            local = self._local_len()
            counts = self._allgather(np.asarray([local], dtype=np.int64))
            self._synced_len = int(np.max(counts))

    def set_epoch(self, epoch: int) -> None:
        self.loader.set_epoch(epoch)

    def _iter_local(self):
        group: List[Dict[str, np.ndarray]] = []
        for b in self.loader:
            group.append(b)
            if len(group) == self.n_replicas:
                yield stack_device_batches(group)
                group = []
        if group:
            empty = empty_batch_like(group[0])
            while len(group) < self.n_replicas:
                group.append(empty)
            yield stack_device_batches(group)

    # lockstep flag values exchanged each yield round
    _EXHAUSTED, _HAS_DATA, _FATAL = 0, 1, 2

    def __iter__(self):
        if not self.sync_processes:
            yield from self._iter_local()
            return
        inner = self._iter_local()
        template: Optional[Dict[str, np.ndarray]] = None
        while True:
            g = next(inner, None)
            if g is not None:
                template = g
            flag = self._HAS_DATA if g is not None else self._EXHAUSTED
            if g is None and template is None:
                # no batches at all on this host: a bare raise would leave
                # the peers blocked forever inside the step collectives —
                # broadcast a fatal flag first so every process breaks out
                # and reports, then raise locally.
                flag = self._FATAL
            flags = self._allgather(np.asarray([flag], dtype=np.int32))
            if np.any(flags == self._FATAL):
                raise RuntimeError(
                    "ReplicaBatcher: a process has no batches at all this "
                    "epoch but other processes do — shard the dataset so "
                    "every host gets at least one."
                )
            if not np.any(flags == self._HAS_DATA):
                break
            if g is None:
                g = empty_batch_like(template)
            yield g

    def _local_len(self) -> int:
        import math

        return max(1, math.ceil(len(self.loader) / self.n_replicas))

    def __len__(self) -> int:
        """Steps this process will run per epoch.

        Greedy capacity packing makes the local count a content-dependent
        ESTIMATE; in multi-host lockstep the true count is the max over
        hosts (exhausted hosts pad with empty groups), so construction
        allgathers the local estimates and this returns their max —
        keeping LR warmup/decay pacing (steps_per_epoch -> warmup /
        max_steps in run/train.py) consistent with the steps actually
        executed and identical across hosts.  Purely local, collective-
        free: safe under implicit length_hint calls."""
        if self._synced_len is not None:
            return self._synced_len
        return self._local_len()


def replicate(tree, mesh: Mesh):
    """Replicate a pytree across the mesh.  Copies first: device_put may
    alias the source buffer as one shard, and the returned state is
    typically donated into the train step — donating an aliased buffer
    would silently delete the caller's original arrays."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.array(x), sharding), tree
    )
