"""Segment scatter/gather ops over padded, static-shape graphs.

TPU-native replacement for torch-scatter (reference dependency,
environment.yaml:108; used at nn/output.py:7, nn/xpainn.py:142-159 via
index_add/index_select).  All ops take a static ``num_segments`` so XLA
sees fixed shapes; padded rows are masked to zero *before* the scatter so
they contribute nothing regardless of their (dummy) segment index.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

import jax
import jax.numpy as jnp

# When set, edge->node aggregations refresh their halo rows by boundary
# ppermute instead of a full psum — the explicit halo-exchange domain
# decomposition (parallel/halo.py, SURVEY.md §5.7 north star).  Spec:
# (axis_name, axis_size, n_local, halo_rows).
_HALO_SPEC: contextvars.ContextVar = contextvars.ContextVar(
    "halo_spec", default=None
)


@contextlib.contextmanager
def halo_parallel(
    axis_name: str, axis_size: int, n_local: int, halo: int,
    periodic: bool = False,
):
    """Trace-time context: scope="edges" aggregations run on a node WINDOW
    of ``halo + n_local + halo`` rows per shard; after each local
    aggregation the halo rows are refreshed from the owning neighbor with
    two boundary ``ppermute``s of [halo, D] rows — O(halo) comm per block
    instead of the GSPMD path's O(n_nodes) all-reduce.

    ``periodic``: the exchange ring wraps (shard 0's left neighbor is the
    last shard) — periodic systems decomposed along a lattice direction.
    Node FEATURES are translation-invariant, so unlike the position
    window (parallel/halo._exchange_window) no shift is applied to
    wrapped rows."""
    token = _HALO_SPEC.set((axis_name, axis_size, n_local, halo, periodic))
    try:
        yield
    finally:
        _HALO_SPEC.reset(token)


def _halo_refresh(
    agg: jnp.ndarray, axis: str, size: int, nl: int, h: int,
    periodic: bool = False,
):
    """Overwrite the halo rows of a [h+nl+h, ...] window aggregation with
    the neighbors' authoritative local rows.

    Left halo of shard i  = shard i-1 rows [nl, nl+h)   (its local tail);
    right halo of shard i = shard i+1 rows [h, 2h)      (its local head).
    Open boundaries: edge shards hold no left/right neighbor -> ppermute
    delivers zeros, exact for non-wrapping systems.  ``periodic``: the
    ring wraps, so shard 0's left halo comes from the LAST shard (and
    vice versa); with one shard the wrap is a local copy."""
    if h == 0 or (size == 1 and not periodic):
        return agg
    if size == 1:  # periodic, single shard: wrap is a local copy
        left = agg[nl : nl + h]
        right = agg[h : 2 * h]
        return jnp.concatenate([left, agg[h : h + nl], right], axis=0)
    left_pairs, right_pairs = _ring_pairs(size, periodic)
    left = jax.lax.ppermute(agg[nl : nl + h], axis, left_pairs)
    right = jax.lax.ppermute(agg[h : 2 * h], axis, right_pairs)
    return jnp.concatenate([left, agg[h : h + nl], right], axis=0)


def _ring_pairs(size: int, periodic: bool):
    """(left_pairs, right_pairs) for the boundary exchange: left halo of
    shard i comes FROM shard i-1, right halo FROM shard i+1; periodic
    closes the ring ((size-1)->0 and 0->(size-1))."""
    if periodic:
        left = [(i, (i + 1) % size) for i in range(size)]
        right = [(i, (i - 1) % size) for i in range(size)]
    else:
        left = [(i, i + 1) for i in range(size - 1)]
        right = [(i, i - 1) for i in range(1, size)]
    return left, right


def segment_sum(
    src: jnp.ndarray,
    index: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
    scope: str = "nodes",
) -> jnp.ndarray:
    """Sum of ``src`` rows into ``num_segments`` buckets.

    src: [M, ...], index: [M] int, mask: [M] bool or None.
    ``indices_are_sorted=True`` is valid for batches from data.batching
    (edges sorted by center; nodes sorted by graph; padding at the top
    index) and unlocks the fast TPU scatter path.

    ``scope`` names what the aggregation means under halo decomposition
    (:func:`halo_parallel`):

    * ``"nodes"`` — a shard-local reduction (e.g. atomic energies to the
      shard's energy); no collective, the caller psums where needed.
    * ``"edges"`` — an edge->node aggregation over the shard window; the
      halo rows are refreshed from their owning shards by boundary
      ppermute.
    * ``"graphs"`` — a graph-GLOBAL sum over atoms (Ewald structure
      factors, reference ewald.py:160-182; charge/spin attention
      normalizers, reference electronic.py:30-51).  Each shard owns a
      window of ONE system, so the exact global sum is the psum of the
      per-shard partial sums over owned rows (pass NODE_MASK as the
      mask) — [G, ...] bytes of comm, independent of system size.
    """
    if mask is not None:
        src = jnp.where(_expand(mask, src.ndim), src, 0)
    out = jax.ops.segment_sum(
        src, index, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    spec = _HALO_SPEC.get()
    if spec is not None:
        if scope == "edges":
            out = _halo_refresh(out, *spec)
        elif scope == "graphs":
            out = jax.lax.psum(out, spec[0])
    return out


def segment_mean(
    src: jnp.ndarray,
    index: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-12,
) -> jnp.ndarray:
    total = segment_sum(src, index, num_segments, mask)
    ones = jnp.ones(src.shape[:1], dtype=src.dtype)
    count = segment_sum(ones, index, num_segments, mask)
    return total / jnp.maximum(count, eps)[
        (...,) + (None,) * (total.ndim - count.ndim)
    ]


def gather_nodes(x: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """x[index] — neighbor/center feature gather (torch index_select)."""
    return jnp.take(x, index, axis=0)


def _expand(mask: jnp.ndarray, ndim: int) -> jnp.ndarray:
    return mask.reshape(mask.shape + (1,) * (ndim - mask.ndim))
