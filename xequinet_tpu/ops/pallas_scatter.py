"""Pallas TPU kernel: fused gather -> scale -> segment-scatter (SpMM).

The hot pattern of every message block (reference nn/xpainn.py:142-159 in
torch-scatter terms):

    out[c] = sum_{e : dst[e] == c} x[src[e]] * w[e]

XLA lowers this as gather + multiply + sorted scatter-add with the [E, D]
intermediates materialized in HBM.  This kernel fuses all three: the grid
runs over destination-node blocks, each program double-buffers per-edge
row DMAs of x out of HBM and accumulates into a VMEM output tile, so the
edge-sized intermediates never exist.

Host-side preparation (``prepare_blocks``) bins the (already center-
sorted) edges by destination block and pads each block to a fixed edge
capacity — static shapes for the kernel, one searchsorted on the host.

A custom VJP makes the op differentiable (and double-differentiable, as
force training requires): both cotangents are themselves fused
gather-scale-scatters / gathers.

Status & measured findings (TPU v5e, 163k edges, D=480, N=16k):

* the XLA gather+multiply+sorted-segment-sum path reaches ~140 GB/s of
  the ~800 GB/s HBM peak — real headroom exists in the op itself;
* Mosaic constrains single-row HBM DMA slices to whole (8, 128) tiles,
  forcing 1024-float row padding at D=480 (2.1x bandwidth waste);
* the per-edge double-buffered loop serializes on the one TensorCore
  (grid steps are sequential), leaving the kernel ~10x slower than XLA
  at this design point.

The profitable evolution is chunked: contiguous 128-edge w-row DMAs, a
burst of outstanding x-row DMAs on a semaphore array, and the in-block
scatter expressed as a one-hot matmul on the MXU.  Until that lands, the
XLA path stays the production default; this kernel is the correctness-
tested scaffold (interpret mode, custom VJP) for it.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def prepare_blocks(
    dst: np.ndarray,
    n_out: int,
    block_nodes: int,
    edges_per_block: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side edge binning: for center-sorted ``dst`` return
    (edge_start [n_blocks], edge_count [n_blocks]) per destination block.
    Raises if any block exceeds ``edges_per_block`` (caller re-buckets).
    """
    n_blocks = (n_out + block_nodes - 1) // block_nodes
    bounds = np.arange(1, n_blocks + 1) * block_nodes
    ends = np.searchsorted(dst, bounds, side="left")
    starts = np.concatenate([[0], ends[:-1]])
    counts = ends - starts
    if (counts > edges_per_block).any():
        raise ValueError(
            f"destination block exceeds edge capacity "
            f"({counts.max()} > {edges_per_block})"
        )
    return starts.astype(np.int32), counts.astype(np.int32)


def _kernel(
    # scalar prefetch
    starts_ref,
    counts_ref,
    # inputs
    src_ref,  # [E] int32 in SMEM
    dst_ref,  # [E] int32 in SMEM
    w_ref,  # [E, 8, D8] in HBM (row-DMA'd)
    x_ref,  # [N, 8, D8] in HBM (row-DMA'd)
    # output
    out_ref,  # [BN, 8, D8] block in VMEM
    # scratch
    row_buf,  # [2, 1, 8, D8] VMEM
    w_buf,  # [2, 1, 8, D8] VMEM
    sem_x,  # DMA semaphores [2]
    sem_w,  # DMA semaphores [2]
):
    # Arrays are viewed 3-D (rows split into 8 sublanes) so the gathered
    # leading dim is outside the (8, 128) Mosaic tile and single-row
    # slices are legal.
    b = pl.program_id(0)
    bn = out_ref.shape[0]
    start = starts_ref[b]
    count = counts_ref[b]

    out_ref[...] = jnp.zeros_like(out_ref)

    def dma_x(slot, e):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(src_ref[start + e], 1)],
            row_buf.at[slot],
            sem_x.at[slot],
        )

    def dma_w(slot, e):
        return pltpu.make_async_copy(
            w_ref.at[pl.ds(start + e, 1)],
            w_buf.at[slot],
            sem_w.at[slot],
        )

    @pl.when(count > 0)
    def _():
        dma_x(0, 0).start()
        dma_w(0, 0).start()

        def body(e, _):
            slot = e % 2
            nxt = (e + 1) % 2

            @pl.when(e + 1 < count)
            def _():
                dma_x(nxt, e + 1).start()
                dma_w(nxt, e + 1).start()

            dma_x(slot, e).wait()
            dma_w(slot, e).wait()
            dst_local = dst_ref[start + e] - b * bn
            contrib = row_buf[slot, 0] * w_buf[slot, 0]  # [8, D8]
            cur = out_ref[pl.ds(dst_local, 1)]
            out_ref[pl.ds(dst_local, 1)] = cur + contrib[None]
            return 0

        jax.lax.fori_loop(0, count, body, 0)


@functools.partial(jax.jit, static_argnames=("n_out", "block_nodes"))
def _gather_scale_scatter_impl(
    x: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    w: jnp.ndarray,
    starts: jnp.ndarray,
    counts: jnp.ndarray,
    n_out: int,
    block_nodes: int,
) -> jnp.ndarray:
    n_blocks = (n_out + block_nodes - 1) // block_nodes
    d = x.shape[1]
    # Mosaic constraint: a single-row HBM DMA slice must cover whole
    # (8, 128) tiles, so rows are padded to a multiple of 1024 floats
    # (4 KiB — incidentally the efficient DMA granularity)
    d_pad = ((d + 1023) // 1024) * 1024
    if d_pad != d:
        pad = [(0, 0), (0, d_pad - d)]
        x = jnp.pad(x, pad)
        w = jnp.pad(w, pad)
    d8 = d_pad // 8
    x3 = x.reshape(x.shape[0], 8, d8)
    w3 = w.reshape(w.shape[0], 8, d8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # src
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dst
            pl.BlockSpec(memory_space=pltpu.HBM),  # w rows, DMA'd
            pl.BlockSpec(memory_space=pltpu.HBM),  # x rows, DMA'd
        ],
        out_specs=pl.BlockSpec(
            (block_nodes, 8, d8), lambda b, *_: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 1, 8, d8), jnp.float32),
            pltpu.VMEM((2, 1, 8, d8), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_blocks * block_nodes, 8, d8), x.dtype),
        grid_spec=grid_spec,
    )(starts, counts, src, dst, w3, x3)
    return out.reshape(n_blocks * block_nodes, d_pad)[:n_out, :d]


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5)
)
def gather_scale_scatter(x, srcdst, w, block_meta, n_out, block_nodes):
    """out[c] = sum_e [dst[e]==c] x[src[e]] * w[e].

    srcdst: (src [E], dst [E]) with dst sorted ascending; padding edges
    must carry w == 0 (their src/dst point at real rows harmlessly).
    block_meta: (starts, counts) from :func:`prepare_blocks`.
    w: [E, D] (full) or [E, 1] (broadcast scale).
    """
    src, dst = srcdst
    starts, counts = block_meta
    wd = w if w.shape[1] == x.shape[1] else jnp.broadcast_to(w, (w.shape[0], x.shape[1]))
    return _gather_scale_scatter_impl(
        x, src, dst, wd, starts, counts, n_out, block_nodes
    )


def _fwd(x, srcdst, w, block_meta, n_out, block_nodes):
    out = gather_scale_scatter(x, srcdst, w, block_meta, n_out, block_nodes)
    return out, (x, srcdst, w)


def _bwd(n_out, block_nodes, res, g):
    x, (src, dst), w = res
    # dx[s] = sum_e [src[e]==s] g[dst[e]] * w[e] — the same op with roles
    # swapped, but edges are not sorted by src, so the transpose runs on
    # the XLA segment path (a src-sorted second edge ordering would let
    # the Pallas kernel serve the backward too — future work).
    ge = jnp.take(g, dst, axis=0)
    wd = w if w.shape[1] == x.shape[1] else jnp.broadcast_to(w, (w.shape[0], x.shape[1]))
    dx = jax.ops.segment_sum(ge * wd, src, num_segments=x.shape[0])
    xw = jnp.take(x, src, axis=0)
    dw_full = ge * xw
    dw = dw_full if w.shape[1] == x.shape[1] else jnp.sum(
        dw_full, axis=1, keepdims=True
    )
    return (dx, None, dw, None)


gather_scale_scatter.defvjp(_fwd, _bwd)
