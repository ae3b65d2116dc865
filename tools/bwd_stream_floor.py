"""Measure the backward mega-kernel's pipeline/DMA FLOOR (round 5,
VERDICT r4 weak #1 / item 3).

Builds a pallas_call with EXACTLY the grid, scalar prefetch, input and
output BlockSpecs of `_bwd_kernel` (ops/pallas_message._mega_bwd_call)
but a near-empty body (one block copy per chunk, the per-block window
DMA, the per-block/grid zero-inits).  Pallas fetches/writes every
declared block regardless of body use, so the measured time is the cost
of streaming the chunk/block data through the VMEM pipeline alone — the
irreducible floor any restructuring of the kernel MATH cannot go below.

Interpretation: bwd measured ~10.3 ms/call at 64% of the MXU roofline
(ideal 6.6 ms).  If floor + ideal ~= measured, the gap IS the
stream/pipeline overhead (not dot granularity, operand conversions or
single-chain ILP — each eliminated by a controlled experiment:
merged operands r4.2, g-precast r5, split-chain ILP r5), and the
remaining lever would be overlapping streams with compute across grid
steps, which Mosaic's auto-pipeliner already attempts.

Usage: python tools/bwd_stream_floor.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import KERNEL_BN as BN
    from bench import KERNEL_CHUNK as CHUNK
    from bench import build_batch

    from xequinet_tpu import keys
    from xequinet_tpu.ops.irreps import Irreps
    from xequinet_tpu.ops.pallas_message import (
        F_PACK, _merged_structure_matrices, _pad128, _sd_stream,
    )
    from xequinet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    batch_np = build_batch(rng)
    n_slots = len(batch_np[keys.K_SRC2])
    max_chunks = int(batch_np[keys.K_NCHUNKS].max())
    n_padded = len(batch_np[keys.ATOMIC_NUMBERS])

    irreps = Irreps("128x0e+64x1o+32x2e")
    node_dim, num_basis = 128, 20
    h = node_dim + 2 * irreps.num_irreps
    hp, dp, sdp = _pad128(h), _pad128(irreps.dim), _pad128(node_dim)
    pad_nodes = 32
    window = BN + 2 * ((pad_nodes + 7) // 8) * 8
    xw = hp + dp
    mm = jnp.bfloat16
    n_blocks = (n_padded + BN - 1) // BN
    chunk = CHUNK

    e123, by, _dims = _merged_structure_matrices(
        str(irreps), num_basis, node_dim
    )

    def floor_kernel(cb_ref, nc_ref, ws_ref, sd_ref, ef_ref, g_ref,
                     wfby_ref, e123_ref, x_ref,
                     dxwin_ref, def_ref, dwf_ref, xwin_ref, sem_x):
        b = pl.program_id(0)
        c = pl.program_id(1)
        w_dim = xwin_ref.shape[0]

        @pl.when(jnp.logical_and(b == 0, c == 0))
        def _():
            dwf_ref[...] = jnp.zeros_like(dwf_ref)

        @pl.when(c == 0)
        def _():
            dxwin_ref[...] = jnp.zeros_like(dxwin_ref)
            wstart = pl.multiple_of(ws_ref[b], 8)
            copy = pltpu.make_async_copy(
                x_ref.at[pl.ds(wstart, w_dim), :], xwin_ref, sem_x
            )
            copy.start()
            copy.wait()

        @pl.when(c < nc_ref[b])
        def _():
            # one trivial copy so the chunk stream is live end-to-end
            def_ref[...] = ef_ref[...].astype(jnp.float32)

    def idx_chunk(b, c, *_refs):
        cc = jnp.minimum(c, _refs[1][b] - 1)
        return (_refs[0][b] + cc, 0)

    def idx_sd(b, c, *_refs):
        cc = jnp.minimum(c, _refs[1][b] - 1)
        return (_refs[0][b] + cc, 0, 0)

    const = lambda b, c, *_refs: (0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks, max_chunks),
        in_specs=[
            pl.BlockSpec((1, 8, chunk), idx_sd, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, F_PACK), idx_chunk,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, sdp + dp), lambda b, c, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F_PACK, xw), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, 2 * dp + sdp), const,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, window, xw), lambda b, c, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, F_PACK), idx_chunk,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F_PACK, hp), const, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((window, xw), mm),
            pltpu.SemaphoreType.DMA,
        ],
    )
    call = pl.pallas_call(
        floor_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, window, xw), jnp.float32),
            jax.ShapeDtypeStruct((n_slots, F_PACK), jnp.float32),
            jax.ShapeDtypeStruct((F_PACK, hp), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )

    x_cat = jnp.asarray(rng.normal(size=(n_padded, xw)), mm)
    ef = jnp.asarray(rng.normal(size=(n_slots, F_PACK)), mm)
    g_pad = jnp.asarray(
        rng.normal(size=(n_blocks * BN, sdp + dp)), mm
    )
    wfby = jnp.asarray(rng.normal(size=(F_PACK, xw)), mm)
    sd = _sd_stream(
        jnp.asarray(batch_np[keys.K_SRC2]),
        jnp.asarray(batch_np[keys.K_DST2]), chunk,
    )
    args = (
        jnp.asarray(batch_np[keys.K_CHUNK_BASE]),
        jnp.asarray(batch_np[keys.K_NCHUNKS]),
        jnp.asarray(batch_np[keys.K_WSTARTS]),
        sd, ef, g_pad, wfby, jnp.asarray(e123, mm), x_cat,
    )
    f = jax.jit(lambda *a: call(*a))

    def _sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(jax.device_get(leaf.ravel()[0])))

    out = f(*args)
    _sync(out)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(*args)
        _sync(out)
        reps.append((time.perf_counter() - t0) / 20)
    floor_ms = float(np.median(reps)) * 1e3
    print(f"bwd stream floor: {floor_ms:.3f} ms/call "
          f"({n_blocks} blocks x {max_chunks} max_chunks, "
          f"{n_slots} slots)")
    rep = Path(__file__).parent / "bwd_stream_floor.json"
    rep.write_text(
        '{"floor_ms": %.4f, "n_blocks": %d, "max_chunks": %d, '
        '"n_slots": %d}\n' % (floor_ms, n_blocks, max_chunks, n_slots)
    )


if __name__ == "__main__":
    main()
