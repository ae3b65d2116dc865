"""Pallas TPU mega-kernel: the entire XPaiNN message-block edge pipeline
fused into one kernel (PERF.md roadmap #1).

The XLA path materializes per edge, per message block: the neighbor
gather [E, H+D], the radial filter [E, H], two gate expansions and the
message tensors [E, D] — ~4 KB of HBM traffic per edge per block
(reference hot loop: /root/reference/xequinet/nn/xpainn.py:128-161).
This kernel keeps all of them in VMEM.  Per destination block ``b`` and
edge chunk ``c`` (slot layout from data.batching kernel_layout /
ops.pallas_scatter_v2.prepare_v2), everything runs as one-hot MXU
matmuls plus VPU elementwise:

    ef        = edge_feat chunk                      [C, F=128]
    fw        = ef @ Wf_aug                          [C, Hp]   (filter)
    gathered  = onehot(src_local) @ x_window         [C, Hp+Dp]
    filter_out= gathered[:, :Hp] * fw                [C, Hp]
    msg_v     = gathered[:, Hp:] * (filter_out @ E1)
              + (ef @ BY) * (filter_out @ E2)        [C, Dp]
    msg_s     = filter_out @ MS                      [C, SDp]
    out[b]   += onehot(dst_local)^T @ [msg_s | msg_v]

``edge_feat`` packs the per-edge basis once per batch (amortized over
all action blocks): columns ``[rbf * fcut | fcut | Y_unique | 0...]``,
so ``ef @ Wf_aug`` IS the radial filter ``(rbf @ W + b) * fcut`` when
``Wf_aug = [W ; b]`` (the fcut column carries the bias).  ``E1``/``E2``
are the 0/1 gate-expansion matrices of scalar_gate (each gate scalar
broadcast over its irrep's 2l+1 components), ``MS`` selects the scalar
message channels, ``BY`` broadcasts the unique spherical harmonics over
multiplicities — all constant structure matrices, applied on the MXU
(trading idle-MXU FLOPs for the HBM round trips that bound the XLA
path, PERF.md "Interpretation").

The op is exposed through a custom VJP whose backward is the jax.vjp of
an XLA reference implementation of the same math — differentiable
twice (force training is grad-of-grad), with the kernel on the forward
and every remat recompute.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .irreps import Irreps

F_PACK = 128  # packed edge-feature width (lanes)


def _pad128(n: int) -> int:
    return ((n + 127) // 128) * 128


def _dot_precision(mm):
    """MXU input precision for the kernel dots.

    In f32 mode the one-hot matmuls ARE the gather/scatter; the XLA path
    they must match uses exact memory ops (take / segment_sum), so the
    inputs must not be silently truncated to bf16 on the MXU — HIGHEST
    runs the 3-pass f32 decomposition (measured on chip: default
    precision costs ~10% max-force deviation vs XLA on 1.4k-atom
    systems; HIGHEST restores parity).  bf16 mode keeps the fast path —
    there the caller opted into bf16 rounding everywhere.
    """
    return jax.lax.Precision.HIGHEST if mm == jnp.float32 else None



@functools.lru_cache(maxsize=None)
def _structure_matrices(irreps_str: str, num_basis: int, node_dim: int):
    """(E1, E2, MS, BY, dims) as numpy f32; cached per configuration.

    dims = (H, Hp, D, Dp, SDp, nY) with H = node_dim + 2 * num_irreps.
    """
    irreps = Irreps(irreps_str)
    ni = irreps.num_irreps
    d = irreps.dim
    h = node_dim + 2 * ni
    hp, dp, sdp = _pad128(h), _pad128(d), _pad128(node_dim)

    e1 = np.zeros((hp, dp), dtype=np.float32)
    e2 = np.zeros((hp, dp), dtype=np.float32)
    gate = 0
    lane = 0
    for mul, ir in irreps:
        for u in range(mul):
            e1[gate, lane : lane + ir.dim] = 1.0
            e2[ni + gate, lane : lane + ir.dim] = 1.0
            gate += 1
            lane += ir.dim
    ms = np.zeros((hp, sdp), dtype=np.float32)
    ms[2 * ni : 2 * ni + node_dim, :node_dim] = np.eye(node_dim)

    # unique harmonics: one (2l+1)-block per distinct l, in irreps order
    distinct_ls = []
    for _, ir in irreps:
        if ir.l not in distinct_ls:
            distinct_ls.append(ir.l)
    n_y = sum(2 * l + 1 for l in distinct_ls)
    ycol = {}
    off = num_basis + 1
    for l in distinct_ls:
        ycol[l] = off
        off += 2 * l + 1
    assert off <= F_PACK, "packed edge features exceed 128 lanes"
    by = np.zeros((F_PACK, dp), dtype=np.float32)
    lane = 0
    for mul, ir in irreps:
        for _ in range(mul):
            for m in range(ir.dim):
                by[ycol[ir.l] + m, lane + m] = 1.0
            lane += ir.dim
    return e1, e2, ms, by, (h, hp, d, dp, sdp, n_y)


@functools.lru_cache(maxsize=None)
def _merged_structure_matrices(irreps_str: str, num_basis: int, node_dim: int):
    """(e123, by, dims): the concatenated [E1|E2|MS] operand shared by the
    forward/backward/second-order kernels (ADVICE r4: single source so the
    three wrappers cannot drift)."""
    e1, e2, ms, by, dims = _structure_matrices(irreps_str, num_basis, node_dim)
    return np.concatenate([e1, e2, ms], axis=1), by, dims


def _wfby_operand(wf_aug, by, mm):
    """[F, Hp+Dp] = [Wf_aug | BY] in the kernel matmul dtype."""
    return jnp.concatenate([wf_aug.astype(mm), jnp.asarray(by, mm)], axis=1)


def _sd_stream(src2, dst2, chunk):
    """Slot indices as an [n_chunks, 8, chunk] int32 stream: rows 0/1 are
    window-local src / block-local dst, rows 2-7 zero padding (8 sublanes
    keep Mosaic on its fast layout path; a (1, 2, C) block hangs its
    compiler — ROUND4.md Mosaic finding)."""
    return jnp.concatenate(
        [
            jnp.stack(
                [src2.reshape(-1, chunk), dst2.reshape(-1, chunk)], axis=1
            ),
            jnp.zeros((src2.shape[0] // chunk, 6, chunk), jnp.int32),
        ],
        axis=1,
    )


def pack_edge_features(
    rbf: jnp.ndarray,  # [T, nb]
    fcut: jnp.ndarray,  # [T, 1]
    vec_irrep: jnp.ndarray,  # [T, 3] (irrep basis, y,z,x)
    irreps: Irreps,
) -> jnp.ndarray:
    """[T, 128] packed ``[rbf*fcut | fcut | Y_unique | 0]`` (see module
    docstring).  Computed once per batch in XEmbedding and shared by all
    message blocks."""
    from .spherical import spherical_harmonics

    distinct_ls = []
    for _, ir in irreps:
        if ir.l not in distinct_ls:
            distinct_ls.append(ir.l)
    unique = Irreps(
        "+".join(f"1x{l}{'e' if (-1) ** l == 1 else 'o'}" for l in distinct_ls)
    )
    y = spherical_harmonics(unique, vec_irrep, normalize=True)
    cols = jnp.concatenate([rbf * fcut, fcut, y.astype(rbf.dtype)], axis=-1)
    return jnp.pad(cols, ((0, 0), (0, F_PACK - cols.shape[1])))


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------
def _kernel(
    # scalar prefetch
    chunk_base_ref,  # [n_blocks] int32
    n_chunks_ref,  # [n_blocks] int32
    window_starts_ref,  # [n_blocks] int32
    # blocked inputs
    sd_ref,  # [1, 8, C] int32: row 0 = window-local src, row 1 =
    # block-local dst, rows 2-7 zero padding (8 sublanes keep Mosaic on
    # its fast layout path; a (1, 2, C) block hangs its compiler)
    ef_ref,  # [C, F] packed edge features
    wfby_ref,  # [F, Hp+Dp] = [Wf_aug | BY]
    e123_ref,  # [Hp, 2*Dp+SDp] = [E1 | E2 | MS]
    x_ref,  # [N, Hp+Dp] HBM
    # output
    out_ref,  # [BN, SDp+Dp] f32, revisited across c
    # scratch
    xwin_ref,  # [W, Hp+Dp]
    sem_x,
):
    """All per-chunk math rides FOUR large MXU dots (round-4.2: the
    previous eight smaller dots — separate filter/harmonic projections
    and gate expansions, split scatter — measured 67% of roofline; the
    merged operands lift per-dot occupancy at identical math: the
    structure matrices are concatenated host-side, so ``ef @ [Wf|BY]``
    yields the radial filter AND the broadcast harmonics, and
    ``fo @ [E1|E2|MS]`` yields both gate expansions AND the scalar
    messages in one pass)."""
    b = pl.program_id(0)
    c = pl.program_id(1)
    bn = out_ref.shape[0]
    w_dim = xwin_ref.shape[0]
    c_sz = ef_ref.shape[0]
    hp = e123_ref.shape[0]
    dp = xwin_ref.shape[1] - hp
    mm = ef_ref.dtype  # matmul dtype (bf16 in production)
    prec = _dot_precision(mm)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        wstart = pl.multiple_of(window_starts_ref[b], 8)
        copy = pltpu.make_async_copy(
            x_ref.at[pl.ds(wstart, w_dim), :], xwin_ref, sem_x
        )
        copy.start()
        copy.wait()

    @pl.when(c < n_chunks_ref[b])
    def _():
        ef = ef_ref[...]
        fwrsh = jnp.dot(
            ef, wfby_ref[...], preferred_element_type=jnp.float32, precision=prec
        )
        fw = fwrsh[:, :hp]
        rshx = fwrsh[:, hp:]

        col = jax.lax.broadcasted_iota(jnp.int32, (c_sz, w_dim), 1)
        onehot_src = (col == sd_ref[0, 0][:, None]).astype(mm)
        gathered = jnp.dot(
            onehot_src, xwin_ref[...].astype(mm),
            preferred_element_type=jnp.float32, precision=prec,
        )
        filter_out = (gathered[:, :hp] * fw).astype(mm)
        g123 = jnp.dot(
            filter_out, e123_ref[...],
            preferred_element_type=jnp.float32, precision=prec,
        )
        g1x = g123[:, :dp]
        g2x = g123[:, dp : 2 * dp]
        msg_s = g123[:, 2 * dp :]
        msg_v = gathered[:, hp:] * g1x + rshx * g2x
        msg = jnp.concatenate([msg_s, msg_v], axis=-1).astype(mm)

        rowb = jax.lax.broadcasted_iota(jnp.int32, (bn, c_sz), 0)
        onehot_dst = (rowb == sd_ref[0, 1][None, :]).astype(mm)
        out_ref[...] += jnp.dot(
            onehot_dst, msg, preferred_element_type=jnp.float32, precision=prec
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "irreps_str", "num_basis", "node_dim", "n_out", "block_nodes",
        "chunk", "window", "max_chunks", "mm_dtype",
    ),
)
def _mega_call(
    x_cat,  # [N, Hp+Dp]
    edge_feat,  # [T, F]
    wf_aug,  # [F, Hp]
    src2, dst2, chunk_base, n_chunks, window_starts,
    irreps_str, num_basis, node_dim,
    n_out, block_nodes, chunk, window, max_chunks, mm_dtype,
):
    e123, by, (h, hp, d, dp, sdp, n_y) = _merged_structure_matrices(
        irreps_str, num_basis, node_dim
    )
    mm = jnp.dtype(mm_dtype)
    n_blocks = (n_out + block_nodes - 1) // block_nodes
    xw = hp + dp

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
            pl.BlockSpec((chunk, F_PACK), idx_chunk, memory_space=pltpu.VMEM),
            pl.BlockSpec((F_PACK, xw), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, 2 * dp + sdp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (block_nodes, sdp + dp), lambda b, c, *_: (b, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((window, xw), mm),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks * block_nodes, sdp + dp), jnp.float32
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(
        chunk_base, n_chunks, window_starts,
        _sd_stream(src2, dst2, chunk),
        edge_feat.astype(mm),
        _wfby_operand(wf_aug, by, mm),
        jnp.asarray(e123, mm),
        x_cat.astype(mm),
    )
    return out[:n_out]


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------
def _bwd_kernel(
    # scalar prefetch
    chunk_base_ref,  # [n_blocks] int32
    n_chunks_ref,  # [n_blocks] int32
    window_starts_ref,  # [n_blocks] int32
    # blocked inputs
    sd_ref,  # [1, 8, C] int32: row 0 = window-local src, row 1 =
    # block-local dst, rows 2-7 zero padding (8 sublanes keep Mosaic on
    # its fast layout path; a (1, 2, C) block hangs its compiler)
    ef_ref,  # [C, F]
    g_ref,  # [BN, SDp+Dp] f32 cotangent block
    wfby_ref,  # [F, Hp+Dp] = [Wf_aug | BY]
    e123_ref,  # [Hp, 2*Dp+SDp] = [E1 | E2 | MS]
    x_ref,  # [N, Hp+Dp] HBM
    # outputs
    dxwin_ref,  # [1, W, Hp+Dp] f32 per-block window accumulator
    def_ref,  # [C, F] f32 slot-aligned
    dwf_ref,  # [F, Hp] f32 accumulated across the whole grid
    # scratch
    xwin_ref,  # [W, Hp+Dp]
    sem_x,
):
    """Merged-operand variant (see `_kernel`): the forward recompute and
    every cotangent contraction ride the concatenated [Wf|BY] and
    [E1|E2|MS] operands, so the chunk runs 8 large dots instead of 12
    smaller ones — identical math, higher MXU occupancy."""
    b = pl.program_id(0)
    c = pl.program_id(1)
    bn = g_ref.shape[0]
    w_dim = xwin_ref.shape[0]
    c_sz = ef_ref.shape[0]
    hp = e123_ref.shape[0]
    dp = xwin_ref.shape[1] - hp
    sdp = g_ref.shape[1] - dp
    mm = ef_ref.dtype
    prec = _dot_precision(mm)

    @pl.when(jnp.logical_and(b == 0, c == 0))
    def _():
        dwf_ref[...] = jnp.zeros_like(dwf_ref)

    @pl.when(c == 0)
    def _():
        dxwin_ref[...] = jnp.zeros_like(dxwin_ref)
        wstart = pl.multiple_of(window_starts_ref[b], 8)
        copy = pltpu.make_async_copy(
            x_ref.at[pl.ds(wstart, w_dim), :], xwin_ref, sem_x
        )
        copy.start()
        copy.wait()

    @pl.when(c < n_chunks_ref[b])
    def _():
        contract_rhs = (((1,), (1,)), ((), ()))  # a[C,K] x m[J,K] -> [C,J]
        contract_lhs0 = (((0,), (0,)), ((), ()))  # a[C,K] x b[C,J] -> [K,J]
        ef = ef_ref[...]
        # cotangent gather by dst: padding slots (dst == BN) match no row
        colb = jax.lax.broadcasted_iota(jnp.int32, (c_sz, bn), 1)
        onehot_dst = (colb == sd_ref[0, 1][:, None]).astype(mm)
        gm = jnp.dot(
            onehot_dst, g_ref[...].astype(mm),
            preferred_element_type=jnp.float32, precision=prec,
        )
        gms_s = gm[:, :sdp]
        gms_v = gm[:, sdp:]

        # recompute forward intermediates (MXU flops, zero HBM)
        fwrsh = jnp.dot(
            ef, wfby_ref[...], preferred_element_type=jnp.float32, precision=prec
        )
        fw = fwrsh[:, :hp]
        rsh = fwrsh[:, hp:]
        col = jax.lax.broadcasted_iota(jnp.int32, (c_sz, w_dim), 1)
        onehot_src = (col == sd_ref[0, 0][:, None]).astype(mm)
        gathered = jnp.dot(
            onehot_src, xwin_ref[...].astype(mm),
            preferred_element_type=jnp.float32, precision=prec,
        )
        gs = gathered[:, :hp]
        gv = gathered[:, hp:]
        fo = (gs * fw).astype(mm)
        g12 = jnp.dot(
            fo, e123_ref[...][:, : 2 * dp],
            preferred_element_type=jnp.float32, precision=prec,
        )
        g1 = g12[:, :dp]
        g2 = g12[:, dp:]

        dgv = (g1 * gms_v).astype(mm)
        # dfo = (gv*gms_v)@E1' + (rsh*gms_v)@E2' + gms_s@MS' as ONE
        # contraction against [E1|E2|MS]
        dfo = jax.lax.dot_general(
            jnp.concatenate(
                [(gv * gms_v).astype(mm), (rsh * gms_v).astype(mm),
                 gms_s.astype(mm)],
                axis=-1,
            ),
            e123_ref[...], contract_rhs,
            preferred_element_type=jnp.float32, precision=prec,
        )
        drsh = (g2 * gms_v).astype(mm)
        dgs = (dfo * fw).astype(mm)
        dfw = (dfo * gs).astype(mm)

        # def = dfw@Wf' + drsh@BY' as ONE contraction against [Wf|BY]
        def_ref[...] = jax.lax.dot_general(
            jnp.concatenate([dfw, drsh], axis=-1), wfby_ref[...],
            contract_rhs, preferred_element_type=jnp.float32, precision=prec,
        )
        dwf_ref[...] += jax.lax.dot_general(
            ef, dfw, contract_lhs0, preferred_element_type=jnp.float32, precision=prec
        )
        dxwin_ref[0] += jax.lax.dot_general(
            onehot_src,
            jnp.concatenate([dgs, dgv], axis=-1),
            contract_lhs0,
            preferred_element_type=jnp.float32, precision=prec,
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "irreps_str", "num_basis", "node_dim", "n_out", "block_nodes",
        "chunk", "window", "max_chunks", "mm_dtype",
    ),
)
def _mega_bwd_call(
    x_cat, edge_feat, wf_aug, g,
    src2, dst2, chunk_base, n_chunks, window_starts,
    irreps_str, num_basis, node_dim,
    n_out, block_nodes, chunk, window, max_chunks, mm_dtype,
):
    """(dx_cat, d_edge_feat, d_wf_aug) via the backward mega-kernel.

    Per-block window gradients are overlap-added into [N, Hp+Dp] with one
    segment-sum over n_blocks*W rows (~10x fewer rows than slot edges).
    """
    e123, by, (h, hp, d, dp, sdp, n_y) = _merged_structure_matrices(
        irreps_str, num_basis, node_dim
    )
    mm = jnp.dtype(mm_dtype)
    n_blocks = (n_out + block_nodes - 1) // block_nodes
    xw = hp + dp
    t_slots = edge_feat.shape[0]
    # the cotangent block is gathered per chunk revisit: shipping it
    # already in the kernel matmul dtype removes a [BN, SDp+Dp] VPU
    # conversion per chunk (in bf16 mode the dot casts its inputs
    # anyway, so the math is unchanged; measured neutral on step time,
    # kept for the smaller VMEM block)
    g_pad = jnp.zeros((n_blocks * block_nodes, sdp + dp), mm)
    g_pad = g_pad.at[:n_out].set(g.astype(mm))

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
            pl.BlockSpec((chunk, F_PACK), idx_chunk, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_nodes, sdp + dp), lambda b, c, *_: (b, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((F_PACK, xw), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, 2 * dp + sdp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, window, xw), lambda b, c, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((chunk, F_PACK), idx_chunk, memory_space=pltpu.VMEM),
            pl.BlockSpec((F_PACK, hp), const, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((window, xw), mm),
            pltpu.SemaphoreType.DMA,
        ],
    )
    dxwin, d_ef, d_wf = pl.pallas_call(
        _bwd_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, window, xw), jnp.float32),
            jax.ShapeDtypeStruct((t_slots, F_PACK), jnp.float32),
            jax.ShapeDtypeStruct((F_PACK, hp), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(
        chunk_base, n_chunks, window_starts,
        _sd_stream(src2, dst2, chunk),
        edge_feat.astype(mm),
        g_pad,
        _wfby_operand(wf_aug, by, mm),
        jnp.asarray(e123, mm),
        x_cat.astype(mm),
    )
    rows = (
        window_starts[:, None] + jnp.arange(window, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    dx = jax.ops.segment_sum(
        dxwin.reshape(-1, xw), rows, num_segments=x_cat.shape[0]
    )
    # slots past the covered chunk ranges (fixed slot_cap batches) are
    # never written by the kernel — zero them instead of returning
    # uninitialized memory (chunk coverage is contiguous by construction)
    n_cov = chunk * (chunk_base[-1] + n_chunks[-1])
    cov = jnp.arange(t_slots, dtype=jnp.int32) < n_cov
    d_ef = jnp.where(cov[:, None], d_ef, 0.0)
    return (
        dx.astype(x_cat.dtype),
        d_ef.astype(edge_feat.dtype),
        d_wf.astype(wf_aug.dtype),
    )


# ---------------------------------------------------------------------------
# Second-order kernel (force training: VJP of the backward kernel)
# ---------------------------------------------------------------------------
def _bwd2_kernel(
    # scalar prefetch
    chunk_base_ref,  # [n_blocks] int32
    n_chunks_ref,  # [n_blocks] int32
    window_starts_ref,  # [n_blocks] int32
    # blocked inputs
    sd_ref,  # [1, 8, C] int32: row 0 = window-local src, row 1 =
    # block-local dst, rows 2-7 zero padding (8 sublanes keep Mosaic on
    # its fast layout path; a (1, 2, C) block hangs its compiler)
    ef_ref,  # [C, F]
    cef_ref,  # [C, F] cotangent on d_edge_feat
    g_ref,  # [BN, SDp+Dp] f32 first-order cotangent block
    cwf_ref,  # [F, Hp] cotangent on d_wf_aug
    wfby_ref,  # [F, Hp+Dp] = [Wf_aug | BY]
    e123_ref,  # [Hp, 2*Dp+SDp] = [E1 | E2 | MS]
    x_ref,  # [N, Hp+Dp] HBM
    cx_ref,  # [N, Hp+Dp] HBM cotangent on dx_cat
    # outputs
    d2xwin_ref,  # [1, W, Hp+Dp] f32 per-block window accumulator
    d2ef_ref,  # [C, F] f32 slot-aligned
    d2wf_ref,  # [F, Hp] f32 accumulated across the whole grid
    d2g_ref,  # [BN, SDp+Dp] f32, revisited across c
    # scratch
    xwin_ref,  # [W, Hp+Dp]
    cxwin_ref,  # [W, Hp+Dp]
    sem_x,
    sem_cx,
):
    """VJP of `_bwd_kernel`'s math wrt (x_cat, edge_feat, wf_aug, g) given
    cotangents (cx, cef, cwf) on its outputs (dx, def, dwf).

    Derivation (per edge; fw=ef@W, gs|gv=x[src], fo=gs*fw, g1=fo@E1,
    g2=fo@E2, rsh=ef@BY, gms=g[dst], dfo=(gv*gms_v)@E1'+(rsh*gms_v)@E2'
    +gms_s@MS'): the pairing Phi = <cx,dx>+<cef,def>+<cwf,dwf> collapses
    to Phi_e = A.dfo + cxv.(g1*gms_v) + (cef@BY).(g2*gms_v) with
    R = cef@W + ef@cwf and A = cxh*fw + R*gs, so

        dPhi/dg[dst] = [A@MS | gv*(A@E1)+rsh*(A@E2)+cxv*g1+g2*(cef@BY)]
        dPhi/dx[src] = [dfo*R + U*fw | gms_v*(A@E1)]
        dPhi/def     = (dfo*cxh + U*gs)@W' + (gms_v*(A@E2))@BY'
                       + (dfo*gs)@cwf'
        dPhi/dwf     = ef'@(dfo*cxh + U*gs) + cef'@(dfo*gs)

    with U = (cxv*gms_v)@E1' + ((cef@BY)*gms_v)@E2'.  Same one-hot MXU
    structure as the forward/backward kernels; padding slots contribute
    exactly zero because every term carries a gms factor and padding dst
    matches no row of g.  Like `_kernel`/`_bwd_kernel`, every projection
    rides the merged [Wf|BY] and [E1|E2|MS] operands."""
    b = pl.program_id(0)
    c = pl.program_id(1)
    bn = g_ref.shape[0]
    w_dim = xwin_ref.shape[0]
    c_sz = ef_ref.shape[0]
    hp = e123_ref.shape[0]
    dp = xwin_ref.shape[1] - hp
    sdp = g_ref.shape[1] - dp
    mm = ef_ref.dtype
    prec = _dot_precision(mm)
    contract_rhs = (((1,), (1,)), ((), ()))  # a[C,K] x m[J,K] -> [C,J]
    contract_lhs0 = (((0,), (0,)), ((), ()))  # a[C,K] x b[C,J] -> [K,J]

    @pl.when(jnp.logical_and(b == 0, c == 0))
    def _():
        d2wf_ref[...] = jnp.zeros_like(d2wf_ref)

    @pl.when(c == 0)
    def _():
        d2xwin_ref[...] = jnp.zeros_like(d2xwin_ref)
        d2g_ref[...] = jnp.zeros_like(d2g_ref)
        wstart = pl.multiple_of(window_starts_ref[b], 8)
        copy = pltpu.make_async_copy(
            x_ref.at[pl.ds(wstart, w_dim), :], xwin_ref, sem_x
        )
        copy.start()
        copy2 = pltpu.make_async_copy(
            cx_ref.at[pl.ds(wstart, w_dim), :], cxwin_ref, sem_cx
        )
        copy2.start()
        copy.wait()
        copy2.wait()

    @pl.when(c < n_chunks_ref[b])
    def _():
        ef = ef_ref[...]
        cef = cef_ref[...]
        # gathers: cotangent at dst, state + dx-cotangent at src
        colb = jax.lax.broadcasted_iota(jnp.int32, (c_sz, bn), 1)
        onehot_dst = (colb == sd_ref[0, 1][:, None]).astype(mm)
        gm = jnp.dot(
            onehot_dst, g_ref[...].astype(mm),
            preferred_element_type=jnp.float32, precision=prec,
        )
        gms_s = gm[:, :sdp]
        gms_v = gm[:, sdp:]
        col = jax.lax.broadcasted_iota(jnp.int32, (c_sz, w_dim), 1)
        onehot_src = (col == sd_ref[0, 0][:, None]).astype(mm)
        gathered = jnp.dot(
            onehot_src, xwin_ref[...].astype(mm),
            preferred_element_type=jnp.float32, precision=prec,
        )
        cxe = jnp.dot(
            onehot_src, cxwin_ref[...].astype(mm),
            preferred_element_type=jnp.float32, precision=prec,
        )
        gs = gathered[:, :hp]
        gv = gathered[:, hp:]
        cxh = cxe[:, :hp]
        cxv = cxe[:, hp:]

        # recompute forward + first-order intermediates (VMEM-only)
        fwrsh = jnp.dot(
            ef, wfby_ref[...], preferred_element_type=jnp.float32, precision=prec
        )
        fw = fwrsh[:, :hp]
        rsh = fwrsh[:, hp:]
        fo = (gs * fw).astype(mm)
        g12 = jnp.dot(
            fo, e123_ref[...][:, : 2 * dp],
            preferred_element_type=jnp.float32, precision=prec,
        )
        g1 = g12[:, :dp]
        g2 = g12[:, dp:]
        dfo = jax.lax.dot_general(
            jnp.concatenate(
                [(gv * gms_v).astype(mm), (rsh * gms_v).astype(mm),
                 gms_s.astype(mm)],
                axis=-1,
            ),
            e123_ref[...], contract_rhs,
            preferred_element_type=jnp.float32, precision=prec,
        )

        # second-order terms
        cwb = jnp.dot(
            cef, wfby_ref[...], preferred_element_type=jnp.float32, precision=prec
        )
        cefby = cwb[:, hp:]
        r_cot = cwb[:, :hp] + jnp.dot(
            ef, cwf_ref[...], preferred_element_type=jnp.float32, precision=prec
        )
        a_cot = (cxh * fw + r_cot * gs).astype(mm)
        a123 = jnp.dot(
            a_cot, e123_ref[...],
            preferred_element_type=jnp.float32, precision=prec,
        )
        ae1 = a123[:, :dp]
        ae2 = a123[:, dp : 2 * dp]
        ams = a123[:, 2 * dp :]
        u_cot = jax.lax.dot_general(
            jnp.concatenate(
                [(cxv * gms_v).astype(mm), (cefby * gms_v).astype(mm)],
                axis=-1,
            ),
            e123_ref[...][:, : 2 * dp], contract_rhs,
            preferred_element_type=jnp.float32, precision=prec,
        )
        dfw2 = (dfo * cxh + u_cot * gs).astype(mm)  # cotangent on fw
        dfwr = (dfo * gs).astype(mm)  # cotangent on R (== recomputed dfw)

        d2ef_ref[...] = (
            jax.lax.dot_general(
                jnp.concatenate([dfw2, (gms_v * ae2).astype(mm)], axis=-1),
                wfby_ref[...], contract_rhs,
                preferred_element_type=jnp.float32, precision=prec,
            )
            + jax.lax.dot_general(
                dfwr, cwf_ref[...], contract_rhs,
                preferred_element_type=jnp.float32, precision=prec,
            )
        )
        d2wf_ref[...] += (
            jax.lax.dot_general(
                ef, dfw2, contract_lhs0, preferred_element_type=jnp.float32, precision=prec
            )
            + jax.lax.dot_general(
                cef, dfwr, contract_lhs0, preferred_element_type=jnp.float32, precision=prec
            )
        )
        d2xwin_ref[0] += jax.lax.dot_general(
            onehot_src,
            jnp.concatenate(
                [(dfo * r_cot + u_cot * fw).astype(mm),
                 (gms_v * ae1).astype(mm)],
                axis=-1,
            ),
            contract_lhs0,
            preferred_element_type=jnp.float32, precision=prec,
        )
        d2g_rows = jnp.concatenate(
            [ams.astype(mm),
             (gv * ae1 + rsh * ae2 + cxv * g1 + g2 * cefby).astype(mm)],
            axis=-1,
        )
        rowb = jax.lax.broadcasted_iota(jnp.int32, (bn, c_sz), 0)
        onehot_dst_t = (rowb == sd_ref[0, 1][None, :]).astype(mm)
        d2g_ref[...] += jnp.dot(
            onehot_dst_t, d2g_rows, preferred_element_type=jnp.float32, precision=prec
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "irreps_str", "num_basis", "node_dim", "n_out", "block_nodes",
        "chunk", "window", "max_chunks", "mm_dtype",
    ),
)
def _mega_bwd2_call(
    x_cat, edge_feat, wf_aug, g, cx, cef, cwf,
    src2, dst2, chunk_base, n_chunks, window_starts,
    irreps_str, num_basis, node_dim,
    n_out, block_nodes, chunk, window, max_chunks, mm_dtype,
):
    """(d2x_cat, d2_edge_feat, d2_wf_aug, d2g) via the second-order
    mega-kernel — force training's grad-of-grad without leaving Pallas."""
    e123, by, (h, hp, d, dp, sdp, n_y) = _merged_structure_matrices(
        irreps_str, num_basis, node_dim
    )
    mm = jnp.dtype(mm_dtype)
    n_blocks = (n_out + block_nodes - 1) // block_nodes
    xw = hp + dp
    t_slots = edge_feat.shape[0]
    # the cotangent block is gathered per chunk revisit: shipping it
    # already in the kernel matmul dtype removes a [BN, SDp+Dp] VPU
    # conversion per chunk (in bf16 mode the dot casts its inputs
    # anyway, so the math is unchanged; measured neutral on step time,
    # kept for the smaller VMEM block)
    g_pad = jnp.zeros((n_blocks * block_nodes, sdp + dp), mm)
    g_pad = g_pad.at[:n_out].set(g.astype(mm))

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
            pl.BlockSpec((chunk, F_PACK), idx_chunk, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, F_PACK), idx_chunk, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_nodes, sdp + dp), lambda b, c, *_: (b, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((F_PACK, hp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((F_PACK, xw), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, 2 * dp + sdp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, window, xw), lambda b, c, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((chunk, F_PACK), idx_chunk, memory_space=pltpu.VMEM),
            pl.BlockSpec((F_PACK, hp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_nodes, sdp + dp), lambda b, c, *_: (b, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((window, xw), mm),
            pltpu.VMEM((window, xw), mm),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    d2xwin, d2ef, d2wf, d2g = pl.pallas_call(
        _bwd2_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, window, xw), jnp.float32),
            jax.ShapeDtypeStruct((t_slots, F_PACK), jnp.float32),
            jax.ShapeDtypeStruct((F_PACK, hp), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * block_nodes, sdp + dp),
                                 jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(
        chunk_base, n_chunks, window_starts,
        _sd_stream(src2, dst2, chunk),
        edge_feat.astype(mm),
        cef.astype(mm),
        g_pad,
        cwf.astype(mm),
        _wfby_operand(wf_aug, by, mm),
        jnp.asarray(e123, mm),
        x_cat.astype(mm),
        cx.astype(mm),
    )
    rows = (
        window_starts[:, None] + jnp.arange(window, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    d2x = jax.ops.segment_sum(
        d2xwin.reshape(-1, xw), rows, num_segments=x_cat.shape[0]
    )
    # see _mega_bwd_call: uncovered tail slots hold uninitialized memory
    n_cov = chunk * (chunk_base[-1] + n_chunks[-1])
    cov = jnp.arange(t_slots, dtype=jnp.int32) < n_cov
    d2ef = jnp.where(cov[:, None], d2ef, 0.0)
    return (
        d2x.astype(x_cat.dtype),
        d2ef.astype(edge_feat.dtype),
        d2wf.astype(wf_aug.dtype),
        d2g[:n_out].astype(g.dtype),
    )


# ---------------------------------------------------------------------------
# XLA reference (test oracle + custom-VJP backward)
# ---------------------------------------------------------------------------
def xla_reference(
    x_cat, edge_feat, wf_aug, src_g, dst_g, edge_mask,
    irreps_str, num_basis, node_dim, n_out, compute_dtype=jnp.float32,
):
    """Same math on XLA over the slot-edge arrays; differentiable, used
    as the backward of the kernel (jax.vjp) and as the test oracle."""
    e1, e2, ms, by, (h, hp, d, dp, sdp, n_y) = _structure_matrices(
        irreps_str, num_basis, node_dim
    )
    cd = jnp.dtype(compute_dtype)
    ef = edge_feat.astype(cd)
    fw = (ef @ wf_aug.astype(cd)).astype(jnp.float32)
    gathered = jnp.take(x_cat.astype(cd), src_g, axis=0).astype(jnp.float32)
    filter_out = (gathered[:, :hp] * fw).astype(cd)
    g1x = (filter_out @ jnp.asarray(e1, cd)).astype(jnp.float32)
    g2x = (filter_out @ jnp.asarray(e2, cd)).astype(jnp.float32)
    rshx = (ef @ jnp.asarray(by, cd)).astype(jnp.float32)
    msg_v = gathered[:, hp:] * g1x + rshx * g2x
    msg_s = (filter_out @ jnp.asarray(ms, cd)).astype(jnp.float32)
    msg = jnp.concatenate([msg_s, msg_v], axis=-1)
    msg = jnp.where(edge_mask[:, None], msg, 0.0)
    return jax.ops.segment_sum(
        msg, dst_g, num_segments=n_out, indices_are_sorted=True
    )


_STATICS = (5, 6, 7, 8, 9, 10, 11, 12, 13, 14)


@functools.partial(jax.custom_vjp, nondiff_argnums=_STATICS)
def fused_message(
    x_cat, edge_feat, wf_aug, slot_meta, edge_mask,
    irreps_str, num_basis, node_dim,
    n_out, block_nodes, chunk, window, max_chunks, mm_dtype, kernel_bwd,
):
    """agg [n_out, SDp+Dp] = the message block's full edge pipeline.

    slot_meta = (src2, dst2, src_global, dst_global, chunk_base, n_chunks,
    window_starts) from the collate kernel layout.  With ``kernel_bwd``
    the first-order backward also runs as a Pallas kernel (the
    second-order pass of force training falls back to XLA)."""
    src2, dst2, src_g, dst_g, cb, nc, ws = slot_meta
    return _mega_call(
        x_cat, edge_feat, wf_aug, src2, dst2, cb, nc, ws,
        irreps_str, num_basis, node_dim,
        n_out, block_nodes, chunk, window, max_chunks, mm_dtype,
    )


def _fused_fwd(
    x_cat, edge_feat, wf_aug, slot_meta, edge_mask,
    irreps_str, num_basis, node_dim,
    n_out, block_nodes, chunk, window, max_chunks, mm_dtype, kernel_bwd,
):
    out = fused_message(
        x_cat, edge_feat, wf_aug, slot_meta, edge_mask,
        irreps_str, num_basis, node_dim,
        n_out, block_nodes, chunk, window, max_chunks, mm_dtype,
        kernel_bwd,
    )
    return out, (x_cat, edge_feat, wf_aug, slot_meta, edge_mask)


def _fused_bwd(
    irreps_str, num_basis, node_dim,
    n_out, block_nodes, chunk, window, max_chunks, mm_dtype, kernel_bwd,
    res, g,
):
    x_cat, edge_feat, wf_aug, slot_meta, edge_mask = res
    if kernel_bwd:
        dx, def_, dwf = fused_message_bwd(
            x_cat, edge_feat, wf_aug, g, slot_meta, edge_mask,
            irreps_str, num_basis, node_dim,
            n_out, block_nodes, chunk, window, max_chunks, mm_dtype,
            kernel_bwd,
        )
        return (dx, def_, dwf, None, None)
    src_g, dst_g = slot_meta[2], slot_meta[3]
    _, vjp = jax.vjp(
        lambda x, ef, wf: xla_reference(
            x, ef, wf, src_g, dst_g, edge_mask,
            irreps_str, num_basis, node_dim, n_out,
            compute_dtype=mm_dtype,
        ),
        x_cat, edge_feat, wf_aug,
    )
    dx, def_, dwf = vjp(g)
    return (dx, def_, dwf, None, None)


fused_message.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
)
def fused_message_bwd(
    x_cat, edge_feat, wf_aug, g, slot_meta, edge_mask,
    irreps_str, num_basis, node_dim,
    n_out, block_nodes, chunk, window, max_chunks, mm_dtype,
    kernel_bwd2,
):
    """(dx_cat, d_edge_feat, d_wf_aug) by the backward mega-kernel.

    Itself a custom-VJP primitive so force training (grad-of-grad) stays
    differentiable: with ``kernel_bwd2`` its own backward is the
    second-order mega-kernel (`_bwd2_kernel`), otherwise the jax.vjp of
    the XLA backward (the test oracle)."""
    src2, dst2, src_g, dst_g, cb, nc, ws = slot_meta
    return _mega_bwd_call(
        x_cat, edge_feat, wf_aug, g, src2, dst2, cb, nc, ws,
        irreps_str, num_basis, node_dim,
        n_out, block_nodes, chunk, window, max_chunks, mm_dtype,
    )


def _fmb_fwd(
    x_cat, edge_feat, wf_aug, g, slot_meta, edge_mask,
    irreps_str, num_basis, node_dim,
    n_out, block_nodes, chunk, window, max_chunks, mm_dtype,
    kernel_bwd2,
):
    out = fused_message_bwd(
        x_cat, edge_feat, wf_aug, g, slot_meta, edge_mask,
        irreps_str, num_basis, node_dim,
        n_out, block_nodes, chunk, window, max_chunks, mm_dtype,
        kernel_bwd2,
    )
    return out, (x_cat, edge_feat, wf_aug, g, slot_meta, edge_mask)


def _fmb_bwd(
    irreps_str, num_basis, node_dim,
    n_out, block_nodes, chunk, window, max_chunks, mm_dtype, kernel_bwd2,
    res, cot,
):
    x_cat, edge_feat, wf_aug, g, slot_meta, edge_mask = res
    if kernel_bwd2:
        src2, dst2, src_g, dst_g, cb, nc, ws = slot_meta
        cx, cef, cwf = cot
        dx2, def2, dwf2, dg2 = _mega_bwd2_call(
            x_cat, edge_feat, wf_aug, g, cx, cef, cwf,
            src2, dst2, cb, nc, ws,
            irreps_str, num_basis, node_dim,
            n_out, block_nodes, chunk, window, max_chunks, mm_dtype,
        )
        return (dx2, def2, dwf2, dg2, None, None)
    src_g, dst_g = slot_meta[2], slot_meta[3]

    def xla_bwd(x, ef, wf, gg):
        _, vjp = jax.vjp(
            lambda xx, ee, ww: xla_reference(
                xx, ee, ww, src_g, dst_g, edge_mask,
                irreps_str, num_basis, node_dim, n_out,
                compute_dtype=mm_dtype,
            ),
            x, ef, wf,
        )
        return vjp(gg)

    _, vjp2 = jax.vjp(xla_bwd, x_cat, edge_feat, wf_aug, g)
    dx2, def2, dwf2, dg2 = vjp2(tuple(cot))
    return (dx2, def2, dwf2, dg2, None, None)


fused_message_bwd.defvjp(_fmb_fwd, _fmb_bwd)
