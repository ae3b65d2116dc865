"""Halo-exchange domain decomposition for one large atomic system.

The explicit-collective upgrade of :mod:`parallel.edge_partition`
(SURVEY.md §5.7 north star) — a capability the reference does NOT have
(its largest-system path is single-device, reference
data/radius_graph.py:128-155).

Nodes are sharded CONTIGUOUSLY in spatial order over a mesh axis (the
C++ cell-list search already emits spatially sorted indices); each shard
owns ``n_local`` nodes plus a ``halo``-row window on either side.  Edges
are partitioned by the owner of their *center* (dst) node, so every
edge aggregation is local to one shard.  Per message block, the only
communication is two boundary ``ppermute``s of [halo, D] feature rows
(ops/scatter.py:halo_parallel) — O(halo · D) bytes over ICI, vs the
GSPMD edge-sharding path's O(n_nodes · D) all-reduce per aggregation.
XLA overlaps the ppermute DMAs with the independent local compute that
follows them (the update-block matmuls of the previous refresh).

Exactness (energy, forces) vs the single-device forward is proven in
``tests/test_halo.py`` on an 8-device CPU mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from .. import keys
from ..models.properties import compute_edge_data
from ..ops.scatter import halo_parallel
from .mesh import GP_AXIS

Array = jnp.ndarray
DataDict = Dict[str, Array]


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def halo_partition(
    z: np.ndarray,  # [N] atomic numbers, spatially sorted
    pos: np.ndarray,  # [N, 3]
    edge_index: np.ndarray,  # [2, E] global (center, neighbor), center-sorted
    n_shards: int,
    halo: int,
    cell_offsets: Optional[np.ndarray] = None,
    balance_edges: bool = False,
    edge_cap: Optional[int] = None,
    periodic: bool = False,
) -> Tuple[Dict[str, np.ndarray], Dict[str, int]]:
    """Partition one large system into per-shard window subgraphs.

    Returns (stacked_batch, geom) where every array in ``stacked_batch``
    has a leading shard axis and ``geom = {"n_local", "halo", "window"}``.
    Nodes must be ordered so that every edge's neighbor index is within
    ``halo`` rows of its center's shard range (spatial sort; asserted).

    ``balance_edges`` (SURVEY.md §7.3 hard part 5): shard boundaries are
    chosen to equalize per-shard EDGE counts instead of node counts
    (edge work dominates; density skew otherwise idles the sparse
    shards).  SPMD needs uniform shard geometry, so balancing keeps the
    node order but inserts masked padding rows at the chosen boundaries —
    every shard owns exactly ``n_local`` rows of which the leading
    ``len_d`` are real.  The per-shard edge capacity (the padded compute)
    drops from max-over-equal-node-shards to ~E/n_shards.

    ``periodic``: the sorted order is treated as a RING of period
    ``n_shards * n_local`` (padding rows are dead space inside the ring).
    Callers pass UNWRAPPED neighbor rows for wrap edges
    (``src_row + o_axis * period``, possibly negative / >= period); the
    atomic-number windows wrap cyclically here, and the runtime position
    window / feature refresh wrap via the cyclic exchange
    (``_exchange_window`` with ``wrap_shift``, ops/scatter._ring_pairs).
    Residual image offsets on the non-sort axes still ride
    ``cell_offsets`` with a per-shard CELL added by the caller.
    """
    n = len(z)
    dst, src = edge_index[0], edge_index[1]

    if balance_edges and n:
        per_node = np.bincount(dst, minlength=n)
        cum = np.cumsum(per_node)
        targets = np.arange(1, n_shards) * (cum[-1] / n_shards)
        cuts = np.searchsorted(cum, targets) + 1
        bounds = np.concatenate([[0], np.clip(cuts, 0, n), [n]])
        bounds = np.maximum.accumulate(bounds)
        lens = np.diff(bounds)
        nl = _ceil_to(max(int(lens.max()), 1), 8)
        new_index = np.full(n, -1, dtype=np.int64)
        for d in range(n_shards):
            new_index[bounds[d] : bounds[d + 1]] = d * nl + np.arange(
                lens[d]
            )
        cap = n_shards * nl
        zp = np.zeros(cap, dtype=z.dtype)
        pp = np.zeros((cap, 3), dtype=pos.dtype)
        real = np.zeros(cap, dtype=bool)
        zp[new_index] = z
        pp[new_index] = pos
        real[new_index] = True
        dst = new_index[dst]
        src = new_index[src]
    else:
        nl = _ceil_to((n + n_shards - 1) // n_shards, 8)
        cap = n_shards * nl
        zp = np.zeros(cap, dtype=z.dtype)
        zp[:n] = z
        pp = np.zeros((cap, 3), dtype=pos.dtype)
        pp[:n] = pos
        real = np.arange(cap) < n

    h = _ceil_to(halo, 8)
    if h > nl:
        raise ValueError(
            f"halo {h} exceeds n_local {nl}: the boundary exchange fills "
            f"halo rows from the ADJACENT shard only "
            f"(parallel/halo.py:_exchange_window), so a halo wider than a "
            f"shard silently truncates — use fewer shards or a smaller halo"
        )
    w = nl + 2 * h
    owner = dst // nl
    # per-shard edge runs (dst sorted -> owners sorted)
    counts = np.bincount(owner, minlength=n_shards)
    reach = np.abs(src - dst).max() if len(src) else 0
    if reach > h + nl - 1:
        raise ValueError(
            f"edge reaches {reach} rows from its center; halo {h} (+local "
            f"{nl}) too small — sort nodes spatially or raise halo"
        )
    el = max(_ceil_to(int(counts.max()) if n else 1, 128), 128)
    if edge_cap is not None:
        # fixed per-shard capacity: repeated partitions of a moving
        # system (MD) keep one compiled program
        if el > edge_cap:
            raise ValueError(
                f"per-shard edges {el} exceed edge_cap {edge_cap}"
            )
        el = edge_cap

    ei = np.zeros((n_shards, 2, el), dtype=np.int32)
    em = np.zeros((n_shards, el), dtype=bool)
    co = (
        np.zeros((n_shards, el, 3), dtype=cell_offsets.dtype)
        if cell_offsets is not None
        else None
    )
    zw = np.zeros((n_shards, w), dtype=z.dtype)
    nm = np.zeros((n_shards, w), dtype=bool)
    pl = np.zeros((n_shards, nl, 3), dtype=pos.dtype)
    starts = np.searchsorted(owner, np.arange(n_shards))
    ends = np.searchsorted(owner, np.arange(n_shards), side="right")
    for d in range(n_shards):
        base = d * nl - h  # global row of window row 0
        s, e = int(starts[d]), int(ends[d])
        k = e - s
        dl = dst[s:e] - base
        sl = src[s:e] - base
        if k and (sl.min() < 0 or sl.max() >= w):
            raise ValueError(
                f"shard {d}: neighbor outside window; raise halo (>{h})"
            )
        ei[d, 0, :k] = dl
        ei[d, 1, :k] = sl
        em[d, :k] = True
        if co is not None:
            co[d, :k] = cell_offsets[s:e]
        if periodic:
            zw[d] = zp[(base + np.arange(w)) % cap]
        else:
            lo, hi = max(base, 0), min(base + w, cap)
            zw[d, lo - base : hi - base] = zp[lo:hi]
        nm[d, h : h + nl] = real[d * nl : (d + 1) * nl]
        pl[d] = pp[d * nl : (d + 1) * nl]

    batch = {
        keys.ATOMIC_NUMBERS: zw,
        keys.POSITIONS: pl,
        keys.EDGE_INDEX: ei,
        keys.EDGE_MASK: em,
        keys.NODE_MASK: nm,
        keys.BATCH: np.zeros((n_shards, w), dtype=np.int32),
        keys.GRAPH_MASK: np.ones((n_shards, 1), dtype=bool),
    }
    if co is not None:
        batch[keys.CELL_OFFSETS] = co
    return batch, {
        "n_local": nl, "halo": h, "window": w, "periodic": periodic,
    }


def apply_halo_kernel_layout(
    stacked: Dict[str, np.ndarray],
    geom: Dict[str, int],
    layout: Dict[str, int],
    min_slot_cap: Optional[int] = None,
    min_max_chunks: Optional[int] = None,
    slot_cap: Optional[int] = None,
    max_chunks: Optional[int] = None,
    margin: float = 1.0,
) -> Tuple[Dict[str, np.ndarray], int, int]:
    """Re-lay every shard's edge axis into the block-aligned slot order
    consumed by the mega Pallas kernels (ops/pallas_message, via
    ops/pallas_scatter_v2.prepare_v2) — the composition of the repo's two
    flagship results: the per-shard window subgraph is spatially sorted
    and local, exactly the banded-window contract the one-hot MXU kernels
    want, so each shard runs the SAME fused edge pipeline the
    single-chip path does (replacing the reference hot loop
    /root/reference/xequinet/nn/xpainn.py:128-161 per shard).

    ``layout`` = {"block_nodes", "chunk"}; ``pad_nodes`` is the halo
    width (every neighbor of a dst block lies within ``halo`` rows).
    All shards share one static (n_blocks, max_chunks, slot_cap)
    geometry so the stacked arrays ride the shard axis of shard_map.
    ``min_*`` floors keep a caller's running geometry monotone (MD /
    dataset training: one compiled program); explicit ``slot_cap`` /
    ``max_chunks`` pin it exactly (raise on overflow).

    Returns ``(stacked2, slot_cap_used, max_chunks_used)``; the model
    must be built with ``pallas_layout = (block_nodes, chunk, halo,
    max_chunks_used)``.  The slot order keeps centers sorted, so the XLA
    message path stays correct on the same batch (eval/fallback).
    """
    from ..ops.pallas_scatter_v2 import prepare_v2

    bn = int(layout["block_nodes"])
    chunk = int(layout["chunk"])
    h = int(geom["halo"])
    w = int(geom["window"])
    kwin = bn + 2 * ((h + 7) // 8) * 8
    if w < kwin:
        raise ValueError(
            f"halo window {w} rows < kernel window {kwin} "
            f"(block_nodes {bn} + 2*halo {h}): use block_nodes <= "
            f"n_local ({geom['n_local']})"
        )
    n_shards = stacked[keys.EDGE_MASK].shape[0]
    n_blocks = (w + bn - 1) // bn
    per = []
    mx_meas, cap_meas = 1, chunk
    for d in range(n_shards):
        real = np.nonzero(stacked[keys.EDGE_MASK][d])[0]
        dst = stacked[keys.EDGE_INDEX][d, 0, real]
        src = stacked[keys.EDGE_INDEX][d, 1, real]
        src2, dst2, sel, cb, nc, ws, _win, mx = prepare_v2(
            src, dst, w, bn, chunk, h
        )
        per.append((src2, dst2, sel, cb, nc, ws, real))
        mx_meas = max(mx_meas, int(mx))
        cap_meas = max(cap_meas, len(sel))
    # margin gives a moving system (MD) head-room so the compiled program
    # survives density fluctuations (same role as prepare_halo_system's
    # margin for halo/edge_cap); when the measured need still fits an
    # existing min_* floor the floor is reused unchanged (monotone, no
    # re-inflation), otherwise the capacity grows with fresh head-room
    if min_max_chunks is not None and mx_meas <= int(min_max_chunks):
        mx_need = int(min_max_chunks)
    else:
        mx_need = max(
            int(np.ceil(mx_meas * margin)), int(min_max_chunks or 0)
        )
    if min_slot_cap is not None and cap_meas <= int(min_slot_cap):
        cap_need = int(min_slot_cap)
    else:
        cap_need = max(
            _ceil_to(int(np.ceil(cap_meas * margin)), chunk),
            int(min_slot_cap or 0),
        )
    if max_chunks is None:
        max_chunks = mx_need
    elif mx_meas > max_chunks:
        raise ValueError(
            f"halo kernel layout: a shard block needs {mx_meas} chunks > "
            f"max_chunks {max_chunks}"
        )
    if slot_cap is None:
        slot_cap = cap_need
    elif cap_meas > slot_cap:
        raise ValueError(
            f"halo kernel layout: {cap_meas} slots > slot_cap {slot_cap}"
        )

    ei2 = np.full((n_shards, 2, slot_cap), w - 1, dtype=np.int32)
    em2 = np.zeros((n_shards, slot_cap), dtype=bool)
    src2s = np.zeros((n_shards, slot_cap), dtype=np.int32)
    dst2s = np.full((n_shards, slot_cap), bn, dtype=np.int32)
    cbs = np.zeros((n_shards, n_blocks), dtype=np.int32)
    ncs = np.zeros((n_shards, n_blocks), dtype=np.int32)
    wss = np.zeros((n_shards, n_blocks), dtype=np.int32)
    co = stacked.get(keys.CELL_OFFSETS)
    co2 = (
        np.zeros((n_shards, slot_cap, 3), dtype=co.dtype)
        if co is not None
        else None
    )
    for d, (src2, dst2, sel, cb, nc, ws, real) in enumerate(per):
        t = len(sel)
        src2s[d, :t] = src2
        dst2s[d, :t] = dst2
        cbs[d], ncs[d], wss[d] = cb, nc, ws
        valid = sel >= 0
        safe = np.clip(sel, 0, None)
        # padding slots carry the owning block's boundary node: centers
        # stay sorted for the XLA fallback on the same batch (see
        # data.batching._apply_kernel_layout); tail slots past the chunk
        # coverage are never visited by the kernel grid
        slot_chunk = np.arange(t) // chunk
        block_id = np.searchsorted(cb, slot_chunk, side="right") - 1
        pad_center = np.minimum((block_id + 1) * bn, w - 1)
        dst_r = stacked[keys.EDGE_INDEX][d, 0, real]
        src_r = stacked[keys.EDGE_INDEX][d, 1, real]
        ei2[d, 0, :t] = np.where(valid, dst_r[safe], pad_center)
        ei2[d, 1, :t] = np.where(valid, src_r[safe], pad_center)
        em2[d, :t] = valid
        if co2 is not None:
            co2[d, :t] = np.where(valid[:, None], co[d][real][safe], 0)
    out = dict(stacked)
    out[keys.EDGE_INDEX] = ei2
    out[keys.EDGE_MASK] = em2
    if co2 is not None:
        out[keys.CELL_OFFSETS] = co2
    out[keys.K_SRC2] = src2s
    out[keys.K_DST2] = dst2s
    out[keys.K_CHUNK_BASE] = cbs
    out[keys.K_NCHUNKS] = ncs
    out[keys.K_WSTARTS] = wss
    return out, int(slot_cap), int(max_chunks)


def _exchange_window(
    pos_local: Array, axis: str, size: int, nl: int, h: int,
    wrap_shift: Optional[Array] = None,
) -> Array:
    """[nl, 3] owned positions -> [h+nl+h, 3] window via two ppermutes.

    ``wrap_shift`` (the lattice vector along the sort axis) closes the
    exchange ring periodically: shard 0's left halo arrives from the
    LAST shard translated by -wrap_shift (it holds images one period
    down), and symmetrically for the last shard's right halo.  The shift
    is applied in-graph, so force gradients flow back to the owning
    rows through the ppermute transpose unchanged."""
    periodic = wrap_shift is not None
    if h == 0:
        pad = jnp.zeros((h, 3), pos_local.dtype)
        return jnp.concatenate([pad, pos_local, pad], axis=0)
    if size == 1:
        if periodic:
            left = pos_local[nl - h :] - wrap_shift
            right = pos_local[:h] + wrap_shift
            return jnp.concatenate([left, pos_local, right], axis=0)
        pad = jnp.zeros((h, 3), pos_local.dtype)
        return jnp.concatenate([pad, pos_local, pad], axis=0)
    from ..ops.scatter import _ring_pairs

    left_pairs, right_pairs = _ring_pairs(size, periodic)
    left = jax.lax.ppermute(pos_local[nl - h :], axis, left_pairs)
    right = jax.lax.ppermute(pos_local[:h], axis, right_pairs)
    if periodic:
        idx = jax.lax.axis_index(axis)
        left = left - jnp.where(idx == 0, 1.0, 0.0).astype(
            pos_local.dtype
        ) * wrap_shift
        right = right + jnp.where(idx == size - 1, 1.0, 0.0).astype(
            pos_local.dtype
        ) * wrap_shift
    return jnp.concatenate([left, pos_local, right], axis=0)


def make_halo_forward(
    apply_fn: Callable[[DataDict], DataDict],
    mesh: Mesh,
    geom: Dict[str, int],
    axis: str = GP_AXIS,
):
    """Build ``forward(stacked_batch, compute_forces) -> (energy, forces)``
    running the model under shard_map with explicit halo exchange.

    * positions enter owned-rows-only and are windowed in-graph, so force
      autodiff routes halo contributions back to the owning shard through
      the ppermute transpose — forces come out exact per owned row;
    * every edge aggregation refreshes its halo rows via
      ops.scatter.halo_parallel (O(halo) comm per block);
    * energy is the psum of the shard-local masked sums;
    * periodic systems (``geom["periodic"]``): the exchange ring wraps
      and the wrapped position rows are translated by ``wrap_shift``
      (the sort-axis lattice vector), passed per call so NPT-style cell
      changes never recompile.
    """
    nl, h = geom["n_local"], geom["halo"]
    periodic = bool(geom.get("periodic", False))
    size = int(mesh.shape[axis])

    def local_energy(pos_local: Array, static_data: DataDict, wshift):
        win = _exchange_window(
            pos_local, axis, size, nl, h, wshift if periodic else None
        )
        d = dict(static_data)
        d[keys.POSITIONS] = win
        d = compute_edge_data(d, None)
        with halo_parallel(axis, size, nl, h, periodic):
            out = apply_fn(d)
        e_local = jnp.sum(out[keys.TOTAL_ENERGY])  # halo rows masked out
        return e_local, out

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=(P(), P(axis)),
        check_vma=False,
    )
    def fwd_forces(pos_stacked, data_stacked, wshift):
        pos_local = pos_stacked[0]
        local = {k: v[0] for k, v in data_stacked.items()}
        (e, _), g = jax.value_and_grad(local_energy, has_aux=True)(
            pos_local, local, wshift
        )
        return jax.lax.psum(e, axis), -g[None]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    def fwd_energy(pos_stacked, data_stacked, wshift):
        e, _ = local_energy(
            pos_stacked[0],
            {k: v[0] for k, v in data_stacked.items()},
            wshift,
        )
        return jax.lax.psum(e, axis)

    j_ff = jax.jit(fwd_forces)
    j_fe = jax.jit(fwd_energy)

    def forward(
        stacked_batch: DataDict,
        compute_forces: bool = True,
        wrap_shift=None,
    ):
        data = {
            k: jnp.asarray(v)
            for k, v in stacked_batch.items()
            if k != keys.POSITIONS
        }
        pos = jnp.asarray(stacked_batch[keys.POSITIONS])
        ws = jnp.asarray(
            wrap_shift if wrap_shift is not None else np.zeros(3),
            dtype=pos.dtype,
        )
        if compute_forces:
            e, f = j_ff(pos, data, ws)
            return e, f.reshape(-1, 3)
        return j_fe(pos, data, ws), None

    return forward


def _make_halo_local_loss(
    module_apply: Callable[[Dict, DataDict], DataDict],
    axis: str,
    size: int,
    nl: int,
    h: int,
    periodic: bool,
    energy_weight: float,
    forces_weight: float,
):
    """Per-shard loss of ONE halo-decomposed system: energy squared
    error + mean squared force error over owned real atoms, with the
    psums riding the given mesh axis.  Shared by the single-system
    (:func:`make_halo_train_step`) and the dp-batched
    (:func:`make_halo_dp_train_step`) trainers."""

    def local_loss(params, pos_local, static_data, e_label, f_label, wshift):
        def local_energy(p_loc):
            win = _exchange_window(
                p_loc, axis, size, nl, h, wshift if periodic else None
            )
            d = dict(static_data)
            d[keys.POSITIONS] = win
            d = compute_edge_data(d, None)
            with halo_parallel(axis, size, nl, h, periodic):
                out = module_apply(params, d)
            return jnp.sum(out[keys.TOTAL_ENERGY])

        e_local, g_pos = jax.value_and_grad(local_energy)(pos_local)
        forces = -g_pos  # [nl, 3], exact per owned row
        energy = jax.lax.psum(e_local, axis)
        mask = static_data[keys.NODE_MASK][h : h + nl]
        n_real = jax.lax.psum(jnp.sum(mask), axis)
        sq = jnp.where(mask[:, None], (forces - f_label) ** 2, 0.0)
        loss_f = jax.lax.psum(jnp.sum(sq), axis) / (3.0 * n_real)
        loss_e = (energy - e_label) ** 2
        return energy_weight * loss_e + forces_weight * loss_f

    return local_loss


def make_halo_loss_fn(
    module_apply: Callable[[Dict, DataDict], DataDict],
    mesh: Mesh,
    geom: Dict[str, int],
    energy_weight: float = 1.0,
    forces_weight: float = 10.0,
    axis: str = GP_AXIS,
):
    """Evaluation-side halo loss: ``loss(params, stacked_batch, e_label,
    f_label_stacked[, wrap_shift])`` — the train-step loss without the
    gradient/optimizer, with params as an ARGUMENT (closure-captured
    sharded params would go stale across steps and cannot be lifted into
    the Manual mesh context).  Works on a gp-only or a (dp, gp) mesh —
    the dp axis, when present, just replicates."""
    nl, h = geom["n_local"], geom["halo"]
    periodic = bool(geom.get("periodic", False))
    size = int(mesh.shape[axis])

    local_loss = _make_halo_local_loss(
        module_apply, axis, size, nl, h, periodic,
        energy_weight, forces_weight,
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    def sharded(params, pos_stacked, data_stacked, e_label, f_stacked,
                wshift):
        local = {k: v[0] for k, v in data_stacked.items()}
        return local_loss(
            params, pos_stacked[0], local, e_label, f_stacked[0], wshift
        )

    @jax.jit
    def _loss(params, stacked_batch, e_label, f_label_stacked, wshift):
        data = {
            k: jnp.asarray(v)
            for k, v in stacked_batch.items()
            if k != keys.POSITIONS
        }
        pos = jnp.asarray(stacked_batch[keys.POSITIONS])
        return sharded(
            params, pos, data, e_label, f_label_stacked, wshift
        )

    def loss(params, stacked_batch, e_label, f_label_stacked,
             wrap_shift=None):
        ws = jnp.asarray(
            wrap_shift if wrap_shift is not None else np.zeros(3),
            dtype=jnp.asarray(stacked_batch[keys.POSITIONS]).dtype,
        )
        return _loss(
            params, stacked_batch, jnp.asarray(e_label),
            jnp.asarray(f_label_stacked), ws,
        )

    return loss


def make_halo_train_step(
    module_apply: Callable[[Dict, DataDict], DataDict],
    mesh: Mesh,
    geom: Dict[str, int],
    optimizer,
    energy_weight: float = 1.0,
    forces_weight: float = 10.0,
    axis: str = GP_AXIS,
):
    """Training ON one large halo-decomposed system (SURVEY.md §5.7):
    ``step(state, stacked_batch, e_label, f_label_stacked) ->
    (state, loss)`` where ``state = (params, opt_state)``.

    The loss is the global energy squared error plus the mean squared
    force error over owned real atoms.  Per step, each shard
    differentiates the replicated loss through ITS local contributions
    (forces themselves are an inner grad wrt positions, so this is
    grad-of-grad through the boundary ``ppermute``s — their transposes
    are ppermutes again and XLA schedules them on ICI), and the optimizer
    consumes the ``psum`` of the shard gradients — the same update a
    single device computing the whole system would apply
    (tests/test_halo.py::test_halo_train_step_matches_single_device).

    The reference has no analogue: its training path is
    molecule-batched only (reference run/train.py), and systems beyond
    one GPU's memory are untrainable there.
    """
    nl, h = geom["n_local"], geom["halo"]
    periodic = bool(geom.get("periodic", False))
    size = int(mesh.shape[axis])

    local_loss = _make_halo_local_loss(
        module_apply, axis, size, nl, h, periodic,
        energy_weight, forces_weight,
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def sharded_grads(params, pos_stacked, data_stacked, e_label, f_stacked,
                      wshift):
        local = {k: v[0] for k, v in data_stacked.items()}
        loss, grads = jax.value_and_grad(local_loss)(
            params, pos_stacked[0], local, e_label, f_stacked[0], wshift
        )
        # Each shard differentiates the replicated loss through its own
        # local contributions, but with ``check_vma=False`` the replicated
        # output seeds a unit cotangent on EVERY shard — so the per-shard
        # partial gradients come out scaled by the axis size, and their
        # pmean (not psum) is the exact total gradient.  Locked against
        # the single-device gradient in
        # tests/test_halo.py::test_halo_train_step_matches_single_device.
        return loss, jax.lax.pmean(grads, axis)

    @partial(jax.jit, static_argnums=())
    def _step(state, stacked_batch, e_label, f_label_stacked, wshift):
        params, opt_state = state
        data = {
            k: jnp.asarray(v)
            for k, v in stacked_batch.items()
            if k != keys.POSITIONS
        }
        pos = jnp.asarray(stacked_batch[keys.POSITIONS])
        loss, grads = sharded_grads(
            params, pos, data, e_label, f_label_stacked, wshift
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    def step(state, stacked_batch, e_label, f_label_stacked,
             wrap_shift=None):
        ws = jnp.asarray(
            wrap_shift if wrap_shift is not None else np.zeros(3),
            dtype=jnp.asarray(stacked_batch[keys.POSITIONS]).dtype,
        )
        return _step(state, stacked_batch, e_label, f_label_stacked, ws)

    return step


def stack_halo_systems(
    batches: List[Dict[str, np.ndarray]],
    geoms: List[Dict[str, int]],
) -> Tuple[Dict[str, np.ndarray], Dict[str, int]]:
    """Stack per-system halo partitions along a leading dp axis.

    Every system must have been partitioned to the SAME geometry
    (n_local/halo/edge capacity — pass ``edge_cap`` to
    :func:`halo_partition` and use equal-sized systems, the common case
    for supercell training).  Returns ([dp, n_shards, ...] batch, geom).
    """
    g0 = {k: geoms[0][k] for k in ("n_local", "halo", "window")}
    for g in geoms[1:]:
        if {k: g[k] for k in g0} != g0:
            raise ValueError(
                f"halo geometries differ across systems: {g0} vs {g}"
            )
    kset = set(batches[0])
    for b in batches[1:]:
        if set(b) != kset or any(
            b[k].shape != batches[0][k].shape for k in kset
        ):
            raise ValueError(
                "stack_halo_systems: per-system shapes differ; pass "
                "edge_cap (and equal-sized systems) to halo_partition"
            )
    out = {k: np.stack([b[k] for b in batches]) for k in kset}
    geom = dict(geoms[0])
    geom["dp"] = len(batches)
    return out, geom


def make_halo_dp_train_step(
    module_apply: Callable[[Dict, DataDict], DataDict],
    mesh: Mesh,
    geom: Dict[str, int],
    optimizer,
    energy_weight: float = 1.0,
    forces_weight: float = 10.0,
    dp_axis: str = "dp",
    axis: str = GP_AXIS,
):
    """2-D dp x halo training: a BATCH of large systems, each
    halo-decomposed over the ``axis`` (gp) mesh dimension, replicated
    training over the ``dp_axis`` dimension — the TPU-idiomatic
    composition of data parallelism with spatial decomposition on one
    device mesh (mesh shape ``(dp, gp)``; gradients ride a single
    2-axis pmean over ICI).

    ``step(state, stacked_batch, e_labels, f_labels_stacked[, wrap_shifts])``
    where every batch array carries a leading [dp, n_shards, ...] pair
    (see :func:`stack_halo_systems`), ``e_labels`` is [dp] and
    ``wrap_shifts`` [dp, 3].  The loss is the dp-mean of the per-system
    halo losses; the parameter update equals what a single device
    computing all systems would apply.

    Neither capability exists in the reference (its only parallelism is
    molecule-batch DDP, reference run/train.py:167-190); SURVEY.md §2.3
    names this mesh composition as the TPU-native target.
    """
    nl, h = geom["n_local"], geom["halo"]
    periodic = bool(geom.get("periodic", False))
    size = int(mesh.shape[axis])

    local_loss = _make_halo_local_loss(
        module_apply, axis, size, nl, h, periodic,
        energy_weight, forces_weight,
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(dp_axis, axis), P(dp_axis, axis), P(dp_axis),
                  P(dp_axis, axis), P(dp_axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def sharded_grads(params, pos_stacked, data_stacked, e_labels,
                      f_stacked, wshifts):
        local = {k: v[0, 0] for k, v in data_stacked.items()}
        # per-(replica, shard) partial gradient of THIS system's loss;
        # the gp-axis collectives live inside local_loss
        loss_d, grads = jax.value_and_grad(local_loss)(
            params, pos_stacked[0, 0], local, e_labels[0],
            f_stacked[0, 0], wshifts[0],
        )
        # loss_d is gp-replicated but differs per dp replica: the
        # training loss is its dp-mean.  As in make_halo_train_step,
        # check_vma=False seeds a unit cotangent on every program, so
        # the per-shard partials come out scaled by the gp size and
        # their gp-pmean is the exact per-system gradient; the dp-pmean
        # then takes the batch mean.  One fused 2-axis pmean does both.
        return (
            jax.lax.pmean(loss_d, dp_axis),
            jax.lax.pmean(grads, (axis, dp_axis)),
        )

    @jax.jit
    def _step(state, stacked_batch, e_labels, f_labels_stacked, wshifts):
        params, opt_state = state
        data = {
            k: jnp.asarray(v)
            for k, v in stacked_batch.items()
            if k != keys.POSITIONS
        }
        pos = jnp.asarray(stacked_batch[keys.POSITIONS])
        loss, grads = sharded_grads(
            params, pos, data, e_labels, f_labels_stacked, wshifts
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    def step(state, stacked_batch, e_labels, f_labels_stacked,
             wrap_shifts=None):
        dp = stacked_batch[keys.POSITIONS].shape[0]
        ws = jnp.asarray(
            wrap_shifts if wrap_shifts is not None else np.zeros((dp, 3)),
            dtype=jnp.asarray(stacked_batch[keys.POSITIONS]).dtype,
        )
        return _step(state, stacked_batch, jnp.asarray(e_labels),
                     f_labels_stacked, ws)

    return step


def prepare_halo_system(
    atomic_numbers: np.ndarray,
    positions: np.ndarray,
    cutoff: float,
    n_shards: int,
    cell=None,
    pbc=None,
    halo: Optional[int] = None,
    edge_cap: Optional[int] = None,
    margin: float = 1.3,
    nl_exact: Optional[int] = None,
    min_halo: Optional[int] = None,
    min_edge_cap: Optional[int] = None,
) -> Tuple[Dict[str, np.ndarray], Dict[str, int], np.ndarray,
           Optional[np.ndarray], int, int]:
    """Host pipeline turning one large (possibly periodic) system into a
    fixed-capacity halo partition: spatial sort along the widest
    direction, neighbor list, sort-axis image unwrap onto the ring,
    center-sorted edges, :func:`halo_partition`.

    Returns ``(stacked, geom, perm, wrap_shift, halo_used, edge_cap_used)``
    where ``perm`` maps input order -> sorted order (labels must follow
    it) and ``wrap_shift`` is the sort-axis lattice vector (None for free
    systems).  Pass explicit ``halo``/``edge_cap``/``nl_exact`` to force a
    uniform geometry across systems (training over a dataset requires it,
    :func:`stack_halo_systems`); leave None to size from this system with
    ``margin`` head-room.  Shared by :class:`HaloCalculator` and the
    config-driven halo trainer (run/train.py run_halo_train).
    """
    from ..ops.radius_graph import radius_graph_np, radius_graph_pbc_np
    from ..ops.spatial_sort import index_reach, sort_axis_pbc

    z = np.asarray(atomic_numbers)
    pos = np.asarray(positions, dtype=np.float64)
    n = len(z)
    has_cell = cell is not None and pbc is not None and np.any(pbc)
    if nl_exact is None:
        nl_exact = _ceil_to((n + n_shards - 1) // n_shards, 8)

    res_offs = None
    wrap_shift = None
    if has_cell:
        cell = np.asarray(cell, dtype=float)
        axis_i = sort_axis_pbc(cell, pbc, pos)
        frac = pos @ np.linalg.inv(cell)
        perm = np.argsort(frac[:, axis_i], kind="stable")
        z_s, pos_s = z[perm], pos[perm]
        ei, offs = radius_graph_pbc_np(pos_s, cell, pbc, cutoff)
        order = np.argsort(ei[0], kind="stable")
        ei, offs = ei[:, order], offs[order]
        # sort-axis images become unwrapped RING rows (period = the
        # padded global row count); other axes stay as offsets
        o_a = np.round(offs[:, axis_i]).astype(np.int64)
        period = n_shards * nl_exact
        ei = np.stack([ei[0], ei[1] + o_a * period])
        res_offs = offs.astype(np.float32)
        res_offs[:, axis_i] -= o_a
        wrap_shift = cell[axis_i]
    else:
        axis_i = int(np.argmax(pos.max(0) - pos.min(0)))
        perm = np.argsort(pos[:, axis_i], kind="stable")
        z_s, pos_s = z[perm], pos[perm]
        ei, _ = radius_graph_np(pos_s, cutoff)
        order = np.argsort(ei[0], kind="stable")
        ei = ei[:, order]

    reach = index_reach(ei[0], ei[1])
    if halo is None:
        # auto-size with head-room; min_halo keeps a caller's running
        # geometry monotone (MD: a density fluctuation costs one
        # recompile, never a crash)
        halo = _ceil_to(max(int(reach * margin), 8), 8)
        if min_halo is not None and reach < min_halo:
            halo = min_halo
    elif reach >= halo:
        raise ValueError(
            f"halo={halo} rows < measured index reach {reach}; widen "
            f"halo (or let it auto-size)"
        )
    if edge_cap is None:
        need = max(
            _ceil_to(
                int(np.bincount(ei[0] // nl_exact,
                                minlength=n_shards).max())
                if ei.shape[1] else 1,
                128,
            ),
            128,
        )
        edge_cap = _ceil_to(int(need * margin), 128)
        if min_edge_cap is not None:
            edge_cap = max(edge_cap, min_edge_cap)
    stacked, geom = halo_partition(
        z_s, pos_s, ei, n_shards, halo,
        cell_offsets=res_offs,
        edge_cap=edge_cap,
        periodic=has_cell,
    )
    if has_cell:
        stacked[keys.CELL] = np.broadcast_to(
            cell.astype(np.float32), (n_shards, 1, 3, 3)
        ).copy()
    return stacked, geom, perm, wrap_shift, halo, edge_cap


def scatter_labels_to_shards(
    stacked: Dict[str, np.ndarray],
    geom: Dict[str, int],
    values_sorted: np.ndarray,
) -> np.ndarray:
    """Spread per-atom labels (already in sorted order) into the owned-row
    layout of a halo partition: the exact inverse of how
    :class:`HaloCalculator` reads forces back.  Returns
    [n_shards, n_local, *value_dims] with zeros on padding rows."""
    nl, h = geom["n_local"], geom["halo"]
    n_shards = stacked[keys.NODE_MASK].shape[0]
    nm = stacked[keys.NODE_MASK][:, h : h + nl].reshape(-1)
    out = np.zeros((n_shards * nl,) + values_sorted.shape[1:],
                   dtype=np.asarray(values_sorted).dtype)
    out[nm] = values_sorted
    return out.reshape((n_shards, nl) + values_sorted.shape[1:])


class HaloCalculator:
    """Multi-chip single-system calculator: MD on one system too large
    for a single chip (beyond the reference, whose largest MD system
    must fit one GPU).

    Per force call the host sorts atoms spatially (the spatial-order
    contract of :func:`halo_partition`), builds the neighbor list,
    partitions into fixed-capacity shard windows and runs
    :func:`make_halo_forward` over the mesh — so a moving system reuses
    ONE compiled program step to step.  Forces come back exact per owned
    atom (tests/test_halo.py) and are unsorted to input order.

    PERIODIC supercells (the BASELINE.md config-5 workload) sort by
    fractional coordinate along the widest cell direction; wrap edges
    carry unwrapped ring rows and the boundary exchange closes
    periodically with the lattice-vector shift (``_exchange_window``).
    Residual images on the other axes ride CELL_OFFSETS.

    Drop-in for :class:`interface.calculator.Calculator` in the MD
    driver's ForceField for ``calculate(z, pos[, cell, pbc, charge,
    spin])``.  Ewald models decompose exactly (the k-space structure
    factors are per-shard partial sums psum'd over the gp axis,
    models/ewald.py), as do charge/spin attention embeddings
    (models/electronic.py).  Not supported: virial output (use the
    single-chip Calculator for NPT).

    ``pallas="mega"`` runs each shard's message blocks through the
    fused one-hot MXU kernels (ops/pallas_message) — the per-shard
    window is spatially sorted and local, exactly the kernels'
    banded-window contract (:func:`apply_halo_kernel_layout`).
    """

    def __init__(
        self,
        ckpt_file: str,
        n_shards: Optional[int] = None,
        halo: Optional[int] = None,
        use_ema: bool = True,
        margin: float = 1.3,
        pallas: Optional[str] = None,
        pallas_layout: Tuple[int, int] = (256, 1024),
    ) -> None:
        import jax as _jax

        from ..run.test import load_model_from_checkpoint
        from ..training.trainer import restore_params
        from ..utils.qc import get_default_units
        from .mesh import make_mesh

        if pallas not in (None, False, "mega", "mega-xb"):
            raise ValueError(
                f"pallas={pallas!r}: use None (XLA message path) or "
                f"'mega'/'mega-xb' (the v2 kernel is not halo-aware)"
            )
        module, extra, cutoff, blob, mc = load_model_from_checkpoint(
            ckpt_file
        )
        self.module = module
        self.cutoff = float(cutoff)
        self._blob = blob
        self._mc = mc
        self._use_ema = use_ema
        self.units = get_default_units()
        self.n_shards = int(n_shards or _jax.device_count())
        self.mesh = make_mesh(self.n_shards, axis_names=(GP_AXIS,))
        self._halo = halo
        self._edge_cap: Optional[int] = None
        self._margin = margin
        self._pallas = pallas or None
        self._k_bn, self._k_chunk = int(pallas_layout[0]), int(pallas_layout[1])
        self._slot_cap: Optional[int] = None
        self._mxc: Optional[int] = None
        self._params = None
        self._restore = restore_params
        self._fwd_cache: Dict = {}
        self.last_virial = None

    def _ensure_params(self, probe_batch):
        if self._params is None:
            from ..models.model import init_params

            # charge/spin-embedded models only create those parameters
            # when the keys are present — match the checkpoint structure.
            # PBC-Ewald models read CELL unconditionally at init
            # (models/ewald.py EwaldInitialPBC), so the probe carries an
            # inert identity cell.
            mk = self._mc["model_kwargs"]
            if (
                "ewald" in str(self._mc.get("model_name", "")).lower()
                and mk.get("use_pbc") is not False
                and keys.CELL not in probe_batch
            ):
                n_g = probe_batch[keys.GRAPH_MASK].shape[0]
                n_e = probe_batch[keys.EDGE_MASK].shape[0]
                probe_batch = dict(
                    probe_batch,
                    **{
                        keys.CELL: np.broadcast_to(
                            np.eye(3, dtype=np.float32), (n_g, 3, 3)
                        ).copy(),
                        keys.PBC: np.zeros((n_g, 3), bool),
                        keys.CELL_OFFSETS: np.zeros(
                            (n_e, 3), np.float32
                        ),
                    },
                )
            if mk.get("charge_embed"):
                probe_batch = dict(
                    probe_batch,
                    **{keys.TOTAL_CHARGE: np.zeros(
                        probe_batch[keys.GRAPH_MASK].shape[0], np.int32
                    )},
                )
            if mk.get("spin_embed"):
                probe_batch = dict(
                    probe_batch,
                    **{keys.TOTAL_SPIN: np.zeros(
                        probe_batch[keys.GRAPH_MASK].shape[0], np.int32
                    )},
                )
            params = init_params(self.module, probe_batch)
            key = (
                "ema_model"
                if (self._use_ema and "ema_model" in self._blob)
                else "model"
            )
            self._params = self._restore(params, self._blob[key])
        return self._params

    def _shard_module(self, geom, max_chunks):
        """The module each shard applies: the checkpoint's stack, or its
        mega-kernel twin built for THIS halo geometry (parameter
        structures are identical, so the restored params apply as-is)."""
        if self._pallas is None:
            return self.module
        from ..models.model import resolve_model

        kw = dict(self._mc["model_kwargs"])
        kw["use_pallas_scatter"] = self._pallas
        kw["pallas_layout"] = (
            min(self._k_bn, geom["n_local"]), self._k_chunk,
            geom["halo"], max_chunks,
        )
        module, _, _ = resolve_model(self._mc["model_name"], **kw)
        return module

    def calculate(
        self,
        atomic_numbers: np.ndarray,
        positions: np.ndarray,
        cell=None,
        pbc=None,
        charge=None,
        spin=None,
    ) -> Dict[str, np.ndarray]:
        z = np.asarray(atomic_numbers)
        pos = np.asarray(positions, dtype=np.float64)
        n = len(z)
        has_cell = cell is not None and pbc is not None and np.any(pbc)
        stacked, geom, perm, wrap_shift, self._halo, self._edge_cap = (
            prepare_halo_system(
                z, pos, self.cutoff, self.n_shards, cell=cell, pbc=pbc,
                margin=self._margin,
                min_halo=self._halo, min_edge_cap=self._edge_cap,
            )
        )
        if charge is not None:
            stacked[keys.TOTAL_CHARGE] = np.full(
                (self.n_shards, 1), charge, np.int32
            )
        if spin is not None:
            stacked[keys.TOTAL_SPIN] = np.full(
                (self.n_shards, 1), spin, np.int32
            )
        if self._pallas is not None:
            stacked, self._slot_cap, self._mxc = apply_halo_kernel_layout(
                stacked, geom,
                {
                    "block_nodes": min(self._k_bn, geom["n_local"]),
                    "chunk": self._k_chunk,
                },
                min_slot_cap=self._slot_cap,
                min_max_chunks=self._mxc,
                margin=self._margin,
            )
        z_s, pos_s = z[perm], pos[perm]
        sig = (
            geom["n_local"], geom["halo"], self._edge_cap, has_cell,
            charge is not None, spin is not None,
            self._slot_cap, self._mxc,
        )
        if sig not in self._fwd_cache:
            from ..data.batching import collate
            from ..data.datapoint import Datapoint
            from ..ops.radius_graph import radius_graph_np

            m = min(n, 16)
            ei_p, _ = radius_graph_np(pos_s[:m], self.cutoff)
            params = self._ensure_params(
                collate([Datapoint(z_s[:m], pos_s[:m], edge_index=ei_p)])
            )
            module = self._shard_module(geom, self._mxc)
            apply_bound = lambda d: module.apply({"params": params}, d)
            self._fwd_cache[sig] = make_halo_forward(
                apply_bound, self.mesh, geom, GP_AXIS
            )
        e, f = self._fwd_cache[sig](
            stacked, compute_forces=True, wrap_shift=wrap_shift
        )
        nl, h = geom["n_local"], geom["halo"]
        nm = stacked[keys.NODE_MASK][:, h : h + nl].reshape(-1)
        f_sorted = np.asarray(f).reshape(-1, 3)[nm]
        forces = np.empty_like(f_sorted)
        forces[perm] = f_sorted
        return {
            keys.TOTAL_ENERGY: float(np.asarray(e)),
            keys.FORCES: forces,
        }


def comm_bytes_per_block(
    geom: Dict[str, int], feat_dim: int, n_nodes: int, itemsize: int = 4
) -> Dict[str, int]:
    """Analytic per-aggregation communication volume: halo exchange vs the
    GSPMD edge-sharding all-reduce (recorded in PERF.md)."""
    return {
        "halo_exchange": 2 * geom["halo"] * feat_dim * itemsize,
        "gspmd_allreduce": n_nodes * feat_dim * itemsize,
    }
