"""Neighbor-list construction: cutoff radius graphs, with and without PBC.

TPU-native replacement for torch-cluster's ``radius_graph`` and the
reference's batched PBC neighbor search
(/root/reference/xequinet/data/radius_graph.py).  Two families:

* host-side numpy builders used by the data pipeline (variable sizes are
  fine there; results are padded to static capacities before device
  transfer), and
* jit-able fixed-capacity builders for the MD/inference path where the
  neighbor list must be rebuilt on device every step
  (reference interface/jit_model.py:189-195 builds in-graph lists too).

Convention matches the reference: edge (center i, neighbor j) for every
ordered pair with 0 < |r_i - r_j + shift| < cutoff; vectors point from
neighbor to center... precisely, vectors = pos[center] - pos[neighbor]
- offsets @ cell (reference nn/basic.py:109-128).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Host-side (numpy) builders — data pipeline
# ---------------------------------------------------------------------------


def radius_graph_np(
    pos: np.ndarray, cutoff: float, use_native: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """Non-PBC neighbor search on host: O(N) C++ cell lists when the
    native library builds (ops/native.py), O(N^2) numpy otherwise.

    Returns (edge_index [2, E], cell_offsets [E, 3] zeros), edges sorted
    center-major.
    """
    pos = np.asarray(pos, dtype=np.float64)
    if use_native:
        from .native import radius_graph_native

        res = radius_graph_native(pos, cutoff)
        if res is not None:
            return res
    diff = pos[:, None, :] - pos[None, :, :]
    dist2 = np.einsum("ijk,ijk->ij", diff, diff)
    n = pos.shape[0]
    mask = (dist2 < cutoff * cutoff) & ~np.eye(n, dtype=bool)
    center, neighbor = np.nonzero(mask)
    edge_index = np.stack([center, neighbor]).astype(np.int64)
    return edge_index, np.zeros((edge_index.shape[1], 3), dtype=np.float64)


def _num_repeats(cell: np.ndarray, pbc: np.ndarray, cutoff: float) -> np.ndarray:
    """Cell replications needed per lattice direction: distance between
    opposite cell faces must cover the cutoff (same math as reference
    data/radius_graph.py:61-89, re-derived: n_k = ceil(cutoff * |b_k| / 2π)
    with b the reciprocal vectors ... equivalently cutoff / plane_distance)."""
    # plane distance along direction k = |det(cell)| / |a_i x a_j|
    vol = np.abs(np.linalg.det(cell))
    reps = np.zeros(3, dtype=np.int64)
    for k in range(3):
        i, j = (k + 1) % 3, (k + 2) % 3
        cross = np.cross(cell[i], cell[j])
        plane_d = vol / np.linalg.norm(cross)
        reps[k] = int(np.ceil(cutoff / plane_d)) if pbc[k] else 0
    return reps


def wrap_positions(
    pos: np.ndarray, cell: np.ndarray, pbc: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Wrap positions into the unit cell; returns (wrapped, integer shifts)
    with pos = wrapped + shifts @ cell (reference data/radius_graph.py:6-32)."""
    frac = pos @ np.linalg.inv(cell)
    shifts = np.floor(frac)
    shifts[:, ~pbc.astype(bool)] = 0.0
    wrapped = (frac - shifts) @ cell
    return wrapped, shifts.astype(np.int64)


def radius_graph_pbc_np(
    pos: np.ndarray,
    cell: np.ndarray,
    pbc: np.ndarray,
    cutoff: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """PBC neighbor search for a single graph on host.

    Returns (edge_index [2, E], cell_offsets [E, 3] ints) such that
    vec = pos[center] - pos[neighbor] - offsets @ cell has |vec| < cutoff.
    Offsets are corrected for the wrap shift so they apply to the
    *original* (unwrapped) positions, like reference
    data/radius_graph.py:157-192.
    """
    pos = np.asarray(pos, dtype=np.float64)
    cell = np.asarray(cell, dtype=np.float64).reshape(3, 3)
    pbc = np.asarray(pbc).reshape(3).astype(bool)
    n = pos.shape[0]
    if not pbc.any():
        return radius_graph_np(pos, cutoff)

    wrapped, wrap_shifts = wrap_positions(pos, cell, pbc)
    reps = _num_repeats(cell, pbc, cutoff)

    from .native import radius_graph_pbc_native

    res = radius_graph_pbc_native(wrapped, cell, reps, cutoff)
    if res is not None:
        ei, cell_offsets = res
        center, neighbor = ei[0], ei[1]
        cell_offsets = cell_offsets + wrap_shifts[center] - wrap_shifts[neighbor]
        order = np.argsort(center, kind="stable")
        return (
            np.stack([center[order], neighbor[order]]),
            cell_offsets[order],
        )

    ranges = [np.arange(-r, r + 1) for r in reps]
    offsets = np.stack(
        np.meshgrid(*ranges, indexing="ij"), axis=-1
    ).reshape(-1, 3)  # [n_img, 3]
    shift_vecs = offsets @ cell  # [n_img, 3]

    # image positions of every neighbor candidate
    img_pos = wrapped[None, :, :] + shift_vecs[:, None, :]  # [n_img, N, 3]
    edges_c, edges_n, edges_o = [], [], []
    c2 = cutoff * cutoff
    for a, off in enumerate(offsets):
        d = wrapped[:, None, :] - img_pos[a][None, :, :]  # center - neighbor_img
        dist2 = np.einsum("ijk,ijk->ij", d, d)
        mask = dist2 < c2
        if (off == 0).all():
            np.fill_diagonal(mask, False)
        ci, ni = np.nonzero(mask)
        if ci.size:
            edges_c.append(ci)
            edges_n.append(ni)
            edges_o.append(np.broadcast_to(off, (ci.size, 3)))
    if not edges_c:
        return (
            np.zeros((2, 0), dtype=np.int64),
            np.zeros((0, 3), dtype=np.int64),
        )
    center = np.concatenate(edges_c)
    neighbor = np.concatenate(edges_n)
    cell_offsets = np.concatenate(edges_o).astype(np.int64)
    # correct for the wrapping so offsets apply to original positions:
    # orig = wrapped + wrap_shift @ cell  =>
    # orig_c - orig_n - O'@cell = wrapped_c - wrapped_n - O@cell
    # with O' = O + wrap_shift_c - wrap_shift_n
    cell_offsets = cell_offsets + wrap_shifts[center] - wrap_shifts[neighbor]
    return np.stack([center, neighbor]), cell_offsets


# ---------------------------------------------------------------------------
# Device-side (jit-able) builders — MD / inference path
# ---------------------------------------------------------------------------


def radius_graph_fixed(
    pos: jnp.ndarray,
    cutoff: float,
    max_edges: int,
    node_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Jit-able non-PBC neighbor search with a fixed edge capacity.

    Returns (edge_index [2, max_edges], edge_mask [max_edges],
    n_edges_found []).  Overflow is detectable via n_edges_found >
    max_edges.  O(N^2) masked distance matrix — appropriate for molecular
    sizes; use the celllist path for large periodic systems.
    """
    n = pos.shape[0]
    diff = pos[:, None, :] - pos[None, :, :]
    dist2 = jnp.sum(diff * diff, axis=-1)
    valid = (dist2 < cutoff * cutoff) & ~jnp.eye(n, dtype=bool)
    if node_mask is not None:
        valid = valid & node_mask[:, None] & node_mask[None, :]
    flat = valid.reshape(-1)
    n_found = jnp.sum(flat.astype(jnp.int32))
    # stable top-k trick: argsort puts True (1) first when negated
    order = jnp.argsort(~flat, stable=True)[:max_edges]
    center = order // n
    neighbor = order % n
    edge_mask = jnp.take(flat, order)
    # padding edges point at the LAST node slot: real edges are emitted in
    # flat (center-major) order, so center indices stay sorted — required
    # by the indices_are_sorted fast path in the scatter ops
    center = jnp.where(edge_mask, center, n - 1)
    neighbor = jnp.where(edge_mask, neighbor, n - 1)
    return jnp.stack([center, neighbor]).astype(jnp.int32), edge_mask, n_found


def radius_graph_pbc_fixed(
    pos: jnp.ndarray,
    cell: jnp.ndarray,
    pbc: jnp.ndarray,
    cutoff: float,
    max_edges: int,
    max_reps: int = 1,
    node_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Jit-able PBC neighbor search with static capacities — the in-graph
    builder for the self-contained deployment export (the reference builds
    its GROMACS model's list in-graph too, interface/jit_model.py:189-195
    via data/radius_graph.py:195-275).

    The image grid is static: all integer offsets in [-max_reps, max_reps]^3.
    Which images are *active* is decided dynamically from the cell (the
    reference's ceil(cutoff/plane_distance) math) — an image whose offset
    exceeds the required replication, or lies along a non-periodic axis, is
    masked out.  ``n_edges_found > max_edges`` or a required replication
    ``needed_reps > max_reps`` signal capacity overflow; BOTH are returned
    so callers can validate — images beyond the static grid are NOT
    generated, so an unchecked reps overflow means silently missing edges.

    Returns (edge_index [2, max_edges], edge_mask, cell_offsets
    [max_edges, 3] float, n_edges_found, needed_reps [3] int32).  Edges
    are emitted center-major (sorted centers).
    """
    n = pos.shape[0]
    # required replications per axis: cutoff / plane distance
    vol = jnp.abs(jnp.linalg.det(cell))
    crosses = jnp.stack(
        [
            jnp.cross(cell[1], cell[2]),
            jnp.cross(cell[2], cell[0]),
            jnp.cross(cell[0], cell[1]),
        ]
    )  # [3, 3]
    plane_d = vol / jnp.linalg.norm(crosses, axis=-1)  # [3]
    needed = jnp.where(
        pbc, jnp.ceil(cutoff / plane_d).astype(jnp.int32), 0
    )  # [3]

    r = np.arange(-max_reps, max_reps + 1)
    offsets = np.stack(
        np.meshgrid(r, r, r, indexing="ij"), axis=-1
    ).reshape(-1, 3)  # [n_img, 3] static
    offsets_j = jnp.asarray(offsets, dtype=jnp.int32)
    img_active = jnp.all(jnp.abs(offsets_j) <= needed[None, :], axis=-1)  # [n_img]

    shift_vecs = offsets_j.astype(pos.dtype) @ cell  # [n_img, 3]
    # center-major layout: valid[center, neighbor, img]
    d = (
        pos[:, None, None, :]
        - pos[None, :, None, :]
        - shift_vecs[None, None, :, :]
    )  # [N, N, n_img, 3]
    dist2 = jnp.sum(d * d, axis=-1)
    valid = (dist2 < cutoff * cutoff) & (dist2 > 1e-8)
    valid = valid & img_active[None, None, :]
    if node_mask is not None:
        valid = valid & node_mask[:, None, None] & node_mask[None, :, None]
    n_img = offsets.shape[0]
    flat = valid.reshape(-1)
    n_found = jnp.sum(flat.astype(jnp.int32))
    order = jnp.argsort(~flat, stable=True)[:max_edges]
    center = order // (n * n_img)
    rem = order % (n * n_img)
    neighbor = rem // n_img
    img = rem % n_img
    edge_mask = jnp.take(flat, order)
    center = jnp.where(edge_mask, center, n - 1)
    neighbor = jnp.where(edge_mask, neighbor, n - 1)
    cell_offsets = jnp.where(
        edge_mask[:, None], jnp.take(offsets_j, img, axis=0), 0
    ).astype(pos.dtype)
    return (
        jnp.stack([center, neighbor]).astype(jnp.int32),
        edge_mask,
        cell_offsets,
        n_found,
        needed,
    )
