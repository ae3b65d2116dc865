"""Edge-data preprocessing and autodiff properties (forces / virial).

TPU-native counterpart of /root/reference/xequinet/nn/basic.py:60-238.
Instead of taping gradients with autograd, the model forward is expressed
as a pure function of (positions, strain); forces and virial are
``-jax.grad`` of the masked total energy — including the reference's
strain trick (symmetrized strain applied to positions and cell,
nn/basic.py:93-107).  Double differentiation (force loss -> grad of grad)
falls out of composing jax transforms.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import keys

Array = jnp.ndarray
DataDict = Dict[str, Array]


def compute_edge_data(
    data: DataDict,
    strain: Optional[Array] = None,
) -> DataDict:
    """Compute edge vectors/lengths (+ apply strain) from positions.

    Mirrors reference nn/basic.py:60-140 with static shapes: padding edges
    (edge_mask False) produce exactly zero vectors and zero lengths, with
    NaN-safe gradients via the double-where trick.
    """
    data = dict(data)
    pos = data[keys.POSITIONS]
    edge_index = data[keys.EDGE_INDEX]
    center_idx = edge_index[keys.CENTER_IDX]
    neighbor_idx = edge_index[keys.NEIGHBOR_IDX]
    edge_mask = data[keys.EDGE_MASK]
    batch = data[keys.BATCH]

    has_cell = keys.CELL in data
    cell = data.get(keys.CELL)

    # periodic ghost images (ops/spatial_sort.ghost_layout_pbc): ghost
    # rows' positions are DERIVED here — pos[real] + shift @ cell — so
    # force/virial gradients flow to the owning real atom; the input
    # values of ghost position rows are ignored.  Derivation happens
    # BEFORE the strain is applied: pos·ε then strains the shift term by
    # exactly cell·ε, keeping the strain-trick virial exact.
    node_graph = batch
    if keys.GHOST_MAP in data:
        gm = data[keys.GHOST_MAP]
        node_graph = jnp.take(batch, gm, axis=0)  # ghosts: owner's graph
        gs = data[keys.GHOST_SHIFT].astype(pos.dtype)
        cell_per_node = jnp.take(cell, node_graph, axis=0)
        pos = jnp.take(pos, gm, axis=0) + jnp.einsum(
            "ni,nij->nj", gs, cell_per_node
        )

    if strain is not None:
        symm_strain = 0.5 * (strain + jnp.swapaxes(strain, -1, -2))  # [G,3,3]
        expanded = jnp.take(symm_strain, node_graph, axis=0)  # [N,3,3]
        pos = pos + jnp.einsum("ni,nij->nj", pos, expanded)
        if has_cell:
            cell = cell + jnp.einsum("gij,gjk->gik", cell, symm_strain)
        data[keys.STRAIN] = strain

    data[keys.POSITIONS] = pos
    if has_cell:
        data[keys.CELL] = cell

    vectors = jnp.take(pos, center_idx, axis=0) - jnp.take(pos, neighbor_idx, axis=0)

    if has_cell:
        cell_offsets = data[keys.CELL_OFFSETS].astype(pos.dtype)
        batch_neighbor = jnp.take(node_graph, neighbor_idx, axis=0)
        cell_per_edge = jnp.take(cell, batch_neighbor, axis=0)  # [E,3,3]
        shifts = jnp.einsum("ni,nij->nj", cell_offsets, cell_per_edge)
        vectors = vectors - shifts

    # padding edges have center == neighbor == 0 -> zero vector; norm grad
    # at 0 is NaN, so guard with the double-where trick
    mask = edge_mask[:, None]
    vectors = jnp.where(mask, vectors, 0.0)
    safe_vec = jnp.where(mask, vectors, 1.0)
    dist = jnp.where(edge_mask, jnp.linalg.norm(safe_vec, axis=-1), 0.0)

    # Verlet skin list: the edge list was built at cutoff+skin; exclude
    # pairs currently beyond the model cutoff.  Every downstream edge
    # contribution (XLA segment_sum, v2 and mega kernels) is gated on
    # EDGE_MASK, so the same compiled program serves all steps between
    # rebuilds (interface/calculator.py skin path).
    if keys.EDGE_CUTOFF in data:
        rc = jnp.reshape(data[keys.EDGE_CUTOFF], ()).astype(dist.dtype)
        edge_mask = edge_mask & (dist <= rc)
        data[keys.EDGE_MASK] = edge_mask

    data[keys.EDGE_VECTOR] = vectors
    data[keys.EDGE_LENGTH] = dist
    return data


def make_forward(
    apply_fn: Callable[[DataDict], DataDict],
    extra_properties: Optional[List[str]] = None,
):
    """Build the full forward: edge data -> blocks -> autodiff properties.

    ``apply_fn(data) -> data`` runs the model blocks (embedding through
    output heads) and must populate TOTAL_ENERGY when forces/virial are
    requested.  Returns ``forward(data, compute_forces, compute_virial)``
    where the compute_* switches are *static* (each combination is its own
    XLA program, mirroring the reference's python-level branches at
    nn/basic.py:202-238).
    """

    def run(data: DataDict, strain: Optional[Array]) -> DataDict:
        data = compute_edge_data(data, strain)
        return apply_fn(data)

    def energy_of(pos: Array, strain: Optional[Array], data: DataDict):
        d = dict(data)
        d[keys.POSITIONS] = pos
        out = run(d, strain)
        graph_mask = data[keys.GRAPH_MASK]
        total = jnp.sum(
            jnp.where(graph_mask, out[keys.TOTAL_ENERGY], 0.0)
        )
        return total, out

    def forward(
        data: DataDict,
        compute_forces: bool = True,
        compute_virial: bool = False,
    ) -> DataDict:
        pos = data[keys.POSITIONS]
        n_graphs = data[keys.GRAPH_MASK].shape[0]
        strain = (
            jnp.zeros((n_graphs, 3, 3), dtype=pos.dtype)
            if compute_virial
            else None
        )

        if compute_forces and compute_virial:
            grad_fn = jax.grad(energy_of, argnums=(0, 1), has_aux=True)
            (pos_grad, strain_grad), out = grad_fn(pos, strain, data)
            out[keys.FORCES] = -pos_grad
            out[keys.VIRIAL] = -strain_grad
        elif compute_forces:
            grad_fn = jax.grad(energy_of, argnums=0, has_aux=True)
            pos_grad, out = grad_fn(pos, None, data)
            out[keys.FORCES] = -pos_grad
        elif compute_virial:
            grad_fn = jax.grad(energy_of, argnums=1, has_aux=True)
            strain_grad, out = grad_fn(pos, strain, data)
            out[keys.VIRIAL] = -strain_grad
        else:
            out = run(dict(data), None)

        if extra_properties:
            pass  # heads already wrote their fields into `out`
        return out

    return forward
