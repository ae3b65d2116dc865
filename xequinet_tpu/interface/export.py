"""`xeq export`: ahead-of-time export of the jitted forward.

TPU-native replacement for the reference's TorchScript deployment path
(/root/reference/xequinet/run/jit_script.py + interface/jit_model.py).
Instead of a TorchScript archive consumed by the LAMMPS/GROMACS C++
plugins, we export:

* a serialized StableHLO module of the batchless forward (fixed
  max_atoms/max_edges capacities) via ``jax.export`` — a standard
  portable artifact: any XLA runtime that speaks StableHLO (e.g. the
  PjRt C API from C++, or ``jax.export.deserialize`` from Python, which
  is what ``load_exported`` below and the tests exercise) can consume
  it, plus
* a JSON manifest with the same metadata the reference stores as
  extra_files (cutoff radius, n_species, periodic table, unit style;
  jit_script.py:73-86).

Export modes mirror the reference's three deployment models
(interface/jit_model.py:219-237):

* ``energy``  — XPaiNNLMP analogue: positions/atomic numbers/pre-built
  neighbor list in, energy/forces[/virial] out; with ``periodic=True``
  the signature additionally takes cell + integer cell offsets.
* ``dipole``  — XPaiNNDipole analogue: atomic charges + total dipole.
* ``gmx``     — XPaiNNGMX analogue (jit_model.py:148-216): self-contained
  ``(positions, atomic_numbers, box, pbc) -> (energy, forces)`` that
  builds its own neighbor list *inside the exported graph*
  (ops/radius_graph.radius_graph_fixed / radius_graph_pbc_fixed), in
  GROMACS units (nm, kJ/mol).

Charged systems: the exported graph always wires the ``total_charge``
input into the data dict (the reference injects net_charge the same way,
jit_model.py:58-62); ``net_charge`` bakes a constant instead.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import keys
from ..utils.qc import ELEMENTS_LIST, get_default_units, unit_conversion

GMX_UNITS = {
    keys.TOTAL_ENERGY: "kJ/mol",
    keys.POSITIONS: "nm",
    keys.FORCES: "kJ/mol/nm",
    keys.TOTAL_CHARGE: "e",
}


def _base_data(pos, atomic_numbers, edge_index, edge_mask, total_charge,
               pos_conv: float, net_charge: Optional[int]):
    n = pos.shape[0]
    data = {
        keys.POSITIONS: pos * (1.0 / pos_conv),
        keys.ATOMIC_NUMBERS: atomic_numbers,
        keys.EDGE_INDEX: edge_index,
        keys.EDGE_MASK: edge_mask,
        keys.NODE_MASK: atomic_numbers > 0,
        keys.BATCH: jnp.zeros((n,), dtype=jnp.int32),
        keys.GRAPH_MASK: jnp.asarray([True]),
        keys.NUM_ATOMS: jnp.sum(atomic_numbers > 0, keepdims=True),
        keys.BATCH_PTR: jnp.asarray([0, n], dtype=jnp.int32),
    }
    if net_charge is not None:
        data[keys.TOTAL_CHARGE] = jnp.asarray([net_charge], dtype=jnp.int32)
    else:
        data[keys.TOTAL_CHARGE] = total_charge
    return data


def make_batchless_forward(apply_forward, params, n_cap: int, e_cap: int,
                           energy_conv: float, pos_conv: float,
                           compute_virial: bool = False,
                           net_charge: Optional[int] = None,
                           periodic: bool = False,
                           output_mode: str = "energy"):
    """Single-structure forward in deployment units.

    ``output_mode="energy"`` mirrors the reference XPaiNNLMP signature
    (energy/forces[/virial], interface/jit_model.py:12-89);
    ``output_mode="dipole"`` mirrors XPaiNNDipole (jit_model.py:92-145),
    returning atomic charges and the total dipole for LAMMPS dipole
    computes.  With ``periodic=True`` the function takes the cell (in
    deployment length units) and integer image offsets for each edge.
    """

    def run(data):
        if output_mode == "matrix":
            # xmatnet AO-basis operator blocks; values stay in MODEL
            # units (Hamiltonian elements are energies in the training
            # units; overlaps are dimensionless) — recorded in the
            # manifest
            out = apply_forward(params, data, False, False)
            return (
                out[keys.NODE_MAT_BLOCKS],
                out[keys.EDGE_MAT_BLOCKS],
            )
        if output_mode == "dipole":
            out = apply_forward(params, data, False, False)
            return (
                out[keys.ATOMIC_CHARGES],
                out[keys.DIPOLE][0] * pos_conv,  # charge * length units
            )
        out = apply_forward(params, data, True, compute_virial)
        res = (
            out[keys.TOTAL_ENERGY][0] * energy_conv,
            out[keys.FORCES] * (energy_conv / pos_conv),
        )
        if compute_virial:
            res = res + (out[keys.VIRIAL][0] * energy_conv,)
        return res

    if periodic:
        def fn(pos, atomic_numbers, edge_index, edge_mask, cell_offsets,
               cell, total_charge):
            data = _base_data(pos, atomic_numbers, edge_index, edge_mask,
                              total_charge, pos_conv, net_charge)
            data[keys.CELL] = (cell * (1.0 / pos_conv))[None]
            data[keys.CELL_OFFSETS] = cell_offsets
            return run(data)
    else:
        def fn(pos, atomic_numbers, edge_index, edge_mask, total_charge):
            data = _base_data(pos, atomic_numbers, edge_index, edge_mask,
                              total_charge, pos_conv, net_charge)
            return run(data)

    return fn


def make_selfcontained_forward(apply_forward, params, cutoff: float,
                               e_cap: int, energy_conv: float,
                               pos_conv: float, max_reps: int = 1,
                               net_charge: Optional[int] = None):
    """GROMACS-analogue forward: builds the neighbor list in-graph
    (reference interface/jit_model.py:148-216).  Signature
    ``(positions, atomic_numbers, box, pbc, total_charge) ->
    (energy, forces, n_edges_found, needed_reps)`` — the consumer must
    validate ``n_edges_found <= max_edges`` AND
    ``max(needed_reps) <= max_reps`` (manifest keys): cell images beyond
    the static [-max_reps, max_reps]^3 grid are not generated, so a reps
    overflow means the energy is missing periodic neighbors."""
    from ..ops.radius_graph import radius_graph_pbc_fixed

    def fn(pos, atomic_numbers, box, pbc, total_charge):
        pos_model = pos * (1.0 / pos_conv)
        cell_model = box * (1.0 / pos_conv)
        node_mask = atomic_numbers > 0
        # a padded (identity) cell along non-periodic axes keeps the
        # plane-distance math finite; those images are masked by pbc
        safe_cell = jnp.where(
            jnp.any(pbc), cell_model, jnp.eye(3, dtype=pos.dtype)
        )
        edge_index, edge_mask, cell_offsets, n_found, needed = (
            radius_graph_pbc_fixed(
                pos_model, safe_cell, pbc, cutoff, e_cap,
                max_reps=max_reps, node_mask=node_mask,
            )
        )
        data = _base_data(pos, atomic_numbers, edge_index, edge_mask,
                          None if net_charge is not None else total_charge,
                          pos_conv, net_charge)
        data[keys.CELL] = safe_cell[None]
        data[keys.CELL_OFFSETS] = cell_offsets
        out = apply_forward(params, data, True, False)
        return (
            out[keys.TOTAL_ENERGY][0] * energy_conv,
            out[keys.FORCES] * (energy_conv / pos_conv),
            n_found,
            needed,
        )

    return fn


def export_model(
    ckpt_file: str,
    output: str,
    max_atoms: int = 256,
    max_edges: int = 8192,
    unit_style: str = "metal",
    compute_virial: bool = True,
    output_mode: str = "energy",
    periodic: bool = False,
    net_charge: Optional[int] = None,
    max_reps: int = 1,
) -> str:
    from jax import export as jax_export

    from ..models.model import init_params, make_apply_forward
    from ..run.test import load_model_from_checkpoint
    from ..training.trainer import restore_params

    module, extra, cutoff, blob, mc = load_model_from_checkpoint(ckpt_file)
    apply_forward = make_apply_forward(module, extra)

    if output_mode == "gmx":
        target_units = GMX_UNITS
    else:
        target_units = keys.LAMMPS_UNIT_STYLE[unit_style]
    model_units = get_default_units()
    e_conv = unit_conversion(
        model_units.get(keys.TOTAL_ENERGY, "eV"), target_units[keys.TOTAL_ENERGY]
    )
    p_conv = unit_conversion(
        target_units[keys.POSITIONS], model_units.get(keys.POSITIONS, "Angstrom")
    )
    p_conv = 1.0 / p_conv  # deployment length per model length

    # init params from a dummy batch
    rng = np.random.default_rng(0)
    sample = {
        keys.POSITIONS: rng.normal(size=(max_atoms, 3)).astype(np.float32),
        keys.ATOMIC_NUMBERS: np.clip(
            rng.integers(1, 9, max_atoms), 0, 99
        ).astype(np.int32),
        keys.EDGE_INDEX: np.zeros((2, max_edges), dtype=np.int32),
        keys.EDGE_MASK: np.zeros(max_edges, dtype=bool),
        keys.NODE_MASK: np.ones(max_atoms, dtype=bool),
        keys.BATCH: np.zeros(max_atoms, dtype=np.int32),
        keys.GRAPH_MASK: np.array([True]),
        keys.NUM_ATOMS: np.array([max_atoms], dtype=np.int32),
        keys.BATCH_PTR: np.array([0, max_atoms], dtype=np.int32),
        keys.TOTAL_CHARGE: np.array([0], dtype=np.int32),
    }
    params = init_params(module, sample)
    key = "ema_model" if "ema_model" in blob else "model"
    params = restore_params(params, blob[key])

    f32 = jnp.float32
    if output_mode == "gmx":
        fn = make_selfcontained_forward(
            apply_forward, params, float(cutoff), max_edges,
            e_conv, p_conv, max_reps=max_reps, net_charge=net_charge,
        )
        args = (
            jax.ShapeDtypeStruct((max_atoms, 3), f32),
            jax.ShapeDtypeStruct((max_atoms,), jnp.int32),
            jax.ShapeDtypeStruct((3, 3), f32),
            jax.ShapeDtypeStruct((3,), jnp.bool_),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        )
        inputs_desc = ("positions[f32,N,3] atomic_numbers[i32,N] box[f32,3,3] "
                       "pbc[bool,3] total_charge[i32,1]")
        outputs_desc = ("energy[f32] forces[f32,N,3] n_edges_found[i32] "
                        "needed_reps[i32,3]")
    else:
        fn = make_batchless_forward(
            apply_forward, params, max_atoms, max_edges,
            e_conv, p_conv, compute_virial=compute_virial,
            net_charge=net_charge, periodic=periodic,
            output_mode=output_mode,
        )
        args = (
            jax.ShapeDtypeStruct((max_atoms, 3), f32),
            jax.ShapeDtypeStruct((max_atoms,), jnp.int32),
            jax.ShapeDtypeStruct((2, max_edges), jnp.int32),
            jax.ShapeDtypeStruct((max_edges,), jnp.bool_),
        )
        inputs_desc = ("pos[f32,N,3] atomic_numbers[i32,N] edge_index[i32,2,E] "
                       "edge_mask[bool,E]")
        if periodic:
            args = args + (
                jax.ShapeDtypeStruct((max_edges, 3), f32),
                jax.ShapeDtypeStruct((3, 3), f32),
            )
            inputs_desc += " cell_offsets[f32,E,3] cell[f32,3,3]"
        args = args + (jax.ShapeDtypeStruct((1,), jnp.int32),)
        inputs_desc += " total_charge[i32,1]"
        if output_mode == "dipole":
            outputs_desc = "atomic_charges[f32,N] dipole[f32,3]"
        elif output_mode == "matrix":
            outputs_desc = (
                "node_mat_blocks[f32,N,D,D] edge_mat_blocks[f32,E,D,D] "
                "(model units)"
            )
        else:
            outputs_desc = "energy[f32] forces[f32,N,3]" + (
                " virial[f32,3,3]" if compute_virial else ""
            )
    exported = jax_export.export(jax.jit(fn))(*args)
    blob_bytes = exported.serialize()

    os.makedirs(output, exist_ok=True)
    with open(os.path.join(output, "model.stablehlo"), "wb") as f:
        f.write(blob_bytes)
    manifest = {
        # deployment-length cutoff: p_conv is deployment-per-model, so
        # multiply (matches reference jit_script.py cutoff_radius /=
        # pos_unit_factor, where that factor is model-per-deployment)
        keys.CUTOFF_RADIUS: float(cutoff) * p_conv,
        keys.N_SPECIES: 100,
        keys.PERIODIC_TABLE: " ".join(ELEMENTS_LIST[1:]),
        "unit_style": "gmx" if output_mode == "gmx" else unit_style,
        "max_atoms": max_atoms,
        "max_edges": max_edges,
        "compute_virial": compute_virial and output_mode == "energy",
        "output_mode": output_mode,
        "periodic": bool(periodic or output_mode == "gmx"),
        "net_charge": net_charge,
        "max_reps": max_reps if output_mode == "gmx" else None,
        "model_name": mc["model_name"],
        "inputs": inputs_desc,
        "outputs": outputs_desc,
    }
    if output_mode == "matrix":
        manifest["target_basis"] = mc["model_kwargs"].get("target_basis")
        manifest["elements"] = mc["model_kwargs"].get("elements")
    with open(os.path.join(output, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return output


def load_exported(path: str):
    """Round-trip loader (jax.export.deserialize + manifest)."""
    from jax import export as jax_export

    with open(os.path.join(path, "model.stablehlo"), "rb") as f:
        exported = jax_export.deserialize(f.read())
    manifest = json.loads(
        open(os.path.join(path, "manifest.json")).read()
    )
    return exported, manifest


def run_export_from_args(args) -> None:
    out = export_model(
        args.ckpt,
        args.output,
        max_atoms=args.max_atoms,
        max_edges=args.max_edges,
        unit_style=args.unit_style,
        output_mode=getattr(args, "mode", "energy"),
        periodic=getattr(args, "periodic", False),
        net_charge=getattr(args, "net_charge", None),
        max_reps=getattr(args, "max_reps", 1),
    )
    print(f"exported to {out}")
