"""`xeq export`: ahead-of-time export of the jitted forward.

TPU-native replacement for the reference's TorchScript deployment path
(/root/reference/xequinet/run/jit_script.py + interface/jit_model.py).
Instead of a TorchScript archive consumed by the LAMMPS/GROMACS C++
plugins, we export:

* a serialized StableHLO module of the batchless forward (fixed
  max_atoms/max_edges capacities) via ``jax.export`` — loadable from any
  XLA runtime (C++ PjRt included), plus
* a JSON manifest with the same metadata the reference stores as
  extra_files (cutoff radius, n_species, periodic table, unit style;
  jit_script.py:73-86).

The exported signature matches the reference's LAMMPS model
(interface/jit_model.py:12-89): positions, atomic numbers and the
(pre-built) neighbor list in, energy/forces/(virial) out, with unit
conversion factors folded in.
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


def make_batchless_forward(apply_forward, params, n_cap: int, e_cap: int,
                           energy_conv: float, pos_conv: float,
                           compute_virial: bool = False,
                           has_charge: bool = False,
                           output_mode: str = "energy"):
    """Single-structure forward in deployment units.

    ``output_mode="energy"`` mirrors the reference XPaiNNLMP signature
    (energy/forces[/virial], interface/jit_model.py:12-89);
    ``output_mode="dipole"`` mirrors XPaiNNDipole (jit_model.py:92-145),
    returning atomic charges and the total dipole for LAMMPS dipole
    computes.
    """

    def fn(pos, atomic_numbers, edge_index, edge_mask, total_charge):
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
        if has_charge:
            data[keys.TOTAL_CHARGE] = total_charge
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

    return fn


def export_model(
    ckpt_file: str,
    output: str,
    max_atoms: int = 256,
    max_edges: int = 8192,
    unit_style: str = "metal",
    compute_virial: bool = True,
    output_mode: str = "energy",
) -> str:
    from jax import export as jax_export

    from ..models.model import init_params, make_apply_forward
    from ..run.test import load_model_from_checkpoint
    from ..training.trainer import restore_params

    module, extra, cutoff, blob, mc = load_model_from_checkpoint(ckpt_file)
    apply_forward = make_apply_forward(module, extra)

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
    n0 = min(8, max_atoms)
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
    }
    params = init_params(module, sample)
    key = "ema_model" if "ema_model" in blob else "model"
    params = restore_params(params, blob[key])

    fn = make_batchless_forward(
        apply_forward, params, max_atoms, max_edges,
        e_conv, p_conv, compute_virial=compute_virial,
        output_mode=output_mode,
    )
    args = (
        jax.ShapeDtypeStruct((max_atoms, 3), jnp.float32),
        jax.ShapeDtypeStruct((max_atoms,), jnp.int32),
        jax.ShapeDtypeStruct((2, max_edges), jnp.int32),
        jax.ShapeDtypeStruct((max_edges,), jnp.bool_),
        jax.ShapeDtypeStruct((1,), jnp.int32),
    )
    exported = jax_export.export(jax.jit(fn))(*args)
    blob_bytes = exported.serialize()

    os.makedirs(output, exist_ok=True)
    with open(os.path.join(output, "model.stablehlo"), "wb") as f:
        f.write(blob_bytes)
    manifest = {
        keys.CUTOFF_RADIUS: float(cutoff) / p_conv,
        keys.N_SPECIES: 100,
        keys.PERIODIC_TABLE: " ".join(ELEMENTS_LIST[1:]),
        "unit_style": unit_style,
        "max_atoms": max_atoms,
        "max_edges": max_edges,
        "compute_virial": compute_virial,
        "output_mode": output_mode,
        "model_name": mc["model_name"],
        "inputs": "pos[f32,N,3] atomic_numbers[i32,N] edge_index[i32,2,E] "
        "edge_mask[bool,E] total_charge[i32,1]",
        "outputs": (
            "atomic_charges[f32,N] dipole[f32,3]"
            if output_mode == "dipole"
            else "energy[f32] forces[f32,N,3]"
            + (" virial[f32,3,3]" if compute_virial else "")
        ),
    }
    with open(os.path.join(output, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return output


def load_exported(path: str):
    """Round-trip loader (also used by the C++ PjRt runner)."""
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
    )
    print(f"exported to {out}")
