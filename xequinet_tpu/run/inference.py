"""`xeq infer`: batch property prediction from structure files, with
optional xTB delta-learning correction.

TPU-native counterpart of /root/reference/xequinet/run/inference.py.
Structures are read with the built-in extxyz parser (ASE optional); the
jit cache is keyed on the padded bucket shape so mixed-size inputs reuse
a few compiled programs.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import keys
from ..data.batching import bucket_capacity, collate
from ..data.datapoint import Datapoint
from ..data.fmt_conversion import read_structures, read_xyz
from ..data.transforms import NeighborTransform
from ..models.model import init_params, make_apply_forward
from ..training.trainer import restore_params
from ..utils.logger import ZeroLogger
from ..utils.qc import get_default_units
from .test import load_model_from_checkpoint


class InferenceEngine:
    """Shape-bucketed jitted predictor over single structures or batches."""

    def __init__(self, ckpt_file: str, use_ema: bool = True) -> None:
        from ..utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
        module, extra, cutoff, blob, mc = load_model_from_checkpoint(ckpt_file)
        self.module = module
        self.extra = extra
        self.cutoff = cutoff
        self.transform = NeighborTransform(cutoff)
        self.apply_forward = make_apply_forward(module, extra)
        self._params_blob = blob
        self._use_ema = use_ema
        self._params = None
        self._jitted: Dict = {}
        # checkpoints trained with the mega kernels keep them at inference:
        # batches carry the slot layout (falls back to plain collate when a
        # structure exceeds the kernel window)
        from ..data.batching import kernel_layout_from_model_kwargs

        self._kernel_layout = kernel_layout_from_model_kwargs(
            mc["model_kwargs"]
        )

    def _get_params(self, sample_batch):
        if self._params is None:
            params = init_params(self.module, sample_batch)
            key = (
                "ema_model"
                if (self._use_ema and "ema_model" in self._params_blob)
                else "model"
            )
            self._params = restore_params(params, self._params_blob[key])
        return self._params

    def predict(
        self,
        dps: List[Datapoint],
        compute_forces: bool = True,
        compute_virial: bool = False,
    ) -> List[Dict[str, np.ndarray]]:
        dps = [self.transform(dp) for dp in dps]
        batch = None
        if self._kernel_layout is not None:
            from ..data.batching import kernel_slot_cap

            n_cap = bucket_capacity(sum(d.num_atoms for d in dps))
            e_cap = bucket_capacity(max(sum(d.num_edges for d in dps), 1))
            layout = dict(self._kernel_layout)
            layout["slot_cap"] = kernel_slot_cap(n_cap, e_cap, layout)
            try:
                batch = collate(
                    dps, n_cap, e_cap, len(dps) + 1, kernel_layout=layout
                )
            except ValueError:  # structure exceeds the kernel window
                batch = None
        if batch is None:
            batch = collate(dps)
        params = self._get_params(batch)
        shape_key = (
            batch[keys.POSITIONS].shape[0],
            batch[keys.EDGE_MASK].shape[0],
            batch[keys.GRAPH_MASK].shape[0],
            compute_forces,
            compute_virial,
        )
        if shape_key not in self._jitted:

            def _fwd(p, b, cf=compute_forces, cv=compute_virial):
                out = self.apply_forward(p, b, cf, cv)
                # project to user-facing outputs inside jit: XLA drops
                # the intermediate buffers and the device->host fetch
                # stays small (seconds per call otherwise on a tunneled
                # TPU backend)
                return {
                    k: v for k, v in out.items()
                    if k in keys.OUTPUT_PROPERTIES
                }

            self._jitted[shape_key] = jax.jit(_fwd)
        out = self._jitted[shape_key](
            params, {k: jnp.asarray(v) for k, v in batch.items()}
        )
        out = jax.device_get(out)

        results = []
        node_off = 0
        for g, dp in enumerate(dps):
            n = dp.num_atoms
            r: Dict[str, np.ndarray] = {}
            for prop in (
                keys.TOTAL_ENERGY,
                keys.DIPOLE,
                keys.POLARIZABILITY,
                keys.VIRIAL,
                keys.SCALAR_OUTPUT,
                keys.SPATIAL_EXTENT,
                keys.CARTESIAN_TENSOR,
            ):
                if prop in out:
                    r[prop] = np.asarray(out[prop])[g]
            for prop in (keys.FORCES, keys.ATOMIC_CHARGES, keys.ATOMIC_ENERGIES):
                if prop in out:
                    r[prop] = np.asarray(out[prop])[node_off : node_off + n]
            node_off += n
            results.append(r)
        return results


def _delta_correction(dp: Datapoint, result: Dict[str, np.ndarray], method: str):
    """Add back the semi-empirical xTB baseline (reference
    inference.py:56-89); requires tblite."""
    from ..data.fmt_conversion import datapoint_to_xtb
    from ..utils.qc import unit_conversion, units

    calc = datapoint_to_xtb(dp, method=keys.xTB_METHODS.get(method, method))
    res = calc.singlepoint()
    default = get_default_units()
    e_conv = unit_conversion("Hartree", default.get(keys.TOTAL_ENERGY, "eV"))
    f_conv = unit_conversion(
        "Hartree/Bohr",
        f"{default.get(keys.TOTAL_ENERGY, 'eV')}/{default.get(keys.POSITIONS, 'Angstrom')}",
    )
    if keys.TOTAL_ENERGY in result:
        result[keys.TOTAL_ENERGY] = result[keys.TOTAL_ENERGY] + res.get("energy") * e_conv
    if keys.FORCES in result:
        result[keys.FORCES] = result[keys.FORCES] - res.get("gradient") * f_conv
    if keys.VIRIAL in result and res.get("virial") is not None:
        result[keys.VIRIAL] = result[keys.VIRIAL] + res.get("virial") * e_conv
    if keys.ATOMIC_CHARGES in result:
        result[keys.ATOMIC_CHARGES] = result[keys.ATOMIC_CHARGES] + res.get("charges")
    if keys.DIPOLE in result:
        d_conv = unit_conversion(
            "Bohr", default.get(keys.POSITIONS, "Angstrom")
        )  # xTB dipole is e*Bohr (a.u.)
        result[keys.DIPOLE] = result[keys.DIPOLE] + res.get("dipole") * d_conv
    return result


def run_infer(
    ckpt_file: str,
    input_file: str,
    input_format: Optional[str] = None,
    output_file: Optional[str] = None,
    compute_forces: bool = True,
    compute_virial: bool = False,
    delta_method: Optional[str] = None,
    batch_size: int = 16,
    logger=None,
) -> List[Dict[str, np.ndarray]]:
    logger = logger or ZeroLogger()
    engine = InferenceEngine(ckpt_file)
    dps = read_structures(input_file, input_format)
    logger.info(f"read {len(dps)} structures from {input_file}")

    all_results: List[Dict[str, np.ndarray]] = []
    for i in range(0, len(dps), batch_size):
        chunk = dps[i : i + batch_size]
        results = engine.predict(chunk, compute_forces, compute_virial)
        if delta_method:
            results = [
                _delta_correction(dp, r, delta_method)
                for dp, r in zip(chunk, results)
            ]
        all_results.extend(results)

    units_map = get_default_units()
    lines = []
    for i, r in enumerate(all_results):
        parts = [f"structure {i}:"]
        if keys.TOTAL_ENERGY in r:
            parts.append(
                f"energy = {float(r[keys.TOTAL_ENERGY]):.8f} "
                f"{units_map.get(keys.TOTAL_ENERGY, '')}"
            )
        lines.append("  ".join(parts))
    logger.info("\n".join(lines))

    if output_file:
        import pickle

        with open(output_file, "wb") as f:
            pickle.dump(all_results, f)
        logger.info(f"full results written to {output_file}")
    return all_results


def run_infer_from_args(args) -> None:
    run_infer(
        args.ckpt,
        args.input,
        input_format=getattr(args, "format", None),
        output_file=getattr(args, "output", None),
        compute_forces=getattr(args, "forces", False),
        compute_virial=getattr(args, "stress", False),
        delta_method=getattr(args, "delta", None),
        batch_size=getattr(args, "batch_size", 16),
    )
