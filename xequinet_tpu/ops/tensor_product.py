"""General Clebsch-Gordan tensor products, e3nn-compatible semantics.

Replaces e3nn's ``o3.TensorProduct`` (used throughout the reference:
nn/o3layer.py, nn/output.py:411-421, nn/xe3net.py:141-150, nn/tp.py).
Instructions are compiled at trace time into a list of einsum paths with
precomputed normalization coefficients following e3nn's rules
(irrep_normalization='component', path_normalization='element' defaults),
so a model built here is numerically equivalent to the e3nn graph given
identical weights.  All einsums contract against constant Wigner-3j tables
and map onto the MXU after XLA fusion.
"""

from __future__ import annotations

import math
from typing import List, NamedTuple, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
from jax import lax
import numpy as np

from .irreps import Irrep, Irreps
from .wigner import wigner_3j


class Instruction(NamedTuple):
    i_in1: int
    i_in2: int
    i_out: int
    mode: str  # uvw | uvu | uvv | uuw | uuu | uvuv
    has_weight: bool
    path_weight: float = 1.0


def _fan(ins: Instruction, irreps_in1: Irreps, irreps_in2: Irreps) -> int:
    return {
        "uvw": irreps_in1[ins.i_in1].mul * irreps_in2[ins.i_in2].mul,
        "uvu": irreps_in2[ins.i_in2].mul,
        "uvv": irreps_in1[ins.i_in1].mul,
        "uuw": irreps_in1[ins.i_in1].mul,
        "uuu": 1,
        "uvuv": 1,
    }[ins.mode]


def _weight_shape(
    ins: Instruction, irreps_in1: Irreps, irreps_in2: Irreps, irreps_out: Irreps
) -> Tuple[int, ...]:
    m1 = irreps_in1[ins.i_in1].mul
    m2 = irreps_in2[ins.i_in2].mul
    mo = irreps_out[ins.i_out].mul
    return {
        "uvw": (m1, m2, mo),
        "uvu": (m1, m2),
        "uvv": (m1, m2),
        "uuw": (m1, mo),
        "uuu": (m1,),
        "uvuv": (m1, m2),
    }[ins.mode]


class TensorProduct:
    """Compiled tensor product.  Holds only static metadata + numpy tables.

    ``apply(x1, x2, weights)`` is a pure jax function; flax modules own the
    parameters (if any).
    """

    def __init__(
        self,
        irreps_in1: Union[str, Irreps],
        irreps_in2: Union[str, Irreps],
        irreps_out: Union[str, Irreps],
        instructions: Sequence[Union[Instruction, Tuple]],
        irrep_normalization: str = "component",
        path_normalization: str = "element",
    ) -> None:
        self.irreps_in1 = Irreps(irreps_in1)
        self.irreps_in2 = Irreps(irreps_in2)
        self.irreps_out = Irreps(irreps_out)
        self.instructions = [
            ins if isinstance(ins, Instruction) else Instruction(*ins)
            for ins in instructions
        ]

        # --- e3nn normalization coefficients -----------------------------
        self.alphas: List[float] = []
        for ins in self.instructions:
            mul_ir_out = self.irreps_out[ins.i_out]
            if irrep_normalization == "component":
                alpha = float(mul_ir_out.ir.dim)
            elif irrep_normalization == "norm":
                alpha = float(
                    self.irreps_in1[ins.i_in1].ir.dim
                    * self.irreps_in2[ins.i_in2].ir.dim
                )
            elif irrep_normalization == "none":
                alpha = 1.0
            else:
                raise ValueError(irrep_normalization)

            if path_normalization == "element":
                x = sum(
                    o.path_weight * _fan(o, self.irreps_in1, self.irreps_in2)
                    for o in self.instructions
                    if o.i_out == ins.i_out
                )
            elif path_normalization == "path":
                x = ins.path_weight * _fan(ins, self.irreps_in1, self.irreps_in2)
                x *= len([o for o in self.instructions if o.i_out == ins.i_out])
            elif path_normalization == "none":
                x = 1.0
            else:
                raise ValueError(path_normalization)
            if x > 0.0:
                alpha /= x
            alpha *= ins.path_weight
            self.alphas.append(math.sqrt(alpha))

        # --- weights ------------------------------------------------------
        self.weight_shapes = [
            _weight_shape(ins, self.irreps_in1, self.irreps_in2, self.irreps_out)
            if ins.has_weight
            else None
            for ins in self.instructions
        ]
        self.weight_numel = sum(
            int(np.prod(s)) for s in self.weight_shapes if s is not None
        )

    # ---------------------------------------------------------------------
    def apply(
        self,
        x1: jnp.ndarray,
        x2: jnp.ndarray,
        weights: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x1 [..., irreps_in1.dim], x2 [..., irreps_in2.dim].

        ``weights``: flat [weight_numel] (shared) or [..., weight_numel]
        (per-sample, e.g. from an MLP as in CartTensorOut,
        reference nn/output.py:422-426).
        """
        sl1 = self.irreps_in1.slices()
        sl2 = self.irreps_in2.slices()
        batch_shape = jnp.broadcast_shapes(x1.shape[:-1], x2.shape[:-1])

        out_chunks = {}
        w_off = 0
        for ins, alpha, wshape in zip(
            self.instructions, self.alphas, self.weight_shapes
        ):
            mul1, ir1 = self.irreps_in1[ins.i_in1]
            mul2, ir2 = self.irreps_in2[ins.i_in2]
            mulo, iro = self.irreps_out[ins.i_out]
            a = x1[..., sl1[ins.i_in1]].reshape(x1.shape[:-1] + (mul1, ir1.dim))
            b = x2[..., sl2[ins.i_in2]].reshape(x2.shape[:-1] + (mul2, ir2.dim))
            w3 = jnp.asarray(wigner_3j(ir1.l, ir2.l, iro.l), dtype=x1.dtype)

            w = None
            if ins.has_weight:
                n = int(np.prod(wshape))
                if weights is None:
                    raise ValueError("tensor product expects weights")
                wflat = weights[..., w_off : w_off + n]
                w = wflat.reshape(wflat.shape[:-1] + wshape)
                w_off += n

            if ins.mode == "uvw":
                res = jnp.einsum("...ui,...vj,ijk,...uvw->...wk", a, b, w3, w, precision=lax.Precision.HIGHEST)
            elif ins.mode == "uvu":
                if ins.has_weight:
                    res = jnp.einsum("...ui,...vj,ijk,...uv->...uk", a, b, w3, w, precision=lax.Precision.HIGHEST)
                else:
                    res = jnp.einsum("...ui,...vj,ijk->...uk", a, b, w3, precision=lax.Precision.HIGHEST)
            elif ins.mode == "uvv":
                if ins.has_weight:
                    res = jnp.einsum("...ui,...vj,ijk,...uv->...vk", a, b, w3, w, precision=lax.Precision.HIGHEST)
                else:
                    res = jnp.einsum("...ui,...vj,ijk->...vk", a, b, w3, precision=lax.Precision.HIGHEST)
            elif ins.mode == "uuw":
                if ins.has_weight:
                    res = jnp.einsum("...ui,...uj,ijk,...uw->...wk", a, b, w3, w, precision=lax.Precision.HIGHEST)
                else:
                    res = jnp.einsum("...ui,...uj,ijk->...k", a, b, w3, precision=lax.Precision.HIGHEST)[..., None, :]
            elif ins.mode == "uuu":
                if ins.has_weight:
                    res = jnp.einsum("...ui,...uj,ijk,...u->...uk", a, b, w3, w, precision=lax.Precision.HIGHEST)
                else:
                    res = jnp.einsum("...ui,...uj,ijk->...uk", a, b, w3, precision=lax.Precision.HIGHEST)
            elif ins.mode == "uvuv":
                if ins.has_weight:
                    res = jnp.einsum("...ui,...vj,ijk,...uv->...uvk", a, b, w3, w, precision=lax.Precision.HIGHEST)
                else:
                    res = jnp.einsum("...ui,...vj,ijk->...uvk", a, b, w3, precision=lax.Precision.HIGHEST)
                res = res.reshape(res.shape[:-3] + (mul1 * mul2, iro.dim))
            else:
                raise ValueError(ins.mode)

            res = alpha * res
            res = jnp.broadcast_to(res, batch_shape + (mulo, iro.dim))
            if ins.i_out in out_chunks:
                out_chunks[ins.i_out] = out_chunks[ins.i_out] + res
            else:
                out_chunks[ins.i_out] = res

        pieces = []
        for i_out, (mulo, iro) in enumerate(self.irreps_out):
            if i_out in out_chunks:
                c = out_chunks[i_out]
            else:
                c = jnp.zeros(batch_shape + (mulo, iro.dim), dtype=x1.dtype)
            pieces.append(c.reshape(c.shape[:-2] + (mulo * iro.dim,)))
        return jnp.concatenate(pieces, axis=-1)

    def __call__(self, x1, x2, weights=None):
        return self.apply(x1, x2, weights)


def get_feasible_tp(
    irreps_in1: Union[str, Irreps],
    irreps_in2: Union[str, Irreps],
    filter_irreps_out: Union[str, Irreps],
    tp_mode: str = "uvw",
    trainable: bool = True,
) -> Tuple[Irreps, List[Instruction]]:
    """Enumerate CG-allowed paths, mirroring the reference's QHNet-derived
    helper (reference: xequinet/nn/tp.py:20-107) including its global
    normalization quirk (the fan-in sum runs over *all* instructions, not
    just those sharing an output)."""
    assert tp_mode in ("uvw", "uvu", "uvv", "uuw", "uuu", "uvuv")
    irreps_in1 = Irreps(irreps_in1)
    irreps_in2 = Irreps(irreps_in2)
    filter_irreps_out = Irreps(filter_irreps_out)

    irreps_mid: List[Tuple[int, Irrep]] = []
    raw: List[Tuple[int, int, int]] = []
    for i, (mul1, ir1) in enumerate(irreps_in1):
        for j, (mul2, ir2) in enumerate(irreps_in2):
            for ir_out in ir1 * ir2:
                if ir_out not in filter_irreps_out:
                    continue
                if tp_mode == "uvw":
                    mul_out = filter_irreps_out.count(ir_out)
                elif tp_mode == "uvu":
                    mul_out = mul1
                elif tp_mode == "uvv":
                    mul_out = mul2
                elif tp_mode == "uuu":
                    assert mul1 == mul2
                    mul_out = mul1
                elif tp_mode == "uuw":
                    assert mul1 == mul2
                    mul_out = filter_irreps_out.count(ir_out)
                else:  # uvuv
                    mul_out = mul1 * mul2
                key = (mul_out, ir_out)
                if key not in irreps_mid:
                    k = len(irreps_mid)
                    irreps_mid.append(key)
                else:
                    k = irreps_mid.index(key)
                raw.append((i, j, k))

    irreps_mid_i = Irreps(irreps_mid)
    fan_dict = {
        "uvw": lambda i, j: irreps_in1[i].mul * irreps_in2[j].mul,
        "uvu": lambda i, j: irreps_in2[j].mul,
        "uvv": lambda i, j: irreps_in1[i].mul,
        "uuw": lambda i, j: irreps_in1[i].mul,
        "uuu": lambda i, j: 1,
        "uvuv": lambda i, j: 1,
    }[tp_mode]
    # NOTE: the reference sums the fan over every instruction regardless of
    # i_out (nn/tp.py:93-96); replicated for numerical parity.
    x_total = sum(fan_dict(i, j) for (i, j, _k) in raw)
    alphas = []
    for (i, j, k) in raw:
        alpha = float(irreps_mid_i[k].ir.dim)
        if x_total > 0:
            alpha /= x_total
        alphas.append(math.sqrt(alpha))

    sorted_irreps, p, _inv = irreps_mid_i.sort()
    instructions = [
        Instruction(i, j, p[k], tp_mode, trainable, alpha)
        for (i, j, k), alpha in zip(raw, alphas)
    ]
    return sorted_irreps, instructions
