"""QHNet-style blocks for predicting quantum-chemistry matrices
(Hamiltonians / overlaps) from node features.

TPU-native counterpart of /root/reference/xequinet/nn/matlayer.py
(SelfLayer diagonal blocks, PairLayer off-diagonal blocks, Expansion
irreps -> irreps_out x irreps_out block-matrix expansion via wigner-3j).
The reference never wires these into a registered model (SURVEY.md §2.1
item #20); here they are exposed for Hamiltonian-learning workflows
together with utils/mat_toolkit.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.irreps import Irreps
from ..ops.o3ops import equivariant_dot
from ..ops.tensor_product import TensorProduct, get_feasible_tp
from ..ops.wigner import wigner_3j
from .basic import resolve_activation
from .o3layer import Gate, O3Linear, TensorProductModule

Array = jnp.ndarray


class SelfLayer(nn.Module):
    """Diagonal (onsite) block features via a gated uuu self-TP
    (reference matlayer.py:16-64)."""

    irreps_in: Irreps
    irreps_hidden: Irreps
    activation: str = "silu"

    @nn.compact
    def __call__(self, x: Array, fii_in: Optional[Array] = None) -> Array:
        irreps_in = Irreps(self.irreps_in)
        irreps_hidden = Irreps(self.irreps_hidden)
        irreps_tp_out, instruct = get_feasible_tp(
            irreps_in, irreps_in, irreps_hidden, "uuu"
        )
        xl = O3Linear(irreps_in, irreps_in, biases=True)(
            Gate(irreps=irreps_in, activation=self.activation, refine=True)(x)
        )
        xr = O3Linear(irreps_in, irreps_in, biases=True)(
            Gate(irreps=irreps_in, activation=self.activation, refine=True)(x)
        )
        tp = TensorProduct(irreps_in, irreps_in, irreps_tp_out, instruct)
        xtp = TensorProductModule(tp=tp)(xl, xr)
        xtp = Gate(irreps=irreps_tp_out, activation=self.activation, refine=True)(xtp)
        fii = O3Linear(irreps_tp_out, irreps_hidden)(xtp)
        if fii_in is not None:
            fii = fii + fii_in
        return fii


class PairLayer(nn.Module):
    """Off-diagonal (offsite) block features via a weighted pair TP with
    weights from edge scalars x RBF (reference matlayer.py:67-144)."""

    irreps_in: Irreps
    irreps_hidden: Irreps
    edge_attr_dim: int = 20
    activation: str = "silu"

    @nn.compact
    def __call__(
        self,
        x: Array,
        edge_attr: Array,
        edge_index: Array,
        fij_in: Optional[Array] = None,
    ) -> Array:
        irreps_in = Irreps(self.irreps_in)
        irreps_hidden = Irreps(self.irreps_hidden)
        act = resolve_activation(self.activation)
        num_scalar = irreps_in[0].mul

        irreps_tp_out, instruct = get_feasible_tp(
            irreps_in, irreps_in, irreps_hidden, "uuu"
        )
        tp = TensorProduct(irreps_in, irreps_in, irreps_tp_out, instruct)

        xi = jnp.take(x, edge_index[0], axis=0)
        xj = jnp.take(x, edge_index[1], axis=0)
        s0 = equivariant_dot(xi, xj, irreps_in)[:, num_scalar:]
        s0 = jnp.concatenate(
            [xi[:, :num_scalar], xj[:, :num_scalar], s0], axis=-1
        )
        w_scalar = nn.Dense(tp.weight_numel)(act(nn.Dense(128)(s0)))
        w_rbf = nn.Dense(tp.weight_numel)(act(nn.Dense(128)(edge_attr)))
        tp_weight = w_scalar * w_rbf

        x_prime = Gate(irreps=irreps_in, activation=self.activation, refine=True)(
            O3Linear(irreps_in, irreps_in, biases=True)(x)
        )
        fij = tp.apply(
            jnp.take(x_prime, edge_index[0], axis=0),
            jnp.take(x_prime, edge_index[1], axis=0),
            tp_weight,
        )
        fij = Gate(irreps=irreps_tp_out, activation=self.activation, refine=True)(fij)
        fij = O3Linear(irreps_tp_out, irreps_hidden)(fij)
        if fij_in is not None:
            fij = fij + fij_in
        return fij


class Expansion(nn.Module):
    """Expand block features into (irreps_out x irreps_out) matrix blocks
    via wigner-3j, with per-sample weights/biases from node embeddings
    (reference matlayer.py:147-278)."""

    irreps_block: Irreps
    irreps_out: Irreps
    node_dim: int
    activation: str = "silu"
    pair_out: bool = False

    @nn.compact
    def __call__(self, x_in: Array, node_embed: Array) -> Array:
        irreps_block = Irreps(self.irreps_block)
        irreps_out = Irreps(self.irreps_out)
        act = resolve_activation(self.activation)

        instructions = []
        for i, (mul_in, ir_in) in enumerate(irreps_block):
            for j, (mul1, ir1) in enumerate(irreps_out):
                for k, (mul2, ir2) in enumerate(irreps_out):
                    if ir_in in list(ir1 * ir2):
                        instructions.append((i, j, k, (mul_in, mul1, mul2)))
        num_weight = sum(int(np.prod(s)) for *_ijk, s in instructions)
        num_bias = sum(
            int(np.prod(s[1:])) for i, _j, _k, s in instructions if i == 0
        )

        weight = nn.Dense(num_weight)(act(nn.Dense(64)(node_embed)))
        bias = nn.Dense(num_bias)(act(nn.Dense(64)(node_embed)))

        sl = irreps_block.slices()
        x_blocks = [
            x_in[:, s].reshape(-1, mi.mul, mi.ir.dim)
            for s, mi in zip(sl, irreps_block)
        ]

        outputs = {}
        w_off = 0
        b_off = 0
        for (i, j, k, shape) in instructions:
            mul_in, ir_in = irreps_block[i]
            mul1, ir1 = irreps_out[j]
            mul2, ir2 = irreps_out[k]
            n = int(np.prod(shape))
            w = weight[:, w_off : w_off + n].reshape(-1, *shape)
            w_off += n
            res = jnp.einsum(
                "bwuv,bwk->buvk", w, x_blocks[i],
                precision=lax.Precision.HIGHEST,
            )
            if i == 0:
                nb = int(np.prod(shape[1:]))
                b = bias[:, b_off : b_off + nb].reshape(-1, *shape[1:])
                b_off += nb
                res = res + b[..., None]
            w3j = jnp.asarray(
                wigner_3j(ir1.l, ir2.l, ir_in.l), dtype=x_in.dtype
            )
            res = (
                jnp.einsum(
                    "ijk,buvk->buivj", w3j, res,
                    precision=lax.Precision.HIGHEST,
                )
                / mul_in
            )
            res = res.reshape(-1, mul1 * ir1.dim, mul2 * ir2.dim)
            key = (j, k)
            outputs[key] = outputs.get(key, 0) + res

        rows = []
        for j, (mul1, ir1) in enumerate(irreps_out):
            blocks = []
            for k, (mul2, ir2) in enumerate(irreps_out):
                if (j, k) in outputs:
                    blocks.append(outputs[(j, k)])
                else:
                    blocks.append(
                        jnp.zeros(
                            (x_in.shape[0], mul1 * ir1.dim, mul2 * ir2.dim),
                            dtype=x_in.dtype,
                        )
                    )
            rows.append(jnp.concatenate(blocks, axis=-1))
        return jnp.concatenate(rows, axis=-2)
