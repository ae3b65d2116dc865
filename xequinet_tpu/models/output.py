"""Output heads: energy, scalar, charges, dipole, polarizability, spatial
extent, Cartesian tensors.

TPU-native counterpart of /root/reference/xequinet/nn/output.py.  All
graph reductions are masked segment sums with static graph counts;
padded nodes (node_mask False) are zeroed before any reduction.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .. import keys
from ..ops.irreps import Irreps
from ..ops.scatter import segment_sum
from ..utils.qc import ATOM_MASS
from .basic import ScalarMLP, resolve_activation
from .o3layer import Gate, O3Linear

Array = jnp.ndarray
DataDict = Dict[str, Array]


def _graph_count(data: DataDict) -> int:
    return data[keys.GRAPH_MASK].shape[0]


def _node_masked(x: Array, data: DataDict) -> Array:
    mask = data[keys.NODE_MASK]
    return jnp.where(mask.reshape(mask.shape + (1,) * (x.ndim - 1)), x, 0.0)


class ScalarOut(nn.Module):
    """Generic scalar property head (reference nn/output.py:28-76)."""

    node_dim: int = 128
    hidden_dim: int = 64
    activation: str = "silu"
    node_shift: float = 0.0
    node_scale: float = 1.0
    reduce_op: Optional[str] = "sum"
    output_field: str = keys.SCALAR_OUTPUT

    extra_properties: List[str] = None  # type: ignore[assignment]

    @nn.compact
    def __call__(self, data: DataDict) -> DataDict:
        batch = data[keys.BATCH]
        node_scalar = data[keys.NODE_INVARIANT]
        res = ScalarMLP(
            hidden_dim=self.hidden_dim,
            out_dim=1,
            activation=self.activation,
            final_bias_init=self.node_shift,
            final_weight_scale=self.node_scale,
        )(node_scalar)[..., 0]
        if self.reduce_op is not None:
            n_graphs = _graph_count(data)
            mask = data[keys.NODE_MASK]
            if self.reduce_op == "sum":
                res = segment_sum(res, batch, n_graphs, mask, indices_are_sorted=True)
            elif self.reduce_op == "mean":
                total = segment_sum(res, batch, n_graphs, mask, indices_are_sorted=True)
                cnt = segment_sum(jnp.ones_like(res), batch, n_graphs, mask)
                res = total / jnp.maximum(cnt, 1.0)
            else:
                raise NotImplementedError(self.reduce_op)
        data[self.output_field] = res
        return data


class EnergyOut(nn.Module):
    """Energy head with node shift/scale folded into the final linear init;
    accumulates atomic energies across heads (reference nn/output.py:79-128)."""

    node_dim: int = 128
    hidden_dim: int = 64
    activation: str = "silu"
    node_shift: float = 0.0
    node_scale: float = 1.0

    @nn.compact
    def __call__(self, data: DataDict) -> DataDict:
        batch = data[keys.BATCH]
        node_scalar = data[keys.NODE_INVARIANT]
        atom_eng = ScalarMLP(
            hidden_dim=self.hidden_dim,
            out_dim=1,
            activation=self.activation,
            final_bias_init=self.node_shift,
            final_weight_scale=self.node_scale,
        )(node_scalar)[..., 0]
        atom_eng = jnp.where(data[keys.NODE_MASK], atom_eng, 0.0)
        if keys.ATOMIC_ENERGIES in data:
            atom_eng = data[keys.ATOMIC_ENERGIES] + atom_eng
        total = segment_sum(atom_eng, batch, _graph_count(data))
        data[keys.ATOMIC_ENERGIES] = atom_eng
        data[keys.TOTAL_ENERGY] = total
        return data


class AtomicChargesOut(nn.Module):
    """Atomic charges with exact total-charge conservation
    (reference nn/output.py:131-179)."""

    node_dim: int = 128
    hidden_dim: int = 64
    activation: str = "silu"
    conservation: bool = True

    @nn.compact
    def __call__(self, data: DataDict) -> DataDict:
        node_scalar = data[keys.NODE_INVARIANT]
        batch = data[keys.BATCH]
        node_mask = data[keys.NODE_MASK]
        q = ScalarMLP(
            hidden_dim=self.hidden_dim, out_dim=1, activation=self.activation
        )(node_scalar)[..., 0]
        q = jnp.where(node_mask, q, 0.0)
        if self.conservation:
            n_graphs = _graph_count(data)
            raw_total = segment_sum(q, batch, n_graphs, indices_are_sorted=True)
            num_atoms = segment_sum(
                jnp.ones_like(q), batch, n_graphs, node_mask
            )
            if keys.TOTAL_CHARGE in data:
                total_charge = data[keys.TOTAL_CHARGE].astype(q.dtype)
            else:
                total_charge = jnp.zeros_like(raw_total)
            delta = (total_charge - raw_total) / jnp.maximum(num_atoms, 1.0)
            q = q + jnp.where(node_mask, jnp.take(delta, batch, axis=0), 0.0)
        data[keys.ATOMIC_CHARGES] = q
        return data


class DipoleOut(nn.Module):
    """Equivariant dipole head (reference nn/output.py:182-242).

    The 1o output is un-permuted from the irrep basis to geometric
    coordinates via [y,z,x] -> [x,y,z] (indices [2,0,1]).
    """

    node_dim: int = 128
    node_irreps: Irreps = Irreps("128x0e+64x1o+32x2e")
    hidden_dim: int = 64
    hidden_irreps: Irreps = Irreps("32x1o")
    activation: str = "silu"
    magnitude: bool = False

    @nn.compact
    def __call__(self, data: DataDict) -> DataDict:
        batch = data[keys.BATCH]
        node_scalar = data[keys.NODE_INVARIANT]
        node_equi = data[keys.NODE_EQUIVARIANT]

        h = O3Linear(Irreps(self.node_irreps), Irreps(self.hidden_irreps))(node_equi)
        h = Gate(irreps=Irreps(self.hidden_irreps), activation=self.activation)(h)
        equi_out = O3Linear(Irreps(self.hidden_irreps), Irreps("1x1o"))(h)
        equi_out = equi_out[:, jnp.asarray([2, 0, 1])]  # [y,z,x] -> [x,y,z]

        scalar_out = ScalarMLP(
            hidden_dim=self.hidden_dim, out_dim=1, activation=self.activation
        )(node_scalar)
        dipole = segment_sum(
            equi_out * scalar_out, batch, _graph_count(data), data[keys.NODE_MASK]
        )
        data[keys.DIPOLE] = dipole
        if self.magnitude:
            data[keys.DIPOLE_MAGNITUDE] = jnp.linalg.norm(dipole, axis=-1)
        return data


class PolarOut(nn.Module):
    """Polarizability head: 0e + 2e -> symmetric Cartesian 3x3
    (reference nn/output.py:245-326, including its d_norm isotropic term)."""

    node_dim: int = 128
    node_irreps: Irreps = Irreps("128x0e+64x1o+32x2e")
    hidden_dim: int = 64
    hidden_irreps: Irreps = Irreps("64x0e+16x2e")
    activation: str = "silu"
    isotropic: bool = False

    @nn.compact
    def __call__(self, data: DataDict) -> DataDict:
        batch = data[keys.BATCH]
        node_scalar = data[keys.NODE_INVARIANT]
        node_equi = data[keys.NODE_EQUIVARIANT]

        h = O3Linear(
            Irreps(self.node_irreps), Irreps(self.hidden_irreps), biases=True
        )(node_equi)
        h = Gate(irreps=Irreps(self.hidden_irreps), activation=self.activation)(h)
        equi_out = O3Linear(
            Irreps(self.hidden_irreps), Irreps("1x0e+1x2e"), biases=True
        )(h)  # [N, 6]
        scalar_out = ScalarMLP(
            hidden_dim=self.hidden_dim, out_dim=2, activation=self.activation
        )(node_scalar)  # [N, 2]
        # channel-wise gate of (0e, 2e) by the two scalars
        gated = jnp.concatenate(
            [equi_out[:, :1] * scalar_out[:, :1], equi_out[:, 1:] * scalar_out[:, 1:2]],
            axis=-1,
        )
        polar_out = segment_sum(
            gated, batch, _graph_count(data), data[keys.NODE_MASK]
        )  # [G, 6]

        zero_order = polar_out[:, 0]
        second = polar_out[:, 1:6]
        d_norm = jnp.linalg.norm(second, axis=-1)
        dxy, dyz, dz2, dzx, dx2_y2 = (
            second[:, 0],
            second[:, 1],
            second[:, 2],
            second[:, 3],
            second[:, 4],
        )
        s3 = 1.0 / math.sqrt(3.0)
        diag = jnp.stack(
            [
                s3 * (d_norm - dz2) + dx2_y2,
                s3 * (d_norm - dz2) - dx2_y2,
                s3 * (d_norm + 2 * dz2),
            ],
            axis=-1,
        )
        second_out = jnp.zeros((polar_out.shape[0], 3, 3), dtype=polar_out.dtype)
        second_out = second_out.at[:, 0, 0].set(diag[:, 0])
        second_out = second_out.at[:, 1, 1].set(diag[:, 1])
        second_out = second_out.at[:, 2, 2].set(diag[:, 2])
        second_out = second_out.at[:, 0, 1].set(dxy)
        second_out = second_out.at[:, 1, 0].set(dxy)
        second_out = second_out.at[:, 1, 2].set(dyz)
        second_out = second_out.at[:, 2, 1].set(dyz)
        second_out = second_out.at[:, 0, 2].set(dzx)
        second_out = second_out.at[:, 2, 0].set(dzx)

        polarizability = (
            jnp.eye(3, dtype=polar_out.dtype)[None] * zero_order[:, None, None]
            + second_out
        )
        data[keys.POLARIZABILITY] = polarizability
        if self.isotropic:
            data[keys.ISO_POLARIZABILITY] = jnp.trace(
                polarizability, axis1=-2, axis2=-1
            ) / 3.0
        return data


class SpatialOut(nn.Module):
    """Mass-weighted electronic spatial extent <r^2>
    (reference nn/output.py:329-372; computed without mutating POSITIONS)."""

    node_dim: int = 128
    hidden_dim: int = 64
    activation: str = "silu"

    @nn.compact
    def __call__(self, data: DataDict) -> DataDict:
        batch = data[keys.BATCH]
        pos = data[keys.POSITIONS]
        node_mask = data[keys.NODE_MASK]
        n_graphs = _graph_count(data)
        masses = jnp.take(
            jnp.asarray(ATOM_MASS, dtype=pos.dtype), data[keys.ATOMIC_NUMBERS]
        )[:, None]
        m_pos = segment_sum(masses * pos, batch, n_graphs, node_mask, indices_are_sorted=True)
        m_tot = segment_sum(masses, batch, n_graphs, node_mask, indices_are_sorted=True)
        centroids = m_pos / jnp.maximum(m_tot, 1e-9)
        rel = pos - jnp.take(centroids, batch, axis=0)

        scalar_out = ScalarMLP(
            hidden_dim=self.hidden_dim, out_dim=1, activation=self.activation
        )(data[keys.NODE_INVARIANT])
        spatial = jnp.sum(rel * rel, axis=-1, keepdims=True)
        data[keys.SPATIAL_EXTENT] = segment_sum(scalar_out * spatial, batch, n_graphs, node_mask
        , indices_are_sorted=True)
        return data


def resolve_output(mode: str, **kwargs) -> nn.Module:
    """Head factory (reference nn/output.py:468-480).  kwargs follow the
    reference's untyped model_kwargs convention — unknown keys ignored."""
    from .xe3net import CartTensorOut

    factory = {
        "scalar": ScalarOut,
        "energy": EnergyOut,
        "charges": AtomicChargesOut,
        "atomic_charges": AtomicChargesOut,
        "dipole": DipoleOut,
        "polar": PolarOut,
        "spatial": SpatialOut,
        "cartesian": CartTensorOut,
    }
    cls = factory[mode]
    field_names = set(cls.__dataclass_fields__.keys())  # flax modules are dataclasses
    accepted = {}
    for k, v in kwargs.items():
        if k in field_names:
            if "irreps" in k:
                v = Irreps(v)
            accepted[k] = v
    return cls(**accepted)


OUTPUT_EXTRA_PROPERTIES = {
    "scalar": [keys.SCALAR_OUTPUT],
    "energy": [keys.TOTAL_ENERGY, keys.ATOMIC_ENERGIES],
    "charges": [keys.ATOMIC_CHARGES],
    "atomic_charges": [keys.ATOMIC_CHARGES],
    "dipole": [keys.DIPOLE],
    "polar": [keys.POLARIZABILITY],
    "spatial": [keys.SPATIAL_EXTENT],
    "cartesian": [keys.CARTESIAN_TENSOR],
}
