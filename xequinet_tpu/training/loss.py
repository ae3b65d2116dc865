"""Weighted multi-task loss and error metrics over padded batches.

TPU-native counterpart of /root/reference/xequinet/utils/loss.py.  Every
reduction is masked so padding rows never contribute; sums/counts are
returned as arrays so they can be ``psum``-ed across a device mesh (the
DistAverageMetric equivalent, reference utils/trainer.py:38-75).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax.numpy as jnp

from .. import keys

Array = jnp.ndarray
DataDict = Dict[str, Array]

# properties stored per node (masked by NODE_MASK); everything else is
# per graph (masked by GRAPH_MASK)
NODE_LEVEL_PROPERTIES = keys.NODE_LEVEL_PROPERTIES
EDGE_LEVEL_PROPERTIES = keys.EDGE_LEVEL_PROPERTIES


def _criterion(loss_fn: str) -> Callable[[Array, Array], Array]:
    """Elementwise loss (reduction happens in the masked mean)."""
    loss_fn = loss_fn.lower()
    if loss_fn in ("l1", "mae"):
        return lambda p, t: jnp.abs(p - t)
    if loss_fn in ("l2", "mse"):
        return lambda p, t: (p - t) ** 2
    if loss_fn == "smoothl1":

        def smooth_l1(p, t, beta=1.0):
            d = jnp.abs(p - t)
            return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)

        return smooth_l1
    raise NotImplementedError(f"loss function {loss_fn}")


def _mask_for(prop: str, target: DataDict) -> Array:
    if prop in NODE_LEVEL_PROPERTIES:
        return target[keys.NODE_MASK]
    if prop in EDGE_LEVEL_PROPERTIES:
        return target[keys.EDGE_MASK]
    return target[keys.GRAPH_MASK]


def _masked_mean(err: Array, mask: Array) -> Array:
    extra = int(jnp.ones(err.shape[1:]).size) if err.ndim > 1 else 1
    m = mask.reshape(mask.shape + (1,) * (err.ndim - 1))
    total = jnp.sum(jnp.where(m, err, 0.0))
    count = jnp.sum(mask) * extra
    return total / jnp.maximum(count, 1)


def _masked_sums(err: Array, mask: Array) -> Tuple[Array, Array]:
    extra = int(jnp.ones(err.shape[1:]).size) if err.ndim > 1 else 1
    m = mask.reshape(mask.shape + (1,) * (err.ndim - 1))
    return jnp.sum(jnp.where(m, err, 0.0)), jnp.sum(mask) * extra


class WeightedLoss:
    """Per-property weighted loss with the reference's special cases:
    energy-per-atom and stress = virial / |det(cell)|
    (reference utils/loss.py:25-91).

    ``matloss`` (MAE + RMSE) is supported per property.
    """

    def __init__(self, loss_fn: str = "l2", **weights: float) -> None:
        assert weights, "At least one task should be present"
        self.loss_name = loss_fn.lower()
        self.weights = {k: float(v) for k, v in weights.items()}

    def _prop_loss(self, pred: Array, tgt: Array, mask: Array) -> Array:
        if self.loss_name == "matloss":
            mae = _masked_mean(jnp.abs(pred - tgt), mask)
            mse = _masked_mean((pred - tgt) ** 2, mask)
            return mae + jnp.sqrt(mse)
        crit = _criterion(self.loss_name)
        return _masked_mean(crit(pred, tgt), mask)

    def __call__(
        self, result: DataDict, target: DataDict
    ) -> Tuple[Array, Dict[str, Array]]:
        total = jnp.asarray(0.0, dtype=jnp.float32)
        losses: Dict[str, Array] = {}

        if keys.ENERGY_PER_ATOM in self.weights:
            n_atoms = jnp.maximum(target[keys.NUM_ATOMS].astype(jnp.float32), 1.0)
            val = self._prop_loss(
                result[keys.TOTAL_ENERGY] / n_atoms,
                target[keys.TOTAL_ENERGY] / n_atoms,
                target[keys.GRAPH_MASK],
            )
            total = total + self.weights[keys.ENERGY_PER_ATOM] * val
            losses[keys.ENERGY_PER_ATOM] = val

        if keys.STRESS in self.weights:
            volume = jnp.abs(jnp.linalg.det(target[keys.CELL]))[:, None, None]
            volume = jnp.maximum(volume, 1e-9)
            val = self._prop_loss(
                result[keys.VIRIAL] / volume,
                target[keys.VIRIAL] / volume,
                target[keys.GRAPH_MASK],
            )
            total = total + self.weights[keys.STRESS] * val
            losses[keys.STRESS] = val

        for prop, w in self.weights.items():
            if prop in (keys.ENERGY_PER_ATOM, keys.STRESS):
                continue
            val = self._prop_loss(result[prop], target[prop], _mask_for(prop, target))
            total = total + w * val
            losses[prop] = val

        return total, losses


class ErrorMetric:
    """Summed L1/L2 + counts per property, with the paired derived metrics
    (energy <-> energy/atom, virial <-> stress) auto-added
    (reference utils/loss.py:94-166).  Returns arrays, psum-able.
    """

    def __init__(self, *properties: str) -> None:
        self.properties = set()
        for prop in properties:
            self.properties.add(prop)
            if prop == keys.TOTAL_ENERGY:
                self.properties.add(keys.ENERGY_PER_ATOM)
            elif prop == keys.ENERGY_PER_ATOM:
                self.properties.add(keys.TOTAL_ENERGY)
            elif prop == keys.VIRIAL:
                self.properties.add(keys.STRESS)
            elif prop == keys.STRESS:
                self.properties.add(keys.VIRIAL)

    def __call__(
        self, result: DataDict, target: DataDict
    ) -> Dict[str, Tuple[Array, Array, Array]]:
        out = {}
        for prop in self.properties:
            if prop == keys.ENERGY_PER_ATOM:
                n_atoms = jnp.maximum(
                    target[keys.NUM_ATOMS].astype(jnp.float32), 1.0
                )
                pred = result[keys.TOTAL_ENERGY] / n_atoms
                tgt = target[keys.TOTAL_ENERGY] / n_atoms
                mask = target[keys.GRAPH_MASK]
            elif prop == keys.STRESS:
                volume = jnp.maximum(
                    jnp.abs(jnp.linalg.det(target[keys.CELL]))[:, None, None], 1e-9
                )
                pred = result[keys.VIRIAL] / volume
                tgt = target[keys.VIRIAL] / volume
                mask = target[keys.GRAPH_MASK]
            else:
                if prop not in result or prop not in target:
                    continue
                pred, tgt = result[prop], target[prop]
                mask = _mask_for(prop, target)
            l1, n = _masked_sums(jnp.abs(pred - tgt), mask)
            l2, _ = _masked_sums((pred - tgt) ** 2, mask)
            out[prop] = (l1, l2, n)
        return out


class MetricAccumulator:
    """Host-side accumulation of (l1, l2, count) triples -> MAE/RMSE table
    (the AverageMetric / DistAverageMetric analogue,
    reference utils/trainer.py:38-75 and run/test.py:20-49)."""

    def __init__(self) -> None:
        self.sums: Dict[str, list] = {}

    def update(self, metrics: Dict[str, Tuple]) -> None:
        import numpy as np

        for prop, (l1, l2, n) in metrics.items():
            acc = self.sums.setdefault(prop, [0.0, 0.0, 0])
            acc[0] += float(np.asarray(l1))
            acc[1] += float(np.asarray(l2))
            acc[2] += int(np.asarray(n))

    def compute(self) -> Dict[str, Dict[str, float]]:
        import math

        out = {}
        for prop, (l1, l2, n) in self.sums.items():
            n = max(n, 1)
            out[prop] = {"mae": l1 / n, "rmse": math.sqrt(l2 / n), "count": n}
        return out

    def reset(self) -> None:
        self.sums = {}
