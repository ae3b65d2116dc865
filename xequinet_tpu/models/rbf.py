"""Radial basis functions and cutoff envelopes.

TPU-native counterpart of /root/reference/xequinet/nn/rbf.py.  RBFs with
trainable parameters are flax modules; cutoff envelopes are parameter-free
closures.  The reference's ExponentialCutoff / FlatCutoff are broken
(rbf.py:76-110 — bad super().__init__ and no forward); here they are
implemented correctly rather than replicated (SURVEY.md §2.1 note).
"""

from __future__ import annotations

import math
from typing import Callable

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def resolve_cutoff(cutoff_fn: str, cutoff: float, **kwargs) -> Callable:
    if cutoff_fn == "cosine":
        return cosine_cutoff(cutoff)
    elif cutoff_fn == "polynomial":
        return polynomial_cutoff(cutoff, **kwargs)
    elif cutoff_fn == "exponential":
        return exponential_cutoff(cutoff)
    elif cutoff_fn == "flat":
        return flat_cutoff(cutoff, **kwargs)
    else:
        raise NotImplementedError(f"cutoff function {cutoff_fn} is not implemented")


def cosine_cutoff(cutoff: float) -> Callable:
    """0.5 (cos(pi d / rc) + 1) inside rc, 0 outside (reference rbf.py:51-57)."""

    def fn(dist: jnp.ndarray) -> jnp.ndarray:
        val = 0.5 * (jnp.cos(math.pi * dist / cutoff) + 1.0)
        return jnp.where(dist < cutoff, val, 0.0)

    return fn


def polynomial_cutoff(cutoff: float, order: int = 3) -> Callable:
    """Polynomial envelope of Klicpera et al. (reference rbf.py:60-73)."""

    p = order

    def fn(dist: jnp.ndarray) -> jnp.ndarray:
        x = dist / cutoff
        val = (
            1.0
            - 0.5 * (p + 1) * (p + 2) * x**p
            + p * (p + 2) * x ** (p + 1)
            - 0.5 * p * (p + 1) * x ** (p + 2)
        )
        return jnp.where(dist < cutoff, val, 0.0)

    return fn


def exponential_cutoff(cutoff: float) -> Callable:
    """exp(-d^2 / ((rc-d)(rc+d))) inside rc (fixed version of the broken
    reference rbf.py:76-86)."""

    def fn(dist: jnp.ndarray) -> jnp.ndarray:
        d = jnp.where(dist < cutoff, dist, 0.0)
        denom = (cutoff - d) * (cutoff + d)
        val = jnp.exp(-(d * d) / jnp.maximum(denom, 1e-12))
        return jnp.where(dist < cutoff, val, 0.0)

    return fn


def flat_cutoff(cutoff: float, offset_factor: float = 0.1) -> Callable:
    """1 until (1-offset) rc, smooth cubic decay to 0 at rc (fixed version
    of the broken reference rbf.py:89-110)."""

    assert 0.0 < offset_factor < 1.0

    def fn(dist: jnp.ndarray) -> jnp.ndarray:
        d_prime = dist / cutoff
        d_tilde = (1.0 - d_prime) / offset_factor
        steep = (3.0 - 2.0 * d_tilde) * d_tilde**2
        val = jnp.where(d_prime < (1.0 - offset_factor), 1.0, steep)
        return jnp.where(dist < cutoff, val, 0.0)

    return fn


class SphericalBesselj0(nn.Module):
    """sin(f_n d)/d with trainable frequencies (reference rbf.py:134-152)."""

    num_basis: int = 20
    cutoff: float = 5.0
    eps: float = 1e-5

    @nn.compact
    def __call__(self, dist: jnp.ndarray) -> jnp.ndarray:
        freq_init = (
            math.pi * np.arange(1, self.num_basis + 1, dtype=np.float32) / self.cutoff
        )
        freq = self.param("freq", lambda key: jnp.asarray(freq_init))
        coeff = math.sqrt(2.0 / self.cutoff)
        return coeff * jnp.sin(freq * dist) / (dist + self.eps)


class GaussianSmearing(nn.Module):
    """Gaussians with trainable mean/std (reference rbf.py:113-131)."""

    num_basis: int = 20
    cutoff: float = 5.0
    eps: float = 1e-5

    @nn.compact
    def __call__(self, dist: jnp.ndarray) -> jnp.ndarray:
        mean = self.param(
            "mean",
            lambda key: jnp.linspace(0.0, self.cutoff, self.num_basis),
        )
        std = self.param("std", lambda key: jnp.ones((self.num_basis,)))
        std = jnp.abs(std) + self.eps
        coeff = 1.0 / (std * math.sqrt(2.0 * math.pi))
        return coeff * jnp.exp(-0.5 * ((dist - mean) / std) ** 2)


class ExponentialBernstein(nn.Module):
    """Bernstein polynomials of exp(-alpha d) (reference rbf.py:161-190)."""

    num_basis: int = 20
    alpha: float = 0.5

    @nn.compact
    def __call__(self, dist: jnp.ndarray) -> jnp.ndarray:
        n_basis = self.num_basis
        logfactorial = np.zeros((n_basis,))
        for i in range(2, n_basis):
            logfactorial[i] = logfactorial[i - 1] + np.log(i)
        v = np.arange(0, n_basis)
        n = (n_basis - 1) - v
        logbinomial = logfactorial[-1] - logfactorial[v] - logfactorial[n]
        logc = jnp.asarray(logbinomial, dtype=jnp.float32)
        nn_ = jnp.asarray(n, dtype=jnp.float32)
        vv = jnp.asarray(v, dtype=jnp.float32)
        # softplus_inverse(alpha) as init so softplus(param) == alpha
        alpha0 = float(np.log(np.expm1(self.alpha)))
        raw_alpha = self.param("alpha", lambda key: jnp.asarray(alpha0))
        alpha = jax_softplus(raw_alpha)
        x = -alpha * dist
        # clamp keeps padding edges (dist == 0) finite; real edges unaffected
        x = logc + nn_ * x + vv * jnp.log(jnp.maximum(-jnp.expm1(x), 1e-12))
        return jnp.exp(x)


class ExponentialNorm(nn.Module):
    """exp-normal smearing (reference rbf.py:193-207)."""

    num_basis: int = 20
    cutoff: float = 5.0

    @nn.compact
    def __call__(self, dist: jnp.ndarray) -> jnp.ndarray:
        n = np.arange(1, self.num_basis + 1, dtype=np.float64)
        inv_beta = np.square(2.0 * (1.0 - np.exp(-self.cutoff)) / n)
        beta0 = jnp.asarray(1.0 / inv_beta, dtype=jnp.float32)
        mu0 = jnp.linspace(1.0, math.exp(-self.cutoff), self.num_basis)
        beta = self.param("beta", lambda key: beta0)
        mu = self.param("mu", lambda key: mu0)
        return jnp.exp(-beta * jnp.square(jnp.exp(-dist) - mu))


def jax_softplus(x):
    return jnp.logaddexp(x, 0.0)


_RBF_FACTORY = {
    "bessel": SphericalBesselj0,
    "gaussian": GaussianSmearing,
    "expbern": ExponentialBernstein,
    "expnorm": ExponentialNorm,
}


def resolve_rbf(rbf_kernel: str, num_basis: int, cutoff: float) -> nn.Module:
    if rbf_kernel not in _RBF_FACTORY:
        raise NotImplementedError(f"rbf kernel {rbf_kernel} is not implemented")
    if rbf_kernel == "expbern":
        return ExponentialBernstein(num_basis=num_basis)
    return _RBF_FACTORY[rbf_kernel](num_basis=num_basis, cutoff=cutoff)
