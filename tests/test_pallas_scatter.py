"""Pallas fused gather-scale-scatter: interpreter-mode correctness on CPU
(TPU execution covered by bench_kernels.py / verify runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xequinet_tpu.ops.pallas_scatter import gather_scale_scatter, prepare_blocks


def make_problem(rng, n=64, e=512, d=128):
    src = rng.integers(0, n, size=e).astype(np.int32)
    dst = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    x = rng.normal(size=(n, d)).astype(np.float32)
    w = rng.normal(size=(e, d)).astype(np.float32)
    return x, src, dst, w


def reference(x, src, dst, w, n):
    return jax.ops.segment_sum(x[src] * w, jnp.asarray(dst), num_segments=n)


@pytest.mark.parametrize("bn", [8, 32])
def test_pallas_scatter_interpret(rng, bn, monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    x, src, dst, w, = make_problem(rng, n=64, e=256, d=128)
    n = x.shape[0]
    starts, counts = prepare_blocks(dst, n, bn, 256)
    with pltpu.force_tpu_interpret_mode():
        out = gather_scale_scatter(
            jnp.asarray(x), (jnp.asarray(src), jnp.asarray(dst)), jnp.asarray(w),
            (jnp.asarray(starts), jnp.asarray(counts)), n, bn,
        )
    want = np.asarray(reference(jnp.asarray(x), src, dst, jnp.asarray(w), n))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)


def test_pallas_scatter_grad(rng):
    from jax.experimental.pallas import tpu as pltpu

    x, src, dst, w = make_problem(rng, n=32, e=128, d=128)
    n = x.shape[0]
    starts, counts = prepare_blocks(dst, n, 8, 128)
    meta = (jnp.asarray(starts), jnp.asarray(counts))
    idx = (jnp.asarray(src), jnp.asarray(dst))

    def loss_pallas(xx, ww):
        with pltpu.force_tpu_interpret_mode():
            out = gather_scale_scatter(xx, idx, ww, meta, n, 8)
        return jnp.sum(out**2)

    def loss_ref(xx, ww):
        return jnp.sum(reference(xx, src, dst, ww, n) ** 2)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(w)
    )
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), rtol=1e-4, atol=1e-4)


def test_prepare_blocks_overflow():
    dst = np.zeros(100, dtype=np.int32)  # all edges into node 0
    with pytest.raises(ValueError):
        prepare_blocks(dst, 16, 4, 50)
