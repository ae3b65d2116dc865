"""Standalone kernel benchmark: Pallas fused gather-scale-scatter vs the
XLA gather+multiply+segment_sum path, on realistic message-block shapes.

Run on TPU: python bench_kernels.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from xequinet_tpu.ops.pallas_scatter import gather_scale_scatter, prepare_blocks


def run(n=16384, e=163840, d=480, bn=256, iters=50, pallas_iters=2):
    rng = np.random.default_rng(0)
    # ~10 edges/node, sorted dst like the collated batches
    dst = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    src = rng.integers(0, n, size=e).astype(np.int32)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(e, d)).astype(np.float32))
    starts, counts = prepare_blocks(dst, n, bn, int(counts_cap(e, n, bn)))
    meta = (jnp.asarray(starts), jnp.asarray(counts))
    idx = (jnp.asarray(src), jnp.asarray(dst))

    def xla_op(x, w):
        return jax.ops.segment_sum(
            jnp.take(x, idx[0], axis=0) * w, idx[1], num_segments=n,
            indices_are_sorted=True,
        )

    def pallas_op(x, w):
        return gather_scale_scatter(x, idx, w, meta, n, bn)

    results = {}
    for name, op in (("xla", xla_op), ("pallas", pallas_op)):
        # the pallas scaffold is known-slow (sequential per-edge loop, see
        # ops/pallas_scatter.py docstring) — time it with few iterations
        n_it = iters if name == "xla" else pallas_iters
        f = jax.jit(op)
        out = f(x, w)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n_it):
            out = f(x, w)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n_it
        gbps = (e * d * 4 * 2 + n * d * 4) / dt / 1e9  # w read + x gather + out
        results[name] = (dt, out)
        print(f"{name:7s}: {dt*1e3:8.3f} ms  {e/dt/1e6:8.1f} M edges/s  ~{gbps:6.1f} GB/s")
    err = float(jnp.abs(results["xla"][1] - results["pallas"][1]).max())
    print(f"max |xla - pallas| = {err:.3e}")
    return results


def counts_cap(e, n, bn):
    # generous per-block capacity for uniform random dst
    return int(e / (n / bn) * 2.5 + 64)


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    # the pallas scaffold is sequential per edge: benchmark it on a small
    # problem (numbers in ops/pallas_scatter.py docstring), XLA at scale
    run(n=2048, e=20480, iters=20, pallas_iters=2)
    run_xla_only = run  # full-size XLA reference
    import sys
    sys.stdout.flush()
