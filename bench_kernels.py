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




def run_v2(n_mols=1024, d=512, bn=256, chunk=1024, pad_nodes=32, iters=20):
    """v2 one-hot MXU kernel vs XLA on molecule-contiguous batches."""
    import numpy as np

    from xequinet_tpu.ops.pallas_scatter_v2 import (
        gather_scale_scatter_v2,
        prepare_v2,
        reference_impl,
    )

    rng = np.random.default_rng(0)
    src_all, dst_all = [], []
    off = 0
    for _ in range(n_mols):
        k = int(rng.integers(12, 29))
        for i in range(k):
            for j in range(k):
                if i != j and rng.random() < 0.5:
                    dst_all.append(off + i)
                    src_all.append(off + j)
        off += k
    order = np.argsort(np.asarray(dst_all), kind="stable")
    src = np.asarray(src_all)[order].astype(np.int32)
    dst = np.asarray(dst_all)[order].astype(np.int32)
    n = ((off + bn - 1) // bn) * bn
    e = len(src)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(e, d)).astype(np.float32))

    (src2, dst2, sel, cb, nc, ws, window, mx) = prepare_v2(
        src, dst, n, bn, chunk, pad_nodes
    )
    sel_j = jnp.asarray(sel)
    pad_frac = len(sel) / e

    def make_v2(dtype):
        @jax.jit
        def pallas_v2(x, w):
            w2 = jnp.where(
                (sel_j >= 0)[:, None],
                jnp.take(w, jnp.clip(sel_j, 0, None), axis=0), 0.0,
            ).astype(dtype)
            return gather_scale_scatter_v2(
                x, w2, jnp.asarray(src2), jnp.asarray(dst2), jnp.asarray(cb),
                jnp.asarray(nc), jnp.asarray(ws), n, bn, chunk, window, mx,
            )
        return pallas_v2

    pallas_v2 = make_v2(jnp.float32)
    pallas_v2_bf16 = make_v2(jnp.bfloat16)
    # intrinsic kernel cost: weights already in the block-aligned layout
    w2_pre = jnp.where(
        (sel_j >= 0)[:, None], jnp.take(w, jnp.clip(sel_j, 0, None), axis=0), 0.0
    )

    @jax.jit
    def pallas_v2_prelaid(x, w2):
        return gather_scale_scatter_v2(
            x, w2, jnp.asarray(src2), jnp.asarray(dst2), jnp.asarray(cb),
            jnp.asarray(nc), jnp.asarray(ws), n, bn, chunk, window, mx,
        )

    @jax.jit
    def xla_op(x, w):
        return reference_impl(x, jnp.asarray(src), jnp.asarray(dst), w, n)

    print(f"v2 problem: n={n} e={e} d={d} bn={bn} chunk={chunk} "
          f"window={window} pad_frac={pad_frac:.2f}")
    outs = {}
    cases = (
        ("xla", xla_op, (x, w)),
        ("pallas_v2", pallas_v2, (x, w)),
        ("v2_prelaid", pallas_v2_prelaid, (x, w2_pre)),
        ("v2_bf16", pallas_v2_bf16, (x, w)),
    )
    for name, op, args in cases:
        o = op(*args)
        float(jax.device_get(o[0, 0]))  # hard sync
        t0 = time.perf_counter()
        for _ in range(iters):
            o = op(*args)
        float(jax.device_get(o[0, 0]))
        dt = (time.perf_counter() - t0) / iters
        outs[name] = o
        print(f"{name:10s}: {dt*1e3:8.3f} ms  {e/dt/1e6:8.1f} M edges/s")
    err = float(jnp.abs(outs["xla"] - outs["pallas_v2"]).max())
    ref = float(jnp.abs(outs["xla"]).max())
    print(f"max |xla - pallas_v2| = {err:.3e} (rel {err/ref:.2e})")


if __name__ == "__main__":
    import sys

    print("backend:", jax.default_backend())
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "v1"):
        # v1 scaffold is sequential per edge — benchmark it small
        # (analysis in ops/pallas_scatter.py docstring)
        run(n=2048, e=20480, iters=20, pallas_iters=2)
    if which in ("all", "v2"):
        run_v2()
