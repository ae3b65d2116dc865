"""Fast isolated timing of the mega-kernel passes (fwd/bwd/bwd2) on the
flagship layout — the A/B harness for kernel experiments (round 5:
lifting bwd from 64% of the MXU roofline toward bwd2's ~90%).

Usage: python tools/kernel_timing.py [tag]
Prints one line per pass; appends {tag, timings} to
tools/kernel_timing_log.json for the experiment record.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from bench import KERNEL_BN as BN
    from bench import KERNEL_CHUNK as CHUNK
    from bench import build_batch

    from xequinet_tpu import keys
    from xequinet_tpu.ops.irreps import Irreps
    from xequinet_tpu.ops.pallas_message import (
        _pad128, fused_message, fused_message_bwd,
    )
    from xequinet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    tag = sys.argv[1] if len(sys.argv) > 1 else "untagged"
    rng = np.random.default_rng(0)
    batch_np = build_batch(rng)
    n_slots = len(batch_np[keys.K_SRC2])
    max_chunks = int(batch_np[keys.K_NCHUNKS].max())
    n_padded = len(batch_np[keys.ATOMIC_NUMBERS])

    irreps = Irreps("128x0e+64x1o+32x2e")
    node_dim, num_basis = 128, 20
    h = node_dim + 2 * irreps.num_irreps
    hp, dp, sdp = _pad128(h), _pad128(irreps.dim), _pad128(node_dim)
    pad_nodes = 32
    window = BN + 2 * ((pad_nodes + 7) // 8) * 8
    xw = hp + dp

    x_cat = jnp.asarray(rng.normal(size=(n_padded, xw)), jnp.float32)
    ef = jnp.asarray(rng.normal(size=(n_slots, 128)), jnp.float32)
    wf = jnp.asarray(rng.normal(size=(128, hp)), jnp.float32)
    slot_meta = (
        jnp.asarray(batch_np[keys.K_SRC2]),
        jnp.asarray(batch_np[keys.K_DST2]),
        jnp.asarray(batch_np[keys.EDGE_INDEX][1]),
        jnp.asarray(batch_np[keys.EDGE_INDEX][0]),
        jnp.asarray(batch_np[keys.K_CHUNK_BASE]),
        jnp.asarray(batch_np[keys.K_NCHUNKS]),
        jnp.asarray(batch_np[keys.K_WSTARTS]),
    )
    em = jnp.asarray(batch_np[keys.EDGE_MASK])
    statics = (str(irreps), num_basis, node_dim, n_padded, BN, CHUNK,
               window, max_chunks, "bfloat16", True)

    def _sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(jax.device_get(leaf.ravel()[0])))

    def time_fn(fn, *args, iters=20, repeats=3):
        out = fn(*args)
        _sync(out)
        reps = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            _sync(out)
            reps.append((time.perf_counter() - t0) / iters)
        return float(np.median(reps))

    f_fwd = jax.jit(lambda x: fused_message(x, ef, wf, slot_meta, em,
                                            *statics))
    t_fwd = time_fn(f_fwd, x_cat)

    g = jnp.asarray(rng.normal(size=(n_padded, sdp + dp)), jnp.float32)
    f_bwd = jax.jit(lambda x, gg: fused_message_bwd(
        x, ef, wf, gg, slot_meta, em, *statics))
    t_bwd = time_fn(f_bwd, x_cat, g)

    f_bwd2 = jax.jit(jax.grad(
        lambda x, gg: sum(jnp.vdot(o, o) for o in fused_message_bwd(
            x, ef, wf, gg, slot_meta, em, *statics)),
        argnums=(0, 1),
    ))
    t_bwd2_total = time_fn(f_bwd2, x_cat, g)
    t_bwd2 = max(t_bwd2_total - t_bwd, 1e-9)

    rec = {
        "tag": tag,
        "fwd_ms": t_fwd * 1e3,
        "bwd_ms": t_bwd * 1e3,
        "bwd2_ms": t_bwd2 * 1e3,
        "step_equivalent_ms": (3 * t_fwd + 6 * t_bwd + 3 * t_bwd2) * 1e3,
    }
    for k, v in rec.items():
        if k != "tag":
            print(f"{k:>22}: {v:8.3f}")
    log = Path(__file__).parent / "kernel_timing_log.json"
    hist = json.loads(log.read_text()) if log.exists() else []
    hist.append(rec)
    log.write_text(json.dumps(hist, indent=1))


if __name__ == "__main__":
    main()
