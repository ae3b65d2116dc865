"""Roofline/MFU accounting for the flagship mega-kernel train step
(VERDICT round-2 item 2).

Per pass — forward kernel, first-order backward kernel, second-order
kernel — this computes the analytic FLOPs and HBM bytes from the slot
layout, measures the pass in isolation on the real chip (value-fetch
sync), and reports % of the v5e MXU/HBM rooflines.  The full train step
is measured alongside, so the XLA remainder (embeddings, LayerNorms,
update blocks, heads, force-loss forward sweep, optimizer) is the
difference.

Run on the TPU host:  python tools/roofline.py
Writes tools/roofline_report.json and prints the PERF.md table.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np  # noqa: E402

# TPU v5e (1 chip): bf16 MXU peak and HBM bandwidth
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BPS = 819e9

KERNEL_BN = 512
CHUNK = 512  # kept in sync with bench.KERNEL_CHUNK


def kernel_flops_bytes(n_slots, n_blocks, window, hp, dp, sdp, mm_bytes,
                       n_padded):
    """Analytic per-invocation cost of each kernel (one message block).

    FLOPs: every jnp.dot in the kernel bodies (ops/pallas_message.py),
    2*M*N*K each.  Bytes: HBM traffic — the window DMA per destination
    block, the packed edge-feature stream, slot index streams, and the
    output block array (the [C, *] intermediates live in VMEM only).
    """
    F = 128
    xw = hp + dp
    C = n_slots  # total chunk rows processed (sum over blocks, padded)
    # FLOP split (VERDICT round-3 weak #5): "algorithmic" = work any
    # formulation must do (the dense radial-filter matmul + the per-edge
    # elementwise message math); "structural" = one-hot / broadcast /
    # selection matmuls that only exist because gather/scatter/gating is
    # expressed on the MXU.
    fwd_alg = 2 * C * (F * hp) + 3 * C * xw  # filter matmul + elementwise
    fwd_struct = 2 * C * (
        window * xw   # gather (one-hot MXU)
        + 2 * hp * dp   # gate expansions (broadcast structure)
        + F * dp        # rsh broadcast
        + hp * sdp      # scalar-message selection
        + KERNEL_BN * (sdp + dp)  # scatter (one-hot^T)
    )
    fwd_flops = 2 * C * (
        F * hp          # fw = ef @ Wf
        + window * xw   # gather (one-hot MXU)
        + 2 * hp * dp   # gate expansions
        + F * dp        # rsh broadcast
        + hp * sdp      # scalar message
        + KERNEL_BN * (sdp + dp)  # scatter (one-hot^T)
    )
    fwd_bytes = (
        n_blocks * window * xw * mm_bytes  # x window DMA per block
        + C * F * mm_bytes                 # edge features
        + C * 2 * 4                        # src2/dst2 int32
        + n_padded * (sdp + dp) * 4        # output (f32)
        + n_padded * xw * mm_bytes         # x_cat itself read once
    )
    # backward kernel: same structure plus the incoming gradient stream
    # and two output gradients (dx window accumulation + d_ef)
    bwd_flops = 2 * C * (
        KERNEL_BN * (sdp + dp)  # gather of g rows (one-hot)
        + F * hp + window * xw + 2 * hp * dp + F * dp + hp * sdp
        + hp * (sdp + 2 * dp)   # dfilter accumulation dots
        + F * (hp + dp)         # d_ef terms
        + window * xw           # dx scatter
    )
    bwd_bytes = fwd_bytes + n_padded * (sdp + dp) * 4 + C * F * 4
    # second-order kernel: the VJP of the backward wrt inputs AND the
    # force cotangent — roughly two backward-kernel volumes
    bwd2_flops = 2 * bwd_flops
    bwd2_bytes = 1.5 * bwd_bytes
    return {
        "fwd": (fwd_flops, fwd_bytes),
        "bwd": (bwd_flops, bwd_bytes),
        "bwd2": (bwd2_flops, bwd2_bytes),
        "fwd_split": {
            "algorithmic_gflop": fwd_alg / 1e9,
            "structural_gflop": fwd_struct / 1e9,
            "structural_fraction": fwd_struct / (fwd_alg + fwd_struct),
        },
    }


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from bench import KERNEL_BN as BN
    from bench import build_batch

    from xequinet_tpu import keys
    from xequinet_tpu.models.model import (
        init_params, make_apply_forward, resolve_model,
    )
    from xequinet_tpu.ops.irreps import Irreps
    from xequinet_tpu.ops.pallas_message import (
        _pad128, fused_message, fused_message_bwd, pack_edge_features,
    )
    from xequinet_tpu.training.loss import ErrorMetric, WeightedLoss
    from xequinet_tpu.training.lr_schedule import (
        resolve_lr_schedule, resolve_optimizer,
    )
    from xequinet_tpu.training.trainer import make_train_step

    rng = np.random.default_rng(0)
    batch_np = build_batch(rng)
    n_edges = int(batch_np[keys.EDGE_MASK].sum())
    n_slots = len(batch_np[keys.K_SRC2])
    max_chunks = int(batch_np[keys.K_NCHUNKS].max())
    n_padded = len(batch_np[keys.ATOMIC_NUMBERS])
    n_blocks = n_padded // BN

    irreps = Irreps("128x0e+64x1o+32x2e")
    node_dim, num_basis = 128, 20
    h = node_dim + 2 * irreps.num_irreps
    hp, dp, sdp = _pad128(h), _pad128(irreps.dim), _pad128(node_dim)
    pad_nodes = 32
    window = BN + 2 * ((pad_nodes + 7) // 8) * 8
    mm_bytes = 2  # bf16 production mode

    costs = kernel_flops_bytes(n_slots, n_blocks, window, hp, dp, sdp,
                               mm_bytes, n_padded)

    # ---- isolated kernel timings (one message block invocation) -------
    xw = hp + dp
    x_cat = jnp.asarray(rng.normal(size=(n_padded, xw)), jnp.float32)
    ef = jnp.asarray(rng.normal(size=(n_slots, 128)), jnp.float32)
    wf = jnp.asarray(rng.normal(size=(128, hp)), jnp.float32)
    slot_meta = tuple(
        jnp.asarray(batch_np[k]) for k in
        (keys.K_SRC2, keys.K_DST2)
    ) + (
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
        # value-fetch of ONE element: block_until_ready does not drain
        # the axon queue (and fetching the full 100+ MB outputs would
        # dominate the measurement 10-100x)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(jax.device_get(leaf.ravel()[0])))

    def time_fn(fn, *args, iters=20):
        out = fn(*args)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        return (time.perf_counter() - t0) / iters

    f_fwd = jax.jit(lambda x: fused_message(x, ef, wf, slot_meta, em,
                                            *statics))
    t_fwd = time_fn(f_fwd, x_cat)

    g = jnp.asarray(rng.normal(size=(n_padded, sdp + dp)), jnp.float32)
    f_bwd = jax.jit(lambda x, gg: fused_message_bwd(
        x, ef, wf, gg, slot_meta, em, *statics))
    t_bwd = time_fn(f_bwd, x_cat, g)

    # second-order: grad of (a scalar of the backward outputs) wrt x/g —
    # runs _bwd2_kernel through fused_message_bwd's custom VJP
    f_bwd2 = jax.jit(jax.grad(
        lambda x, gg: sum(jnp.vdot(o, o) for o in fused_message_bwd(
            x, ef, wf, gg, slot_meta, em, *statics)),
        argnums=(0, 1),
    ))
    t_bwd2_total = time_fn(f_bwd2, x_cat, g)
    # f_bwd2 re-runs the bwd kernel (forward of the vjp) + bwd2 kernel
    t_bwd2 = max(t_bwd2_total - t_bwd, 1e-9)

    # ---- window-narrowing sweep (VERDICT round-3 item 6) --------------
    # the gather/scatter window is BN + 2*pad; a tighter spatial sort
    # admits a smaller pad -> fewer structural FLOPs per slot
    from bench import build_batch as _bb
    from xequinet_tpu.data.batching import collate as _collate

    window_sweep = []
    for pad_try in (32, 16, 8):
        try:
            rng_w = np.random.default_rng(0)
            import bench as _bmod
            dps_w = []
            from xequinet_tpu.data.datapoint import Datapoint as _Dp
            from xequinet_tpu.ops.radius_graph import radius_graph_np as _rg
            for _ in range(1024):
                nw = int(rng_w.integers(12, 29))
                pw = rng_w.normal(size=(nw, 3)) * (nw ** (1 / 3)) * 0.9
                eiw, _ = _rg(pw, 5.0)
                zw = rng_w.integers(1, 9, size=nw).astype(np.int32)
                dps_w.append(_Dp(zw, pw, edge_index=eiw))
            bw = _collate(dps_w, kernel_layout={
                "block_nodes": BN, "chunk": CHUNK, "pad_nodes": pad_try,
                "max_chunks": 64,
            })
        except Exception as exc:  # reach exceeds the window: report it
            window_sweep.append({"pad": pad_try, "error": str(exc)[:100]})
            continue
        win_t = BN + 2 * ((pad_try + 7) // 8) * 8
        sm = tuple(jnp.asarray(bw[k]) for k in (keys.K_SRC2, keys.K_DST2)) + (
            jnp.asarray(bw[keys.EDGE_INDEX][1]),
            jnp.asarray(bw[keys.EDGE_INDEX][0]),
            jnp.asarray(bw[keys.K_CHUNK_BASE]),
            jnp.asarray(bw[keys.K_NCHUNKS]),
            jnp.asarray(bw[keys.K_WSTARTS]),
        )
        mxw = int(bw[keys.K_NCHUNKS].max())
        emw = jnp.asarray(bw[keys.EDGE_MASK])
        efw = jnp.asarray(
            rng.normal(size=(len(bw[keys.K_SRC2]), 128)), jnp.float32
        )
        stat_w = (str(irreps), num_basis, node_dim,
                  len(bw[keys.ATOMIC_NUMBERS]), BN, CHUNK, win_t, mxw,
                  "bfloat16", True)
        xw_cat = jnp.asarray(
            rng.normal(size=(len(bw[keys.ATOMIC_NUMBERS]), xw)), jnp.float32
        )
        f_w = jax.jit(lambda x, e_, s_, m_: fused_message(
            x, e_, wf, s_, m_, *stat_w))
        # jit cache key differs per stat_w (static args), safe to reuse fn
        tw = time_fn(lambda x: f_w(x, efw, sm, emw), xw_cat)
        window_sweep.append({
            "pad": pad_try, "window": win_t, "fwd_ms": tw * 1e3,
        })

    # ---- full production train step -----------------------------------
    module, extra, _ = resolve_model(
        "xpainn", node_dim=node_dim, node_irreps=str(irreps),
        embed_basis="one-hot", num_basis=num_basis, action_blocks=3,
        output_modes=["energy"], remat=False,
        compute_dtype="bfloat16", update_compute_dtype="bfloat16",
        use_pallas_scatter="mega", pallas_layout=(BN, CHUNK, 32, max_chunks),
    )
    params = init_params(module, batch_np)
    apply_forward = make_apply_forward(module, extra)
    lossfn = WeightedLoss("l2", **{keys.TOTAL_ENERGY: 1.0, keys.FORCES: 10.0})
    metric = ErrorMetric(keys.TOTAL_ENERGY, keys.FORCES)
    opt = resolve_optimizer(
        "adamw", resolve_lr_schedule("cosine_annealing", 5e-4, 10000)
    )
    step = make_train_step(apply_forward, lossfn, opt, True, False, 5.0,
                           0.999, metric)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state = (params, opt.init(params),
             jax.tree_util.tree_map(jnp.copy, params))
    one = jnp.asarray(1.0)

    for _ in range(3):
        state, loss, _ = step(state, batch, one)
    float(jax.device_get(loss))
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        state, loss, _ = step(state, batch, one)
    float(jax.device_get(loss))
    t_step = (time.perf_counter() - t0) / iters

    # pass counts per step: 3 action blocks; force training runs the fwd
    # kernel twice (primal + remat-free grad pass reuses residuals -> 1),
    # the bwd kernel twice (forces in the loss + its own grad re-run) and
    # the bwd2 once per block.  Conservatively: fwd x3, bwd x6, bwd2 x3.
    kernels_time = 3 * t_fwd + 6 * t_bwd + 3 * t_bwd2
    remainder = t_step - kernels_time

    rows = []
    for name, t, mult in (("fwd", t_fwd, 3), ("bwd", t_bwd, 6),
                          ("bwd2", t_bwd2, 3)):
        fl, by = costs[name]
        rows.append({
            "pass": name,
            "per_call_ms": t * 1e3,
            "calls_per_step": mult,
            "gflops_per_call": fl / 1e9,
            "gbytes_per_call": by / 1e9,
            "pct_mxu_roofline": 100 * fl / t / PEAK_BF16_FLOPS,
            "pct_hbm_roofline": 100 * by / t / PEAK_HBM_BPS,
        })
    report = {
        "workload": {
            "n_edges": n_edges, "n_slots": n_slots, "n_nodes": n_padded,
            "block_nodes": BN, "window": window,
            "hp": hp, "dp": dp, "sdp": sdp, "mm": "bfloat16",
        },
        "passes": rows,
        "fwd_flop_split": costs["fwd_split"],
        "window_sweep": window_sweep,
        "train_step_ms": t_step * 1e3,
        "edges_per_s": n_edges / t_step,
        "kernels_ms": kernels_time * 1e3,
        "xla_remainder_ms": remainder * 1e3,
    }
    out = Path(__file__).parent / "roofline_report.json"
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))
    print(f"\ntrain step {t_step*1e3:.1f} ms = kernels "
          f"{kernels_time*1e3:.1f} ms + XLA remainder "
          f"{remainder*1e3:.1f} ms ({100*remainder/t_step:.0f}%)")


if __name__ == "__main__":
    main()
