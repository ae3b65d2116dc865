"""On-chip cost of the Ewald long-range block (VERDICT r3 item 5).

Times fwd+forces on a periodic crystal batch for xpainn vs xpainn-ewald
(PBC k-grid), with the message blocks on the XLA path and on the mega
kernels — the Ewald block itself is XLA in both cases: its structure
factors are dense masked [N, K, D] segment sums (MXU-shaped batched
matmul work), with no irregular gather/scatter for a Pallas kernel to
beat, and it composes with the mega message kernels unchanged (it reads
node features after the message stack).

Run on the TPU host:  python tools/ewald_cost.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import CRYSTAL_BN, KERNEL_CHUNK, build_crystal_batch
    from xequinet_tpu import keys
    from xequinet_tpu.models.model import (
        init_params, make_apply_forward, resolve_model,
    )

    rng = np.random.default_rng(0)
    batch_np = build_crystal_batch(rng, n_cells=640)
    n_real = int(batch_np[keys.EDGE_MASK].sum())
    mx = int(batch_np[keys.K_NCHUNKS].max())
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    base = dict(node_dim=128, node_irreps="128x0e+64x1o+32x2e",
                embed_basis="one-hot", num_basis=20, action_blocks=3,
                output_modes=["energy"], compute_dtype="bfloat16",
                update_compute_dtype="bfloat16")
    ew = dict(use_pbc=True, num_k_points=[3, 3, 3], projection_dim=8,
              ewald_blocks=1)
    # layout must match the loader's slot layout (bench.build_crystal_batch
    # uses CRYSTAL_BN; a mismatch mis-shapes the ghost/window geometry)
    mega = dict(use_pallas_scatter="mega",
                pallas_layout=(CRYSTAL_BN, KERNEL_CHUNK, 32, mx))

    def timed(name, model_name, kw):
        module, extra, _ = resolve_model(model_name, **kw)
        params = init_params(module, batch_np)
        fwd = make_apply_forward(module, extra)
        f = jax.jit(lambda p, b: fwd(p, b, True, False)[keys.FORCES])
        r = f(params, batch)
        float(np.asarray(r)[0, 0])
        t0 = time.perf_counter()
        for _ in range(10):
            r = f(params, batch)
        float(np.asarray(r)[0, 0])
        dt = (time.perf_counter() - t0) / 10
        print(f"{name:26s}: {dt*1e3:7.1f} ms fwd+forces "
              f"({n_real/dt/1e3:.0f}k edges/s)", flush=True)
        return dt

    t0 = timed("xpainn  XLA", "xpainn", base)
    t1 = timed("xpainn-ewald  XLA", "xpainn-ewald", {**base, **ew})
    t2 = timed("xpainn  mega", "xpainn", {**base, **mega})
    t3 = timed("xpainn-ewald  mega", "xpainn-ewald", {**base, **ew, **mega})
    print(f"\nEwald block cost: +{(t1-t0)*1e3:.1f} ms on XLA, "
          f"+{(t3-t2)*1e3:.1f} ms on mega "
          f"({640} cells, 27 k-points, proj 8)")

    # ---- k-point scaling sweep (round 5, VERDICT r4 item 7) ------------
    # num_k_points = [n,n,n] gives K = ((2n+1)^3 - 1)/2 half-box points.
    # The dense formulation materializes [N, K, D] products (structure-
    # factor build + back-scatter, fwd and force-bwd): the analytic HBM
    # bound below counts those passes; measured-vs-bound says whether
    # the block is bandwidth-optimal for this formulation.
    n_atoms = int(batch_np[keys.NODE_MASK].sum())
    d_dim = base["node_dim"]
    print("\nK sweep (mega messages):")
    print(f"{'n':>2} {'K':>4} {'block_ms':>9} {'hbm_bound_ms':>13} "
          f"{'ms_per_K':>9}")
    for n_k in (1, 2, 3, 4):
        K = ((2 * n_k + 1) ** 3 - 1) // 2
        kw = {**base, **ew, **mega, "num_k_points": [n_k, n_k, n_k]}
        t = timed(f"ewald mega n={n_k} (K={K})", "xpainn-ewald", kw)
        block_ms = (t - t2) * 1e3
        # [N,K,D] f32 passes: fwd sf product + 2x filt/back-scatter, and
        # the same three transposed in the force backward (grad through
        # cos/sin stays [N,K])
        nkd_bytes = n_atoms * K * d_dim * 4
        bound_ms = 6 * nkd_bytes / 819e9 * 1e3
        print(f"{n_k:>2} {K:>4} {block_ms:>9.1f} {bound_ms:>13.1f} "
              f"{block_ms / K:>9.3f}", flush=True)


if __name__ == "__main__":
    main()
