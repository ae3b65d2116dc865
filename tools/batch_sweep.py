"""Flagship train-step throughput vs batch size (TPU).

edges/s is the north-star metric; the XLA remainder (update blocks,
optimizer, force-loss sweep fixed costs) amortizes with batch size until
HBM runs out.  Sweeps n_mols and prints edges/s per point.

Run:  python tools/batch_sweep.py [--mols 768,1024,1536,2048]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mols", default="768,1024,1536,2048")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import FLAGSHIP_KW, KERNEL_BN, build_batch

    from xequinet_tpu import keys
    from xequinet_tpu.models.model import (
        init_params, make_apply_forward, resolve_model,
    )
    from xequinet_tpu.training.loss import ErrorMetric, WeightedLoss
    from xequinet_tpu.training.lr_schedule import (
        resolve_lr_schedule, resolve_optimizer,
    )
    from xequinet_tpu.training.trainer import make_train_step
    from xequinet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    lossfn = WeightedLoss("l2", **{keys.TOTAL_ENERGY: 1.0,
                                   keys.FORCES: 10.0})
    metric = ErrorMetric(keys.TOTAL_ENERGY, keys.FORCES)
    opt = resolve_optimizer(
        "adamw", resolve_lr_schedule("cosine_annealing", 5e-4, 10000)
    )

    for n_mols in [int(x) for x in args.mols.split(",")]:
        rng = np.random.default_rng(0)
        batch_np = build_batch(rng, n_mols=n_mols)
        n_edges = int(batch_np[keys.EDGE_MASK].sum())
        max_chunks = int(batch_np[keys.K_NCHUNKS].max())
        kw = dict(FLAGSHIP_KW)
        kw["num_basis"] = 20
        kw["cutoff"] = 5.0
        kw["pallas_layout"] = (KERNEL_BN, 1024, 32, max_chunks)
        module, extra, _ = resolve_model("xpainn", **kw)
        params = init_params(module, batch_np)
        apply_forward = make_apply_forward(module, extra)
        step = make_train_step(apply_forward, lossfn, opt, True, False,
                               5.0, 0.999, metric)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        state = (params, opt.init(params),
                 jax.tree_util.tree_map(jnp.copy, params))
        one = jnp.asarray(1.0)
        for _ in range(3):
            state, loss, _ = step(state, batch, one)
        float(jax.device_get(loss))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, loss, _ = step(state, batch, one)
        float(jax.device_get(loss))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"n_mols={n_mols:5d} edges={n_edges:7d} "
              f"step={dt*1e3:7.1f} ms  {n_edges/dt/1e3:7.0f}k edges/s",
              flush=True)


if __name__ == "__main__":
    main()
