"""TPU: time ONLY the flagship train step (quick perf iteration loop).

python tools/flagship_step.py  — prints step ms + edges/s.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
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

    rng = np.random.default_rng(0)
    batch_np = build_batch(rng)
    n_real = int(batch_np[keys.EDGE_MASK].sum())
    mx = int(batch_np[keys.K_NCHUNKS].max())
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    kw = {**FLAGSHIP_KW, "pallas_layout": (KERNEL_BN, 1024, 32, mx)}
    for arg in sys.argv[1:]:
        k, _, v = arg.partition("=")
        kw[k] = eval(v)
    module, extra_props, _ = resolve_model("xpainn", **kw)
    params = init_params(module, batch_np)
    fwd = make_apply_forward(module, extra_props)
    metric = ErrorMetric(keys.TOTAL_ENERGY, keys.FORCES)
    schedule = resolve_lr_schedule("cosine_annealing", 5e-4, 10000, warmup_steps=100)
    optimizer = resolve_optimizer("adamw", schedule)
    loss_fn = WeightedLoss("l2", **{keys.TOTAL_ENERGY: 1.0, keys.FORCES: 10.0})
    step = make_train_step(fwd, loss_fn, optimizer, True, False, 5.0, 0.999, metric)
    one = jnp.asarray(1.0)
    cp = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    state = (cp(params), optimizer.init(cp(params)), cp(params))

    t0 = time.perf_counter()
    state, l, _ = step(state, batch, one)
    print(f"first step (compile): {time.perf_counter()-t0:.1f}s "
          f"loss={float(jax.device_get(l)):.3f}", flush=True)
    for _ in range(2):
        state, l, _ = step(state, batch, one)
    float(jax.device_get(l))
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        state, l, _ = step(state, batch, one)
    float(jax.device_get(l))
    dt = (time.perf_counter() - t0) / iters
    print(f"train step: {dt*1e3:.1f} ms   {n_real/dt/1e3:.0f}k edges/s")


if __name__ == "__main__":
    main()
