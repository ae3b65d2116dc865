"""TPU: decompose the XLA remainder of the flagship train step (round 4).

The roofline (tools/roofline.py) splits the 190.8 ms step into kernel
time (136.9 ms) and an XLA remainder (53.9 ms).  This tool attributes
the remainder by timing full train steps of ablated model stacks:

  full        — flagship config (bench.py FLAGSHIP_KW)
  no-update   — message blocks only (update blocks removed)
  no-ln       — layer_norm=False everywhere
  no-both     — neither update blocks nor LayerNorms

plus the optimizer+EMA cost alone (train step over a constant loss).
Differences are lower bounds on each component's cost (removal also
removes its interactions), but they rank the levers.

Run on the TPU host:  python tools/remainder_breakdown.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np  # noqa: E402


def bench(fn, sync, iters=10, warmup=2):
    for _ in range(warmup):
        r = fn()
    sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    sync(r)
    return (time.perf_counter() - t0) / iters


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

    metric = ErrorMetric(keys.TOTAL_ENERGY, keys.FORCES)
    schedule = resolve_lr_schedule("cosine_annealing", 5e-4, 10000, warmup_steps=100)
    optimizer = resolve_optimizer("adamw", schedule)
    loss_fn = WeightedLoss("l2", **{keys.TOTAL_ENERGY: 1.0, keys.FORCES: 10.0})
    one = jnp.asarray(1.0)
    cp = lambda t: jax.tree_util.tree_map(jnp.copy, t)

    def time_variant(tag, **extra):
        kw = {**FLAGSHIP_KW, "pallas_layout": (KERNEL_BN, 1024, 32, mx), **extra}
        module, extra_props, _ = resolve_model("xpainn", **kw)
        if extra.get("_drop_updates"):
            from xequinet_tpu.models.model import BlockStack
            from xequinet_tpu.models.xpainn import XPainnUpdate

            blocks = tuple(
                b for b in module.blocks if not isinstance(b, XPainnUpdate)
            )
            module = BlockStack(blocks=blocks)
        params = init_params(module, batch_np)
        fwd = make_apply_forward(module, extra_props)
        step = make_train_step(fwd, loss_fn, optimizer, True, False, 5.0, 0.999, metric)
        state = [(cp(params), optimizer.init(cp(params)), cp(params))]

        def run():
            state[0], l, _ = step(state[0], batch, one)
            return l

        t = bench(run, lambda r: float(jax.device_get(r)))
        print(f"{tag:24s}: {t*1e3:7.1f} ms  ({n_real/t/1e3:6.0f}k edges/s)")
        return t

    # pop keys resolve_model doesn't know before passing custom flags
    t_full = time_variant("full")
    t_noup = time_variant("no-update", _drop_updates=True)
    t_noln = time_variant("no-ln", layer_norm=False)
    t_noboth = time_variant("no-both", _drop_updates=True, layer_norm=False)

    print(f"\nupdate blocks (w/ LN):   {1e3*(t_full - t_noup):7.1f} ms")
    print(f"all LayerNorms:          {1e3*(t_full - t_noln):7.1f} ms")
    print(f"updates+LN together:     {1e3*(t_full - t_noboth):7.1f} ms")


if __name__ == "__main__":
    main()
