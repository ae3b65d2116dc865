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

    from bench import FLAGSHIP_KW, KERNEL_BN, KERNEL_CHUNK, build_batch
    from xequinet_tpu import keys
    from xequinet_tpu.models.model import (
        init_params, make_apply_forward, resolve_model,
    )
    from xequinet_tpu.training.loss import ErrorMetric, WeightedLoss
    from xequinet_tpu.training.lr_schedule import (
        resolve_lr_schedule, resolve_optimizer,
    )
    from xequinet_tpu.training.trainer import make_train_step

    layout_kw = {"bn": KERNEL_BN, "chunk": KERNEL_CHUNK}
    kw_over = {}
    for arg in sys.argv[1:]:
        k, _, v = arg.partition("=")
        if k in layout_kw:
            layout_kw[k] = int(v)
        else:
            kw_over[k] = eval(v)

    rng = np.random.default_rng(0)
    bn, chunk = layout_kw["bn"], layout_kw["chunk"]
    if (bn, chunk) == (KERNEL_BN, KERNEL_CHUNK):
        batch_np = build_batch(rng)
    else:
        # rebuild with a custom kernel slot layout
        import bench as _b

        orig = _b.KERNEL_BN
        try:
            _b.KERNEL_BN = bn
            batch_np = build_batch(rng)
        finally:
            _b.KERNEL_BN = orig
        if chunk != KERNEL_CHUNK:
            from xequinet_tpu.data.batching import collate  # noqa
            # re-collate with the chunk override
            batch_np = None
    if batch_np is None:
        from xequinet_tpu.data.batching import collate
        from xequinet_tpu.data.datapoint import Datapoint
        from xequinet_tpu.ops.radius_graph import radius_graph_np

        rng = np.random.default_rng(0)
        dps = []
        for _ in range(1024):
            n = int(rng.integers(12, 29))
            pos = rng.normal(size=(n, 3)) * (n ** (1 / 3)) * 0.9
            ei, _ = radius_graph_np(pos, 5.0)
            z = rng.integers(1, 9, size=n).astype(np.int32)
            dps.append(Datapoint(z, pos, edge_index=ei,
                                 energy=float(rng.normal()),
                                 forces=rng.normal(size=(n, 3))))
        layout = {"block_nodes": bn, "chunk": chunk, "pad_nodes": 32,
                  "max_chunks": 64}
        batch_np = collate(dps, kernel_layout=layout)
    n_real = int(batch_np[keys.EDGE_MASK].sum())
    n_slots = len(batch_np[keys.K_SRC2])
    mx = int(batch_np[keys.K_NCHUNKS].max())
    print(f"layout bn={bn} chunk={chunk}: real {n_real} slots {n_slots} "
          f"(overhead {100*(n_slots-n_real)/n_real:.1f}%)", flush=True)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    kw = {**FLAGSHIP_KW, "pallas_layout": (bn, chunk, 32, mx), **kw_over}
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
