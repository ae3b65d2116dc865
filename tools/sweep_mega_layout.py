"""TPU: mega-kernel layout sweep (slot-padding vs BN) on the flagship config."""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from xequinet_tpu import keys
from xequinet_tpu.data.batching import collate
from xequinet_tpu.data.datapoint import Datapoint
from xequinet_tpu.models.model import init_params, make_apply_forward, resolve_model
from xequinet_tpu.ops.radius_graph import radius_graph_np
from xequinet_tpu.training.loss import ErrorMetric, WeightedLoss
from xequinet_tpu.training.lr_schedule import resolve_lr_schedule, resolve_optimizer
from xequinet_tpu.training.trainer import make_train_step

rng = np.random.default_rng(0)
dps = []
for _ in range(1024):
    n = int(rng.integers(12, 29))
    pos = rng.normal(size=(n, 3)) * (n ** (1 / 3)) * 0.9
    ei, _ = radius_graph_np(pos, 5.0)
    z = rng.integers(1, 9, size=n).astype(np.int32)
    dps.append(Datapoint(z, pos, edge_index=ei, energy=float(rng.normal()),
                         forces=rng.normal(size=(n, 3))))

KW = dict(node_dim=128, node_irreps="128x0e+64x1o+32x2e", embed_basis="one-hot",
          num_basis=20, action_blocks=3, output_modes=["energy"],
          compute_dtype="bfloat16", update_compute_dtype="bfloat16", remat=False)
lossfn = WeightedLoss("l2", **{keys.TOTAL_ENERGY: 1.0, keys.FORCES: 10.0})
metric = ErrorMetric(keys.TOTAL_ENERGY, keys.FORCES)
schedule = resolve_lr_schedule("cosine_annealing", 5e-4, 10000, warmup_steps=100)
optimizer = resolve_optimizer("adamw", schedule)
one = jnp.asarray(1.0)


def run(tag, bn, mega=True):
    if mega:
        layout = {"block_nodes": bn, "chunk": 1024, "pad_nodes": 32,
                  "max_chunks": 32}
        batch_np = collate(dps, kernel_layout=layout)
        mx = int((batch_np[keys.K_NCHUNKS]).max())
        playout = (bn, 1024, 32, mx)
        kw = {**KW, "use_pallas_scatter": "mega", "pallas_layout": playout}
    else:
        batch_np = collate(dps)
        kw = KW
    n_real = int(batch_np[keys.EDGE_MASK].sum())
    n_slot = batch_np[keys.EDGE_MASK].shape[0]
    m, e, _ = resolve_model("xpainn", **kw)
    params = init_params(m, batch_np)
    f = make_apply_forward(m, e)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    # fwd+forces
    jEF = jax.jit(lambda p, d: f(p, d, True, False)[keys.FORCES])
    t0 = time.perf_counter()
    for _ in range(2):
        o = jEF(params, batch)
    np.asarray(o[0])
    c1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        o = jEF(params, batch)
    np.asarray(o[0])
    ff = (time.perf_counter() - t0) / 10

    step = make_train_step(f, lossfn, optimizer, True, False, 5.0, 0.999, metric)
    state = (params, optimizer.init(params),
             jax.tree_util.tree_map(jnp.copy, params))
    t0 = time.perf_counter()
    for _ in range(3):
        state, loss, _ = step(state, batch, one)
    float(jax.device_get(loss))
    c2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        state, loss, _ = step(state, batch, one)
    float(jax.device_get(loss))
    tt = (time.perf_counter() - t0) / 10
    print(json.dumps({
        "tag": tag, "slot_overhead": round(n_slot / n_real - 1, 3),
        "fwd_forces_ms": round(ff * 1e3, 1), "train_ms": round(tt * 1e3, 1),
        "edges_per_s": round(n_real / tt), "compile_s": round(c1 + c2, 1),
    }), flush=True)


import sys

for arg in sys.argv[1:]:
    if arg == "xla":
        run("xla", 0, mega=False)
    else:
        run(f"mega-bn{arg}", int(arg))
