"""TPU: component-level timing of the flagship train step (mega kernels).

Breaks the 191.6 ms train step (PERF.md round 2) into:
  A. forward, energy only
  B. forward + forces (first-order backward kernel)
  C. train step, energy-only loss (one backward through the net, no 2nd order)
  D. full train step, energy+force loss (second-order kernel)
and measures the slot-padding sensitivity of the mega layout:
  - default collate order vs molecules sorted by atom count (denser dst
    blocks -> fewer partial 1024-edge chunks).

All timings hard-sync by fetching a value (axon block_until_ready caveat,
PERF.md).
"""
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

BN = 512

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
metric = ErrorMetric(keys.TOTAL_ENERGY, keys.FORCES)
schedule = resolve_lr_schedule("cosine_annealing", 5e-4, 10000, warmup_steps=100)
optimizer = resolve_optimizer("adamw", schedule)
one = jnp.asarray(1.0)


def bench(fn, sync, iters=10, warmup=2):
    for _ in range(warmup):
        r = fn()
    sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    sync(r)
    return (time.perf_counter() - t0) / iters


def setup(mol_list, sort_by_size):
    mols = sorted(mol_list, key=lambda d: len(d.atomic_numbers)) if sort_by_size else mol_list
    layout = {"block_nodes": BN, "chunk": 1024, "pad_nodes": 32, "max_chunks": 32}
    batch_np = collate(mols, kernel_layout=layout)
    mx = int(batch_np[keys.K_NCHUNKS].max())
    kw = {**KW, "use_pallas_scatter": "mega", "pallas_layout": (BN, 1024, 32, mx)}
    m, e, _ = resolve_model("xpainn", **kw)
    params = init_params(m, batch_np)
    f = make_apply_forward(m, e)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    n_real = int(batch_np[keys.EDGE_MASK].sum())
    # slot overhead: padded kernel edge slots vs real edges
    n_slot = batch_np[keys.EDGE_MASK].shape[0]
    return m, e, params, f, batch, n_real, n_slot, mx


for tag, sort in [("default-order", False), ("size-sorted", True)]:
    m, e, params, f, batch, n_real, n_slot, mx = setup(dps, sort)
    print(f"\n=== {tag}: real edges {n_real}, slots {n_slot} "
          f"(overhead {100*(n_slot-n_real)/n_real:.1f}%), max_chunks {mx}")

    jE = jax.jit(lambda p, d: f(p, d, False, False)[keys.TOTAL_ENERGY])
    tA = bench(lambda: jE(params, batch), lambda r: float(np.asarray(r)[0]))
    print(f"A fwd energy-only      : {tA*1e3:7.1f} ms  ({n_real/tA/1e3:.0f}k edges/s)")

    jEF = jax.jit(lambda p, d: f(p, d, True, False)[keys.FORCES])
    tB = bench(lambda: jEF(params, batch), lambda r: float(np.asarray(r)[0, 0]))
    print(f"B fwd + forces         : {tB*1e3:7.1f} ms  ({n_real/tB/1e3:.0f}k edges/s)")

    lossE = WeightedLoss("l2", **{keys.TOTAL_ENERGY: 1.0})
    stepE = make_train_step(f, lossE, optimizer, False, False, 5.0, 0.999, metric)
    cp = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    stE = (cp(params), optimizer.init(cp(params)), cp(params))
    def runE():
        global stE
        stE, l, _ = stepE(stE, batch, one)
        return l
    tC = bench(runE, lambda r: float(jax.device_get(r)))
    print(f"C train step, E loss   : {tC*1e3:7.1f} ms  ({n_real/tC/1e3:.0f}k edges/s)")

    lossEF = WeightedLoss("l2", **{keys.TOTAL_ENERGY: 1.0, keys.FORCES: 10.0})
    stepEF = make_train_step(f, lossEF, optimizer, True, False, 5.0, 0.999, metric)
    stF = (cp(params), optimizer.init(cp(params)), cp(params))
    def runF():
        global stF
        stF, l, _ = stepF_step(stF, batch, one)
        return l
    stepF_step = stepEF
    tD = bench(runF, lambda r: float(jax.device_get(r)))
    print(f"D train step, E+F loss : {tD*1e3:7.1f} ms  ({n_real/tD/1e3:.0f}k edges/s)")
