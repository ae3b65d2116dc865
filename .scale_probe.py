import time, numpy as np, jax, jax.numpy as jnp
from bench import build_batch
from xequinet_tpu import keys
from xequinet_tpu.models.model import init_params, make_apply_forward, resolve_model
from xequinet_tpu.training.loss import ErrorMetric, WeightedLoss
from xequinet_tpu.training.lr_schedule import resolve_lr_schedule, resolve_optimizer
from xequinet_tpu.training.trainer import make_train_step

for n_mols in (64, 256, 1024):
    rng = np.random.default_rng(0)
    batch_np = build_batch(rng, n_mols=n_mols)
    n_edges = int(batch_np[keys.EDGE_MASK].sum())
    module, extra, _ = resolve_model("xpainn", node_dim=128,
        node_irreps="128x0e+64x1o+32x2e", embed_basis="one-hot",
        num_basis=20, action_blocks=3, output_modes=["energy"])
    params = init_params(module, batch_np)
    af = make_apply_forward(module, extra)
    lossfn = WeightedLoss("l2", **{keys.TOTAL_ENERGY: 1.0, keys.FORCES: 10.0})
    metric = ErrorMetric(keys.TOTAL_ENERGY, keys.FORCES)
    opt = resolve_optimizer("adamw", resolve_lr_schedule("cosine_annealing", 5e-4, 10000))
    step = make_train_step(af, lossfn, opt, True, False, 5.0, 0.999, metric)
    b = {k: jnp.asarray(v) for k, v in batch_np.items()}
    st = (params, opt.init(params), jax.tree_util.tree_map(jnp.copy, params))
    one = jnp.asarray(1.0)
    for _ in range(3): st, l, _ = step(st, b, one)
    jax.block_until_ready(st)
    t0=time.perf_counter()
    for _ in range(10): st, l, _ = step(st, b, one)
    jax.block_until_ready(st)
    dt=(time.perf_counter()-t0)/10
    print(f"n_mols={n_mols:5d} edges={n_edges:7d}: {dt*1e3:8.2f} ms/step {n_edges/dt/1e6:7.1f}M edges/s", flush=True)
