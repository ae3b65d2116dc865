"""TPU: remat x mega correctness + compile time (PERF.md roadmap #3 note).
Also re-measures the MD mega speedup (Calculator) lost to the tunnel outage."""
import time
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend())

from xequinet_tpu import keys
from xequinet_tpu.data.batching import collate
from xequinet_tpu.data.datapoint import Datapoint
from xequinet_tpu.models.model import init_params, make_apply_forward, resolve_model
from xequinet_tpu.ops.radius_graph import radius_graph_np

rng = np.random.default_rng(0)
dps = []
for _ in range(256):
    n = int(rng.integers(12, 29))
    pos = rng.normal(size=(n, 3)) * (n ** (1 / 3)) * 0.9
    ei, _ = radius_graph_np(pos, 5.0)
    z = rng.integers(1, 9, size=n).astype(np.int32)
    dps.append(Datapoint(z, pos, edge_index=ei, energy=float(rng.normal()),
                         forces=rng.normal(size=(n, 3))))
layout = {"block_nodes": 256, "chunk": 1024, "pad_nodes": 32, "max_chunks": 32}
batch_np = collate(dps, kernel_layout=layout)
mx = int(batch_np[keys.K_NCHUNKS].max())
KW = dict(node_dim=128, node_irreps="128x0e+64x1o+32x2e", embed_basis="one-hot",
          num_basis=20, action_blocks=3, output_modes=["energy"],
          compute_dtype="bfloat16", update_compute_dtype="bfloat16",
          use_pallas_scatter="mega", pallas_layout=(256, 1024, 32, mx))
batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

res = {}
for tag, remat in (("plain", False), ("remat", True)):
    m, e, _ = resolve_model("xpainn", **KW, remat=remat)
    params = init_params(m, batch_np)
    f = make_apply_forward(m, e)
    jEF = jax.jit(lambda p, d: f(p, d, True, False)[keys.FORCES])
    t0 = time.perf_counter()
    o = jEF(params, batch)
    v = float(np.asarray(o)[0, 0])
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        o = jEF(params, batch)
    _ = float(np.asarray(o)[0, 0])
    t_run = (time.perf_counter() - t0) / 5
    res[tag] = (np.asarray(o), t_compile, t_run)
    print(f"{tag}: compile {t_compile:.0f}s run {t_run*1e3:.1f} ms")

d = np.abs(res["plain"][0] - res["remat"][0]).max()
s = np.abs(res["plain"][0]).max()
print(f"remat vs plain forces: max dev {d:.3e} (|F|max {s:.1f}, rel {d/s:.1e})")
assert d / s < 5e-3
print("REMAT x MEGA TPU CHECK PASSED")
