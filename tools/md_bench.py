"""TPU: MD hot-loop benchmark — Calculator XLA path vs pallas="mega".

Times repeated force calls (geometry moves, one compiled program) on
non-PBC chains of increasing size; prints a table for PERF.md.
"""
import tempfile
import time

import numpy as np
import jax

print("backend:", jax.default_backend())

from xequinet_tpu import keys
from xequinet_tpu.data.batching import collate
from xequinet_tpu.data.datapoint import Datapoint
from xequinet_tpu.interface.calculator import Calculator
from xequinet_tpu.models.model import init_params, resolve_model
from xequinet_tpu.ops.radius_graph import radius_graph_np
from xequinet_tpu.training.trainer import save_checkpoint
from xequinet_tpu.utils.config import ModelConfig, config_to_dict

rng = np.random.default_rng(0)
kw = dict(node_dim=128, node_irreps="128x0e+64x1o+32x2e",
          embed_basis="one-hot", num_basis=20, cutoff=5.0, action_blocks=3,
          output_modes=["energy"])
module, extra, _ = resolve_model("xpainn", **kw)


def chain(n):
    x = np.cumsum(rng.uniform(0.45, 0.8, size=n))
    pos = np.column_stack([x, rng.normal(size=(n, 2)) * 1.8])
    z = rng.integers(1, 9, size=n).astype(np.int32)
    return z, pos


z0, p0 = chain(256)
ei0, _ = radius_graph_np(p0, 5.0)
params = init_params(module, collate([Datapoint(z0, p0, edge_index=ei0)]))
td = tempfile.mkdtemp()
ckpt = td + "/m.ckpt"
save_checkpoint(ckpt, params, config_to_dict(
    ModelConfig(model_name="xpainn", model_kwargs=kw)))


def timeit(calc, z, pos, iters=10):
    r = None
    for i in range(3):
        r = calc.calculate(z, pos + 0.001 * i)
    _ = float(r[keys.FORCES][0, 0])
    t0 = time.perf_counter()
    for i in range(iters):
        r = calc.calculate(z, pos + 0.0001 * (i + 1))
    _ = float(r[keys.FORCES][0, 0])
    return (time.perf_counter() - t0) / iters


print(f"{'atoms':>7} {'edges':>8} {'xla ms':>8} {'mega ms':>8} {'speedup':>8}")
for n in (2000, 4000, 8000):
    z, pos = chain(n)
    ei, _ = radius_graph_np(pos, 5.0)
    caps = dict(max_atoms=((n + 1023) // 1024) * 1024,
                max_edges=((ei.shape[1] * 2 + 4095) // 4096) * 4096)
    cx = Calculator(ckpt, **caps)
    cm = Calculator(ckpt, pallas="mega", **caps)
    t_x = timeit(cx, z, pos)
    t_m = timeit(cm, z, pos)
    taken = any(k[0] == "mega" for k in cm._jitted)
    print(f"{n:>7} {ei.shape[1]:>8} {t_x*1e3:>8.1f} {t_m*1e3:>8.1f} "
          f"{t_x/t_m:>7.2f}x{'' if taken else '  (mega NOT taken)'}")
