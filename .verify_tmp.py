import numpy as np
import optax
import jax
from xequinet_tpu import keys
from xequinet_tpu.data.batching import collate
from xequinet_tpu.data.datapoint import Datapoint
from xequinet_tpu.models.model import init_params, resolve_model
from xequinet_tpu.ops.radius_graph import radius_graph_np
from xequinet_tpu.parallel.halo import (
    halo_partition, make_halo_dp_train_step, stack_halo_systems,
)
from xequinet_tpu.parallel.mesh import GP_AXIS, make_mesh

print("backend:", jax.default_backend())
rng = np.random.default_rng(0)
kw = dict(node_dim=16, node_irreps="16x0e+8x1o", embed_basis="one-hot",
          num_basis=8, action_blocks=2, output_modes=["energy"])
module, extra, _ = resolve_model("xpainn", **kw)
n = 96
sys_list = []
for _ in range(1):
    xs = np.cumsum(rng.uniform(0.8, 1.6, size=n))
    pos = np.column_stack([xs, rng.normal(size=(n, 2)) * 1.2])
    z = rng.integers(1, 9, size=n).astype(np.int32)
    ei, _ = radius_graph_np(pos, 5.0)
    ei = ei[:, np.argsort(ei[0], kind="stable")]
    sys_list.append((z, pos, ei))
params = init_params(module, collate([Datapoint(*sys_list[0][:2],
                                                edge_index=sys_list[0][2])]))
e_cap = int(np.ceil(sys_list[0][2].shape[1]) * 2)
parts = [halo_partition(z, p, e, 1, halo=16, edge_cap=e_cap)
         for z, p, e in sys_list]
stacked, geom = stack_halo_systems([p[0] for p in parts],
                                   [p[1] for p in parts])
mesh = make_mesh(1, axis_names=("dp", GP_AXIS), shape=(1, 1))
opt = optax.sgd(1e-4)
step = make_halo_dp_train_step(
    lambda p, d: module.apply({"params": p}, d), mesh, geom, opt)
nl = geom["n_local"]
f = np.zeros((1, 1, nl, 3), dtype=np.float32)
state = (params, opt.init(params))
losses = []
for _ in range(3):
    state, loss = step(state, stacked, np.zeros(1, np.float32), f)
    losses.append(float(np.asarray(loss).ravel()[0]))
print("dp x halo on chip, losses:", [f"{x:.3f}" for x in losses])
assert all(np.isfinite(losses)) and losses[-1] < losses[0]
print("DPxHALO CHIP OK")
