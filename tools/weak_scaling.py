"""Simulated weak-scaling sweep: dp and halo over n_devices in {1,2,4,8}.

For a FIXED large system (halo) and a fixed per-device batch (dp), sweep
the mesh size and record what the compiler actually emits:

* collective bytes per program (optimized-HLO result shapes, same parser
  as tools/measure_comm_volume.py) — the halo path must scale
  O(n_shards * halo * D) (each shard exchanges two halo windows) while
  the GSPMD edge-sharding path pays O(n_shards * n_nodes * D)
  all-reduces;
* per-shard load balance: real edges per shard (max/mean) and the padded
  work factor (n_shards * edge_cap / E);
* dp: gradient-pmean bytes (constant in mesh size per replica = the
  parameter bytes) and metric psum bytes.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python tools/weak_scaling.py
Publishes the PERF.md weak-scaling table (VERDICT round-2 item 4).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np  # noqa: E402

from tools.measure_comm_volume import collective_bytes  # noqa: E402


def build_system(n=2048, seed=0, cutoff=5.0):
    from xequinet_tpu.ops.radius_graph import radius_graph_np

    rng = np.random.default_rng(seed)
    x = np.cumsum(rng.uniform(0.25, 0.5, size=n))
    pos = np.column_stack([x, rng.normal(size=(n, 2)) * 2.5])
    z = rng.integers(1, 9, size=n).astype(np.int32)
    ei, _ = radius_graph_np(pos, cutoff)
    s = np.argsort(ei[0], kind="stable")
    return z, pos, ei[:, s]


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from xequinet_tpu import keys
    from xequinet_tpu.data.batching import collate
    from xequinet_tpu.data.datapoint import Datapoint
    from xequinet_tpu.models.model import (
        init_params, make_apply_forward, resolve_model,
    )
    from xequinet_tpu.ops.radius_graph import radius_graph_np
    from xequinet_tpu.parallel.edge_partition import (
        make_edge_parallel_forward, shard_batch,
    )
    from xequinet_tpu.parallel.halo import halo_partition, make_halo_forward
    from xequinet_tpu.parallel.mesh import DP_AXIS, GP_AXIS, make_mesh

    assert len(jax.devices()) >= 8, "run with host_platform_device_count=8"

    kw = dict(node_dim=64, node_irreps="64x0e+32x1o+16x2e",
              embed_basis="one-hot", num_basis=16, action_blocks=3,
              output_modes=["energy"])
    module, extra, _ = resolve_model("xpainn", **kw)
    apply_fwd = make_apply_forward(module, extra)

    z, pos, ei = build_system()
    n, E = len(z), ei.shape[1]
    batch_full = collate([Datapoint(z, pos, edge_index=ei)])
    params = init_params(module, batch_full)
    apply_bound = lambda d: module.apply({"params": params}, d)

    report = {"meta": {"n_nodes": n, "n_edges": E, "model": kw["node_irreps"]}}
    sweep = []
    for s in (1, 2, 4, 8):
        row = {"n_devices": s}
        mesh = make_mesh(s, axis_names=(GP_AXIS,))
        stacked, geom = halo_partition(z, pos, ei, s, halo=64)
        halo_fwd = make_halo_forward(apply_bound, mesh, geom, GP_AXIS)
        lowered = jax.jit(
            lambda b: halo_fwd(b, compute_forces=True)
        ).lower({k: jnp.asarray(v) for k, v in stacked.items()})
        row["halo_bytes"] = collective_bytes(
            lowered.compile().as_text()
        )["total"]
        per_shard = stacked[keys.EDGE_MASK].sum(axis=1)
        row["edge_balance_max_over_mean"] = float(
            per_shard.max() / max(per_shard.mean(), 1)
        )
        row["padded_work_factor"] = float(
            s * stacked[keys.EDGE_MASK].shape[1] / E
        )
        row["halo_rows"] = int(geom["halo"])

        # GSPMD edge sharding, same mesh
        sharded = shard_batch(batch_full, mesh)
        efwd = make_edge_parallel_forward(apply_bound, mesh)
        lowered = jax.jit(
            lambda b: efwd(b, True, False)[keys.FORCES]
        ).lower(sharded)
        row["gspmd_bytes"] = collective_bytes(
            lowered.compile().as_text()
        )["total"]

        # dp: one train step at fixed per-device batch (weak scaling)
        from xequinet_tpu.parallel.data_parallel import (
            make_dp_train_step, replicate, stack_device_batches,
        )
        from xequinet_tpu.training.loss import ErrorMetric, WeightedLoss
        from xequinet_tpu.training.lr_schedule import (
            resolve_lr_schedule, resolve_optimizer,
        )
        from xequinet_tpu.training.trainer import make_step_core

        rng = np.random.default_rng(1)
        micro = []
        for _ in range(s):
            dps = []
            for _ in range(4):
                m = 8
                p = rng.normal(size=(m, 3)) * 1.4
                eim, _ = radius_graph_np(p, 5.0)
                dps.append(Datapoint(
                    rng.integers(1, 9, m).astype(np.int32), p,
                    edge_index=eim, energy=float(rng.normal()),
                    forces=rng.normal(size=(m, 3)).astype(np.float32),
                ))
            micro.append(collate(dps, n_nodes=48, n_edges=512, n_graphs=5))
        stacked_dp = stack_device_batches(micro)
        mesh_dp = make_mesh(s, axis_names=(DP_AXIS,))
        lossfn = WeightedLoss("l2", **{keys.TOTAL_ENERGY: 1.0,
                                       keys.FORCES: 10.0})
        metric = ErrorMetric(keys.TOTAL_ENERGY, keys.FORCES)
        opt = resolve_optimizer(
            "adamw", resolve_lr_schedule("cosine_annealing", 5e-4, 100)
        )
        params_small = init_params(module, micro[0])
        core = make_step_core(apply_fwd, lossfn, opt, True, False, None,
                              None, metric)
        dp_step = make_dp_train_step(core, mesh_dp)
        state = (replicate(params_small, mesh_dp),
                 replicate(opt.init(params_small), mesh_dp), None)
        lowered = dp_step.lower(
            state, {k: jnp.asarray(v) for k, v in stacked_dp.items()},
            jnp.asarray(1.0),
        )
        row["dp_bytes"] = collective_bytes(lowered.compile().as_text())["total"]
        sweep.append(row)
        print(json.dumps(row))

    report["sweep"] = sweep
    b = {r["n_devices"]: r for r in sweep}
    print(json.dumps(report["meta"]))
    # NOTE: shard_map lowers to a per-device program, so collective_bytes
    # counts PER-DEVICE traffic.  Ideal weak scaling = per-device bytes
    # constant in mesh size (total grows linearly); the halo path hits it
    # exactly (each shard exchanges two fixed halo windows regardless of
    # how many shards exist), while GSPMD all-reduces whole node arrays.
    print(
        f"per-device halo bytes 2->8 devices: "
        f"{b[8]['halo_bytes']/max(b[2]['halo_bytes'],1):.2f}x (ideal 1.0 — "
        f"total grows linearly); gspmd/halo per-device ratio at 8: "
        f"{b[8]['gspmd_bytes']/max(b[8]['halo_bytes'],1):.1f}x; "
        f"dp grad-pmean per device: {b[8]['dp_bytes']/1e6:.2f} MB (constant)"
    )
    return report


if __name__ == "__main__":
    main()
