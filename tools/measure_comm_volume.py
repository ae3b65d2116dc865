"""Measured communication volume: halo exchange vs GSPMD edge sharding.

Compiles both large-system partitioning paths over an 8-device mesh and
counts the collective bytes the compiler actually emitted (parsed from
the optimized HLO: `all-reduce`, `collective-permute`, `all-gather`,
`reduce-scatter` result shapes).  This is the measured counterpart of
`parallel.halo.comm_bytes_per_block` (SURVEY.md §5.7 / VERDICT round-1
weak #7).

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python tools/measure_comm_volume.py
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np  # noqa: E402

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "s8": 1, "u8": 1, "pred": 1}

_COLLECTIVES = ("all-reduce", "collective-permute", "all-gather",
                "reduce-scatter", "all-to-all")


def collective_bytes(hlo_text: str) -> dict:
    """Sum result-shape bytes of every collective op in optimized HLO."""
    out = {k: 0 for k in _COLLECTIVES}
    # e.g.:  %ar = f32[1024,512]{1,0} all-reduce(...)
    pat = re.compile(
        r"=\s*(?:\()?([a-z0-9]+)\[([0-9,]*)\][^=]*?\b(" +
        "|".join(_COLLECTIVES) + r")\b"
    )
    for m in pat.finditer(hlo_text):
        dt, dims, op = m.group(1), m.group(2), m.group(3)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        out[op] += n * _DTYPE_BYTES[dt]
    out["total"] = sum(out[k] for k in _COLLECTIVES)
    return out


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from xequinet_tpu import keys
    from xequinet_tpu.data.batching import collate
    from xequinet_tpu.data.datapoint import Datapoint
    from xequinet_tpu.models.model import init_params, resolve_model
    from xequinet_tpu.ops.radius_graph import radius_graph_np
    from xequinet_tpu.parallel.edge_partition import (
        make_edge_parallel_forward, shard_batch,
    )
    from xequinet_tpu.parallel.halo import halo_partition, make_halo_forward
    from xequinet_tpu.parallel.mesh import GP_AXIS, make_mesh

    assert len(jax.devices()) >= 8, "run with host_platform_device_count=8"
    mesh = make_mesh(8, axis_names=(GP_AXIS,))

    # one large spatially-sorted quasi-1D system (bounded edge reach, the
    # cell-list ordering contract of halo_partition)
    rng = np.random.default_rng(0)
    n = 2048
    x = np.cumsum(rng.uniform(0.25, 0.5, size=n))
    yz = rng.normal(size=(n, 2)) * 2.5
    pos = np.column_stack([x, yz])
    z = rng.integers(1, 9, size=n).astype(np.int32)
    ei, _ = radius_graph_np(pos, 5.0)
    s = np.argsort(ei[0], kind="stable")
    ei = ei[:, s]

    kw = dict(node_dim=64, node_irreps="64x0e+32x1o+16x2e",
              embed_basis="one-hot", num_basis=16, action_blocks=3,
              output_modes=["energy"])
    module, extra, _ = resolve_model("xpainn", **kw)
    batch = collate([Datapoint(z, pos, edge_index=ei)])
    params = init_params(module, batch)

    results = {}

    apply_bound = lambda d: module.apply({"params": params}, d)

    # --- halo path ---
    stacked, geom = halo_partition(z, pos, ei, 8, halo=64)
    halo_fwd = make_halo_forward(apply_bound, mesh, geom, GP_AXIS)
    lowered = jax.jit(
        lambda b: halo_fwd(b, compute_forces=True)
    ).lower({k: jnp.asarray(v) for k, v in stacked.items()})
    results["halo"] = collective_bytes(lowered.compile().as_text())

    # --- GSPMD edge-sharding path ---
    sharded = shard_batch(batch, mesh)
    efwd = make_edge_parallel_forward(apply_bound, mesh)
    lowered = jax.jit(
        lambda b: efwd(b, True, False)[keys.FORCES]
    ).lower(sharded)
    results["gspmd_edge"] = collective_bytes(lowered.compile().as_text())

    results["meta"] = {
        "n_nodes": int(n), "n_edges": int(ei.shape[1]),
        "halo_rows": int(geom["halo"]), "window": int(geom["window"]),
        "devices": 8, "model": kw["node_irreps"],
    }
    print(json.dumps(results, indent=1))
    ratio = results["gspmd_edge"]["total"] / max(results["halo"]["total"], 1)
    print(f"halo exchange moves {ratio:.1f}x fewer collective bytes")


if __name__ == "__main__":
    main()
