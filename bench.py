"""Benchmark: XPaiNN training-step throughput in edges/s on one chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The metric is the north star from BASELINE.json: edges/s/chip through the
full production hot loop (forward incl. force autodiff + loss + backward +
optimizer update) on the flagship XPaiNN configuration.  NOTE: the first
compile of this program can take 10-15 minutes through the axon remote
compiler; subsequent runs hit the cache.  Budget >= 20 minutes.  The reference
publishes no numbers (BASELINE.md), so vs_baseline compares against the
last locally recorded value in bench_history.json (1.0 on first run).
"""

import json
import os
import sys
import time

import numpy as np

HISTORY = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_history.json")

# mega-kernel slot layout: destination block size (PERF.md round-2 sweep:
# BN=512 balances slot-padding overhead vs per-block onehot width)
KERNEL_BN = 512


def build_batch(rng, n_mols=1024, atoms_lo=12, atoms_hi=28, cutoff=5.0):
    from xequinet_tpu.data.batching import collate
    from xequinet_tpu.data.datapoint import Datapoint
    from xequinet_tpu.ops.radius_graph import radius_graph_np

    dps = []
    for _ in range(n_mols):
        n = int(rng.integers(atoms_lo, atoms_hi + 1))
        # clustered geometry with realistic neighbor counts (~liquid density)
        pos = rng.normal(size=(n, 3)) * (n ** (1 / 3)) * 0.9
        ei, _ = radius_graph_np(pos, cutoff)
        z = rng.integers(1, 9, size=n).astype(np.int32)
        e = float(rng.normal())
        f = rng.normal(size=(n, 3))
        dps.append(Datapoint(z, pos, edge_index=ei, energy=e, forces=f))
    layout = {"block_nodes": KERNEL_BN, "chunk": 1024, "pad_nodes": 32,
              "max_chunks": 32}
    return collate(dps, kernel_layout=layout)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from xequinet_tpu import keys
    from xequinet_tpu.models.model import (
        init_params,
        make_apply_forward,
        resolve_model,
    )
    from xequinet_tpu.training.loss import ErrorMetric, WeightedLoss
    from xequinet_tpu.training.lr_schedule import (
        resolve_lr_schedule,
        resolve_optimizer,
    )
    from xequinet_tpu.training.trainer import make_train_step

    rng = np.random.default_rng(0)
    batch_np = build_batch(rng)
    n_edges_real = int(batch_np[keys.EDGE_MASK].sum())
    max_chunks = int(batch_np[keys.K_NCHUNKS].max())

    module, extra, _ = resolve_model(
        "xpainn",
        node_dim=128,
        node_irreps="128x0e+64x1o+32x2e",
        embed_basis="one-hot",
        num_basis=20,
        action_blocks=3,
        output_modes=["energy"],
        # remat off: the bf16 pipeline fits this batch in HBM without it
        # and runs 1.45x faster (393 -> 270 ms, PERF.md round-2 sweep);
        # remat=True remains the config for larger batches/supercells
        remat=False,
        compute_dtype="bfloat16",  # bf16 edge pipeline: 1.5x step speedup,
        # f32 params/accumulation (accuracy validated in tests, PERF.md)
        update_compute_dtype="bfloat16",  # bf16 update-block MXU work
        # Pallas mega kernels for the whole message pipeline: forward,
        # first-order backward AND the force-training second-order pass
        # (grad-of-grad) each run as one fused kernel (PERF.md round 2:
        # 926k edges/s vs 671k XLA at BN=512)
        use_pallas_scatter="mega",
        pallas_layout=(KERNEL_BN, 1024, 32, max_chunks),
    )
    params = init_params(module, batch_np)
    apply_forward = make_apply_forward(module, extra)

    lossfn = WeightedLoss("l2", **{keys.TOTAL_ENERGY: 1.0, keys.FORCES: 10.0})
    metric = ErrorMetric(keys.TOTAL_ENERGY, keys.FORCES)
    schedule = resolve_lr_schedule("cosine_annealing", 5e-4, 10000, warmup_steps=100)
    optimizer = resolve_optimizer("adamw", schedule)
    step = make_train_step(
        apply_forward, lossfn, optimizer, True, False, 5.0, 0.999, metric
    )

    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state = (params, optimizer.init(params), jax.tree_util.tree_map(jnp.copy, params))
    one = jnp.asarray(1.0)

    # warmup / compile.  NOTE: synchronize by FETCHING a value — on some
    # remote backends (axon tunnel) block_until_ready returns without
    # draining the queue, which silently turns the benchmark into a
    # dispatch-latency measurement.
    for _ in range(3):
        state, loss, _ = step(state, batch, one)
    float(jax.device_get(loss))

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss, _ = step(state, batch, one)
    float(jax.device_get(loss))  # hard sync: loss depends on the full step
    dt = (time.perf_counter() - t0) / iters

    edges_per_s = n_edges_real / dt

    prev = None
    if os.path.exists(HISTORY):
        try:
            prev = json.load(open(HISTORY)).get("edges_per_s")
        except Exception:
            prev = None
    vs_baseline = edges_per_s / prev if prev else 1.0
    with open(HISTORY, "w") as f:
        json.dump(
            {
                "edges_per_s": edges_per_s,
                "step_ms": dt * 1e3,
                "n_edges": n_edges_real,
                "backend": jax.default_backend(),
            },
            f,
        )

    print(
        json.dumps(
            {
                "metric": "train_step_edges_per_s_per_chip",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(vs_baseline, 4),
            }
        )
    )


def _wait_for_backend(budget_s: float = 300.0) -> None:
    """The axon tunnel can flake transiently; retry backend init for a
    bounded window instead of failing the whole benchmark run."""
    import subprocess

    t0 = time.perf_counter()
    while True:
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=90,
            )
            ok = probe.returncode == 0
        except subprocess.TimeoutExpired:  # tunnel hang, not error exit
            ok = False
        if ok:
            return
        if time.perf_counter() - t0 > budget_s:
            sys.stderr.write("bench: backend unavailable after retries\n")
            return  # let main() raise the real error
        time.sleep(15)


if __name__ == "__main__":
    _wait_for_backend()
    sys.exit(main())
