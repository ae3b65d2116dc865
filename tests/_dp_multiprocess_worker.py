"""Worker for the REAL multi-process dp lockstep test (spawned by
tests/test_dp_multiprocess.py): one of N processes, each with its own
local CPU devices, forming one jax.distributed cluster through the
production run_train path — process-sharded loaders, ReplicaBatcher
lockstep, shard_map grad-pmean, process-0 checkpoints.

argv: <process_id> <num_processes> <port> <db_path> <out_dir>
"""

import hashlib
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> int:
    pid, nproc, port, db_path, out_dir = sys.argv[1:6]
    os.environ["JAX_PLATFORMS"] = "cpu"
    # exactly 2 local devices per process (strip any inherited count,
    # e.g. the test suite's 8-device flag)
    flags = [
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append("--xla_force_host_platform_device_count=2")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["JAX_PROCESS_ID"] = pid
    os.environ["JAX_NUM_PROCESSES"] = nproc

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from xequinet_tpu import keys
    from xequinet_tpu.run.train import run_train
    from xequinet_tpu.utils.config import XequiConfig

    cfg = XequiConfig()
    cfg.model.model_name = "xpainn"
    cfg.model.model_kwargs = dict(
        node_dim=8, node_irreps="8x0e+4x1o", embed_basis="one-hot",
        num_basis=4, action_blocks=1, cutoff=5.0, output_modes=["energy"],
    )
    cfg.data.db_path = db_path
    cfg.data.targets = [keys.TOTAL_ENERGY, keys.FORCES]
    # deliberately awkward: 11 train structures over 2 processes with
    # global batch 4 -> per-process micro-batch packing disagrees, so the
    # lockstep padding protocol (empty groups + flag allgather) MUST run
    cfg.data.batch_size = 4
    cfg.data.valid_batch_size = 4
    cfg.trainer.dp_devices = 0  # all global devices (2 procs x 2 = 4)
    cfg.trainer.max_epochs = 2
    cfg.trainer.warmup_epochs = 0
    cfg.trainer.seed = 0
    cfg.trainer.save_dir = os.path.join(out_dir, f"run{pid}")
    cfg.trainer.ema_decay = None
    cfg.trainer.compile_cache = False
    trainer = run_train(cfg)

    # digest of the final (replicated) parameters: must be identical on
    # every process (grad pmean keeps them in lockstep)
    leaves = jax.tree_util.tree_leaves(jax.device_get(trainer.params))
    h = hashlib.sha256()
    for x in leaves:
        h.update(np.ascontiguousarray(np.asarray(x, dtype=np.float64)))
    digest = h.hexdigest()
    steps = trainer.config.trainer.max_epochs  # just to touch config
    with open(os.path.join(out_dir, f"digest_{pid}.txt"), "w") as f:
        f.write(f"{digest}\n{jax.process_count()}\n{jax.device_count()}\n")
    print(f"proc {pid}: devices={jax.device_count()} digest={digest[:12]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
