"""TPU check: checkpoint-carried mega kernels through `xeq test` and the
InferenceEngine (the run/test.py + run/inference.py wiring)."""
import os
import tempfile

import numpy as np
import jax

print("backend:", jax.default_backend())

from xequinet_tpu import keys
from xequinet_tpu.data.datapoint import Datapoint
from xequinet_tpu.data.store import create_dataset
from xequinet_tpu.ops.radius_graph import radius_graph_np
from xequinet_tpu.run.train import run_train
from xequinet_tpu.run.test import run_test
from xequinet_tpu.run.inference import InferenceEngine
from xequinet_tpu.utils.config import XequiConfig

rng = np.random.default_rng(0)
dps = []
for i in range(96):
    m = int(rng.integers(8, 25))
    p = rng.normal(size=(m, 3)) * (m ** (1 / 3)) * 0.9
    e2, _ = radius_graph_np(p, 5.0)
    zz = rng.integers(1, 9, size=m).astype(np.int32)
    dps.append(Datapoint(zz, p, edge_index=e2,
                         energy=float(np.sum(p**2) * 0.01),
                         forces=(-0.02 * p)))
td = tempfile.mkdtemp()
db = td + "/db"
create_dataset(db, dps, units={keys.TOTAL_ENERGY: "eV", keys.POSITIONS: "Angstrom"},
               split={"train": list(range(72)), "valid": list(range(72, 84)),
                      "test": list(range(84, 96))})
cfg = XequiConfig()
cfg.data.db_path = db
cfg.data.cutoff = 5.0
cfg.data.targets = [keys.TOTAL_ENERGY, keys.FORCES]
cfg.data.batch_size = 32
cfg.data.valid_batch_size = 32
cfg.model.model_name = "xpainn"
cfg.model.model_kwargs = dict(
    node_dim=64, node_irreps="64x0e+32x1o+16x2e", embed_basis="one-hot",
    num_basis=16, action_blocks=2, output_modes=["energy"],
    use_pallas_scatter="mega", pallas_layout=(256, 1024, 32, 8),
)
cfg.trainer.max_epochs = 1
cfg.trainer.warmup_epochs = 0
cfg.trainer.lossfn = "l2"
cfg.trainer.losses_weight = {keys.TOTAL_ENERGY: 1.0, keys.FORCES: 10.0}
cfg.trainer.save_dir = td + "/train"
os.makedirs(cfg.trainer.save_dir, exist_ok=True)
cfg.trainer.dp_devices = 1
run_train(cfg)

import glob
ckpt = glob.glob(td + "/train/*_last.ckpt")[0]
print("checkpoint:", os.path.basename(ckpt))

# run_test must pick up the mega layout from the embedded config
res = run_test(cfg, ckpt)
print("run_test metrics:", {k: round(v["mae"], 4) for k, v in res.items()})
assert all(np.isfinite(v["mae"]) for v in res.values())

# InferenceEngine: mega layout from the checkpoint, with fallback
eng = InferenceEngine(ckpt)
assert eng._kernel_layout is not None
out = eng.predict(dps[:8], compute_forces=True)
es = [r[keys.TOTAL_ENERGY] for r in out]
print("inference energies finite:", np.isfinite(es).all(), es[:3])
assert np.isfinite(es).all()
for r, dp in zip(out, dps[:8]):
    assert r[keys.FORCES].shape == (dp.num_atoms, 3)
    assert np.isfinite(r[keys.FORCES]).all()
print("\nTPU TEST/INFERENCE MEGA WIRING PASSED")
