"""Config schema: {model, trainer, data} dataclasses merged with YAML.

TPU-native counterpart of /root/reference/xequinet/utils/config.py.  The
reference merges via OmegaConf structured configs (run/train.py:31-40);
here a small recursive dataclass merge over plain pyyaml does the same
job without the dependency.  Field names are kept 1:1 so reference YAML
configs work unmodified; TPU-specific additions are grouped at the end of
TrainerConfig / DataConfig.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


@dataclass
class ModelConfig:
    model_name: str = "xpainn"
    model_kwargs: Dict[str, Any] = field(default_factory=dict)
    default_units: Dict[str, str] = field(default_factory=dict)


@dataclass
class TrainerConfig:
    run_name: str = "xequinet"
    ckpt_file: Optional[str] = None
    resume: bool = False
    finetune_modules: Optional[List[str]] = None
    warmup_scheduler: Optional[str] = "linear"
    warmup_epochs: int = 10
    max_epochs: int = 300
    max_lr: float = 5e-4
    min_lr: float = 0.0
    lossfn: str = "smoothl1"
    losses_weight: Dict[str, float] = field(default_factory=dict)
    grad_clip: Optional[float] = None
    optimizer: str = "adamW"
    optimizer_kwargs: Dict[str, Any] = field(default_factory=dict)
    lr_scheduler: str = "cosine_annealing"
    lr_scheduler_kwargs: Dict[str, Any] = field(default_factory=dict)
    early_stoppings: Optional[Dict[str, Any]] = None
    early_stopping_mode: str = "and"
    ema_decay: Optional[float] = None
    seed: Optional[int] = None
    num_workers: int = 0

    save_dir: str = "./"
    best_k: int = 1
    log_file: str = "loss.log"
    log_steps: int = 50
    log_epochs: int = 1

    # ---- TPU-specific ----------------------------------------------------
    # data-parallel axis size 0 = use all local devices
    dp_devices: int = 0
    # persistent XLA compilation cache: True = default dir (or
    # $XEQ_COMPILE_CACHE), a path string, or False to disable.  Saves the
    # ~116 s production-combo compile on every restart (PERF.md).
    compile_cache: Any = True
    # ---- spatial-decomposition (halo) training ---------------------------
    # >1: every training structure is ONE large system halo-decomposed
    # over this many mesh devices (parallel/halo.py); composes with
    # dp_devices into a (dp, gp) 2-D mesh (run/train.py run_halo_train).
    # 0/1 = ordinary molecule-batched dp training.
    gp_devices: int = 0
    # halo width in sorted rows (0 = auto from the measured index reach)
    halo_width: int = 0
    # head-room factor for auto-sized halo/edge capacities
    halo_margin: float = 1.3
    # bf16 accuracy mitigation: run the LAST K epochs with
    # compute_dtype/update_compute_dtype switched to float32 (params are
    # dtype-agnostic, so the switch is a re-jit).  The embedded model
    # config in checkpoints saved after the switch is f32, so test/
    # inference/MD run the fine-tuned precision.  PERF.md bf16 study.
    f32_finetune_epochs: int = 0


@dataclass
class DataConfig:
    db_path: str = "./"
    cutoff: float = 5.0
    split: str = "split"
    targets: List[str] = field(default_factory=list)
    base_targets: Optional[List[str]] = None
    default_dtype: str = "float32"
    node_shift: Any = False
    node_scale: Any = False
    max_num_samples: int = 1000000
    batch_size: int = 64
    valid_batch_size: int = 64

    # ---- TPU-specific: static-shape padding policy -----------------------
    # capacities per batch; 0 = derive from batch statistics at startup
    max_nodes: int = 0
    max_edges: int = 0


@dataclass
class XequiConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    data: DataConfig = field(default_factory=DataConfig)


@dataclass
class MDConfig:
    ensembles: List[Any] = field(default_factory=list)
    input_file: str = "input.xyz"
    input_format: Optional[str] = None
    model_file: str = "model.ckpt"
    delta_method: Optional[str] = None
    init_temperature: float = 300.0  # Kelvin
    logfile: str = "md.log"
    append_logfile: bool = False
    trajectory: Optional[str] = None
    append_trajectory: bool = False
    xyz_traj: Optional[str] = None
    columns: Optional[List[str]] = None
    dtype: str = "float32"
    device: Optional[str] = None
    seed: Optional[int] = None
    # "mega": fused Pallas message kernels on the MD hot loop — free
    # systems with bounded sorted-neighbor reach AND periodic supercells
    # (ghost-image layout, ops/spatial_sort); automatic XLA fallback
    pallas: Optional[str] = None
    # >1: run the system halo-decomposed over this many devices (one
    # large free or periodic system spanning chips;
    # parallel/halo.HaloCalculator)
    halo_devices: int = 0
    # persistent XLA compilation cache (see TrainerConfig.compile_cache)
    compile_cache: Any = True
    # None = TPU default (bf16 single-pass MXU); "float32" = exact-f32
    # dots for accuracy-critical MD/Hessians (utils/precision.py)
    matmul_precision: Optional[str] = None
    # Verlet skin (model length units): build neighbor lists at
    # cutoff+skin and reuse them until an atom drifts skin/2 — between
    # rebuilds an MD step uploads only positions
    # (interface/calculator.py).  0 = rebuild every step (reference
    # behaviour, ase_calculator.py:87-88)
    skin: float = 0.0


def _merge_into(obj: Any, data: Dict[str, Any], path: str = "") -> Any:
    """Recursively merge a dict into a dataclass instance, validating keys
    (the OmegaConf.structured-merge equivalent)."""
    names = {f.name: f for f in dataclasses.fields(obj)}
    for k, v in (data or {}).items():
        if k not in names:
            raise KeyError(f"unknown config key {path}{k}")
        cur = getattr(obj, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            _merge_into(cur, v, path=f"{path}{k}.")
        else:
            setattr(obj, k, v)
    return obj


def load_config(yaml_file: Optional[str] = None, overrides: Optional[Dict] = None) -> XequiConfig:
    cfg = XequiConfig()
    if yaml_file is not None:
        import yaml

        with open(yaml_file) as f:
            data = yaml.safe_load(f) or {}
        _merge_into(cfg, data)
    if overrides:
        _merge_into(cfg, overrides)
    return cfg


def load_md_config(yaml_file: Optional[str] = None, overrides: Optional[Dict] = None) -> MDConfig:
    cfg = MDConfig()
    if yaml_file is not None:
        import yaml

        with open(yaml_file) as f:
            data = yaml.safe_load(f) or {}
        _merge_into(cfg, data)
    if overrides:
        _merge_into(cfg, overrides)
    return cfg


def config_to_dict(cfg: Any) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)
