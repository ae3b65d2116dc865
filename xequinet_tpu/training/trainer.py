"""The Trainer: jitted train/valid steps, EMA, best-k checkpoints,
early stopping, plateau scheduling, resume.

TPU-native counterpart of /root/reference/xequinet/utils/trainer.py.  The
per-step work (forward incl. force autodiff, loss, grad, clip, optimizer
update, EMA) is one jitted function; host code only orchestrates epochs,
logging and checkpoints.  Data parallelism comes from wrapping
``train_step`` with the mesh helpers in parallel/ (grad psum replaces DDP
all-reduce, SURVEY.md §2.3).
"""

from __future__ import annotations

import heapq
import math
import os
import pickle
import signal
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from .. import keys
from ..utils.config import XequiConfig, config_to_dict
from ..utils.profiling import StepTimer
from .loss import ErrorMetric, MetricAccumulator, WeightedLoss
from .lr_schedule import PlateauScheduler, resolve_lr_schedule, resolve_optimizer

Array = jnp.ndarray
DataDict = Dict[str, Array]


# ---------------------------------------------------------------------------
# Early stopping (reference utils/trainer.py:78-131)
# ---------------------------------------------------------------------------
@dataclass
class EarlyStopping:
    patience: int = 50
    threshold: float = 1e-4
    lower_bound: Optional[float] = None
    best: float = math.inf
    num_bad: int = 0

    def step(self, metric: float) -> bool:
        """Returns True when training should stop."""
        if self.lower_bound is not None and metric < self.lower_bound:
            return True
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        return self.num_bad > self.patience


class MultiEarlyStopping:
    """Combine several per-metric criteria with 'and' / 'or'
    (reference utils/trainer.py:108-131; the reference's broken 3-arg call
    at trainer.py:389 is not replicated)."""

    def __init__(self, stoppings: Dict[str, Dict], mode: str = "and") -> None:
        self.stoppings = {
            prop: EarlyStopping(**cfg) for prop, cfg in (stoppings or {}).items()
        }
        assert mode in ("and", "or")
        self.mode = mode

    def step(self, metrics: Dict[str, float]) -> bool:
        if not self.stoppings:
            return False
        votes = [
            es.step(metrics[prop])
            for prop, es in self.stoppings.items()
            if prop in metrics
        ]
        if not votes:
            return False
        return all(votes) if self.mode == "and" else any(votes)


# ---------------------------------------------------------------------------
# Train state
# ---------------------------------------------------------------------------
@dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any
    step: int = 0


def make_step_core(
    apply_forward: Callable[[Any, DataDict, bool, bool], DataDict],
    lossfn: WeightedLoss,
    optimizer: optax.GradientTransformation,
    compute_forces: bool,
    compute_virial: bool,
    grad_clip: Optional[float],
    ema_decay: Optional[float],
    metric: ErrorMetric,
):
    """Per-replica train-step body (reference train1epoch body,
    utils/trainer.py:287-351).  ``grad_reduce``/``metric_reduce`` are the
    data-parallel hooks: identity on one chip, pmean/psum over the mesh
    axis under shard_map (the DDP all-reduce equivalent)."""

    def step_core(
        state: Tuple,
        batch: DataDict,
        lr_scale: Array,
        grad_reduce: Optional[Callable] = None,
        metric_reduce: Optional[Callable] = None,
    ):
        params, opt_state, ema_params = state

        def loss_of(p):
            out = apply_forward(p, batch, compute_forces, compute_virial)
            total, losses = lossfn(out, batch)
            return total, (out, losses)

        (loss, (out, losses)), grads = jax.value_and_grad(loss_of, has_aux=True)(
            params
        )
        if grad_reduce is not None:
            grads = grad_reduce(grads)
            loss = grad_reduce(loss)
        if grad_clip is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-12))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        # host-controlled plateau scaling: updates are proportional to the
        # learning rate after the optimizer chain, so scaling them scales
        # the effective LR (reference SmoothReduceLROnPlateau role)
        updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(params, updates)
        if ema_decay is not None:
            ema_params = jax.tree_util.tree_map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                ema_params,
                params,
            )
        metrics = metric(out, batch)
        if metric_reduce is not None:
            metrics = metric_reduce(metrics)
        return (params, opt_state, ema_params), loss, metrics

    return step_core


def make_train_step(*args, **kwargs):
    """Single-device jitted train step."""
    core = make_step_core(*args, **kwargs)
    return jax.jit(core, donate_argnums=(0,))


def make_eval_step(
    apply_forward: Callable,
    compute_forces: bool,
    compute_virial: bool,
    metric: ErrorMetric,
):
    def eval_fn(params, batch: DataDict):
        out = apply_forward(params, batch, compute_forces, compute_virial)
        return metric(out, batch)

    return jax.jit(eval_fn)


# ---------------------------------------------------------------------------
# Checkpoint I/O (reference utils/trainer.py:251-285; torch-free)
# ---------------------------------------------------------------------------
def save_checkpoint(
    path: str,
    params: Any,
    config: Dict[str, Any],
    *,
    ema_params: Any = None,
    opt_state: Any = None,
    epoch: int = 0,
    loss: float = math.inf,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    blob = {
        "model": serialization.to_bytes(params),
        "config": config,  # embedded-config contract (SURVEY.md §5.4)
        "epoch": epoch,
        "loss": loss,
    }
    if ema_params is not None:
        blob["ema_model"] = serialization.to_bytes(ema_params)
    if opt_state is not None:
        blob["opt_state"] = serialization.to_bytes(opt_state)
    if extra:
        blob.update(extra)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(blob, f)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def restore_params(template: Any, blob_bytes: bytes) -> Any:
    return serialization.from_bytes(template, blob_bytes)


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------
class Trainer:
    def __init__(
        self,
        *,
        config: XequiConfig,
        apply_forward: Callable,
        params: Any,
        train_loader,
        valid_loader,
        steps_per_epoch: int,
        logger=None,
        device_put: Callable[[Dict[str, np.ndarray]], DataDict] = None,
        reduce_metrics: Callable = None,
        mesh=None,
    ) -> None:
        tc = config.trainer
        self.config = config
        self.tc = tc
        self.logger = logger
        self.train_loader = train_loader
        self.valid_loader = valid_loader
        self.apply_forward = apply_forward
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        if device_put is not None:
            self.device_put = device_put
        elif self.mesh is not None:
            from ..parallel.data_parallel import device_put_sharded_batch

            self.device_put = lambda b: device_put_sharded_batch(b, self.mesh)
        else:
            self.device_put = lambda b: {
                k: jnp.asarray(v) for k, v in b.items()
            }
        self.reduce_metrics = reduce_metrics
        # multi-host: only process 0 writes checkpoints (the rank-0 guard
        # of the reference's DDP trainer)
        self.is_main_process = jax.process_index() == 0

        targets = list(config.data.targets)
        self.compute_forces = keys.FORCES in targets
        self.compute_virial = keys.VIRIAL in targets or keys.STRESS in targets

        self.lossfn = WeightedLoss(tc.lossfn, **self._loss_weights(targets))
        metric_props = [
            t if t != keys.FORCES else keys.FORCES for t in targets
        ]
        self.metric = ErrorMetric(*metric_props)

        warmup_steps = tc.warmup_epochs * steps_per_epoch
        max_steps = tc.max_epochs * steps_per_epoch
        self.schedule = resolve_lr_schedule(
            tc.lr_scheduler,
            tc.max_lr,
            max_steps,
            warmup_scheduler=tc.warmup_scheduler,
            warmup_steps=warmup_steps,
            **(tc.lr_scheduler_kwargs or {}),
        )
        self.optimizer = resolve_optimizer(
            tc.optimizer, self.schedule, **(tc.optimizer_kwargs or {})
        )
        if tc.finetune_modules:
            self.optimizer = _freeze_except(self.optimizer, tc.finetune_modules, params)

        self.plateau = (
            PlateauScheduler(**(tc.lr_scheduler_kwargs or {}))
            if tc.lr_scheduler.lower() == "plateau"
            else None
        )
        self.stopper = MultiEarlyStopping(
            tc.early_stoppings or {}, tc.early_stopping_mode
        )

        self.params = params
        self.opt_state = self.optimizer.init(params)
        # distinct buffers: ema aliasing params breaks donation; None when off
        self.ema_params = (
            jax.tree_util.tree_map(jnp.copy, params)
            if tc.ema_decay is not None
            else None
        )
        self.epoch = 0
        self.lr_scale = 1.0
        self.step_timer = StepTimer()
        # preemption bookkeeping: while the jitted train step is live the
        # self.params/opt_state/ema_params handles are donated (deleted on
        # device), so a signal handler must NOT serialize them directly —
        # it sets a flag and the step loop saves from the live state tuple.
        self._preempt_signal: Optional[int] = None
        self._in_train_loop = False
        # best-k max-heap of (-loss, file) (reference utils/trainer.py:27-35)
        self.best_heap: List[Tuple[float, str]] = []

        if self.mesh is not None:
            from ..parallel.data_parallel import replicate

            self.params = replicate(self.params, self.mesh)
            self.opt_state = replicate(self.opt_state, self.mesh)
            if self.ema_params is not None:
                self.ema_params = replicate(self.ema_params, self.mesh)
        self._f32_switched = False
        self._build_steps(apply_forward)

        os.makedirs(tc.save_dir, exist_ok=True)
        # install early: preemption can arrive during the first compile
        self._install_preemption_handler()
        if tc.resume and tc.ckpt_file and os.path.exists(tc.ckpt_file):
            self._resume(tc.ckpt_file)
        elif tc.ckpt_file and os.path.exists(tc.ckpt_file):
            blob = load_checkpoint(tc.ckpt_file)
            self.params = restore_params(self.params, blob["model"])
            if self.ema_params is not None:
                self.ema_params = jax.tree_util.tree_map(jnp.copy, self.params)

    # ------------------------------------------------------------------
    def _build_steps(self, apply_forward: Callable) -> None:
        """(Re)build the jitted train/eval steps around an apply fn —
        called at init and again by the late-epoch f32 switch."""
        tc = self.tc
        self.apply_forward = apply_forward
        if self.mesh is not None:
            # data-parallel production path: shard_map over the dp axis,
            # grad pmean / metric psum (replacing the reference's DDP
            # wrap, run/train.py:167-190)
            from ..parallel.data_parallel import (
                make_dp_eval_step,
                make_dp_train_step,
            )

            core = make_step_core(
                apply_forward,
                self.lossfn,
                self.optimizer,
                self.compute_forces,
                self.compute_virial,
                tc.grad_clip,
                tc.ema_decay,
                self.metric,
            )
            self.train_step = make_dp_train_step(core, self.mesh)

            def eval_core(p, batch):
                out = apply_forward(
                    p, batch, self.compute_forces, self.compute_virial
                )
                return self.metric(out, batch)

            self.eval_step = make_dp_eval_step(eval_core, self.mesh)
        else:
            self.train_step = make_train_step(
                apply_forward,
                self.lossfn,
                self.optimizer,
                self.compute_forces,
                self.compute_virial,
                tc.grad_clip,
                tc.ema_decay,
                self.metric,
            )
            self.eval_step = make_eval_step(
                apply_forward, self.compute_forces, self.compute_virial,
                self.metric,
            )

    def _maybe_switch_to_f32(self, epoch: int) -> None:
        """bf16 accuracy mitigation (PERF.md study): re-jit the last
        ``f32_finetune_epochs`` epochs with float32 compute dtypes.
        Params are dtype-agnostic, so only the apply fn changes; the
        model config is updated in place so checkpoints saved after the
        switch embed f32 (test/inference/MD then run the fine-tuned
        precision)."""
        k = getattr(self.tc, "f32_finetune_epochs", 0) or 0
        if not k or self._f32_switched:
            return
        if epoch < self.tc.max_epochs - k:
            return
        mk = dict(self.config.model.model_kwargs)
        if (
            str(mk.get("compute_dtype", "float32")) == "float32"
            and str(mk.get("update_compute_dtype", "float32")) == "float32"
        ):
            self._f32_switched = True
            return
        mk["compute_dtype"] = "float32"
        mk["update_compute_dtype"] = "float32"
        from ..models.model import make_apply_forward, resolve_model

        module, extra, _ = resolve_model(self.config.model.model_name, **mk)
        self.config.model.model_kwargs = mk
        self._build_steps(make_apply_forward(module, extra))
        self._f32_switched = True
        self._log(
            f"f32 fine-tune: compute dtypes switched to float32 for the "
            f"final {k} epoch(s); checkpoints from here embed f32"
        )

    def _loss_weights(self, targets: List[str]) -> Dict[str, float]:
        weights = dict(self.tc.losses_weight or {})
        if not weights:
            weights = {t: 1.0 for t in targets}
        return weights

    def _log(self, msg: str) -> None:
        if self.logger is not None:
            self.logger.info(msg)

    # ------------------------------------------------------------------
    def train1epoch(self) -> float:
        self.train_loader.set_epoch(self.epoch)
        acc = MetricAccumulator()
        state = (self.params, self.opt_state, self.ema_params)
        last_loss = float("nan")
        loss = None
        self._in_train_loop = True
        try:
            for step, raw in enumerate(self.train_loader):
                batch = self.device_put(raw)
                self.step_timer.start()
                state, loss, metrics = self.train_step(
                    state, batch, jnp.asarray(self.lr_scale, dtype=jnp.float32)
                )
                self.step_timer.stop()
                if self._preempt_signal is not None:
                    # state is the live (undonated) output of the last step;
                    # sync it back before writing the preemption checkpoint
                    self.params, self.opt_state, self.ema_params = state
                    self._save_preemption_and_exit(self._preempt_signal)
                if (step + 1) % self.tc.log_steps == 0:
                    acc.update(jax.device_get(metrics))
                    last_loss = float(jax.device_get(loss))
                    table = _fmt_metrics(acc.compute())
                    self._log(
                        f"epoch {self.epoch} step {step + 1} "
                        f"loss {last_loss:.6f}\n{table}"
                    )
                    acc.reset()
        finally:
            self._in_train_loop = False
        self.params, self.opt_state, self.ema_params = state
        if loss is not None:
            # epochs shorter than log_steps would otherwise report the
            # nan initializer in the epoch summary
            last_loss = float(jax.device_get(loss))
        return last_loss

    def validate(self) -> Dict[str, Dict[str, float]]:
        acc = MetricAccumulator()
        params = self.ema_params if self.tc.ema_decay is not None else self.params
        for raw in self.valid_loader:
            batch = self.device_put(raw)
            metrics = self.eval_step(params, batch)
            if self.reduce_metrics is not None:
                metrics = self.reduce_metrics(metrics)
            acc.update(jax.device_get(metrics))
        return acc.compute()

    def weighted_mae(self, results: Dict[str, Dict[str, float]]) -> float:
        weights = self._loss_weights(list(self.config.data.targets))
        total = 0.0
        for prop, w in weights.items():
            if prop in results:
                total += w * results[prop]["mae"]
        return total

    # ------------------------------------------------------------------
    def _ckpt_blob_extra(self) -> Dict[str, Any]:
        return {
            "epoch": self.epoch,
            "loss2file": list(self.best_heap),
            "plateau": self.plateau.state_dict() if self.plateau else None,
            "stoppings": {
                k: vars(v) for k, v in self.stopper.stoppings.items()
            },
        }

    def save_best_k(self, val_mae: float) -> None:
        if not self.is_main_process:
            return
        tc = self.tc
        fname = os.path.join(
            tc.save_dir, f"{tc.run_name}_ep{self.epoch}_{val_mae:.6f}.ckpt"
        )
        entry = (-val_mae, fname)
        if len(self.best_heap) < tc.best_k:
            heapq.heappush(self.best_heap, entry)
        elif entry > self.best_heap[0]:
            _, old = heapq.heappushpop(self.best_heap, entry)
            if os.path.exists(old):
                os.remove(old)
        else:
            return
        save_checkpoint(
            fname,
            self.params,
            config_to_dict(self.config.model),
            ema_params=self.ema_params,
            epoch=self.epoch,
            loss=val_mae,
        )

    def save_last(self, val_mae: float) -> None:
        if not self.is_main_process:
            return
        save_checkpoint(
            os.path.join(self.tc.save_dir, f"{self.tc.run_name}_last.ckpt"),
            self.params,
            config_to_dict(self.config.model),
            ema_params=self.ema_params,
            opt_state=self.opt_state,
            epoch=self.epoch,
            loss=val_mae,
            extra=self._ckpt_blob_extra(),
        )

    def _resume(self, path: str) -> None:
        blob = load_checkpoint(path)
        self.params = restore_params(self.params, blob["model"])
        if "ema_model" in blob and self.ema_params is not None:
            self.ema_params = restore_params(self.ema_params, blob["ema_model"])
        elif self.ema_params is not None:
            self.ema_params = jax.tree_util.tree_map(jnp.copy, self.params)
        if "opt_state" in blob:
            self.opt_state = restore_params(self.opt_state, blob["opt_state"])
        self.epoch = blob.get("epoch", 0) + 1
        self.best_heap = [tuple(x) for x in blob.get("loss2file", [])]
        if self.plateau and blob.get("plateau"):
            self.plateau.load_state_dict(blob["plateau"])
        for prop, st in (blob.get("stoppings") or {}).items():
            es = self.stopper.stoppings.get(prop)
            if es is not None:
                es.best = st.get("best", es.best)
                es.num_bad = st.get("num_bad", es.num_bad)
        self._log(f"resumed from {path} at epoch {self.epoch}")

    # ------------------------------------------------------------------
    def _save_preemption_and_exit(self, signum: int) -> None:
        self._log(
            f"signal {signum}: writing preemption checkpoint and exiting"
        )
        try:
            self.save_last(float("inf"))
        except Exception as exc:  # report, never swallow silently
            self._log(f"preemption checkpoint FAILED: {exc!r}")
            import traceback

            traceback.print_exc()
        raise SystemExit(128 + signum)

    def _install_preemption_handler(self) -> None:
        """Preemption safety on TPU pods: SIGTERM/SIGINT save a resumable
        last-checkpoint before exiting (the reference has no preemption
        story, SURVEY.md §5.3).

        Inside the step loop the trainer's state handles point at donated
        (deleted) device buffers, so the handler only sets a flag there and
        the loop saves from the live state tuple at the next step boundary.
        Outside the loop (compile window, validation, between epochs) the
        handles are live and the handler saves immediately.  A second
        signal exits without saving (escape hatch for a hung save)."""

        def _handler(signum, frame):
            if self._preempt_signal is not None:
                raise SystemExit(128 + signum)
            self._preempt_signal = signum
            if not self._in_train_loop:
                self._save_preemption_and_exit(signum)
            # else: defer to the step boundary in train1epoch

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(sig, _handler)
            except ValueError:
                pass  # not the main thread (e.g. tests)

    def start(self) -> None:
        tc = self.tc
        for epoch in range(self.epoch, tc.max_epochs):
            self.epoch = epoch
            self._maybe_switch_to_f32(epoch)
            t0 = time.time()
            loss = self.train1epoch()
            results = self.validate()
            val_mae = self.weighted_mae(results)
            if epoch % tc.log_epochs == 0:
                timing = self.step_timer.stats()
                timing_str = (
                    f" step {timing['mean_ms']:.1f}ms (p95 {timing['p95_ms']:.1f})"
                    if timing
                    else ""
                )
                self._log(
                    f"== epoch {epoch} done in {time.time() - t0:.1f}s"
                    f"{timing_str} "
                    f"train-loss {loss:.6f} valid weighted-MAE {val_mae:.6f}\n"
                    + _fmt_metrics(results)
                )
                self.step_timer.reset()
            self.save_best_k(val_mae)
            self.save_last(val_mae)
            if self.plateau is not None:
                self.lr_scale = self.plateau.step(val_mae)
            flat = {p: r["mae"] for p, r in results.items()}
            if self.stopper.step(flat):
                self._log(f"early stopping at epoch {epoch}")
                break


def _fmt_metrics(results: Dict[str, Dict[str, float]]) -> str:
    from tabulate import tabulate

    rows = [
        [prop, f"{r['mae']:.6f}", f"{r['rmse']:.6f}", r["count"]]
        for prop, r in sorted(results.items())
    ]
    return tabulate(rows, headers=["property", "MAE", "RMSE", "count"], tablefmt="plain")


def _freeze_except(
    optimizer: optax.GradientTransformation, modules: List[str], params: Any
) -> optax.GradientTransformation:
    """Finetune-freeze: only params whose path contains one of the given
    substrings are trained (reference run/train.py:196-208)."""

    def trainable(path: Tuple, _) -> str:
        path_str = "/".join(str(getattr(p, "key", p)) for p in path)
        return "train" if any(m in path_str for m in modules) else "freeze"

    labels = jax.tree_util.tree_map_with_path(trainable, params)
    return optax.multi_transform(
        {"train": optimizer, "freeze": optax.set_to_zero()}, labels
    )

