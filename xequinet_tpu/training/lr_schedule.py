"""Optimizers, LR schedules, warmups and plateau scheduling.

TPU-native counterpart of /root/reference/xequinet/utils/lr_scheduler.py
and functional.py:80-188, rebuilt on optax: warmup and main schedule are
composed into a single optax schedule; the EMA-smoothed
reduce-on-plateau scheduler is a host-side object that scales the
injected learning rate at validation time (the reference's
SmoothReduceLROnPlateau, lr_scheduler.py:8-86).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional

import optax


def resolve_optimizer(optimizer: str, learning_rate, **kwargs) -> optax.GradientTransformation:
    """Optimizer factory (reference utils/functional.py:80-94)."""
    table = {
        "adam": optax.adam,
        "adamw": optax.adamw,
        "nadam": optax.nadam,
        "radam": optax.radam,
    }
    name = optimizer.lower()
    if name not in table:
        raise NotImplementedError(f"Unsupported optimizer {optimizer}")
    accepted = {}
    if name == "adamw" and "weight_decay" in kwargs:
        accepted["weight_decay"] = kwargs["weight_decay"]
    return optax.inject_hyperparams(table[name])(
        learning_rate=learning_rate, **accepted
    )


def resolve_warmup(
    warmup_scheduler: str, warmup_steps: int, base_lr: float
) -> Optional[Callable[[int], float]]:
    """Warmup factor schedule on [0, warmup_steps)
    (reference utils/functional.py:155-188, pytorch-warmup semantics)."""
    name = (warmup_scheduler or "none").lower()
    if name in ("none", ""):
        return None
    if name in ("linear", "untuned_linear"):
        return optax.linear_schedule(
            init_value=base_lr / max(warmup_steps, 1) if name == "linear" else 0.0,
            end_value=base_lr,
            transition_steps=max(warmup_steps, 1),
        )
    if name in ("exponential", "untuned_exponential"):

        def sched(step):
            import jax.numpy as jnp

            return base_lr * (1.0 - jnp.exp(-(step + 1) / max(warmup_steps, 1)))

        return sched
    if name == "radam":
        return None  # RAdam has its own built-in variance rectification
    raise NotImplementedError(f"Unsupported warmup scheduler {warmup_scheduler}")


def resolve_lr_schedule(
    lr_scheduler: str,
    base_lr: float,
    max_steps: int,
    warmup_scheduler: str = "linear",
    warmup_steps: int = 0,
    **kwargs: Any,
):
    """Build a single optax schedule = warmup then main decay
    (reference utils/functional.py:97-152).

    For "plateau" the returned schedule is the warmup followed by a
    constant; the plateau logic scales the injected LR from the host.
    """
    name = lr_scheduler.lower()
    main: Callable
    if name == "cosine_annealing":
        t_max = kwargs.get("T_max", max_steps)
        eta_min = kwargs.get("eta_min", 0.0)
        main = optax.cosine_decay_schedule(
            init_value=base_lr,
            decay_steps=max(t_max, 1),
            alpha=eta_min / base_lr if base_lr > 0 else 0.0,
        )
    elif name == "cosine_restarts":
        t0 = kwargs.get("T_0", max(max_steps // 4, 1))
        mult = kwargs.get("T_mult", 1)
        schedules = []
        boundaries = []
        t, start = t0, 0
        while start < max_steps:
            schedules.append(
                optax.cosine_decay_schedule(init_value=base_lr, decay_steps=t)
            )
            start += t
            boundaries.append(start)
            t *= mult if mult > 1 else 1
        main = optax.join_schedules(schedules, boundaries[:-1]) if schedules else (
            lambda s: base_lr
        )
    elif name == "exponential":
        gamma = kwargs.get("gamma", 0.999)
        main = optax.exponential_decay(
            init_value=base_lr, transition_steps=1, decay_rate=gamma
        )
    elif name == "step":
        step_size = kwargs.get("step_size", max(max_steps // 3, 1))
        gamma = kwargs.get("gamma", 0.1)
        main = optax.exponential_decay(
            init_value=base_lr,
            transition_steps=step_size,
            decay_rate=gamma,
            staircase=True,
        )
    elif name == "linear_decay":
        power = kwargs.get("power", 1.0)
        end_lr = kwargs.get("end_lr", 0.0)
        main = optax.polynomial_schedule(
            init_value=base_lr,
            end_value=end_lr,
            power=power,
            transition_steps=max(max_steps, 1),
        )
    elif name == "plateau":
        main = lambda step: base_lr  # scaled externally by PlateauScheduler
    else:
        raise NotImplementedError(f"Unsupported lr scheduler {lr_scheduler}")

    warm = resolve_warmup(warmup_scheduler, warmup_steps, base_lr)
    if warm is None or warmup_steps <= 0:
        return main
    return optax.join_schedules([warm, main], [warmup_steps])


class PlateauScheduler:
    """EMA-smoothed reduce-on-plateau, host-side
    (reference utils/lr_scheduler.py:8-86 SmoothReduceLROnPlateau).

    Call ``step(metric)`` each validation; multiply the injected LR by the
    returned factor (1.0 = unchanged).
    """

    def __init__(
        self,
        factor: float = 0.5,
        patience: int = 10,
        threshold: float = 1e-4,
        smoothing_factor: float = 0.0,
        min_lr: float = 0.0,
        max_reductions: int = 10,
    ) -> None:
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.smoothing = smoothing_factor
        self.min_lr = min_lr
        self.max_reductions = max_reductions
        self.best = math.inf
        self.ema_metric: Optional[float] = None
        self.num_bad_epochs = 0
        self.num_reductions = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        if self.ema_metric is None:
            self.ema_metric = metric
        else:
            self.ema_metric = (
                self.smoothing * self.ema_metric + (1.0 - self.smoothing) * metric
            )
        if self.ema_metric < self.best * (1.0 - self.threshold):
            self.best = self.ema_metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if (
            self.num_bad_epochs > self.patience
            and self.num_reductions < self.max_reductions
        ):
            self.scale *= self.factor
            self.num_bad_epochs = 0
            self.num_reductions += 1
        return self.scale

    def state_dict(self) -> Dict[str, Any]:
        return dict(self.__dict__)

    def load_state_dict(self, state: Dict[str, Any]) -> None:
        self.__dict__.update(state)
