"""Matmul precision control (TPU accuracy knob).

On TPU, f32 matmuls default to single-pass bf16 on the MXU.  Measured
on a 1400-atom system with an untrained net (tools + PERF.md round 3):
the XLA force path deviates from exact f64 math by ~7% max-force and
the mega-kernel path by ~5% — both are the same MXU envelope, which
also bounds how closely any two paths can agree.  For accuracy-critical
work (Hessians, barrier heights), ``float32`` runs every dot as the
3-pass f32 decomposition at ~1/3 MXU throughput.

The mega kernels already run their dots at HIGHEST when their compute
dtype is f32 (ops/pallas_message._dot_precision); this knob aligns the
XLA remainder (Dense layers, update blocks, heads).
"""

from __future__ import annotations

from typing import Optional

_VALID = ("bfloat16", "tensorfloat32", "float32", "highest", "default")


def set_matmul_precision(precision: Optional[str]) -> None:
    """Set jax_default_matmul_precision ("bfloat16" | "tensorfloat32" |
    "float32"/"highest").  None / "default" = leave the backend default
    (bf16 on TPU)."""
    if precision is None or precision == "default":
        return
    if precision == "highest":
        precision = "float32"
    if precision not in _VALID:
        raise ValueError(
            f"matmul_precision {precision!r}; choose one of {_VALID}"
        )
    import jax

    jax.config.update("jax_default_matmul_precision", precision)
