"""Persistent XLA compilation cache wiring.

The flagship production program (mega kernels + bf16 + grad-of-grad)
costs ~116 s to compile per fresh process (PERF.md); MD restarts,
multi-host workers and the i-Pi driver all re-pay it without a
persistent cache.  This module turns on JAX's on-disk compilation cache
once per process; every production entry point (run_train, Calculator,
InferenceEngine, the i-Pi driver) calls it, so a second launch of the
same program compiles in seconds.

The reference has no analogue (TorchScript deployment amortizes compile
differently); this is part of the TPU-native operational story.
"""

from __future__ import annotations

import os
from typing import Optional, Union

_ENABLED_DIR: Optional[str] = None

# env knobs: XEQ_COMPILE_CACHE=0 disables; XEQ_COMPILE_CACHE=/path overrides
_ENV = "XEQ_COMPILE_CACHE"
_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "xequinet_tpu", "xla_cache"
)


def enable_compilation_cache(
    cache: Union[bool, str, None] = True,
    min_compile_secs: float = 0.5,
) -> Optional[str]:
    """Enable the persistent XLA compilation cache (idempotent).

    ``cache``: True -> default directory (or $XEQ_COMPILE_CACHE),
    a string -> that directory, False/None/"" -> no-op (returns None).
    The env var XEQ_COMPILE_CACHE=0/"" force-disables regardless.

    Returns the active cache directory, or None when disabled.
    """
    global _ENABLED_DIR
    if not cache:
        return None
    env = os.environ.get(_ENV)
    if env is not None and env.strip() in ("", "0", "false", "off"):
        return None
    if isinstance(cache, str):
        cache_dir = cache
    else:
        cache_dir = env or _DEFAULT_DIR
    if _ENABLED_DIR == cache_dir:
        return _ENABLED_DIR

    import jax

    os.makedirs(cache_dir, exist_ok=True)
    prev = getattr(jax.config, "jax_compilation_cache_dir", None)
    if prev is not None and prev != cache_dir:
        # the cache object is created lazily and pinned to the first
        # directory; retarget it explicitly
        try:
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
        except Exception:
            pass
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache even fast-compiling programs: the MD/Calculator bucket set is
    # small and stable, so disk cost is negligible next to restart latency
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _ENABLED_DIR = cache_dir
    return _ENABLED_DIR
