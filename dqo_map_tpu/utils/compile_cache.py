"""Persistent XLA compilation cache (compile-latency hygiene).

The SLAM stack jit-compiles ~20 step functions; a cold office0-scale run
spends minutes in XLA before the first frame finishes. Enabling JAX's
persistent compilation cache makes every later invocation (bench re-runs,
CLI runs, CI) warm up in seconds. The reference has no equivalent concern
(torch extensions compile at install time).

History: on the r03 jax/axon stack a cache HIT deadlocked the tunneled
client, so the cache was disabled there (commit fb75123). Re-tested in
round 5 on jax 0.9.0 (`scripts/cache_retest.sh`): hits complete fine for
both plain XLA programs and Pallas kernels, so the cache is ON everywhere
again. DQO_COMPILE_CACHE_DISABLE=1 turns it off if a future stack
regresses."""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "DQO_COMPILE_CACHE", os.path.expanduser("~/.cache/dqo_map_tpu/xla"))


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently turn on jax's persistent compilation cache (returns the
    cache dir, or None when disabled)."""
    import jax

    if os.environ.get("DQO_COMPILE_CACHE_DISABLE") == "1":
        try:
            if jax.config.jax_compilation_cache_dir:
                jax.config.update("jax_compilation_cache_dir", None)
        except Exception:
            pass
        return None
    d = cache_dir or _DEFAULT_DIR
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return d
