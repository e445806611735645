"""Persistent XLA compilation cache (compile-latency hygiene).

The SLAM stack jit-compiles ~20 step functions; a cold office0-scale run
spends minutes in XLA before the first frame finishes. Enabling JAX's
persistent compilation cache makes every later invocation (bench re-runs,
CLI runs, CI) warm up in seconds. The reference has no equivalent concern
(torch extensions compile at install time).

The cache is only enabled on backends known to support executable
deserialization. On the tunneled `axon` TPU backend a cache HIT deadlocks
the client (the first, cache-miss run works — writes are fine — but any
later run hangs inside the first jit execution), so the cache is skipped
there unless DQO_COMPILE_CACHE_FORCE=1."""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "DQO_COMPILE_CACHE", os.path.expanduser("~/.cache/dqo_map_tpu/xla"))


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently turn on jax's persistent compilation cache (returns the
    cache dir, or None when disabled for the active backend)."""
    import jax

    if os.environ.get("DQO_COMPILE_CACHE_FORCE") != "1":
        # jax_platforms is set before backend init (sitecustomize/env), so
        # this check does not force initialization. Exact token compare —
        # substring matching would trip on unrelated platform names
        # (ADVICE r03).
        plats = str(jax.config.jax_platforms
                    or os.environ.get("JAX_PLATFORMS", "") or "")
        if "axon" in plats.split(","):
            # Also neutralize any cache dir injected from the environment
            # (JAX_COMPILATION_CACHE_DIR) or set earlier in-process — a
            # cache HIT through the axon tunnel deadlocks the client
            # (ADVICE r03).
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
