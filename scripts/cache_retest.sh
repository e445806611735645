#!/bin/bash
# Retest the axon compile-cache-hit deadlock (r03 finding, jax version may
# have moved): run the same program twice with the cache FORCED on. The
# second run hits the cache; if it hangs, the timeout kills it and we keep
# the cache disabled on axon.
set -u
CACHE_DIR=$(mktemp -d)
PROG='
import os
from dqo_map_tpu.utils.compile_cache import enable_compilation_cache
d = enable_compilation_cache()
print("cache dir:", d)
import jax, jax.numpy as jnp, numpy as np, time
@jax.jit
def f(x):
    def body(c, _):
        return c @ c * 1e-3 + c, ()
    y, _ = jax.lax.scan(body, x, None, length=8)
    return y.sum()
t0 = time.time()
v = float(f(jnp.ones((512, 512))))
print(f"result {v:.3f} in {time.time()-t0:.1f}s")
'
cd "$(dirname "$0")/.."
echo "=== run 1 (miss, writes) ==="
DQO_COMPILE_CACHE_FORCE=1 DQO_COMPILE_CACHE=$CACHE_DIR \
  timeout 300 python -c "$PROG" || echo "RUN1 FAILED rc=$?"
ls -la "$CACHE_DIR" | head -5
echo "=== run 2 (hit) ==="
DQO_COMPILE_CACHE_FORCE=1 DQO_COMPILE_CACHE=$CACHE_DIR \
  timeout 120 python -c "$PROG" && echo "CACHE HIT OK" \
  || echo "RUN2 FAILED/HUNG rc=$? (deadlock still present)"
rm -rf "$CACHE_DIR"
