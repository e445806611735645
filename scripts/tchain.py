"""Chain-difference timing harness for the tunneled axon TPU backend.

On this backend `jax.block_until_ready` does NOT wait for device completion
(dispatch is fully async through the tunnel) and the proxy memoizes repeated
identical executions, so the classic warm-up + same-args-loop protocol
reports garbage. The only reliable clock:

    time( jit(chain of n data-dependent iterations)(varied args) + tiny
          host readback )        for two chain lengths n1 < n2
    per-iter ms = (t(n2) - t(n1)) / (n2 - n1)

The readback forces completion; differencing cancels the ~30 ms tunnel
roundtrip; varying an input per call defeats the proxy result cache; the
data dependency between chained iterations defeats on-device CSE.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(name, step, init_carry, n1=4, n2=16, reps=2, verbose=True):
    """step(carry, i) -> carry (same pytree structure/shapes).

    Returns per-iteration ms. `init_carry` must be a pytree of arrays;
    the harness perturbs the first leaf per call to defeat result caching.
    """
    def make(n):
        @jax.jit
        def chained(c):
            def body(c, i):
                return step(c, i), ()
            c, _ = jax.lax.scan(body, c, jnp.arange(1, n + 1, dtype=jnp.int32))
            return jax.tree.map(lambda x: x.ravel()[:1], c)
        return chained

    f1, f2 = make(n1), make(n2)
    leaves, treedef = jax.tree.flatten(init_carry)

    def call(f, salt):
        lv = list(leaves)
        lv[0] = lv[0] + jnp.asarray(salt, lv[0].dtype)
        c = jax.tree.unflatten(treedef, lv)
        t0 = time.perf_counter()
        out = f(c)
        np.asarray(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) * 1000

    call(f1, 0)   # compile
    call(f2, 0)
    best = float("inf")
    for r in range(reps):
        t1 = call(f1, r + 1)
        t2 = call(f2, 100 + r)
        best = min(best, (t2 - t1) / (n2 - n1))
    if verbose:
        print(f"{name:46s} {best:9.2f} ms/iter")
    return best
