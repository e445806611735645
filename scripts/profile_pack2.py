"""Bisect pack_entries: which op carries the 20ms?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


P, L = 262144, 1048576
rng = np.random.default_rng(0)
g = jnp.asarray(rng.integers(0, P, L), jnp.int32)
tab = jnp.asarray(rng.normal(size=(15, P)), jnp.float32)
valid = jnp.asarray(rng.integers(0, 2, L).astype(np.float32))

# 1. take only, table as arg, indices as arg (same as profile_gather A)
f1 = jax.jit(lambda t, gg: jnp.take(t, gg, axis=1))
print(f"1 take arg/arg:          {timeit(f1, tab, g):8.3f} ms")

# 2. take only, indices closed over
f2 = jax.jit(lambda t: jnp.take(t, g, axis=1))
print(f"2 take closure idx:      {timeit(f2, tab):8.3f} ms")

# 3. take + concat row surgery (the pack epilogue)
def pack_ep(t, gg, vv):
    feats15 = jnp.take(t, gg, axis=1)
    val = vv[None, :]
    gid = gg.astype(jnp.float32)[None, :]
    op_masked = feats15[5:6] * val
    return jnp.concatenate(
        [feats15[:5], op_masked, feats15[6:14], gid, feats15[14:15]], axis=0)
f3 = jax.jit(pack_ep)
print(f"3 take+epilogue:         {timeit(f3, tab, g, valid):8.3f} ms")

# 4. take + plain sum consumer (forces materialization differently)
f4 = jax.jit(lambda t, gg: jnp.take(t, gg, axis=1).sum())
print(f"4 take+sum:              {timeit(f4, tab, g):8.3f} ms")

# 5. take into (16,L) via pad row then single concat-free path
def pack_pad(t, gg, vv):
    feats15 = jnp.take(t, gg, axis=1)
    out = jnp.pad(feats15, ((0, 1), (0, 0)))
    out = out.at[5].mul(vv)
    out = out.at[15].set(gg.astype(jnp.float32))
    return out
f5 = jax.jit(pack_pad)
print(f"5 take+pad+at:           {timeit(f5, tab, g, valid):8.3f} ms")

# 6. gather 16-row table (append gid/val rows to the TABLE first, P-sized)
tab16 = jnp.concatenate([tab, jnp.zeros((1, P), jnp.float32)], 0)
def pack_t16(t, gg, vv):
    out = jnp.take(t, gg, axis=1)
    return out
f6 = jax.jit(pack_t16)
print(f"6 take 16-row:           {timeit(f6, tab16, g):8.3f} ms")
