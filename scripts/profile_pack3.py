"""Replicate the REAL pack_entries call: indices as traced arg, table built
in-jit from transposes of (P,k) arrays."""
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
gsort = jnp.asarray(np.sort(rng.integers(0, P, L)), jnp.int32)
xy = jnp.asarray(rng.normal(size=(P, 2)), jnp.float32)
conic = jnp.asarray(rng.normal(size=(P, 3)), jnp.float32)
colors = jnp.asarray(rng.normal(size=(P, 3)), jnp.float32)
mean_c = jnp.asarray(rng.normal(size=(P, 3)), jnp.float32)
normal_c = jnp.asarray(rng.normal(size=(P, 3)), jnp.float32)
opac = jnp.asarray(rng.normal(size=(P,)), jnp.float32)
depth = jnp.asarray(rng.normal(size=(P,)), jnp.float32)
smax = jnp.asarray(rng.normal(size=(P,)), jnp.float32)
valid = jnp.asarray(rng.integers(0, 2, L).astype(np.float32))


def build(xy, conic, colors, mean_c, normal_c, opac, depth, smax):
    xyT, coT, clT, mcT, ncT = xy.T, conic.T, colors.T, mean_c.T, normal_c.T
    ndm = mcT[0] * ncT[0] + mcT[1] * ncT[1] + mcT[2] * ncT[2]
    return jnp.stack([xyT[0], xyT[1], coT[0], coT[1], coT[2], opac,
                      clT[0], clT[1], clT[2], depth,
                      ncT[0], ncT[1], ncT[2], smax, ndm], axis=0)


def pack_real(g, valid, *tabs):
    stacked = build(*tabs)
    feats15 = jnp.take(stacked, g, axis=1)
    val = valid[None, :]
    gid = g.astype(jnp.float32)[None, :]
    op_masked = feats15[5:6] * val
    return jnp.concatenate(
        [feats15[:5], op_masked, feats15[6:14], gid, feats15[14:15]], axis=0)


def pack_real_barrier(g, valid, *tabs):
    stacked = jax.lax.optimization_barrier(build(*tabs))
    feats15 = jnp.take(stacked, g, axis=1)
    val = valid[None, :]
    gid = g.astype(jnp.float32)[None, :]
    op_masked = feats15[5:6] * val
    return jnp.concatenate(
        [feats15[:5], op_masked, feats15[6:14], gid, feats15[14:15]], axis=0)


tabs = (xy, conic, colors, mean_c, normal_c, opac, depth, smax)
f7 = jax.jit(pack_real)
f8 = jax.jit(pack_real_barrier)
print(f"7 real pack (arg idx):     {timeit(f7, g, valid, *tabs):8.3f} ms")
print(f"8 real pack + barrier:     {timeit(f8, g, valid, *tabs):8.3f} ms")
print(f"7 sorted idx:              {timeit(f7, gsort, valid, *tabs):8.3f} ms")

# 9. build table then take in TWO jits (forces materialization between)
fb = jax.jit(build)
ft = jax.jit(lambda t, gg, vv: jnp.concatenate(
    [jnp.take(t, gg, axis=1)[:5],
     jnp.take(t, gg, axis=1)[5:6] * vv[None, :],
     jnp.take(t, gg, axis=1)[6:14],
     gg.astype(jnp.float32)[None, :],
     jnp.take(t, gg, axis=1)[14:15]], axis=0))
stacked = jax.block_until_ready(fb(*tabs))
print(f"9 two-jit take+epilogue:   {timeit(ft, stacked, g, valid):8.3f} ms")
