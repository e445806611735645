"""Isolate pack_entries cost: is it the gather or the fused stack/transpose?"""
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
xy = jnp.asarray(rng.normal(size=(P, 2)), jnp.float32)
conic = jnp.asarray(rng.normal(size=(P, 3)), jnp.float32)
colors = jnp.asarray(rng.normal(size=(P, 3)), jnp.float32)
mean_c = jnp.asarray(rng.normal(size=(P, 3)), jnp.float32)
normal_c = jnp.asarray(rng.normal(size=(P, 3)), jnp.float32)
opac = jnp.asarray(rng.normal(size=(P,)), jnp.float32)
depth = jnp.asarray(rng.normal(size=(P,)), jnp.float32)
smax = jnp.asarray(rng.normal(size=(P,)), jnp.float32)
valid = jnp.asarray(rng.integers(0, 2, L).astype(np.float32))


def pack_current(xy, conic, colors, mean_c, normal_c, opac, depth, smax, g):
    xyT, coT, clT, mcT, ncT = xy.T, conic.T, colors.T, mean_c.T, normal_c.T
    ndm = mcT[0] * ncT[0] + mcT[1] * ncT[1] + mcT[2] * ncT[2]
    rows = [xyT[0], xyT[1], coT[0], coT[1], coT[2], opac,
            clT[0], clT[1], clT[2], depth,
            ncT[0], ncT[1], ncT[2], smax, ndm]
    stacked = jnp.stack(rows, axis=0)
    feats15 = jnp.take(stacked, g, axis=1)
    val = valid[None, :]
    gid = g.astype(jnp.float32)[None, :]
    op_masked = feats15[5:6] * val
    return jnp.concatenate(
        [feats15[:5], op_masked, feats15[6:14], gid, feats15[14:15]], axis=0)


def pack_barrier(xy, conic, colors, mean_c, normal_c, opac, depth, smax, g):
    xyT, coT, clT, mcT, ncT = xy.T, conic.T, colors.T, mean_c.T, normal_c.T
    ndm = mcT[0] * ncT[0] + mcT[1] * ncT[1] + mcT[2] * ncT[2]
    rows = [xyT[0], xyT[1], coT[0], coT[1], coT[2], opac,
            clT[0], clT[1], clT[2], depth,
            ncT[0], ncT[1], ncT[2], smax, ndm]
    stacked = jax.lax.optimization_barrier(jnp.stack(rows, axis=0))
    feats15 = jnp.take(stacked, g, axis=1)
    val = valid[None, :]
    gid = g.astype(jnp.float32)[None, :]
    op_masked = feats15[5:6] * val
    return jnp.concatenate(
        [feats15[:5], op_masked, feats15[6:14], gid, feats15[14:15]], axis=0)


def pack_axis0(xy, conic, colors, mean_c, normal_c, opac, depth, smax, g):
    ndm = jnp.sum(mean_c * normal_c, axis=1, keepdims=True)
    tab = jnp.concatenate(
        [xy, conic, opac[:, None], colors, depth[:, None], normal_c,
         smax[:, None], ndm, jnp.zeros((P, 1), jnp.float32)], axis=1)  # (P,16)
    tab = jax.lax.optimization_barrier(tab)
    gathered = jnp.take(tab, g, axis=0)          # (L, 16)
    out = gathered.T                              # (16, L)
    val = valid[None, :]
    gid = g.astype(jnp.float32)[None, :]
    return jnp.concatenate(
        [out[:5], out[5:6] * val, out[6:15], ], axis=0), gid


f1 = jax.jit(pack_current)
f2 = jax.jit(pack_barrier)
f3 = jax.jit(pack_axis0)
args = (xy, conic, colors, mean_c, normal_c, opac, depth, smax, g)
print(f"pack current:  {timeit(f1, *args):8.3f} ms")
print(f"pack barrier:  {timeit(f2, *args):8.3f} ms")
print(f"pack axis0.T:  {timeit(f3, *args):8.3f} ms")

# fwd+bwd versions (grad wrt colors+opac like the optimize iter)
def loss1(colors, opac):
    return pack_current(xy, conic, colors, mean_c, normal_c, opac, depth,
                        smax, g).sum()
def loss2(colors, opac):
    return pack_barrier(xy, conic, colors, mean_c, normal_c, opac, depth,
                        smax, g).sum()
g1 = jax.jit(jax.grad(loss1, argnums=(0, 1)))
g2 = jax.jit(jax.grad(loss2, argnums=(0, 1)))
print(f"pack current fwd+bwd: {timeit(g1, colors, opac):8.3f} ms")
print(f"pack barrier fwd+bwd: {timeit(g2, colors, opac):8.3f} ms")
