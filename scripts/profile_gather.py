"""Benchmark gather layouts for pack_entries on the real TPU.

pack_entries today: jnp.take((15, P), g, axis=1) with L ~ 1M. 25 ms.
Candidates:
  A: take axis=1 of (R, P)        (current)
  B: take axis=0 of (P, R) then transpose
  C: R separate 1-D takes x[g]
  D: take axis=0 of (P, 128)-padded table, slice R, transpose
  E: one jnp.take axis=0 of (P, R) WITHOUT transpose (to isolate cost)
  F: gather bwd (scatter-add): segment_sum of (R, L) onto P
"""
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


P = 262144
L = 1048576
R = 15
rng = np.random.default_rng(0)
g = jnp.asarray(rng.integers(0, P, L), jnp.int32)
gs = jnp.asarray(np.sort(rng.integers(0, P, L)), jnp.int32)
tab_rp = jnp.asarray(rng.normal(size=(R, P)), jnp.float32)
tab_pr = jnp.asarray(rng.normal(size=(P, R)), jnp.float32)
tab_p8 = jnp.asarray(rng.normal(size=(P, 8)), jnp.float32)
tab_p128 = jnp.asarray(rng.normal(size=(P, 128)), jnp.float32)

A = jax.jit(lambda t, g: jnp.take(t, g, axis=1))
B = jax.jit(lambda t, g: jnp.take(t, g, axis=0).T)
C = jax.jit(lambda t, g: jnp.stack([t[r][g] for r in range(R)], 0))
D = jax.jit(lambda t, g: jnp.take(t, g, axis=0)[:, :R].T)
E = jax.jit(lambda t, g: jnp.take(t, g, axis=0))
E8 = jax.jit(lambda t, g: jnp.take(t, g, axis=0))

print(f"A take(( R,P),axis=1):      {timeit(A, tab_rp, g):8.3f} ms")
print(f"B take((P,R),axis=0).T:     {timeit(B, tab_pr, g):8.3f} ms")
print(f"C 15x 1-D takes:            {timeit(C, tab_rp, g):8.3f} ms")
print(f"D take((P,128),axis=0)[:R]: {timeit(D, tab_p128, g):8.3f} ms")
print(f"E take((P,R),axis=0):       {timeit(E, tab_pr, g):8.3f} ms")
print(f"E8 take((P,8),axis=0):      {timeit(E8, tab_p8, g):8.3f} ms")
print(f"A sorted idx:               {timeit(A, tab_rp, gs):8.3f} ms")
print(f"B sorted idx:               {timeit(B, tab_pr, gs):8.3f} ms")

# backward: scatter-add dL/dfeats (R, L) onto (R, P)
dl = jnp.asarray(rng.normal(size=(R, L)), jnp.float32)
dlT = jnp.asarray(rng.normal(size=(L, R)), jnp.float32)
SA = jax.jit(lambda d, g: jax.ops.segment_sum(d.T, g, num_segments=P))
SB = jax.jit(lambda d, g: jax.ops.segment_sum(d, g, num_segments=P))
print(f"F scatter (R,L).T->(P,R):   {timeit(SA, dl, g):8.3f} ms")
print(f"F scatter (L,R)->(P,R):     {timeit(SB, dlT, g):8.3f} ms")
print(f"F scatter sorted:           {timeit(SB, dlT, gs):8.3f} ms")

# full pack fwd+bwd through take axis0
def pack_loss(t):
    return jnp.take(t, g, axis=0).sum()
GB = jax.jit(jax.grad(pack_loss))
print(f"take((P,R),0) fwd+bwd:      {timeit(GB, tab_pr):8.3f} ms")
