"""Minimal pair: real pack_entries vs structurally identical rewrite, one
script, same inputs. If timings differ, dump HLO diff."""
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
validb = jnp.asarray(rng.integers(0, 2, L).astype(bool))
xy = jnp.asarray(rng.normal(size=(P, 2)), jnp.float32)
conic = jnp.asarray(rng.normal(size=(P, 3)), jnp.float32)
colors = jnp.asarray(rng.normal(size=(P, 3)), jnp.float32)
mean_c = jnp.asarray(rng.normal(size=(P, 3)), jnp.float32)
normal_c = jnp.asarray(rng.normal(size=(P, 3)), jnp.float32)
opac = jnp.asarray(rng.normal(size=(P,)), jnp.float32)
depth = jnp.asarray(rng.normal(size=(P,)), jnp.float32)
smax = jnp.asarray(rng.normal(size=(P,)), jnp.float32)

from dqo_map_tpu.ops.binning import Binning
from dqo_map_tpu.ops.blend_pallas import pack_entries
from dqo_map_tpu.ops.projection import Preprocessed

pre = Preprocessed(
    xy=xy, conic=conic, depth=depth, radius=jnp.zeros(P), valid=jnp.ones(P, bool),
    mean_c=mean_c, normal_c=normal_c, scale_max=smax)
nb = L // 256
b = Binning(point_list=g, entry_tile=jnp.zeros(L, jnp.int32),
            entry_valid=validb, tile_offsets=jnp.zeros(3194, jnp.int32),
            block_tile=jnp.zeros(nb, jnp.int32),
            num_entries=jnp.int32(L), num_blocks=jnp.int32(nb),
            dropped=jnp.int32(0))

pack_fn = jax.jit(lambda pre, b, c, o: pack_entries(pre, b, c, o))
print(f"pack_entries synth pre/b:  {timeit(pack_fn, pre, b, colors, opac):8.3f} ms")


def pack_real(g, validb, xy, conic, colors, mean_c, normal_c, opac, depth, smax):
    xyT, coT, clT, mcT, ncT = xy.T, conic.T, colors.T, mean_c.T, normal_c.T
    ndm = mcT[0] * ncT[0] + mcT[1] * ncT[1] + mcT[2] * ncT[2]
    stacked = jnp.stack([xyT[0], xyT[1], coT[0], coT[1], coT[2], opac,
                         clT[0], clT[1], clT[2], depth,
                         ncT[0], ncT[1], ncT[2], smax, ndm], axis=0)
    feats15 = jnp.take(stacked, g, axis=1)
    val = validb.astype(jnp.float32)[None, :]
    gid = g.astype(jnp.float32)[None, :]
    op_masked = feats15[5:6] * val
    return jnp.concatenate(
        [feats15[:5], op_masked, feats15[6:14], gid, feats15[14:15]], axis=0)


f7 = jax.jit(pack_real)
args7 = (g, validb, xy, conic, colors, mean_c, normal_c, opac, depth, smax)
print(f"pack_real flat args:       {timeit(f7, *args7):8.3f} ms")

# compare lowered HLO op sets
t1 = pack_fn.lower(pre, b, colors, opac).compile()
t2 = f7.lower(*args7).compile()
h1 = t1.as_text()
h2 = t2.as_text()
import re
def opcounts(h):
    from collections import Counter
    c = Counter()
    for line in h.splitlines():
        m = re.search(r"=\s+\S+\s+(\w+)\(", line)
        if m:
            c[m.group(1)] += 1
    return c
c1, c2 = opcounts(h1), opcounts(h2)
print("pack_entries ops:", dict(c1))
print("pack_real ops:   ", dict(c2))
with open("/tmp/hlo_slow.txt", "w") as f:
    f.write(h1)
with open("/tmp/hlo_fast.txt", "w") as f:
    f.write(h2)
print("wrote /tmp/hlo_slow.txt /tmp/hlo_fast.txt")
