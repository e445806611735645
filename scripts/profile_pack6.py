"""Distinguish: (a) values cause slowness (inf/nan in culled entries)?
(b) block_until_ready unreliable on axon (upstream cost misattributed)?

Build real pre/b, round-trip VALUES through numpy into fresh default arrays,
then time pack on those in the same process. Also time np.asarray readback.
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
W, H = 1200, 680
rng = np.random.default_rng(0)

from dqo_map_tpu.models.cameras import Camera
from dqo_map_tpu.ops import binning as binning_mod
from dqo_map_tpu.ops.blend_pallas import CHUNK, pack_entries
from dqo_map_tpu.ops.projection import preprocess
from dqo_map_tpu.ops.rasterize import RenderSettings, entry_budget

cam = Camera(uid=0, c2w=np.eye(4), fx=0.9 * W, fy=0.9 * W, cx=W / 2,
             cy=H / 2, width=W, height=H)
means = jnp.asarray(np.stack([
    rng.uniform(-2, 2, P), rng.uniform(-1.4, 1.4, P),
    rng.uniform(0.8, 6.0, P)], -1), jnp.float32)
scales = jnp.asarray(
    np.exp(rng.uniform(np.log(0.005), np.log(0.04), (P, 3)))
    * np.array([1, 1, 0.1]), jnp.float32)
q = rng.normal(size=(P, 4))
q /= np.linalg.norm(q, axis=1, keepdims=True)
q = jnp.asarray(q, jnp.float32)
opac = jnp.asarray(rng.uniform(0.3, 0.99, P), jnp.float32)
colors = jnp.asarray(rng.uniform(0, 1, (P, 3)), jnp.float32)
cam_in = cam.render_inputs()
settings = RenderSettings(width=W, height=H)

pre_fn = jax.jit(lambda m, s, r: preprocess(
    m, s, r, cam_in, settings.color_sigma, W, H, 1.0))
pre = jax.block_until_ready(pre_fn(means, scales, q))

entry_cap, max_chunks = entry_budget(P, settings)
bin_fn = jax.jit(lambda pre: binning_mod.bin_gaussians(
    pre, W, H, settings.tile_size, settings.max_tiles_per_gaussian,
    None, align=CHUNK, entry_cap=entry_cap, max_chunks=max_chunks))
b = jax.block_until_ready(bin_fn(pre))

pack_fn = jax.jit(lambda pre, b, c, o: pack_entries(pre, b, c, o))
print(f"pack real pre/b:           {timeit(pack_fn, pre, b, colors, opac):8.3f} ms")

# VALUES copied via numpy into fresh arrays
pre_np = jax.tree.map(lambda x: np.asarray(x), pre)
b_np = jax.tree.map(lambda x: np.asarray(x), b)
for k, v in pre_np._asdict().items():
    if v.dtype.kind == 'f':
        n_bad = np.sum(~np.isfinite(v))
        if n_bad:
            print(f"  pre.{k}: {n_bad} non-finite values")
pre2 = jax.tree.map(jnp.asarray, pre_np)
b2 = jax.tree.map(jnp.asarray, b_np)
print(f"pack value-roundtrip:      {timeit(pack_fn, pre2, b2, colors, opac):8.3f} ms")

# sanitize non-finite values, keep everything else
pre3 = jax.tree.map(
    lambda x: jnp.asarray(np.nan_to_num(x, posinf=0.0, neginf=0.0))
    if x.dtype.kind == 'f' else jnp.asarray(x), pre_np)
print(f"pack sanitized values:     {timeit(pack_fn, pre3, b2, colors, opac):8.3f} ms")

# time a full device->host readback of the pack output (true total latency)
out = pack_fn(pre, b, colors, opac)
jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(3):
    _ = np.asarray(pack_fn(pre, b, colors, opac))
print(f"pack + full readback:      {(time.perf_counter()-t0)/3*1000:8.3f} ms")
