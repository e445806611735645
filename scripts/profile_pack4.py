"""Why is pack_entries slow with REAL binning outputs but fast with synthetic?
Swap one ingredient at a time."""
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
L = int(b.point_list.shape[0])
print(f"entry_cap={L} entries={int(b.num_entries)}")

pack_fn = jax.jit(lambda pre, b, c, o: pack_entries(pre, b, c, o))
print(f"pack real b:              {timeit(pack_fn, pre, b, colors, opac):8.3f} ms")

# b with random point_list
b2 = b._replace(point_list=jnp.asarray(rng.integers(0, P, L), jnp.int32))
print(f"pack random point_list:   {timeit(pack_fn, pre, b2, colors, opac):8.3f} ms")

# b with all-true entry_valid
b3 = b._replace(entry_valid=jnp.ones((L,), bool))
print(f"pack valid=all:           {timeit(pack_fn, pre, b3, colors, opac):8.3f} ms")

# standalone binning rerun for sanity (blocked)
print(f"binning (sanity):         {timeit(bin_fn, pre):8.3f} ms")

# binning + pack fused in one jit (as the render path actually runs them?)
bp = jax.jit(lambda pre, c, o: pack_entries(pre, bin_fn(pre), c, o))
print(f"bin+pack one jit:         {timeit(bp, pre, colors, opac):8.3f} ms")

# force default layouts by round-tripping pre/b through host
pre_h = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), pre)
b_h = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), b)
print(f"pack host-roundtrip:      {timeit(pack_fn, pre_h, b_h, colors, opac):8.3f} ms")
for name in ("xy", "conic", "mean_c", "normal_c", "depth", "scale_max"):
    arr = getattr(pre, name)
    try:
        print(name, arr.shape, arr.format.layout if hasattr(arr, 'format') else '?')
    except Exception as e:
        print(name, arr.shape, 'layout?', e)
