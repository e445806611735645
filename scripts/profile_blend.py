"""In-scan blend fwd / fwd+bwd cost at office0 scale. Sweep DQO_CHUNK."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

ITERS = 10


def timeit(fn, *args, n=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000 / ITERS


P = int(os.environ.get("PROF_P", 262144))
W, H = 1200, 680
rng = np.random.default_rng(0)

from dqo_map_tpu.models.cameras import Camera
from dqo_map_tpu.ops import binning as binning_mod
from dqo_map_tpu.ops.blend import BlendParams
from dqo_map_tpu.ops.blend_pallas import CHUNK, _blend_core, pack_entries
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
cam_in = jax.tree.map(jnp.asarray, cam.render_inputs())
settings = RenderSettings(width=W, height=H)

pre_fn = jax.jit(lambda m, s, r: preprocess(
    m, s, r, cam_in, settings.color_sigma, W, H, 1.0))
pre = jax.block_until_ready(pre_fn(means, scales, q))
entry_cap, max_chunks = entry_budget(P, settings)
bin_fn = jax.jit(lambda pre: binning_mod.bin_gaussians(
    pre, W, H, settings.tile_size, settings.max_tiles_per_gaussian,
    None, align=CHUNK, entry_cap=entry_cap, max_chunks=max_chunks))
b = jax.block_until_ready(bin_fn(pre))
print(f"CHUNK={CHUNK} cap={entry_cap} entries={int(b.num_entries)} "
      f"blocks={int(b.num_blocks)} dropped={int(b.dropped)}")

params = BlendParams(opaque_threshold=0.6, depth_threshold=1.0,
                     normal_threshold=0.5, T_threshold=1e-4)
TH, TW = binning_mod.tile_grid_size(W, H, settings.tile_size)
num_tiles = TH * TW
scal = jnp.stack([cam_in["K"][0, 0], cam_in["K"][1, 1],
                  cam_in["K"][0, 2], cam_in["K"][1, 2]]).astype(jnp.float32)
bg = (0.0, 0.0, 0.0)


@jax.jit
def scan_fwd(colors, opac):
    def body(c, _):
        co, op = c
        f = pack_entries(pre, b, co, op)
        cc, aux, nt = _blend_core(f, b.block_tile, b.num_blocks, scal,
                                  num_tiles, settings.tile_size, TW, params,
                                  bg)
        s = cc.sum() * 1e-12
        return (co + s, op + s), None
    c, _ = jax.lax.scan(body, (colors, opac), None, length=ITERS)
    return c


@jax.jit
def scan_bwd(colors, opac):
    def body(c, _):
        co, op = c
        def loss(co_, op_):
            f = pack_entries(pre, b, co_, op_)
            cc, aux, nt = _blend_core(f, b.block_tile, b.num_blocks, scal,
                                      num_tiles, settings.tile_size, TW,
                                      params, bg)
            return cc[:num_tiles].sum()
        g1, g2 = jax.grad(loss, argnums=(0, 1))(co, op)
        return (co + 1e-12 * g1, op + 1e-12 * g2), None
    c, _ = jax.lax.scan(body, (colors, opac), None, length=ITERS)
    return c


print(f"pack+blend fwd:     {timeit(scan_fwd, colors, opac):8.2f} ms/iter")
print(f"pack+blend fwd+bwd: {timeit(scan_bwd, colors, opac):8.2f} ms/iter")
