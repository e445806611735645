"""Profile the rasterizer stages on the real TPU chip.

Times preprocess / binning / blend / full fwd / fwd+bwd separately at
bench-realistic scales so optimization effort goes where the ms are.
Run: python scripts/profile_render.py [P] [W] [H]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 480

    from dqo_map_tpu.models.cameras import Camera
    from dqo_map_tpu.ops import binning as binning_mod
    from dqo_map_tpu.ops.projection import preprocess
    from dqo_map_tpu.ops.rasterize import RenderSettings, rasterize

    rng = np.random.default_rng(0)
    cam = Camera(uid=0, c2w=np.eye(4), fx=0.9 * W, fy=0.9 * W, cx=W / 2,
                 cy=H / 2, width=W, height=H)
    means = np.stack([
        rng.uniform(-2, 2, P), rng.uniform(-1.4, 1.4, P),
        rng.uniform(0.8, 6.0, P)], -1).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(0.005), np.log(0.04), (P, 3))).astype(np.float32)
    scales[:, 2] *= 0.1
    q = rng.normal(size=(P, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.99, P).astype(np.float32)
    colors = rng.uniform(0, 1, (P, 3)).astype(np.float32)
    normal_w = rng.normal(size=(P, 3)).astype(np.float32)

    means, scales, q, opac, colors, normal_w = map(
        jnp.asarray, (means, scales, q, opac, colors, normal_w))
    cam_in = cam.render_inputs()
    settings = RenderSettings(width=W, height=H)
    print(f"backend={jax.default_backend()} P={P} {W}x{H} impl={settings.impl}")

    # stage 1: preprocess
    pre_fn = jax.jit(lambda m, s, r: preprocess(
        m, s, r, cam_in, settings.color_sigma, W, H, 1.0))
    print(f"preprocess:       {timeit(pre_fn, means, scales, q):8.2f} ms")
    pre = pre_fn(means, scales, q)

    # stage 2: binning
    from dqo_map_tpu.ops.blend_pallas import CHUNK
    TH0, TW0 = binning_mod.tile_grid_size(W, H, settings.tile_size)
    worst = P * settings.max_tiles_per_gaussian + TH0 * TW0 * CHUNK
    entry_cap = min(settings.entry_cap, ((worst + CHUNK - 1) // CHUNK) * CHUNK)
    max_chunks = max(1, min(settings.max_chunks_per_tile, entry_cap // CHUNK))
    bin_fn = jax.jit(lambda pre: binning_mod.bin_gaussians(
        pre, W, H, settings.tile_size, settings.max_tiles_per_gaussian,
        None, align=CHUNK, entry_cap=entry_cap, max_chunks=max_chunks))
    print(f"binning (cap={entry_cap}): {timeit(bin_fn, pre):8.2f} ms")
    b = bin_fn(pre)
    print(f"  num_entries={int(b.num_entries)} dropped={int(b.dropped)}")

    # full forward
    fwd = jax.jit(lambda m, s, r, o, c: rasterize(
        m, s, r, o, c, cam_in, settings, normal_w=normal_w)["render"])
    print(f"full forward:     {timeit(fwd, means, scales, q, opac, colors):8.2f} ms")

    # fwd+bwd
    def loss(m, s, r, o, c):
        out = rasterize(m, s, r, o, c, cam_in, settings, normal_w=normal_w)
        return out["render"].sum() + out["depth"].sum()
    grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    print(f"fwd+bwd:          {timeit(grad_fn, means, scales, q, opac, colors):8.2f} ms")


if __name__ == "__main__":
    main()
