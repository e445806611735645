"""Fine-grained hot-op profile on the real TPU.

Times, at bench-realistic shapes:
  - dispatch roundtrip latency (the axon tunnel tax)
  - pack_entries alone vs the Pallas blend fwd alone vs bwd
  - binning alone (sort + layout)
  - knn at densify shapes
  - icp_pyramid + preprocess_frame at full resolution
Run: python scripts/profile_micro.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, warmup=2, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    P = int(os.environ.get("PROF_P", 262144))
    W, H = 1200, 680
    rng = np.random.default_rng(0)

    # --- dispatch latency
    x = jnp.zeros(8)
    f = jax.jit(lambda x: x + 1)
    print(f"dispatch+sync roundtrip: {timeit(f, x, n=30):8.3f} ms")
    g = jax.jit(lambda x: x * 2)
    def chain10(x):
        for _ in range(10):
            x = g(x)
        return x
    print(f"10 chained dispatches:   {timeit(chain10, x, n=10):8.3f} ms")

    from dqo_map_tpu.models.cameras import Camera
    from dqo_map_tpu.ops import binning as binning_mod
    from dqo_map_tpu.ops.blend_pallas import (CHUNK, _blend_core, pack_entries)
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
    print(f"preprocess:              {timeit(pre_fn, means, scales, q):8.3f} ms")
    pre = jax.block_until_ready(pre_fn(means, scales, q))

    entry_cap, max_chunks = entry_budget(P, settings)
    bin_fn = jax.jit(lambda pre: binning_mod.bin_gaussians(
        pre, W, H, settings.tile_size, settings.max_tiles_per_gaussian,
        None, align=CHUNK, entry_cap=entry_cap, max_chunks=max_chunks))
    print(f"binning (cap={entry_cap}): {timeit(bin_fn, pre):8.3f} ms")
    b = jax.block_until_ready(bin_fn(pre))
    print(f"  entries={int(b.num_entries)} blocks={int(b.num_blocks)} "
          f"dropped={int(b.dropped)}")

    pack_fn = jax.jit(lambda pre, b, c, o: pack_entries(pre, b, c, o))
    print(f"pack_entries:            {timeit(pack_fn, pre, b, colors, opac):8.3f} ms")
    feats = jax.block_until_ready(pack_fn(pre, b, colors, opac))

    from dqo_map_tpu.ops.blend import BlendParams
    params = BlendParams(opaque_threshold=0.6, depth_threshold=1.0,
                         normal_threshold=0.5, T_threshold=1e-4)
    TH, TW = binning_mod.tile_grid_size(W, H, settings.tile_size)
    num_tiles = TH * TW
    scal = jnp.stack([cam_in["K"][0, 0], cam_in["K"][1, 1],
                      cam_in["K"][0, 2], cam_in["K"][1, 2]]).astype(jnp.float32)
    bg = (0.0, 0.0, 0.0)

    blend_fwd = jax.jit(lambda f, bt, nb: _blend_core(
        f, bt, nb, scal, num_tiles, settings.tile_size, TW, params, bg))
    print(f"blend fwd (pallas):      {timeit(blend_fwd, feats, b.block_tile, b.num_blocks):8.3f} ms")

    def blend_loss(f):
        c, aux, nt = _blend_core(f, b.block_tile, b.num_blocks, scal,
                                 num_tiles, settings.tile_size, TW, params, bg)
        return c[:num_tiles].sum()
    blend_grad = jax.jit(jax.grad(blend_loss))
    print(f"blend fwd+bwd (pallas):  {timeit(blend_grad, feats):8.3f} ms")

    # pack + blend fwd+bwd together (the real per-iter op without binning)
    def iter_loss(c_, o_):
        f = pack_entries(pre, b, c_, o_)
        c, aux, nt = _blend_core(f, b.block_tile, b.num_blocks, scal,
                                 num_tiles, settings.tile_size, TW, params, bg)
        return c[:num_tiles].sum()
    iter_grad = jax.jit(jax.grad(iter_loss, argnums=(0, 1)))
    print(f"pack+blend fwd+bwd:      {timeit(iter_grad, colors, opac):8.3f} ms")

    # --- knn at densify shapes
    from dqo_map_tpu.ops.knn import knn
    qpts = means[:16384]
    valid = jnp.ones((P,), bool)
    knn_fn = jax.jit(lambda q_, c_, v_: knn(q_, c_, v_, k=4))
    print(f"knn 16384x{P} k=4:    {timeit(knn_fn, qpts, means, valid):8.3f} ms")

    # --- ICP at full res
    from dqo_map_tpu.slam.icp import IcpConfig, icp_pyramid
    from dqo_map_tpu.slam.tracker import preprocess_frame
    depth = jnp.asarray(1.0 + rng.uniform(0, 2, (H, W)), jnp.float32)
    color = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    K = jnp.asarray(cam.K, jnp.float32)
    pp_fn = lambda d, c: preprocess_frame(d, c, K, min_depth=0.1, max_depth=8.0)
    print(f"preprocess_frame:        {timeit(pp_fn, depth, color):8.3f} ms")
    fm = jax.block_until_ready(pp_fn(depth, color))
    cfg = IcpConfig()
    icp_fn = lambda vp, npr: icp_pyramid(vp, npr, vp, npr, K, cfg)
    print(f"icp_pyramid:             {timeit(icp_fn, fm['vertex_pyr'], fm['normal_pyr']):8.3f} ms")

    # pyramids alone (update_last_status path)
    from dqo_map_tpu.slam.tracker import build_pyramids
    bp = lambda d: build_pyramids(d, K, 3)
    print(f"build_pyramids:          {timeit(bp, depth):8.3f} ms")


if __name__ == "__main__":
    main()
