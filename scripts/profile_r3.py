"""Round-3 per-piece profiler at bench (office0) scale on the real chip.

Builds a realistic ~N-alive MapState (random in-frustum gaussians whose
projected extents match the bench's observed duplication) and times every
piece of the hot path separately:

  preprocess / eval_colors / binning / pack / blend fwd / blend bwd /
  full render fwd / render+loss value_and_grad / adam(capacity vs bucket) /
  sample_pixels / densify / error_accum / coverage mask

Usage:  python scripts/profile_r3.py [n_alive] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dqo_map_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

N_ALIVE = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
W, H = 1200, 680
CAPACITY = 1 << 19
BUCKET = 1 << 18

from dqo_map_tpu.config import default_config  # noqa: E402
from dqo_map_tpu.models import gaussian_map as gm  # noqa: E402
from dqo_map_tpu.ops import binning as binning_mod  # noqa: E402
from dqo_map_tpu.ops.projection import preprocess  # noqa: E402
from dqo_map_tpu.ops.rasterize import (RenderSettings, entry_budget,  # noqa: E402
                                       eval_colors)


def timeit(name, fn, *args, reps=REPS, **kw):
    out = fn(*args, **kw)          # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:42s} {ms:9.2f} ms")
    return out, ms


def main():
    print(f"devices: {jax.devices()}  n_alive={N_ALIVE}")
    rng = np.random.default_rng(0)

    # camera at origin looking +z; synthetic intrinsics like the bench
    fx = fy = 600.0
    K = jnp.asarray([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1]], jnp.float32)
    w2c = jnp.eye(4, dtype=jnp.float32)
    full_proj = jnp.asarray(
        [[2 * fx / W, 0, 0, 0], [0, 2 * fy / H, 0, 0],
         [0, 0, 1.001, -0.1], [0, 0, 1, 0]], jnp.float32).T
    # column-vector convention: full_proj rows consumed as M[r,:] . m
    znear, zfar = 0.01, 100.0
    P_mat = np.zeros((4, 4), np.float32)
    P_mat[0, 0] = 2 * fx / W
    P_mat[1, 1] = 2 * fy / H
    P_mat[2, 2] = zfar / (zfar - znear)
    P_mat[2, 3] = -(zfar * znear) / (zfar - znear)
    P_mat[3, 2] = 1.0
    full_proj = jnp.asarray(P_mat)
    cam = {"w2c": w2c, "full_proj": full_proj, "cam_pos": jnp.zeros(3),
           "K": K, "tan_fovx": jnp.float32(W / (2 * fx)),
           "tan_fovy": jnp.float32(H / (2 * fy))}

    # gaussians in frustum: z in [0.8, 6], xy within view, radius ~4-10 px
    z = rng.uniform(0.8, 6.0, N_ALIVE).astype(np.float32)
    u = rng.uniform(40, W - 40, N_ALIVE).astype(np.float32)
    v = rng.uniform(40, H - 40, N_ALIVE).astype(np.float32)
    x = (u - W / 2) / fx * z
    y = (v - H / 2) / fy * z
    xyz = np.stack([x, y, z], -1)
    # world scale s.t. projected radius ~ r_px: s = r_px * z / fx / 3 (3sigma)
    r_px = rng.uniform(3.0, 9.0, N_ALIVE).astype(np.float32)
    s = (r_px * z / fx / 3.0)
    scales = np.log(np.stack([s, s, s * 0.1], -1))
    q = rng.normal(size=(N_ALIVE, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    state = gm.empty_map(CAPACITY)
    idx = jnp.arange(N_ALIVE)
    state = state._replace(
        xyz=state.xyz.at[idx].set(jnp.asarray(xyz)),
        scaling=state.scaling.at[idx].set(jnp.asarray(scales)),
        rotation=state.rotation.at[idx].set(jnp.asarray(q)),
        opacity=state.opacity.at[idx].set(2.0),
        sh=state.sh.at[idx, 0].set(
            jnp.asarray(rng.uniform(0, 1, (N_ALIVE, 3)).astype(np.float32))),
        status=state.status.at[idx].set(
            jnp.asarray(rng.choice([1, 2], N_ALIVE, p=[0.3, 0.7]).astype(np.int32))),
        count=jnp.int32(N_ALIVE),
    )

    cfg = default_config(capacity=CAPACITY, initial_bucket=BUCKET)
    settings = RenderSettings.from_args(W, H, cfg.map)
    print(f"settings entry budget: {entry_budget(BUCKET, settings)}")

    # ---- pieces ---------------------------------------------------------
    xyz_b = state.xyz[:BUCKET]
    sc_b = state.get_scaling()[:BUCKET]
    ro_b = state.get_rotation()[:BUCKET]
    op_b = state.get_opacity()[:BUCKET]
    sh_b = state.sh[:BUCKET]
    valid_b = (state.status[:BUCKET] != 0)

    pre_fn = jax.jit(lambda x, s, r: preprocess(x, s, r, cam, 3.0, W, H))
    pre, _ = timeit("preprocess (bucket)", pre_fn, xyz_b, sc_b, ro_b)

    colors_fn = jax.jit(lambda sh, x: eval_colors(sh, x, cam["cam_pos"], 3))
    colors, _ = timeit("eval_colors SH3 (bucket)", colors_fn, sh_b, xyz_b)

    entry_cap, max_chunks = entry_budget(BUCKET, settings)
    from dqo_map_tpu.ops.blend_pallas import CHUNK

    bin_fn = jax.jit(lambda p: binning_mod.bin_gaussians(
        p, W, H, settings.tile_size, settings.max_tiles_per_gaussian,
        None, align=CHUNK, entry_cap=entry_cap, max_chunks=max_chunks))
    pre_v = pre._replace(valid=pre.valid & valid_b,
                         radius=jnp.where(valid_b, pre.radius, 0.0))
    b, _ = timeit("bin_gaussians (full)", bin_fn, pre_v)
    print(f"   entries={int(b.num_entries)} blocks={int(b.num_blocks)} "
          f"dropped={int(b.dropped)} cap={entry_cap}")

    # sort-only microbench at the slot_cap scale
    slot_cap = min(BUCKET * 16, 2 * entry_cap)
    keys = jnp.asarray(rng.integers(0, 2**31, slot_cap, dtype=np.int64),
                       jnp.uint32)
    vals = jnp.arange(slot_cap, dtype=jnp.int32)
    sort_fn = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
    timeit(f"lax.sort {slot_cap} slots", sort_fn, keys, vals)
    half = slot_cap // 2
    sort_fn2 = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
    timeit(f"lax.sort {half} slots", sort_fn2, keys[:half], vals[:half])

    from dqo_map_tpu.ops.blend_pallas import (BlendParams, _blend_core,
                                              pack_entries)
    pack_fn = jax.jit(pack_entries)
    feats, _ = timeit("pack_entries (gather 16 x cap)", pack_fn,
                      pre_v, b, colors, op_b)

    params = BlendParams(opaque_threshold=settings.opaque_threshold,
                         depth_threshold=settings.depth_threshold,
                         normal_threshold=settings.normal_threshold_cos,
                         T_threshold=settings.T_threshold)
    TH, TW = binning_mod.tile_grid_size(W, H, settings.tile_size)
    num_tiles = TH * TW
    scal = jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2]])
    bg = (0.0, 0.0, 0.0)

    blend_fn = jax.jit(lambda f, bt, nb: _blend_core(
        f, bt, nb, scal, num_tiles, settings.tile_size, TW, params, bg))
    timeit("blend fwd (pallas)", blend_fn, feats, b.block_tile, b.num_blocks)

    def blend_loss(f, bt, nb):
        color, aux, nt = _blend_core(f, bt, nb, scal, num_tiles,
                                     settings.tile_size, TW, params, bg)
        return jnp.sum(color[:, :, 0:4])
    blend_g = jax.jit(jax.grad(blend_loss))
    timeit("blend fwd+bwd (pallas grad)", blend_g, feats, b.block_tile,
           b.num_blocks)

    # full render fwd
    from dqo_map_tpu.slam.renderer import render_state
    rf = jax.jit(lambda st: render_state(st, cam, settings, "global",
                                         bucket=BUCKET))
    timeit("render_state fwd (full)", rf, state)

    # render + loss grad wrt params (the scan iteration core)
    from dqo_map_tpu.slam.mapper import (OPT_FIELDS, adam_init, adam_update,
                                         get_params, set_params)

    gt_color = jnp.zeros((H, W, 3))
    gt_depth = jnp.ones((H, W))

    def loss_fn(p, st):
        st = set_params(st, p)
        out = render_state(st, cam, settings, "global", bucket=BUCKET)
        return (jnp.abs(out["render"] - gt_color).mean()
                + jnp.abs(out["depth"] - gt_depth).mean()
                + jnp.abs(out["normal"]).mean())

    grad_fn = jax.jit(lambda p, st: jax.value_and_grad(loss_fn)(p, st))
    params_full = get_params(state)
    timeit("render+loss value_and_grad", grad_fn, params_full, state)

    # adam over capacity vs bucket
    lrs = {k: 0.001 for k in OPT_FIELDS}
    opt_state = adam_init(params_full)
    mask = state.status == 1
    adam_fn = jax.jit(lambda p, g, s, m: adam_update(p, g, s, lrs, m))
    g_full = jax.tree.map(jnp.ones_like, params_full)
    timeit("adam_update (capacity 2^19)", adam_fn, params_full, g_full,
           opt_state, mask)
    params_b = {k: v[:BUCKET] for k, v in params_full.items()}
    opt_b = adam_init(params_b)
    g_b = jax.tree.map(jnp.ones_like, params_b)
    timeit("adam_update (bucket 2^18)", adam_fn, params_b, g_b, opt_b,
           mask[:BUCKET])

    # sample_pixels
    from dqo_map_tpu.utils import image as im
    key = jax.random.key(0)
    mask_px = jnp.ones((H, W), bool)
    sp = jax.jit(lambda k, m: im.sample_pixels(k, m, 8192, jnp.int32(4000)))
    timeit("sample_pixels top_k 816k->8k", sp, key, mask_px)

    # error accum
    from dqo_map_tpu.ops.error_accum import accumulate_gaussian_error
    cerr = jnp.ones((H, W)) * 0.1
    cidx = jnp.asarray(rng.integers(-1, N_ALIVE, (H, W)), jnp.int32)
    ea = jax.jit(lambda ce, ci: accumulate_gaussian_error(
        CAPACITY, ce, ce, ce, ci, ci, 0.1, 0.1, 0.1, True))
    timeit("accumulate_gaussian_error", ea, cerr, cidx)

    # coverage tile mask
    from dqo_map_tpu.ops.rasterize import coverage_tile_mask
    cov = jax.jit(lambda x, s, r, v: coverage_tile_mask(
        x, s, r, cam, settings, valid_mask=v))
    timeit("coverage_tile_mask", cov, xyz_b, sc_b, ro_b, valid_b)

    # n_touched scatter
    nte = jnp.ones((entry_cap,), jnp.int32)
    ns = jax.jit(lambda pl_, nt, ev: jnp.zeros((BUCKET,), jnp.int32)
                 .at[pl_].add(jnp.where(ev, nt, 0)))
    timeit("n_touched scatter (cap->bucket)", ns, b.point_list, nte,
           b.entry_valid)

    # KNN (densify filter)
    from dqo_map_tpu.ops.knn import knn
    newp = jnp.asarray(rng.uniform(-2, 2, (16384, 3)).astype(np.float32))
    knn_fn = jax.jit(lambda n, x, v: knn(n, x, v, k=3))
    timeit("knn 16k vs bucket", knn_fn, newp, xyz_b,
           state.status[:BUCKET] == 1)


if __name__ == "__main__":
    main()
