"""Tile-space iteration decomposition v2 — find the real 94 ms/iter mass.

Measures, at bench local-scan shapes (64k unstable sub, ~293k entries,
1M static cap): blend kernel alone (fwd, fwd+bwd, with/without bg operand),
pack+VJP, full tiled render fwd, tiled render fwd+bwd raw-sum, + composite
+ loss, + adam. The deltas attribute the per-iter mass.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dqo_map_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from tchain import chain_time  # noqa: E402

from dqo_map_tpu.config import default_config  # noqa: E402
from dqo_map_tpu.models import gaussian_map as gm  # noqa: E402
from dqo_map_tpu.ops import binning as binning_mod  # noqa: E402
from dqo_map_tpu.ops.blend_pallas import (BlendParams, _blend_core,  # noqa: E402
                                          pack_bg_tiled, pack_entries)
from dqo_map_tpu.ops.projection import preprocess  # noqa: E402
from dqo_map_tpu.ops.rasterize import (RenderSettings, compute_binning,  # noqa: E402
                                       eval_colors)
from dqo_map_tpu.slam.mapper import (adam_init, adam_update, compute_loss,  # noqa: E402
                                     get_params, set_params)
from dqo_map_tpu.slam.renderer import render_state  # noqa: E402

N_UNSTABLE = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000
W, H = 1200, 680
UBUCKET = 1 << 17
UENTRY = 1 << 20


def dep(x, out):
    s = jax.tree.leaves(out)[0].ravel()[:1].astype(jnp.float32) * 1e-24
    return x + s.astype(x.dtype)


def main():
    print(f"devices: {jax.devices()}  n_unstable={N_UNSTABLE}")
    only = os.environ.get("PROFILE_ONLY", "")

    def run(name, *a, **k):
        if only and only not in name:
            return
        chain_time(name, *a, **k)

    rng = np.random.default_rng(0)
    fx = fy = 600.0
    K = jnp.asarray([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1]], jnp.float32)
    P_mat = np.zeros((4, 4), np.float32)
    P_mat[0, 0] = 2 * fx / W
    P_mat[1, 1] = 2 * fy / H
    P_mat[2, 2] = 100.0 / 99.99
    P_mat[2, 3] = -1.0 / 99.99
    P_mat[3, 2] = 1.0
    cam = {"w2c": jnp.eye(4, dtype=jnp.float32),
           "full_proj": jnp.asarray(P_mat), "cam_pos": jnp.zeros(3),
           "K": K, "tan_fovx": jnp.float32(W / (2 * fx)),
           "tan_fovy": jnp.float32(H / (2 * fy))}

    z = rng.uniform(0.8, 6.0, N_UNSTABLE).astype(np.float32)
    u = rng.uniform(40, W - 40, N_UNSTABLE).astype(np.float32)
    v = rng.uniform(40, H - 40, N_UNSTABLE).astype(np.float32)
    xyz = np.stack([(u - W / 2) / fx * z, (v - H / 2) / fy * z, z], -1)
    r_px = rng.uniform(6.0, 16.0, N_UNSTABLE).astype(np.float32)
    s = (r_px * z / fx / 3.0)
    scales = np.log(np.stack([s, s, s * 0.1], -1))
    q = rng.normal(size=(N_UNSTABLE, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    sub = gm.empty_map(UBUCKET)
    idx = jnp.arange(N_UNSTABLE)
    sub = sub._replace(
        xyz=sub.xyz.at[idx].set(jnp.asarray(xyz)),
        scaling=sub.scaling.at[idx].set(jnp.asarray(scales)),
        rotation=sub.rotation.at[idx].set(jnp.asarray(q)),
        opacity=sub.opacity.at[idx].set(2.0),
        sh=sub.sh.at[idx, 0].set(jnp.asarray(
            rng.uniform(0, 1, (N_UNSTABLE, 3)).astype(np.float32))),
        status=sub.status.at[idx].set(1),
        count=jnp.int32(N_UNSTABLE),
    )

    cfg = default_config(capacity=UBUCKET, initial_bucket=UBUCKET)
    usettings = RenderSettings.from_args(W, H, cfg.map)._replace(
        entry_cap=UENTRY)
    ts = usettings.tile_size
    TH, TW = binning_mod.tile_grid_size(W, H, ts)
    num_tiles = TH * TW
    n_px = ts * ts

    tm = jnp.ones((TH, TW), jnp.int32)
    b0 = compute_binning(sub.xyz, sub.get_scaling(), sub.get_rotation(), cam,
                         usettings, tile_mask=tm, valid_mask=sub.status != 0)
    print(f"entries={int(b0.num_entries)} demand={int(b0.demand)} "
          f"blocks={int(b0.num_blocks)}", flush=True)

    # tiled bg + gt
    S_t = jnp.asarray(rng.uniform(0, 1, (num_tiles, n_px, 3)).astype(
        np.float32))
    D_t = jnp.full((num_tiles, n_px), 3.0, jnp.float32)
    tau_t = jnp.full((num_tiles, n_px), 0.05, jnp.float32)
    bgt = pack_bg_tiled(S_t, D_t, tau_t)
    bg = {"render": S_t, "depth": D_t,
          "normal": jnp.zeros((num_tiles, n_px, 3), jnp.float32),
          "T_map": tau_t,
          "depth_index_map": jnp.zeros((num_tiles, n_px), jnp.int32)}
    gt = {"color_map": jnp.asarray(
              rng.uniform(0, 1, (num_tiles, n_px, 3)).astype(np.float32)),
          "depth_map": jnp.full((num_tiles, n_px), 2.5, jnp.float32),
          "normal_map": jnp.zeros((num_tiles, n_px, 3), jnp.float32),
          "render_mask": jnp.ones((num_tiles, n_px), bool)}
    weights = {"depth": 1.0, "normal": 0.0, "color": 1.0, "ssim": 0.0}

    params0 = get_params(sub)
    init_stat = {k: params0[k]
                 for k in ("opacity", "scaling", "xyz", "rotation")}
    opt_state0 = adam_init(params0)
    valid_u = jnp.arange(UBUCKET) < N_UNSTABLE
    lrs = {"xyz": 1e-4, "sh": 2.5e-3, "opacity": 0.05, "scaling": 5e-3,
           "rotation": 1e-3, "sem_rgb": 0.0}

    # ---------- kernel alone ----------
    params_bl = BlendParams(
        opaque_threshold=usettings.opaque_threshold,
        depth_threshold=usettings.depth_threshold,
        normal_threshold=usettings.normal_threshold_cos,
        T_threshold=usettings.T_threshold)
    scal = jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]).astype(jnp.float32)
    pre0 = preprocess(sub.xyz, sub.get_scaling(), sub.get_rotation(), cam,
                      usettings.color_sigma, W, H)
    colors0 = eval_colors(sub.sh, sub.xyz, cam["cam_pos"], 3)
    op0 = sub.get_opacity()
    feats0 = pack_entries(pre0, b0, colors0, op0)
    bg3 = (0.0, 0.0, 0.0)
    bgt0 = jnp.zeros((1, 1, 8), jnp.float32)

    for wb, bgt_use, tag in ((False, bgt0, "nobg"), (True, bgt, "bg")):
        def bf(c, i, wb=wb, bgt_use=bgt_use):
            color, aux, nt = _blend_core(
                c[0], b0.block_tile, b0.num_blocks, scal, bgt_use,
                num_tiles, ts, TW, params_bl, bg3, wb)
            return (dep(c[0], color),)

        run(f"blend fwd [{tag}]", bf, (feats0,))

        def bg_(c, i, wb=wb, bgt_use=bgt_use):
            def loss(ff):
                color, aux, nt = _blend_core(
                    ff, b0.block_tile, b0.num_blocks, scal, bgt_use,
                    num_tiles, ts, TW, params_bl, bg3, wb)
                return jnp.sum(color[:, :, 0:4])
            g = jax.grad(loss)(c[0])
            return (dep(c[0], g),)

        run(f"blend fwd+bwd [{tag}]", bg_, (feats0,))

    def packvjp(c, i):
        def loss(cc):
            return jnp.sum(pack_entries(pre0, b0, cc, op0))
        g = jax.grad(loss)(c[0])
        return (dep(c[0], g),)

    run("pack+VJP", packvjp, (colors0,))

    # ---------- full tiled render ----------
    def fwd_t(c, i):
        st = set_params(sub, c[0])
        u_ = render_state(st, cam, usettings, "global", binning=b0,
                          bg_tiled=bgt, tiled=True)
        return ({k: dep(v, u_["render"]) for k, v in c[0].items()},)

    run("tiled render fwd (bg)", fwd_t, (params0,), n1=2, n2=8)

    def make_iter(with_loss, with_bg):
        def step(c, i):
            params, opt_state = c

            def loss_fn(p):
                st = set_params(sub, p)
                u_ = render_state(st, cam, usettings, "global", binning=b0,
                                  bg_tiled=(bgt if with_bg else None),
                                  tiled=True)
                if not with_loss:
                    return (jnp.sum(u_["render"]) + jnp.sum(u_["depth"])
                            + jnp.sum(u_["normal"])), {}
                hit_u = u_["depth_index_map"] >= 0
                hit_bg = bg["depth_index_map"] >= 0
                u_wins = hit_u & ((~hit_bg) | (u_["depth"] <= bg["depth"]))
                out = {
                    "render": u_["render"],
                    "depth": jnp.where(u_wins, u_["depth"], bg["depth"]),
                    "normal": jnp.where(u_wins[..., None], u_["normal"],
                                        bg["normal"]),
                    "depth_index_map": jnp.where(
                        u_wins, u_["depth_index_map"],
                        bg["depth_index_map"]),
                    "T_map": u_["T_map"] * bg["T_map"],
                }
                return compute_loss(out, gt, p, init_stat, valid_u,
                                    weights, 0.1, False)

            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            params, opt_state = adam_update(params, grads, opt_state, lrs,
                                           valid_u)
            return (params, opt_state)
        return step

    carry0 = (params0, opt_state0)
    run("tiled FULL iter (bg+loss+adam)", make_iter(True, True), carry0,
        n1=2, n2=8)
    run("tiled raw-sum iter (bg)", make_iter(False, True), carry0,
        n1=2, n2=8)
    run("tiled raw-sum iter (nobg)", make_iter(False, False), carry0,
        n1=2, n2=8)


if __name__ == "__main__":
    main()
