"""Local-optimize ITERATION decomposition at bench shapes (chain-difference).

The optimize frame is 50 x this iteration; r04 measured 97.5 ms full /
76.1 raw-sum / 16.9 pack+VJP. This script reproduces the exact compact
local-scan iteration (131k substate, bg composite, full compute_loss, adam)
and its pieces to target the round-5 <=40 ms/iter goal.

Usage: python scripts/profile_iter.py [n_unstable] (default 64k)
PROFILE_ONLY=<substr> filters sections.
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
from dqo_map_tpu.ops.rasterize import (RenderSettings, compute_binning,  # noqa: E402
                                       entry_budget)
from dqo_map_tpu.slam.mapper import (adam_init, adam_update, compute_loss,  # noqa: E402
                                     get_params, set_params)
from dqo_map_tpu.slam.renderer import render_state  # noqa: E402

N_UNSTABLE = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000
W, H = 1200, 680
UBUCKET = 1 << 17          # bench ubucket
UENTRY = 1 << 20           # bench uentry rung


def dep(x, out):
    s = jax.tree.leaves(out)[0].ravel()[:1].astype(jnp.float32) * 1e-24
    return x + s.astype(x.dtype)


def main():
    print(f"devices: {jax.devices()}  n_unstable={N_UNSTABLE}")
    only = os.environ.get("PROFILE_ONLY", "")

    def run(name, *a, **k):
        if only and only not in name:
            return None
        return chain_time(name, *a, **k)

    rng = np.random.default_rng(0)
    fx = fy = 600.0
    K = jnp.asarray([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1]], jnp.float32)
    P_mat = np.zeros((4, 4), np.float32)
    P_mat[0, 0] = 2 * fx / W
    P_mat[1, 1] = 2 * fy / H
    P_mat[2, 2] = 100.0 / (100.0 - 0.01)
    P_mat[2, 3] = -(100.0 * 0.01) / (100.0 - 0.01)
    P_mat[3, 2] = 1.0
    cam = {"w2c": jnp.eye(4, dtype=jnp.float32),
           "full_proj": jnp.asarray(P_mat), "cam_pos": jnp.zeros(3),
           "K": K, "tan_fovx": jnp.float32(W / (2 * fx)),
           "tan_fovy": jnp.float32(H / (2 * fy))}

    # unstable-like cloud: young gaussians are big (r04: 64k rows -> ~350k
    # entries, ~5.5 tiles each)
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
    TH, TW = binning_mod.tile_grid_size(W, H, usettings.tile_size)
    cap, mc = entry_budget(UBUCKET, usettings)
    print(f"entry budget: cap={cap} max_chunks={mc}")

    tm = jnp.ones((TH, TW), jnp.int32)
    b0 = compute_binning(sub.xyz, sub.get_scaling(), sub.get_rotation(), cam,
                         usettings, tile_mask=tm,
                         valid_mask=sub.status != 0)
    print(f"entries={int(b0.num_entries)} demand={int(b0.demand)} "
          f"blocks={int(b0.num_blocks)} dropped={int(b0.dropped)}")

    # bg maps (stable background composite inputs)
    bgm = {
        "S": jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32)),
        "D": jnp.full((H, W), 3.0, jnp.float32),
        "tau": jnp.full((H, W), 0.05, jnp.float32),
    }
    gt_color = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    gt_depth = jnp.full((H, W), 2.5, jnp.float32)
    gt_normal = jnp.zeros((H, W, 3), jnp.float32).at[..., 2].set(-1.0)
    rmask = jnp.ones((H, W), bool)
    image_input = {"color_map": gt_color, "depth_map": gt_depth,
                   "normal_map": gt_normal, "render_mask": rmask}
    weights = {"depth": 1.0, "normal": 0.0, "color": 1.0, "ssim": 0.0}

    params0 = get_params(sub)
    init_stat = {k: params0[k]
                 for k in ("opacity", "scaling", "xyz", "rotation")}
    opt_state0 = adam_init(params0)
    valid_u = jnp.arange(UBUCKET) < N_UNSTABLE
    lrs = {"xyz": 1e-4, "sh": 2.5e-3, "opacity": 0.05, "scaling": 5e-3,
           "rotation": 1e-3, "sem_rgb": 0.0}

    bg_full = {"render": bgm["S"], "depth": bgm["D"],
               "normal": gt_normal, "T_map": bgm["tau"],
               "T_final": bgm["tau"],
               "depth_index_map": jnp.zeros((H, W), jnp.int32)}

    def make_iter(with_loss, with_bg, with_adam=True):
        def it_step(carry, i):
            params, opt_state = carry

            def loss_fn(p):
                st = set_params(sub, p)
                u_ = render_state(
                    st, cam, usettings, "global", binning=b0,
                    bg_maps=({"S": bg_full["render"],
                              "D": jnp.where(
                                  bg_full["depth_index_map"] >= 0,
                                  bg_full["depth"], jnp.float32(1e30)),
                              "tau": bg_full["T_final"]} if with_bg
                             else None))
                if not with_loss:
                    return (jnp.sum(u_["render"]) + jnp.sum(u_["depth"])
                            + jnp.sum(u_["normal"])), {}
                bg = bg_full
                hit_u = u_["depth_index_map"] >= 0
                hit_bg = bg["depth_index_map"] >= 0
                u_wins = hit_u & ((~hit_bg) | (u_["depth"] <= bg["depth"]))
                out = {
                    "render": u_["render"],
                    "depth": jnp.where(u_wins, u_["depth"], bg["depth"]),
                    "normal": jnp.where(u_wins[..., None], u_["normal"],
                                        bg["normal"]),
                    "depth_index_map": jnp.where(u_wins,
                                                 u_["depth_index_map"],
                                                 bg["depth_index_map"]),
                    "T_map": u_["T_map"] * bg["T_map"],
                }
                return compute_loss(out, image_input, p, init_stat, valid_u,
                                    weights, 0.1, False)

            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            if with_adam:
                params, opt_state = adam_update(params, grads, opt_state,
                                                lrs, valid_u)
            else:
                params = {k: dep(v, grads[k]) for k, v in params.items()}
            return (params, opt_state), None

        def step(c, i):
            (p, o), _ = it_step((c[0], c[1]), i)
            return (p, o)
        return step

    carry0 = (params0, opt_state0)

    run("FULL iter (bg composite + loss + adam)", make_iter(True, True),
        carry0, n1=2, n2=8)
    run("iter raw-sum loss (no composite/loss)", make_iter(False, True),
        carry0, n1=2, n2=8)
    run("iter raw-sum, NO bg", make_iter(False, False), carry0, n1=2, n2=8)

    # render fwd only at these shapes
    def fwd_step(c, i):
        st = set_params(sub, c[0])
        u_ = render_state(st, cam, usettings, "global", binning=b0,
                          bg_maps={"S": bg_full["render"], "D": bg_full["depth"],
                                   "tau": bg_full["T_final"]})
        return ({k: dep(v, u_["render"]) for k, v in c[0].items()},)

    run("render fwd (bg)", fwd_step, (params0,), n1=2, n2=8)

    # loss alone given fixed maps (cost of compute_loss + composite VJP-free)
    maps0 = None
    if not only or "loss alone" in "loss alone":
        st0 = set_params(sub, params0)
        maps0 = render_state(st0, cam, usettings, "global", binning=b0)

    def loss_step(c, i):
        out = {"render": maps0["render"] + c[0] * 1e-24,
               "depth": maps0["depth"], "normal": maps0["normal"],
               "depth_index_map": maps0["depth_index_map"],
               "T_map": maps0["T_map"]}
        l, _ = compute_loss(out, image_input, params0, init_stat, valid_u,
                            weights, 0.1, False)
        return (c[0] + l * 1e-24,)

    run("compute_loss fwd alone (fixed maps)", loss_step,
        (jnp.zeros((1,), jnp.float32),), n1=4, n2=16)

    # pack at the two candidate caps
    from dqo_map_tpu.ops.blend_pallas import pack_entries
    from dqo_map_tpu.ops.projection import preprocess as pre_fn
    from dqo_map_tpu.ops.rasterize import eval_colors
    pre0 = pre_fn(sub.xyz, sub.get_scaling(), sub.get_rotation(), cam,
                  usettings.color_sigma, W, H)
    colors0 = eval_colors(sub.sh, sub.xyz, cam["cam_pos"], 3)
    op0 = sub.get_opacity()

    def packvjp_step(c, i):
        (cl,) = c

        def loss(cc):
            return jnp.sum(pack_entries(pre0, b0, cc, op0))
        g = jax.grad(loss)(cl)
        return (dep(cl, g),)

    run(f"pack+VJP at cap {b0.point_list.shape[0]}", packvjp_step, (colors0,))

    # adam alone
    def adam_step(c, i):
        p, o = adam_update(c[0], c[0], c[1], lrs, valid_u)
        return (p, o)

    run("adam_update alone", adam_step, carry0, n1=4, n2=16)


if __name__ == "__main__":
    main()
