"""Dump + summarize the optimized (scheduled) HLO of the compact local-scan
iteration — finds what XLA actually runs between the Pallas calls.

Usage: python scripts/hlo_iter.py [full|raw] > /tmp/hlo_iter.txt
"""

import os
import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dqo_map_tpu.config import default_config
from dqo_map_tpu.models import gaussian_map as gm
from dqo_map_tpu.ops import binning as binning_mod
from dqo_map_tpu.ops.blend_pallas import pack_bg_tiled
from dqo_map_tpu.ops.rasterize import RenderSettings, compute_binning
from dqo_map_tpu.slam.mapper import (adam_init, adam_update, compute_loss,
                                     get_params, set_params)
from dqo_map_tpu.slam.renderer import render_state

MODE = sys.argv[1] if len(sys.argv) > 1 else "full"
N_UNSTABLE = 64_000
W, H = 1200, 680
UBUCKET = 1 << 17
UENTRY = 1 << 19


def main():
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
        entry_cap=UENTRY, chunk=128)
    ts = usettings.tile_size
    TH, TW = binning_mod.tile_grid_size(W, H, ts)
    num_tiles = TH * TW
    n_px = ts * ts
    tm = jnp.ones((TH, TW), jnp.int32)
    b0 = compute_binning(sub.xyz, sub.get_scaling(), sub.get_rotation(), cam,
                         usettings, tile_mask=tm, valid_mask=sub.status != 0)

    S_t = jnp.asarray(rng.uniform(0, 1, (num_tiles, n_px, 3)).astype(
        np.float32))
    D_t = jnp.full((num_tiles, n_px), 3.0, jnp.float32)
    tau_t = jnp.full((num_tiles, n_px), 0.05, jnp.float32)
    bgt = pack_bg_tiled(S_t, D_t, tau_t)
    bg = {"render": S_t, "depth": D_t,
          "normal": jnp.zeros((num_tiles, n_px, 3), jnp.float32),
          "T_map": tau_t,
          "depth_index_map": jnp.zeros((num_tiles, n_px), jnp.int32)}
    gt = {"color_map": S_t,
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

    def one_iter(params, opt_state):
        def loss_fn(p):
            st = set_params(sub, p)
            u_ = render_state(st, cam, usettings, "global", binning=b0,
                              bg_tiled=bgt, tiled=True)
            if MODE == "raw":
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
                "depth_index_map": jnp.where(u_wins, u_["depth_index_map"],
                                             bg["depth_index_map"]),
                "T_map": u_["T_map"] * bg["T_map"],
            }
            return compute_loss(out, gt, params0 | p, init_stat, valid_u,
                                weights, 0.1, False)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        params, opt_state = adam_update(params, grads, opt_state, lrs,
                                        valid_u)
        return params, opt_state

    lowered = jax.jit(one_iter).lower(params0, opt_state0)
    comp = lowered.compile()
    try:
        ca = comp.cost_analysis()
        print("# cost_analysis:", file=sys.stderr)
        for k in ("flops", "bytes accessed", "optimal_seconds",
                  "transcendentals"):
            if k in ca:
                print(f"#   {k}: {ca[k]:.4g}", file=sys.stderr)
    except Exception as e:
        print("# cost_analysis failed:", e, file=sys.stderr)
    txt = comp.as_text()
    print(f"# HLO text: {len(txt)} chars", file=sys.stderr)

    # summarize: opcode counts + biggest tensors by element count
    op_counts = Counter()
    big = defaultdict(int)
    for m in re.finditer(r"^\s*(?:ROOT )?[%\w.\-]+ = (\w+)\[([\d,]*)\]"
                         r"[^ ]* (\w+)", txt, re.M):
        dtype, shape_s, opcode = m.groups()
        op_counts[opcode] += 1
        if shape_s:
            try:
                n = 1
                for d in shape_s.split(","):
                    n *= int(d)
            except ValueError:
                continue
            if n >= (1 << 20):
                big[(opcode, dtype, shape_s)] += 1
    print("# opcode counts (top 30):", file=sys.stderr)
    for op, c in op_counts.most_common(30):
        print(f"#   {op}: {c}", file=sys.stderr)
    print("# ops producing >=1M-element tensors:", file=sys.stderr)
    for (op, dt, sh), c in sorted(big.items(), key=lambda kv: -kv[1])[:40]:
        print(f"#   {c:4d} x {op} {dt}[{sh}]", file=sys.stderr)
    print(txt)


if __name__ == "__main__":
    main()
