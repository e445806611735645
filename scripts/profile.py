"""Per-piece hot-path profiler, chain-difference edition (see tchain.py).

Re-measures the hot pieces at bench (office0) scale with the only timing
protocol that is reliable through the axon tunnel. Usage:

    python scripts/profile.py [n_alive]
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

N_ALIVE = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
W, H = 1200, 680
CAPACITY = 1 << 19
BUCKET = 1 << 18

from dqo_map_tpu.config import default_config  # noqa: E402
from dqo_map_tpu.models import gaussian_map as gm  # noqa: E402
from dqo_map_tpu.ops import binning as binning_mod  # noqa: E402
from dqo_map_tpu.ops.projection import preprocess  # noqa: E402
from dqo_map_tpu.ops.rasterize import (RenderSettings, entry_budget,  # noqa: E402
                                       eval_colors)


def dep(x, out):
    """Data-depend x on out without changing its value meaningfully."""
    s = jax.tree.leaves(out)[0].ravel()[:1].astype(jnp.float32) * 1e-24
    return x + s.astype(x.dtype)


def main():
    print(f"devices: {jax.devices()}  n_alive={N_ALIVE}")
    # PROFILE_ONLY=<substring> runs just the matching sections (each chain
    # pays its own compiles — filtering saves many minutes on the tunnel)
    global chain_time
    only = os.environ.get("PROFILE_ONLY")
    if only:
        _ct = chain_time

        def chain_time(name, *a, **k):  # noqa: F811
            if only not in name:
                return 0.0
            return _ct(name, *a, **k)
    rng = np.random.default_rng(0)

    fx = fy = 600.0
    K = jnp.asarray([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1]], jnp.float32)
    w2c = jnp.eye(4, dtype=jnp.float32)
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

    z = rng.uniform(0.8, 6.0, N_ALIVE).astype(np.float32)
    u = rng.uniform(40, W - 40, N_ALIVE).astype(np.float32)
    v = rng.uniform(40, H - 40, N_ALIVE).astype(np.float32)
    xyz = np.stack([(u - W / 2) / fx * z, (v - H / 2) / fy * z, z], -1)
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
    entry_cap, max_chunks = entry_budget(BUCKET, settings)
    print(f"entry budget: cap={entry_cap} max_chunks={max_chunks}")

    xyz_b = state.xyz[:BUCKET]
    sc_b = state.get_scaling()[:BUCKET]
    ro_b = state.get_rotation()[:BUCKET]
    op_b = state.get_opacity()[:BUCKET]
    sh_b = state.sh[:BUCKET]
    valid_b = (state.status[:BUCKET] != 0)

    # --- preprocess ---
    def pre_step(c, i):
        (x,) = c
        pre = preprocess(x, sc_b, ro_b, cam, 3.0, W, H)
        return (dep(x, pre.xy),)
    chain_time("preprocess (bucket)", pre_step, (xyz_b,))

    # --- eval_colors ---
    def col_step(c, i):
        (sh,) = c
        cl = eval_colors(sh, xyz_b, cam["cam_pos"], 3)
        return (dep(sh, cl),)
    chain_time("eval_colors SH3 (bucket)", col_step, (sh_b,))

    # --- binning ---
    from dqo_map_tpu.ops.blend_pallas import CHUNK
    pre0 = preprocess(xyz_b, sc_b, ro_b, cam, 3.0, W, H)
    pre0 = pre0._replace(valid=pre0.valid & valid_b,
                         radius=jnp.where(valid_b, pre0.radius, 0.0))

    def bin_step(c, i):
        (x,) = c
        pre = preprocess(x, sc_b, ro_b, cam, 3.0, W, H)
        pre = pre._replace(valid=pre.valid & valid_b,
                           radius=jnp.where(valid_b, pre.radius, 0.0))
        b = binning_mod.bin_gaussians(
            pre, W, H, settings.tile_size, settings.max_tiles_per_gaussian,
            None, align=CHUNK, entry_cap=entry_cap, max_chunks=max_chunks)
        return (dep(x, b.num_entries),)
    pre_ms = chain_time("preprocess alone (reference)", pre_step, (xyz_b,),
                        verbose=False)
    ms = chain_time("preprocess+binning", bin_step, (xyz_b,), verbose=False)
    print(f"{'bin_gaussians (minus preprocess)':46s} {ms - pre_ms:9.2f} ms/iter")

    b0 = binning_mod.bin_gaussians(
        pre0, W, H, settings.tile_size, settings.max_tiles_per_gaussian,
        None, align=CHUNK, entry_cap=entry_cap, max_chunks=max_chunks)
    ne = int(b0.num_entries)
    print(f"   entries={ne} blocks={int(b0.num_blocks)} dropped={int(b0.dropped)}")

    # --- pack ---
    from dqo_map_tpu.ops.blend_pallas import (BlendParams, _blend_core,
                                              pack_entries)
    colors0 = eval_colors(sh_b, xyz_b, cam["cam_pos"], 3)

    def pack_step(c, i):
        (cl,) = c
        feats = pack_entries(pre0, b0, cl, op_b)
        return (dep(cl, feats),)
    chain_time("pack_entries", pack_step, (colors0,))

    # --- blend fwd ---
    params = BlendParams(opaque_threshold=settings.opaque_threshold,
                         depth_threshold=settings.depth_threshold,
                         normal_threshold=settings.normal_threshold_cos,
                         T_threshold=settings.T_threshold)
    TH, TW = binning_mod.tile_grid_size(W, H, settings.tile_size)
    num_tiles = TH * TW
    scal = jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]).astype(jnp.float32)
    bg = (0.0, 0.0, 0.0)
    feats0 = pack_entries(pre0, b0, colors0, op_b)

    bgt0 = jnp.zeros((1, 1, 8), jnp.float32)

    def blend_step(c, i):
        (f,) = c
        color, aux, nt = _blend_core(f, b0.block_tile, b0.num_blocks, scal,
                                     bgt0, num_tiles, settings.tile_size, TW,
                                     params, bg, False)
        return (dep(f, color),)
    chain_time("blend fwd (pallas)", blend_step, (feats0,))

    def packvjp_step(c, i):
        (cl,) = c

        def loss(cc):
            return jnp.sum(pack_entries(pre0, b0, cc, op_b))
        g = jax.grad(loss)(cl)
        return (dep(cl, g),)
    chain_time("packvjp pack+scatter-back", packvjp_step, (colors0,))

    def blend_grad_step(c, i):
        (f,) = c
        def loss(ff):
            color, aux, nt = _blend_core(ff, b0.block_tile, b0.num_blocks,
                                         scal, bgt0, num_tiles,
                                         settings.tile_size, TW, params, bg,
                                         False)
            return jnp.sum(color[:, :, 0:4])
        g = jax.grad(loss)(f)
        return (dep(f, g),)
    chain_time("blend fwd+bwd (pallas grad)", blend_grad_step, (feats0,))

    # --- full render fwd ---
    from dqo_map_tpu.slam.renderer import render_state

    def render_step(c, i):
        st = state._replace(xyz=c[0])
        out = render_state(st, cam, settings, "global", bucket=BUCKET)
        return (dep(c[0], out["render"]),)
    chain_time("render_state fwd (full)", render_step, (state.xyz,), n1=2, n2=8)

    # --- render + loss grad ---
    from dqo_map_tpu.slam.mapper import get_params, set_params
    gt_color = jnp.zeros((H, W, 3))
    gt_depth = jnp.ones((H, W))

    def grad_step(c, i):
        p = dict(zip(sorted(c.keys()), [c[k] for k in sorted(c.keys())]))
        def loss_fn(p):
            st = set_params(state, p)
            out = render_state(st, cam, settings, "global", bucket=BUCKET)
            return (jnp.abs(out["render"] - gt_color).mean()
                    + jnp.abs(out["depth"] - gt_depth).mean()
                    + jnp.abs(out["normal"]).mean())
        g = jax.grad(loss_fn)(p)
        return {k: dep(v, g[k]) for k, v in p.items()}
    params_full = get_params(state)
    chain_time("render+loss grad (scan-iter core)", grad_step, params_full,
               n1=2, n2=8)

    # --- knn ---
    from dqo_map_tpu.ops.knn import knn
    newp = jnp.asarray(rng.uniform(-2, 2, (16384, 3)).astype(np.float32))

    def knn_step(c, i):
        (q,) = c
        d2, ix = knn(q, xyz_b, state.status[:BUCKET] == 1, k=3)
        return (dep(q, d2),)
    chain_time("knn 16k vs bucket", knn_step, (newp,))

    # --- fused knn2 (densify's one-pass coverage + scale-init search) ---
    from dqo_map_tpu.ops.knn import knn2
    cand = jnp.concatenate([newp, xyz_b])
    m_unst = jnp.concatenate([jnp.zeros(16384, bool),
                              state.status[:BUCKET] == 1])
    m_all = jnp.concatenate([jnp.ones(16384, bool),
                             state.status[:BUCKET] != 0])

    def knn2_step(c, i):
        (q,) = c
        (d2u, iu), (d2a, ia) = knn2(q, cand, m_unst, m_all, k=6)
        return (dep(q, d2a),)
    chain_time("knn2 fused 16k vs 16k+bucket", knn2_step, (newp,))

    # --- error accum ---
    from dqo_map_tpu.ops.error_accum import accumulate_gaussian_error
    cerr = jnp.ones((H, W)) * 0.1
    cidx = jnp.asarray(rng.integers(-1, N_ALIVE, (H, W)), jnp.int32)

    def ea_step(c, i):
        (ce,) = c
        out = accumulate_gaussian_error(CAPACITY, ce, ce, ce, cidx, cidx,
                                        0.1, 0.1, 0.1, True)
        return (dep(ce, out[0]),)
    chain_time("accumulate_gaussian_error", ea_step, (cerr,))

    # --- sample_pixels ---
    from dqo_map_tpu.utils import image as im
    mask_px = jnp.ones((H, W), jnp.float32)

    def sp_step(c, i):
        (m,) = c
        key = jax.random.key(0)
        idx2, val = im.sample_pixels(key, m > 0.5, 8192, jnp.int32(4000))
        return (dep(m, val),)
    chain_time("sample_pixels top_k 816k->8k", sp_step, (mask_px,))

    # --- adam over capacity ---
    from dqo_map_tpu.slam.mapper import (OPT_FIELDS, adam_init, adam_update)
    lrs = {k: 0.001 for k in OPT_FIELDS}
    opt_state = adam_init(params_full)
    mask = state.status == 1

    def adam_step(c, i):
        p = c
        g = jax.tree.map(lambda x: x * 1e-6, p)
        newp, _ = adam_update(p, g, opt_state, lrs, mask)
        return newp
    chain_time("adam_update (capacity 2^19)", adam_step, params_full)

    # --- coverage mask ---
    from dqo_map_tpu.ops.rasterize import coverage_tile_mask

    def cov_step(c, i):
        (x,) = c
        tm = coverage_tile_mask(x, sc_b, ro_b, cam, settings,
                                valid_mask=valid_b)
        return (dep(x, tm),)
    chain_time("coverage_tile_mask", cov_step, (xyz_b,))

    # --- bg local-optimize iteration (compact unstable + composite) ---
    # the round-4 hot path: per-iter render of ONLY the unstable substate,
    # composited over a frozen stable background (mapper.local_optimize_scan)
    UB = 1 << 16
    n_u = UB * 3 // 4
    sub = gm.empty_map(UB)
    sub = sub._replace(
        xyz=state.xyz[:UB], scaling=state.scaling[:UB],
        rotation=state.rotation[:UB], opacity=state.opacity[:UB],
        sh=state.sh[:UB],
        status=jnp.where(jnp.arange(UB) < n_u, 1, 0),
        count=jnp.int32(n_u))
    usettings = settings._replace(entry_cap=1 << 17)
    from dqo_map_tpu.slam.renderer import compute_binning_state, render_state
    ub = compute_binning_state(sub, cam, usettings, "global")
    bg_color = jnp.zeros((H, W, 3))
    bg_depth = jnp.full((H, W), 2.0)
    bg_normal = jnp.zeros((H, W, 3))
    bg_T = jnp.full((H, W), 0.1)
    gt_c = jnp.zeros((H, W, 3))
    gt_d = jnp.ones((H, W))

    def uiter_step(c, i):
        p = c

        def loss_fn(p):
            st = set_params_local(sub, p)
            u = render_state(st, cam, usettings, "global", binning=ub)
            hit = u["depth_index_map"] >= 0
            color = u["render"] + u["T_map"][..., None] * bg_color
            depth = jnp.where(hit, u["depth"], bg_depth)
            nrm = jnp.where(hit[..., None], u["normal"], bg_normal)
            return (jnp.abs(color - gt_c).mean()
                    + jnp.abs(depth - gt_d).mean() + jnp.abs(nrm).mean())
        g = jax.grad(loss_fn)(p)
        newp, _ = adam_update(p, g, usub_opt, {k: 1e-3 for k in p}, u_mask)
        return {k: dep(v, g[k]) for k, v in newp.items()}

    from dqo_map_tpu.slam.mapper import get_params as gp, set_params as \
        set_params_local_mod
    set_params_local = set_params_local_mod
    usub_params = gp(sub)
    usub_opt = adam_init(usub_params)
    u_mask = sub.status == 1
    chain_time("bg local-opt iter (64k unstable)", uiter_step, usub_params,
               n1=2, n2=8)

    # --- bench-shape local iteration, full loss vs raw-sum ablation ---
    # replicates mapper.compact_optimize_scan's step at the BENCH's static
    # shapes (ubucket 2^17 rows, uentry cap 2^20) to locate the per-iter
    # mass the piece chains don't explain
    from dqo_map_tpu.slam.mapper import compute_loss
    UB2 = 1 << 17
    n_u2 = 100_000
    sub2 = gm.empty_map(UB2)._replace(
        xyz=state.xyz[:UB2], scaling=state.scaling[:UB2],
        rotation=state.rotation[:UB2], opacity=state.opacity[:UB2],
        sh=state.sh[:UB2],
        status=jnp.where(jnp.arange(UB2) < n_u2, 1, 0),
        count=jnp.int32(n_u2))
    bsettings = settings._replace(entry_cap=1 << 20)
    ub2 = compute_binning_state(sub2, cam, bsettings, "global")
    print(f"   bench-shape sub entries={int(ub2.num_entries)} "
          f"demand={int(ub2.demand)}")
    bgm2 = {"S": jnp.zeros((H, W, 3)), "D": jnp.full((H, W), 1e30),
            "tau": jnp.ones((H, W))}
    image_input = {
        "color_map": jnp.zeros((H, W, 3)), "depth_map": jnp.ones((H, W)),
        "normal_map": jnp.zeros((H, W, 3)).at[..., 2].set(1.0),
        "render_mask": jnp.ones((H, W), bool),
    }
    weights = {"color": 0.8, "depth": 1.0, "normal": 0.0, "ssim": 0.0}
    init_stat2 = {k: gp(sub2)[k]
                  for k in ("opacity", "scaling", "xyz", "rotation")}
    vu2 = jnp.arange(UB2) < n_u2

    def bench_iter(c, i, full_loss):
        p = c

        def loss_fn(p):
            st = set_params_local(sub2, p)
            u = render_state(st, cam, bsettings, "global", binning=ub2,
                             bg_maps=bgm2)
            if not full_loss:
                return jnp.sum(u["render"]) + jnp.sum(u["depth"])
            hit_u = u["depth_index_map"] >= 0
            out = {
                "render": u["render"],
                "depth": jnp.where(hit_u, u["depth"], 1.0),
                "normal": u["normal"],
                "depth_index_map": u["depth_index_map"],
                "T_map": u["T_map"],
            }
            l, _ = compute_loss(out, image_input, p, init_stat2, vu2,
                                weights, 0.1, False)
            return l
        g = jax.grad(loss_fn)(p)
        newp, _ = adam_update(p, g, usub2_opt, {k: 1e-3 for k in p}, vu2)
        return {k: dep(v, g[k]) for k, v in newp.items()}

    import functools
    usub2_params = gp(sub2)
    usub2_opt = adam_init(usub2_params)
    chain_time("bench-shape iter RAW loss", 
               functools.partial(bench_iter, full_loss=False),
               usub2_params, n1=2, n2=8)
    chain_time("bench-shape iter FULL loss",
               functools.partial(bench_iter, full_loss=True),
               usub2_params, n1=2, n2=8)

    def bench_iter_parts(c, i, mode):
        p = c

        def loss_fn(p):
            st = set_params_local(sub2, p)
            u = render_state(st, cam, bsettings, "global", binning=ub2,
                             bg_maps=bgm2)
            rm = image_input["render_mask"]
            l = (jnp.abs(u["render"] - image_input["color_map"])
                 * rm[..., None]).sum() / rm.sum()
            if mode >= 1:       # + depth term with validity masks
                hit_u = u["depth_index_map"] >= 0
                derr = jnp.where(hit_u, u["depth"], 1.0)                     - image_input["depth_map"]
                vd = (hit_u & (image_input["depth_map"] > 0)
                      & (derr < 0.1) & rm)
                l = l + (jnp.abs(derr) * vd).sum() / jnp.maximum(
                    vd.sum(), 1)
            if mode >= 2:       # + attach anchor
                init_op = jax.nn.sigmoid(init_stat2["opacity"])
                am = (init_op < 0.9) & vu2
                for k in ("scaling", "xyz", "rotation"):
                    l = l + 1000.0 * ((p[k] - init_stat2[k]) ** 2
                                      * am[:, None]).sum() / jnp.maximum(
                        am.sum() * 3, 1)
            return l
        g = jax.grad(loss_fn)(p)
        newp, _ = adam_update(p, g, usub2_opt, {k: 1e-3 for k in p}, vu2)
        return {k: dep(v, g[k]) for k, v in newp.items()}

    for mode, name in ((0, "color-only"), (1, "color+depth"),
                       (2, "color+depth+attach")):
        chain_time(f"bench-shape iter {name}",
                   functools.partial(bench_iter_parts, mode=mode),
                   usub2_params, n1=2, n2=8)

    # --- densify_step at bench shapes -------------------------------------
    from dqo_map_tpu.slam.mapper import densify_step
    fm = {
        "depth_map": jnp.full((H, W), 2.0),
        "color_map": jnp.zeros((H, W, 3)),
        "vertex_map_w": jnp.zeros((H, W, 3)).at[..., 2].set(2.0),
        "normal_map_w": jnp.zeros((H, W, 3)).at[..., 2].set(1.0),
    }
    mm = {
        "T_map": jnp.full((H, W), 0.6), "depth": jnp.full((H, W), 2.0),
        "render": jnp.zeros((H, W, 3)),
        "depth_index_map": jnp.zeros((H, W), jnp.int32),
        "color_index_map": jnp.zeros((H, W), jnp.int32),
    }
    dcfg = (40800, 0.5, 1.0, 0.1, 0.1, 0.05, 0.99, 1.0, 1.0, 0.1,
            1.0, 0.001, 0.05)
    key0 = jax.random.key(0)

    def dens_step(c, i):
        (st_xyz,) = c
        st = state._replace(xyz=st_xyz)
        new_state, n_added = densify_step(
            st, fm, cam, mm, jnp.asarray(False), key0, jnp.int32(5),
            jnp.int32(5), settings, 16384, dcfg, bucket=BUCKET)
        return (dep(st_xyz, new_state.xyz),)
    chain_time("densify_step full (bench shapes)", dens_step, (state.xyz,),
               n1=2, n2=8)


if __name__ == "__main__":
    main()
