"""Trustworthy per-stage TPU profile via MARGINAL cost inside one jit.

The axon tunnel makes naive timing lie: dispatch roundtrip is ~24 ms, D2H
readback 60-450 ms, and block_until_ready-based loops can report ~0 ms for
repeat calls. So every number here is the SLOPE between running an op
`n_hi` times and once, inside a single jitted lax.scan whose carry threads a
perturbation through every iteration (nothing can be cached, deduped, or
overlapped away), synced by a host readback of a scalar that depends on the
final carry.

Run: python scripts/profile_stages.py  [stage ...]
Stages: binning pack blend blend_bwd render opt densify finalize icp
Env: PROF_P (default 262144), PROF_ENTRY_SCALE synthetic scene density.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def marginal(make_scan, n_hi=8, reps=3):
    """make_scan(n) -> jitted callable returning a scalar. Times slope."""
    f1 = make_scan(1)
    fn = make_scan(n_hi)
    _ = float(f1())
    _ = float(fn())

    def run(f):
        best = 1e18
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(f())
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tn = run(f1), run(fn)
    return (tn - t1) / (n_hi - 1) * 1000.0


def make_scene(P, W, H, seed=0):
    rng = np.random.default_rng(seed)
    means = np.stack([
        rng.uniform(-2, 2, P), rng.uniform(-1.4, 1.4, P),
        rng.uniform(0.8, 6.0, P)], -1).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(0.005), np.log(0.04), (P, 3))).astype(np.float32)
    scales[:, 2] *= 0.1
    q = rng.normal(size=(P, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.99, P).astype(np.float32)
    colors = rng.uniform(0, 1, (P, 3)).astype(np.float32)
    return means, scales, q, opac, colors


def main():
    want = set(sys.argv[1:]) or {
        "binning", "pack", "blend", "blend_bwd", "render", "opt", "densify"}
    P = int(os.environ.get("PROF_P", 262144))
    W, H = 1200, 680

    from dqo_map_tpu.models.cameras import Camera
    from dqo_map_tpu.ops import binning as binning_mod
    from dqo_map_tpu.ops.blend_pallas import (CHUNK, blend_tiles_pallas,
                                              pack_entries)
    from dqo_map_tpu.ops.projection import preprocess
    from dqo_map_tpu.ops.rasterize import RenderSettings
    from dqo_map_tpu.ops.blend import BlendParams

    cam = Camera(uid=0, c2w=np.eye(4), fx=0.9 * W, fy=0.9 * W, cx=W / 2,
                 cy=H / 2, width=W, height=H)
    cam_in = cam.render_inputs()
    settings = RenderSettings(width=W, height=H)
    ts = settings.tile_size
    TH, TW = binning_mod.tile_grid_size(W, H, ts)
    num_tiles = TH * TW
    worst = P * settings.max_tiles_per_gaussian + num_tiles * CHUNK
    entry_cap = min(settings.entry_cap, ((worst + CHUNK - 1) // CHUNK) * CHUNK)
    max_chunks = max(1, min(settings.max_chunks_per_tile, entry_cap // CHUNK))

    means, scales, q, opac, colors = map(jnp.asarray, make_scene(P, W, H))
    normal_w = means / jnp.linalg.norm(means, axis=1, keepdims=True)

    pre_fn = jax.jit(lambda m, s, r: preprocess(
        m, s, r, cam_in, settings.color_sigma, W, H, 1.0))
    pre = jax.block_until_ready(pre_fn(means, scales, q))
    bin_fn = lambda pre: binning_mod.bin_gaussians(
        pre, W, H, ts, settings.max_tiles_per_gaussian, None,
        align=CHUNK, entry_cap=entry_cap, max_chunks=max_chunks)
    b0 = jax.jit(bin_fn)(pre)
    print(f"backend={jax.default_backend()} P={P} {W}x{H} "
          f"entry_cap={entry_cap} num_entries={int(b0.num_entries)} "
          f"num_blocks={int(b0.num_blocks)} dropped={int(b0.dropped)}")

    if "binning" in want:
        def mk(n):
            @jax.jit
            def f():
                def body(c, _):
                    p = pre._replace(xy=pre.xy + c)
                    b = bin_fn(p)
                    return (c + 1e-6 * b.num_entries.astype(jnp.float32),
                            None)
                c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                return c
            return f
        print(f"binning:        {marginal(mk):8.2f} ms")

    if "pack" in want:
        def mk(n):
            @jax.jit
            def f():
                def body(c, _):
                    p = pre._replace(xy=pre.xy + c)
                    feats = pack_entries(p, b0, colors, opac)
                    return c + 1e-9 * feats[0, 0], None
                c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                return c
            return f
        print(f"pack_entries:   {marginal(mk):8.2f} ms")

    params = BlendParams(
        opaque_threshold=settings.opaque_threshold,
        depth_threshold=settings.depth_threshold,
        normal_threshold=settings.normal_threshold_cos,
        T_threshold=settings.T_threshold)
    bgs = (0.0, 0.0, 0.0)

    def blend_from(c):
        p = pre._replace(xy=pre.xy + 0.0 * c)
        out = blend_tiles_pallas(
            p, b0, b0.entry_valid, colors + c, opac, num_tiles, ts, W, H,
            jnp.asarray(cam.K, jnp.float32), params, bgs)
        return out

    if "blend" in want:
        def mk(n):
            @jax.jit
            def f():
                def body(c, _):
                    out = blend_from(c)
                    return c + 1e-9 * out["render"][0, 0, 0], None
                c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                return c
            return f
        print(f"blend fwd:      {marginal(mk):8.2f} ms")

    if "blend_bwd" in want:
        def mk(n):
            @jax.jit
            def f():
                def body(c, _):
                    def loss(cc):
                        out = blend_from(cc)
                        return out["render"].sum() + out["depth"].sum()
                    g = jax.grad(loss)(c)
                    return c + 1e-9 * g, None
                c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                return c
            return f
        print(f"blend fwd+bwd:  {marginal(mk):8.2f} ms")

    if "render" in want:
        from dqo_map_tpu.ops.rasterize import rasterize
        def mk(n):
            @jax.jit
            def f():
                def body(c, _):
                    out = rasterize(means + c, scales, q, opac, colors,
                                    cam_in, settings, normal_w=normal_w)
                    return c + 1e-9 * out["render"][0, 0, 0], None
                c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                return c
            return f
        print(f"rasterize full: {marginal(mk, n_hi=6):8.2f} ms")

    if "opt" in want or "densify" in want or "finalize" in want:
        # realistic map state + frame batch via the bench synthetic scene
        from dqo_map_tpu.config import default_config
        from dqo_map_tpu.data.synthetic import synthetic_sequence
        from dqo_map_tpu.slam.system import SLAMSystem
        cfg = default_config(
            type="Synthetic", save_path="/tmp/prof_out", use_object=False,
            use_gt_pose=True, capacity=1 << 19, add_capacity=16384,
            initial_bucket=1 << 18, uniform_sample_num=40800,
            gaussian_update_frame=6, gaussian_update_iter=3,
            stable_confidence_thres=20, global_keyframe_num=3,
            min_depth=0.1, max_depth=8.0, memory_length=5, save_step=10**9)
        _, cams = synthetic_sequence(8, width=W, height=H)
        sysm = SLAMSystem(cfg, cameras=cams)
        for i in range(8):
            sysm.step(cams[i], i)
            sysm.mapping.time += 1
        m = sysm.mapping
        print(f"  [map ready: unstable={m.counts()[0]} stable={m.counts()[1]} "
              f"bucket={m.bucket}]")

        if "opt" in want:
            from dqo_map_tpu.slam.mapper import optimize_scan
            entries = []
            for cam_i, fm in m.processed_frames:
                from dqo_map_tpu.slam.mapper import render_range_step
                rm, tm = render_range_step(m.state, cam_i, m.settings, False,
                                           -1.0, None, ts, bucket=m.bucket)
                entries.append({
                    "color": fm["color_map"], "depth": fm["depth_map"],
                    "normal": fm["normal_map_w"], "render_mask": rm,
                    "tile_mask": tm, "cam": cam_i,
                    "semantics_color": None, "instance_img": None})
            frames = m._stack_frames(entries, ts)

            def run_iters(k):
                ri = m._rand_schedule(k, len(entries))
                st, _ = optimize_scan(
                    m.state, frames, ri, m._lrs(), m._weights(), m.settings,
                    k, 1, m.args.add_depth_thres, bucket=m.bucket)
                return st

            for k in (1, 3, 11):
                st = run_iters(k)     # compile
                _ = float(st.xyz[0, 0])
            times = {}
            for k in (1, 11):
                best = 1e18
                for _ in range(2):
                    t0 = time.perf_counter()
                    st = run_iters(k)
                    _ = float(st.xyz[0, 0])
                    best = min(best, time.perf_counter() - t0)
                times[k] = best
            periter = (times[11] - times[1]) / 10 * 1000
            print(f"optimize iter:  {periter:8.2f} ms   "
                  f"(1-iter call total {times[1]*1000:.1f} ms incl. binning)")

        if "densify" in want:
            from dqo_map_tpu.slam.mapper import densify_step
            cam_i, fm = m.processed_frames[-1]
            out = m.get_render_output(cam_i)
            args = m.args
            cfg_t = (args.uniform_sample_num, args.add_transmission_thres,
                     args.transmission_sample_ratio, args.add_depth_thres,
                     args.add_color_thres, args.error_sample_ratio,
                     args.init_opacity, *[float(x) for x in args.xyz_factor],
                     args.scale_factor, args.min_radius, args.max_radius,
                     False)
            key = jax.random.key(0)
            st, n = densify_step(m.state, fm, cam_i, out, key,
                                 jnp.int32(9), jnp.int32(9), m.settings,
                                 args.add_capacity, cfg_t, bucket=m.bucket)
            _ = float(st.xyz[0, 0])
            best = 1e18
            for _ in range(3):
                t0 = time.perf_counter()
                st, n = densify_step(m.state, fm, cam_i, out, key,
                                     jnp.int32(9), jnp.int32(9), m.settings,
                                     args.add_capacity, cfg_t,
                                     bucket=m.bucket)
                _ = float(st.xyz[0, 0])
                best = min(best, time.perf_counter() - t0)
            print(f"densify_step:   {best*1000:8.2f} ms  (total incl. 1 sync)")


if __name__ == "__main__":
    main()
