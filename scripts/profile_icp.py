"""ICP hot-path decomposition at bench shapes (chain-difference protocol).

Per-level GN-step costs + the pieces inside one step (warp gather, residual
math, JtJ reductions, solve) to locate the 265-280 ms device-true tracker
cost (BENCH_r04 profile stage `tracker`).
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

from dqo_map_tpu.slam.icp import (IcpConfig, gn_step, icp_level,  # noqa: E402
                                  icp_pyramid, icp_residuals_jacobian,
                                  solve6_cholesky)

W, H = 1200, 680


def make_maps(w, h, seed=0):
    rng = np.random.default_rng(seed)
    # plane-ish depth with noise, valid everywhere except a border
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    z = 2.0 + 0.3 * np.sin(xx / 97.0) + 0.2 * np.cos(yy / 53.0)
    z += rng.normal(0, 0.002, z.shape).astype(np.float32)
    fx = fy = 600.0
    cx, cy = w / 2, h / 2
    X = (xx - cx) / fx * z
    Y = (yy - cy) / fy * z
    v = np.stack([X, Y, z], -1).astype(np.float32)
    n = np.zeros_like(v)
    n[..., 2] = -1.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    return jnp.asarray(v), jnp.asarray(n), jnp.asarray(K)


def main():
    print(f"devices: {jax.devices()}")
    only = os.environ.get("PROFILE_ONLY", "")

    def run(name, *a, **k):
        if only and only not in name:
            return
        chain_time(name, *a, **k)

    v1, n1, K = make_maps(W, H)
    v0, n0, _ = make_maps(W, H, seed=1)
    cfg = IcpConfig()

    levels = {}
    for ds in (0.25, 0.5, 1.0):
        w, h = int(W * ds), int(H * ds)
        a, b, Kd = make_maps(w, h)
        c, d, _ = make_maps(w, h, seed=1)
        levels[ds] = (a, b, c, d, Kd)

    # --- full pyramid as the system calls it ---
    vp0 = tuple(levels[ds][0] for ds in (0.25, 0.5, 1.0))
    np0 = tuple(levels[ds][1] for ds in (0.25, 0.5, 1.0))
    vp1 = tuple(levels[ds][2] for ds in (0.25, 0.5, 1.0))
    np1 = tuple(levels[ds][3] for ds in (0.25, 0.5, 1.0))

    def pyr_step(c, i):
        salt = c[0][0] * 1e-24
        pose, p2p, vr = icp_pyramid(
            jax.tree.map(lambda x: x + salt, vp0), np0, vp1, np1,
            K, cfg)
        return (c[0] + pose[0, 0] * 1e-24 + p2p * 1e-24,)

    run("icp_pyramid full (3 lvl x 5 it)", pyr_step,
        (jnp.zeros((1,), jnp.float32),), n1=2, n2=6)

    # --- one GN step per level ---
    for ds in (0.25, 0.5, 1.0):
        a, b, c, d, Kd = levels[ds]
        mask0 = c[..., 2] > 0
        feat6 = jnp.concatenate(
            [a.reshape(-1, 3), b.reshape(-1, 3)], axis=1)

        def step(cr, i, c=c, d=d, a=a, b=b, mask0=mask0, Kd=Kd, feat6=feat6):
            pose, nv = gn_step(cr[0], c, a, d, b, mask0, Kd,
                               cfg.distance_threshold,
                               cfg.normal_threshold_cos, cfg.damping,
                               feat6=feat6)
            return (pose, cr[1] + nv * 0)

        run(f"gn_step ds={ds} ({int(W*ds)}x{int(H*ds)})", step,
            (jnp.eye(4, dtype=jnp.float32), jnp.int32(0)), n1=4, n2=16)

    # --- pieces at full res ---
    a, b, c, d, Kd = levels[1.0]
    feat6 = jnp.concatenate([a.reshape(-1, 3), b.reshape(-1, 3)], axis=1)
    npix = W * H

    def gather_step(cr, i):
        idx = (cr[0].astype(jnp.int32) + i) % npix
        g = jnp.take(feat6, idx, axis=0)
        return (cr[0] + g[:, 0] * 1e-24,)

    run("warp gather alone (816k x 6ch)", gather_step,
        (jnp.arange(npix, dtype=jnp.float32),), n1=4, n2=16)

    def resjac_step(cr, i):
        res, J, valid = icp_residuals_jacobian(
            c + cr[0] * 1e-24, a, d, b, c[..., 2] > 0, cr[1], Kd,
            cfg.distance_threshold, cfg.normal_threshold_cos, feat6=feat6)
        return (cr[0] + res[:1] * 1e-24, cr[1] + J[0, 0] * 1e-24)

    run("residual+jacobian only (full res)", resjac_step,
        (jnp.zeros((1,), jnp.float32), jnp.eye(4, dtype=jnp.float32)),
        n1=4, n2=16)

    # JtJ reductions alone
    Jc = jnp.ones((npix, 6), jnp.float32)
    rc = jnp.ones((npix,), jnp.float32)

    def jtj_step(cr, i):
        Jx = Jc + cr[0] * 1e-24
        cols = [Jx[:, i] for i in range(6)]
        JtJ = jnp.stack([
            jnp.stack([jnp.sum(cols[i] * cols[j]) if j >= i
                       else jnp.float32(0) for j in range(6)])
            for i in range(6)])
        JtJ = JtJ + jnp.triu(JtJ, 1).T
        JtR = jnp.stack([jnp.sum(cc * rc) for cc in cols])
        Hm = JtJ + jnp.trace(JtJ) * cfg.damping * jnp.eye(6)
        xi = -solve6_cholesky(Hm, JtR)
        return (cr[0] + xi[0] * 1e-24,)

    run("JtJ+JtR+solve alone (full res)", jtj_step,
        (jnp.zeros((1,), jnp.float32),), n1=4, n2=16)


if __name__ == "__main__":
    main()
