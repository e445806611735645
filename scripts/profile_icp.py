"""In-jit ICP ablation at 1200x680: where do the ~186 ms go?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


W, H = 1200, 680
rng = np.random.default_rng(0)
from functools import partial

from dqo_map_tpu.slam.icp import (IcpConfig, gn_step, icp_level, icp_pyramid,
                                  icp_residuals_jacobian)
from dqo_map_tpu.slam.tracker import preprocess_frame

K = jnp.asarray([[0.9 * W, 0, W / 2], [0, 0.9 * W, H / 2], [0, 0, 1]],
                jnp.float32)
depth = jnp.asarray(1.0 + rng.uniform(0, 2, (H, W)), jnp.float32)
color = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
fm = jax.block_until_ready(preprocess_frame(depth, color, K, min_depth=0.1,
                                            max_depth=8.0))
vp, npr = fm["vertex_pyr"], fm["normal_pyr"]
cfg = IcpConfig()

print(f"icp_pyramid full:    {timeit(partial(icp_pyramid, cfg=cfg), vp, npr, vp, npr, K):8.2f} ms")

# per-level cost
for lvl, (ds, iters) in enumerate(zip(cfg.downscales, cfg.iters)):
    Kd = (K * ds).at[2, 2].set(1.0)
    f = jax.jit(lambda v0, n0, v1, n1, Kd=Kd, iters=iters: icp_level(
        jnp.eye(4), v0, v1, n0, n1, Kd, iters, cfg.distance_threshold,
        cfg.normal_threshold_cos, cfg.damping))
    t = timeit(f, vp[lvl], npr[lvl], vp[lvl], npr[lvl])
    print(f"level {lvl} ({vp[lvl].shape[0]}x{vp[lvl].shape[1]}, {iters} it): "
          f"{t:8.2f} ms   ({t/iters:.2f} ms/iter)")

# finest level: residual/J only (no solve) x5 inside scan
lvl = 2
Kd = K


@jax.jit
def resj_only(v0, n0, v1, n1):
    mask0 = v0[..., 2] > 0

    def body(c, _):
        pose = c
        res, J, valid = icp_residuals_jacobian(
            v0, v1, n0, n1, mask0, pose, Kd, cfg.distance_threshold,
            cfg.normal_threshold_cos)
        return pose + res.sum() * 1e-20, None
    p, _ = jax.lax.scan(body, jnp.eye(4), None, length=5)
    return p


print(f"resJ only x5:        {timeit(resj_only, vp[lvl], npr[lvl], vp[lvl], npr[lvl]):8.2f} ms")


@jax.jit
def resj_jtj(v0, n0, v1, n1):
    mask0 = v0[..., 2] > 0
    hi = jax.lax.Precision.HIGHEST

    def body(c, _):
        pose = c
        res, J, valid = icp_residuals_jacobian(
            v0, v1, n0, n1, mask0, pose, Kd, cfg.distance_threshold,
            cfg.normal_threshold_cos)
        JtJ = jnp.matmul(J.T, J, precision=hi)
        JtR = jnp.matmul(J.T, res, precision=hi)
        return pose + JtJ.sum() * 1e-20 + JtR.sum() * 1e-20, None
    p, _ = jax.lax.scan(body, jnp.eye(4), None, length=5)
    return p


print(f"resJ+JtJ x5:         {timeit(resj_jtj, vp[lvl], npr[lvl], vp[lvl], npr[lvl]):8.2f} ms")
