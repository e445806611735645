"""Jitted coarse-to-fine point-to-plane ICP.

Re-derivation of `SLAM/icp.py` as pure functions: the per-level Gauss-Newton
iteration is a `lax.scan`; the 6x6 solve runs on-device with LM damping
(`jnp.linalg.solve` — the reference hops to CPU for the inverse,
icp.py:313-328, which TPUs don't need). Projective data association uses
nearest-neighbor warping like the reference ("nearest" grid_sample,
icp.py:132-148).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.math3d import exp_se3


def warp_nearest(feat: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor warp of (H,W,C) by pixel coords (H,W), border clamp."""
    H, W, _ = feat.shape
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    return feat[vi, ui]


def icp_residuals_jacobian(vertex0, vertex1, normal0, normal1, mask0, pose10,
                           K, distance_threshold, normal_threshold_cos):
    """(ref `compute_residuals_jacobian`, icp.py:51-104)."""
    R = pose10[:3, :3]
    t = pose10[:3, 3]
    H, W, _ = vertex0.shape
    hi = jax.lax.Precision.HIGHEST
    v0in1 = jnp.matmul(vertex0, R.T, precision=hi) + t
    n0in1 = jnp.matmul(normal0, R.T, precision=hi)

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    z = v0in1[..., 2]
    z_safe = jnp.where(z == 0, 1e-8, z)
    u = (v0in1[..., 0] / z_safe) * fx + cx
    v = (v0in1[..., 1] / z_safe) * fy + cy
    inview = (u > 0) & (u < W - 1) & (v > 0) & (v < H - 1)

    r_vertex1 = warp_nearest(vertex1, u, v)
    r_normal1 = warp_nearest(normal1, u, v)
    mask1 = r_vertex1[..., 2] > 0.0
    diff = v0in1 - r_vertex1
    normal_agree = jnp.sum(n0in1 * r_normal1, axis=-1) > normal_threshold_cos

    res = jnp.sum(r_normal1 * diff, axis=-1)
    # J_rot_j = -sum_i n_i skew(v)_ij = -(n x v), written elementwise — the
    # (N,3,3)-skew einsum form both materialized 9N floats and hit a Mosaic/
    # XLA miscompile (TPU worker crash) at some image shapes (e.g. 340x600)
    nx, ny, nz = r_normal1[..., 0], r_normal1[..., 1], r_normal1[..., 2]
    vx, vy, vz = v0in1[..., 0], v0in1[..., 1], v0in1[..., 2]
    J_rot = jnp.stack([-(ny * vz - nz * vy),
                       -(nz * vx - nx * vz),
                       -(nx * vy - ny * vx)], axis=-1)
    J = jnp.concatenate([J_rot, r_normal1], axis=-1)

    occ = (~inview) | (jnp.linalg.norm(diff, axis=-1) > distance_threshold)
    invalid = occ | (~mask0) | (~mask1) | (~normal_agree)
    J = jnp.where(invalid[..., None], 0.0, J)
    res = jnp.where(invalid, 0.0, res)
    return res.reshape(-1), J.reshape(-1, 6), ~invalid


def gn_step(pose10, vertex0, vertex1, normal0, normal1, mask0, K,
            distance_threshold, normal_threshold_cos, damping):
    res, J, valid = icp_residuals_jacobian(
        vertex0, vertex1, normal0, normal1, mask0, pose10, K,
        distance_threshold, normal_threshold_cos,
    )
    hi = jax.lax.Precision.HIGHEST
    JtJ = jnp.matmul(J.T, J, precision=hi)
    JtR = jnp.matmul(J.T, res, precision=hi)
    # LM damping: epsilon = trace(diag(JtJ)) * damping (ref `lev_mar_H`)
    diag = jnp.diag(jnp.diag(JtJ))
    H = JtJ + jnp.trace(diag) * damping * jnp.eye(6)
    xi = -jnp.linalg.solve(H, JtR)
    pose = exp_se3(xi) @ pose10
    return pose, jnp.sum(valid)


def icp_level(pose10, vertex0, vertex1, normal0, normal1, K, iters,
              distance_threshold, normal_threshold_cos, damping):
    """`iters` GN iterations at one pyramid level (ref `ICP.icp`, icp.py:33-48)."""
    mask0 = vertex0[..., 2] > 0.0

    def body(carry, _):
        pose, _ = carry
        pose, nvalid = gn_step(pose, vertex0, vertex1, normal0, normal1,
                               mask0, K, distance_threshold,
                               normal_threshold_cos, damping)
        return (pose, nvalid), None

    (pose, nvalid), _ = jax.lax.scan(
        body, (pose10, jnp.int32(0)), None, length=iters
    )
    H, W = vertex0.shape[:2]
    return pose, nvalid / (H * W)


def point2plane_loss(p_t0, p_t1, n_t0):
    loss = jnp.sum((p_t1 - p_t0) * n_t0, axis=-1)
    return jnp.mean(loss * loss)


class IcpConfig(NamedTuple):
    downscales: tuple = (0.25, 0.5, 1.0)
    iters: tuple = (5, 5, 5)
    distance_threshold: float = 0.1
    normal_threshold_cos: float = float(math.cos(math.radians(20.0)))
    damping: float = 1e-4
    fail_threshold: float = 0.02


@partial(jax.jit, static_argnames=("cfg",))
def icp_pyramid(vertex_pyr0: tuple, normal_pyr0: tuple, vertex_pyr1: tuple,
                normal_pyr1: tuple, K: jnp.ndarray, cfg: IcpConfig):
    """Full coarse-to-fine ICP (ref `IcpTracker.predict_pose`, icp.py:423-458).

    Estimates pose10 such that pyr1 points map onto pyr0 (note the reference
    swaps argument order at the call site: `icp(pose, vertex_t1, vertex_t0,
    ...)` — template is the CURRENT frame, warped onto the LAST model depth).
    Returns (pose10 (4,4), p2p loss at finest level, valid ratio).
    """
    pose = jnp.eye(4, dtype=jnp.float32)
    valid_ratio = jnp.float32(0.0)
    for level, (ds, iters) in enumerate(zip(cfg.downscales, cfg.iters)):
        Kd = K * ds
        Kd = Kd.at[2, 2].set(1.0)
        pose, valid_ratio = icp_level(
            pose, vertex_pyr1[level], vertex_pyr0[level],
            normal_pyr1[level], normal_pyr0[level], Kd, iters,
            cfg.distance_threshold, cfg.normal_threshold_cos, cfg.damping,
        )
    p2p = point2plane_loss(
        vertex_pyr0[-1],
        jnp.matmul(vertex_pyr1[-1], pose[:3, :3].T,
                   precision=jax.lax.Precision.HIGHEST) + pose[:3, 3],
        normal_pyr0[-1],
    )
    return pose, p2p, valid_ratio
