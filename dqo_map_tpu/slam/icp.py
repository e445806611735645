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
    """Nearest-neighbor warp of (H,W,C) by pixel coords (H,W), border clamp.

    Flattened single-axis gather: TPU lowers a 1-D `take` from a contiguous
    (H*W, C) table far better than 2-D advanced indexing."""
    H, W, C = feat.shape
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    flat = (vi * W + ui).reshape(-1)
    return jnp.take(feat.reshape(H * W, C), flat, axis=0).reshape(H, W, C)


def _rot_rows(m, R, t=None):
    """(H,W,3) @ R^T (+ t) as elementwise row combos — a K=3 matmul pads the
    MXU 3->128 on both contraction dims and wastes ~1800x of its area."""
    x, y, z = m[..., 0], m[..., 1], m[..., 2]
    ox = R[0, 0] * x + R[0, 1] * y + R[0, 2] * z
    oy = R[1, 0] * x + R[1, 1] * y + R[1, 2] * z
    oz = R[2, 0] * x + R[2, 1] * y + R[2, 2] * z
    if t is not None:
        ox, oy, oz = ox + t[0], oy + t[1], oz + t[2]
    return jnp.stack([ox, oy, oz], axis=-1)


def solve6_cholesky(A, b, eps: float = 1e-12):
    """Closed-form 6x6 Cholesky solve, fully unrolled (no LAPACK-style LU
    loop — `jnp.linalg.solve` costs ~1 ms of tiny serialized ops per call
    on TPU; this is a handful of fused scalar ops)."""
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        s = A[i, i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        L[i][i] = jnp.sqrt(jnp.maximum(s, eps))
        inv_d = 1.0 / L[i][i]
        for j in range(i + 1, 6):
            s = A[j, i]
            for k in range(i):
                s = s - L[j][k] * L[i][k]
            L[j][i] = s * inv_d
    # forward substitution L y = b
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def icp_residuals_jacobian(vertex0, vertex1, normal0, normal1, mask0, pose10,
                           K, distance_threshold, normal_threshold_cos,
                           feat6=None):
    """(ref `compute_residuals_jacobian`, icp.py:51-104).

    `feat6` is the precomputed (H*W, 6) concat of [vertex1, normal1] used for
    the warp: ONE barriered joint gather is ~4x faster on TPU than two fused
    (H,W,3) gathers (the barrier stops XLA folding the projection math into
    the gather's index computation, which scalarizes it). Pass it when
    calling in a loop; it is derived from vertex1/normal1 otherwise.
    """
    R = pose10[:3, :3]
    t = pose10[:3, 3]
    H, W, _ = vertex0.shape
    v0in1 = _rot_rows(vertex0, R, t)
    n0in1 = _rot_rows(normal0, R)

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    z = v0in1[..., 2]
    z_safe = jnp.where(z == 0, 1e-8, z)
    u = (v0in1[..., 0] / z_safe) * fx + cx
    v = (v0in1[..., 1] / z_safe) * fy + cy
    inview = (u > 0) & (u < W - 1) & (v > 0) & (v < H - 1)

    if feat6 is None:
        feat6 = jnp.concatenate(
            [vertex1.reshape(-1, 3), normal1.reshape(-1, 3)], axis=1)
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    flat = jax.lax.optimization_barrier((vi * W + ui).reshape(-1))
    g = jnp.take(feat6, flat, axis=0).reshape(H, W, 6)
    r_vertex1 = g[..., :3]
    r_normal1 = g[..., 3:]
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
            distance_threshold, normal_threshold_cos, damping, feat6=None):
    res, J, valid = icp_residuals_jacobian(
        vertex0, vertex1, normal0, normal1, mask0, pose10, K,
        distance_threshold, normal_threshold_cos, feat6=feat6,
    )
    # JtJ/JtR as 27 fused elementwise-multiply reductions (a (6,N)@(N,6)
    # matmul runs the MXU at 6/128 x 6/128 utilization)
    cols = [J[:, i] for i in range(6)]
    JtJ = jnp.stack([
        jnp.stack([jnp.sum(cols[i] * cols[j]) if j >= i else jnp.float32(0)
                   for j in range(6)]) for i in range(6)])
    JtJ = JtJ + jnp.triu(JtJ, 1).T
    JtR = jnp.stack([jnp.sum(c * res) for c in cols])
    # LM damping: epsilon = trace(diag(JtJ)) * damping (ref `lev_mar_H`)
    Hm = JtJ + jnp.trace(JtJ) * damping * jnp.eye(6)
    xi = -solve6_cholesky(Hm, JtR)
    pose = exp_se3(xi) @ pose10
    return pose, jnp.sum(valid)


def icp_level(pose10, vertex0, vertex1, normal0, normal1, K, iters,
              distance_threshold, normal_threshold_cos, damping):
    """`iters` GN iterations at one pyramid level (ref `ICP.icp`, icp.py:33-48)."""
    mask0 = vertex0[..., 2] > 0.0
    feat6 = jnp.concatenate(
        [vertex1.reshape(-1, 3), normal1.reshape(-1, 3)], axis=1)

    def body(carry, _):
        pose, _ = carry
        pose, nvalid = gn_step(pose, vertex0, vertex1, normal0, normal1,
                               mask0, K, distance_threshold,
                               normal_threshold_cos, damping, feat6=feat6)
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
    fail_threshold: float = 1e-4
    min_valid_ratio: float = 0.3


@partial(jax.jit, static_argnames=("cfg",))
def icp_pyramid(vertex_pyr0: tuple, normal_pyr0: tuple, vertex_pyr1: tuple,
                normal_pyr1: tuple, K: jnp.ndarray, cfg: IcpConfig):
    """Full coarse-to-fine ICP (ref `IcpTracker.predict_pose`, icp.py:423-458).

    Estimates pose10 such that pyr1 points map onto pyr0 (note the reference
    swaps argument order at the call site: `icp(pose, vertex_t1, vertex_t0,
    ...)` — template is the CURRENT frame, warped onto the LAST model depth).
    Returns (pose10 (4,4), p2p residual at finest level, valid ratio).

    Failure metric — deliberate deviation from the reference: the reference
    compares the two vertex maps PIXELWISE without association and without a
    validity mask (ref icp.py:449-455), so pixels that are invalid in one
    frame (grazing-angle confidence culls zero them) contribute garbage
    residuals of metres, and silhouette pixels (different surfaces at the
    same pixel) dominate the rest — on partially-valid depth the metric
    fires even at the GROUND-TRUTH relative pose (measured: p2p@gt == p2p@es
    = 3x threshold while the pose error was 5e-4). Here `p2p` is the
    mean-squared point-to-plane residual over the ICP's OWN final inlier
    associations (projective warp + distance/normal gating — exactly what GN
    minimized), which is ~1e-6 for a converged pose and jumps orders of
    magnitude on divergence. Thresholds are accordingly ~1e-4, not 0.02.
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
    v1, n1 = vertex_pyr1[-1], normal_pyr1[-1]
    v0, n0 = vertex_pyr0[-1], normal_pyr0[-1]
    res, _, inlier = icp_residuals_jacobian(
        v1, v0, n1, n0, v1[..., 2] > 0.0, pose, K,
        cfg.distance_threshold, cfg.normal_threshold_cos)
    n_in = jnp.sum(inlier)
    p2p = jnp.sum(res * res) / jnp.maximum(n_in, 1)
    valid_ratio = n_in / res.shape[0]
    return pose, p2p, valid_ratio
