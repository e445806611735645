"""Per-Gaussian view preprocessing: frustum cull, EWA projection, conics,
radii, tile rects, and the hit-Gaussian plane model inputs.

Re-derivation of `cuda_rasterizer/forward.cu:157-354` (`computeCov3D`,
`computeCov2D`, `preprocessCUDA`) as vectorized XLA ops. All of this is
differentiable; binning/radius decisions are stop-gradient consumers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.math3d import quat_to_rotmat_unnormalized


class Preprocessed(NamedTuple):
    valid: jnp.ndarray        # (P,) bool — in frustum, invertible cov
    xy: jnp.ndarray           # (P,2) pixel-space mean
    conic: jnp.ndarray        # (P,3) inverse 2D covariance (a,b,c)
    depth: jnp.ndarray        # (P,) camera-frame z
    radius: jnp.ndarray       # (P,) float pixel radius (ceil applied)
    mean_c: jnp.ndarray       # (P,3) camera-frame center
    normal_c: jnp.ndarray     # (P,3) camera-frame min-scale axis
    scale_max: jnp.ndarray    # (P,) max scale (x scale_modifier)


def build_cov3d(scales: jnp.ndarray, rots: jnp.ndarray, scale_modifier: float = 1.0):
    """Sigma = R diag(s^2) R^T, (P,3,3) (ref `computeCov3D`, forward.cu:202-235)."""
    R = quat_to_rotmat_unnormalized(rots)
    s = scales * scale_modifier
    M = R * s[..., None, :]          # R @ diag(s)
    return jnp.matmul(M, jnp.swapaxes(M, -1, -2),
                      precision=jax.lax.Precision.HIGHEST)


def min_scale_axis(scales: jnp.ndarray, rots: jnp.ndarray) -> jnp.ndarray:
    """World-frame unit axis of the smallest scale = splat normal
    (ref `computeNormal_ScaleMax`, forward.cu:54-74; `get_normal`,
    gaussian_pointcloud.py:780-791)."""
    R = quat_to_rotmat_unnormalized(rots)      # (P,3,3), columns are axes
    idx = jnp.argmin(scales, axis=-1)
    return jnp.take_along_axis(R, idx[:, None, None], axis=2)[..., 0]


def project_cov2d(mean_c: jnp.ndarray, cov3d: jnp.ndarray, w2c: jnp.ndarray,
                  fx: float, fy: float, tan_fovx, tan_fovy) -> jnp.ndarray:
    """EWA splatting 2D covariance with the +0.3 low-pass
    (ref `computeCov2D`, forward.cu:158-197). Returns (P,3) = (a,b,c)."""
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tz = mean_c[:, 2]
    txtz = jnp.clip(mean_c[:, 0] / tz, -limx, limx)
    tytz = jnp.clip(mean_c[:, 1] / tz, -limy, limy)
    tx = txtz * tz
    ty = tytz * tz

    zero = jnp.zeros_like(tz)
    # J: Jacobian of perspective projection (2x3 rows embedded in 3x3)
    J = jnp.stack(
        [
            jnp.stack([fx / tz, zero, -(fx * tx) / (tz * tz)], -1),
            jnp.stack([zero, fy / tz, -(fy * ty) / (tz * tz)], -1),
        ],
        axis=-2,
    )  # (P,2,3)
    W = w2c[:3, :3]  # (3,3)
    T = jnp.matmul(J, W, precision=jax.lax.Precision.HIGHEST)  # (P,2,3)
    cov = jnp.matmul(
        jnp.matmul(T, cov3d, precision=jax.lax.Precision.HIGHEST),
        jnp.swapaxes(T, -1, -2), precision=jax.lax.Precision.HIGHEST,
    )  # (P,2,2)
    a = cov[:, 0, 0] + 0.3
    b = cov[:, 0, 1]
    c = cov[:, 1, 1] + 0.3
    return jnp.stack([a, b, c], axis=-1)


def preprocess(means3d: jnp.ndarray, scales: jnp.ndarray, rots: jnp.ndarray,
               cam: dict, color_sigma: float, width: int, height: int,
               scale_modifier: float = 1.0) -> Preprocessed:
    """Vectorized `preprocessCUDA` (forward.cu:239-354).

    `cam` is Camera.render_inputs(): w2c, full_proj, K, tan_fovx/y, cam_pos.
    """
    w2c = cam["w2c"]
    full_proj = cam["full_proj"]
    K = cam["K"]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    hi = jax.lax.Precision.HIGHEST
    mean_c = jnp.matmul(means3d, w2c[:3, :3].T, precision=hi) + w2c[:3, 3]
    p_hom = jnp.matmul(means3d, full_proj[:3, :3].T, precision=hi) + full_proj[:3, 3]
    p_w4 = jnp.matmul(means3d, full_proj[3, :3].T, precision=hi) + full_proj[3, 3]
    p_w = 1.0 / (p_w4 + 1e-7)
    p_proj = p_hom * p_w[:, None]

    in_frustum = (
        (mean_c[:, 2] > 0.2)
        & (jnp.abs(p_proj[:, 0]) <= 1.3)
        & (jnp.abs(p_proj[:, 1]) <= 1.3)
    )

    cov3d = build_cov3d(scales, rots, scale_modifier)
    cov2d = project_cov2d(mean_c, cov3d, w2c, fx, fy, cam["tan_fovx"], cam["tan_fovy"])
    a, b, c = cov2d[:, 0], cov2d[:, 1], cov2d[:, 2]
    det = a * c - b * b
    det_ok = det != 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    mid = 0.5 * (a + c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(color_sigma * jnp.sqrt(lambda1))

    xy = jnp.stack(
        [p_proj[:, 0] * width * 0.5 + cx, p_proj[:, 1] * height * 0.5 + cy], axis=-1
    )

    normal_c = jnp.matmul(min_scale_axis(scales, rots), w2c[:3, :3].T,
                          precision=jax.lax.Precision.HIGHEST)
    scale_max = jnp.max(scales, axis=-1) * scale_modifier

    valid = in_frustum & det_ok
    return Preprocessed(
        valid=valid, xy=xy, conic=conic, depth=mean_c[:, 2],
        radius=jnp.where(valid, radius, 0.0), mean_c=mean_c,
        normal_c=normal_c, scale_max=scale_max,
    )


def pixel_rays(height: int, width: int, K: jnp.ndarray) -> jnp.ndarray:
    """Unit viewing rays per pixel, (H,W,3) (ref `ndc2ray`, forward.cu:92-100)."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    xs = (jnp.arange(width, dtype=jnp.float32) - cx) / fx
    ys = (jnp.arange(height, dtype=jnp.float32) - cy) / fy
    ray = jnp.stack(
        [
            jnp.broadcast_to(xs[None, :], (height, width)),
            jnp.broadcast_to(ys[:, None], (height, width)),
            jnp.ones((height, width), dtype=jnp.float32),
        ],
        axis=-1,
    )
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
