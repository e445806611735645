"""Per-Gaussian view preprocessing: frustum cull, EWA projection, conics,
radii, tile rects, and the hit-Gaussian plane model inputs.

Re-derivation of `cuda_rasterizer/forward.cu:157-354` (`computeCov3D`,
`computeCov2D`, `preprocessCUDA`) as vectorized XLA ops. Everything is
expanded to explicit per-component arithmetic — batched (P,3,3) matmuls
lower to padded MXU calls that are ~10x slower than the equivalent
elementwise VPU forms at SLAM scales. All of this is differentiable;
binning/radius decisions are stop-gradient consumers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Preprocessed(NamedTuple):
    valid: jnp.ndarray        # (P,) bool — in frustum, invertible cov
    xy: jnp.ndarray           # (P,2) pixel-space mean
    conic: jnp.ndarray        # (P,3) inverse 2D covariance (a,b,c)
    depth: jnp.ndarray        # (P,) camera-frame z
    radius: jnp.ndarray       # (P,) float pixel radius (ceil applied)
    mean_c: jnp.ndarray       # (P,3) camera-frame center
    normal_c: jnp.ndarray     # (P,3) camera-frame min-scale axis
    scale_max: jnp.ndarray    # (P,) max scale (x scale_modifier)
    ext: jnp.ndarray          # (P,2) tight per-axis AABB half-extents of the
                              # alpha>=1/255 support (min'd with radius so the
                              # support never exceeds the reference's
                              # 3-sigma-circle rect — see binning)


def _rot_cols(rots):
    """Columns of R(q) (unnormalized q, matching `computeCov3D`/`
    computeNormal_ScaleMax`, forward.cu:54-74,202-235). Returns 9 (P,)
    arrays r[i][j] = R[i,j]."""
    q_T = rots.T
    w, x, y, z = q_T[0], q_T[1], q_T[2], q_T[3]
    return (
        (1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)),
        (2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)),
        (2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)),
    )


def build_cov3d(scales: jnp.ndarray, rots: jnp.ndarray,
                scale_modifier: float = 1.0):
    """Sigma = R diag(s^2) R^T as six (P,) components (xx,xy,xz,yy,yz,zz)."""
    R = _rot_cols(rots)
    s2 = ((scales * scale_modifier) ** 2).T
    s0, s1, s2_ = s2[0], s2[1], s2[2]

    def sig(a, b):
        return (R[a][0] * s0 * R[b][0] + R[a][1] * s1 * R[b][1]
                + R[a][2] * s2_ * R[b][2])

    return sig(0, 0), sig(0, 1), sig(0, 2), sig(1, 1), sig(1, 2), sig(2, 2)


def min_scale_axis(scales: jnp.ndarray, rots: jnp.ndarray) -> jnp.ndarray:
    """World-frame unit axis of the smallest scale = splat normal
    (ref `computeNormal_ScaleMax`, forward.cu:54-74; `get_normal`,
    gaussian_pointcloud.py:780-791)."""
    R = _rot_cols(rots)
    s_T = scales.T
    s0, s1, s2 = s_T[0], s_T[1], s_T[2]
    # branchless argMin matching CUDA tie semantics (forward.cu:37-52):
    # a<=b && a<=c -> 0, elif b<=c -> 1, else 2. No (P,3,3) intermediates —
    # those tile to ~1 GB at SLAM scales.
    m0 = (s0 <= s1) & (s0 <= s2)
    m1 = (~m0) & (s1 <= s2)

    def pick(r):
        return jnp.where(m0, r[0], jnp.where(m1, r[1], r[2]))

    return jnp.stack([pick(R[0]), pick(R[1]), pick(R[2])], axis=-1)


def preprocess(means3d: jnp.ndarray, scales: jnp.ndarray, rots: jnp.ndarray,
               cam: dict, color_sigma: float, width: int, height: int,
               scale_modifier: float = 1.0) -> Preprocessed:
    """Vectorized `preprocessCUDA` (forward.cu:239-354), elementwise form.

    `cam` is Camera.render_inputs(): w2c, full_proj, K, tan_fovx/y, cam_pos.
    """
    w2c = cam["w2c"]
    full_proj = cam["full_proj"]
    K = cam["K"]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    # one transpose each: repeated column reads of (P,k) arrays re-stream the
    # 128-lane-padded layout every time
    m_T = means3d.T
    mx, my, mz = m_T[0], m_T[1], m_T[2]

    def xform(M, r):
        return M[r, 0] * mx + M[r, 1] * my + M[r, 2] * mz + M[r, 3]

    tx_c = xform(w2c, 0)
    ty_c = xform(w2c, 1)
    tz_c = xform(w2c, 2)
    p_hx = xform(full_proj, 0)
    p_hy = xform(full_proj, 1)
    p_w4 = xform(full_proj, 3)
    p_w = 1.0 / (p_w4 + 1e-7)
    ndc_x = p_hx * p_w
    ndc_y = p_hy * p_w

    in_frustum = (tz_c > 0.2) & (jnp.abs(ndc_x) <= 1.3) & (jnp.abs(ndc_y) <= 1.3)

    sxx, sxy, sxz, syy, syz, szz = build_cov3d(scales, rots, scale_modifier)

    # EWA with clamped view point (ref `computeCov2D`, forward.cu:158-197)
    limx = 1.3 * cam["tan_fovx"]
    limy = 1.3 * cam["tan_fovy"]
    tz_safe = jnp.where(tz_c == 0, 1e-6, tz_c)
    txl = jnp.clip(tx_c / tz_safe, -limx, limx) * tz_c
    tyl = jnp.clip(ty_c / tz_safe, -limy, limy) * tz_c
    inv_z = 1.0 / tz_safe
    inv_z2 = inv_z * inv_z
    W00, W01, W02 = w2c[0, 0], w2c[0, 1], w2c[0, 2]
    W10, W11, W12 = w2c[1, 0], w2c[1, 1], w2c[1, 2]
    W20, W21, W22 = w2c[2, 0], w2c[2, 1], w2c[2, 2]
    # T = J @ W, J = [[fx/z, 0, -fx tx/z^2], [0, fy/z, -fy ty/z^2]]
    T00 = fx * inv_z * W00 - fx * txl * inv_z2 * W20
    T01 = fx * inv_z * W01 - fx * txl * inv_z2 * W21
    T02 = fx * inv_z * W02 - fx * txl * inv_z2 * W22
    T10 = fy * inv_z * W10 - fy * tyl * inv_z2 * W20
    T11 = fy * inv_z * W11 - fy * tyl * inv_z2 * W21
    T12 = fy * inv_z * W12 - fy * tyl * inv_z2 * W22

    # cov2d = T Sigma T^T (2x2 symmetric)
    def sig_vec(u0, u1, u2):
        return (sxx * u0 + sxy * u1 + sxz * u2,
                sxy * u0 + syy * u1 + syz * u2,
                sxz * u0 + syz * u1 + szz * u2)

    s0x, s0y, s0z = sig_vec(T00, T01, T02)
    a = T00 * s0x + T01 * s0y + T02 * s0z + 0.3
    b = T10 * s0x + T11 * s0y + T12 * s0z
    s1x, s1y, s1z = sig_vec(T10, T11, T12)
    c = T10 * s1x + T11 * s1y + T12 * s1z + 0.3

    det = a * c - b * b
    det_ok = det != 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    mid = 0.5 * (a + c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(color_sigma * jnp.sqrt(lambda1))

    # tight per-axis extents of the {alpha >= 1/255 | opacity <= 1} support:
    # Q(d) = 0.5 d^T cov2d^{-1} d <= tau = ln(255)  =>  |dx| <= sqrt(2 tau a),
    # |dy| <= sqrt(2 tau c). Intersected with the reference's circle so the
    # binned support is a subset of the CUDA rect (exact-parity guarantee:
    # every pixel the reference blends has alpha >= 1/255, hence lies inside
    # both bounds; see `binning.bin_gaussians`).
    TAU2 = 2.0 * 5.5413  # 2 ln 255
    ext = jnp.stack([
        jnp.minimum(jnp.sqrt(TAU2 * jnp.maximum(a, 0.0)), radius),
        jnp.minimum(jnp.sqrt(TAU2 * jnp.maximum(c, 0.0)), radius),
    ], axis=-1)

    xy = jnp.stack(
        [ndc_x * width * 0.5 + cx, ndc_y * height * 0.5 + cy], axis=-1
    )

    # hit-plane model inputs: camera-frame min-scale axis + center
    n_w = min_scale_axis(scales, rots)
    nx, ny, nz = n_w[:, 0], n_w[:, 1], n_w[:, 2]
    normal_c = jnp.stack(
        [W00 * nx + W01 * ny + W02 * nz,
         W10 * nx + W11 * ny + W12 * nz,
         W20 * nx + W21 * ny + W22 * nz], axis=-1)
    scale_max = jnp.max(scales, axis=-1) * scale_modifier
    mean_c = jnp.stack([tx_c, ty_c, tz_c], axis=-1)

    valid = in_frustum & det_ok
    return Preprocessed(
        valid=valid, xy=xy, conic=conic, depth=tz_c,
        radius=jnp.where(valid, radius, 0.0), mean_c=mean_c,
        normal_c=normal_c, scale_max=scale_max,
        ext=jnp.where(valid[:, None], ext, 0.0),
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
