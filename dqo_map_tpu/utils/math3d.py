"""3D math: quaternions, SE(3), trajectory alignment.

Pure-JAX re-derivations of the reference's geometry helpers
(`utils/general_utils.py:108-152`, `SLAM/icp.py:271-310`,
`SLAM/utils.py:449-532,650-710`). All functions are jit/vmap friendly.
Quaternion convention is (w, x, y, z), matching the CUDA rasterizer
(`cuda_rasterizer/forward.cu:54-74`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def normalize(v: jnp.ndarray, eps: float = 1e-8, axis: int = -1) -> jnp.ndarray:
    return v / (jnp.linalg.norm(v, axis=axis, keepdims=True) + eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(…,4) wxyz quaternion -> (…,3,3) rotation matrix. Normalizes first."""
    q = normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    rows = jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def quat_to_rotmat_unnormalized(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix WITHOUT normalizing the quaternion first.

    The CUDA kernels intentionally skip normalization inside
    `computeNormal_ScaleMax` / `computeCov3D` (`forward.cu:57,211`) because the
    activation already normalized; gradients w.r.t. raw q differ if we
    re-normalize, so we mirror that choice where parity matters.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(…,3,3) -> (…,4) wxyz. Branch-free Shepperd's method."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def case0():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2
        return jnp.stack([0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s], -1)

    def case1():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2
        return jnp.stack([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s], -1)

    def case2():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 1e-12)) * 2
        return jnp.stack([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s], -1)

    def case3():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 1e-12)) * 2
        return jnp.stack([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s], -1)

    c0, c1, c2, c3 = case0(), case1(), case2(), case3()
    use0 = tr > 0
    use1 = (~use0) & (m00 >= m11) & (m00 >= m22)
    use2 = (~use0) & (~use1) & (m11 >= m22)
    q = jnp.where(
        use0[..., None], c0, jnp.where(use1[..., None], c1, jnp.where(use2[..., None], c2, c3))
    )
    return normalize(q)


def quaternion_from_two_vectors(init_vec: jnp.ndarray, target_vec: jnp.ndarray) -> jnp.ndarray:
    """Quaternion rotating init_vec onto target_vec (ref `SLAM/utils.py:246-251`)."""
    axis = jnp.cross(init_vec, target_vec)
    axis = normalize(axis)
    cosang = jnp.clip(jnp.sum(init_vec * target_vec, axis=-1), -1.0, 1.0)
    angle = jnp.arccos(cosang)[..., None]
    half = angle / 2
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """(…,3) -> (…,3,3) skew-symmetric matrices (ref `icp.py:230-245`)."""
    o = jnp.zeros_like(w[..., 0])
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    return jnp.stack(
        [
            jnp.stack([o, -w2, w1], -1),
            jnp.stack([w2, o, -w0], -1),
            jnp.stack([-w1, w0, o], -1),
        ],
        axis=-2,
    )


def exp_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) -> SE(3) exponential map; xi = [w(3), v(3)] (ref `icp.py:271-310`).

    Branch-free: uses Taylor-safe coefficients near theta=0.
    """
    w = xi[:3]
    v = xi[3:6]
    w_hat = skew(w)
    w_hat2 = w_hat @ w_hat
    theta = jnp.linalg.norm(w)
    theta2 = theta * theta
    # safe sin/cos coefficients
    small = theta < 1e-8
    st = jnp.where(small, 1.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
    # (1-cos t)/t^2 = 2 sin^2(t/2)/t^2 — cancellation-free form
    half_sin = jnp.sin(theta / 2)
    ct = jnp.where(small, 0.5, 2.0 * half_sin * half_sin / jnp.where(small, 1.0, theta2))
    k2 = jnp.where(
        small, 1.0 / 6.0, (theta - jnp.sin(theta)) / jnp.where(small, 1.0, theta2 * theta)
    )
    eye3 = jnp.eye(3, dtype=xi.dtype)
    e_w = eye3 + w_hat * st + w_hat2 * ct
    j = eye3 + ct * w_hat + k2 * w_hat2
    T = jnp.eye(4, dtype=xi.dtype)
    T = T.at[:3, :3].set(e_w)
    T = T.at[:3, 3].set(j @ v)
    return T


def slerp(v0: jnp.ndarray, v1: jnp.ndarray, t: jnp.ndarray, DOT_THRESHOLD: float = 0.9995):
    """Batched spherical interpolation of quaternions/vectors
    (ref `SLAM/utils.py:650-709`); lerps when nearly colinear."""
    v0n = normalize(v0)
    v1n = normalize(v1)
    dot = jnp.sum(v0n * v1n, axis=-1)
    dot_mag = jnp.abs(dot)
    gotta_lerp = jnp.isnan(dot_mag) | (dot_mag > DOT_THRESHOLD)
    lerped = v0 + (v1 - v0) * t

    theta_0 = jnp.arccos(jnp.clip(dot, -1.0, 1.0))[..., None]
    sin_theta_0 = jnp.sin(theta_0)
    safe_sin = jnp.where(jnp.abs(sin_theta_0) < 1e-6, 1.0, sin_theta_0)
    theta_t = theta_0 * t
    s0 = jnp.sin(theta_0 - theta_t) / safe_sin
    s1 = jnp.sin(theta_t) / safe_sin
    slerped = s0 * v0 + s1 * v1
    return jnp.where(gotta_lerp[..., None], lerped, slerped)


def rot_compare(prev_rot: np.ndarray, curr_rot: np.ndarray):
    """Angle between two rotations in (rad, deg) (ref `SLAM/utils.py:42-47`)."""
    rot_diff = prev_rot.T @ curr_rot
    cos_theta = np.clip((np.trace(rot_diff) - 1) / 2, -1.0, 1.0)
    rad = np.arccos(cos_theta)
    return rad, np.rad2deg(rad)


def trans_compare(prev_trans: np.ndarray, curr_trans: np.ndarray):
    d = prev_trans - curr_trans
    return np.linalg.norm(d, ord=1), np.linalg.norm(d, ord=2)


# --- Trajectory alignment (Horn closed-form) -------------------------------

def horn_align(model: np.ndarray, data: np.ndarray):
    """Align trajectories `model`(3,n) onto `data`(3,n)
    (ref `SLAM/utils.py:449-483`). Returns (rot, trans, per-point error)."""
    model_zc = model - model.mean(1, keepdims=True)
    data_zc = data - data.mean(1, keepdims=True)
    W = model_zc @ data_zc.T
    U, _, Vh = np.linalg.svd(W.T)
    S = np.identity(3)
    if np.linalg.det(U) * np.linalg.det(Vh) < 0:
        S[2, 2] = -1
    rot = U @ S @ Vh
    trans = data.mean(1, keepdims=True) - rot @ model.mean(1, keepdims=True)
    aligned = rot @ model + trans
    err = aligned - data
    trans_error = np.sqrt(np.sum(err * err, 0))
    return rot, trans, trans_error


def eval_ate(pose_estimate: np.ndarray, pose_gt: np.ndarray) -> float:
    """ATE RMSE x100 (cm) between (n,3) translation arrays
    (ref `SLAM/utils.py:486-532`)."""
    pe = np.asarray(pose_estimate, dtype=np.float64).T
    pg = np.asarray(pose_gt, dtype=np.float64).T
    _, _, trans_error = horn_align(pe, pg)
    return float(np.sqrt(np.dot(trans_error, trans_error) / len(trans_error)) * 100)


def homogeneous(points: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 transform to (…,3) points."""
    return jnp.matmul(pts, T[:3, :3].T,
                      precision=jax.lax.Precision.HIGHEST) + T[:3, 3]


def transform_dirs(T: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(dirs, T[:3, :3].T, precision=jax.lax.Precision.HIGHEST)
