"""Spherical harmonics (degree 0-3), matching the rasterizer's evaluation
(`cuda_rasterizer/forward.cu:102-155`, `utils/sh_utils.py`).

SH layout is (..., K, 3): K = (deg+1)^2 coefficient vectors of RGB, with
coefficient 0 the DC term; colors are offset by +0.5 and clamped at 0 with the
clamp mask tracked implicitly by autodiff (jnp.maximum has the same
subgradient convention the CUDA backward implements via `clamped`).
"""

from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * C0 + 0.5


def sh_basis(deg: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """SH basis values (..., K) for K=(deg+1)^2, signs folded in so
    eval = sum_k basis_k * sh_k."""
    x = dirs[..., 0]
    y = dirs[..., 1]
    z = dirs[..., 2]
    b = [C0 * jnp.ones_like(x)]
    if deg > 0:
        b += [-C1 * y, C1 * z, -C1 * x]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            b += [C2[0] * xy, C2[1] * yz, C2[2] * (2.0 * zz - xx - yy),
                  C2[3] * xz, C2[4] * (xx - yy)]
            if deg > 2:
                b += [C3[0] * y * (3.0 * xx - yy), C3[1] * xy * z,
                      C3[2] * y * (4.0 * zz - xx - yy),
                      C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
                      C3[4] * x * (4.0 * zz - xx - yy),
                      C3[5] * z * (xx - yy), C3[6] * x * (xx - 3.0 * yy)]
    return jnp.stack(b, axis=-1)


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH color. sh: (..., K, 3); dirs: (..., 3) unit. -> (..., 3).

    Matches `computeColorFromSH` including the +0.5 offset and clamp-at-zero.
    One basis-weighted contraction instead of per-coefficient accumulation:
    the VJP w.r.t. sh is then a single fused outer product — the slice-wise
    form cost 16 pad+add passes over the full (P,16,3) array in backward.
    """
    K = (deg + 1) ** 2
    basis = sh_basis(deg, dirs)                       # (..., K)
    result = jnp.sum(basis[..., None] * sh[..., :K, :], axis=-2) + 0.5
    return jnp.maximum(result, 0.0)
