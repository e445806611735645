"""TSDF volume fusion + surface extraction, fully on-device.

Replaces the reference's open3d TSDF/Poisson path (`SLAM/eval.py:316-343`,
`make_mesh.py`): integration is a dense voxel->pixel GATHER per frame (no
scatter, no atomics — ideal XLA), and surface extraction walks zero
crossings. Open3D isn't available in this environment; this is the
TPU-native equivalent.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class TSDFVolume(NamedTuple):
    tsdf: jnp.ndarray     # (X,Y,Z) signed distance (truncated, in trunc units)
    weight: jnp.ndarray   # (X,Y,Z)
    color: jnp.ndarray    # (X,Y,Z,3)
    origin: jnp.ndarray   # (3,)
    voxel: float
    trunc: float


def make_volume(origin, dims, voxel_size: float, trunc: float | None = None):
    trunc = trunc or 4 * voxel_size
    X, Y, Z = dims
    return TSDFVolume(
        tsdf=jnp.ones((X, Y, Z), jnp.float32),
        weight=jnp.zeros((X, Y, Z), jnp.float32),
        color=jnp.zeros((X, Y, Z, 3), jnp.float32),
        origin=jnp.asarray(origin, jnp.float32),
        voxel=float(voxel_size), trunc=float(trunc),
    )


@partial(jax.jit, static_argnames=("max_depth",))
def integrate(vol: TSDFVolume, depth: jnp.ndarray, color: jnp.ndarray,
              w2c: jnp.ndarray, K: jnp.ndarray, max_depth: float = 8.0):
    """Fuse one RGB-D frame (standard weighted TSDF update)."""
    X, Y, Z = vol.tsdf.shape
    H, W = depth.shape
    ii = jnp.arange(X)
    jj = jnp.arange(Y)
    kk = jnp.arange(Z)
    gx, gy, gz = jnp.meshgrid(ii, jj, kk, indexing="ij")
    pts = (jnp.stack([gx, gy, gz], -1).astype(jnp.float32) + 0.5) * vol.voxel
    pts = pts + vol.origin
    pc = pts.reshape(-1, 3) @ w2c[:3, :3].T + w2c[:3, 3]
    z = pc[:, 2]
    u = pc[:, 0] / jnp.where(z == 0, 1e-9, z) * K[0, 0] + K[0, 2]
    v = pc[:, 1] / jnp.where(z == 0, 1e-9, z) * K[1, 1] + K[1, 2]
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    inview = (z > 0.05) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    d = depth[vi, ui]
    valid = inview & (d > 0) & (d < max_depth)
    sdf = (d - z) / vol.trunc
    take = valid & (sdf > -1.0)
    sdf = jnp.clip(sdf, -1.0, 1.0)
    c = color[vi, ui]

    w_old = vol.weight.reshape(-1)
    t_old = vol.tsdf.reshape(-1)
    c_old = vol.color.reshape(-1, 3)
    w_add = take.astype(jnp.float32)
    w_new = w_old + w_add
    w_safe = jnp.where(w_new == 0, 1.0, w_new)
    t_new = (t_old * w_old + jnp.where(take, sdf, 0.0)) / w_safe
    c_new = (c_old * w_old[:, None] + jnp.where(take[:, None], c, 0.0)) / w_safe[:, None]
    t_new = jnp.where(w_new > 0, t_new, t_old)
    c_new = jnp.where((w_new > 0)[:, None], c_new, c_old)
    return vol._replace(
        tsdf=t_new.reshape(X, Y, Z), weight=w_new.reshape(X, Y, Z),
        color=c_new.reshape(X, Y, Z, 3),
    )


@jax.jit
def extract_surface_points(vol: TSDFVolume, weight_thresh: float = 1.0):
    """Zero-crossing voxel surface samples, linear interpolation along each of
    the three grid axes (a surface perpendicular to one axis only crosses
    along that axis).

    Returns (points (N,3), colors (N,3), valid (N,)) with static
    N = sum over axes of crossing-pair counts (masked output).
    """
    t = vol.tsdf
    w = vol.weight
    X, Y, Z = t.shape
    base = jnp.stack(
        jnp.meshgrid(jnp.arange(X), jnp.arange(Y), jnp.arange(Z),
                     indexing="ij"), -1).astype(jnp.float32) + 0.5

    def along(axis):
        sl0 = [slice(None)] * 3
        sl1 = [slice(None)] * 3
        sl0[axis] = slice(None, -1)
        sl1[axis] = slice(1, None)
        sl0, sl1 = tuple(sl0), tuple(sl1)
        t0, t1 = t[sl0], t[sl1]
        cross = (jnp.sign(t0) != jnp.sign(t1)) \
            & (w[sl0] >= weight_thresh) & (w[sl1] >= weight_thresh) \
            & (jnp.abs(t0) < 1) & (jnp.abs(t1) < 1)
        frac = jnp.where(jnp.abs(t0 - t1) > 1e-9, t0 / (t0 - t1), 0.5)
        grid = base[sl0].at[..., axis].add(frac)
        pts = grid.reshape(-1, 3) * vol.voxel + vol.origin
        cols = vol.color[sl0].reshape(-1, 3)
        return pts, cols, cross.reshape(-1)

    parts = [along(a) for a in range(3)]
    return tuple(jnp.concatenate([p[i] for p in parts]) for i in range(3))


def fuse_frames(cameras, depths, colors, voxel_size=0.02, margin=0.3,
                max_depth: float = 8.0):
    """Host helper: bound the scene from the depth maps, then integrate all."""
    mins, maxs = [], []
    for cam, d in zip(cameras, depths):
        import jax.numpy as jnp_
        from ..utils.image import compute_vertex_map, transform_map
        v = compute_vertex_map(jnp_.asarray(d), jnp_.asarray(cam.K))
        vw = transform_map(v, jnp_.asarray(cam.c2w, jnp_.float32))
        m = np.asarray(d) > 0
        if m.sum() == 0:
            continue
        vw = np.asarray(vw)[m]
        mins.append(vw.min(0))
        maxs.append(vw.max(0))
    lo = np.min(mins, axis=0) - margin
    hi = np.max(maxs, axis=0) + margin
    dims = np.ceil((hi - lo) / voxel_size).astype(int)
    dims = np.minimum(dims, 384)
    vol = make_volume(lo, tuple(int(x) for x in dims), voxel_size)
    for cam, d, c in zip(cameras, depths, colors):
        vol = integrate(vol, jnp.asarray(d), jnp.asarray(c),
                        jnp.asarray(cam.w2c), jnp.asarray(cam.K),
                        max_depth=max_depth)
    return vol
